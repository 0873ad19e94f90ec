"""Fused LayerNorm + MLP + residual Pallas kernel.

Half of every ViT block is ``x + lin2(gelu(lin1(LN(x))))``. Left to XLA this
chain round-trips the (tokens, 4C) hidden activation and several (tokens, C)
intermediates through HBM; fused in VMEM the only HBM traffic is x in / out
and the weights (which stay resident across grid steps).

Backward falls back to the reference jnp implementation via custom_vjp.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fused_kernel(x_ref, scale_ref, bias_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                  o_ref, *, eps: float):
    x = x_ref[...]
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    ln = (xf - mean) * jax.lax.rsqrt(var + eps)
    ln = (ln * scale_ref[0] + bias_ref[0]).astype(x.dtype)

    h = jax.lax.dot_general(
        ln, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[0]
    # exact-GELU via a polynomial erf (Abramowitz-Stegun 7.1.26, |err| < 1.5e-7,
    # far below bf16 resolution) — Mosaic lowers neither erf nor erfc
    z = h * 0.7071067811865476
    sign = jnp.sign(z)
    az = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * az)
    poly = ((((1.061405429 * t - 1.453152027) * t + 1.421413741) * t
             - 0.284496736) * t + 0.254829592) * t
    erf_z = sign * (1.0 - poly * jnp.exp(-az * az))
    h = (0.5 * h * (1.0 + erf_z)).astype(x.dtype)

    y = jax.lax.dot_general(
        h, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[0]
    o_ref[...] = x + y.astype(x.dtype)


def _fused_forward(x2d, scale, bias, w1, b1, w2, b2, block_m=256, eps=1e-6):
    M, C = x2d.shape
    H = w1.shape[1]
    block_m = min(block_m, M)
    # pad rows to a multiple of block_m (residual passthrough keeps pads inert)
    pad = (-M) % block_m
    if pad:
        x2d = jnp.pad(x2d, ((0, pad), (0, 0)))
    Mp = x2d.shape[0]

    # weights ride in the compute dtype so both stay VMEM-resident
    w1c = w1.astype(x2d.dtype)
    w2c = w2.astype(x2d.dtype)
    scale2 = scale.reshape(1, C).astype(jnp.float32)
    bias2 = bias.reshape(1, C).astype(jnp.float32)
    b12 = b1.reshape(1, H).astype(jnp.float32)
    b22 = b2.reshape(1, C).astype(jnp.float32)

    kernel = functools.partial(_fused_kernel, eps=eps)
    interpret = jax.default_backend() == "cpu"
    out = pl.pallas_call(
        kernel,
        grid=(Mp // block_m,),
        in_specs=[
            pl.BlockSpec((block_m, C), lambda i: (i, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((C, H), lambda i: (0, 0)),
            pl.BlockSpec((1, H), lambda i: (0, 0)),
            pl.BlockSpec((H, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_m, C), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((Mp, C), x2d.dtype),
        interpret=interpret,
    )(x2d, scale2, bias2, w1c, b12, w2c, b22)
    return out[:M] if pad else out


def _reference(x2d, scale, bias, w1, b1, w2, b2, eps=1e-6):
    xf = x2d.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    ln = ((xf - mean) * jax.lax.rsqrt(var + eps) * scale + bias).astype(x2d.dtype)
    h = jnp.dot(ln, w1.astype(x2d.dtype), preferred_element_type=jnp.float32) + b1
    h = jax.nn.gelu(h.astype(x2d.dtype), approximate=False)
    y = jnp.dot(h, w2.astype(x2d.dtype), preferred_element_type=jnp.float32) + b2
    return x2d + y.astype(x2d.dtype)


@jax.custom_vjp
def fused_ln_mlp_residual(x2d, scale, bias, w1, b1, w2, b2):
    """x2d: (M, C) -> x + mlp(ln(x)); Pallas-fused on TPU."""
    if jax.default_backend() == "cpu":
        return _reference(x2d, scale, bias, w1, b1, w2, b2)
    return _fused_forward(x2d, scale, bias, w1, b1, w2, b2)


def _fwd(x2d, scale, bias, w1, b1, w2, b2):
    return fused_ln_mlp_residual(x2d, scale, bias, w1, b1, w2, b2), \
        (x2d, scale, bias, w1, b1, w2, b2)


def _bwd(res, g):
    _, vjp = jax.vjp(_reference, *res)
    return vjp(g)


fused_ln_mlp_residual.defvjp(_fwd, _bwd)
