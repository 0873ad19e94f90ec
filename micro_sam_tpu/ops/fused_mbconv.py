"""Fused TinyViT MBConv (stage0) as a single Pallas TPU kernel.

One program computes, for a row-chunk of the (B, H, W, C) feature map,

    h   = gelu(bn1(x @ W1))          1x1 expand to hidden = 4C
    h   = gelu(bn2(dw3x3(h)))        depthwise, SAME pad
    y   = bn3(h @ W3)                1x1 shrink back to C
    out = gelu(x + y)

entirely in VMEM. Left to XLA this stage costs ~10.8 ms of vit_t's batch-8
step on v5e (the hidden (B, 256, 256, 256) tensor round-trips HBM three
times and the grouped-conv lowering adds its own layout copies); the fused
kernel reads x once and writes out once, plus an 8-row halo per chunk for
the depthwise window (the up/dn neighbor blocks ride in as separate specs —
BlockSpecs cannot overlap, so the kernel slices one live row from each).

BN folds into per-channel scale/offset vectors outside the kernel. The
depthwise conv itself is VPU math either way (diagonal contraction; no MXU
help) — the win is deleting the HBM traffic and fusion boundaries around it.

Backward falls back to the unfused composition via custom_vjp.
"""
from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_window_block import _erf_poly


def _gelu_f32(x):
    return x * 0.5 * (1.0 + _erf_poly(x * 0.7071067811865476))


def _gelu(x, fast):
    """The three gelus dominate this stage's VPU time (the erf polynomial
    runs ~15 ops/element over the 4C-expanded tensor); on the bf16 fast path
    the polynomial and exp run at double VPU width (comparisons stay f32 —
    Mosaic lacks bf16 compares). bf16 gelu error (~0.4%) is below the
    model's own bf16 rounding."""
    if not fast:
        return _gelu_f32(x)
    # tanh-form gelu folded to x * sigmoid(1.59577x + 0.071355x^3): six
    # bf16 VPU ops, no compares (Mosaic lacks bf16 compares), graceful at
    # both exp extremes. |error| < 1e-3 -- under bf16 rounding itself.
    xb = x.astype(jnp.bfloat16)
    u2 = xb * xb
    pn = -xb * (1.5957692 + 0.07135806 * u2)
    return xb / (1.0 + jnp.exp(pn))


def _mbconv_kernel(xu_ref, xm_ref, xd_ref, w1_ref, s1_ref, t1_ref,
                   dwk_ref, s2_ref, t2_ref, w3_ref, s3_ref, t3_ref,
                   o_ref):
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    _, r, w, c = xm_ref.shape
    hid = w1_ref.shape[1]
    fast = xm_ref.dtype == jnp.bfloat16
    cdt = jnp.bfloat16 if fast else jnp.float32

    up = xu_ref[0, -1:]                               # (1, W, C) halo rows
    dn = xd_ref[0, :1]
    xm = xm_ref[0]
    ext = jnp.concatenate([up, xm, dn], axis=0)       # (R+2, W, C)

    a = jax.lax.dot_general(                          # 1x1 expand, f32 accum
        ext.reshape((r + 2) * w, c).astype(cdt), w1_ref[...].astype(cdt),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    a = _gelu(a * s1_ref[0] + t1_ref[0], fast)
    h = a.astype(cdt).reshape(r + 2, w, hid)

    # the reference zero-pads the EXPANDED tensor for the depthwise window,
    # so image-edge halo rows are zeroed after the expand, not before
    row = jax.lax.broadcasted_iota(jnp.int32, (r + 2, 1, 1), 0)
    top_pad = jnp.logical_and(row == 0, j == 0)
    bot_pad = jnp.logical_and(row == r + 1, j == nj - 1)
    h = h * (1.0 - jnp.logical_or(top_pad, bot_pad).astype(h.dtype))

    hp = jnp.pad(h, ((0, 0), (1, 1), (0, 0)))         # SAME pad on cols
    acc = jnp.zeros((r, w, hid), jnp.float32)
    for di in range(3):                               # depthwise 3x3 (VPU)
        for dj in range(3):
            acc = acc + (hp[di:di + r, dj:dj + w, :].astype(jnp.float32)
                         * dwk_ref[di * 3 + dj])
    g = _gelu(acc * s2_ref[0] + t2_ref[0], fast)

    y = jax.lax.dot_general(                          # 1x1 shrink
        g.astype(cdt).reshape(r * w, hid), w3_ref[...].astype(cdt),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    y = y * s3_ref[0] + t3_ref[0]
    out = _gelu(xm.reshape(r * w, c).astype(jnp.float32) + y, fast)
    o_ref[0] = out.reshape(r, w, c).astype(o_ref.dtype)


def _fold_bn(bn, eps=1e-5):
    s = bn["scale"] / jnp.sqrt(bn["var"] + eps)
    return s[None], (bn["bias"] - bn["mean"] * s)[None]


def _mbconv_fused_forward(x, p):
    B, H, W, C = x.shape
    w1 = p["conv1"]["conv"]["w"].reshape(C, -1)
    hid = w1.shape[1]
    s1, t1 = _fold_bn(p["conv1"]["bn"])
    dwk = p["conv2"]["conv"]["w"].reshape(9, 1, hid)   # (3,3,1,hid) HWIO
    s2, t2 = _fold_bn(p["conv2"]["bn"])
    w3 = p["conv3"]["conv"]["w"].reshape(hid, C)
    s3, t3 = _fold_bn(p["conv3"]["bn"])

    r = 32 if H % 32 == 0 else H
    hb = r // 8                                        # halo spec block rows/8
    nb = H // 8 - 1
    const = lambda *shape: pl.BlockSpec(shape, lambda i, j: (0,) * len(shape))
    return pl.pallas_call(
        _mbconv_kernel,
        grid=(B, H // r),
        in_specs=[
            pl.BlockSpec((1, 8, W, C),
                         lambda i, j: (i, jnp.maximum(j * hb - 1, 0), 0, 0)),
            pl.BlockSpec((1, r, W, C), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 8, W, C),
                         lambda i, j: (i, jnp.minimum(j * hb + hb, nb), 0, 0)),
            const(C, hid), const(1, hid), const(1, hid),
            const(9, 1, hid), const(1, hid), const(1, hid),
            const(hid, C), const(1, C), const(1, C),
        ],
        out_specs=pl.BlockSpec((1, r, W, C), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    )(x, x, x, w1, s1, t1, dwk, s2, t2, w3, s3, t3)


def _unfused_reference(x, p):
    from ..models import tiny_vit as tv
    return tv._mbconv_unfused(p, x)


@jax.custom_vjp
def fused_mbconv(x, p):
    """gelu(x + bn3(conv3(gelu(bn2(dw(gelu(bn1(conv1(x))))))))) fused.

    x: (B, H, W, C) with H a multiple of 8; p: tiny_vit MBConv params.
    """
    from .fused_tiny_attention import fused_tiny_enabled
    if not fused_tiny_enabled():
        return _unfused_reference(x, p)
    return _mbconv_fused_forward(x, p)


def _fmb_fwd(x, p):
    return fused_mbconv(x, p), (x, p)


def _fmb_bwd(res, g):
    x, p = res
    _, vjp = jax.vjp(_unfused_reference, x, p)
    return vjp(g)


fused_mbconv.defvjp(_fmb_fwd, _fmb_bwd)
