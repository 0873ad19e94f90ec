"""Fused TinyViT block tail (local_conv + LN + MLP + residual) as one Pallas
TPU kernel.

Each vit_t block ends with

    t   = bn(dw3x3(x))                       "local conv", SAME pad
    out = t + lin2(gelu(lin1(LN(t))))        token MLP

Left to XLA these cost ~8.2 ms of the batch-8 step across the 10 blocks
(LN round-trips f32 copies, the MLP hidden tensor round-trips HBM, and the
exact-erf gelu runs ~15 VPU ops/element over it). The kernel processes a
row-chunk per program with the same clamped-index halo-block pattern as
ops/fused_mbconv.py (the depthwise window needs one neighbor row on each
side; here x itself is zero-padded by the conv, so edge halos zero before
the dw). gelu uses the bf16 tanh form on the fast path (see fused_mbconv).

Backward falls back to the unfused composition via custom_vjp.
"""
from __future__ import annotations

import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_mbconv import _gelu, _fold_bn


def _tiny_tail_kernel(xu_ref, xm_ref, xd_ref, dwk_ref, s_ref, t_ref,
                      lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                      o_ref, *, eps: float):
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    _, r, w, c = xm_ref.shape
    hid = w1_ref.shape[1]
    fast = xm_ref.dtype == jnp.bfloat16
    cdt = jnp.bfloat16 if fast else jnp.float32

    up = xu_ref[0, -1:]                               # (1, W, C) halo rows
    dn = xd_ref[0, :1]
    up = jnp.where(j == 0, jnp.zeros_like(up), up)    # conv zero-pad at edges
    dn = jnp.where(j == nj - 1, jnp.zeros_like(dn), dn)
    ext = jnp.concatenate([up, xm_ref[0], dn], axis=0)
    extp = jnp.pad(ext, ((0, 0), (1, 1), (0, 0)))     # SAME pad on cols

    acc = jnp.zeros((r, w, c), jnp.float32)           # depthwise 3x3 (VPU)
    for di in range(3):
        for dj in range(3):
            acc = acc + (extp[di:di + r, dj:dj + w, :].astype(jnp.float32)
                         * dwk_ref[di * 3 + dj])
    t = (acc * s_ref[0] + t_ref[0]).reshape(r * w, c)  # BN fold, f32

    mean = jnp.mean(t, axis=-1, keepdims=True)        # LN
    var = jnp.var(t, axis=-1, keepdims=True)
    a = ((t - mean) * jax.lax.rsqrt(var + eps) * lns_ref[0] + lnb_ref[0])

    h = jax.lax.dot_general(
        a.astype(cdt), w1_ref[...].astype(cdt), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b1_ref[0]
    g = _gelu(h, fast)
    y = jax.lax.dot_general(
        g.astype(cdt), w2_ref[...].astype(cdt), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b2_ref[0]
    o_ref[0] = (t + y).reshape(r, w, c).astype(o_ref.dtype)


def _tail_fused_forward(x, local_p, mlp_p):
    from ..models import common as cm
    import functools
    B, H, W, C = x.shape
    dwk = local_p["conv"]["w"].reshape(9, 1, C)
    s, t = _fold_bn(local_p["bn"])
    lns = mlp_p["norm"]["scale"][None]
    lnb = mlp_p["norm"]["bias"][None]
    w1 = cm.dense_weight(mlp_p["lin1"])
    b1 = mlp_p["lin1"]["b"][None]
    w2 = cm.dense_weight(mlp_p["lin2"])
    b2 = mlp_p["lin2"]["b"][None]
    hid = w1.shape[1]

    if H % 8 != 0:
        raise ValueError(f"H={H} must be a multiple of 8")
    # row chunk sized by the f32 MLP hidden (r*W, hid) resident in VMEM —
    # r=64 at stage3 geometry overflowed the 96 MB scoped budget on the f32
    # path (109.95M requested; the same round-1/2 failure class)
    r = max((d for d in range(8, H + 1, 8)
             if H % d == 0 and d * W * hid <= 4_000_000), default=8)
    hb = r // 8
    nb = H // 8 - 1
    const = lambda *shape: pl.BlockSpec(shape, lambda i, j: (0,) * len(shape))
    kern = functools.partial(_tiny_tail_kernel, eps=1e-5)
    return pl.pallas_call(
        kern,
        grid=(B, H // r),
        in_specs=[
            pl.BlockSpec((1, 8, W, C),
                         lambda i, j: (i, jnp.maximum(j * hb - 1, 0), 0, 0)),
            pl.BlockSpec((1, r, W, C), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 8, W, C),
                         lambda i, j: (i, jnp.minimum(j * hb + hb, nb), 0, 0)),
            const(9, 1, C), const(1, C), const(1, C),
            const(1, C), const(1, C),
            const(C, hid), const(1, hid),
            const(hid, C), const(1, C),
        ],
        out_specs=pl.BlockSpec((1, r, W, C), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    )(x, x, x, dwk, s, t, lns, lnb, w1, b1, w2, b2)


def _unfused_reference(x, local_p, mlp_p):
    from ..models import common as cm
    B, H, W, C = x.shape
    x = cm.conv2d(local_p["conv"], x, padding=1, groups=C)
    x = cm.batch_norm(local_p["bn"], x)
    tokens = x.reshape(B, H * W, C)
    y = cm.layer_norm(mlp_p["norm"], tokens, eps=1e-5)
    y = cm.linear(mlp_p["lin2"], cm.gelu(cm.linear(mlp_p["lin1"], y)))
    return (tokens + y).reshape(B, H, W, C)


@jax.custom_vjp
def fused_tiny_tail(x, local_p, mlp_p):
    """bn(dw3x3(x)) -> + MLP(LN(.)) fused; x: (B, H, W, C), H % 8 == 0."""
    from .fused_tiny_attention import _has_peft, fused_tiny_enabled
    if not fused_tiny_enabled() or _has_peft(
            mlp_p["lin1"], mlp_p["lin2"], mlp_p):
        return _unfused_reference(x, local_p, mlp_p)
    return _tail_fused_forward(x, local_p, mlp_p)


def _ftt_fwd(x, local_p, mlp_p):
    return fused_tiny_tail(x, local_p, mlp_p), (x, local_p, mlp_p)


def _ftt_bwd(res, g):
    x, local_p, mlp_p = res
    _, vjp = jax.vjp(_unfused_reference, x, local_p, mlp_p)
    return vjp(g)


fused_tiny_tail.defvjp(_ftt_fwd, _ftt_bwd)
