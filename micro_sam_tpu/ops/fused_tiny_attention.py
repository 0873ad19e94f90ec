"""Fused TinyViT (vit_t) window attention as a single Pallas TPU kernel.

The vit_t encoder's window attention (reference: mobile_sam TinyViT, window
7/14/7, head dim 32, learned per-offset bias tables) is the dominant cost of
the XLA-lowered model: the (B*nW, N, nh, 32) einsum path measured ~24 ms of
the ~60 ms batch-8 step on v5e — per-head K=32 matmuls run the MXU at quarter
rate on heavily padded (49, 49) tiles, and the logits/softmax round-trip HBM
in f32.

This kernel computes   out = x + proj(attention(LN1(x)))   for one row of
windows per program, with ALL heads packed into ONE dense matmul pair via a
block-diagonal layout:

    Kbd[h*N + j, c] = k[j, c] * [c // hd == h]      (build: tile + iota mask)
    logits_cat      = (q * scale) . Kbd^T           one (N, nh*N) matmul, K=C
    probs_cat       = skipmax-softmax per N-lane block (block sums via a 0/1
                      selector matmul; normalization folded after AV)
    Vbd[h*N + j, c] = v[j, c] * [c // hd == h]
    out_cat         = probs_cat @ Vbd               one (N, C) matmul, K=nh*N

The nh-fold FLOP redundancy of the dense contraction is ~0.5 GFLOP per block
at batch 8 — noise next to the layout traffic it deletes. The window
partition itself is free: the grid cuts (1, w, Wp, C) spatial blocks straight
from the padded feature map and the window-major regrouping happens on VMEM
registers, so the XLA-side reshape/transpose shuffles disappear too.

Zero-padding semantics match the unfused path exactly: the reference pads the
feature map to window multiples, lets pad tokens participate in attention,
and crops afterwards; the kernel sees the same padded input.

Backward: custom_vjp falls back to the unfused composition (inference-speed
kernel; vit_t finetuning uses the XLA path).
"""
from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def fused_tiny_enabled() -> bool:
    """Single gate for the whole vit_t fused family (attention, MBConv, block
    tail, the im2col patch conv and the bf16 tanh-gelu glue);
    MSAM_TPU_FUSED_TINY=0 restores the plain XLA composition everywhere."""
    return _os.environ.get("MSAM_TPU_FUSED_TINY", "1") != "0"


# Same skip-max softmax policy as ops/fused_window_block.py: a fixed exponent
# offset replaces the per-row max (the row max is awkward here anyway: rows
# hold nh independent softmax segments). Exact for max logit <= 96 — far
# beyond trained TinyViT ranges (|qk| * 0.177 with unit-ish LN outputs plus
# bias tables within a few units).
_SKIPMAX_OFFSET = 16.0
_SKIPMAX_CLAMP = 80.0


def _tiny_attn_kernel(x_ref, ln1s_ref, ln1b_ref, wq_ref, wk_ref, wv_ref,
                      bq_ref, bk_ref, bv_ref, wp_ref, bp_ref, bias_ref,
                      o_ref, *, num_heads: int, window: int, eps: float):
    """One program = `group` windows: block (G, Np, C) with Np = N padded to a
    sublane multiple (Mosaic rejects collapsing an unaligned second-minor
    dim); LN/qkv/proj matmuls run on all G*Np rows, the block-diagonal
    attention core reads the N live rows per window."""
    nw, np_, c = x_ref.shape
    n = window * window
    hd = c // num_heads
    r = nw * np_
    scale = hd ** -0.5
    fast = x_ref.dtype == jnp.bfloat16
    cdt = jnp.bfloat16 if fast else jnp.float32

    x = x_ref[...].reshape(r, c).astype(jnp.float32)

    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    a = (x - mean) * jax.lax.rsqrt(var + eps)
    a = (a * ln1s_ref[0] + ln1b_ref[0]).astype(cdt)

    q = jax.lax.dot_general(a, wq_ref[...].astype(cdt), (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) + bq_ref[0]
    k = jax.lax.dot_general(a, wk_ref[...].astype(cdt), (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) + bk_ref[0]
    v = jax.lax.dot_general(a, wv_ref[...].astype(cdt), (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) + bv_ref[0]
    q = (q * scale).astype(cdt)
    k = k.astype(cdt)
    v = v.astype(cdt)

    # block-diagonal head mask (nh*N, C): row h*N+j pairs with lane block h
    mrow = jax.lax.broadcasted_iota(jnp.int32, (num_heads * n, c), 0) // n
    mcol = jax.lax.broadcasted_iota(jnp.int32, (num_heads * n, c), 1) // hd
    bd_mask = jnp.maximum(
        1.0 - jnp.abs((mrow - mcol).astype(jnp.float32)), 0.0).astype(cdt)

    # head-block selector (nh*N, C): Sel[j, c] = [j // N == c // hd] == bd mask
    bias = bias_ref[...].astype(jnp.float32)          # (N, nh*N)

    outs = []
    for g in range(nw):                               # static unroll
        rows = slice(g * np_, g * np_ + n)
        qg = q[rows]                                  # (N, C)
        kbd = jnp.concatenate([k[rows]] * num_heads, axis=0) * bd_mask
        vbd = jnp.concatenate([v[rows]] * num_heads, axis=0) * bd_mask
        logits = jax.lax.dot_general(                 # (N, nh*N), K = C
            qg, kbd, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bias
        z = jnp.minimum(logits - _SKIPMAX_OFFSET, _SKIPMAX_CLAMP)
        pr = jnp.exp(z.astype(cdt))                   # bf16 exp on fast path
        # per-head-segment sums: (N, nh*N) @ (nh*N, C) 0/1 selector puts the
        # segment sum of head h on its hd-lane block; guard underflow
        s = jax.lax.dot_general(
            pr, bd_mask, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                             # (N, C): sum_h per block
        ov = jax.lax.dot_general(                     # (N, C), K = nh*N
            pr, vbd, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ov = ov / jnp.maximum(s, 1e-20)
        if np_ > n:                                   # pad rows ride along
            ov = jnp.pad(ov, ((0, np_ - n), (0, 0)))
        outs.append(ov)
    out = jnp.concatenate(outs, axis=0)               # (R, C)

    y = jax.lax.dot_general(
        out.astype(cdt), wp_ref[...].astype(cdt), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bp_ref[0]
    o_ref[...] = (x + y).astype(o_ref.dtype).reshape(nw, np_, c)


def _pick_group(bw: int, n: int, target_rows: int = 2048) -> int:
    """Largest divisor of bw with group * n <= target_rows."""
    best = 1
    for g in range(1, bw + 1):
        if bw % g == 0 and g * n <= target_rows:
            best = g
    return best


def _tiny_fused_forward(x, attn_params, bias_cat, num_heads, window):
    """x: (B, Hp, Wp, C) padded to window multiples. Returns x + attn-out."""
    from ..models import common as cm
    B, Hp, Wp, C = x.shape
    qkv_w = cm.dense_weight(attn_params["qkv"])       # (C, 3C): [q | k | v]
    qkv_b = attn_params["qkv"]["b"]
    wq, wk, wv = qkv_w[:, :C], qkv_w[:, C:2 * C], qkv_w[:, 2 * C:]
    bq, bk, bv = (qkv_b[:C][None], qkv_b[C:2 * C][None], qkv_b[2 * C:][None])
    wp_ = cm.dense_weight(attn_params["proj"])
    bp_ = attn_params["proj"]["b"][None]
    ln1s = attn_params["norm"]["scale"][None]
    ln1b = attn_params["norm"]["bias"][None]
    bias_cat = bias_cat.astype(x.dtype)

    # window partition in XLA (same shuffles as the unfused path), with the
    # token dim padded to a sublane multiple so the kernel may flatten it
    n = window * window
    np_ = -(-n // 16) * 16
    nh_, nw_ = Hp // window, Wp // window
    xw = x.reshape(B, nh_, window, nw_, window, C)
    xw = xw.transpose(0, 1, 3, 2, 4, 5).reshape(-1, n, C)
    if np_ > n:
        xw = jnp.pad(xw, ((0, 0), (0, np_ - n), (0, 0)))
    BW = xw.shape[0]
    group = _pick_group(BW, np_)

    kern = functools.partial(
        _tiny_attn_kernel, num_heads=num_heads, window=window, eps=1e-5)
    const = lambda *shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape))
    out = pl.pallas_call(
        kern,
        grid=(BW // group,),
        in_specs=[
            pl.BlockSpec((group, np_, C), lambda i: (i, 0, 0)),
            const(1, C), const(1, C),                 # ln1 scale/bias
            const(C, C), const(C, C), const(C, C),    # wq wk wv
            const(1, C), const(1, C), const(1, C),    # bq bk bv
            const(C, C), const(1, C),                 # wproj bproj
            const(n, num_heads * n),                  # bias_cat
        ],
        out_specs=pl.BlockSpec((group, np_, C), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((BW, np_, C), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    )(xw, ln1s, ln1b, wq, wk, wv, bq, bk, bv, wp_, bp_, bias_cat)
    out = out[:, :n].reshape(B, nh_, nw_, window, window, C)
    return out.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, C)


def _unfused_reference(x, attn_params, bias_cat, num_heads, window):
    """XLA composition with identical semantics (backward path / fallback)."""
    from ..models import common as cm
    B, Hp, Wp, C = x.shape
    n = window * window
    xw = x.reshape(B, Hp // window, window, Wp // window, window, C)
    xw = xw.transpose(0, 1, 3, 2, 4, 5).reshape(-1, n, C)
    hd = C // num_heads
    a = cm.layer_norm(attn_params["norm"], xw, eps=1e-5)
    qkv = cm.linear(attn_params["qkv"], a)
    q, k, v = jnp.split(qkv, [C, 2 * C], axis=-1)
    Bw = q.shape[0]
    q = q.reshape(Bw, n, num_heads, hd)
    k = k.reshape(Bw, n, num_heads, hd)
    v = v.reshape(Bw, n, num_heads, hd)
    bias = bias_cat.reshape(n, num_heads, n).transpose(1, 0, 2)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q * (hd ** -0.5), k,
                        preferred_element_type=jnp.float32)
    logits = logits + bias.astype(logits.dtype)[None]
    w_ = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    o = jnp.einsum("bhqk,bkhd->bqhd", w_, v,
                   preferred_element_type=jnp.float32).astype(v.dtype)
    y = cm.linear(attn_params["proj"], o.reshape(Bw, n, C))
    y = y.reshape(B, Hp // window, Wp // window, window, window, C)
    y = y.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, C)
    return x + y


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_tiny_attention(x, attn_params, bias_cat, num_heads, window):
    """x + proj(window-attention(LN1(x))) for TinyViT stages.

    x: (B, Hp, Wp, C) zero-padded to window multiples; bias_cat: (N, nh*N)
    pre-gathered learned bias ([.., h*N + k] = table[h, offset(q, k)]).
    """
    if not fused_tiny_enabled() or _has_peft(
            attn_params["qkv"], attn_params["proj"]):
        return _unfused_reference(x, attn_params, bias_cat, num_heads, window)
    return _tiny_fused_forward(x, attn_params, bias_cat, num_heads, window)


def _has_peft(*param_dicts) -> bool:
    """The fused kernels read plain dense weights; any PEFT adaptation must
    take the unfused path where models/common applies it. Checked keys:
    per-linear 'lora'/'ssf_scale' (common.linear) and the mlp-dict-level
    'adapter' (AdaptFormer, common.mlp_block) — callers pass the dicts at
    BOTH levels."""
    return any(k in p for p in param_dicts
               for k in ("lora", "ssf_scale", "adapter"))


def _fta_fwd(x, attn_params, bias_cat, num_heads, window):
    return (fused_tiny_attention(x, attn_params, bias_cat, num_heads, window),
            (x, attn_params, bias_cat))


def _fta_bwd(num_heads, window, res, g):
    x, attn_params, bias_cat = res
    _, vjp = jax.vjp(
        lambda x, p, b: _unfused_reference(x, p, b, num_heads, window),
        x, attn_params, bias_cat)
    return vjp(g)


fused_tiny_attention.defvjp(_fta_fwd, _fta_bwd)
