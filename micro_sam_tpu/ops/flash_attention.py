"""Pallas TPU flash attention with decomposed relative-position bias.

The SAM ViT encoder's global-attention blocks attend over N = 64*64 = 4096
tokens; materializing the (B, heads, N, N) float32 logits is the memory
bottleneck (8 tiles x 12 heads x 4096^2 x 4B = 6.4 GB per block). This kernel
computes the decomposed rel-pos bias *inside* the kernel from the (H, H, hd)
and (W, W, hd) tables, with online-softmax accumulation, so HBM traffic is
O(N * hd) instead of O(N^2).

Key trick: with q/k blocks sized to whole token rows (multiples of W), the
bias tile for a (BQ, BK) block is

    bias = qRh[:, :, kr0:kr0+RK, None] + qRw[:, :, None, :]

where qRh = einsum(q_rows, rel_h rows) and qRw = einsum(q_rows, rel_w) are tiny
per-q-block matmuls — no gathers needed.

Semantics match ops.attention._einsum_attention_rel_pos: logits use q scaled by
hd^-0.5, the rel-pos terms use the *unscaled* q (reference SAM behavior).
The fused-qkv path also has a Pallas backward kernel (_flash_bwd_kernel):
dq/dk/dv plus the rel-pos table gradients, with softmax stats recomputed
in-kernel — the einsum VJP materialized (B, nH, N, N) float32 logits three
times over, making finetuning backward 10x the forward cost and capping the
trainable batch size. Set MSAM_TPU_FLASH_BWD=0 to fall back to the einsum VJP.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, rh_ref, rw_ref, o_ref, *, block_k: int,
                  w: int, scale: float):
    """One (batch-group, q-block) program; loops over the heads folded into
    axis 1 of the refs (1 for global blocks, nH for windows — fewer tiny
    programs for the 25-windows-per-image case).

    q_ref: (1, HPP, BQ, hd); k_ref/v_ref: (1, HPP, N, hd); rh_ref:
    (RQ, H, hd) — the rel_pos_h rows for this q block (sliced by the BlockSpec
    index map); rw_ref: (W, W, hd); o_ref: (1, HPP, BQ, hd).
    """
    _, hpp, bq, hd = q_ref.shape
    n = k_ref.shape[2]
    rq = bq // w           # q token rows in this block
    rk = block_k // w      # k token rows per k block

    # Bias expansion without 4D reshapes (Mosaic can't shape-cast those):
    #   bias = q_rh2d @ E + q_rw2d @ T
    # with constant 0/1 expansion matrices
    #   E[r, kcol] = (kcol // W == r)   (RK, BK): broadcast row value over its W cols
    #   T[wc, kcol] = (kcol % W == wc)  (W, BK):  tile the width term over k rows
    kcol = jax.lax.broadcasted_iota(jnp.int32, (rk, block_k), 1)
    expand_rows = (kcol // w == jax.lax.broadcasted_iota(jnp.int32, (rk, block_k), 0)
                   ).astype(jnp.float32)
    kcol_w = jax.lax.broadcasted_iota(jnp.int32, (w, block_k), 1)
    tile_cols = (kcol_w % w == jax.lax.broadcasted_iota(jnp.int32, (w, block_k), 0)
                 ).astype(jnp.float32)

    rw = rw_ref[:].astype(jnp.float32)           # (W, W, hd)

    def head_body(h, _):
        # fori_loop (not a python unroll): keeps the Mosaic kernel body small —
        # the unrolled 12-head variant made XLA/Mosaic compiles take minutes.
        q = q_ref[0, h].astype(jnp.float32)      # (BQ, hd)
        q_rows = q.reshape(rq, w, hd)

        # Per-block rel-pos width projection (tiny matmul, shared over k blocks).
        q_rw = jax.lax.dot_general(              # (W, RQ, W) -> (RQ, W, W)
            q_rows.transpose(1, 0, 2), rw, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).transpose(1, 0, 2)
        q_rw2d = q_rw.reshape(bq, w)             # merge leading dims (lowerable)
        bias_w = jax.lax.dot_general(            # (BQ, BK), constant over k rows
            q_rw2d, tile_cols, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        q_scaled = q * scale

        def body(j, carry):
            m_prev, l_prev, acc_prev = carry
            k_blk = k_ref[0, h, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
            v_blk = v_ref[0, h, pl.ds(j * block_k, block_k), :].astype(jnp.float32)

            logits = jax.lax.dot_general(
                q_scaled, k_blk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (BQ, BK)

            # rel-pos height projection for this k block: Rh rows [j*rk, j*rk+rk)
            rh_blk = rh_ref[:, pl.ds(j * rk, rk), :].astype(jnp.float32)  # (RQ, RK, hd)
            q_rh_blk = jax.lax.dot_general(                                # (RQ, W, RK)
                q_rows, rh_blk, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            q_rh2d = q_rh_blk.reshape(bq, rk)
            bias_h = jax.lax.dot_general(
                q_rh2d, expand_rows, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            logits_b = logits + bias_h + bias_w

            m_cur = jnp.max(logits_b, axis=-1)
            m_new = jnp.maximum(m_prev, m_cur)
            p = jnp.exp(logits_b - m_new[:, None])
            alpha = jnp.exp(m_prev - m_new)
            l_new = alpha * l_prev + jnp.sum(p, axis=-1)
            acc_new = acc_prev * alpha[:, None] + jax.lax.dot_general(
                p, v_blk, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            )
            return m_new, l_new, acc_new

        m0 = jnp.full((bq,), NEG_INF, dtype=jnp.float32)
        l0 = jnp.zeros((bq,), dtype=jnp.float32)
        acc0 = jnp.zeros((bq, hd), dtype=jnp.float32)
        m, l, acc = jax.lax.fori_loop(0, n // block_k, body, (m0, l0, acc0))
        o_ref[0, h] = (acc / l[:, None]).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, hpp, head_body, 0)


def _flash_forward(q, k, v, rel_h, rel_w, hw, block_q=512, block_k=512,
                   heads_per_program=1):
    """q, k, v: (BG, HPP, N, hd); rel_h: (H, H, hd); rel_w: (W, W, hd).

    heads_per_program > 1 folds heads into the kernel loop — used for the
    small-window blocks where per-program overhead would otherwise dominate.
    """
    BG, HPP, N, hd = q.shape
    H, W = hw
    assert N == H * W, f"{N} != {H}*{W}"
    assert HPP == heads_per_program
    block_q = min(block_q, N)
    block_k = min(block_k, N)
    assert block_q % W == 0 and block_k % W == 0 and N % block_q == 0 and N % block_k == 0
    rq = block_q // W

    grid = (BG, N // block_q)
    kernel = functools.partial(_flash_kernel, block_k=block_k, w=W, scale=hd ** -0.5)
    interpret = jax.default_backend() == "cpu"  # CPU tests run the interpreter
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, HPP, block_q, hd), lambda b, i: (b, 0, i, 0)),
            pl.BlockSpec((1, HPP, N, hd), lambda b, i: (b, 0, 0, 0)),
            pl.BlockSpec((1, HPP, N, hd), lambda b, i: (b, 0, 0, 0)),
            pl.BlockSpec((rq, H, hd), lambda b, i: (i, 0, 0)),
            pl.BlockSpec((W, W, hd), lambda b, i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, HPP, block_q, hd), lambda b, i: (b, 0, i, 0)),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=32 * 1024 * 1024),
        interpret=interpret,
    )(q, k, v, rel_h, rel_w)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def flash_attention_rel_pos_core(q, k, v, rel_h, rel_w, hw):
    return _flash_impl(q, k, v, rel_h, rel_w, hw)


def _flash_impl(q, k, v, rel_h, rel_w, hw):
    """q, k, v: (B, N, nH, hd) -> (B, N, nH, hd)."""
    B, N, nH, hd = q.shape
    # Fold heads into the program for small (window-sized) attention; keep
    # one head per program for the big global blocks (VMEM k/v footprint).
    hpp = nH if N <= 1024 else 1
    qt = q.transpose(0, 2, 1, 3).reshape(B * nH // hpp, hpp, N, hd)
    kt = k.transpose(0, 2, 1, 3).reshape(B * nH // hpp, hpp, N, hd)
    vt = v.transpose(0, 2, 1, 3).reshape(B * nH // hpp, hpp, N, hd)
    out = _flash_forward(qt, kt, vt, rel_h.astype(q.dtype), rel_w.astype(q.dtype), hw,
                         heads_per_program=hpp)
    return out.reshape(B, nH, N, hd).transpose(0, 2, 1, 3)


def _flash_fwd(q, k, v, rel_h, rel_w, hw):
    return _flash_impl(q, k, v, rel_h, rel_w, hw), (q, k, v, rel_h, rel_w)


def _flash_bwd(hw, res, g):
    from .attention import _einsum_attention_rel_pos
    q, k, v, rel_h, rel_w = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_, rh_, rw_: _einsum_attention_rel_pos(q_, k_, v_, hw, rh_, rw_),
        q, k, v, rel_h, rel_w,
    )
    return vjp(g)


flash_attention_rel_pos_core.defvjp(_flash_fwd, _flash_bwd)


def flash_attention_rel_pos(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    hw: Tuple[int, int],
    rel_h: Optional[jnp.ndarray], rel_w: Optional[jnp.ndarray],
) -> jnp.ndarray:
    """Public entry: (B, N, nH, hd) attention over an (H, W) grid."""
    H, W = hw
    if rel_h is None:
        rel_h = jnp.zeros((H, H, q.shape[-1]), dtype=q.dtype)
        rel_w = jnp.zeros((W, W, q.shape[-1]), dtype=q.dtype)
    return flash_attention_rel_pos_core(q, k, v, rel_h, rel_w, tuple(hw))


# ---------------------------------------------------------------------------
# Zero-copy variant: read q/k/v directly from the fused qkv tensor
# ---------------------------------------------------------------------------

def _flash_kernel_qkv(q_ref, k_ref, v_ref, rh_ref, rw_ref, o_ref, *, block_q: int,
                      block_k: int, w: int, scale: float):
    """Like _flash_kernel but the refs are views into the fused qkv tensor in
    (B, 3, nH, N, hd) layout: q_ref: (1, 1, HPP, N, hd); k_ref/v_ref:
    (1, 1, HPP, N, hd); o_ref: (1, HPP, N, hd). The kernel loops q-blocks and
    heads internally so k/v are fetched into VMEM exactly once per (batch,
    head-group) — the blocked-grid variant re-fetched k/v per q-block
    (~3 GB/image of redundant HBM traffic on the global blocks)."""
    _, _, hpp, n, hd = q_ref.shape
    bq = block_q
    rq = bq // w
    rk = block_k // w

    kcol = jax.lax.broadcasted_iota(jnp.int32, (rk, block_k), 1)
    expand_rows = (kcol // w == jax.lax.broadcasted_iota(jnp.int32, (rk, block_k), 0)
                   ).astype(jnp.float32)
    kcol_w = jax.lax.broadcasted_iota(jnp.int32, (w, block_k), 1)
    tile_cols = (kcol_w % w == jax.lax.broadcasted_iota(jnp.int32, (w, block_k), 0)
                 ).astype(jnp.float32)

    rw = rw_ref[:].astype(jnp.float32)

    def head_body(h, _):
        def q_block_body(qi, __):
            q = q_ref[0, 0, h, pl.ds(qi * bq, bq), :].astype(jnp.float32)  # (BQ, hd)
            q_rows = q.reshape(rq, w, hd)

            q_rw = jax.lax.dot_general(
                q_rows.transpose(1, 0, 2), rw, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).transpose(1, 0, 2)
            q_rw2d = q_rw.reshape(bq, w)
            bias_w = jax.lax.dot_general(
                q_rw2d, tile_cols, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

            q_scaled = q * scale

            def body(j, carry):
                m_prev, l_prev, acc_prev = carry
                k_blk = k_ref[0, 0, h, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
                v_blk = v_ref[0, 0, h, pl.ds(j * block_k, block_k), :].astype(jnp.float32)

                logits = jax.lax.dot_general(
                    q_scaled, k_blk, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                rh_blk = rh_ref[pl.ds(qi * rq, rq), pl.ds(j * rk, rk), :].astype(jnp.float32)
                q_rh_blk = jax.lax.dot_general(
                    q_rows, rh_blk, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )
                q_rh2d = q_rh_blk.reshape(bq, rk)
                bias_h = jax.lax.dot_general(
                    q_rh2d, expand_rows, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                logits_b = logits + bias_h + bias_w

                m_cur = jnp.max(logits_b, axis=-1)
                m_new = jnp.maximum(m_prev, m_cur)
                p = jnp.exp(logits_b - m_new[:, None])
                alpha = jnp.exp(m_prev - m_new)
                l_new = alpha * l_prev + jnp.sum(p, axis=-1)
                acc_new = acc_prev * alpha[:, None] + jax.lax.dot_general(
                    p, v_blk, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
                )
                return m_new, l_new, acc_new

            m0 = jnp.full((bq,), NEG_INF, dtype=jnp.float32)
            l0 = jnp.zeros((bq,), dtype=jnp.float32)
            acc0 = jnp.zeros((bq, hd), dtype=jnp.float32)
            m, l, acc = jax.lax.fori_loop(0, n // block_k, body, (m0, l0, acc0))
            o_ref[0, h, pl.ds(qi * bq, bq), :] = (acc / l[:, None]).astype(o_ref.dtype)
            return 0

        jax.lax.fori_loop(0, n // bq, q_block_body, 0)
        return 0

    jax.lax.fori_loop(0, hpp, head_body, 0)


def _flash_forward_qkv(qkv, rel_h, rel_w, hw, num_heads, block_q=512, block_k=512):
    """qkv: (B, 3, nH, N, hd) -> (B, nH, N, hd). Heads ride inside the kernel
    for small N; for big N the grid has a head dimension."""
    B, three, nH, N, hd = qkv.shape
    H, W = hw
    block_q = min(block_q, N)
    block_k = min(block_k, N)
    assert block_q % W == 0 and block_k % W == 0 and N % block_q == 0 and N % block_k == 0
    rq = block_q // W

    per_head_grid = N > 1024
    interpret = jax.default_backend() == "cpu"
    kernel = functools.partial(_flash_kernel_qkv, block_q=block_q, block_k=block_k,
                               w=W, scale=hd ** -0.5)

    if per_head_grid:
        grid = (B, nH)
        in_specs = [
            pl.BlockSpec((1, 1, 1, N, hd), lambda b, h: (b, 0, h, 0, 0)),
            pl.BlockSpec((1, 1, 1, N, hd), lambda b, h: (b, 1, h, 0, 0)),
            pl.BlockSpec((1, 1, 1, N, hd), lambda b, h: (b, 2, h, 0, 0)),
            pl.BlockSpec((H, H, hd), lambda b, h: (0, 0, 0)),
            pl.BlockSpec((W, W, hd), lambda b, h: (0, 0, 0)),
        ]
        out_specs = pl.BlockSpec((1, 1, N, hd), lambda b, h: (b, h, 0, 0))
    else:
        grid = (B,)
        in_specs = [
            pl.BlockSpec((1, 1, nH, N, hd), lambda b: (b, 0, 0, 0, 0)),
            pl.BlockSpec((1, 1, nH, N, hd), lambda b: (b, 1, 0, 0, 0)),
            pl.BlockSpec((1, 1, nH, N, hd), lambda b: (b, 2, 0, 0, 0)),
            pl.BlockSpec((H, H, hd), lambda b: (0, 0, 0)),
            pl.BlockSpec((W, W, hd), lambda b: (0, 0, 0)),
        ]
        out_specs = pl.BlockSpec((1, nH, N, hd), lambda b: (b, 0, 0, 0))

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=jax.ShapeDtypeStruct((B, nH, N, hd), qkv.dtype),
        # headroom above the 16M default scoped budget: f32 inputs or large
        # batches double-buffer past it (v5e has far more physical VMEM)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=32 * 1024 * 1024),
        interpret=interpret,
    )(qkv, qkv, qkv, rel_h, rel_w)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention_qkv_core(qkv, rel_h, rel_w, hw, num_heads):
    return _flash_forward_qkv(qkv, rel_h.astype(qkv.dtype), rel_w.astype(qkv.dtype),
                              hw, num_heads)


def _flash_qkv_fwd(qkv, rel_h, rel_w, hw, num_heads):
    out = flash_attention_qkv_core(qkv, rel_h, rel_w, hw, num_heads)
    return out, (qkv, rel_h, rel_w, out)


def _flash_qkv_bwd(hw, num_heads, res, g):
    import os
    qkv, rel_h, rel_w, out = res

    if os.environ.get("MSAM_TPU_FLASH_BWD", "1") != "0":
        dq, dk, dv, drh, drw = _flash_backward_qkv(
            qkv, out, g, rel_h, rel_w, hw)
        dqkv = jnp.stack([dq, dk, dv], axis=1)
        return dqkv, drh.astype(rel_h.dtype), drw.astype(rel_w.dtype)

    from .attention import _einsum_attention_rel_pos

    def ref_fn2(qkv_, rh_, rw_):
        q = jnp.transpose(qkv_[:, 0], (0, 2, 1, 3))
        k = jnp.transpose(qkv_[:, 1], (0, 2, 1, 3))
        v = jnp.transpose(qkv_[:, 2], (0, 2, 1, 3))
        o = _einsum_attention_rel_pos(q, k, v, hw, rh_, rw_)    # (B, N, nH, hd)
        return jnp.transpose(o, (0, 2, 1, 3))                   # (B, nH, N, hd)

    _, vjp = jax.vjp(ref_fn2, qkv, rel_h, rel_w)
    return vjp(g)


flash_attention_qkv_core.defvjp(_flash_qkv_fwd, _flash_qkv_bwd)


def flash_attention_qkv(qkv, hw, rel_h, rel_w, num_heads):
    """qkv: (B, 3, nH, N, hd) fused tensor -> (B, nH, N, hd) attention output.

    The kernel's BlockSpecs view q/k/v directly inside the fused tensor; the
    producer builds the layout with a single einsum whose output layout XLA
    can fuse into the matmul.
    """
    H, W = hw
    hd = qkv.shape[-1]
    if rel_h is None:
        rel_h = jnp.zeros((H, H, hd), dtype=qkv.dtype)
        rel_w = jnp.zeros((W, W, hd), dtype=qkv.dtype)
    return flash_attention_qkv_core(qkv, rel_h, rel_w, tuple(hw), num_heads)


# ---------------------------------------------------------------------------
# Pallas backward kernel (dq, dk, dv, d_rel_h, d_rel_w)
# ---------------------------------------------------------------------------

def _flash_bwd_kernel(q_ref, k_ref, v_ref, do_ref, o_ref, rh_ref, rw_ref,
                      dq_ref, dk_ref, dv_ref, drh_ref, drw_ref,
                      dk_scr, dv_scr, *,
                      block_q: int, block_k: int, w: int, scale: float,
                      grid_rank: int):
    """Flash-attention backward with decomposed rel-pos bias gradients.

    One program per (batch, head-group). Softmax stats are recomputed (pass 1)
    instead of saved — saving per-row L would need awkwardly-tiled (B, nH, N)
    outputs, and the extra S recomputation is ~20% of the backward FLOPs.

    q/k/v_ref: (1, 1, HPP, N, hd) views into the fused qkv tensor.
    do/o_ref:  (1, HPP, N, hd) upstream grad and forward output (for the
               D = rowsum(dO * O) softmax-backward term).
    dq/dk/dv_ref: (1, HPP, N, hd); drh_ref: (H, H, hd) f32 and drw_ref:
    (W, W, hd) f32 are shared output blocks ACCUMULATED across the sequential
    TPU grid (initialized by the first program).
    Scratch: dk/dv (N, hd) f32 per-head accumulators; drh/drw per-program.
    """
    _, _, hpp, n, hd = q_ref.shape
    bq, bk = block_q, block_k
    rq, rk = bq // w, bk // w

    kcol = jax.lax.broadcasted_iota(jnp.int32, (rk, bk), 1)
    expand_rows = (kcol // w == jax.lax.broadcasted_iota(jnp.int32, (rk, bk), 0)
                   ).astype(jnp.float32)               # (RK, BK)
    kcol_w = jax.lax.broadcasted_iota(jnp.int32, (w, bk), 1)
    tile_cols = (kcol_w % w == jax.lax.broadcasted_iota(jnp.int32, (w, bk), 0)
                 ).astype(jnp.float32)                 # (W, BK)

    rw = rw_ref[:].astype(jnp.float32)                 # (W, W, hd)

    # d_rel accumulates straight into the output refs: with a constant output
    # index map the blocks stay VMEM-resident across the sequential TPU grid,
    # and skipping the scratch copies keeps the program under the 16M scoped
    # VMEM limit. The first program zero-initializes.
    first = pl.program_id(0) == 0
    if grid_rank == 2:
        first = jnp.logical_and(first, pl.program_id(1) == 0)

    @pl.when(first)
    def _init():
        drh_ref[...] = jnp.zeros_like(drh_ref)
        drw_ref[...] = jnp.zeros_like(drw_ref)

    def head_body(h, _):
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

        def q_block_body(qi, __):
            q = q_ref[0, 0, h, pl.ds(qi * bq, bq), :].astype(jnp.float32)
            do = do_ref[0, h, pl.ds(qi * bq, bq), :].astype(jnp.float32)
            o = o_ref[0, h, pl.ds(qi * bq, bq), :].astype(jnp.float32)
            dcoef = jnp.sum(do * o, axis=-1)           # (BQ,)
            q_rows = q.reshape(rq, w, hd)
            q_scaled = q * scale

            q_rw = jax.lax.dot_general(                # width bias projection
                q_rows.transpose(1, 0, 2), rw, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).transpose(1, 0, 2)
            bias_w = jax.lax.dot_general(
                q_rw.reshape(bq, w), tile_cols, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

            def s_tile(j):
                k_blk = k_ref[0, 0, h, pl.ds(j * bk, bk), :].astype(jnp.float32)
                logits = jax.lax.dot_general(
                    q_scaled, k_blk, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                rh_blk = rh_ref[pl.ds(qi * rq, rq), pl.ds(j * rk, rk), :].astype(jnp.float32)
                q_rh = jax.lax.dot_general(
                    q_rows, rh_blk, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )
                bias_h = jax.lax.dot_general(
                    q_rh.reshape(bq, rk), expand_rows, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                return logits + bias_h + bias_w, k_blk, rh_blk

            # pass 1: softmax stats
            def stat_body(j, carry):
                m_prev, l_prev = carry
                s, _, _ = s_tile(j)
                m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1))
                l_new = jnp.exp(m_prev - m_new) * l_prev + jnp.sum(
                    jnp.exp(s - m_new[:, None]), axis=-1)
                return m_new, l_new

            m0 = jnp.full((bq,), NEG_INF, dtype=jnp.float32)
            l0 = jnp.zeros((bq,), dtype=jnp.float32)
            m, l = jax.lax.fori_loop(0, n // bk, stat_body, (m0, l0))
            lse = m + jnp.log(l)

            # pass 2: gradients
            def grad_body(j, dq_acc):
                s, k_blk, rh_blk = s_tile(j)
                p = jnp.exp(s - lse[:, None])          # (BQ, BK)
                v_blk = v_ref[0, 0, h, pl.ds(j * bk, bk), :].astype(jnp.float32)
                dp = jax.lax.dot_general(
                    do, v_blk, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                ds = p * (dp - dcoef[:, None])         # (BQ, BK)

                dq_acc = dq_acc + scale * jax.lax.dot_general(
                    ds, k_blk, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                # rel-pos height: collapse k columns of each k-row
                ds_rows = jax.lax.dot_general(         # (BQ, RK)
                    ds, expand_rows, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).reshape(rq, w, rk)
                dq_acc = dq_acc + jax.lax.dot_general( # (RQ, W, hd)
                    ds_rows, rh_blk, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                ).reshape(bq, hd)
                drh_blk = jax.lax.dot_general(         # (RQ, RK, hd)
                    ds_rows.transpose(0, 2, 1), q_rows, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )
                drh_ref[pl.ds(qi * rq, rq), pl.ds(j * rk, rk), :] = (
                    drh_ref[pl.ds(qi * rq, rq), pl.ds(j * rk, rk), :] + drh_blk)
                # rel-pos width: collapse k columns of each within-row offset
                ds_w = jax.lax.dot_general(            # (BQ, W)
                    ds, tile_cols, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).reshape(rq, w, w).transpose(1, 0, 2) # (Wq, RQ, Wk)
                dq_w = jax.lax.dot_general(            # (Wq, RQ, hd)
                    ds_w, rw, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                ).transpose(1, 0, 2)
                dq_acc = dq_acc + dq_w.reshape(bq, hd)
                drw_ref[...] = drw_ref[...] + jax.lax.dot_general(
                    ds_w, q_rows.transpose(1, 0, 2), (((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )                                      # (Wq, Wk, hd)
                # dk, dv
                dk_scr[pl.ds(j * bk, bk), :] = dk_scr[pl.ds(j * bk, bk), :] + (
                    scale * jax.lax.dot_general(
                        ds, q, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32))
                dv_scr[pl.ds(j * bk, bk), :] = dv_scr[pl.ds(j * bk, bk), :] + (
                    jax.lax.dot_general(
                        p, do, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32))
                return dq_acc

            dq_acc = jax.lax.fori_loop(0, n // bk, grad_body,
                                       jnp.zeros((bq, hd), jnp.float32))
            dq_ref[0, h, pl.ds(qi * bq, bq), :] = dq_acc.astype(dq_ref.dtype)
            return 0

        jax.lax.fori_loop(0, n // bq, q_block_body, 0)
        dk_ref[0, h] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0, h] = dv_scr[...].astype(dv_ref.dtype)
        return 0

    jax.lax.fori_loop(0, hpp, head_body, 0)


def _flash_backward_qkv(qkv, out, g, rel_h, rel_w, hw, block_q=128, block_k=512):
    """Backward pass of the fused-qkv flash attention.

    qkv: (B, 3, nH, N, hd); out/g: (B, nH, N, hd); rel_h: (H, H, hd);
    rel_w: (W, W, hd). Returns (dq, dk, dv) in qkv.dtype each (B, nH, N, hd)
    plus (drh, drw) in float32.
    """
    B, _, nH, N, hd = qkv.shape
    H, W = hw
    if N <= 1024:            # window-sized attention: single q/k block
        block_q = block_k = N
    else:
        block_q = min(block_q, N)
        block_k = min(block_k, N)
    assert block_q % W == 0 and block_k % W == 0 and N % block_q == 0 and N % block_k == 0
    # Mosaic needs the rel-table sublane slice offset (j * rk) statically
    # divisible by 8 whenever the k loop has more than one iteration
    assert N == block_k or (block_k // W) % 8 == 0, (block_k, W)

    per_head_grid = N > 1024
    interpret = jax.default_backend() == "cpu"

    if per_head_grid:
        grid = (B, nH)
        hpp = 1
        qkv_spec = lambda s: [
            pl.BlockSpec((1, 1, 1, N, hd), lambda b, h, s_=s: (b, s_, h, 0, 0))
            for s in range(3)]
        bh_spec = pl.BlockSpec((1, 1, N, hd), lambda b, h: (b, h, 0, 0))
        rel_spec_h = pl.BlockSpec((H, H, hd), lambda b, h: (0, 0, 0))
        rel_spec_w = pl.BlockSpec((W, W, hd), lambda b, h: (0, 0, 0))
    else:
        grid = (B,)
        hpp = nH
        qkv_spec = lambda s: [
            pl.BlockSpec((1, 1, nH, N, hd), lambda b, s_=s: (b, s_, 0, 0, 0))
            for s in range(3)]
        bh_spec = pl.BlockSpec((1, nH, N, hd), lambda b: (b, 0, 0, 0))
        rel_spec_h = pl.BlockSpec((H, H, hd), lambda b: (0, 0, 0))
        rel_spec_w = pl.BlockSpec((W, W, hd), lambda b: (0, 0, 0))

    kernel = functools.partial(
        _flash_bwd_kernel, block_q=block_q, block_k=block_k, w=W,
        scale=hd ** -0.5, grid_rank=len(grid))

    dq, dk, dv, drh, drw = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=qkv_spec(None)[:3] + [bh_spec, bh_spec, rel_spec_h, rel_spec_w],
        out_specs=[bh_spec, bh_spec, bh_spec, rel_spec_h, rel_spec_w],
        out_shape=[
            jax.ShapeDtypeStruct((B, nH, N, hd), qkv.dtype),
            jax.ShapeDtypeStruct((B, nH, N, hd), qkv.dtype),
            jax.ShapeDtypeStruct((B, nH, N, hd), qkv.dtype),
            jax.ShapeDtypeStruct((H, H, hd), jnp.float32),
            jax.ShapeDtypeStruct((W, W, hd), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((N, hd), jnp.float32),
            pltpu.VMEM((N, hd), jnp.float32),
        ],
        # the default 16M scoped-VMEM budget is ~0.5M short for the global
        # blocks (double-buffered q/k/v/do/o blocks + f32 dk/dv accumulators);
        # v5e/v5p physically have far more VMEM
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=32 * 1024 * 1024),
        interpret=interpret,
    )(qkv, qkv, qkv, g, out, rel_h.astype(qkv.dtype), rel_w.astype(qkv.dtype))
    return dq, dk, dv, drh, drw
