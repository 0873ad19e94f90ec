"""Fused ViT windowed transformer block as a single Pallas TPU kernel.

One program per window computes the ENTIRE block in VMEM:

    a  = LN1(x) * valid_mask
    qkv = a @ Wqkv;  per-head attention with decomposed rel-pos bias
    x1 = x + attn @ Wproj
    out = x1 + W2 @ gelu(W1 @ LN2(x1))

Motivation (see PARITY.md perf notes): left to XLA, each windowed block of
the SAM encoder moves ~1.1 GB/batch-8 of layout copies between the window
shuffles and the attention kernel's operand layouts, holding the encoder at
~23% MXU utilization. Fusing the block keeps the (196, C) activations and all
weights (Wqkv reshaped to (3*nH, C, hd) so per-head slices index the leading,
unconstrained dimension) resident in VMEM; HBM traffic drops to x in/out.

Weights ride with constant BlockSpec index maps, so Mosaic loads them once
and they stay resident across the sequential grid. Backward falls back to the
unfused composition via custom_vjp (inference-speed kernel; training uses the
flash-attention backward path through the unfused block).

Reference semantics: segment_anything image encoder Block/Attention (see
SURVEY.md L0); bit-compatible with models/image_encoder.window_block_masked.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os
# Skip-max softmax in the bf16 fast paths: replaces the per-row max with a
# fixed offset, deleting one full read pass over the f32 (block_q, N) logits
# per (q-block, head). Measured -1.4 ms per global block on v5e (12.2 vs
# 13.6, identical checksum); neutral in the window kernel. Read at trace time.
_SKIPMAX = _os.environ.get("MSAM_TPU_SKIPMAX", "1") != "0"
_SKIPMAX_OFFSET = 16.0
# Upper clamp on the shifted logits: exp(80) = 5.5e34 fits bf16 probs, and an
# all-clamped f32 row sum stays finite up to N = 4096 keys (4096 * e^80 =
# 2.25e38 < f32 max) — the encoder's largest attention. Softmax is therefore
# EXACT for any row whose max logit is <= offset + clamp = 96; rows beyond
# that (far outside trained-SAM logit ranges) flatten toward uniform over
# their clamped entries instead of overflowing. Set MSAM_TPU_SKIPMAX=0 to
# restore exact max-subtraction softmax for such checkpoints.
_SKIPMAX_CLAMP = 80.0
# One merged (N, C) @ (C, 3C) qkv matmul + single merged proj matmul in the
# window kernel instead of 3 matmuls per head-pair: fewer MXU setups per
# program. Measured 6.91 vs 7.32 ms per vit_b batch-8 window block on v5e,
# identical checksum. Requires pack*hd == 128 so head-pair slices of the
# merged qkv output are lane-tile-aligned (gated in _fused_forward).
_MERGED_QKV = _os.environ.get("MSAM_TPU_WINDOW_MERGED", "1") != "0"
# Hoist the 0/1 mask/gather/expansion constants of the rel-pos bias fold out
# of the kernel body into operands with constant BlockSpecs: Mosaic re-emits
# program-invariant iota/abs/max chains in EVERY grid program (vit_l: 400
# programs per block rebuild ~0.6 MB of constants each), while a constant
# operand is DMA'd once and stays VMEM-resident across the sequential grid.
_HOIST_CONST = _os.environ.get("MSAM_TPU_WINDOW_HOIST", "1") != "0"


def _erf_poly(z):
    """Abramowitz-Stegun 7.1.26 polynomial erf (|err| < 1.5e-7; Mosaic lowers
    neither erf nor erfc)."""
    sign = jnp.sign(z)
    az = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * az)
    poly = ((((1.061405429 * t - 1.453152027) * t + 1.421413741) * t
             - 0.284496736) * t + 0.254829592) * t
    return sign * (1.0 - poly * jnp.exp(-az * az))


def _fused_block_kernel(x_ref, valid_ref, ln1s_ref, ln1b_ref, w3_ref, b3_ref,
                        rhw_ref, *rest,
                        num_heads: int, w: int, scale: float, eps: float,
                        masked: bool, group: int, pack: int,
                        merged: bool = False, mlp: bool = True,
                        spatial=None, hoist: bool = False):
    """group windows per program: LN/qkv/proj/MLP matmuls run on
    (group * N) rows (the MXU is badly underutilized at 196 rows); only the
    (N, N) attention cores stay per-window (statically unrolled over the
    group, heads via fori_loop).

    Rel-pos bias folds into the logits matmul: u_h[q, ky] = q . Rh[qy(q), ky]
    and u_w[q, kx] are two SMALL batched matmuls, then
    logits = [q*scale | u_h | u_w] @ [k | rows | cols]^T in ONE K = hd + 2w
    contraction (same fold as the global kernel; replaces two key-expanded
    (N, N)-wide bias matmuls and the half-rate K=hd qk matmul).

    spatial=(H_valid, W_valid): the window-partition-free layout. x_ref is
    one (1, w, w, C) tile read straight from the padded (B, Hp, Wp, C)
    spatial array over a (B, Hp/w, Wp/w) grid — the HBM partition/unpartition
    transposes XLA paid per run disappear into the kernel's own input DMA —
    and the pad-validity mask is computed from the program ids instead of
    being shipped as an operand.

    hoist=True: the 0/1 mask/gather constants arrive as three extra operand
    refs (resident across the grid) instead of being rebuilt per program."""
    if hoist:
        (msk_ref, gat_ref, rc_ref, wp_ref, bp_ref, ln2s_ref, ln2b_ref,
         w1_ref, b1_ref, w2_ref, b2_ref, o_ref, attn_scr) = rest
    else:
        (wp_ref, bp_ref, ln2s_ref, ln2b_ref,
         w1_ref, b1_ref, w2_ref, b2_ref, o_ref, attn_scr) = rest
    if spatial is not None:
        # x_ref: (1, 1, w, 1, w, C) — one window tile of the 6-D spatial view
        c = x_ref.shape[-1]
        n = w * w
        gn = n                         # spatial mode is group == 1
        x = x_ref[...].reshape(n, c).astype(jnp.float32)
    else:
        g_, n, c = x_ref.shape
        gn = group * n
        x = x_ref[...].reshape(gn, c).astype(jnp.float32)   # (G*N, C)
    hd = c // num_heads
    packed_hd = pack * hd              # lanes per head-pair weight slab
    n_groups = num_heads // pack

    # LN1 (+ window pad mask, matching the run-fused encoder path)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    a = (x - mean) * jax.lax.rsqrt(var + eps)
    a = a * ln1s_ref[0] + ln1b_ref[0]
    if spatial is not None and masked:
        # in-grid validity: token row r sits at (wy*w + r//w, wx*w + r%w)
        hv, wv = spatial
        wy = pl.program_id(1)
        wx = pl.program_id(2)
        rr = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
        vm = ((wy * w + rr // w < hv) & (wx * w + rr % w < wv))
        a = a * vm.astype(jnp.float32)
    elif masked:
        a = a * valid_ref[...].reshape(gn, 1).astype(jnp.float32)
    a = a.astype(x_ref.dtype)

    fast0 = x_ref.dtype == jnp.bfloat16
    cdt0 = jnp.bfloat16 if fast0 else jnp.float32
    rhw_t = rhw_ref[...]                # (hd, 2n): [Rh^T | Rw^T], col j<n is
    # Rh[j//w, j%w, :], col n+j is Rw[j//w, j%w, :] (transposed outside)
    # 0/1 key-expansion columns of the combined logits matmul (built
    # arithmetically — Mosaic rejects i1 vectors at these layouts):
    # logits = [q*scale | u_h | u_w] @ [k | rows | cols]^T with K = hd + 2w
    if hoist:
        rc = rc_ref[...]                 # (n, 2w): [rows_t | cols_t]
        rows_t, cols_t = rc[:, :w], rc[:, w:]
    else:
        krow_y = jax.lax.broadcasted_iota(jnp.int32, (n, w), 0) // w
        kcol_y = jax.lax.broadcasted_iota(jnp.int32, (n, w), 1)
        rows_t = jnp.maximum(
            1.0 - jnp.abs((krow_y - kcol_y).astype(jnp.float32)),
            0.0).astype(cdt0)
        krow_x = jax.lax.broadcasted_iota(jnp.int32, (n, w), 0) % w
        cols_t = jnp.maximum(
            1.0 - jnp.abs((krow_x - kcol_y).astype(jnp.float32)),
            0.0).astype(cdt0)

    # q-side bias terms u_h[q, ky] = q . Rh[qy(q), ky] / u_w[q, kx] via two
    # FULL-SIZE aligned matmuls + a mask instead of per-(head, window)
    # qy/qx-batched 14-row dots: those lowered to ~23-cycle tiny MXU ops plus
    # sublane-splitting reshapes — 1.65 ms of the 6.9 ms vit_b block
    # (isolated by kernel variants). Here:
    #   u_full = q @ [Rh^T | Rw^T]            (n, 2n), one K=hd matmul
    #   u_hw   = (u_full * mask) @ G          (n, 2w), one 0/1 gather matmul
    # where mask[q, j] keeps table row y==qy(q) (resp. x==qx(q)) and
    # G[j, kk] = [section match][j%w == kk%w]. Exactly one j survives per
    # (q, kk), so the result is EXACT in f32 (single-term sum).
    if hoist:
        mask_hw = msk_ref[...]                                        # (n, 2n)
        gather_g = gat_ref[...]                                       # (2n, 2w)
    else:
        mq_y = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0) // w
        mq_x = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0) % w
        mj = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1) // w
        mask_h = jnp.maximum(
            1.0 - jnp.abs((mq_y - mj).astype(jnp.float32)), 0.0)
        mask_w = jnp.maximum(
            1.0 - jnp.abs((mq_x - mj).astype(jnp.float32)), 0.0)
        mask_hw = jnp.concatenate(
            [mask_h, mask_w], axis=1).astype(cdt0)                    # (n, 2n)
        gj = jax.lax.broadcasted_iota(jnp.int32, (2 * n, 2 * w), 0)
        gk = jax.lax.broadcasted_iota(jnp.int32, (2 * n, 2 * w), 1)
        g_sect = jnp.maximum(
            1.0 - jnp.abs((gj // n - gk // w).astype(jnp.float32)), 0.0)
        g_pos = jnp.maximum(
            1.0 - jnp.abs((gj % w - gk % w).astype(jnp.float32)), 0.0)
        gather_g = (g_sect * g_pos).astype(cdt0)                      # (2n, 2w)

    # heads ride in PACKS of `pack` (lanes per matmul = pack*hd): per-head
    # qkv at hd=64 ran the MXU at half its column width, so two heads' weight
    # slabs are packed to 128 lanes and split with STATIC slices afterwards
    def pair_attn(hp, q2, k2, v2):
        """Attention for one head pack: q2/k2/v2 are (G*N, pack*hd) f32;
        writes the per-head outputs into attn_scr. hp may be traced (fori)
        or a Python int (merged static unroll)."""
        fast, cdt = fast0, cdt0

        for d in range(pack):                            # static unroll
            lanes = slice(d * hd, (d + 1) * hd)
            q3 = q2[:, lanes].reshape(group, n, hd)
            k3 = k2[:, lanes].reshape(group, n, hd)
            v3 = v2[:, lanes].reshape(group, n, hd)
            for g in range(group):                       # static unroll
                qg, kg, vg = q3[g], k3[g], v3[g]
                u_full = jax.lax.dot_general(            # (N, 2n) f32
                    qg.astype(cdt), rhw_t.astype(cdt), (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                u_hw = jax.lax.dot_general(              # (N, 2w) f32
                    u_full.astype(cdt) * mask_hw, gather_g,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                qfull = jnp.concatenate(
                    [(qg * scale).astype(cdt),
                     u_hw.astype(cdt)], axis=1)          # (N, hd + 2w)
                kfull = jnp.concatenate(
                    [kg.astype(cdt), rows_t, cols_t], axis=1)
                logits = jax.lax.dot_general(            # one K=hd+2w matmul
                    qfull, kfull, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )                                        # (N, N)
                if fast and _SKIPMAX:
                    # skip-max softmax (see the global kernel): fixed offset,
                    # f32 exp, bf16 probs; deletes the max-reduction pass
                    z = jnp.minimum(logits - _SKIPMAX_OFFSET, _SKIPMAX_CLAMP)
                    pr = jnp.exp(z).astype(jnp.bfloat16)
                    # the row sum can underflow to 0 only if EVERY logit sits
                    # ~87 below the offset (bf16 prob underflow); guard the
                    # reciprocal so such out-of-distribution rows produce ~0
                    # attention output instead of 0/0 NaNs
                    s = jnp.maximum(jnp.sum(
                        pr.astype(jnp.float32), axis=-1, keepdims=True), 1e-20)
                    ov = jax.lax.dot_general(
                        pr, vg.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    attn_scr[hp * pack + d, g] = (
                        ov * (1.0 / s)).astype(attn_scr.dtype)
                elif fast:
                    # bf16 fast softmax: exp on half-width VPU lanes and the
                    # probs @ v matmul on bf16 MXU passes; the row sum stays
                    # f32, normalization after the matmul (distributive)
                    m = jnp.max(logits, axis=-1, keepdims=True)
                    pr = jnp.exp((logits - m).astype(jnp.bfloat16))
                    s = jnp.sum(pr.astype(jnp.float32), axis=-1, keepdims=True)
                    ov = jax.lax.dot_general(
                        pr, vg.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    attn_scr[hp * pack + d, g] = (
                        ov * (1.0 / s)).astype(attn_scr.dtype)
                else:
                    m = jnp.max(logits, axis=-1, keepdims=True)
                    pr = jnp.exp(logits - m)
                    pr = pr / jnp.sum(pr, axis=-1, keepdims=True)
                    attn_scr[hp * pack + d, g] = jax.lax.dot_general(
                        pr, vg, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )

    if merged:
        # ONE (G*N, C) @ (C, 3C) qkv matmul; head pairs are 128-lane-aligned
        # STATIC slices of its output (the qkv weight is [q heads | k heads |
        # v heads] lane-major already, so no reordering is needed)
        qkv2 = jax.lax.dot_general(
            a, w3_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b3_ref[0]
        for hp in range(n_groups):                       # static unroll
            lo = hp * packed_hd
            pair_attn(hp, qkv2[:, lo:lo + packed_hd],
                      qkv2[:, c + lo:c + lo + packed_hd],
                      qkv2[:, 2 * c + lo:2 * c + lo + packed_hd])
        # single merged proj: lane-concat all heads from the scratch and run
        # one K=C matmul
        slab = jnp.concatenate(
            [attn_scr[h].reshape(gn, hd) for h in range(num_heads)],
            axis=1).astype(x_ref.dtype)
        y = jax.lax.dot_general(
            slab, wp_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    else:
        def head_body(hp, _):
            q2 = jax.lax.dot_general(                    # (G*N, pack*hd) f32
                a, w3_ref[hp], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + b3_ref[hp]
            k2 = jax.lax.dot_general(
                a, w3_ref[n_groups + hp], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + b3_ref[n_groups + hp]
            v2 = jax.lax.dot_general(
                a, w3_ref[2 * n_groups + hp], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + b3_ref[2 * n_groups + hp]
            pair_attn(hp, q2, k2, v2)
            return 0

        jax.lax.fori_loop(0, n_groups, head_body, 0)

        # proj from head-major scratch, pack heads back to K=pack*hd:
        # y = sum_hp [out_{hp*pack} | ... ] @ Wp_slab[hp]
        def proj_body(hp, acc):
            slab = jnp.concatenate(
                [attn_scr[hp * pack + d].reshape(gn, hd) for d in range(pack)],
                axis=1).astype(x_ref.dtype)
            return acc + jax.lax.dot_general(
                slab, wp_ref[hp], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        y = jax.lax.fori_loop(0, n_groups, proj_body,
                              jnp.zeros((gn, c), jnp.float32))
    x1 = x + y + bp_ref[0]                                # (G*N, C) f32

    if not mlp:
        # attention-only variant: the caller runs LN2 + MLP through XLA on
        # the full (BW*N, C) row space — dense MXU rows instead of 196-row
        # per-program matmuls (the MLP is per-token, so it needs no window
        # layout at all)
        o_ref[...] = x1.reshape(o_ref.shape).astype(o_ref.dtype)
        return

    # LN2 + MLP + residual
    mean2 = jnp.mean(x1, axis=-1, keepdims=True)
    var2 = jnp.var(x1, axis=-1, keepdims=True)
    b = (x1 - mean2) * jax.lax.rsqrt(var2 + eps)
    b = (b * ln2s_ref[0] + ln2b_ref[0]).astype(x_ref.dtype)
    h1 = jax.lax.dot_general(
        b, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[0]
    h1 = h1 * 0.5 * (1.0 + _erf_poly(h1 * 0.7071067811865476))
    out = jax.lax.dot_general(
        h1.astype(x_ref.dtype), w2_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[0]
    o_ref[...] = (x1 + out).reshape(o_ref.shape).astype(o_ref.dtype)


def _fused_forward(x, valid, bp_params, hw, num_heads, include_mlp=True,
                   spatial_hw=None):
    """x: (BW, N, C) window-partitioned tokens; valid: (BW, N, 1) or None;
    bp_params: the block's param subtree (norm1/attn/norm2/mlp). With
    include_mlp=False the kernel stops after the attention residual (output
    = x + attn(LN1(x)*valid)); the caller applies LN2 + MLP through XLA.

    spatial_hw=(H_valid, W_valid): x is the PADDED spatial array
    (B, Hp, Wp, C) instead of window-partitioned tokens; the grid tiles it
    (B, Hp/w, Wp/w) and each program reads its (w, w, C) window directly —
    no partition/unpartition transposes, no valid-mask operand (computed
    in-kernel from the program ids). Output keeps the spatial layout."""
    if spatial_hw is not None:
        B_sp, Hp, Wp, C = x.shape
        H, W = hw
        N = H * W
        assert H == W and Hp % H == 0 and Wp % W == 0, (x.shape, hw)
    else:
        BW, N, C = x.shape
        H, W = hw
    assert N == H * W and H == W, (hw, N)
    hd = C // num_heads
    dt = x.dtype
    f32 = jnp.float32

    att = bp_params["attn"]
    # pack heads so each qkv matmul spans pack*hd >= 128 lanes (hd=64 alone
    # runs the MXU at half its column width)
    pack = 2 if (hd * 2 <= 128 and num_heads % 2 == 0) else 1
    n_groups = num_heads // pack
    # merged: ONE (C, 3C) qkv matmul + one (C, C) proj (both lane-dense), with
    # per-head static slices of the qkv output inside the kernel. At
    # pack*hd == 128 the slices are 128-lane-aligned (free); at hd == 80
    # (vit_h) they sit at 80-lane offsets — Mosaic pays lane relayouts on the
    # slices, but the dense qkv/proj still beat the unmerged path's 80-lane
    # weight slabs, which waste 37.5% of the MXU's columns on EVERY qkv/proj
    # matmul (measured: vit_h window block 20.8 -> 14.0 ms, batch 4)
    merged = _MERGED_QKV and (pack * hd == 128 or hd == 80)
    if merged:
        # one (C, 3C) qkv weight / (C, C) proj weight; head pairs are
        # 128-lane-aligned static slices inside the kernel
        w3 = att["qkv"]["w"].astype(dt)                      # (C, 3C)
        b3 = att["qkv"]["b"].astype(f32).reshape(1, 3 * C)
        wp = att["proj"]["w"].astype(dt)                     # (C, C)
    else:
        # (C, 3C) -> (3*nG, C, pack*hd): per-slab slices index the leading dim
        w3 = att["qkv"]["w"].astype(dt).reshape(C, 3, n_groups, pack, hd)
        w3 = w3.transpose(1, 2, 0, 3, 4).reshape(3 * n_groups, C, pack * hd)
        b3 = att["qkv"]["b"].astype(f32).reshape(3, n_groups, pack, hd)
        b3 = b3.reshape(3 * n_groups, 1, pack * hd)
        wp = att["proj"]["w"].astype(dt).reshape(n_groups, pack * hd, C)
    bpb = att["proj"]["b"].astype(f32).reshape(1, C)

    from ..models.image_encoder import get_rel_pos
    rhx = get_rel_pos(H, H, att["rel_pos_h"]).astype(dt)  # (w, w, hd) [qy, ky, hd]
    rwx = get_rel_pos(W, W, att["rel_pos_w"]).astype(dt)
    # transposed-flattened [Rh^T | Rw^T] (hd, 2N) so the kernel's q-side bias
    # terms come from full-size aligned matmuls (see the kernel comment)
    rhw_t = jnp.concatenate([rhx.reshape(N, hd).T, rwx.reshape(N, hd).T],
                            axis=1)                       # (hd, 2N)

    ln1s = bp_params["norm1"]["scale"].astype(f32).reshape(1, C)
    ln1b = bp_params["norm1"]["bias"].astype(f32).reshape(1, C)
    ln2s = bp_params["norm2"]["scale"].astype(f32).reshape(1, C)
    ln2b = bp_params["norm2"]["bias"].astype(f32).reshape(1, C)
    if include_mlp:
        mlp = bp_params["mlp"]
        w1 = mlp["lin1"]["w"].astype(dt)
        b1 = mlp["lin1"]["b"].astype(f32).reshape(1, -1)
        w2 = mlp["lin2"]["w"].astype(dt)
        b2 = mlp["lin2"]["b"].astype(f32).reshape(1, C)
    else:
        # placeholder operands: the kernel's MLP branch is trace-time dead
        w1 = jnp.zeros((C, 128), dt)
        b1 = jnp.zeros((1, 128), f32)
        w2 = jnp.zeros((128, C), dt)
        b2 = jnp.zeros((1, C), f32)
    hidden = w1.shape[1]

    # one window per program measured FASTER than grouping 4 (58.9 vs 59.8
    # tiles/s): the sequential grid already pipelines small programs well,
    # and the 4x-unrolled attention bodies scheduled worse
    # one window per program measured FASTER than grouping (TPU sweeps:
    # g=1 8.9ms, g=2 9.3, g=4 9.9, g=8 9.4 per batch-8 block) — the
    # sequential grid already pipelines small programs well. Env knob kept
    # for tuning on other chip generations.
    group = int(_os.environ.get("MSAM_TPU_WINDOW_GROUP", "1"))
    if spatial_hw is not None or (BW % group != 0):
        group = 1

    interpret = jax.default_backend() == "cpu"

    # rel-pos fold constants, hoisted to resident operands (see _HOIST_CONST)
    hoist = _HOIST_CONST
    cdt = jnp.bfloat16 if dt == jnp.bfloat16 else jnp.float32
    scr_dt = cdt if dt == jnp.bfloat16 else jnp.float32
    hoist_ops, hoist_specs = (), ()
    if hoist:
        import numpy as _np
        r_ = _np.arange(N)[:, None]
        j_ = _np.arange(W)[None, :]
        rc_c = jnp.asarray(_np.concatenate(
            [(r_ // W == j_), (r_ % W == j_)], axis=1), cdt)      # (n, 2w)
        jj = _np.arange(N)[None, :]
        msk_c = jnp.asarray(_np.concatenate(
            [(r_ // W == jj // W), (r_ % W == jj // W)], axis=1), cdt)
        gr = _np.arange(2 * N)[:, None]
        gk_ = _np.arange(2 * W)[None, :]
        gat_c = jnp.asarray(
            (gr // N == gk_ // W) & (gr % W == gk_ % W), cdt)     # (2n, 2w)
        hoist_ops = (msk_c, gat_c, rc_c)

    if spatial_hw is not None:
        # pad-validity from the grid position; operand mask unused
        masked = (Hp, Wp) != tuple(spatial_hw)
        valid = jnp.ones((1, 1, 1), dt)  # placeholder operand
        kernel = functools.partial(
            _fused_block_kernel, num_heads=num_heads, w=W, scale=hd ** -0.5,
            eps=1e-6, masked=masked, group=1, pack=pack, merged=merged,
            mlp=include_mlp, spatial=tuple(spatial_hw), hoist=hoist)
        const = lambda *shape: pl.BlockSpec(
            shape, lambda *_: (0,) * len(shape))
        if merged:
            qkv_specs = [const(C, 3 * C), const(1, 3 * C)]
            proj_spec = const(C, C)
        else:
            qkv_specs = [const(3 * n_groups, C, pack * hd),
                         const(3 * n_groups, 1, pack * hd)]
            proj_spec = const(n_groups, pack * hd, C)
        # Pallas block shapes must be (8k, 128k)-divisible or equal to the
        # array dims in the last two positions — a (1, w, w, C) tile of
        # (B, Hp, Wp, C) is not. The FREE 6-D reshape
        # (B, Hp/w, w, Wp/w, w, C) makes each window an exact-dim tile, so
        # the DMA gathers it with strides and no XLA transpose materializes.
        nH, nW = Hp // H, Wp // W
        x6 = x.reshape(B_sp, nH, H, nW, W, C)
        win_spec = pl.BlockSpec((1, 1, H, 1, W, C),
                                lambda b, i, j: (b, i, 0, j, 0, 0))
        out6 = pl.pallas_call(
            kernel,
            grid=(B_sp, nH, nW),
            in_specs=[
                win_spec,
                const(1, 1, 1),
                const(1, C), const(1, C),
                *qkv_specs,
                const(hd, 2 * N),
                *((const(N, 2 * N), const(2 * N, 2 * W), const(N, 2 * W))
                  if hoist else ()),
                proj_spec, const(1, C),
                const(1, C), const(1, C),
                const(C, hidden), const(1, hidden),
                const(hidden, C), const(1, C),
            ],
            out_specs=win_spec,
            out_shape=jax.ShapeDtypeStruct((B_sp, nH, H, nW, W, C), dt),
            scratch_shapes=[pltpu.VMEM((num_heads, 1, N, hd), scr_dt)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
            interpret=interpret,
        )(x6, valid, ln1s, ln1b, w3, b3, rhw_t, *hoist_ops, wp, bpb, ln2s,
          ln2b, w1, b1, w2, b2)
        return out6.reshape(B_sp, Hp, Wp, C)

    masked = valid is not None
    if not masked:
        valid = jnp.ones((group, N, 1), dt)  # placeholder operand

    kernel = functools.partial(
        _fused_block_kernel, num_heads=num_heads, w=W, scale=hd ** -0.5,
        eps=1e-6, masked=masked, group=group, pack=pack, merged=merged,
        mlp=include_mlp, hoist=hoist)

    const = lambda *shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape))
    if merged:
        qkv_specs = [const(C, 3 * C), const(1, 3 * C)]
        proj_spec = const(C, C)
    else:
        qkv_specs = [const(3 * n_groups, C, pack * hd),
                     const(3 * n_groups, 1, pack * hd)]
        proj_spec = const(n_groups, pack * hd, C)
    return pl.pallas_call(
        kernel,
        grid=(BW // group,),
        in_specs=[
            pl.BlockSpec((group, N, C), lambda i: (i, 0, 0)),
            pl.BlockSpec((group, N, 1), (lambda i: (i, 0, 0)) if masked
                         else (lambda i: (0, 0, 0))),
            const(1, C), const(1, C),
            *qkv_specs,
            const(hd, 2 * N),
            *((const(N, 2 * N), const(2 * N, 2 * W), const(N, 2 * W))
              if hoist else ()),
            proj_spec, const(1, C),
            const(1, C), const(1, C),
            const(C, hidden), const(1, hidden),
            const(hidden, C), const(1, C),
        ],
        out_specs=pl.BlockSpec((group, N, C), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((BW, N, C), dt),
        scratch_shapes=[pltpu.VMEM((num_heads, group, N, hd), scr_dt)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(x, valid, ln1s, ln1b, w3, b3, rhw_t, *hoist_ops, wp, bpb, ln2s, ln2b,
      w1, b1, w2, b2)


def _unfused_reference(x, valid, bp_params, hw, num_heads):
    """The exact unfused composition (models/image_encoder.py run-fused
    window path) — correctness oracle and custom_vjp backward."""
    from ..models import common as cm
    from ..models.image_encoder import apply_attention

    BW, N, C = x.shape
    H, W = hw
    a = cm.layer_norm(bp_params["norm1"], x)
    if valid is not None:
        a = a * valid
    xw = x + apply_attention(bp_params["attn"], a.reshape(BW, H, W, C),
                             num_heads).reshape(BW, N, C)
    return xw + cm.mlp_block(bp_params["mlp"],
                             cm.layer_norm(bp_params["norm2"], xw))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_window_block(x, valid, bp_params, hw, num_heads):
    """x: (BW, N, C); valid: (BW, N, 1) pad mask or None. Pallas-fused on
    TPU; falls back to the unfused composition elsewhere and in backward."""
    return _fused_forward(x, valid, bp_params, hw, num_heads)


def _fwb_fwd(x, valid, bp_params, hw, num_heads):
    return fused_window_block(x, valid, bp_params, hw, num_heads), \
        (x, valid, bp_params)


def _fwb_bwd(hw, num_heads, res, g):
    x, valid, bp_params = res
    if valid is None:
        _, vjp = jax.vjp(
            lambda x_, p_: _unfused_reference(x_, None, p_, hw, num_heads),
            x, bp_params)
        dx, dp = vjp(g)
        return dx, None, dp
    _, vjp = jax.vjp(
        lambda x_, v_, p_: _unfused_reference(x_, v_, p_, hw, num_heads),
        x, valid, bp_params)
    return vjp(g)


fused_window_block.defvjp(_fwb_fwd, _fwb_bwd)


def fused_window_block_spatial(xp, bp_params, window: int, valid_hw,
                               num_heads: int):
    """Window transformer block over the PADDED spatial layout.

    xp: (B, Hp, Wp, C) with Hp/Wp multiples of ``window``; valid_hw = the
    true (H, W) before padding. Each grid program reads its (window, window,
    C) tile straight out of the spatial array, so the per-run HBM
    partition/unpartition transposes of the token-layout path (measured
    ~2.1 ms per 5-block vit_l run, batch 4) never materialize, and the pad
    mask is derived from the program ids instead of riding as an operand.

    Inference-only (the encoder's remat/training path uses the unfused
    composition with the flash-attention backward); numerics match
    fused_window_block on the same windows bit-for-bit — the kernel body is
    shared."""
    return _fused_forward(xp, None, bp_params, (window, window), num_heads,
                          spatial_hw=tuple(valid_hw))


def _unfused_window_attn_half(x, valid, bp_params, hw, num_heads):
    """x + attention(LN1(x) * valid) — the attention half of the window
    block; correctness oracle and custom_vjp backward for
    fused_window_attn."""
    from ..models import common as cm
    from ..models.image_encoder import apply_attention

    BW, N, C = x.shape
    H, W = hw
    a = cm.layer_norm(bp_params["norm1"], x)
    if valid is not None:
        a = a * valid
    return x + apply_attention(bp_params["attn"], a.reshape(BW, H, W, C),
                               num_heads).reshape(BW, N, C)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_window_attn(x, valid, bp_params, hw, num_heads):
    """Attention-only window kernel: x + attn(LN1(x)*valid), with LN2 + MLP
    left to the caller (XLA runs them dense over the whole (BW*N, C) row
    space instead of per-196-row programs).

    Measured on the chip (development/ab_attn_only.py, batch 4 bf16) and NOT
    defaulted: vit_l 29.9 vs 34.3 tiles/s fused-full, vit_h 17.0 vs 17.2 —
    the extra HBM round-trip of the (BW*N, C) intermediate outweighs the
    MXU-row win; Mosaic already pipelines the per-window MLP matmuls across
    programs. Kept behind MSAM_TPU_WINDOW_ATTN_ONLY=1 for future geometries
    (and as the building block the PEFT-wrapped path could reuse)."""
    return _fused_forward(x, valid, bp_params, hw, num_heads,
                          include_mlp=False)


def _fwa_fwd(x, valid, bp_params, hw, num_heads):
    return fused_window_attn(x, valid, bp_params, hw, num_heads), \
        (x, valid, bp_params)


def _fwa_bwd(hw, num_heads, res, g):
    x, valid, bp_params = res
    if valid is None:
        _, vjp = jax.vjp(
            lambda x_, p_: _unfused_window_attn_half(x_, None, p_, hw,
                                                     num_heads),
            x, bp_params)
        dx, dp = vjp(g)
        return dx, None, dp
    _, vjp = jax.vjp(
        lambda x_, v_, p_: _unfused_window_attn_half(x_, v_, p_, hw,
                                                     num_heads),
        x, valid, bp_params)
    return vjp(g)


fused_window_attn.defvjp(_fwa_fwd, _fwa_bwd)


# ---------------------------------------------------------------------------
# Fused GLOBAL transformer block: one program per image, flash-style q-block
# loop inside (k/v for all N=4096 tokens fit in VMEM, so the softmax is a
# single pass per q block — no online accumulation needed)
# ---------------------------------------------------------------------------

def _fused_global_kernel(x_ref, ln1s_ref, ln1b_ref, w3h_ref, b3h_ref,
                         rh_ref, rw_ref, wph_ref, bp_ref, ln2s_ref, ln2b_ref,
                         w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
                         a_scr, o_acc, q_scr, k_scr, v_scr, *,
                         num_heads: int, w: int, scale: float, eps: float,
                         block_q: int, block_m: int, pack: int,
                         mlp: bool = True):
    """Global-attention block, one grid step per (image, head).

    Heads ride the GRID instead of an in-kernel fori_loop so Mosaic pipelines
    the per-head weight loads against compute and schedules across steps; the
    per-head attention output is projected and accumulated straight into a
    persistent (N, C) f32 scratch (no per-head attention buffer, no separate
    proj pass). LN1 runs once per image (first head step), LN2+MLP on the
    last.

    Scoped-VMEM discipline (the round-1 AND round-2 driver benches both hit
    fresh-compile OOMs here; warm compile caches mask regressions): every
    full-image stage is chunked over block_m/block_q rows, the qkv stage
    streams a_scr row-chunks into k/v scratches instead of materializing the
    (N, C) LN1 copy as a value, and the bf16 path keeps logits and bias in
    bf16 end-to-end (the MXU still accumulates f32 internally; only the
    stored tile is bf16). Together these hold the scoped stack ~25 MB under
    the ~104 MB hardware cap — validated with a cold compilation cache.
    """
    hp = pl.program_id(1)
    _, n, c = x_ref.shape
    hd = q_scr.shape[1] // pack
    n_groups = num_heads // pack
    rk = n // w

    @pl.when(hp == 0)
    def _prepare():
        # LN1 into the bf16 scratch + zero the proj accumulator, chunked
        def ln1_body(mi, _):
            rows = pl.ds(mi * block_m, block_m)
            x = x_ref[0, rows, :].astype(jnp.float32)
            mean = jnp.mean(x, axis=-1, keepdims=True)
            var = jnp.var(x, axis=-1, keepdims=True)
            a = (x - mean) * jax.lax.rsqrt(var + eps)
            a_scr[rows, :] = (a * ln1s_ref[0] + ln1b_ref[0]).astype(a_scr.dtype)
            o_acc[rows, :] = jnp.zeros((block_m, c), jnp.float32)
            return 0

        jax.lax.fori_loop(0, n // block_m, ln1_body, 0)

    # combined 0/1 expansion matrix, TRANSPOSED to (n, rk + w) so it can be
    # concatenated onto k and the logits come out of ONE matmul:
    #   logits = [q*scale | q_rh | q_rw] @ [k | rows^T | cols^T]^T, K = hd+rk+w.
    # One K=192 contraction replaces the K=64 qk matmul (hd=64 ran the MXU at
    # half rate) and the K=128 bias-expansion matmul, and halves the scoped
    # f32 (BQ, N) temporaries from two to one.
    fast = x_ref.dtype == jnp.bfloat16
    cdt = jnp.bfloat16 if fast else jnp.float32
    # built arithmetically (max(1 - |a - b|, 0) is exactly the 0/1 equality
    # indicator for integers): Mosaic rejects the i1 comparison vectors at
    # this (n, small) layout with relayout/bitcast errors
    ar = jax.lax.broadcasted_iota(jnp.int32, (n, rk), 0) // w
    br = jax.lax.broadcasted_iota(jnp.int32, (n, rk), 1)
    expand_rows_t = jnp.maximum(
        1.0 - jnp.abs((ar - br).astype(jnp.float32)), 0.0).astype(cdt)
    aw = jax.lax.broadcasted_iota(jnp.int32, (n, w), 0) % w
    bw = jax.lax.broadcasted_iota(jnp.int32, (n, w), 1)
    tile_cols_t = jnp.maximum(
        1.0 - jnp.abs((aw - bw).astype(jnp.float32)), 0.0).astype(cdt)
    expand_t = jnp.concatenate(
        [expand_rows_t, tile_cols_t], axis=1)            # (n, rk + w)
    rw = rw_ref[:].astype(jnp.float32)
    rq = block_q // w

    # this head's qkv, chunked over block_m token rows: streaming a_scr
    # row-chunks keeps the scoped stack free of the full (N, C) LN1 value
    # (that single temporary was 6.3 MB of the round-2 fresh-compile OOM).
    # q/k/v ride in scratch refs because Mosaic can't dynamic_slice VALUES
    # and the q-block loop below slices per block_q rows.
    def qkv_body(mi, _):
        rows = pl.ds(mi * block_m, block_m)
        ac = a_scr[rows, :]
        q_scr[rows, :] = jax.lax.dot_general(            # (bm, hd) f32
            ac, w3h_ref[0, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b3h_ref[0, 0]
        k_scr[rows, :] = (jax.lax.dot_general(
            ac, w3h_ref[0, 1], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b3h_ref[0, 1]).astype(k_scr.dtype)
        v_scr[rows, :] = (jax.lax.dot_general(
            ac, w3h_ref[0, 2], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b3h_ref[0, 2]).astype(v_scr.dtype)
        return 0

    jax.lax.fori_loop(0, n // block_m, qkv_body, 0)
    # per-head key-side operands of the combined logits matmul (static lane
    # slices of the packed k slab): each is (N, hd + rk + w)
    k_slab = k_scr[...]
    kes = [
        jnp.concatenate(
            [k_slab[:, d * hd:(d + 1) * hd].astype(cdt), expand_t], axis=1)
        for d in range(pack)
    ]
    v_slab = v_scr[...]                                  # (N, pack*hd)
    wp = wph_ref[0]                                      # (pack*hd, C)

    def q_body(qi, __):
        rows = pl.ds(qi * block_q, block_q)
        q_packed = q_scr[rows, :]                        # (BQ, pack*hd) f32
        rh_blk = rh_ref[pl.ds(qi * rq, rq), :, :].astype(jnp.float32)
        ovs = []
        for d in range(pack):                            # static unroll
            qb = q_packed[:, d * hd:(d + 1) * hd]
            q_rows = qb.reshape(rq, w, hd)
            q_rh = jax.lax.dot_general(                  # (RQ, W, RK=rk)
                q_rows, rh_blk, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            q_rw = jax.lax.dot_general(                  # (W, RQ, W)
                q_rows.transpose(1, 0, 2), rw, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).transpose(1, 0, 2)
            qfull = jnp.concatenate(
                [(qb * scale).astype(cdt),
                 q_rh.reshape(block_q, rk).astype(cdt),
                 q_rw.reshape(block_q, w).astype(cdt)],
                axis=1)                                  # (BQ, hd + rk + w)
            logits = jax.lax.dot_general(                # (BQ, N) f32
                qfull, kes[d], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            vd = v_slab[:, d * hd:(d + 1) * hd]
            if x_ref.dtype == jnp.bfloat16 and _SKIPMAX:
                # skip-max softmax: a FIXED offset replaces the per-row max,
                # deleting the max-reduction pass over the f32 (BQ, N) logits
                # (softmax is shift-invariant; exp runs in f32 so the shifted
                # argument costs no precision, then probs store bf16 for the
                # MXU pass — same cast error class as the max-sub branch).
                # The clamp bounds exp at e^60 so even pathological logits
                # (> ~76) cannot overflow the f32 row sum or the bf16 probs;
                # for all realistic logit ranges it is exact softmax.
                z = jnp.minimum(logits - _SKIPMAX_OFFSET, _SKIPMAX_CLAMP)
                pr = jnp.exp(z).astype(jnp.bfloat16)
                # guard: all-underflowed rows (max logit ~87 below the
                # offset) give ~0 output instead of 0/0 NaNs
                s = jnp.maximum(jnp.sum(
                    pr.astype(jnp.float32), axis=-1, keepdims=True), 1e-20)
                ov = jax.lax.dot_general(
                    pr, vd, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * (1.0 / s)
            elif x_ref.dtype == jnp.bfloat16:
                # bf16 fast softmax: bf16 exp + bf16 probs @ v on the MXU,
                # f32 row sums, normalization after the matmul (distributive)
                m = jnp.max(logits, axis=-1, keepdims=True)
                pr = jnp.exp((logits - m).astype(jnp.bfloat16))
                s = jnp.sum(pr.astype(jnp.float32), axis=-1, keepdims=True)
                ov = jax.lax.dot_general(
                    pr, vd, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * (1.0 / s)
            else:
                m = jnp.max(logits, axis=-1, keepdims=True)
                pr = jnp.exp(logits - m)
                pr = pr / jnp.sum(pr, axis=-1, keepdims=True)
                ov = jax.lax.dot_general(
                    pr, vd.astype(jnp.float32), (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            ovs.append(ov)
        # lane-concat the pack's heads and project with ONE K=pack*hd matmul
        slab = (jnp.concatenate(ovs, axis=1) if pack > 1 else ovs[0])
        o_acc[rows, :] = o_acc[rows, :] + jax.lax.dot_general(
            slab.astype(x_ref.dtype), wp, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return 0

    jax.lax.fori_loop(0, n // block_q, q_body, 0)

    @pl.when(hp == n_groups - 1)
    def _finish():
        # residual (+ LN2 + MLP + residual when the MLP is fused), chunked
        # over token rows. mlp=False is the attention-only variant for
        # channel widths whose resident MLP weights exceed scoped VMEM
        # (vit_h: 26 MB) — the caller runs LN2+MLP through XLA instead.
        def mlp_body(mi, _):
            rows = pl.ds(mi * block_m, block_m)
            x1 = x_ref[0, rows, :].astype(jnp.float32) + o_acc[rows, :] + bp_ref[0]
            if not mlp:
                o_ref[0, rows, :] = x1.astype(o_ref.dtype)
                return 0
            mean2 = jnp.mean(x1, axis=-1, keepdims=True)
            var2 = jnp.var(x1, axis=-1, keepdims=True)
            b = (x1 - mean2) * jax.lax.rsqrt(var2 + eps)
            b = (b * ln2s_ref[0] + ln2b_ref[0]).astype(x_ref.dtype)
            h1 = jax.lax.dot_general(
                b, w1_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + b1_ref[0]
            h1 = h1 * 0.5 * (1.0 + _erf_poly(h1 * 0.7071067811865476))
            out = jax.lax.dot_general(
                h1.astype(x_ref.dtype), w2_ref[...],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + b2_ref[0]
            o_ref[0, rows, :] = (x1 + out).astype(o_ref.dtype)
            return 0

        jax.lax.fori_loop(0, n // block_m, mlp_body, 0)


def _fused_global_forward(x, bp_params, hw, num_heads, block_q=None, block_m=None,
                          include_mlp=True):
    """x: (B, N, C) full-image tokens (global-attention block). With
    include_mlp=False only LN1 + qkv + attention + proj + residual run in the
    kernel (output = x + attn); the caller applies LN2 + MLP through XLA —
    the variant for channel widths whose resident MLP weights exceed scoped
    VMEM (vit_h: 26 MB)."""
    B, N, C = x.shape
    H, W = hw
    if block_q is None:
        hidden_dim = bp_params["mlp"]["lin1"]["w"].shape[-1]
        cfg = (global_block_config(
                   H, W, x.dtype, channels=x.shape[-1], mlp_hidden=hidden_dim,
                   num_heads=num_heads) if include_mlp
               else global_attn_config(
                   H, W, x.dtype, channels=x.shape[-1], num_heads=num_heads))
        if cfg is None:
            # The caller's gate may have used global_block_config without the
            # channel geometry (its channels/mlp_hidden default to vit_b), so
            # a wider model can pass the gate yet not fit scoped VMEM here.
            # Fall back to the unfused composition instead of crashing — it
            # measured within 10% of the fused kernel anyway.
            if include_mlp:
                return _unfused_reference(x, None, bp_params, hw, num_heads)
            return _unfused_attn_half(x, bp_params, hw, num_heads)
        block_q, block_m = cfg
    assert N == H * W
    assert block_q % W == 0 and N % block_q == 0 and N % block_m == 0
    assert block_q % 8 == 0
    hd = C // num_heads
    dt = x.dtype
    f32 = jnp.float32

    att = bp_params["attn"]
    # heads ride the grid in PACKS so the qkv/proj matmuls span pack*hd >=
    # 128 lanes (hd=64 alone halves the MXU column width)
    pack = 2 if (hd * 2 <= 128 and num_heads % 2 == 0) else 1
    n_groups = num_heads // pack
    # (C, 3C) -> (nG, 3, C, pack*hd): one packed (q, k, v) slab per grid step
    w3 = att["qkv"]["w"].astype(dt).reshape(C, 3, n_groups, pack, hd)
    w3 = w3.transpose(2, 1, 0, 3, 4).reshape(n_groups, 3, C, pack * hd)
    b3 = att["qkv"]["b"].astype(f32).reshape(3, n_groups, pack * hd)
    b3 = b3.transpose(1, 0, 2).reshape(n_groups, 3, 1, pack * hd)
    wp = att["proj"]["w"].astype(dt).reshape(n_groups, pack * hd, C)
    bpb = att["proj"]["b"].astype(f32).reshape(1, C)

    from ..models.image_encoder import get_rel_pos
    rh = get_rel_pos(H, H, att["rel_pos_h"]).astype(dt)
    rw = get_rel_pos(W, W, att["rel_pos_w"]).astype(dt)

    ln1s = bp_params["norm1"]["scale"].astype(f32).reshape(1, C)
    ln1b = bp_params["norm1"]["bias"].astype(f32).reshape(1, C)
    ln2s = bp_params["norm2"]["scale"].astype(f32).reshape(1, C)
    ln2b = bp_params["norm2"]["bias"].astype(f32).reshape(1, C)
    if include_mlp:
        mlp = bp_params["mlp"]
        w1 = mlp["lin1"]["w"].astype(dt)
        b1 = mlp["lin1"]["b"].astype(f32).reshape(1, -1)
        w2 = mlp["lin2"]["w"].astype(dt)
        b2 = mlp["lin2"]["b"].astype(f32).reshape(1, C)
    else:
        # placeholder operands: the kernel's MLP branch is trace-time dead
        w1 = jnp.zeros((C, 128), dt)
        b1 = jnp.zeros((1, 128), f32)
        w2 = jnp.zeros((128, C), dt)
        b2 = jnp.zeros((1, C), f32)
    hidden = w1.shape[1]

    if pack == 2 and block_q == 512 and \
            _os.environ.get("MSAM_TPU_GLOBAL_BQ512", "1") == "0":
        # opt-out escape: two statically unrolled heads double the per-q-block
        # temporaries (~+12.6 MB scoped at vit_b); 512 measured +0.7% encoder
        # throughput over 256 post-skipmax and fits the budget with ~18 MB
        # headroom (cold-compile validated), so it is the default now
        block_q = 256
        rq_ok = block_q % W == 0 and N % block_q == 0
        if not rq_ok:
            block_q = 512
    kernel = functools.partial(
        _fused_global_kernel, num_heads=num_heads, w=W, scale=hd ** -0.5,
        eps=1e-6, block_q=block_q, block_m=block_m, pack=pack,
        mlp=include_mlp)
    interpret = jax.default_backend() == "cpu"

    const = lambda *shape: pl.BlockSpec(shape, lambda i, h: (0,) * len(shape))
    return pl.pallas_call(
        kernel,
        grid=(B, n_groups),
        in_specs=[
            pl.BlockSpec((1, N, C), lambda i, h: (i, 0, 0)),
            const(1, C), const(1, C),
            pl.BlockSpec((1, 3, C, pack * hd), lambda i, h: (h, 0, 0, 0)),
            pl.BlockSpec((1, 3, 1, pack * hd), lambda i, h: (h, 0, 0, 0)),
            const(H, H, hd), const(W, W, hd),
            pl.BlockSpec((1, pack * hd, C), lambda i, h: (h, 0, 0)),
            const(1, C),
            const(1, C), const(1, C),
            const(C, hidden), const(1, hidden),
            const(hidden, C), const(1, C),
        ],
        out_specs=pl.BlockSpec((1, N, C), lambda i, h: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, N, C), dt),
        scratch_shapes=[
            pltpu.VMEM((N, C), dt),                      # a = LN1(x)
            pltpu.VMEM((N, C), jnp.float32),             # proj accumulator
            pltpu.VMEM((N, pack * hd), jnp.float32),     # packed q
            pltpu.VMEM((N, pack * hd), jnp.bfloat16 if dt == jnp.bfloat16
                       else jnp.float32),                # packed k
            pltpu.VMEM((N, pack * hd), dt),              # packed v
        ],
        # request WELL below the ~104-106 MB hardware cap: the round-2 driver
        # bench OOMed on a fresh compile with a 1.2 MB margin. If an edit
        # regrows the scoped stack past this, the compile fails loudly at the
        # same budget cold or warm instead of depending on the compile cache.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(x, ln1s, ln1b, w3, b3, rh, rw, wp, bpb, ln2s, ln2b, w1, b1, w2, b2)


def global_block_config(H: int, W: int, dtype=None, channels=None,
                        mlp_hidden=None, num_heads=None):
    """(block_q, block_m) for the fused global kernel, or None if the token
    grid doesn't satisfy the kernel's tiling constraints or the scratch
    working set cannot fit scoped VMEM.

    The f32 working set at N=4096 (a/attn/q scratches + MLP weights + the
    staged residual) needs ~108 MB of scoped VMEM vs the ~106 MB ceiling —
    only the bf16 variant fits at full vit resolution (found by driving the
    float32 path end-to-end; the bf16-only round-1 validation missed it).
    f32 callers fall back to the unfused composition, which measured at
    parity with the fused kernel anyway."""
    N = H * W
    if dtype is not None and jnp.dtype(dtype).itemsize > 2 and N > 1024:
        return None
    if N <= 1024:
        return N, N

    # channel geometry (defaults: vit_b). Wider models need SMALLER blocks:
    # the vit_b-tuned (512, 512) choice OOMed scoped VMEM at vit_h's C=1280.
    c = 768 if channels is None else int(channels)
    hidden = 4 * c if mlp_hidden is None else int(mlp_hidden)
    hd = c // (num_heads or max(c // 64, 1))
    pack = 2 if (hd * 2 <= 128 and (num_heads or 12) % 2 == 0) else 1
    rk = N // W

    def scoped_estimate(bq, bm):
        """Rough scoped-VMEM bytes at (bq, bm): persistent scratches plus the
        larger of the q-loop / MLP transient stages plus resident operands."""
        kw = hd + rk + W                                     # combined K dim
        scratch = N * c * (2 + 4) + N * pack * hd * (4 + 2 + 2)
        ke = pack * N * kw * 2
        q_loop = pack * (bq * N * (4 + 2) + bq * kw * 2) + bq * c * 4 * 2
        mlp = bm * hidden * 4 + bm * c * 4 * 3
        io = 2 * N * c * 2 + 2 * c * hidden * 2 + 2 * H * H * hd * 2
        return scratch + ke + max(q_loop, mlp) + io

    budget = 84 * 1024 * 1024   # ~12 MB of headroom under the 96 MB request
    for bq in (512, 256, 128):
        if bq % W or N % bq or bq % 8:
            continue
        for bm in (512, 256, 128):
            if N % bm:
                continue
            if scoped_estimate(bq, bm) <= budget:
                return bq, bm
    return None


def global_attn_config(H: int, W: int, dtype=None, channels=None,
                       num_heads=None):
    """(block_q, block_m) for the ATTENTION-ONLY fused global kernel
    (include_mlp=False), or None. Same scoped-VMEM model as
    global_block_config minus the resident MLP weights and the MLP stage —
    which is exactly what lets vit_h's C=1280 geometry fit (its 26 MB MLP
    weights exceed every block choice; the attention working set does not)."""
    N = H * W
    if dtype is not None and jnp.dtype(dtype).itemsize > 2 and N > 1024:
        return None
    if N <= 1024:
        return N, N

    c = 768 if channels is None else int(channels)
    hd = c // (num_heads or max(c // 64, 1))
    pack = 2 if (hd * 2 <= 128 and (num_heads or 12) % 2 == 0) else 1
    rk = N // W

    def scoped_estimate(bq, bm):
        kw = hd + rk + W
        scratch = N * c * (2 + 4) + N * pack * hd * (4 + 2 + 2)
        ke = pack * N * kw * 2
        q_loop = pack * (bq * N * (4 + 2) + bq * kw * 2) + bq * c * 4 * 2
        io = 2 * N * c * 2 + 2 * H * H * hd * 2
        return scratch + ke + q_loop + io

    budget = 84 * 1024 * 1024
    for bq in (512, 256, 128):
        if bq % W or N % bq or bq % 8:
            continue
        for bm in (512, 256, 128):
            if N % bm:
                continue
            if scoped_estimate(bq, bm) <= budget:
                return bq, bm
    return None


def _unfused_attn_half(x, bp_params, hw, num_heads):
    """x + attention(LN1(x)) — the exact unfused attention half of a global
    block (image_encoder.apply_block minus the MLP half); correctness oracle
    and custom_vjp backward for fused_global_attn."""
    from ..models import common as cm
    from ..models.image_encoder import apply_attention

    B, N, C = x.shape
    H, W = hw
    a = cm.layer_norm(bp_params["norm1"], x)
    att = apply_attention(
        bp_params["attn"], a.reshape(B, H, W, C), num_heads)
    return x + att.reshape(B, N, C)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_global_attn(x, bp_params, hw, num_heads):
    """x: (B, N, C) -> x + attention(LN1(x)): the Pallas-fused attention half
    of a global block. For geometries whose full fused block cannot fit
    scoped VMEM (global_block_config returns None) but whose attention
    working set can (global_attn_config accepts) — the caller runs the
    remaining LN2+MLP half through XLA (image_encoder._mlp_half)."""
    return _fused_global_forward(x, bp_params, hw, num_heads,
                                 include_mlp=False)


def _fga_fwd(x, bp_params, hw, num_heads):
    return fused_global_attn(x, bp_params, hw, num_heads), (x, bp_params)


def _fga_bwd(hw, num_heads, res, g):
    x, bp_params = res
    _, vjp = jax.vjp(
        lambda x_, p_: _unfused_attn_half(x_, p_, hw, num_heads),
        x, bp_params)
    return vjp(g)


fused_global_attn.defvjp(_fga_fwd, _fga_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_global_block(x, bp_params, hw, num_heads):
    """x: (B, N, C). Pallas-fused global-attention transformer block."""
    return _fused_global_forward(x, bp_params, hw, num_heads)


def _fgb_fwd(x, bp_params, hw, num_heads):
    return fused_global_block(x, bp_params, hw, num_heads), (x, bp_params)


def _fgb_bwd(hw, num_heads, res, g):
    x, bp_params = res
    _, vjp = jax.vjp(
        lambda x_, p_: _unfused_reference(x_, None, p_, hw, num_heads),
        x, bp_params)
    return vjp(g)


fused_global_block.defvjp(_fgb_fwd, _fgb_bwd)


# ---------------------------------------------------------------------------
# Fused WINDOW-STACK transformer block: one grid step per (image, head) over
# ALL of the image's windows. The per-window kernel above runs its qkv/proj/
# MLP gemms on 196 rows (one window) — ~26% MXU occupancy; here those gemms
# run over the full window stack (25 x 196 = 4900 rows for 1024^2 inputs) and
# only the (196, 196) attention cores loop per window.
# ---------------------------------------------------------------------------

def _fused_window_stack_kernel(x_ref, valid_ref, ln1s_ref, ln1b_ref,
                               w3h_ref, b3h_ref, rhx_ref, rwx_ref,
                               wph_ref, bp_ref, ln2s_ref, ln2b_ref,
                               w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
                               a_scr, o_acc, q_scr, k_scr, v_scr, *,
                               num_heads: int, w: int, scale: float,
                               eps: float, masked: bool,
                               block_g: int, block_m: int):
    """block_g: gemm chunk in WINDOWS (large for MXU occupancy); block_m: MLP
    chunk in WINDOWS (the (rows, hidden) f32 temp bounds it). All scratches
    are (NW, N, ...) 3d so every dynamic index rides the unconstrained
    leading dim — N=196 rows are not sublane-tile aligned, so flat (NW*N, ..)
    scratches with wi*N offsets fail Mosaic's alignment rules."""
    h = pl.program_id(1)
    _, nw, n, c = x_ref.shape
    hd = q_scr.shape[2]

    @pl.when(h == 0)
    def _prepare():
        def ln1_body(wi, _):
            x = x_ref[0, wi].astype(jnp.float32)          # (N, C)
            mean = jnp.mean(x, axis=-1, keepdims=True)
            var = jnp.var(x, axis=-1, keepdims=True)
            a = (x - mean) * jax.lax.rsqrt(var + eps)
            a = a * ln1s_ref[0] + ln1b_ref[0]
            if masked:
                a = a * valid_ref[0, wi].astype(jnp.float32)
            a_scr[wi] = a.astype(a_scr.dtype)
            o_acc[wi] = jnp.zeros((n, c), jnp.float32)
            return 0

        jax.lax.fori_loop(0, nw, ln1_body, 0)

    fast = x_ref.dtype == jnp.bfloat16
    cdt = jnp.bfloat16 if fast else jnp.float32

    # qkv over big window chunks — full MXU occupancy is the point here
    def qkv_body(gi, _):
        wins = pl.ds(gi * block_g, block_g)
        ac = a_scr[wins].reshape(block_g * n, c)
        q = jax.lax.dot_general(
            ac, w3h_ref[0, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b3h_ref[0, 0]
        k = jax.lax.dot_general(
            ac, w3h_ref[0, 1], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b3h_ref[0, 1]
        v = jax.lax.dot_general(
            ac, w3h_ref[0, 2], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b3h_ref[0, 2]
        q_scr[wins] = q.reshape(block_g, n, hd)
        k_scr[wins] = k.reshape(block_g, n, hd).astype(k_scr.dtype)
        v_scr[wins] = v.reshape(block_g, n, hd).astype(v_scr.dtype)
        return 0

    jax.lax.fori_loop(0, nw // block_g, qkv_body, 0)

    rhx = rhx_ref[:]                                      # (w, hd, n) dt
    rwx = rwx_ref[:]
    wp = wph_ref[0]                                       # (hd, C)

    def attn_body(wi, _):
        qb = q_scr[wi]                                    # (N, hd) f32
        q_rows = qb.reshape(w, w, hd).astype(cdt)
        bias_h = jax.lax.dot_general(                     # (qy, qx, n)
            q_rows, rhx.astype(cdt), (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).reshape(n, n)
        bias_w = jax.lax.dot_general(                     # (qx, qy, n)
            q_rows.transpose(1, 0, 2), rwx.astype(cdt),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).transpose(1, 0, 2).reshape(n, n)
        kb = k_scr[wi]
        vb = v_scr[wi]
        logits = jax.lax.dot_general(
            (qb * scale).astype(cdt), kb.astype(cdt), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bias_h + bias_w
        m = jnp.max(logits, axis=-1, keepdims=True)
        if fast:
            pr = jnp.exp((logits - m).astype(jnp.bfloat16))
            s = jnp.sum(pr.astype(jnp.float32), axis=-1, keepdims=True)
            ov = jax.lax.dot_general(
                pr, vb, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * (1.0 / s)
        else:
            pr = jnp.exp(logits - m)
            pr = pr / jnp.sum(pr, axis=-1, keepdims=True)
            ov = jax.lax.dot_general(
                pr, vb.astype(jnp.float32), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        o_acc[wi] = o_acc[wi] + jax.lax.dot_general(
            ov.astype(x_ref.dtype), wp, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return 0

    jax.lax.fori_loop(0, nw, attn_body, 0)

    @pl.when(h == num_heads - 1)
    def _finish():
        def mlp_body(mi, _):
            wins = pl.ds(mi * block_m, block_m)
            rows = block_m * n
            xr = x_ref[0, wins].reshape(rows, c)
            x1 = xr.astype(jnp.float32) \
                + o_acc[wins].reshape(rows, c) + bp_ref[0]
            mean2 = jnp.mean(x1, axis=-1, keepdims=True)
            var2 = jnp.var(x1, axis=-1, keepdims=True)
            b = (x1 - mean2) * jax.lax.rsqrt(var2 + eps)
            b = (b * ln2s_ref[0] + ln2b_ref[0]).astype(x_ref.dtype)
            h1 = jax.lax.dot_general(
                b, w1_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + b1_ref[0]
            h1 = h1 * 0.5 * (1.0 + _erf_poly(h1 * 0.7071067811865476))
            out = jax.lax.dot_general(
                h1.astype(x_ref.dtype), w2_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + b2_ref[0]
            o_ref[0, wins] = (x1 + out).reshape(
                block_m, n, c).astype(o_ref.dtype)
            return 0

        jax.lax.fori_loop(0, nw // block_m, mlp_body, 0)


def window_stack_config(n_windows: int, n: int, c: int, hidden: int, dtype):
    """(block_g rows, block_m windows) for the window-stack kernel, or None
    when the geometry doesn't fit its constraints / scoped VMEM."""
    if jnp.dtype(dtype).itemsize > 2 and jax.default_backend() != "cpu":
        return None  # bf16 only on the real chip (f32 scratches won't fit);
        # interpret mode (CPU tests) has no VMEM limit
    tokens = n_windows * n
    # gemm chunk in WINDOWS: the largest divisor of n_windows giving <= ~1280
    # rows per chunk
    block_g = None
    for k in range(min(n_windows, max(1280 // n, 1)), 0, -1):
        if n_windows % k == 0:
            block_g = k
            break
    if block_g is None:
        return None
    # MLP chunk: bound the (rows, hidden) f32 temp to ~12 MB
    block_m = max(1, min(n_windows, (12 * 2 ** 20 // 4) // max(hidden * n, 1)))
    while n_windows % block_m:
        block_m -= 1
    # scoped-VMEM estimate (scratches + weights + the MLP temp), ~25% margin
    scratch = tokens * c * (2 + 4) + tokens * 64 * (4 + 2 + 2)
    weights = 2 * c * hidden * 2 + 2 * (n_windows and n) * 64 * n * 2
    temps = block_m * n * hidden * 4 + block_g * n * c * 2 + 4 * tokens  # rough
    io = 2 * n_windows * n * c * 2
    if scratch + weights + temps + io > 80 * 1024 * 1024:
        return None
    return block_g, block_m


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_window_stack(x, valid, bp_params, hw, num_heads, n_images):
    """x: (B*NW, N, C) window-partitioned tokens of n_images images.
    Pallas-fused with per-(image, head) grid; numerically the same block as
    fused_window_block. Backward falls back to the unfused composition."""
    return _fused_window_stack_forward(x, valid, bp_params, hw, num_heads, n_images)


def _fused_window_stack_forward(x, valid, bp_params, hw, num_heads, n_images):
    BW, N, C = x.shape
    H, W = hw
    assert N == H * W and H == W
    assert BW % n_images == 0
    NW = BW // n_images
    hd = C // num_heads
    dt = x.dtype
    f32 = jnp.float32

    att = bp_params["attn"]
    w3 = att["qkv"]["w"].astype(dt).reshape(C, 3, num_heads, hd)
    w3 = w3.transpose(2, 1, 0, 3)                        # (nh, 3, C, hd)
    b3 = att["qkv"]["b"].astype(f32).reshape(3, num_heads, 1, hd)
    b3 = b3.transpose(1, 0, 2, 3)
    wp = att["proj"]["w"].astype(dt).reshape(num_heads, hd, C)
    bpb = att["proj"]["b"].astype(f32).reshape(1, C)

    from ..models.image_encoder import get_rel_pos
    rh = get_rel_pos(H, H, att["rel_pos_h"])             # (w, w, hd)
    rw = get_rel_pos(W, W, att["rel_pos_w"])
    ky = jnp.arange(N) // W
    kx = jnp.arange(N) % W
    rhx = rh[:, ky, :].transpose(0, 2, 1).astype(dt)     # (qy, hd, n)
    rwx = rw[:, kx, :].transpose(0, 2, 1).astype(dt)

    ln1s = bp_params["norm1"]["scale"].astype(f32).reshape(1, C)
    ln1b = bp_params["norm1"]["bias"].astype(f32).reshape(1, C)
    ln2s = bp_params["norm2"]["scale"].astype(f32).reshape(1, C)
    ln2b = bp_params["norm2"]["bias"].astype(f32).reshape(1, C)
    mlp = bp_params["mlp"]
    w1 = mlp["lin1"]["w"].astype(dt)
    b1 = mlp["lin1"]["b"].astype(f32).reshape(1, -1)
    w2 = mlp["lin2"]["w"].astype(dt)
    b2 = mlp["lin2"]["b"].astype(f32).reshape(1, C)
    hidden = w1.shape[1]

    cfg = window_stack_config(NW, N, C, hidden, dt)
    assert cfg is not None, "gate on window_stack_config before calling"
    block_g, block_m = cfg

    masked = valid is not None
    xs = x.reshape(n_images, NW, N, C)
    if masked:
        vs = valid.reshape(n_images, NW, N, 1)
    else:
        # placeholder must cover a full (1, NW, N, 1) block: the BlockSpec
        # window may not exceed the operand's extent
        vs = jnp.ones((1, NW, N, 1), dt)

    kernel = functools.partial(
        _fused_window_stack_kernel, num_heads=num_heads, w=W,
        scale=hd ** -0.5, eps=1e-6, masked=masked,
        block_g=block_g, block_m=block_m)
    interpret = jax.default_backend() == "cpu"

    const = lambda *shape: pl.BlockSpec(shape, lambda i, h: (0,) * len(shape))
    tokens = NW * N
    out = pl.pallas_call(
        kernel,
        grid=(n_images, num_heads),
        in_specs=[
            pl.BlockSpec((1, NW, N, C), lambda i, h: (i, 0, 0, 0)),
            pl.BlockSpec((1, NW, N, 1), (lambda i, h: (i, 0, 0, 0)) if masked
                         else (lambda i, h: (0, 0, 0, 0))),
            const(1, C), const(1, C),
            pl.BlockSpec((1, 3, C, hd), lambda i, h: (h, 0, 0, 0)),
            pl.BlockSpec((1, 3, 1, hd), lambda i, h: (h, 0, 0, 0)),
            const(H, hd, N), const(W, hd, N),
            pl.BlockSpec((1, hd, C), lambda i, h: (h, 0, 0)),
            const(1, C),
            const(1, C), const(1, C),
            const(C, hidden), const(1, hidden),
            const(hidden, C), const(1, C),
        ],
        out_specs=pl.BlockSpec((1, NW, N, C), lambda i, h: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_images, NW, N, C), dt),
        scratch_shapes=[
            pltpu.VMEM((NW, N, C), dt),                  # a = LN1(x)
            pltpu.VMEM((NW, N, C), jnp.float32),         # proj accumulator
            pltpu.VMEM((NW, N, hd), jnp.float32),        # per-head q
            pltpu.VMEM((NW, N, hd), jnp.bfloat16 if dt == jnp.bfloat16
                       else jnp.float32),                # per-head k
            pltpu.VMEM((NW, N, hd), dt),                 # per-head v
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xs, vs, ln1s, ln1b, w3, b3, rhx, rwx, wp, bpb, ln2s, ln2b,
      w1, b1, w2, b2)
    return out.reshape(BW, N, C)


def _fws_fwd(x, valid, bp_params, hw, num_heads, n_images):
    return fused_window_stack(x, valid, bp_params, hw, num_heads, n_images), \
        (x, valid, bp_params)


def _fws_bwd(hw, num_heads, n_images, res, g):
    x, valid, bp_params = res
    if valid is None:
        _, vjp = jax.vjp(
            lambda x_, p_: _unfused_reference(x_, None, p_, hw, num_heads),
            x, bp_params)
        dx, dp = vjp(g)
        return dx, None, dp
    _, vjp = jax.vjp(
        lambda x_, v_, p_: _unfused_reference(x_, v_, p_, hw, num_heads),
        x, valid, bp_params)
    return vjp(g)


fused_window_stack.defvjp(_fws_fwd, _fws_bwd)
