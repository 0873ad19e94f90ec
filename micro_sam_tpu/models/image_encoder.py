"""SAM ViT image encoder (vit_b / vit_l / vit_h) in functional JAX.

TPU-native re-design of the encoder the reference takes from
``segment_anything.modeling.image_encoder`` (built via
micro_sam/models/build_sam.py:87-142): patch embed (16x16 conv), absolute
position embedding, transformer blocks with 14x14 windowed attention and
decomposed relative-position bias (4 global-attention blocks), and a conv neck
to 256 channels. Layout is NHWC; all shapes are static (1024^2 input -> 64x64
tokens), so the whole forward jits into one XLA program. Attention runs through
``ops.attention`` which dispatches to a Pallas flash kernel on TPU with an XLA
einsum fallback.
"""
from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import common as cm
from ..ops.attention import attention_qkv_with_rel_pos, attention_with_rel_pos, _on_tpu

import os
_USE_FUSED_BLOCK = os.environ.get("MSAM_TPU_FUSED_BLOCK", "1") != "0"

Params = dict


# ---------------------------------------------------------------------------
# Relative position helpers
# ---------------------------------------------------------------------------

def get_rel_pos(q_size: int, k_size: int, rel_pos: jnp.ndarray) -> jnp.ndarray:
    """Gather per-offset relative positional embeddings.

    Returns (q_size, k_size, head_dim). Interpolates the table if its length
    does not match 2*max(q,k)-1 (same semantics as the torch reference).
    """
    max_rel_dist = 2 * max(q_size, k_size) - 1
    if rel_pos.shape[0] != max_rel_dist:
        rel_pos = jax.image.resize(
            rel_pos.astype(jnp.float32), (max_rel_dist, rel_pos.shape[1]), method="linear"
        )
    q_coords = np.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = np.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    relative_coords = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return jnp.take(rel_pos, jnp.asarray(relative_coords, dtype=jnp.int32), axis=0)


def window_partition(x: jnp.ndarray, window: int) -> Tuple[jnp.ndarray, Tuple[int, int]]:
    """(B, H, W, C) -> (B * nWin, win, win, C), zero-padding H/W to multiples."""
    B, H, W, C = x.shape
    pad_h = (window - H % window) % window
    pad_w = (window - W % window) % window
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    Hp, Wp = H + pad_h, W + pad_w
    x = x.reshape(B, Hp // window, window, Wp // window, window, C)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window, window, C)
    return x, (Hp, Wp)


def window_unpartition(
    x: jnp.ndarray, window: int, pad_hw: Tuple[int, int], hw: Tuple[int, int]
) -> jnp.ndarray:
    Hp, Wp = pad_hw
    H, W = hw
    B = x.shape[0] // ((Hp // window) * (Wp // window))
    x = x.reshape(B, Hp // window, Wp // window, window, window, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, -1)
    return x[:, :H, :W, :]


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def init_attention(key, dim: int, num_heads: int, input_size: Tuple[int, int],
                   use_rel_pos: bool = True) -> Params:
    k1, k2 = jax.random.split(key)
    head_dim = dim // num_heads
    p = {
        "qkv": cm.init_linear(k1, dim, dim * 3),
        "proj": cm.init_linear(k2, dim, dim),
    }
    if use_rel_pos:
        p["rel_pos_h"] = jnp.zeros((2 * input_size[0] - 1, head_dim))
        p["rel_pos_w"] = jnp.zeros((2 * input_size[1] - 1, head_dim))
    return p


def init_block(key, dim: int, num_heads: int, mlp_ratio: float,
               input_size: Tuple[int, int], use_rel_pos: bool = True) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "norm1": cm.init_layer_norm(dim),
        "attn": init_attention(k1, dim, num_heads, input_size, use_rel_pos),
        "norm2": cm.init_layer_norm(dim),
        "mlp": cm.init_mlp_block(k2, dim, int(dim * mlp_ratio)),
    }


def init_image_encoder(
    key,
    img_size: int = 1024,
    patch_size: int = 16,
    embed_dim: int = 768,
    depth: int = 12,
    num_heads: int = 12,
    mlp_ratio: float = 4.0,
    out_chans: int = 256,
    window_size: int = 14,
    global_attn_indexes: Sequence[int] = (2, 5, 8, 11),
    use_rel_pos: bool = True,
    use_abs_pos: bool = True,
) -> Params:
    keys = jax.random.split(key, depth + 4)
    grid = img_size // patch_size
    p = {
        "patch_embed": cm.init_conv(keys[0], patch_size, patch_size, 3, embed_dim),
        "blocks": [],
        "neck": {
            "conv1": cm.init_conv(keys[1], 1, 1, embed_dim, out_chans, bias=False),
            "ln1": cm.init_layer_norm(out_chans),
            "conv2": cm.init_conv(keys[2], 3, 3, out_chans, out_chans, bias=False),
            "ln2": cm.init_layer_norm(out_chans),
        },
    }
    if use_abs_pos:
        p["pos_embed"] = jnp.zeros((1, grid, grid, embed_dim))
    for i in range(depth):
        ws = 0 if i in global_attn_indexes else window_size
        input_size = (grid, grid) if ws == 0 else (ws, ws)
        p["blocks"].append(
            init_block(keys[3 + i], embed_dim, num_heads, mlp_ratio, input_size, use_rel_pos)
        )
    return p


# ---------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------

def apply_attention(p: Params, x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """Windowed / global multi-head attention with decomposed rel-pos bias.

    x: (B, H, W, C) where B folds the window batch.
    """
    B, H, W, C = x.shape
    head_dim = C // num_heads
    xf = x.reshape(B, H * W, C)
    qkv = cm.linear(p["qkv"], xf)

    # PEFT low-rank / factorized updates on q, k, v (models/peft_sam.py)
    if "lora" in p:
        deltas = []
        for part in ("q", "k", "v"):
            if part in p["lora"]:
                la = p["lora"][part]
                d = cm.linear({"w": la["a"]}, xf)
                d = cm.linear({"w": la["b"]}, d)
            else:
                d = jnp.zeros_like(xf)
            deltas.append(d)
        qkv = qkv + jnp.concatenate(deltas, axis=-1)
    if "fact" in p:
        # shared-core factorization is resolved by the caller placing
        # fact_u/fact_v in scope via closure; per-layer scales live here
        fu, fv = p["fact"]["_u"], p["fact"]["_v"]
        dq = cm.linear({"w": fu * p["fact"]["q_scale"]}, xf)
        dq = cm.linear({"w": fv}, dq)
        dv = cm.linear({"w": fu * p["fact"]["v_scale"]}, xf)
        dv = cm.linear({"w": fv}, dv)
        qkv = qkv + jnp.concatenate([dq, jnp.zeros_like(dq), dv], axis=-1)

    rel_h = rel_w = None
    if "rel_pos_h" in p:
        rel_h = get_rel_pos(H, H, p["rel_pos_h"])  # (H, H, hd)
        rel_w = get_rel_pos(W, W, p["rel_pos_w"])  # (W, W, hd)

    # (B, N, 3C) -> (B, 3, nH, N, hd): head-major layout for the fused kernel
    # (XLA folds the layout change into surrounding ops; the kernel then reads
    # q/k/v as views with zero extra copies)
    qkv = qkv.reshape(B, H * W, 3, num_heads, head_dim).transpose(0, 2, 3, 1, 4)
    out = attention_qkv_with_rel_pos(qkv, (H, W), rel_h, rel_w)  # (B, nH, N, hd)
    # project straight from the head-major layout: the (h, d) contraction lets
    # XLA absorb the head->token transpose into the matmul
    wp = cm.dense_weight(p["proj"]).astype(out.dtype).reshape(num_heads, head_dim, C)
    y = jnp.einsum("bhnd,hdc->bnc", out, wp, preferred_element_type=jnp.float32)
    y = (y + p["proj"]["b"]).astype(out.dtype)
    return y.reshape(B, H, W, C)


def _mlp_half(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """x + mlp(norm2(x)). (A hand-fused Pallas variant of this chain was
    benchmarked and measured no win — XLA already fuses it — so the plain
    exact path stays wired.)"""
    return x + cm.mlp_block(p["mlp"], cm.layer_norm(p["norm2"], x))


def apply_block(p: Params, x: jnp.ndarray, num_heads: int, window_size: int) -> jnp.ndarray:
    shortcut = x
    x = cm.layer_norm(p["norm1"], x)
    if window_size > 0:
        H, W = x.shape[1], x.shape[2]
        x, pad_hw = window_partition(x, window_size)
        x = apply_attention(p["attn"], x, num_heads)
        x = window_unpartition(x, window_size, pad_hw, (H, W))
    else:
        x = apply_attention(p["attn"], x, num_heads)
    x = shortcut + x
    return _mlp_half(p, x)


def apply_image_encoder(
    p: Params,
    x: jnp.ndarray,
    num_heads: int,
    window_size: int = 14,
    global_attn_indexes: Sequence[int] = (2, 5, 8, 11),
    patch_size: int = 16,
    remat: bool = False,
) -> jnp.ndarray:
    """x: (B, H, W, 3) preprocessed pixels -> (B, H/16, W/16, 256) embeddings.

    remat=True checkpoints each transformer block (training: trade ~10% extra
    forward FLOPs in backward for not storing per-block activations)."""
    # patch embed as space-to-depth + one big matmul: the stride-16 conv is
    # exactly a (ps*ps*3, D) matmul on non-overlapping patches, and XLA's conv
    # lowering ran 2.2x slower (7.16 -> 3.24 ms per batch-8 on v5e)
    B, H, W, _ = x.shape
    ps = patch_size
    w = p["patch_embed"]["w"]                      # (ps, ps, 3, D) HWIO
    xp = x.reshape(B, H // ps, ps, W // ps, ps, 3).transpose(0, 1, 3, 2, 4, 5)
    xp = xp.reshape(B, H // ps, W // ps, ps * ps * 3)
    x = jnp.dot(xp, w.reshape(-1, w.shape[-1]).astype(x.dtype),
                preferred_element_type=jnp.float32).astype(x.dtype)
    x = x + p["patch_embed"]["b"].astype(x.dtype)
    if "pos_embed" in p:
        x = x + p["pos_embed"].astype(x.dtype)

    def prep_block(bp):
        if "fact_u" in p and "fact" in bp["attn"]:
            # thread the shared FacT core into the block (PEFT)
            bp = dict(bp, attn=dict(bp["attn"], fact=dict(
                bp["attn"]["fact"], _u=p["fact_u"], _v=p["fact_v"])))
        return bp

    # Runs of consecutive windowed blocks stay in window layout: LN/MLP/
    # residuals are per-token, so only one partition/unpartition shuffle per
    # run is needed (vit_b: 4 runs of 2 instead of 8 round trips). To stay
    # bit-equivalent with per-block partitioning, the norm1 output is zeroed
    # at pad positions (the reference pads *after* norm1 with zeros; a zero
    # attention input contributes only the qkv bias, same as here).
    glob = set(tuple(global_attn_indexes))
    depth = len(p["blocks"])
    H, W = x.shape[1], x.shape[2]

    def global_block(bp, x):
        return apply_block(bp, x, num_heads, 0)

    def window_block_masked(bp, xw, valid):
        a = cm.layer_norm(bp["norm1"], xw)
        if valid is not None:
            a = a * valid
        xw = xw + apply_attention(bp["attn"], a, num_heads)
        return _mlp_half(bp, xw)

    if remat:
        global_block = jax.checkpoint(global_block)
        window_block_masked = jax.checkpoint(window_block_masked, static_argnums=())

    i = 0
    while i < depth:
        if i in glob or window_size <= 0:
            bp = prep_block(p["blocks"][i])
            fused_ok = (_USE_FUSED_BLOCK and not remat and _on_tpu()
                        and "lora" not in bp["attn"] and "fact" not in bp["attn"]
                        and "rel_pos_h" in bp["attn"]
                        and "w" in bp["attn"]["qkv"])  # int4 layers stay unfused
            if fused_ok:
                from ..ops.fused_window_block import (
                    fused_global_block, global_block_config,
                    fused_global_attn, global_attn_config)
                Bh, Hh, Wh, Ch = x.shape
                hidden_dim = bp["mlp"]["lin1"]["w"].shape[-1]
                # A/B knob: force the attention-only global even when the
                # full block fits scoped VMEM (the resident MLP weights can
                # shrink block_q, e.g. vit_l fits (256,512) full vs (512,512)
                # attention-only)
                import os as _os2
                force_attn_only = _os2.environ.get(
                    "MSAM_TPU_GLOBAL_ATTN_ONLY", "0") == "1"
                if not force_attn_only and global_block_config(
                        Hh, Wh, x.dtype, channels=Ch, mlp_hidden=hidden_dim,
                        num_heads=num_heads) is not None:
                    x2 = fused_global_block(
                        x.reshape(Bh, Hh * Wh, Ch), bp, (Hh, Wh), num_heads)
                    x = x2.reshape(Bh, Hh, Wh, Ch)
                    i += 1
                    continue
                if global_attn_config(Hh, Wh, x.dtype, channels=Ch,
                                      num_heads=num_heads) is not None:
                    # attention-only fused global (vit_h: the 26 MB resident
                    # MLP weights exceed every scoped-VMEM block choice, the
                    # attention working set fits) + the XLA MLP half
                    x2 = fused_global_attn(
                        x.reshape(Bh, Hh * Wh, Ch), bp, (Hh, Wh), num_heads)
                    x2 = _mlp_half(bp, x2)
                    x = x2.reshape(Bh, Hh, Wh, Ch)
                    i += 1
                    continue
            x = global_block(bp, x)
            i += 1
            continue
        j = i
        while j < depth and j not in glob:
            j += 1
        import os as _os0
        run_blocks = [prep_block(p["blocks"][k]) for k in range(i, j)]
        kernel_ok = [("lora" not in bp["attn"] and "fact" not in bp["attn"]
                      and "rel_pos_h" in bp["attn"]
                      and "w" in bp["attn"]["qkv"]) for bp in run_blocks]
        # spatial window path (opt-in): each kernel program reads its
        # (ws, ws, C) tile straight from the padded spatial array, so the
        # partition/unpartition HBM transposes below never materialize.
        # Measured SLOWER on v5e and therefore NOT defaulted (vit_b 92.1 vs
        # 91.0, vit_l 122.2 vs 120.2, vit_h 240.4 vs 236.5 ms/batch): the
        # per-window strided DMA (14 chunks with a 70*C row stride) loses
        # more than the XLA transposes cost. Kept behind the env knob for
        # chips where the tradeoff flips.
        if (_USE_FUSED_BLOCK and not remat and _on_tpu() and all(kernel_ok)
                and _os0.environ.get("MSAM_TPU_SPATIAL_WINDOW", "0") == "1"
                and _os0.environ.get("MSAM_TPU_WINDOW_STACK", "0") != "1"
                and _os0.environ.get("MSAM_TPU_WINDOW_ATTN_ONLY", "0") != "1"):
            from ..ops.fused_window_block import fused_window_block_spatial
            ws = window_size
            pad_h, pad_w = (-H) % ws, (-W) % ws
            xp = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0))) \
                if (pad_h or pad_w) else x
            for bp in run_blocks:
                xp = fused_window_block_spatial(xp, bp, ws, (H, W), num_heads)
            x = xp[:, :H, :W, :] if (pad_h or pad_w) else xp
            i = j
            continue
        xw, pad_hw = window_partition(x, window_size)
        needs_mask = pad_hw != (H, W)
        valid = None
        if needs_mask:
            valid, _ = window_partition(jnp.ones((x.shape[0], H, W, 1), x.dtype), window_size)
        use_fused = _USE_FUSED_BLOCK and not remat and _on_tpu()
        if use_fused:
            # whole windowed block as ONE Pallas program (see
            # ops/fused_window_block.py) — the unfused path spends more HBM
            # bandwidth on layout copies than on the math. The window-STACK
            # variant grids per (image, head) so the qkv/proj/MLP gemms run
            # over all the image's windows at once (full MXU rows); the
            # per-window kernel is the fallback for geometries it can't take.
            from ..ops.fused_window_block import (
                fused_window_block, fused_window_stack, window_stack_config,
                fused_window_attn)
            BWn, ws = xw.shape[0], window_size
            xw2 = xw.reshape(BWn, ws * ws, -1)
            valid2 = valid.reshape(BWn, ws * ws, 1) if needs_mask else None
            n_images = x.shape[0]
            hidden = p["blocks"][i]["mlp"]["lin1"]["w"].shape[-1]
            # the stack kernel measured SLOWER at vit_b geometry (12.2 vs
            # 8.9 ms/batch-8 block on v5e: the per-window grid's cross-
            # program pipelining beats its full-occupancy gemms), so it is
            # opt-in — kept for chips/geometries where the tradeoff flips
            import os as _os
            stack_ok = (_os.environ.get("MSAM_TPU_WINDOW_STACK", "0") == "1"
                        and BWn % n_images == 0
                        and window_stack_config(
                            BWn // n_images, ws * ws, xw2.shape[-1], hidden,
                            xw2.dtype) is not None)
            # attention-only kernel + XLA MLP over the whole window stack:
            # the MLP is per-token, so running it dense over (BW*196, C)
            # recovers the per-program 196-row MXU padding on 2/3 of the
            # block's FLOPs (A/B knob; see ops/fused_window_block.py)
            attn_only = _os.environ.get("MSAM_TPU_WINDOW_ATTN_ONLY", "0") == "1"
            for k in range(i, j):
                bp = prep_block(p["blocks"][k])
                if "lora" in bp["attn"] or "fact" in bp["attn"] \
                        or "rel_pos_h" not in bp["attn"] \
                        or "w" not in bp["attn"]["qkv"]:
                    a = cm.layer_norm(bp["norm1"], xw2)
                    if valid2 is not None:
                        a = a * valid2
                    att = apply_attention(
                        bp["attn"], a.reshape(BWn, ws, ws, -1), num_heads)
                    xw2 = xw2 + att.reshape(BWn, ws * ws, -1)
                    xw2 = _mlp_half(bp, xw2)
                elif stack_ok:
                    xw2 = fused_window_stack(
                        xw2, valid2, bp, (ws, ws), num_heads, n_images)
                elif attn_only:
                    xw2 = fused_window_attn(xw2, valid2, bp, (ws, ws), num_heads)
                    xw2 = _mlp_half(bp, xw2)
                else:
                    xw2 = fused_window_block(xw2, valid2, bp, (ws, ws), num_heads)
            xw = xw2.reshape(BWn, ws, ws, -1)
        else:
            for k in range(i, j):
                xw = window_block_masked(prep_block(p["blocks"][k]), xw, valid)
        x = window_unpartition(xw, window_size, pad_hw, (H, W))
        i = j
    # Neck
    x = cm.conv2d(p["neck"]["conv1"], x, stride=1, padding="VALID")
    x = cm.layer_norm_2d(p["neck"]["ln1"], x)
    x = cm.conv2d(p["neck"]["conv2"], x, stride=1, padding=1)
    x = cm.layer_norm_2d(p["neck"]["ln2"], x)
    return x
