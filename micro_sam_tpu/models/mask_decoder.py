"""SAM mask decoder (TwoWayTransformer + upscaler + hypernetworks + IoU head).

Functional JAX equivalent of segment_anything.modeling.mask_decoder /
transformer (the reference's interactive hot path, SURVEY.md §3.2). Depth-2
two-way transformer with 8 heads, 2048 MLP dim and rate-2 attention
downsampling, exactly the configuration micro_sam/models/build_sam.py:123-136
builds. The whole decode jits into a single low-latency XLA program.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from . import common as cm
from ..ops.attention import attention

Params = dict

NUM_MASK_TOKENS = 4  # 3 multimask outputs + 1 single-mask output


# ---------------------------------------------------------------------------
# Downsampling attention used inside the TwoWayTransformer
# ---------------------------------------------------------------------------

def init_attn(key, dim: int, num_heads: int, downsample_rate: int = 1) -> Params:
    internal = dim // downsample_rate
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "q": cm.init_linear(k1, dim, internal),
        "k": cm.init_linear(k2, dim, internal),
        "v": cm.init_linear(k3, dim, internal),
        "out": cm.init_linear(k4, internal, dim),
    }


def apply_attn(p: Params, q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
               nh: int = 8, q_add=None, k_add=None) -> jnp.ndarray:
    """q_add / k_add: optional POST-projection additive terms (broadcastable)
    — the folded positional encodings of _pe_proj, added after the linear
    instead of materializing (x + pe) at full batch beforehand."""
    q = cm.linear(p["q"], q)
    if q_add is not None:
        q = q + q_add
    k = cm.linear(p["k"], k)
    if k_add is not None:
        k = k + k_add
    v = cm.linear(p["v"], v)
    B, Nq, C = q.shape
    Nk = k.shape[1]
    if Nq != Nk and max(Nq, Nk) >= 1024 and min(Nq, Nk) <= 64 and C // nh <= 32:
        out = _folded_cross_attention(q, k, v, nh)
    else:
        qh = q.reshape(B, Nq, nh, C // nh)
        kh = k.reshape(B, Nk, nh, C // nh)
        vh = v.reshape(B, Nk, nh, C // nh)
        out = attention(qh, kh, vh).reshape(B, Nq, C)
    return cm.linear(p["out"], out)


def _folded_cross_attention(q, k, v, nh: int) -> jnp.ndarray:
    """Cross-attention with one side tiny (prompt tokens, <=64) and the other
    the image (4096): per-head matmuls here are (4096, 16) @ (16, 25)-class
    shapes that fill a sliver of the MXU and cost layout transposes around
    every einsum. Folding the tiny side's heads into a BLOCK-DIAGONAL operand
    (the same trick as the TinyViT window kernel, ops/fused_tiny_attention.py)
    turns each direction into dense (., C) @ (C, nh*T)-class matmuls — ~8x
    redundant FLOPs on the tiny side against zeros, at ~25x better MXU rate,
    and no head-split transposes of the (B, 4096, C) stream.

    Exact: the zero blocks contribute nothing; softmax runs per head block.
    """
    B, Nq, C = q.shape
    Nk = k.shape[1]
    hd = C // nh
    scale = hd ** -0.5
    eye = jnp.eye(nh, dtype=q.dtype)
    if Nq >= Nk:  # image queries attend to prompt tokens (cross i->t)
        kr = k.reshape(B, Nk, nh, hd)
        k_bd = jnp.einsum("blhc,gh->bgchl", kr, eye).reshape(B, C, nh * Nk)
        logits = jnp.einsum("bqc,bcl->bql", q * scale, k_bd,
                            preferred_element_type=jnp.float32)
        w = jax.nn.softmax(logits.reshape(B, Nq, nh, Nk), axis=-1)
        w = w.reshape(B, Nq, nh * Nk).astype(v.dtype)
        vr = v.reshape(B, Nk, nh, hd)
        v_bd = jnp.einsum("blhc,hg->bhlgc", vr, eye).reshape(B, nh * Nk, C)
        return jnp.einsum("bql,blc->bqc", w, v_bd,
                          preferred_element_type=jnp.float32).astype(v.dtype)
    # prompt tokens attend to the image (cross t->i): block-diagonal queries,
    # full-width av + per-head diagonal extraction
    qr = q.reshape(B, Nq, nh, hd)
    q_bd = jnp.einsum("bthc,hg->bhtgc", qr, eye).reshape(B, nh * Nq, C)
    logits = jnp.einsum("btc,bkc->btk", q_bd * scale, k,
                        preferred_element_type=jnp.float32)  # (B, nh*Nq, Nk)
    w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out_bd = jnp.einsum("btk,bkc->btc", w, v,
                        preferred_element_type=jnp.float32).astype(v.dtype)
    out5 = out_bd.reshape(B, nh, Nq, nh, hd)
    return jnp.einsum("bhtgc,hg->bthc", out5, eye).reshape(B, Nq, C)


def _plain_linear(p: Params) -> bool:
    return set(p.keys()) <= {"w", "b"}


def _pe_proj(p_lin: Params, pe_row: jnp.ndarray) -> jnp.ndarray:
    """pe_row @ W — the positional term of linear(x + pe) = linear(x) + pe@W
    (the bias is already inside linear(x)). Computed once at (1, N, internal)
    so the per-object (B, N, C) x+pe sum is never materialized: at training
    shapes (batch*objects, 4096, 256) those sums were the decoder's dominant
    HBM traffic."""
    w = p_lin["w"]
    return jnp.dot(pe_row, w.astype(pe_row.dtype),
                   preferred_element_type=jnp.float32).astype(pe_row.dtype)


# ---------------------------------------------------------------------------
# TwoWayTransformer
# ---------------------------------------------------------------------------

def init_two_way_block(key, dim: int, num_heads: int, mlp_dim: int,
                       downsample_rate: int = 2) -> Params:
    keys = jax.random.split(key, 4)
    return {
        "self_attn": init_attn(keys[0], dim, num_heads),
        "norm1": cm.init_layer_norm(dim),
        "cross_attn_t2i": init_attn(keys[1], dim, num_heads, downsample_rate),
        "norm2": cm.init_layer_norm(dim),
        "mlp": cm.init_mlp_block(keys[2], dim, mlp_dim),
        "norm3": cm.init_layer_norm(dim),
        "cross_attn_i2t": init_attn(keys[3], dim, num_heads, downsample_rate),
        "norm4": cm.init_layer_norm(dim),
    }


def apply_two_way_block(
    p: Params, queries, keys, query_pe, key_pe, skip_first_layer_pe: bool
):
    if skip_first_layer_pe:
        queries = apply_attn(p["self_attn"], queries, queries, queries)
    else:
        q = queries + query_pe
        queries = queries + apply_attn(p["self_attn"], q, q, queries)
    queries = cm.layer_norm(p["norm1"], queries, eps=1e-5)

    # the image side (keys + key_pe) is the HBM-dominant stream at training
    # shapes — fold key_pe through the projection where the params permit
    # (plain w/b linears; PEFT-wrapped ones take the materialized sum)
    q = queries + query_pe
    t2i = p["cross_attn_t2i"]
    if _plain_linear(t2i["k"]):
        att = apply_attn(t2i, q, keys, keys, k_add=_pe_proj(t2i["k"], key_pe))
    else:
        att = apply_attn(t2i, q, keys + key_pe, keys)
    queries = queries + att
    queries = cm.layer_norm(p["norm2"], queries, eps=1e-5)

    queries = queries + cm.mlp_block(p["mlp"], queries)
    queries = cm.layer_norm(p["norm3"], queries, eps=1e-5)

    q = queries + query_pe
    i2t = p["cross_attn_i2t"]
    if _plain_linear(i2t["q"]):
        att = apply_attn(i2t, keys, q, queries,
                         q_add=_pe_proj(i2t["q"], key_pe))
    else:
        att = apply_attn(i2t, keys + key_pe, q, queries)
    keys = keys + att
    keys = cm.layer_norm(p["norm4"], keys, eps=1e-5)
    return queries, keys


def init_two_way_transformer(key, depth: int = 2, dim: int = 256,
                             num_heads: int = 8, mlp_dim: int = 2048) -> Params:
    keys = jax.random.split(key, depth + 1)
    return {
        "layers": [init_two_way_block(keys[i], dim, num_heads, mlp_dim) for i in range(depth)],
        "final_attn": init_attn(keys[-1], dim, num_heads, 2),
        "norm_final": cm.init_layer_norm(dim),
    }


def apply_two_way_transformer(p: Params, image_embedding, image_pe, point_embedding):
    """image_embedding/image_pe: (B, H, W, C); point_embedding: (B, T, C)."""
    B, H, W, C = image_embedding.shape
    keys = image_embedding.reshape(B, H * W, C)
    # kept at (1, HW, C): the folded _pe_proj terms and the fallback
    # keys + key_pe both broadcast over the object batch
    key_pe = image_pe.reshape(-1, H * W, C).astype(keys.dtype)
    queries = point_embedding

    for i, lp in enumerate(p["layers"]):
        queries, keys = apply_two_way_block(
            lp, queries, keys, point_embedding, key_pe, skip_first_layer_pe=(i == 0)
        )

    q = queries + point_embedding
    fa = p["final_attn"]
    if _plain_linear(fa["k"]):
        att = apply_attn(fa, q, keys, keys, k_add=_pe_proj(fa["k"], key_pe))
    else:
        att = apply_attn(fa, q, keys + key_pe, keys)
    queries = queries + att
    queries = cm.layer_norm(p["norm_final"], queries, eps=1e-5)
    return queries, keys


# ---------------------------------------------------------------------------
# MaskDecoder
# ---------------------------------------------------------------------------

def init_mask_decoder(key, dim: int = 256, num_heads: int = 8, mlp_dim: int = 2048,
                      iou_head_depth: int = 3, iou_head_hidden: int = 256) -> Params:
    keys = jax.random.split(key, 9)
    return {
        "transformer": init_two_way_transformer(keys[0], 2, dim, num_heads, mlp_dim),
        "iou_token": cm.init_embedding(keys[1], 1, dim),
        "mask_tokens": cm.init_embedding(keys[2], NUM_MASK_TOKENS, dim),
        "upscale_conv1": cm.init_conv_transpose(keys[3], 2, 2, dim, dim // 4),
        "upscale_ln": cm.init_layer_norm(dim // 4),
        "upscale_conv2": cm.init_conv_transpose(keys[4], 2, 2, dim // 4, dim // 8),
        "hyper_mlps": [
            cm.init_mlp(keys[5 + i % 3], dim, dim, dim // 8, 3) for i in range(NUM_MASK_TOKENS)
        ],
        "iou_head": cm.init_mlp(keys[8], dim, iou_head_hidden, NUM_MASK_TOKENS, iou_head_depth),
    }


def apply_mask_decoder(
    p: Params,
    image_embeddings: jnp.ndarray,   # (B, 64, 64, 256)
    image_pe: jnp.ndarray,           # (64, 64, 256) or (1, 64, 64, 256)
    sparse_prompt: jnp.ndarray,      # (B, P, 256)
    dense_prompt: jnp.ndarray,       # (B, 64, 64, 256)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Predict all 4 masks + IoU scores. Returns (masks (B,4,256,256), iou (B,4)).

    Multimask selection (masks[:, 1:] vs masks[:, 0:1]) happens in the caller
    with static slicing, keeping this function shape-stable for jit.
    """
    B = sparse_prompt.shape[0]
    dtype = image_embeddings.dtype
    output_tokens = jnp.concatenate(
        [p["iou_token"]["w"], p["mask_tokens"]["w"]], axis=0
    ).astype(dtype)  # (5, C)
    tokens = jnp.concatenate(
        [jnp.broadcast_to(output_tokens, (B,) + output_tokens.shape),
         sparse_prompt.astype(dtype)], axis=1
    )  # (B, 5+P, C)

    src = image_embeddings + dense_prompt.astype(dtype)
    if image_pe.ndim == 3:
        image_pe = image_pe[None]
    hs, src_out = apply_two_way_transformer(p["transformer"], src, image_pe, tokens)
    iou_token_out = hs[:, 0]
    mask_tokens_out = hs[:, 1:1 + NUM_MASK_TOKENS]  # (B, 4, C)

    H, W = image_embeddings.shape[1], image_embeddings.shape[2]
    src_img = src_out.reshape(B, H, W, -1)
    up = cm.conv_transpose2d(p["upscale_conv1"], src_img, stride=2)
    up = cm.gelu(cm.layer_norm_2d(p["upscale_ln"], up))
    up = cm.gelu(cm.conv_transpose2d(p["upscale_conv2"], up, stride=2))  # (B, 4H, 4W, 32)

    hyper_in = jnp.stack(
        [cm.mlp(p["hyper_mlps"][i], mask_tokens_out[:, i]) for i in range(NUM_MASK_TOKENS)],
        axis=1,
    )  # (B, 4, 32)
    masks = jnp.einsum("bnc,bhwc->bnhw", hyper_in, up, preferred_element_type=jnp.float32)
    iou_pred = cm.mlp(p["iou_head"], iou_token_out.astype(jnp.float32))
    return masks.astype(jnp.float32), iou_pred
