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
               nh: int = 8) -> jnp.ndarray:
    q = cm.linear(p["q"], q)
    k = cm.linear(p["k"], k)
    v = cm.linear(p["v"], v)
    B, Nq, C = q.shape
    q = q.reshape(B, Nq, nh, C // nh)
    k = k.reshape(B, k.shape[1], nh, C // nh)
    v = v.reshape(B, v.shape[1], nh, C // nh)
    out = attention(q, k, v).reshape(B, Nq, C)
    return cm.linear(p["out"], out)


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

    q = queries + query_pe
    k = keys + key_pe
    queries = queries + apply_attn(p["cross_attn_t2i"], q, k, keys)
    queries = cm.layer_norm(p["norm2"], queries, eps=1e-5)

    queries = queries + cm.mlp_block(p["mlp"], queries)
    queries = cm.layer_norm(p["norm3"], queries, eps=1e-5)

    q = queries + query_pe
    k = keys + key_pe
    keys = keys + apply_attn(p["cross_attn_i2t"], k, q, queries)
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
    key_pe = image_pe.reshape(-1, H * W, C).astype(keys.dtype)
    key_pe = jnp.broadcast_to(key_pe, keys.shape)
    queries = point_embedding

    for i, lp in enumerate(p["layers"]):
        queries, keys = apply_two_way_block(
            lp, queries, keys, point_embedding, key_pe, skip_first_layer_pe=(i == 0)
        )

    q = queries + point_embedding
    k = keys + key_pe
    queries = queries + apply_attn(p["final_attn"], q, k, keys)
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
