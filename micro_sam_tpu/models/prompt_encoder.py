"""SAM prompt encoder in functional JAX.

Encodes point / box / mask prompts into sparse and dense embeddings
(equivalent of segment_anything.modeling.prompt_encoder used throughout the
reference, e.g. micro_sam/training/trainable_sam.py:63). All shapes static:
points are passed as fixed-capacity (B, P, 2) arrays with integer labels where
label -1 = padding, 0 = negative, 1 = positive, 2/3 = box corners — matching
the reference's conventions so prompt tensors can be built identically.
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import common as cm

Params = dict

NUM_POINT_EMBEDDINGS = 4  # neg point, pos point, box corner 1, box corner 2


def init_prompt_encoder(
    key,
    embed_dim: int = 256,
    image_embedding_size: Tuple[int, int] = (64, 64),
    input_image_size: Tuple[int, int] = (1024, 1024),
    mask_in_chans: int = 16,
) -> Params:
    keys = jax.random.split(key, 12)
    p = {
        "pe_gaussian": jax.random.normal(keys[0], (2, embed_dim // 2)),
        "point_embeddings": [
            cm.init_embedding(keys[1 + i], 1, embed_dim) for i in range(NUM_POINT_EMBEDDINGS)
        ],
        "not_a_point_embed": cm.init_embedding(keys[5], 1, embed_dim),
        "no_mask_embed": cm.init_embedding(keys[6], 1, embed_dim),
        "mask_downscaling": {
            "conv1": cm.init_conv(keys[7], 2, 2, 1, mask_in_chans // 4),
            "ln1": cm.init_layer_norm(mask_in_chans // 4),
            "conv2": cm.init_conv(keys[8], 2, 2, mask_in_chans // 4, mask_in_chans),
            "ln2": cm.init_layer_norm(mask_in_chans),
            "conv3": cm.init_conv(keys[9], 1, 1, mask_in_chans, embed_dim),
        },
    }
    return p


# ---------------------------------------------------------------------------
# Positional encoding (PositionEmbeddingRandom)
# ---------------------------------------------------------------------------

def _pe_encoding(p: Params, coords: jnp.ndarray) -> jnp.ndarray:
    """coords in [0, 1]^2, shape (..., 2) -> (..., embed_dim)."""
    coords = 2 * coords - 1
    coords = jnp.dot(
        coords.astype(jnp.float32), p["pe_gaussian"].astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    coords = 2 * jnp.pi * coords
    return jnp.concatenate([jnp.sin(coords), jnp.cos(coords)], axis=-1)


def get_dense_pe(p: Params, size: Tuple[int, int] = (64, 64)) -> jnp.ndarray:
    """Dense positional encoding over the embedding grid: (H, W, C)."""
    h, w = size
    gy = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    gx = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    coords = jnp.stack(jnp.meshgrid(gx, gy, indexing="xy"), axis=-1)  # (h, w, 2) as (x, y)
    return _pe_encoding(p, coords)


def encode_points(
    p: Params,
    points: jnp.ndarray,       # (B, P, 2) xy in input-image (1024) coords
    labels: jnp.ndarray,       # (B, P) int: -1 pad, 0 neg, 1 pos, 2/3 box corners
    input_image_size: Tuple[int, int] = (1024, 1024),
) -> jnp.ndarray:
    """Sparse point embeddings: (B, P, C)."""
    coords = (points + 0.5) / jnp.array(
        [input_image_size[1], input_image_size[0]], dtype=jnp.float32
    )
    pe = _pe_encoding(p, coords)  # (B, P, C)
    lab = labels[..., None]
    # padding points (label -1): positional encoding is *replaced* by
    # not_a_point_embed; real points get pe + class embedding.
    emb = jnp.where(lab == -1, p["not_a_point_embed"]["w"][0], pe)
    for val, pe_idx in ((0, 0), (1, 1), (2, 2), (3, 3)):
        emb = emb + jnp.where(lab == val, p["point_embeddings"][pe_idx]["w"][0], 0.0)
    return emb


def encode_masks(p: Params, masks: jnp.ndarray) -> jnp.ndarray:
    """Dense mask embedding. masks: (B, 256, 256, 1) -> (B, 64, 64, C)."""
    d = p["mask_downscaling"]
    x = cm.conv2d(d["conv1"], masks, stride=2, padding="VALID")
    x = cm.gelu(cm.layer_norm_2d(d["ln1"], x))
    x = cm.conv2d(d["conv2"], x, stride=2, padding="VALID")
    x = cm.gelu(cm.layer_norm_2d(d["ln2"], x))
    return cm.conv2d(d["conv3"], x, stride=1, padding="VALID")


def no_mask_embedding(p: Params, batch: int, size: Tuple[int, int] = (64, 64)) -> jnp.ndarray:
    w = p["no_mask_embed"]["w"][0]
    return jnp.broadcast_to(w, (batch, size[0], size[1], w.shape[0]))


def encode_prompts(
    p: Params,
    points: Optional[jnp.ndarray],
    labels: Optional[jnp.ndarray],
    masks: Optional[jnp.ndarray],
    has_mask: Optional[jnp.ndarray] = None,
    input_image_size: Tuple[int, int] = (1024, 1024),
    image_embedding_size: Tuple[int, int] = (64, 64),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full prompt encoding.

    Boxes are passed as two extra points with labels 2 and 3 (the predictor
    layer does that packing), so this function only sees points+labels+masks.

    Returns (sparse (B, P, C), dense (B, 64, 64, C)).
    """
    assert points is not None and labels is not None
    sparse = encode_points(p, points, labels, input_image_size)
    B = points.shape[0]
    if masks is None:
        dense = no_mask_embedding(p, B, image_embedding_size)
    else:
        dense = encode_masks(p, masks)
        if has_mask is not None:
            nme = no_mask_embedding(p, B, image_embedding_size)
            dense = jnp.where(has_mask[:, None, None, None], dense, nme)
    return sparse, dense
