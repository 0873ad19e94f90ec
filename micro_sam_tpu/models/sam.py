"""Full SAM model assembly: encoder + prompt encoder + mask decoder.

Equivalent of segment_anything.modeling.sam.Sam as built by
micro_sam/models/build_sam.py:87-142, re-designed for JAX: the model is a
config + parameter pytree; ``Sam`` bundles jitted forward functions. Layout is
NHWC, compute dtype configurable (bfloat16 on TPU).
"""
from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import common as cm
from . import image_encoder as ie
from . import prompt_encoder as pe
from . import mask_decoder as md

PIXEL_MEAN = np.array([123.675, 116.28, 103.53], dtype=np.float32)
PIXEL_STD = np.array([58.395, 57.12, 57.375], dtype=np.float32)

MASK_THRESHOLD = 0.0


@dataclass(frozen=True)
class SamConfig:
    model_type: str = "vit_b"
    encoder: str = "vit"            # "vit" or "tiny_vit"
    img_size: int = 1024
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    window_size: int = 14
    global_attn_indexes: Tuple[int, ...] = (2, 5, 8, 11)
    prompt_embed_dim: int = 256
    compute_dtype: str = "float32"

    @property
    def embedding_size(self) -> int:
        return self.img_size // self.patch_size  # 64

    @property
    def dtype(self):
        return jnp.dtype(self.compute_dtype)


def preprocess(x: jnp.ndarray, img_size: int = 1024) -> jnp.ndarray:
    """Normalize (B, h, w, 3) pixels and zero-pad to (B, img_size, img_size, 3)."""
    x = (x.astype(jnp.float32) - PIXEL_MEAN) / PIXEL_STD
    h, w = x.shape[1], x.shape[2]
    return jnp.pad(x, ((0, 0), (0, img_size - h), (0, img_size - w), (0, 0)))


def postprocess_masks(
    masks: jnp.ndarray,                  # (B, N, 256, 256) logits
    input_size: Tuple[int, int],         # pre-pad size in the 1024 frame
    original_size: Tuple[int, int],
    img_size: int = 1024,
) -> jnp.ndarray:
    """Upscale low-res mask logits to the original image size (static shapes).

    Same-shape resizes are skipped: jax.image.resize emits a full gather /
    matmul pass even at scale 1, which silently doubled the AMG decode
    program's HBM traffic whenever original_size == (img_size, img_size)."""
    B, N = masks.shape[:2]
    if masks.shape[2:] != (img_size, img_size):
        masks = jax.image.resize(
            masks, (B, N, img_size, img_size), method="bilinear")
    x = masks[:, :, : input_size[0], : input_size[1]]
    if x.shape[2:] == tuple(original_size):
        return x
    return jax.image.resize(x, (B, N) + tuple(original_size), method="bilinear")


class Sam:
    """SAM model: config + params + jitted forwards.

    Parameters live in ``self.params`` = {"image_encoder": ..., "prompt_encoder":
    ..., "mask_decoder": ...}. All methods are thin wrappers over pure functions
    so the pytree can be swapped (PEFT, finetuning) without re-tracing.
    """

    def __init__(self, config: SamConfig, params: dict):
        self.config = config
        self.params = params
        self._encode_jit = None

    # -- functional API ----------------------------------------------------
    def encode_image(self, params: dict, pixels: jnp.ndarray,
                     remat: bool = False) -> jnp.ndarray:
        """pixels: (B, 1024, 1024, 3) preprocessed -> (B, 64, 64, 256).

        remat=True checkpoints each encoder block (used by the trainers)."""
        cfg = self.config
        x = pixels.astype(cfg.dtype)
        if cfg.encoder == "tiny_vit":
            from . import tiny_vit as tv
            return tv.apply_tiny_vit(params["image_encoder"], x)
        return ie.apply_image_encoder(
            params["image_encoder"], x,
            num_heads=cfg.num_heads,
            window_size=cfg.window_size,
            global_attn_indexes=cfg.global_attn_indexes,
            patch_size=cfg.patch_size,
            remat=remat,
        )

    def decode_masks(
        self,
        params: dict,
        image_embeddings: jnp.ndarray,       # (B, 64, 64, 256)
        points: jnp.ndarray,                 # (B, P, 2)
        labels: jnp.ndarray,                 # (B, P)
        mask_input: Optional[jnp.ndarray] = None,   # (B, 256, 256, 1)
        has_mask: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (low_res_masks (B, 4, 256, 256) f32, iou_pred (B, 4) f32)."""
        cfg = self.config
        sparse, dense = pe.encode_prompts(
            params["prompt_encoder"], points, labels, mask_input, has_mask,
            input_image_size=(cfg.img_size, cfg.img_size),
            image_embedding_size=(cfg.embedding_size, cfg.embedding_size),
        )
        image_pe = pe.get_dense_pe(
            params["prompt_encoder"], (cfg.embedding_size, cfg.embedding_size)
        )
        return md.apply_mask_decoder(
            params["mask_decoder"],
            image_embeddings.astype(cfg.dtype),
            image_pe.astype(cfg.dtype),
            sparse.astype(cfg.dtype),
            dense.astype(cfg.dtype),
        )

    # -- convenience -------------------------------------------------------
    def encode_image_jit(self, pixels: jnp.ndarray) -> jnp.ndarray:
        if self._encode_jit is None:
            self._encode_jit = jax.jit(self.encode_image)
        return self._encode_jit(self.params, pixels)


def init_sam_params(key, config: SamConfig) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    if config.encoder == "tiny_vit":
        from . import tiny_vit as tv
        enc = tv.init_tiny_vit(k1, img_size=config.img_size)
    else:
        enc = ie.init_image_encoder(
            k1,
            img_size=config.img_size,
            patch_size=config.patch_size,
            embed_dim=config.embed_dim,
            depth=config.depth,
            num_heads=config.num_heads,
            mlp_ratio=config.mlp_ratio,
            out_chans=config.prompt_embed_dim,
            window_size=config.window_size,
            global_attn_indexes=config.global_attn_indexes,
        )
    return {
        "image_encoder": enc,
        "prompt_encoder": pe.init_prompt_encoder(
            k2,
            embed_dim=config.prompt_embed_dim,
            image_embedding_size=(config.embedding_size, config.embedding_size),
            input_image_size=(config.img_size, config.img_size),
        ),
        "mask_decoder": md.init_mask_decoder(k3, dim=config.prompt_embed_dim),
    }
