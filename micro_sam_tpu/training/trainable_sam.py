"""Trainable SAM wrapper: batched forward over images + per-object prompts.

Counterpart of micro_sam/training/trainable_sam.py. In JAX the "module" is a
bundle of pure functions over the param pytree; the encoder runs once per
batch (image_embeddings_oft semantics, reference trainable_sam.py:49) and the
decoder is applied to all sampled objects of all images in one batched call.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.sam import Sam, SamConfig, preprocess


class TrainableSAM:
    """Bundles a Sam model with training-forward functions."""

    def __init__(self, sam: Sam):
        self.sam = sam
        self.config = sam.config

    @property
    def params(self):
        return self.sam.params

    @params.setter
    def params(self, value):
        self.sam.params = value

    def preprocess(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, h, w, 3) raw pixels -> resized (longest side) + normalized +
        padded to the model input (ResizeLongestSide semantics in-jit; training
        patches are square so this is a plain bilinear resize)."""
        h, w = x.shape[1], x.shape[2]
        size = self.config.img_size
        if (h, w) != (size, size):
            scale = size / max(h, w)
            new_h, new_w = int(h * scale + 0.5), int(w * scale + 0.5)
            x = jax.image.resize(
                x.astype(jnp.float32), (x.shape[0], new_h, new_w, x.shape[3]),
                method="bilinear",
            )
        return preprocess(x, size)

    def image_embeddings_oft(self, params, batched_inputs: jnp.ndarray) -> jnp.ndarray:
        """One encoder forward for the whole batch (reference
        trainable_sam.py:49). batched_inputs: (B, h, w, 3). Blocks are
        rematerialized in backward — activation memory, not HBM capacity,
        otherwise caps the finetuning batch."""
        return self.sam.encode_image(params, self.preprocess(batched_inputs),
                                     remat=True)

    def forward_decoder(
        self,
        params,
        image_embeddings: jnp.ndarray,     # (N_OBJ, 64, 64, 256) (repeated per object)
        points: jnp.ndarray,               # (N_OBJ, P, 2)
        labels: jnp.ndarray,               # (N_OBJ, P)
        mask_input: Optional[jnp.ndarray] = None,
        has_mask: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Decode all object prompts at once. Returns (low_res_masks (N,4,s,s),
        iou_predictions (N,4))."""
        return self.sam.decode_masks(
            params, image_embeddings, points, labels, mask_input, has_mask
        )

    def upscale_masks(self, low_res: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
        """(N, C, s, s) logits -> (N, C, H, W) at the training patch size."""
        N, C = low_res.shape[:2]
        return jax.image.resize(low_res, (N, C) + tuple(out_hw), method="bilinear")
