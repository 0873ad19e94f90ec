"""Input-size transforms for the SAM image encoder.

Equivalent of the reference's ``ResizeLongestSide`` preprocessing
(segment_anything.utils.transforms, used via micro_sam/util.py and
training/trainable_sam.py:24): resize so the longest side equals the model's
input size (1024), then normalize and zero-pad to a square. Here the resize and
normalization run *on device* inside jit (bilinear ``jax.image.resize``), so the
host only ships the raw uint8 tile — a bandwidth win on TPU.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def get_preprocess_shape(old_h: int, old_w: int, long_side: int) -> Tuple[int, int]:
    """Output (h, w) after resizing the longest side to ``long_side``."""
    scale = long_side * 1.0 / max(old_h, old_w)
    new_h, new_w = old_h * scale, old_w * scale
    return int(new_h + 0.5), int(new_w + 0.5)


class ResizeLongestSide:
    """Resizes images to the longest side ``target_length``, plus coordinate
    / box transforms to match. Operates on numpy on host, jnp under jit."""

    def __init__(self, target_length: int = 1024):
        self.target_length = target_length

    def apply_image(self, image: np.ndarray) -> np.ndarray:
        """Resize an (H, W, C) uint8 image on host; returns float32."""
        h, w = image.shape[:2]
        new_h, new_w = get_preprocess_shape(h, w, self.target_length)
        out = jax.image.resize(
            jnp.asarray(image, dtype=jnp.float32),
            (new_h, new_w) + image.shape[2:],
            method="bilinear",
        )
        return np.asarray(out)

    def apply_image_jax(self, image: jnp.ndarray, input_hw: Tuple[int, int]) -> jnp.ndarray:
        """Resize an (H, W, C) image to the static shape ``input_hw`` under jit."""
        return jax.image.resize(
            image.astype(jnp.float32), tuple(input_hw) + image.shape[2:], method="bilinear"
        )

    def apply_coords(self, coords: np.ndarray, original_size: Tuple[int, int]) -> np.ndarray:
        """Map (..., 2) (x, y) coordinates from the original image to the resized image."""
        old_h, old_w = original_size
        new_h, new_w = get_preprocess_shape(old_h, old_w, self.target_length)
        coords = np.asarray(coords, dtype=np.float64).copy()
        coords[..., 0] = coords[..., 0] * (new_w / old_w)
        coords[..., 1] = coords[..., 1] * (new_h / old_h)
        return coords.astype(np.float32)

    def apply_boxes(self, boxes: np.ndarray, original_size: Tuple[int, int]) -> np.ndarray:
        """Map (..., 4) XYXY boxes from the original image to the resized image."""
        boxes = self.apply_coords(
            np.asarray(boxes).reshape(-1, 2, 2), original_size
        )
        return boxes.reshape(-1, 4)
