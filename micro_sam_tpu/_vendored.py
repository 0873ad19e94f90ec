"""API-parity shim for the reference's vendored kernels
(micro_sam/_vendored.py): device-safe mask->box and RLE in the same three-way
implementation spirit (here: C++ native backend, numpy vectorized fallback).
"""
from __future__ import annotations

from typing import Any, Dict, List

import numpy as np

from .ops.amg_utils import batched_mask_to_box as _batched_mask_to_box_jnp
from .ops.amg_utils import batched_mask_to_rle, mask_to_rle


def batched_mask_to_box(masks) -> np.ndarray:
    """XYXY boxes around a batch of masks; zeros for empty masks
    (reference _vendored.py:30)."""
    import jax.numpy as jnp
    return np.asarray(_batched_mask_to_box_jnp(jnp.asarray(np.asarray(masks, dtype=bool))))


def mask_to_rle_numpy(tensor) -> List[Dict[str, Any]]:
    """Uncompressed RLE, numpy implementation (reference _vendored.py:101)."""
    arr = np.asarray(tensor, dtype=bool)
    if arr.ndim == 2:
        arr = arr[None]
    return [mask_to_rle(m) for m in arr]


def mask_to_rle_pytorch(tensor, rle_implementation: str = "default") -> List[Dict[str, Any]]:
    """Uncompressed RLE (name kept for API parity; dispatches to the C++
    backend when built — reference _vendored.py:111). ``rle_implementation``
    mirrors the reference knob (default/numpy/numba/nifty); all variants
    produce identical RLEs here, so it only selects numpy vs the native
    backend ("numpy" forces numpy, anything else prefers C++)."""
    arr = np.asarray(tensor, dtype=bool)
    if arr.ndim == 2:
        arr = arr[None]
    if rle_implementation == "numpy":
        return mask_to_rle_numpy(arr)
    return batched_mask_to_rle(arr)
