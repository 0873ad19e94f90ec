"""Sample data: synthetic generator + gated fetchers.

Equivalent of micro_sam/sample_data.py. Real datasets are pooch-fetched in the
reference (sample_data.py:27-409); in offline environments only the synthetic
generator (reference sample_data.py:341) is usable, so the fetchers raise a
clear error when the cache does not already contain the files.
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np


def synthetic_data(
    shape: Tuple[int, ...] = (512, 512),
    radius_range: Tuple[int, int] = (15, 30),
    n_objects: Optional[int] = None,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Create a synthetic image with disk objects and its instance segmentation.

    Works for 2d (H, W) and 3d (Z, H, W) shapes; in 3d every object is a
    sphere. Objects never overlap, so the segmentation has exact object counts
    — the property the reference's tests rely on.
    """
    rng = np.random.default_rng(seed)
    ndim = len(shape)
    assert ndim in (2, 3)
    image = np.zeros(shape, dtype=np.uint8)
    segmentation = np.zeros(shape, dtype=np.uint32)

    if n_objects is None:
        n_objects = max(4, int(np.prod([s / 96 for s in shape[-2:]]) * 4))

    coords = np.meshgrid(*[np.arange(s) for s in shape], indexing="ij")
    placed = []
    label = 0
    attempts = 0
    while label < n_objects and attempts < n_objects * 50:
        attempts += 1
        r = int(rng.integers(radius_range[0], radius_range[1] + 1))
        center = [int(rng.integers(r + 2, s - r - 2)) for s in shape]
        if any(
            sum((c1 - c2) ** 2 for c1, c2 in zip(center, pc)) < (r + pr + 3) ** 2
            for pc, pr in placed
        ):
            continue
        dist2 = sum((c - cc) ** 2 for c, cc in zip(coords, center))
        disk = dist2 <= r ** 2
        label += 1
        image[disk] = 255
        segmentation[disk] = label
        placed.append((center, r))

    # soften with a little noise + blur-ish falloff for realism
    noise = rng.normal(0, 8, size=shape)
    image = np.clip(image.astype(np.float64) * 0.7 + 40 + noise, 0, 255).astype(np.uint8)
    return image, segmentation


def _require_cached(name: str) -> str:
    from .util import microsam_cachedir
    path = os.path.join(microsam_cachedir(), "sample_data", name)
    if not os.path.exists(path):
        raise RuntimeError(
            f"Sample dataset {name} is not cached at {path} and cannot be "
            "downloaded in an offline environment."
        )
    return path


def fetch_image_series_example_data(save_directory: str) -> str:
    return _require_cached("image-series.zip.unzip")


def fetch_wholeslide_example_data(save_directory: str) -> str:
    return _require_cached("whole-slide-example-image.tif")


def fetch_livecell_example_data(save_directory: str) -> str:
    return _require_cached("livecell-2d-image.png")


def fetch_hela_2d_example_data(save_directory: str) -> str:
    return _require_cached("hela-2d-image.png")


def fetch_3d_example_data(save_directory: str) -> str:
    return _require_cached("lucchi_pp.zip.unzip")


def fetch_tracking_example_data(save_directory: str) -> str:
    return _require_cached("DIC-C2DH-HeLa.zip.unzip")


def fetch_tracking_segmentation_data(save_directory: str) -> str:
    return _require_cached("hela-ctc-01-gt.zip.unzip")


def fetch_nucleus_3d_example_data(save_directory: str) -> str:
    return _require_cached("3d-nucleus-data.zip.unzip")


def fetch_wholeslide_histopathology_example_data(save_directory: str) -> str:
    return _require_cached("whole-slide-histopathology-example-image.tif")
