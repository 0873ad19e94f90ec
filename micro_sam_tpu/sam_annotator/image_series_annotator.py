"""Series annotation over many images (reference
micro_sam/sam_annotator/image_series_annotator.py).

Headless core: precompute embeddings/state for N files and step through them;
GUI entry requires napari.
"""
from __future__ import annotations

import os
from glob import glob
from pathlib import Path
from typing import List, Optional, Tuple, Union

import numpy as np

from ._state import AnnotatorState
from ._widgets import _require_napari
from .. import util
from ..precompute_state import _precompute_state_for_file


def _precompute(
    images, model_type, embedding_path, tile_shape, halo, precompute_amg_state,
    checkpoint_path=None, decoder=None, ndim=2,
):
    """Precompute embeddings (and state) for all images (reference
    image_series_annotator.py:28)."""
    predictor, state = util.get_sam_model(
        model_type=model_type, checkpoint_path=checkpoint_path, return_state=True
    )
    if embedding_path is None:
        embedding_paths = [None] * len(images)
    else:
        os.makedirs(embedding_path, exist_ok=True)
        embedding_paths = []
        for image in images:
            name = Path(str(image)).stem if not isinstance(image, np.ndarray) else None
            out = os.path.join(embedding_path, f"{name}.zarr") if name else None
            if out is not None:
                _precompute_state_for_file(
                    predictor, image, out, key=None, ndim=ndim,
                    tile_shape=tile_shape, halo=halo,
                    precompute_amg_state=precompute_amg_state, decoder=decoder,
                    verbose=False,
                )
            embedding_paths.append(out)
    return predictor, embedding_paths


class ImageSeriesWorkflow:
    """Headless series workflow: iterate images, collect committed results."""

    def __init__(self, images: List, output_folder: str, model_type: str = util._DEFAULT_MODEL,
                 embedding_path: Optional[str] = None, is_volumetric: bool = False,
                 skip_segmented: bool = True):
        self.images = images
        self.output_folder = output_folder
        self.model_type = model_type
        self.embedding_path = embedding_path
        self.is_volumetric = is_volumetric
        self.skip_segmented = skip_segmented
        self.index = 0
        os.makedirs(output_folder, exist_ok=True)

    def _out_path(self, index: int) -> str:
        image = self.images[index]
        name = Path(str(image)).stem if not isinstance(image, np.ndarray) else f"seg_{index:05}"
        return os.path.join(self.output_folder, f"{name}.tif")

    def current_image(self) -> np.ndarray:
        image = self.images[self.index]
        return util.load_image_data(str(image)) if not isinstance(image, np.ndarray) else image

    def save_segmentation(self, segmentation: np.ndarray) -> str:
        path = self._out_path(self.index)
        import imageio.v3 as imageio
        try:
            imageio.imwrite(path, segmentation, compression="zlib")
        except TypeError:
            imageio.imwrite(path, segmentation)
        return path

    def next_image(self) -> Optional[int]:
        """Advance to the next (unsegmented) image; returns its index or None."""
        self.index += 1
        while self.skip_segmented and self.index < len(self.images) and \
                os.path.exists(self._out_path(self.index)):
            self.index += 1
        if self.index >= len(self.images):
            return None
        return self.index


def image_series_annotator(
    images: List,
    output_folder: str,
    model_type: str = util._DEFAULT_MODEL,
    embedding_path: Optional[str] = None,
    tile_shape: Optional[Tuple[int, int]] = None,
    halo: Optional[Tuple[int, int]] = None,
    viewer=None,
    return_viewer: bool = False,
    precompute_amg_state: bool = False,
    checkpoint_path: Optional[str] = None,
    is_volumetric: bool = False,
    skip_segmented: bool = True,
    **kwargs,
):
    """Annotate a series of images (reference image_series_annotator.py:133).

    GUI path requires napari; the ImageSeriesWorkflow class provides the
    headless equivalent.
    """
    _require_napari()
    raise NotImplementedError(
        "The napari series-annotation GUI is pending; use ImageSeriesWorkflow headless."
    )


def image_folder_annotator(
    input_folder: str,
    output_folder: str,
    pattern: str = "*",
    **kwargs,
):
    """Annotate all images in a folder (reference image_series_annotator.py:347)."""
    images = sorted(glob(os.path.join(input_folder, pattern)))
    return image_series_annotator(images, output_folder, **kwargs)


def main():
    """@private CLI."""
    import argparse
    parser = argparse.ArgumentParser(description="Annotate a series of images.")
    parser.add_argument("-i", "--input_folder", required=True)
    parser.add_argument("-o", "--output_folder", required=True)
    parser.add_argument("--pattern", default="*")
    parser.add_argument("-m", "--model_type", default=util._DEFAULT_MODEL)
    parser.add_argument("-e", "--embedding_path", default=None)
    args = parser.parse_args()
    image_folder_annotator(
        args.input_folder, args.output_folder, args.pattern,
        model_type=args.model_type, embedding_path=args.embedding_path,
    )


if __name__ == "__main__":
    main()
