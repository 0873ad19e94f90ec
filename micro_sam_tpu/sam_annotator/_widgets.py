"""Annotator widget logic (reference micro_sam/sam_annotator/_widgets.py).

The Qt/magicgui widget classes require napari; this module separates the
computational cores (segment / commit / automatic segmentation drivers) so
they are importable and testable headless. The GUI classes are created by
``_require_napari()``-gated factories.
"""
from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import numpy as np

from . import util as vutil
from ._state import AnnotatorState
from .. import instance_segmentation, util
from ..multi_dimensional_segmentation import merge_instance_segmentation_3d, segment_mask_in_volume


def _require_napari():
    try:
        import napari  # noqa: F401
        import magicgui  # noqa: F401
        return True
    except ImportError as e:
        raise RuntimeError(
            "The napari annotator GUI requires napari and magicgui, which are not "
            "installed in this environment. The computational annotator core "
            "(micro_sam_tpu.sam_annotator.util / _widgets functions) works headless."
        ) from e


# -----------------------------------------------------------------------------
# headless computational cores
# -----------------------------------------------------------------------------

def segment_2d(state: AnnotatorState, point_prompts, shape_prompts, shape,
               batched: bool = False, previous_segmentation=None) -> Optional[np.ndarray]:
    """Interactive 2d segmentation from prompt layers (core of the 'segment'
    widget, reference _widgets.py:994)."""
    points, labels = (np.zeros((0, 2)), np.zeros(0, dtype=int)) \
        if point_prompts is None else (
            vutil.point_layer_to_prompts(point_prompts, with_stop_annotation=False) or
            (np.zeros((0, 2)), np.zeros(0, dtype=int))
        )
    boxes, masks = ([], []) if shape_prompts is None else \
        vutil.shape_layer_to_prompts(shape_prompts, shape)
    return vutil.prompt_segmentation(
        state.predictor, points, labels, boxes, masks, shape,
        multiple_box_prompts=True, image_embeddings=state.image_embeddings,
        batched=batched, previous_segmentation=previous_segmentation,
    )


def segment_slice(state: AnnotatorState, point_prompts, shape_prompts, shape, i: int
                  ) -> Optional[np.ndarray]:
    """Segment one z-slice / frame (reference _widgets.py:1029)."""
    points_result = vutil.point_layer_to_prompts(point_prompts, i, with_stop_annotation=False)
    points, labels = points_result if points_result is not None else (np.zeros((0, 2)), np.zeros(0))
    boxes, masks = vutil.shape_layer_to_prompts(shape_prompts, shape[1:], i=i)
    return vutil.prompt_segmentation(
        state.predictor, points, labels, boxes, masks, shape[1:],
        multiple_box_prompts=False, image_embeddings=state.image_embeddings, i=i,
    )


def segment_nd(
    state: AnnotatorState, point_prompts, shape_prompts, shape,
    projection: str = "box", iou_threshold: float = 0.8, box_extension: float = 0.05,
) -> Tuple[np.ndarray, Tuple[int, int]]:
    """Volumetric segmentation: per-slice prompts + projection through the
    volume (core of SegmentNDWidget, reference _widgets.py:1603)."""
    seg, slices, stop_lower, stop_upper = vutil.segment_slices_with_prompts(
        state.predictor, point_prompts, shape_prompts, state.image_embeddings, shape
    )
    seg, (z_min, z_max) = segment_mask_in_volume(
        seg, state.predictor, state.image_embeddings, slices,
        stop_lower, stop_upper, iou_threshold=iou_threshold,
        projection=projection, box_extension=box_extension,
    )
    state.z_range = (z_min, z_max)
    return seg, (z_min, z_max)


def automatic_segmentation_2d(state: AnnotatorState, image, i=None, **kwargs) -> np.ndarray:
    """Automatic segmentation of the current image/slice (core of
    AutoSegmentWidget, reference _widgets.py:1717)."""
    if state.amg is None:
        is_tiled = state.image_embeddings["input_size"] is None
        state.amg = instance_segmentation.get_instance_segmentation_generator(
            state.predictor, is_tiled=is_tiled, decoder=state.decoder
        )
    if not getattr(state.amg, "is_initialized", False):
        state.amg.initialize(image, image_embeddings=state.image_embeddings, i=i, verbose=False)
    return state.amg.generate(**kwargs)


def automatic_segmentation_3d(state: AnnotatorState, volume, with_background=True,
                              gap_closing=None, min_z_extent=None, **kwargs) -> np.ndarray:
    """Automatic 3d segmentation: per-slice + multicut merge
    (reference _widgets.py:1725 apply-to-volume path)."""
    is_tiled = state.image_embeddings["input_size"] is None
    segmenter = instance_segmentation.get_instance_segmentation_generator(
        state.predictor, is_tiled=is_tiled, decoder=state.decoder
    )
    offset = 0
    seg = np.zeros(volume.shape[:3], dtype="uint32")
    for i in range(seg.shape[0]):
        segmenter.initialize(volume[i], image_embeddings=state.image_embeddings,
                             i=i, verbose=False)
        seg_i = segmenter.generate(**kwargs)
        if isinstance(seg_i, list):
            continue
        seg_i = np.asarray(seg_i, dtype="uint32")
        mx = int(seg_i.max())
        if mx == 0:
            continue
        seg_i[seg_i != 0] += offset
        offset += mx
        seg[i] = seg_i
    return merge_instance_segmentation_3d(
        seg, with_background=with_background, gap_closing=gap_closing,
        min_z_extent=min_z_extent, verbose=False,
    )


def _mask_matched_objects(committed, seg, preserve_mode: str = "objects"):
    """Which committed pixels/objects to preserve when committing new objects
    over them (reference _widgets.py:484)."""
    if preserve_mode == "none":
        return np.zeros(committed.shape, dtype=bool)
    if preserve_mode == "pixels":
        return committed != 0
    # "objects": preserve only committed objects that do not overlap new ones
    from .. import native
    keep = np.zeros(committed.shape, dtype=bool)
    ovlp = native.overlap(committed, seg)
    for cid in np.unique(committed):
        if cid == 0:
            continue
        ids, vals = ovlp.overlapArraysNormalized(int(cid), True)
        vals = vals[ids != 0]
        if vals.size == 0 or vals[0] < 0.5:
            keep |= committed == cid
    return keep


def commit_segmentation(
    committed_objects: np.ndarray,
    current_segmentation: np.ndarray,
    preserve_mode: str = "objects",
    z_range: Optional[Tuple[int, int]] = None,
) -> np.ndarray:
    """Commit the current (auto or interactive) segmentation into the
    committed-objects layer data (core of the commit widget, reference
    _widgets.py:499)."""
    committed = np.asarray(committed_objects).copy()
    seg = np.asarray(current_segmentation)

    id_offset = int(committed.max())
    seg_relabeled = np.zeros_like(seg, dtype=committed.dtype)
    fg = seg != 0
    if fg.any():
        from .. import native
        rel, max_id, _ = native.relabel_consecutive(seg)
        seg_relabeled[fg] = rel[fg] + id_offset

    if z_range is not None and committed.ndim == 3:
        bounded = np.zeros_like(seg_relabeled)
        z0, z1 = z_range
        bounded[z0:z1 + 1] = seg_relabeled[z0:z1 + 1]
        seg_relabeled = bounded

    preserve = _mask_matched_objects(committed, seg_relabeled, preserve_mode)
    write = (seg_relabeled != 0) & ~preserve
    committed[write] = seg_relabeled[write]
    return committed


def clear_annotations(*layers) -> None:
    """Clear prompt layers (reference _widgets.py:434)."""
    for layer in layers:
        if layer is None:
            continue
        if hasattr(layer, "data"):
            if isinstance(layer.data, list):
                layer.data = []
            else:
                layer.data = np.zeros((0,) + np.asarray(layer.data).shape[1:])
        for key in getattr(layer, "properties", {}):
            layer.properties[key] = np.zeros(0, dtype=object)


# -----------------------------------------------------------------------------
# GUI widget factories (napari required)
# -----------------------------------------------------------------------------

def create_embedding_widget():
    _require_napari()
    raise NotImplementedError(
        "The Qt EmbeddingWidget is pending; use AnnotatorState.initialize_predictor "
        "for programmatic initialization."
    )


def commit_to_file(
    path: str,
    committed_objects: np.ndarray,
    current_segmentation: np.ndarray,
    point_prompts=None,
    shape_prompts=None,
    data_signature: Optional[str] = None,
    preserve_mode: str = "objects",
    z_range: Optional[Tuple[int, int]] = None,
) -> np.ndarray:
    """Commit into a persistent zarr commit file (reference _widgets.py:588):
    committed_objects dataset, per-object prompt groups, commit_history attr
    and a data-signature guard."""
    import json
    from ..utils import zarr_lite

    f = zarr_lite.open(str(path), mode="a")

    # data signature guard: refuse to mix commits from different images
    saved_sig = f.attrs.get("data_signature")
    if saved_sig is not None and data_signature is not None and saved_sig != data_signature:
        raise RuntimeError(
            f"The commit file at {path} was created for data with signature "
            f"{saved_sig}, but the current data has signature {data_signature}."
        )
    if data_signature is not None:
        f.attrs["data_signature"] = data_signature

    committed = commit_segmentation(
        committed_objects, current_segmentation, preserve_mode, z_range
    )

    ds = f.require_dataset(
        "committed_objects", shape=committed.shape, dtype="uint32",
        chunks=(min(512, committed.shape[-2]), min(512, committed.shape[-1]))
        if committed.ndim == 2 else None,
    )
    ds[...] = committed.astype(np.uint32)

    # record the prompts that produced this commit
    new_ids = sorted(
        set(np.unique(committed).tolist()) - set(np.unique(committed_objects).tolist())
    )
    prompt_group = f.require_group("prompts")
    for oid in new_ids:
        g = prompt_group.require_group(f"object-{oid}")
        if point_prompts is not None and len(point_prompts.data):
            g.create_dataset("points", data=np.asarray(point_prompts.data, dtype="float32"),
                             overwrite=True)
            labels = point_prompts.properties.get("label")
            if labels is not None:
                g.attrs["point_labels"] = [str(l) for l in labels]
        if shape_prompts is not None and len(shape_prompts.data):
            for k, box in enumerate(shape_prompts.data):
                g.create_dataset(f"box-{k}", data=np.asarray(box, dtype="float32"),
                                 overwrite=True)

    history = f.attrs.get("commit_history", [])
    history.append({"new_ids": [int(i) for i in new_ids]})
    f.attrs["commit_history"] = history
    return committed
