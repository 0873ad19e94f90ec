"""Batched prompt inference (flat and tiled).

Counterpart of micro_sam/inference.py: run many point/box prompts against one
embedding set. On TPU the prompt batch rides one jitted decode program per
capacity bucket (predictor.predict pads to pow2), so a 512-prompt evaluation
batch is a handful of device launches.
"""
from __future__ import annotations

import os
import warnings
from typing import Any, Dict, List, Optional, Tuple, Union

import numpy as np

from . import util
from .ops import amg_utils
from .ops.amg_utils import MaskData
from .predictor import SamPredictor
from .utils.blocking import Blocking


def _validate_inputs(
    boxes, points, point_labels, multimasking, return_instance_segmentation,
    segmentation_ids, logits_masks,
):
    """Prompt-combination validation (reference inference.py:23)."""
    if multimasking and (segmentation_ids is not None) and (not return_instance_segmentation):
        raise NotImplementedError

    if (points is None) != (point_labels is None):
        raise ValueError(
            "If you have point prompts both `points` and `point_labels` have to be passed, "
            "but you passed only one of them."
        )

    have_points = points is not None
    have_boxes = boxes is not None
    have_logits = logits_masks is not None
    if (not have_points) and (not have_boxes):
        raise ValueError("Point and/or box prompts have to be passed, you passed neither.")

    if have_points and (len(point_labels) != len(points)):
        raise ValueError(
            f"The number of point coordinates and labels does not match: "
            f"{len(point_labels)} != {len(points)}"
        )
    if (have_points and have_boxes) and (len(points) != len(boxes)):
        raise ValueError(
            f"The number of point and box prompts does not match: {len(points)} != {len(boxes)}"
        )
    if have_logits:
        n_ref = len(point_labels) if have_points else len(boxes)
        if len(logits_masks) != n_ref:
            raise ValueError(
                f"The number of prompts and logits does not match: {n_ref} != {len(logits_masks)}"
            )

    n_prompts = len(boxes) if have_boxes else len(points)
    if (segmentation_ids is not None) and (len(segmentation_ids) != n_prompts):
        raise ValueError(
            f"The number of segmentation ids and prompts does not match: "
            f"{len(segmentation_ids)} != {n_prompts}"
        )
    return n_prompts, have_boxes, have_points, have_logits


def _local_otsu_threshold(
    images: np.ndarray, window_size: int = 31, num_bins: int = 64, eps: float = 1e-6
) -> np.ndarray:
    """Auto mask threshold: max over local (windowed) Otsu thresholds
    (reference inference.py:71, host-side numpy formulation)."""
    x = np.asarray(images, dtype=np.float32)
    if x.ndim == 4:
        x = x[:, 0]
    B, H, W = x.shape
    thresholds = np.zeros((B, 1, 1), dtype=np.float32)
    pad = window_size // 2
    for b in range(B):
        img = x[b]
        mn, mx = img.min(), img.max()
        rng = max(mx - mn, eps)
        norm = (img - mn) / rng
        bins = np.clip((norm * (num_bins - 1)).astype(np.int32), 0, num_bins - 1)
        padded = np.pad(bins, pad, mode="constant", constant_values=0)
        windows = np.lib.stride_tricks.sliding_window_view(padded, (window_size, window_size))
        wf = windows.reshape(H * W, -1)
        # histogram per window
        hist = np.zeros((H * W, num_bins), dtype=np.float32)
        rows = np.repeat(np.arange(H * W), wf.shape[1])
        np.add.at(hist, (rows, wf.ravel()), 1.0)
        p = hist / np.maximum(hist.sum(axis=1, keepdims=True), eps)
        bvals = np.arange(num_bins, dtype=np.float32)[None]
        omega1 = np.cumsum(p, axis=1)
        mu = np.cumsum(p * bvals, axis=1)
        mu_T = mu[:, -1:]
        omega2 = 1.0 - omega1
        mu1 = mu / np.maximum(omega1, eps)
        mu2 = (mu_T - mu) / np.maximum(omega2, eps)
        sigma_b2 = omega1 * omega2 * (mu1 - mu2) ** 2
        t_bin = np.argmax(sigma_b2, axis=1)
        t_norm = t_bin.astype(np.float32) / (num_bins - 1)
        thr = np.clip(mn + t_norm * rng, 0.0, None)
        thresholds[b, 0, 0] = thr.max()
    return thresholds


def _process_masks_for_batch(batch_masks, batch_ious, batch_logits,
                             return_highres_logits, mask_threshold):
    """masks (B, 1, H, W) logits -> MaskData with stability scores, boxes."""
    import jax.numpy as jnp

    flat = batch_masks.reshape((-1,) + batch_masks.shape[-2:])
    batch_data = MaskData(
        masks=np.asarray(flat),
        iou_preds=np.asarray(batch_ious).reshape(-1),
    )
    batch_data["logits"] = np.asarray(batch_masks if return_highres_logits else batch_logits)
    if mask_threshold == "auto":
        thresholds = _local_otsu_threshold(np.asarray(batch_logits))
        thr = thresholds.reshape(-1)[:, None, None]
        stab = np.asarray(amg_utils.calculate_stability_score(
            jnp.asarray(batch_data["masks"]), 0.0, 1.0
        ))
        # stability w.r.t. per-image threshold
        high = (batch_data["masks"] > (thr + 1.0)).sum(axis=(-2, -1))
        low = (batch_data["masks"] > (thr - 1.0)).sum(axis=(-2, -1))
        batch_data["stability_scores"] = high / np.maximum(low, 1e-7)
        batch_data["masks"] = batch_data["masks"] > thr
    else:
        batch_data["stability_scores"] = np.asarray(amg_utils.calculate_stability_score(
            jnp.asarray(batch_data["masks"]), float(mask_threshold), 1.0
        ))
        batch_data["masks"] = batch_data["masks"] > float(mask_threshold)
    batch_data["boxes"] = np.asarray(amg_utils.batched_mask_to_box(jnp.asarray(batch_data["masks"])))
    return batch_data


def batched_inference(
    predictor: SamPredictor,
    image: Optional[np.ndarray],
    batch_size: int,
    boxes: Optional[np.ndarray] = None,
    points: Optional[np.ndarray] = None,
    point_labels: Optional[np.ndarray] = None,
    multimasking: bool = False,
    embedding_path: Optional[Union[str, os.PathLike]] = None,
    return_instance_segmentation: bool = True,
    segmentation_ids: Optional[list] = None,
    reduce_multimasking: bool = True,
    logits_masks: Optional[np.ndarray] = None,
    verbose_embeddings: bool = True,
    mask_threshold: Optional[Union[float, str]] = None,
    return_highres_logits: bool = False,
    i: Optional[int] = None,
) -> Union[List[Dict[str, Any]], np.ndarray]:
    """Run batched inference for input prompts (reference inference.py:156).

    boxes: (N, 4) XYXY in original image coords. points: (N, 1, 2) xy.
    point_labels: (N, 1). logits_masks: (N, 1, 256, 256).
    """
    n_prompts, have_boxes, have_points, have_logits = _validate_inputs(
        boxes, points, point_labels, multimasking, return_instance_segmentation,
        segmentation_ids, logits_masks,
    )

    if image is None:
        predictor.get_image_embedding()  # raises if not initialized
    else:
        input_ = image if i is None else image[i]
        image_embeddings = util.precompute_image_embeddings(
            predictor, input_, embedding_path, verbose=verbose_embeddings
        )
        util.set_precomputed(predictor, image_embeddings)

    n_batches = int(np.ceil(float(n_prompts) / batch_size))
    mask_threshold = 0.0 if mask_threshold is None else mask_threshold

    masks = MaskData()
    for batch_idx in range(n_batches):
        batch_start = batch_idx * batch_size
        batch_stop = min((batch_idx + 1) * batch_size, n_prompts)

        batch_boxes = boxes[batch_start:batch_stop] if have_boxes else None
        batch_points = points[batch_start:batch_stop] if have_points else None
        batch_labels = point_labels[batch_start:batch_stop] if have_points else None
        batch_logits = logits_masks[batch_start:batch_stop] if have_logits else None

        batch_masks, batch_ious, batch_lowres = predictor.predict(
            point_coords=batch_points,
            point_labels=batch_labels,
            box=batch_boxes,
            mask_input=batch_logits,
            multimask_output=multimasking,
            return_logits=True,
        )

        if reduce_multimasking and multimasking:
            max_index = np.argmax(batch_ious, axis=1)
            sel = np.arange(len(batch_masks))
            batch_masks = batch_masks[sel, max_index][:, None]
            batch_ious = batch_ious[sel, max_index][:, None]
            batch_lowres = batch_lowres[sel, max_index][:, None]

        batch_data = _process_masks_for_batch(
            batch_masks, batch_ious, batch_lowres, return_highres_logits, mask_threshold
        )
        masks.cat(batch_data)

    records = [
        {
            "segmentation": masks["masks"][idx],
            "area": int(masks["masks"][idx].sum()),
            "bbox": amg_utils.box_xyxy_to_xywh(masks["boxes"][idx]).tolist(),
            "predicted_iou": float(masks["iou_preds"][idx]),
            "stability_score": float(masks["stability_scores"][idx]),
            "seg_id": idx + 1 if segmentation_ids is None else int(segmentation_ids[idx]),
            "logits": masks["logits"][idx],
        }
        for idx in range(len(masks["masks"]))
    ]

    if return_instance_segmentation:
        return util.mask_data_to_segmentation(records, min_object_size=0)
    return records


def _require_tiled_embeddings(
    predictor, image, image_embeddings, embedding_path, tile_shape, halo, verbose_embeddings
):
    if image_embeddings is None:
        assert image is not None
        assert (tile_shape is not None) and (halo is not None)
        image_embeddings = util.precompute_image_embeddings(
            predictor, image, embedding_path, ndim=2, tile_shape=tile_shape,
            halo=halo, verbose=verbose_embeddings,
        )
    shape = tuple(image_embeddings["shape"])
    tile_shape_, halo_ = image_embeddings["tile_shape"], image_embeddings["halo"]
    if tile_shape is None:
        tile_shape = tile_shape_
    elif any(ts != ts_ for ts, ts_ in zip(tile_shape, tile_shape_)):
        raise ValueError(f"Incompatible tile shapes: {tile_shape} != {tile_shape_}")
    if halo is None:
        halo = halo_
    elif any(h != h_ for h, h_ in zip(halo, halo_)):
        raise ValueError(f"Incompatible halos: {halo} != {halo_}")
    return image_embeddings, shape, tuple(tile_shape), tuple(halo)


def _merge_segmentations(this_seg, prev_seg, overlap_threshold=0.75):
    """Discard new objects mostly covered by the previous tile, keep the
    previous segmentation wherever present (reference inference.py:316)."""
    from . import native
    ovlp = native.overlap(this_seg, prev_seg)
    ids = np.unique(this_seg)
    if len(ids) and ids[0] == 0:
        ids = ids[1:]
    for seg_id in ids:
        ovlp_ids, ovlp_vals = ovlp.overlapArraysNormalized(int(seg_id), True)
        ovlp_vals = ovlp_vals[ovlp_ids != 0]
        if ovlp_vals.size > 0 and ovlp_vals[0] > overlap_threshold:
            this_seg[this_seg == seg_id] = 0
    captured = prev_seg != 0
    this_seg[captured] = prev_seg[captured]
    return this_seg


def _stitch_segmentation(masks, tile_ids, tiling: Blocking, halo, output_shape, verbose=False):
    assert len(masks) == len(tile_ids)
    segmentation = np.zeros(output_shape, dtype="uint32")
    for tile_id, this_seg in zip(tile_ids, masks):
        tile = tiling.get_block_with_halo(tile_id, list(halo)).outer_block
        bb = tile.slicing
        if tile_id == tile_ids[0]:
            segmentation[bb] = this_seg
        else:
            prev_seg = segmentation[bb]
            this_seg = _merge_segmentations(this_seg, prev_seg)
            segmentation[bb] = this_seg
    return segmentation


def batched_tiled_inference(
    predictor: SamPredictor,
    image: Optional[np.ndarray],
    batch_size: int,
    image_embeddings=None,
    boxes: Optional[np.ndarray] = None,
    points: Optional[np.ndarray] = None,
    point_labels: Optional[np.ndarray] = None,
    multimasking: bool = False,
    embedding_path: Optional[Union[str, os.PathLike]] = None,
    return_instance_segmentation: bool = True,
    reduce_multimasking: bool = True,
    logits_masks=None,
    verbose_embeddings: bool = True,
    mask_threshold: Optional[Union[float, str]] = None,
    tile_shape: Optional[Tuple[int, int]] = None,
    halo: Optional[Tuple[int, int]] = None,
    optimize_memory: bool = False,
    i: Optional[int] = None,
    **nms_kwargs,
) -> Union[List[Dict[str, Any]], np.ndarray]:
    """Batched inference with prompts routed to tiles (reference inference.py:358)."""
    segmentation_ids = None
    n_prompts, have_boxes, have_points, have_logits = _validate_inputs(
        boxes, points, point_labels, multimasking, return_instance_segmentation,
        segmentation_ids, logits_masks,
    )
    if have_logits:
        raise NotImplementedError

    image_embeddings, shape, tile_shape, halo = _require_tiled_embeddings(
        predictor, image, image_embeddings, embedding_path, tile_shape, halo, verbose_embeddings
    )

    tiling = Blocking([0, 0], shape, tile_shape)
    box_to_tile, point_to_tile, label_to_tile, logits_to_tile = {}, {}, {}, {}
    tile_ids = []

    for prompt_id in range(n_prompts):
        this_tile_id = None
        if have_boxes:
            box = boxes[prompt_id]
            center = np.array([(box[1] + box[3]) / 2, (box[0] + box[2]) / 2]).round().astype("int").tolist()
            this_tile_id = tiling.coordinates_to_block_id(center)
            tile = tiling.get_block_with_halo(this_tile_id, list(halo)).outer_block
            offset = tile.begin
            this_tile_shape = tile.shape
            box_in_tile = np.array([
                max(box[1] - offset[0], 0), max(box[0] - offset[1], 0),
                min(box[3] - offset[0], this_tile_shape[0]), min(box[2] - offset[1], this_tile_shape[1]),
            ])[None]
            # back to XYXY for the predictor
            box_in_tile = box_in_tile[:, [1, 0, 3, 2]]
            box_to_tile.setdefault(this_tile_id, []).append(box_in_tile)

        if have_points:
            point = points[prompt_id, 0][::-1].round().astype("int").tolist()
            if this_tile_id is None:
                this_tile_id = tiling.coordinates_to_block_id(point)
            else:
                assert this_tile_id == tiling.coordinates_to_block_id(point)
            tile = tiling.get_block_with_halo(this_tile_id, list(halo)).outer_block
            offset = tile.begin
            point_in_tile = (points[prompt_id, 0] - np.array(offset)[::-1])[None, None]
            label_in_tile = point_labels[prompt_id][None]
            point_to_tile.setdefault(this_tile_id, []).append(point_in_tile)
            label_to_tile.setdefault(this_tile_id, []).append(label_in_tile)

        tile_ids.append(this_tile_id)

    tile_ids = sorted(set(tile_ids))

    masks = []
    id_offset = 0
    for tile_id in tile_ids:
        tile_boxes = np.concatenate(box_to_tile[tile_id]) if tile_id in box_to_tile else None
        tile_points = np.concatenate(point_to_tile[tile_id]) if tile_id in point_to_tile else None
        tile_labels = np.concatenate(label_to_tile[tile_id]) if tile_id in label_to_tile else None

        predictor = util.set_precomputed(predictor, image_embeddings, tile_id=tile_id, i=i)
        this_masks = batched_inference(
            predictor=predictor, image=None, batch_size=batch_size,
            boxes=tile_boxes, points=tile_points, point_labels=tile_labels,
            multimasking=multimasking, return_instance_segmentation=False,
            segmentation_ids=segmentation_ids, reduce_multimasking=reduce_multimasking,
            logits_masks=None, mask_threshold=mask_threshold,
        )

        if optimize_memory:
            segmentation = util.apply_nms(this_masks, **nms_kwargs)
            fg_mask = segmentation != 0
            segmentation[fg_mask] += id_offset
            id_offset = segmentation.max()
            masks.append(segmentation)
        else:
            tile = tiling.get_block_with_halo(tile_id, list(halo)).outer_block
            offset = np.array(list(tile.begin[::-1]) + [0, 0])
            this_masks = [
                {**mask, "global_bbox": (np.array(mask["bbox"]) + offset).tolist()}
                for mask in this_masks
            ]
            masks.extend(this_masks)

    if optimize_memory:
        return _stitch_segmentation(masks, tile_ids, tiling, halo, output_shape=shape)

    if return_instance_segmentation:
        masks = util.mask_data_to_segmentation(masks, shape=shape, min_object_size=0)
    return masks
