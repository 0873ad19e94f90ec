"""Batched prompt inference (flat and tiled).

Counterpart of micro_sam/inference.py: run many point/box prompts against one
embedding set. On TPU the prompt batch rides one jitted decode program per
capacity bucket (predictor.predict pads to pow2), so a 512-prompt evaluation
batch is a handful of device launches.
"""
from __future__ import annotations

import os
import warnings
from dataclasses import dataclass
from typing import Any, Dict, Iterator, List, Optional, Tuple, Union

import numpy as np

from . import util
from .ops import amg_utils
from .ops.amg_utils import MaskData
from .predictor import SamPredictor
from .utils.blocking import Blocking


@dataclass
class _PromptSet:
    """One validated bundle of prompts, sliceable into decode batches.

    Centralizes the prompt-combination rules (cf. reference inference.py:23;
    the rules are the same, the bookkeeping is different: slicing and batching
    live here instead of inline in the drivers).
    """
    boxes: Optional[np.ndarray]
    points: Optional[np.ndarray]
    labels: Optional[np.ndarray]
    logits: Optional[np.ndarray]

    def __len__(self) -> int:
        for arr in (self.boxes, self.points):
            if arr is not None:
                return len(arr)
        return 0

    def __getitem__(self, sl) -> "_PromptSet":
        pick = lambda a: None if a is None else a[sl]
        return _PromptSet(pick(self.boxes), pick(self.points),
                          pick(self.labels), pick(self.logits))

    def batches(self, batch_size: int) -> Iterator["_PromptSet"]:
        for start in range(0, len(self), batch_size):
            yield self[start:start + batch_size]


def _checked_prompt_set(boxes, points, point_labels, logits_masks,
                        segmentation_ids=None) -> _PromptSet:
    """Validate the prompt combination and wrap it (reference inference.py:23
    semantics; every mismatch is a ValueError)."""
    if (points is None) is not (point_labels is None):
        raise ValueError(
            "Point prompts need `points` and `point_labels` together; "
            "got exactly one of them."
        )
    if points is None and boxes is None:
        raise ValueError("No prompts: pass `boxes` and/or `points`.")

    counts = {
        name: len(arr) for name, arr in (
            ("boxes", boxes), ("points", points), ("point_labels", point_labels),
            ("logits_masks", logits_masks), ("segmentation_ids", segmentation_ids),
        ) if arr is not None
    }
    if len(set(counts.values())) > 1:
        detail = ", ".join(f"{k}={v}" for k, v in counts.items())
        raise ValueError(f"Prompt inputs disagree in length: {detail}.")

    return _PromptSet(boxes, points, point_labels, logits_masks)


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


def _decode_one_batch(predictor, chunk: _PromptSet, multimasking: bool,
                      reduce_multimasking: bool):
    """Predict one prompt chunk; optionally keep only the best multimask."""
    logit_masks, ious, lowres = predictor.predict(
        point_coords=chunk.points,
        point_labels=chunk.labels,
        box=chunk.boxes,
        mask_input=chunk.logits,
        multimask_output=multimasking,
        return_logits=True,
    )
    if multimasking and reduce_multimasking:
        rows = np.arange(len(logit_masks))
        best = np.argmax(ious, axis=1)
        logit_masks = logit_masks[rows, best][:, None]
        ious = ious[rows, best][:, None]
        lowres = lowres[rows, best][:, None]
    return logit_masks, ious, lowres


def _reduce_to_mask_data(logit_masks, ious, lowres, return_highres_logits,
                         mask_threshold) -> MaskData:
    """Threshold logits and attach stability scores + boxes.

    mask_threshold "auto" derives a per-image threshold with local Otsu
    (reference inference.py:71); stability is then measured around that
    per-image threshold instead of the fixed one.
    """
    import jax.numpy as jnp

    logit_np = np.asarray(logit_masks)
    flat = logit_np.reshape((-1,) + logit_np.shape[-2:])
    out = MaskData(masks=flat, iou_preds=np.asarray(ious).reshape(-1))
    out["logits"] = logit_np if return_highres_logits else np.asarray(lowres)

    if mask_threshold == "auto":
        thr = _local_otsu_threshold(np.asarray(lowres)).reshape(-1)[:, None, None]
        n_above = (flat > (thr + 1.0)).sum(axis=(-2, -1))
        n_below = (flat > (thr - 1.0)).sum(axis=(-2, -1))
        out["stability_scores"] = n_above / np.maximum(n_below, 1e-7)
        out["masks"] = flat > thr
    else:
        thr = float(mask_threshold)
        out["stability_scores"] = np.asarray(
            amg_utils.calculate_stability_score(jnp.asarray(flat), thr, 1.0))
        out["masks"] = flat > thr
    out["boxes"] = np.asarray(
        amg_utils.batched_mask_to_box(jnp.asarray(out["masks"])))
    return out


def _mask_records(masks: MaskData, segmentation_ids) -> List[Dict[str, Any]]:
    """MaskData -> the reference's list-of-dict mask format."""
    records = []
    for idx, seg in enumerate(masks["masks"]):
        seg_id = idx + 1 if segmentation_ids is None else int(segmentation_ids[idx])
        records.append({
            "segmentation": seg,
            "area": int(seg.sum()),
            "bbox": amg_utils.box_xyxy_to_xywh(masks["boxes"][idx]).tolist(),
            "predicted_iou": float(masks["iou_preds"][idx]),
            "stability_score": float(masks["stability_scores"][idx]),
            "seg_id": seg_id,
            "logits": masks["logits"][idx],
        })
    return records


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
    if multimasking and segmentation_ids is not None and not return_instance_segmentation:
        raise NotImplementedError
    prompts = _checked_prompt_set(
        boxes, points, point_labels, logits_masks, segmentation_ids)

    if image is None:
        predictor.get_image_embedding()  # raises if no embeddings installed
    else:
        target = image if i is None else image[i]
        emb = util.precompute_image_embeddings(
            predictor, target, embedding_path, verbose=verbose_embeddings)
        util.set_precomputed(predictor, emb)

    thr = 0.0 if mask_threshold is None else mask_threshold
    collected = MaskData()
    for chunk in prompts.batches(batch_size):
        decoded = _decode_one_batch(predictor, chunk, multimasking, reduce_multimasking)
        collected.cat(_reduce_to_mask_data(*decoded, return_highres_logits, thr))

    records = _mask_records(collected, segmentation_ids)
    if return_instance_segmentation:
        return util.mask_data_to_segmentation(records, min_object_size=0)
    return records


def _require_tiled_embeddings(
    predictor, image, image_embeddings, embedding_path, tile_shape, halo, verbose_embeddings
):
    """Compute-or-check tiled embeddings; the caller may constrain
    tile_shape/halo, which must then agree with the cache."""
    if image_embeddings is None:
        assert image is not None
        assert (tile_shape is not None) and (halo is not None)
        image_embeddings = util.precompute_image_embeddings(
            predictor, image, embedding_path, ndim=2, tile_shape=tile_shape,
            halo=halo, verbose=verbose_embeddings,
        )
    shape = tuple(image_embeddings["shape"])
    for name, wanted, stored in (("tile_shape", tile_shape, image_embeddings["tile_shape"]),
                                 ("halo", halo, image_embeddings["halo"])):
        if wanted is not None and tuple(wanted) != tuple(stored):
            raise ValueError(f"Incompatible {name}: {tuple(wanted)} != {tuple(stored)}")
    return (image_embeddings, shape,
            tuple(image_embeddings["tile_shape"]), tuple(image_embeddings["halo"]))


def _tile_frame(tiling: Blocking, tile_id: int, halo):
    """(yx offset, tile shape) of a halo-extended tile."""
    outer = tiling.get_block_with_halo(tile_id, list(halo)).outer_block
    return np.asarray(outer.begin), tuple(outer.shape)


def _route_prompts_to_tiles(prompts: _PromptSet, tiling: Blocking, halo):
    """Split global-coordinate prompts into per-tile prompt sets.

    A prompt belongs to the tile containing its box center / its (first)
    point; coordinates are shifted into the halo-extended tile frame. Box and
    point routing must agree when both are given.
    """
    per_tile: Dict[int, Dict[str, list]] = {}

    def bucket(tile_id):
        return per_tile.setdefault(tile_id, {"boxes": [], "points": [], "labels": []})

    for k in range(len(prompts)):
        tid = None
        if prompts.boxes is not None:
            x0, y0, x1, y1 = prompts.boxes[k]
            cy, cx = int(round((y0 + y1) / 2)), int(round((x0 + x1) / 2))
            tid = tiling.coordinates_to_block_id([cy, cx])
            off, tshape = _tile_frame(tiling, tid, halo)
            local = [
                max(x0 - off[1], 0), max(y0 - off[0], 0),
                min(x1 - off[1], tshape[1]), min(y1 - off[0], tshape[0]),
            ]
            bucket(tid)["boxes"].append(local)
        if prompts.points is not None:
            pt_xy = prompts.points[k, 0]
            pt_yx = [int(round(pt_xy[1])), int(round(pt_xy[0]))]
            point_tid = tiling.coordinates_to_block_id(pt_yx)
            if tid is None:
                tid = point_tid
            else:
                assert tid == point_tid, "box and point of one prompt disagree on the tile"
            off, _ = _tile_frame(tiling, tid, halo)
            bucket(tid)["points"].append(pt_xy - off[::-1])
            bucket(tid)["labels"].append(prompts.labels[k])

    routed = {}
    for tid, entry in per_tile.items():
        routed[tid] = _PromptSet(
            boxes=np.asarray(entry["boxes"], dtype="float64") if entry["boxes"] else None,
            points=np.asarray(entry["points"], dtype="float64")[:, None] if entry["points"] else None,
            labels=np.asarray(entry["labels"]) if entry["labels"] else None,
            logits=None,
        )
    return routed


def _suppress_covered_objects(this_seg, prev_seg, overlap_threshold=0.75):
    """Zero out new objects mostly covered by the existing segmentation, then
    paint the existing objects back on top (tile-overlap resolution; same
    policy as reference inference.py:316)."""
    from . import native
    ov = native.overlap(this_seg, prev_seg)
    for seg_id in np.unique(this_seg):
        if seg_id == 0:
            continue
        other_ids, fractions = ov.overlapArraysNormalized(int(seg_id), True)
        fractions = fractions[other_ids != 0]
        if fractions.size and fractions[0] > overlap_threshold:
            this_seg[this_seg == seg_id] = 0
    keep = prev_seg != 0
    this_seg[keep] = prev_seg[keep]
    return this_seg


def _stitch_segmentation(masks, tile_ids, tiling: Blocking, halo, output_shape, verbose=False):
    assert len(masks) == len(tile_ids)
    segmentation = np.zeros(output_shape, dtype="uint32")
    first = True
    for tile_id, this_seg in zip(tile_ids, masks):
        bb = tiling.get_block_with_halo(tile_id, list(halo)).outer_block.slicing
        if first:
            segmentation[bb] = this_seg
            first = False
        else:
            segmentation[bb] = _suppress_covered_objects(this_seg, segmentation[bb])
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
    prompts = _checked_prompt_set(boxes, points, point_labels, logits_masks)
    if prompts.logits is not None:
        raise NotImplementedError

    image_embeddings, shape, tile_shape, halo = _require_tiled_embeddings(
        predictor, image, image_embeddings, embedding_path, tile_shape, halo, verbose_embeddings
    )
    tiling = Blocking([0, 0], shape, tile_shape)
    routed = _route_prompts_to_tiles(prompts, tiling, halo)

    collected: List = []
    stitched_segs: List[np.ndarray] = []
    id_offset = 0
    tile_order = sorted(routed)
    for tile_id in tile_order:
        tile_prompts = routed[tile_id]
        predictor = util.set_precomputed(predictor, image_embeddings, tile_id=tile_id, i=i)
        tile_masks = batched_inference(
            predictor=predictor, image=None, batch_size=batch_size,
            boxes=tile_prompts.boxes, points=tile_prompts.points,
            point_labels=tile_prompts.labels,
            multimasking=multimasking, return_instance_segmentation=False,
            reduce_multimasking=reduce_multimasking,
            mask_threshold=mask_threshold,
        )

        if optimize_memory:
            # NMS per tile, then stitch label images — bounds peak memory to
            # one tile's masks instead of all tiles' mask dicts
            seg = util.apply_nms(tile_masks, **nms_kwargs)
            seg[seg != 0] += id_offset
            id_offset = seg.max()
            stitched_segs.append(seg)
        else:
            off, _ = _tile_frame(tiling, tile_id, halo)
            shift = np.array([off[1], off[0], 0, 0])
            for mask in tile_masks:
                mask["global_bbox"] = (np.array(mask["bbox"]) + shift).tolist()
            collected.extend(tile_masks)

    if optimize_memory:
        return _stitch_segmentation(stitched_segs, tile_order, tiling, halo, output_shape=shape)
    if return_instance_segmentation:
        return util.mask_data_to_segmentation(collected, shape=shape, min_object_size=0)
    return collected
