"""Automatic instance segmentation: AMG, AIS (decoder + watershed), APG.

TPU-native counterpart of micro_sam/instance_segmentation.py. The universal
segmenter protocol is preserved: ``initialize(image, image_embeddings, i, ...)``
computes the expensive state once (grid-prompt decodes / decoder maps on the
TPU), ``generate(**params)`` is cheap host-side postprocessing that can be
re-run for grid search or interactive re-tuning (reference design note,
instance_segmentation.py:294-304).
"""
from __future__ import annotations

import warnings
from abc import ABC
from copy import deepcopy
from typing import Any, Dict, List, Literal, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from . import util
from . import native
from .inference import batched_inference, batched_tiled_inference
from .ops import amg_utils
from .ops.amg_utils import MaskData, batched_nms
from .ops.host_ops import find_boundaries_outer, gaussian_smooth, regionprops
from .predictor import SamPredictor
from .utils.blocking import Blocking

DEFAULT_SEGMENTATION_MODE_WITH_DECODER = "ais"

MASK_THRESHOLD = 0.0


class _FakeInput:
    """Shape-only image stand-in, for call sites that slice the image but only
    need zeros of the right extent (embeddings already precomputed) —
    reference instance_segmentation.py:54-60 role."""

    def __init__(self, shape):
        self.shape = shape

    def __getitem__(self, index):
        extent = tuple(sl.stop - sl.start for sl in index)
        return np.zeros(extent, dtype="float32")


#
# AMG
#

class AMGBase(ABC):
    """Base class for the automatic mask generators (reference
    instance_segmentation.py:68). Holds the per-crop mask data computed by
    ``initialize`` and the shared postprocessing used by ``generate``."""

    _STATE_FIELDS = ("crop_list", "crop_boxes", "original_size")

    def __init__(self):
        self._is_initialized = False
        for field in self._STATE_FIELDS:
            setattr(self, f"_{field}", None)

    @property
    def is_initialized(self):
        return self._is_initialized

    @property
    def crop_list(self):
        return self._crop_list

    @property
    def crop_boxes(self):
        return self._crop_boxes

    @property
    def original_size(self):
        return self._original_size

    def _postprocess_batch(self, data, crop_box, original_size, pred_iou_thresh,
                           stability_score_thresh, box_nms_thresh):
        """Quality filters + per-crop box NMS, then lift coordinates out of
        the crop frame. Filter order matches the reference pipeline (iou ->
        stability -> crop-edge -> NMS) so the surviving mask set is
        identical."""
        orig_h, orig_w = original_size
        quality_gates = (
            ("iou_preds", pred_iou_thresh, np.greater),
            ("stability_score", stability_score_thresh, np.greater_equal),
        )
        for field, threshold, op in quality_gates:
            if threshold > 0.0:
                data.filter(op(np.asarray(data[field]), threshold))

        at_crop_edge = amg_utils.is_box_near_crop_edge(
            data["boxes"], crop_box, [0, 0, orig_w, orig_h])
        if at_crop_edge.any():
            data.filter(~at_crop_edge)

        data.filter(batched_nms(
            np.asarray(data["boxes"], dtype=np.float64),
            np.asarray(data["iou_preds"]), None, iou_threshold=box_nms_thresh,
        ))

        # back to image-frame coordinates
        data["boxes"] = amg_utils.uncrop_boxes_xyxy(data["boxes"], crop_box)
        data["crop_boxes"] = np.tile(np.asarray(crop_box)[None], (len(data["rles"]), 1))
        if "points" in data:
            data["points"] = amg_utils.uncrop_points(data["points"], crop_box)
        return data

    def _postprocess_small_regions(self, mask_data, min_area, nms_thresh):
        """Fill small holes / drop small islands per mask, then NMS where a
        repaired mask may now duplicate an untouched one (untouched masks get
        score 1.0 so NMS prefers them)."""
        if len(mask_data["rles"]) == 0:
            return mask_data

        def repair(rle):
            m = amg_utils.rle_to_mask(rle)
            m, filled = amg_utils.remove_small_regions(m, min_area, mode="holes")
            m, dropped = amg_utils.remove_small_regions(m, min_area, mode="islands")
            return m, filled or dropped

        repaired = [repair(rle) for rle in mask_data["rles"]]
        masks = np.stack([m for m, _ in repaired])
        was_touched = np.array([touched for _, touched in repaired])
        boxes = np.asarray(amg_utils.batched_mask_to_box(jnp.asarray(masks)))

        survivors = batched_nms(
            boxes.astype(np.float64), (~was_touched).astype(np.float64), None,
            iou_threshold=nms_thresh,
        )
        for idx in survivors:
            if was_touched[idx]:
                mask_data["rles"][idx] = amg_utils.mask_to_rle(masks[idx])
                mask_data["boxes"][idx] = boxes[idx]
        mask_data.filter(survivors)
        return mask_data

    _SEGMENTATION_CODECS = {
        "coco_rle": amg_utils.coco_encode_rle,
        "rle": lambda rle: rle,
        "binary_mask": amg_utils.rle_to_mask,
        "instance_segmentation": amg_utils.rle_to_mask,
    }

    def _postprocess_masks(self, mask_data, min_mask_region_area, box_nms_thresh,
                           crop_nms_thresh, output_mode):
        if min_mask_region_area > 0:
            mask_data = self._postprocess_small_regions(
                mask_data, min_mask_region_area, max(box_nms_thresh, crop_nms_thresh)
            )
        try:
            encode = self._SEGMENTATION_CODECS[output_mode]
        except KeyError:
            raise ValueError(f"Invalid output mode {output_mode}.") from None

        annotations = []
        for idx, rle in enumerate(mask_data["rles"]):
            record = {
                "segmentation": encode(rle),
                "area": amg_utils.area_from_rle(rle),
                "bbox": amg_utils.box_xyxy_to_xywh(mask_data["boxes"][idx]).tolist(),
                "predicted_iou": float(mask_data["iou_preds"][idx]),
                "stability_score": float(mask_data["stability_score"][idx]),
                "crop_box": amg_utils.box_xyxy_to_xywh(mask_data["crop_boxes"][idx]).tolist(),
            }
            if "points" in mask_data:
                record["point_coords"] = [mask_data["points"][idx].tolist()]
            annotations.append(record)
        return annotations

    def get_state(self) -> Dict[str, Any]:
        if not self.is_initialized:
            raise RuntimeError("The state has not been computed yet. Call initialize first.")
        state = {
            "crop_list": self.crop_list, "crop_boxes": self.crop_boxes,
            "original_size": self.original_size,
        }
        floors = getattr(self, "_prefilter_thresholds", None)
        if floors is not None:
            # cached state only holds candidates above the floors; record
            # them so a generator restoring the cache enforces the same guard
            state["prefilter_thresholds"] = floors
        return state

    def set_state(self, state: Dict[str, Any]) -> None:
        self._crop_list = state["crop_list"]
        self._crop_boxes = state["crop_boxes"]
        self._original_size = state["original_size"]
        # reference-written caches carry no floors: anything goes
        self._prefilter_thresholds = state.get("prefilter_thresholds")
        self._init_call = None  # restored state cannot redo the decode
        self._is_initialized = True

    def clear_state(self):
        self._crop_list = None
        self._crop_boxes = None
        self._original_size = None
        self._init_call = None
        self._is_initialized = False


class AutomaticMaskGenerator(AMGBase):
    """Grid-prompt automatic mask generation (reference
    instance_segmentation.py:291). Expensive decode in ``initialize``, cheap
    re-parameterizable filtering in ``generate``."""

    #: device-side candidate filter floors (pred_iou, stability) applied in
    #: ``initialize``; chosen below the default grid-search range (0.6+,
    #: evaluation/instance_segmentation.py) so cached state still supports
    #: every standard ``generate`` re-parameterization
    DEFAULT_PREFILTER = (0.5, 0.5)

    def __init__(
        self,
        predictor: SamPredictor,
        points_per_side: Optional[int] = 32,
        points_per_batch: Optional[int] = None,
        crop_n_layers: int = 0,
        crop_overlap_ratio: float = 512 / 1500,
        crop_n_points_downscale_factor: int = 1,
        point_grids: Optional[List[np.ndarray]] = None,
        stability_score_offset: float = 1.0,
        prefilter_thresholds: Optional[Tuple[float, float]] = DEFAULT_PREFILTER,
    ):
        """prefilter_thresholds: (iou_floor, stability_floor) applied ON
        DEVICE during ``initialize`` — only candidates above the floors are
        transferred to the host, so the end-to-end rate tracks the device
        decode rate instead of the host-link bandwidth. If ``generate`` is
        later called with thresholds below the floors, the generator
        transparently lowers the floors and redoes the device decode (which
        re-encodes the image when embeddings were not precomputed — the
        initialize arguments are retained for this); only state restored via
        ``set_state`` raises instead, because the dropped candidates are
        unrecoverable there. Pass ``None`` to keep every candidate (exact
        reference semantics, reference instance_segmentation.py:291 filters
        post-hoc only)."""
        super().__init__()
        self._predictor = predictor
        self._amg_decoder = None
        self._stability_score_offset = stability_score_offset
        self._prefilter_thresholds = (
            None if prefilter_thresholds is None
            else (float(prefilter_thresholds[0]), float(prefilter_thresholds[1])))

        # grid config: either a per-crop-layer grid is given directly, or it
        # is derived from the per-side point count
        self._points_per_side = points_per_side
        self._points_per_batch = points_per_batch or 64
        self._crop_n_layers = crop_n_layers
        self._crop_overlap_ratio = crop_overlap_ratio
        self._crop_n_points_downscale_factor = crop_n_points_downscale_factor
        if points_per_side is not None:
            self.point_grids = amg_utils.build_all_layer_point_grids(
                points_per_side, crop_n_layers, crop_n_points_downscale_factor)
        else:
            if point_grids is None:
                raise ValueError(
                    "Pass exactly one of points_per_side or point_grids.")
            self.point_grids = point_grids

    def _get_amg_decoder(self):
        from .predictor import _AmgDecoder
        if self._amg_decoder is None or self._amg_decoder.predictor is not self._predictor:
            self._amg_decoder = _AmgDecoder(
                self._predictor, self._stability_score_offset,
                prefilter=self._prefilter_thresholds)
        return self._amg_decoder

    def _dispatch_batch(self, points, im_size):
        """Launch the device-side fast path asynchronously: decode +
        threshold + stability + boxes + bit-packing in ONE jit program; only
        packed bool masks reach the host (~32x less transfer than float
        masks). Returns device handles for _consume_batch."""
        transformed = self._predictor.transform.apply_coords(points, im_size)
        return self._get_amg_decoder().dispatch(transformed.astype(np.float32))

    def _consume_batch(self, results, points, crop_box, original_size):
        """Host side of one batch: RLE from the fetched packed bitstream +
        MaskData assembly. ``results`` are numpy arrays (already fetched) —
        either the legacy all-candidates tuple or the compacted survivor dict
        (predictor._amg_compact_impl)."""
        orig_h, orig_w = original_size
        if isinstance(results, dict):
            return self._consume_compact(results, points, crop_box, original_size)
        packed, iou_preds, stability, boxes = results
        crop_h, crop_w = self._predictor.original_size
        C = iou_preds.shape[1]
        data = MaskData(iou_preds=iou_preds.reshape(-1))
        data["points"] = np.repeat(np.asarray(points), C, axis=0).astype(np.float64)
        data["stability_score"] = stability.reshape(-1)
        data["boxes"] = boxes.reshape(-1, 4)

        is_full_frame = (crop_box == [0, 0, orig_w, orig_h]) or \
            (tuple(crop_box) == (0, 0, orig_w, orig_h))
        if is_full_frame:
            # RLE straight from the packed device bitstream (no unpack)
            data["rles"] = native.rle_from_packed(packed, crop_h, crop_w)
        else:
            bits = np.unpackbits(packed, axis=-1)[..., :crop_h]
            masks = bits.reshape(-1, crop_w, crop_h).transpose(0, 2, 1).astype(bool)
            masks = amg_utils.uncrop_masks(masks, crop_box, orig_h, orig_w)
            data["rles"] = amg_utils.batched_mask_to_rle(masks)
        return data

    def _consume_compact(self, results, points, crop_box, original_size):
        """Survivor-only batch: per-mask RLEs are emitted straight into the
        FULL image frame from the bbox-windowed (or whole-tile) packed rows —
        no host-side mask reconstruction or uncropping, for any crop box."""
        orig_h, orig_w = original_size
        n = results["n"]
        C = 3  # multimask channels (decode drops the single-mask slot)
        crop_h, crop_w = results["crop_hw"]   # frame of the packed rows
        x_off, y_off = int(crop_box[0]), int(crop_box[1])

        data = MaskData(iou_preds=results["iou"])
        data["points"] = np.repeat(
            np.asarray(points), C, axis=0)[results["order"]].astype(np.float64)
        data["stability_score"] = results["stability"]
        # boxes stay in the crop frame: _postprocess_batch uncrops them
        data["boxes"] = results["boxes"]

        rles: List = [None] * n
        if "packed" in results:
            rles = native.rle_from_packed_cropped(
                results["packed"],
                np.tile([[x_off, y_off]], (n, 1)),
                (crop_h, crop_w), orig_h, orig_w)
        else:
            fits = results["fits"]
            fit_idx = np.flatnonzero(fits)
            if len(fit_idx):
                cs = results["crop_packed"].shape[1]
                origins = results["origins"][fit_idx] + np.array([[x_off, y_off]])
                for i, rle in zip(fit_idx, native.rle_from_packed_cropped(
                        results["crop_packed"][fit_idx], origins,
                        (cs, cs), orig_h, orig_w)):
                    rles[i] = rle
            big_idx = np.flatnonzero(~fits)
            if len(big_idx):
                assert len(big_idx) == len(results["packed_big"])
                for i, rle in zip(big_idx, native.rle_from_packed_cropped(
                        results["packed_big"],
                        np.tile([[x_off, y_off]], (len(big_idx), 1)),
                        (crop_h, crop_w), orig_h, orig_w)):
                    rles[i] = rle
        data["rles"] = rles
        return data

    def _process_batch(self, points, im_size, crop_box, original_size):
        """Synchronous decode of one point batch (dispatch + fetch + RLE)."""
        handles = self._dispatch_batch(points, im_size)
        from .predictor import _AmgDecoder
        return self._consume_batch(
            _AmgDecoder.fetch(handles), points, crop_box, original_size)

    def _process_crop(self, image, crop_box, crop_layer_idx, precomputed_embeddings,
                      pbar_init=None, pbar_update=None):
        """Decode the full point grid of one crop, batch by batch.

        Three-stage pipeline per batch: the device decodes batch i+1 while a
        worker thread pulls batch i's packed masks over the transfer link and
        the main thread runs the C++ RLE on batch i-1 — the host-side
        transfer+RLE chain was 23x the device decode cost end-to-end, so
        overlapping them is where AMG wall-clock goes.
        """
        from concurrent import futures as _futures
        from .predictor import _AmgDecoder

        x0, y0, x1, y1 = crop_box
        crop = image[y0:y1, x0:x1, :]
        crop_hw = crop.shape[:2]
        if not precomputed_embeddings:
            self._predictor.set_image(crop)

        # grid is unit-square; scale to crop pixels (xy order)
        grid_xy = self.point_grids[crop_layer_idx] * np.array(crop_hw)[None, ::-1]
        batches = [pts for (pts,) in amg_utils.batch_iterator(
            self._points_per_batch, grid_xy)]
        if pbar_init is not None:
            pbar_init(len(batches), "Predict masks for point grid prompts")

        data = MaskData()
        # two fetch workers, three batches in flight: each fetch is
        # latency-bound through the tunnel (see _AmgDecoder.fetch), so
        # overlapping consecutive batches' fetches hides most of it; FIFO
        # consumption keeps MaskData order deterministic
        with _futures.ThreadPoolExecutor(max_workers=2) as fetcher:
            fetch_queue = []  # (future over fetched arrays, points)
            for points in batches:
                handles = self._dispatch_batch(points, crop_hw)
                fetch_queue.append(
                    (fetcher.submit(_AmgDecoder.fetch, handles), points))
                if len(fetch_queue) > 2:
                    fut, pts = fetch_queue.pop(0)
                    data.cat(self._consume_batch(
                        fut.result(), pts, crop_box, self.original_size))
                    if pbar_update is not None:
                        pbar_update(1)
            for fut, pts in fetch_queue:
                data.cat(self._consume_batch(
                    fut.result(), pts, crop_box, self.original_size))
                if pbar_update is not None:
                    pbar_update(1)

        if not precomputed_embeddings:
            self._predictor.reset_image()
        return data

    def initialize(
        self,
        image: np.ndarray,
        image_embeddings=None,
        i: Optional[int] = None,
        verbose: bool = False,
        pbar_init=None,
        pbar_update=None,
    ) -> None:
        """Compute mask data for the point grid (the expensive part)."""
        # remembered so generate can transparently re-run the decode with
        # lower prefilter floors when asked for sub-floor thresholds
        self._init_call = ((image,), dict(
            image_embeddings=image_embeddings, i=i, verbose=verbose))
        self._original_size = image.shape[:2]
        crop_boxes, layer_idxs = amg_utils.generate_crop_boxes(
            self._original_size, self._crop_n_layers, self._crop_overlap_ratio
        )

        # single-crop (no crop pyramid): reuse precomputed embeddings; with a
        # crop pyramid each crop must be re-encoded from pixels
        single_crop = len(crop_boxes) == 1
        if single_crop:
            if image_embeddings is None:
                image_embeddings = util.precompute_image_embeddings(
                    self._predictor, image, verbose=verbose
                )
            util.set_precomputed(self._predictor, image_embeddings, i=i)

        image = util._to_image(image)
        pbar_init, pbar_update, pbar_close = util.handle_pbar(verbose, pbar_init, pbar_update)
        self._crop_list = [
            self._process_crop(
                image, crop_box, layer_idx, precomputed_embeddings=single_crop,
                pbar_init=pbar_init, pbar_update=pbar_update,
            )
            for crop_box, layer_idx in zip(crop_boxes, layer_idxs)
        ]
        pbar_close()
        self._crop_boxes = crop_boxes
        self._is_initialized = True

    def generate(
        self,
        pred_iou_thresh: float = 0.88,
        stability_score_thresh: float = 0.95,
        box_nms_thresh: float = 0.7,
        crop_nms_thresh: float = 0.7,
        min_mask_region_area: int = 0,
        output_mode: str = "instance_segmentation",
        with_background: bool = True,
    ) -> Union[List[Dict[str, Any]], np.ndarray]:
        """Filter + NMS + merge the initialized mask data (cheap)."""
        if not self.is_initialized:
            raise RuntimeError("AutomaticMaskGenerator has not been initialized. Call initialize first.")
        floors = getattr(self, "_prefilter_thresholds", None)
        if floors is not None and (pred_iou_thresh < floors[0]
                                   or stability_score_thresh < floors[1]):
            init_call = getattr(self, "_init_call", None)
            if init_call is None:
                # state came from set_state: the dropped candidates are gone
                raise ValueError(
                    f"generate thresholds ({pred_iou_thresh}, {stability_score_thresh}) are below "
                    f"the device-side prefilter floors {floors}: candidates under the floors were "
                    "never transferred. Re-initialize with prefilter_thresholds=None (or lower "
                    "floors) to generate at these thresholds."
                )
            # this generator ran its own initialize: transparently lower the
            # floors and redo the device decode so sub-floor thresholds keep
            # the reference's generate-with-any-thresholds contract
            warnings.warn(
                f"generate thresholds ({pred_iou_thresh}, {stability_score_thresh}) are below the "
                f"device prefilter floors {floors}; re-running the device decode with lowered "
                "floors (this re-encodes the image if embeddings were not precomputed). "
                "Construct with prefilter_thresholds=None to avoid the redo.")
            self._prefilter_thresholds = (
                min(floors[0], float(pred_iou_thresh)),
                min(floors[1], float(stability_score_thresh)))
            self._amg_decoder = None  # prefilter is baked into its programs
            args, kwargs = init_call
            self.initialize(*args, **kwargs)

        data = MaskData()
        for per_crop, crop_box in zip(self.crop_list, self.crop_boxes):
            data.cat(self._postprocess_batch(
                data=deepcopy(per_crop), crop_box=crop_box,
                original_size=self.original_size,
                pred_iou_thresh=pred_iou_thresh,
                stability_score_thresh=stability_score_thresh,
                box_nms_thresh=box_nms_thresh,
            ))

        if len(self.crop_boxes) > 1 and len(data["crop_boxes"]) > 0:
            # cross-crop NMS, scored by inverse crop area so masks from the
            # smaller (higher-resolution) crops win
            crop_area = np.prod(
                np.asarray(data["crop_boxes"], dtype=np.float64)[:, 2:]
                - np.asarray(data["crop_boxes"], dtype=np.float64)[:, :2],
                axis=1,
            )
            data.filter(batched_nms(
                np.asarray(data["boxes"], dtype=np.float64),
                1.0 / np.maximum(crop_area, 1), None,
                iou_threshold=crop_nms_thresh,
            ))

        data.to_numpy()
        masks = self._postprocess_masks(
            data, min_mask_region_area, box_nms_thresh, crop_nms_thresh, output_mode
        )
        if output_mode == "instance_segmentation":
            shape = masks[0]["segmentation"].shape if masks else self.original_size
            masks = util.mask_data_to_segmentation(
                masks, shape=shape, with_background=with_background, merge_exclusively=False
            )
        return masks


def _process_tiled_embeddings(predictor, image, image_embeddings, tile_shape, halo,
                              verbose, batch_size, mask, i):
    """Compute-or-adopt tiled embeddings and reconcile the tiling geometry.

    Returns (embeddings, tile_shape, halo, tiles_present-or-None); the last
    element is None when the cache covers the whole grid and a sorted tile-id
    list when a mask restricted precompute to a subset.
    """
    if image_embeddings is None:
        if tile_shape is None or halo is None:
            raise ValueError(
                "To compute tiled embeddings the parameters tile_shape and halo have to be passed."
            )
        image_embeddings = util.precompute_image_embeddings(
            predictor, image, tile_shape=tile_shape, halo=halo, verbose=verbose,
            batch_size=batch_size, mask=mask,
        )

    for param_name, requested in (("tile_shape", tile_shape), ("halo", halo)):
        stored = tuple(image_embeddings[param_name])
        if requested is not None and tuple(requested) != stored:
            raise ValueError(
                f"Inconsistent {param_name} parameter {tuple(requested)} "
                f"with precomputed embeddings: {stored}."
            )
    tile_shape = tuple(image_embeddings["tile_shape"])
    halo = tuple(image_embeddings["halo"])

    present = sorted(int(k) for k in image_embeddings["features"].keys())
    grid = Blocking([0, 0], tuple(image_embeddings["shape"])[-2:], tile_shape)
    return (image_embeddings, tile_shape, halo,
            None if len(present) == len(grid) else present)


class TiledAutomaticMaskGenerator(AutomaticMaskGenerator):
    """AMG over tiled embeddings: tiles are the crop boxes (reference
    instance_segmentation.py:567)."""

    def __init__(
        self,
        predictor: SamPredictor,
        points_per_side: Optional[int] = 32,
        points_per_batch: int = 64,
        point_grids: Optional[List[np.ndarray]] = None,
        stability_score_offset: float = 1.0,
        prefilter_thresholds: Optional[Tuple[float, float]] =
            AutomaticMaskGenerator.DEFAULT_PREFILTER,
    ) -> None:
        # no crop pyramid for tiled AMG: the tiles themselves are the crops
        super().__init__(
            predictor, points_per_side, points_per_batch,
            point_grids=point_grids,
            stability_score_offset=stability_score_offset,
            prefilter_thresholds=prefilter_thresholds,
        )

    def initialize(
        self,
        image: np.ndarray,
        image_embeddings=None,
        i: Optional[int] = None,
        tile_shape: Optional[Tuple[int, int]] = None,
        halo: Optional[Tuple[int, int]] = None,
        verbose: bool = False,
        pbar_init=None,
        pbar_update=None,
        batch_size: int = 1,
        mask: Optional[np.ndarray] = None,
    ) -> None:
        original_size = image.shape[:2]
        self._original_size = original_size
        self._init_call = ((image,), dict(
            image_embeddings=image_embeddings, i=i, tile_shape=tile_shape,
            halo=halo, verbose=verbose, batch_size=batch_size, mask=mask))

        self._image_embeddings, tile_shape, halo, tiles_in_mask = _process_tiled_embeddings(
            self._predictor, image, image_embeddings, tile_shape, halo,
            verbose=verbose, batch_size=batch_size, mask=mask, i=i,
        )

        tiling = Blocking([0, 0], original_size, tile_shape)
        if tiles_in_mask is None:
            tile_ids = list(range(len(tiling)))
        else:
            tile_ids = [int(t) for t in tiles_in_mask]
        n_tiles = len(tile_ids)

        tiles = [tiling.get_block_with_halo(tid, list(halo)).outer_block for tid in tile_ids]
        crop_boxes = [[t.begin[1], t.begin[0], t.end[1], t.end[0]] for t in tiles]

        pbar_init, pbar_update, pbar_close = util.handle_pbar(verbose, pbar_init, pbar_update)
        pbar_init(n_tiles, "Compute masks for tile")

        image = util._to_image(image)

        mask_data = []
        for idx, tile_id in enumerate(tile_ids):
            util.set_precomputed(self._predictor, self._image_embeddings, i, tile_id=tile_id)
            this_mask_data = self._process_crop(
                image, crop_box=crop_boxes[idx], crop_layer_idx=0, precomputed_embeddings=True
            )
            mask_data.append(this_mask_data)
            pbar_update(1)
        pbar_close()

        self._is_initialized = True
        self._crop_list = mask_data
        self._crop_boxes = crop_boxes


#
# AIS: decoder-based instance segmentation
#

class DecoderAdapter:
    """Jitted UNETR decoder over precomputed embeddings (reference
    instance_segmentation.py:691). Call with NHWC or NCHW features."""

    def __init__(self, params: dict = None, out_channels: int = 3, unetr=None):
        from .models import unetr as unetr_mod
        if params is None:
            # reference calling convention: DecoderAdapter(unetr) with the
            # decoder module/param-tree (reference instance_segmentation.py:697)
            if unetr is None:
                raise ValueError("Pass the decoder param tree (params= or unetr=).")
            params = getattr(unetr, "params", unetr)
        self.params = params
        self.out_channels = out_channels
        self._apply = jax.jit(unetr_mod.apply_unetr_decoder)
        self._unetr = unetr_mod

    def _forward_impl(self, features: jnp.ndarray) -> jnp.ndarray:
        """features: (B, 64, 64, 256) or (B, 256, 64, 64) -> (B, S, S, C)."""
        features = jnp.asarray(features)
        if features.ndim == 3:
            features = features[None]
        up = self.params["deconv1"]["up"]
        emb_ch = up["conv"]["w"].shape[-2] if "conv" in up else up["w"].shape[-1]
        if features.shape[-1] != emb_ch and features.shape[1] == emb_ch:
            features = jnp.transpose(features, (0, 2, 3, 1))
        return self._apply(self.params, features)

    def __call__(self, features, input_shape, original_shape) -> np.ndarray:
        """Returns (B, C, H, W) numpy (reference layout)."""
        out = self._forward_impl(features)
        out = self._unetr.postprocess_decoder_output(out, input_shape, original_shape)
        return np.asarray(jnp.transpose(out, (0, 3, 1, 2)), dtype=np.float32)


def get_unetr(image_encoder=None, decoder_state=None, device=None, out_channels: int = 3,
              flexible_load_checkpoint: bool = False, final_activation="Sigmoid",
              embed_dim: int = 256, seed: int = 0):
    """Build UNETR decoder params (reference instance_segmentation.py:741).

    decoder_state: this framework's pytree, a torch_em UNETR state dict (the
    published ``*_decoder`` zoo checkpoints — converted via
    models.unetr.convert_torch_em_decoder), or None for random init.
    """
    from .models import unetr as unetr_mod
    if decoder_state is not None:
        return _merge_decoder_state(None, decoder_state, flexible_load_checkpoint)
    params = unetr_mod.init_unetr_decoder(
        jax.random.PRNGKey(seed), embed_dim=embed_dim, out_channels=out_channels
    )
    return params


def _merge_decoder_state(params, decoder_state, flexible: bool):
    """Resolve a saved decoder state into this framework's UNETR pytree."""
    from .models import unetr as unetr_mod
    if unetr_mod.is_torch_decoder_state(decoder_state):
        # torch_em UNETR state dict (zoo decoder checkpoints, reference
        # instance_segmentation.py:786-811 does the equivalent surgery)
        try:
            return unetr_mod.convert_torch_em_decoder(decoder_state)
        except Exception as e:
            if flexible:
                warnings.warn(f"Decoder state conversion failed ({e}); "
                              "keeping random initialization.")
                return unetr_mod.init_unetr_decoder(jax.random.PRNGKey(0))
            raise
    if isinstance(decoder_state, dict) and "deconv1" in decoder_state:
        return jax.tree.map(lambda b: jnp.asarray(np.asarray(b)), decoder_state)
    if flexible:
        warnings.warn("Unrecognized decoder state format; keeping random initialization.")
        return unetr_mod.init_unetr_decoder(jax.random.PRNGKey(0))
    raise ValueError(
        "Unrecognized decoder state format. Expected a micro_sam_tpu UNETR "
        "pytree or a torch_em UNETR state dict."
    )


def get_decoder(image_encoder=None, decoder_state=None, device=None) -> DecoderAdapter:
    """Get decoder to predict outputs for automatic instance segmentation
    (reference instance_segmentation.py:815)."""
    params = get_unetr(image_encoder, decoder_state, device)
    return DecoderAdapter(params)


def get_predictor_and_decoder(
    model_type: str,
    checkpoint_path=None,
    device=None,
    peft_kwargs: Optional[Dict] = None,
) -> Tuple[SamPredictor, DecoderAdapter]:
    """Load SAM predictor and segmentation decoder (reference
    instance_segmentation.py:834)."""
    predictor, state = util.get_sam_model(
        model_type=model_type, checkpoint_path=checkpoint_path, device=device,
        return_state=True, peft_kwargs=peft_kwargs,
    )
    if "decoder_state" not in state:
        raise ValueError(
            f"The checkpoint at '{checkpoint_path}' or the chosen model '{model_type}' "
            "does not contain a decoder state"
        )
    decoder = get_decoder(None, state["decoder_state"], device)
    return predictor, decoder


def watershed_from_center_and_boundary_distances(
    center_distances: np.ndarray,
    boundary_distances: np.ndarray,
    foreground_map: np.ndarray,
    center_distance_threshold: float = 0.5,
    boundary_distance_threshold: float = 0.5,
    foreground_threshold: float = 0.5,
    distance_smoothing: float = 1.6,
    min_size: int = 0,
) -> np.ndarray:
    """Seeded watershed from thresholded distance maps (the torch_em op the
    reference uses; see SURVEY.md §2.4)."""
    cd = gaussian_smooth(center_distances, distance_smoothing)
    bd = gaussian_smooth(boundary_distances, distance_smoothing)
    fg_mask = foreground_map > foreground_threshold
    marker_map = (cd < center_distance_threshold) & (bd < boundary_distance_threshold) & fg_mask
    from scipy import ndimage
    markers, _ = ndimage.label(marker_map)
    segmentation = native.seeded_watershed(
        bd.astype(np.float32), markers.astype(np.uint32), mask=fg_mask
    )
    if min_size > 0:
        segmentation = native.size_filter(segmentation, min_size=min_size)
    return segmentation.astype(np.uint32)


class InstanceSegmentationWithDecoder:
    """Decoder-based instance segmentation (AIS) — reference
    instance_segmentation.py:956 semantics.

    The decoder predicts three maps (foreground probability, normalized
    center distance, boundary distance); ``initialize`` runs the jitted
    decoder once and stashes them, ``generate`` is a cheap re-tunable
    watershed over the stashed maps.
    """

    # decoder channel -> attribute the map is stored under
    _MAP_ATTRS = ("_foreground", "_center_distances", "_boundary_distances")

    def __init__(self, predictor: SamPredictor, decoder: DecoderAdapter) -> None:
        self._predictor = predictor
        self._decoder = decoder
        self._is_initialized = False
        self._store_maps(None)

    def _store_maps(self, maps) -> None:
        for channel, attr in enumerate(self._MAP_ATTRS):
            setattr(self, attr, None if maps is None else maps[channel])

    @property
    def is_initialized(self):
        return self._is_initialized

    def initialize(
        self,
        image: np.ndarray,
        image_embeddings=None,
        i: Optional[int] = None,
        verbose: bool = False,
        pbar_init=None,
        pbar_update=None,
        ndim: int = 2,
    ) -> None:
        pbar_init, pbar_update, pbar_close = util.handle_pbar(verbose, pbar_init, pbar_update)
        pbar_init(1, "Initialize instance segmentation with decoder")

        if image_embeddings is None:
            image_embeddings = util.precompute_image_embeddings(
                predictor=self._predictor, input_=image, ndim=ndim, verbose=verbose
            )
        self._predictor = util.set_precomputed(self._predictor, image_embeddings, i=i)

        maps = self._decoder(
            self._predictor.features,
            tuple(self._predictor.input_size),
            tuple(self._predictor.original_size),
        )[0]
        assert maps.shape[0] == len(self._MAP_ATTRS), f"{maps.shape}"
        pbar_update(1)
        pbar_close()

        self._store_maps(maps)
        self._i = i
        self._is_initialized = True

    @staticmethod
    def _to_masks(segmentation, output_mode):
        """Label image -> list of binary-mask records (the reference's
        'binary_mask' output shape, with xywh[zd]-style bboxes)."""
        if output_mode != "binary_mask":
            raise ValueError(
                f"Output mode {output_mode} is not supported. "
                "Choose one of 'instance_segmentation', 'binary_mask'."
            )
        ndim = segmentation.ndim
        assert ndim in (2, 3)
        # full-image crop box, innermost axis first: [0, W, 0, H(, 0, D)]
        crop_box = [v for size in segmentation.shape[::-1] for v in (0, size)]

        def record(prop):
            lo, hi = prop.bbox[:ndim], prop.bbox[ndim:]
            if ndim == 2:
                (y0, x0), (y1, x1) = lo, hi
                bbox = [x0, x1 - x0, y0, y1 - y0]
            else:
                (z0, y0, x0), (z1, y1, x1) = lo, hi
                # depth measured from y0 (matches the reference's record)
                bbox = [x0, x1 - x0, y0, y1 - y0, z0, z1 - y0]
            return {
                "segmentation": segmentation == prop.label,
                "area": prop.area,
                "bbox": bbox,
                "crop_box": crop_box,
                "seg_id": prop.label,
            }

        return [record(prop) for prop in regionprops(segmentation)]

    def generate(
        self,
        center_distance_threshold: float = 0.5,
        boundary_distance_threshold: float = 0.5,
        foreground_threshold: float = 0.5,
        foreground_smoothing: float = 1.0,
        distance_smoothing: float = 1.6,
        min_size: int = 0,
        output_mode: str = "instance_segmentation",
        tile_shape: Optional[Tuple[int, int]] = None,
        halo: Optional[Tuple[int, int]] = None,
        n_threads: Optional[int] = None,
        optimize_memory: bool = False,
        segmentation: Optional[np.ndarray] = None,
    ) -> Union[List[Dict[str, Any]], np.ndarray]:
        """Watershed postprocessing of the decoder predictions (cheap,
        re-parameterizable)."""
        if not self.is_initialized:
            raise RuntimeError(
                "InstanceSegmentationWithDecoder has not been initialized. Call initialize first."
            )

        fg = self._foreground
        if foreground_smoothing > 0:
            fg = gaussian_smooth(fg, foreground_smoothing)

        watershed_params = dict(
            center_distance_threshold=center_distance_threshold,
            boundary_distance_threshold=boundary_distance_threshold,
            foreground_threshold=foreground_threshold,
            distance_smoothing=distance_smoothing,
            min_size=min_size,
        )
        segmentation = watershed_from_center_and_boundary_distances(
            self._center_distances, self._boundary_distances, fg,
            **watershed_params,
        )

        if output_mode != "instance_segmentation":
            segmentation = self._to_masks(segmentation, output_mode)
        return segmentation

    # state keys in the reference's h5/pickle cache layout
    _STATE_KEYS = ("foreground", "center_distances", "boundary_distances")

    def get_state(self) -> Dict[str, Any]:
        if not self.is_initialized:
            raise RuntimeError("The state has not been computed yet. Call initialize first.")
        return {key: getattr(self, f"_{key}") for key in self._STATE_KEYS}

    def set_state(self, state: Dict[str, Any]) -> None:
        for key in self._STATE_KEYS:
            setattr(self, f"_{key}", state[key])
        self._is_initialized = True

    def clear_state(self):
        self._store_maps(None)
        self._is_initialized = False

    # ---- shared by the APG subclasses (prompt derivation over the maps) ----
    def _derive_prompts(self, prompt_function, foreground_threshold,
                        center_distance_threshold, boundary_distance_threshold):
        derive = prompt_function or _derive_point_prompts
        return derive(
            self._foreground, self._center_distances, self._boundary_distances,
            foreground_threshold=foreground_threshold,
            center_distance_threshold=center_distance_threshold,
            boundary_distance_threshold=boundary_distance_threshold,
        )

    @staticmethod
    def _empty_result(shape, output_mode):
        if output_mode == "instance_segmentation":
            return np.zeros(shape, dtype="uint32")
        return []


class TiledInstanceSegmentationWithDecoder(InstanceSegmentationWithDecoder):
    """AIS over tiled embeddings: batched decoder, inner blocks pasted into the
    full-size maps (reference instance_segmentation.py:1213)."""

    def _predict_decoder(self, batched_embeddings, input_shapes, original_shapes):
        batched = jnp.concatenate([jnp.asarray(e) for e in batched_embeddings], axis=0)
        output = self._decoder._forward_impl(batched)
        out = []
        from .models import unetr as unetr_mod
        for k, (input_shape, original_shape) in enumerate(zip(input_shapes, original_shapes)):
            x = unetr_mod.postprocess_decoder_output(
                output[k:k + 1], input_shape, original_shape
            )
            out.append(np.asarray(jnp.transpose(x[0], (2, 0, 1)), dtype=np.float32))
        return out

    def _decode_tile_batch(self, tile_ids, i):
        """Install each tile's embeddings, run the decoder batched, return the
        per-tile (3, h, w) output maps."""
        feats, in_shapes, out_shapes = [], [], []
        for tile_id in tile_ids:
            self._predictor = util.set_precomputed(
                self._predictor, self._image_embeddings, i=i, tile_id=int(tile_id)
            )
            feats.append(self._predictor.features)
            in_shapes.append(tuple(self._predictor.input_size))
            out_shapes.append(tuple(self._predictor.original_size))
        return self._predict_decoder(feats, in_shapes, out_shapes)

    def initialize(
        self,
        image: np.ndarray,
        image_embeddings=None,
        i: Optional[int] = None,
        tile_shape: Optional[Tuple[int, int]] = None,
        halo: Optional[Tuple[int, int]] = None,
        verbose: bool = False,
        pbar_init=None,
        pbar_update=None,
        batch_size: int = 1,
        mask: Optional[np.ndarray] = None,
    ) -> None:
        original_size = image.shape[:2]
        self._image_embeddings, tile_shape, halo, tiles_in_mask = _process_tiled_embeddings(
            self._predictor, image, image_embeddings, tile_shape, halo,
            verbose=verbose, batch_size=batch_size, mask=mask, i=i,
        )
        tiling = Blocking([0, 0], original_size, tile_shape)
        tile_ids = (list(range(len(tiling))) if tiles_in_mask is None
                    else [int(t) for t in tiles_in_mask])

        pbar_init, pbar_update, pbar_close = util.handle_pbar(verbose, pbar_init, pbar_update)
        pbar_init(len(tile_ids), "Initialize tiled instance segmentation with decoder")

        # one full-size canvas per decoder channel; each tile's inner block
        # is pasted in (halos overlap, inner blocks partition the image)
        canvases = np.zeros((len(self._MAP_ATTRS),) + tuple(original_size), dtype="float32")

        n_batches = int(np.ceil(len(tile_ids) / batch_size))
        for chunk in np.array_split(tile_ids, n_batches):
            for tile_id, maps in zip(chunk, self._decode_tile_batch(chunk, i)):
                assert maps.shape[0] == len(self._MAP_ATTRS)
                block = tiling.get_block_with_halo(int(tile_id), list(halo))
                src = (slice(None),) + block.inner_block_local.slicing
                dst = (slice(None),) + block.inner_block.slicing
                canvases[dst] = maps[src]
                pbar_update(1)
        pbar_close()

        self._i = i
        self._store_maps(canvases)
        self._is_initialized = True


#
# APG: decoder-derived prompts + NMS
#

def _get_centers(segmentation, avoid_image_border=True):
    """One interior point per object: the maximum of the distance-to-boundary
    transform inside each object (a point guaranteed to be deep in the mask;
    reference instance_segmentation.py:1325 role)."""
    interior = find_boundaries_outer(segmentation > 0) == 0
    if avoid_image_border:
        for edge in (np.s_[0, :], np.s_[-1, :], np.s_[:, 0], np.s_[:, -1]):
            interior[edge] = False
    depth = native.distance_transform(interior)

    centers = []
    for prop in regionprops(segmentation):
        y0, x0, y1, x1 = prop.bbox
        window = np.s_[y0:y1, x0:x1]
        local_depth = np.where(segmentation[window] == prop.label, depth[window], 0)
        dy, dx = np.unravel_index(np.argmax(local_depth), local_depth.shape)
        centers.append((y0 + dy, x0 + dx))
    return np.array(centers) if centers else np.zeros((0, 2), dtype=np.int64)


def _derive_point_prompts(
    foreground: np.ndarray,
    center_distances: np.ndarray,
    boundary_distances: np.ndarray,
    foreground_threshold: float = 0.5,
    center_distance_threshold: float = 0.5,
    boundary_distance_threshold: float = 0.5,
):
    """Decoder maps -> one positive point per putative object: connected
    components of the low-distance foreground cores, each reduced to its
    deepest interior point."""
    core = (
        (center_distances < center_distance_threshold)
        & (boundary_distances < boundary_distance_threshold)
        & (foreground >= foreground_threshold)
    )
    components = native.label(core.astype(np.uint32))
    centers_yx = _get_centers(components)
    if len(centers_yx) == 0:
        return None
    return {
        "points": centers_yx[:, None, ::-1].astype(np.float64),  # yx -> xy
        "point_labels": np.ones((len(centers_yx), 1)),
    }


def _derive_box_prompts(predictions, box_extension, bbox_key="bbox", shape=None):
    """Slightly extended XYXY boxes around predicted masks, for a refinement
    decode round. ``bbox_key="global_bbox"`` reads the image-frame boxes that
    tiled inference attaches, with ``shape`` bounding the extension."""
    if shape is None:
        shape = predictions[0]["segmentation"].shape
    height, width = shape[:2]
    prompts = []
    for pred in predictions:
        x, y, w, h = pred[bbox_key]
        # x clamps to the WIDTH and y to the HEIGHT (the reference clamps
        # against the swapped axes, instance_segmentation.py:1391-1392, which
        # produces degenerate boxes on non-square images)
        prompts.append([
            max(x - w * box_extension, 0),
            max(y - h * box_extension, 0),
            min(x + (1 + box_extension) * w, width),
            min(y + (1 + box_extension) * h, height),
        ])
    return {"boxes": np.array(prompts)}


class AutomaticPromptGenerator(InstanceSegmentationWithDecoder):
    """Decoder-derived point prompts + batched inference + mask NMS
    (reference instance_segmentation.py:1397)."""

    def generate(
        self,
        min_size: int = 25,
        center_distance_threshold: float = 0.5,
        boundary_distance_threshold: float = 0.5,
        foreground_threshold: float = 0.5,
        multimasking: bool = False,
        batch_size: int = 32,
        nms_threshold: float = 0.9,
        intersection_over_min: bool = False,
        output_mode: str = "instance_segmentation",
        mask_threshold: Optional[Union[float, str]] = None,
        refine_with_box_prompts: bool = False,
        prompt_function: Optional[callable] = None,
    ) -> Union[List[Dict[str, Any]], np.ndarray]:
        if not self.is_initialized:
            raise RuntimeError("AutomaticPromptGenerator has not been initialized. Call initialize first.")

        prompts = self._derive_prompts(
            prompt_function, foreground_threshold,
            center_distance_threshold, boundary_distance_threshold)
        shape = self._foreground.shape
        if prompts is None:
            return self._empty_result(shape, output_mode)

        def decode(prompt_dict):
            return batched_inference(
                self._predictor, image=None, batch_size=batch_size,
                return_instance_segmentation=False, multimasking=multimasking,
                mask_threshold=mask_threshold, i=getattr(self, "_i", None),
                **prompt_dict,
            )

        predictions = decode(prompts)
        if refine_with_box_prompts and len(predictions) > 0:
            # second decode round from slightly extended boxes around the
            # point-prompted masks
            predictions = decode(_derive_box_prompts(predictions, box_extension=0.01))

        segmentation = util.apply_nms(
            predictions, min_size=min_size, nms_thresh=nms_threshold,
            intersection_over_min=intersection_over_min, shape=shape,
        )
        if output_mode != "instance_segmentation":
            segmentation = self._to_masks(segmentation, output_mode)
        return segmentation


class TiledAutomaticPromptGenerator(TiledInstanceSegmentationWithDecoder):
    """APG over tiled embeddings (reference instance_segmentation.py:1511)."""

    def generate(
        self,
        min_size: int = 25,
        center_distance_threshold: float = 0.5,
        boundary_distance_threshold: float = 0.5,
        foreground_threshold: float = 0.5,
        multimasking: bool = False,
        batch_size: int = 32,
        nms_threshold: float = 0.9,
        intersection_over_min: bool = False,
        output_mode: str = "instance_segmentation",
        mask_threshold: Optional[Union[float, str]] = None,
        refine_with_box_prompts: bool = False,
        prompt_function: Optional[callable] = None,
        optimize_memory: bool = False,
    ) -> Union[List[Dict[str, Any]], np.ndarray]:
        if not self.is_initialized:
            raise RuntimeError(
                "TiledAutomaticPromptGenerator has not been initialized. Call initialize first."
            )
        if optimize_memory and (output_mode != "instance_segmentation" or refine_with_box_prompts):
            raise ValueError("Invalid settings")

        prompts = self._derive_prompts(
            prompt_function, foreground_threshold,
            center_distance_threshold, boundary_distance_threshold)
        shape = self._foreground.shape
        if prompts is None:
            return self._empty_result(shape, output_mode)

        def decode(prompt_dict, **extra):
            return batched_tiled_inference(
                self._predictor, image=None, batch_size=batch_size,
                image_embeddings=self._image_embeddings,
                return_instance_segmentation=False, multimasking=multimasking,
                i=getattr(self, "_i", None), **extra, **prompt_dict,
            )

        if optimize_memory:
            # per-tile NMS + stitching inside tiled inference bounds memory
            # to one tile's masks; returns a finished label image
            prompts.update(min_size=min_size, nms_thresh=nms_threshold,
                           intersection_over_min=intersection_over_min)
            return decode(prompts, optimize_memory=True)

        predictions = decode(prompts)
        if refine_with_box_prompts and len(predictions) > 0:
            # the reference declines this for tiled embeddings
            # (instance_segmentation.py:1606-1609 raises); here the refinement
            # boxes are derived in the IMAGE frame from the global_bbox each
            # tiled prediction carries and re-routed through tiled inference
            predictions = decode(_derive_box_prompts(
                predictions, box_extension=0.01, bbox_key="global_bbox",
                shape=shape,
            ))

        segmentation = util.apply_nms(
            predictions, shape=shape, min_size=min_size, nms_thresh=nms_threshold,
            intersection_over_min=intersection_over_min,
        )
        if output_mode != "instance_segmentation":
            segmentation = self._to_masks(segmentation, output_mode)
        return segmentation

    def get_state(self) -> Dict[str, Any]:
        """State incl. the embeddings when they are in-memory (the reference
        raises NotImplementedError here, instance_segmentation.py:1623-1630,
        because its state would have to serialize the embeddings; this
        implementation embeds them when picklable and otherwise leaves a None
        the caller must fill on set_state)."""
        state = super().get_state()
        feats = self._image_embeddings.get("features")
        serializable = isinstance(feats, dict) and all(
            isinstance(v, dict) for v in feats.values())
        state["image_embeddings"] = self._image_embeddings if serializable else None
        state["i"] = getattr(self, "_i", None)
        return state

    def set_state(self, state: Dict[str, Any], image_embeddings=None) -> None:
        emb = image_embeddings if image_embeddings is not None \
            else state.get("image_embeddings")
        if emb is None:
            raise ValueError(
                "This tiled APG state does not carry embeddings (they were "
                "zarr-backed when saved); pass image_embeddings= to set_state."
            )
        super().set_state({k: state[k] for k in self._STATE_KEYS})
        self._image_embeddings = emb
        self._i = state.get("i")


def get_instance_segmentation_generator(
    predictor: SamPredictor,
    is_tiled: bool,
    decoder: Optional[DecoderAdapter] = None,
    segmentation_mode: Optional[str] = None,
    **kwargs,
):
    """Segmenter factory by mode amg/ais/apg x tiled (reference
    instance_segmentation.py:1634)."""
    if segmentation_mode is None:
        segmentation_mode = "amg" if decoder is None else DEFAULT_SEGMENTATION_MODE_WITH_DECODER

    registry = {
        # mode -> ((flat class, tiled class), needs decoder)
        "amg": ((AutomaticMaskGenerator, TiledAutomaticMaskGenerator), False),
        "ais": ((InstanceSegmentationWithDecoder, TiledInstanceSegmentationWithDecoder), True),
        "apg": ((AutomaticPromptGenerator, TiledAutomaticPromptGenerator), True),
    }
    try:
        (flat_cls, tiled_cls), needs_decoder = registry[segmentation_mode.lower()]
    except KeyError:
        raise ValueError(
            f"Invalid segmentation_mode: {segmentation_mode}. "
            "Choose one of 'amg', 'ais', or 'apg'."
        ) from None
    cls = tiled_cls if is_tiled else flat_cls
    if needs_decoder:
        assert decoder is not None
        return cls(predictor, decoder, **kwargs)
    return cls(predictor, **kwargs)
