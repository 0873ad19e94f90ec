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
    """Stand-in for the image when only its shape is needed (embeddings are
    precomputed) — reference instance_segmentation.py:54-60."""

    def __init__(self, shape):
        self.shape = shape

    def __getitem__(self, index):
        block_shape = tuple(ind.stop - ind.start for ind in index)
        return np.zeros(block_shape, dtype="float32")


#
# AMG
#

class AMGBase(ABC):
    """Base class for the automatic mask generators (reference
    instance_segmentation.py:68)."""

    def __init__(self):
        self._is_initialized = False
        self._crop_list = None
        self._crop_boxes = None
        self._original_size = None

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
        orig_h, orig_w = original_size

        if pred_iou_thresh > 0.0:
            data.filter(np.asarray(data["iou_preds"]) > pred_iou_thresh)
        if stability_score_thresh > 0.0:
            data.filter(np.asarray(data["stability_score"]) >= stability_score_thresh)

        keep_mask = ~amg_utils.is_box_near_crop_edge(data["boxes"], crop_box, [0, 0, orig_w, orig_h])
        if not keep_mask.all():
            data.filter(keep_mask)

        keep_by_nms = batched_nms(
            np.asarray(data["boxes"], dtype=np.float64),
            np.asarray(data["iou_preds"]),
            None,
            iou_threshold=box_nms_thresh,
        )
        data.filter(keep_by_nms)

        data["boxes"] = amg_utils.uncrop_boxes_xyxy(data["boxes"], crop_box)
        data["crop_boxes"] = np.array([crop_box for _ in range(len(data["rles"]))])
        if "points" in data:
            data["points"] = amg_utils.uncrop_points(data["points"], crop_box)
        return data

    def _postprocess_small_regions(self, mask_data, min_area, nms_thresh):
        if len(mask_data["rles"]) == 0:
            return mask_data

        new_masks, scores = [], []
        for rle in mask_data["rles"]:
            mask = amg_utils.rle_to_mask(rle)
            mask, changed = amg_utils.remove_small_regions(mask, min_area, mode="holes")
            unchanged = not changed
            mask, changed = amg_utils.remove_small_regions(mask, min_area, mode="islands")
            unchanged = unchanged and not changed
            new_masks.append(mask)
            # score 1 for unchanged so NMS prefers masks that didn't need fixing
            scores.append(float(unchanged))

        masks = np.stack(new_masks)
        boxes = np.asarray(amg_utils.batched_mask_to_box(jnp.asarray(masks)))
        keep_by_nms = batched_nms(
            boxes.astype(np.float64), np.asarray(scores), None, iou_threshold=nms_thresh
        )

        for i_mask in keep_by_nms:
            if scores[i_mask] == 0.0:
                mask_data["rles"][i_mask] = amg_utils.mask_to_rle(masks[i_mask])
                mask_data["boxes"][i_mask] = boxes[i_mask]
        mask_data.filter(keep_by_nms)
        return mask_data

    def _postprocess_masks(self, mask_data, min_mask_region_area, box_nms_thresh,
                           crop_nms_thresh, output_mode):
        if min_mask_region_area > 0:
            mask_data = self._postprocess_small_regions(
                mask_data, min_mask_region_area, max(box_nms_thresh, crop_nms_thresh)
            )

        if output_mode == "coco_rle":
            mask_data["segmentations"] = [amg_utils.coco_encode_rle(rle) for rle in mask_data["rles"]]
        elif output_mode in ("binary_mask", "instance_segmentation"):
            mask_data["segmentations"] = [amg_utils.rle_to_mask(rle) for rle in mask_data["rles"]]
        elif output_mode == "rle":
            mask_data["segmentations"] = list(mask_data["rles"])
        else:
            raise ValueError(f"Invalid output mode {output_mode}.")

        curr_anns = []
        for idx in range(len(mask_data["segmentations"])):
            ann = {
                "segmentation": mask_data["segmentations"][idx],
                "area": amg_utils.area_from_rle(mask_data["rles"][idx]),
                "bbox": amg_utils.box_xyxy_to_xywh(mask_data["boxes"][idx]).tolist(),
                "predicted_iou": float(mask_data["iou_preds"][idx]),
                "stability_score": float(mask_data["stability_score"][idx]),
                "crop_box": amg_utils.box_xyxy_to_xywh(mask_data["crop_boxes"][idx]).tolist(),
            }
            if "points" in mask_data:
                ann["point_coords"] = [mask_data["points"][idx].tolist()]
            curr_anns.append(ann)
        return curr_anns

    def _to_mask_data(self, masks, iou_preds, crop_box, original_size, points=None):
        """masks (B, C, H, W) float logits (device) -> MaskData with stability
        scores, thresholded masks, boxes and RLEs. The reductions (stability,
        threshold, boxes) run on device; only the bool masks come to host."""
        orig_h, orig_w = original_size
        B, C = masks.shape[:2]
        flat = masks.reshape((B * C,) + masks.shape[2:])
        flat_j = jnp.asarray(flat)

        data = MaskData(
            masks=np.asarray(flat),
            iou_preds=np.asarray(iou_preds).reshape(-1),
        )
        if points is not None:
            data["points"] = np.repeat(np.asarray(points), C, axis=0).astype(np.float64)

        data["stability_score"] = np.asarray(amg_utils.calculate_stability_score(
            flat_j, MASK_THRESHOLD, self._stability_score_offset
        ))
        bool_masks = flat_j > MASK_THRESHOLD
        data["boxes"] = np.asarray(amg_utils.batched_mask_to_box(bool_masks))
        bool_masks_np = np.asarray(bool_masks)
        bool_masks_np = amg_utils.uncrop_masks(bool_masks_np, crop_box, orig_h, orig_w)
        data["masks"] = bool_masks_np
        data["rles"] = amg_utils.batched_mask_to_rle(bool_masks_np)
        del data["masks"]
        return data

    def get_state(self) -> Dict[str, Any]:
        if not self.is_initialized:
            raise RuntimeError("The state has not been computed yet. Call initialize first.")
        return {
            "crop_list": self.crop_list, "crop_boxes": self.crop_boxes,
            "original_size": self.original_size,
        }

    def set_state(self, state: Dict[str, Any]) -> None:
        self._crop_list = state["crop_list"]
        self._crop_boxes = state["crop_boxes"]
        self._original_size = state["original_size"]
        self._is_initialized = True

    def clear_state(self):
        self._crop_list = None
        self._crop_boxes = None
        self._original_size = None
        self._is_initialized = False


class AutomaticMaskGenerator(AMGBase):
    """Grid-prompt automatic mask generation (reference
    instance_segmentation.py:291). Expensive decode in ``initialize``, cheap
    re-parameterizable filtering in ``generate``."""

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
    ):
        super().__init__()
        if points_per_side is not None:
            self.point_grids = amg_utils.build_all_layer_point_grids(
                points_per_side, crop_n_layers, crop_n_points_downscale_factor,
            )
        elif point_grids is not None:
            self.point_grids = point_grids
        else:
            raise ValueError("Can't have both points_per_side and point_grid be None or not None.")

        self._predictor = predictor
        self._points_per_side = points_per_side
        self._points_per_batch = 64 if points_per_batch is None else points_per_batch
        self._crop_n_layers = crop_n_layers
        self._crop_overlap_ratio = crop_overlap_ratio
        self._crop_n_points_downscale_factor = crop_n_points_downscale_factor
        self._stability_score_offset = stability_score_offset
        self._amg_decoder = None

    def _process_batch(self, points, im_size, crop_box, original_size):
        # Device-side fast path: decode + threshold + stability + boxes +
        # bit-packing in ONE jit program; only packed bool masks reach the
        # host (~32x less transfer than float masks).
        from .predictor import _AmgDecoder
        if self._amg_decoder is None or self._amg_decoder.predictor is not self._predictor:
            self._amg_decoder = _AmgDecoder(self._predictor, self._stability_score_offset)

        transformed = self._predictor.transform.apply_coords(points, im_size)
        packed, iou_preds, stability, boxes = self._amg_decoder(
            transformed.astype(np.float32)
        )

        orig_h, orig_w = original_size
        crop_h, crop_w = self._predictor.original_size
        C = iou_preds.shape[1]
        data = MaskData(iou_preds=np.asarray(iou_preds).reshape(-1))
        data["points"] = np.repeat(np.asarray(points), C, axis=0).astype(np.float64)
        data["stability_score"] = np.asarray(stability).reshape(-1)
        data["boxes"] = np.asarray(boxes).reshape(-1, 4)

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

    def _process_crop(self, image, crop_box, crop_layer_idx, precomputed_embeddings,
                      pbar_init=None, pbar_update=None):
        x0, y0, x1, y1 = crop_box
        cropped_im = image[y0:y1, x0:x1, :]
        cropped_im_size = cropped_im.shape[:2]

        if not precomputed_embeddings:
            self._predictor.set_image(cropped_im)

        points_scale = np.array(cropped_im_size)[None, ::-1]
        points_for_image = self.point_grids[crop_layer_idx] * points_scale

        data = MaskData()
        n_batches = len(points_for_image) // self._points_per_batch + \
            int(len(points_for_image) % self._points_per_batch != 0)
        if pbar_init is not None:
            pbar_init(n_batches, "Predict masks for point grid prompts")

        for (points,) in amg_utils.batch_iterator(self._points_per_batch, points_for_image):
            batch_data = self._process_batch(points, cropped_im_size, crop_box, self.original_size)
            data.cat(batch_data)
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
        original_size = image.shape[:2]
        self._original_size = original_size

        crop_boxes, layer_idxs = amg_utils.generate_crop_boxes(
            original_size, self._crop_n_layers, self._crop_overlap_ratio
        )

        if len(crop_boxes) == 1:
            if image_embeddings is None:
                image_embeddings = util.precompute_image_embeddings(
                    self._predictor, image, verbose=verbose
                )
            util.set_precomputed(self._predictor, image_embeddings, i=i)
            precomputed_embeddings = True
        else:
            precomputed_embeddings = False

        image = util._to_image(image)

        pbar_init, pbar_update, pbar_close = util.handle_pbar(verbose, pbar_init, pbar_update)

        crop_list = []
        for crop_box, layer_idx in zip(crop_boxes, layer_idxs):
            crop_data = self._process_crop(
                image, crop_box, layer_idx,
                precomputed_embeddings=precomputed_embeddings,
                pbar_init=pbar_init, pbar_update=pbar_update,
            )
            crop_list.append(crop_data)
        pbar_close()

        self._is_initialized = True
        self._crop_list = crop_list
        self._crop_boxes = crop_boxes

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

        data = MaskData()
        for data_, crop_box in zip(self.crop_list, self.crop_boxes):
            crop_data = self._postprocess_batch(
                data=deepcopy(data_), crop_box=crop_box, original_size=self.original_size,
                pred_iou_thresh=pred_iou_thresh,
                stability_score_thresh=stability_score_thresh,
                box_nms_thresh=box_nms_thresh,
            )
            data.cat(crop_data)

        if len(self.crop_boxes) > 1 and len(data["crop_boxes"]) > 0:
            # prefer masks from smaller crops
            boxes = np.asarray(data["crop_boxes"], dtype=np.float64)
            areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
            scores = 1.0 / np.maximum(areas, 1)
            keep_by_nms = batched_nms(
                np.asarray(data["boxes"], dtype=np.float64), scores, None,
                iou_threshold=crop_nms_thresh,
            )
            data.filter(keep_by_nms)

        data.to_numpy()
        masks = self._postprocess_masks(
            data, min_mask_region_area, box_nms_thresh, crop_nms_thresh, output_mode
        )
        if output_mode == "instance_segmentation":
            shape = next(iter(masks))["segmentation"].shape if len(masks) > 0 else self.original_size
            masks = util.mask_data_to_segmentation(
                masks, shape=shape, with_background=with_background, merge_exclusively=False
            )
        return masks


def _process_tiled_embeddings(predictor, image, image_embeddings, tile_shape, halo,
                              verbose, batch_size, mask, i):
    if image_embeddings is None:
        if tile_shape is None or halo is None:
            raise ValueError(
                "To compute tiled embeddings the parameters tile_shape and halo have to be passed."
            )
        image_embeddings = util.precompute_image_embeddings(
            predictor, image, tile_shape=tile_shape, halo=halo, verbose=verbose,
            batch_size=batch_size, mask=mask,
        )

    tile_shape_ = tuple(image_embeddings["tile_shape"])
    halo_ = tuple(image_embeddings["halo"])
    if tile_shape is None:
        tile_shape = tile_shape_
    elif tuple(tile_shape) != tile_shape_:
        raise ValueError(
            f"Inconsistent tile_shape parameter {tile_shape} with precomputed embeddings: {tile_shape_}."
        )
    if halo is None:
        halo = halo_
    elif tuple(halo) != halo_:
        raise ValueError(f"Inconsistent halo parameter {halo} with precomputed embeddings: {halo_}.")

    feats = image_embeddings["features"]
    tiles_in_mask = sorted(int(k) for k in feats.keys())
    shape_2d = tuple(image_embeddings["shape"])[-2:]
    full = Blocking([0, 0], shape_2d, tile_shape)
    if len(tiles_in_mask) == len(full):
        tiles_in_mask = None  # all tiles present
    return image_embeddings, tuple(tile_shape), tuple(halo), tiles_in_mask


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
    ) -> None:
        super().__init__(
            predictor=predictor,
            points_per_side=points_per_side,
            points_per_batch=points_per_batch,
            point_grids=point_grids,
            stability_score_offset=stability_score_offset,
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

    def __init__(self, params: dict, out_channels: int = 3):
        from .models import unetr as unetr_mod
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
    instance_segmentation.py:956."""

    def __init__(self, predictor: SamPredictor, decoder: DecoderAdapter) -> None:
        self._predictor = predictor
        self._decoder = decoder
        self._foreground = None
        self._center_distances = None
        self._boundary_distances = None
        self._is_initialized = False

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
        embeddings = self._predictor.features
        input_shape = tuple(self._predictor.input_size)
        original_shape = tuple(self._predictor.original_size)

        output = self._decoder(embeddings, input_shape, original_shape)[0]
        assert output.shape[0] == 3, f"{output.shape}"
        pbar_update(1)
        pbar_close()

        self._foreground = output[0]
        self._center_distances = output[1]
        self._boundary_distances = output[2]
        self._i = i
        self._is_initialized = True

    def _to_masks(self, segmentation, output_mode):
        if output_mode != "binary_mask":
            raise ValueError(
                f"Output mode {output_mode} is not supported. "
                "Choose one of 'instance_segmentation', 'binary_mask'."
            )
        props = regionprops(segmentation)
        ndim = segmentation.ndim
        assert ndim in (2, 3)
        shape = segmentation.shape
        if ndim == 2:
            crop_box = [0, shape[1], 0, shape[0]]
        else:
            crop_box = [0, shape[2], 0, shape[1], 0, shape[0]]

        def to_bbox_2d(bbox):
            y0, x0 = bbox[0], bbox[1]
            w = bbox[3] - x0
            h = bbox[2] - y0
            return [x0, w, y0, h]

        def to_bbox_3d(bbox):
            z0, y0, x0 = bbox[0], bbox[1], bbox[2]
            w = bbox[5] - x0
            h = bbox[4] - y0
            d = bbox[3] - y0
            return [x0, w, y0, h, z0, d]

        to_bbox = to_bbox_2d if ndim == 2 else to_bbox_3d
        return [
            {
                "segmentation": segmentation == prop.label,
                "area": prop.area,
                "bbox": to_bbox(prop.bbox),
                "crop_box": crop_box,
                "seg_id": prop.label,
            } for prop in props
        ]

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

        if foreground_smoothing > 0:
            foreground = gaussian_smooth(self._foreground, foreground_smoothing)
        else:
            foreground = self._foreground

        segmentation = watershed_from_center_and_boundary_distances(
            center_distances=self._center_distances,
            boundary_distances=self._boundary_distances,
            foreground_map=foreground,
            center_distance_threshold=center_distance_threshold,
            boundary_distance_threshold=boundary_distance_threshold,
            foreground_threshold=foreground_threshold,
            distance_smoothing=distance_smoothing,
            min_size=min_size,
        )

        if output_mode != "instance_segmentation":
            segmentation = self._to_masks(segmentation, output_mode)
        return segmentation

    def get_state(self) -> Dict[str, Any]:
        if not self.is_initialized:
            raise RuntimeError("The state has not been computed yet. Call initialize first.")
        return {
            "foreground": self._foreground,
            "center_distances": self._center_distances,
            "boundary_distances": self._boundary_distances,
        }

    def set_state(self, state: Dict[str, Any]) -> None:
        self._foreground = state["foreground"]
        self._center_distances = state["center_distances"]
        self._boundary_distances = state["boundary_distances"]
        self._is_initialized = True

    def clear_state(self):
        self._foreground = None
        self._center_distances = None
        self._boundary_distances = None
        self._is_initialized = False


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

        pbar_init, pbar_update, pbar_close = util.handle_pbar(verbose, pbar_init, pbar_update)

        foreground = np.zeros(original_size, dtype="float32")
        center_distances = np.zeros(original_size, dtype="float32")
        boundary_distances = np.zeros(original_size, dtype="float32")

        if tiles_in_mask is None:
            all_tile_ids = list(range(len(tiling)))
        else:
            all_tile_ids = [int(t) for t in tiles_in_mask]
        n_tiles = len(all_tile_ids)
        n_batches = int(np.ceil(n_tiles / batch_size))
        pbar_init(n_tiles, "Initialize tiled instance segmentation with decoder")
        tile_ids_for_batches = np.array_split(all_tile_ids, n_batches)

        for tile_ids in tile_ids_for_batches:
            batched_embeddings, input_shapes, original_shapes = [], [], []
            for tile_id in tile_ids:
                self._predictor = util.set_precomputed(
                    self._predictor, self._image_embeddings, i=i, tile_id=int(tile_id)
                )
                batched_embeddings.append(self._predictor.features)
                input_shapes.append(tuple(self._predictor.input_size))
                original_shapes.append(tuple(self._predictor.original_size))

            batched_output = self._predict_decoder(batched_embeddings, input_shapes, original_shapes)

            for output_id, tile_id in enumerate(tile_ids):
                output = batched_output[output_id]
                assert output.shape[0] == 3
                block = tiling.get_block_with_halo(int(tile_id), list(halo))
                local_bb = block.inner_block_local.slicing
                inner_bb = block.inner_block.slicing
                foreground[inner_bb] = output[0][local_bb]
                center_distances[inner_bb] = output[1][local_bb]
                boundary_distances[inner_bb] = output[2][local_bb]
                pbar_update(1)
        pbar_close()

        self._i = i
        self._foreground = foreground
        self._center_distances = center_distances
        self._boundary_distances = boundary_distances
        self._is_initialized = True


#
# APG: decoder-derived prompts + NMS
#

def _get_centers(segmentation, avoid_image_border=True):
    """Eccentricity-style centers: distance-transform maxima per object
    (reference instance_segmentation.py:1325)."""
    boundaries = find_boundaries_outer(segmentation > 0) == 0
    if avoid_image_border:
        boundaries[0, :] = False
        boundaries[:, 0] = False
        boundaries[-1, :] = False
        boundaries[:, -1] = False
    distances = native.distance_transform(boundaries)

    props = regionprops(segmentation)
    centers = []
    for prop in props:
        seg_id = prop.label
        bb = np.s_[prop.bbox[0]:prop.bbox[2], prop.bbox[1]:prop.bbox[3]]
        mask = segmentation[bb] == seg_id
        dist = distances[bb].copy()
        dist[~mask] = 0
        center = np.unravel_index(np.argmax(dist), dist.shape)
        centers.append(tuple(ce + b.start for ce, b in zip(center, (bb[0], bb[1]))))
    return np.array(centers) if centers else np.zeros((0, 2), dtype=np.int64)


def _derive_point_prompts(
    foreground: np.ndarray,
    center_distances: np.ndarray,
    boundary_distances: np.ndarray,
    foreground_threshold: float = 0.5,
    center_distance_threshold: float = 0.5,
    boundary_distance_threshold: float = 0.5,
):
    bg_mask = foreground < foreground_threshold
    hmap_cc = np.logical_and(
        center_distances < center_distance_threshold,
        boundary_distances < boundary_distance_threshold,
    )
    hmap_cc[bg_mask] = 0
    cc = native.label(hmap_cc.astype(np.uint32))
    prompts = _get_centers(cc)
    if len(prompts) == 0:
        return None
    points = prompts[:, None, ::-1].astype(np.float64)
    labels = np.ones((len(prompts), 1))
    return {"points": points, "point_labels": labels}


def _derive_box_prompts(predictions, box_extension):
    shape = predictions[0]["segmentation"].shape
    bboxes = [pred["bbox"] for pred in predictions]
    prompts = [[
        max(x - w * box_extension, 0),
        max(y - h * box_extension, 0),
        min(x + (1 + box_extension) * w, shape[0]),
        min(y + (1 + box_extension) * h, shape[1]),
    ] for (x, y, w, h) in bboxes]
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
        foreground, center_distances, boundary_distances = \
            self._foreground, self._center_distances, self._boundary_distances

        prompt_function = _derive_point_prompts if prompt_function is None else prompt_function
        prompts = prompt_function(
            foreground=foreground,
            center_distances=center_distances,
            boundary_distances=boundary_distances,
            foreground_threshold=foreground_threshold,
            center_distance_threshold=center_distance_threshold,
            boundary_distance_threshold=boundary_distance_threshold,
        )

        if prompts is None:
            return np.zeros(foreground.shape, dtype="uint32") \
                if output_mode == "instance_segmentation" else []

        predictions = batched_inference(
            self._predictor, image=None, batch_size=batch_size,
            return_instance_segmentation=False, multimasking=multimasking,
            mask_threshold=mask_threshold, i=getattr(self, "_i", None), **prompts,
        )

        if refine_with_box_prompts and len(predictions) > 0:
            box_extension = 0.01
            prompts = _derive_box_prompts(predictions, box_extension)
            predictions = batched_inference(
                self._predictor, image=None, batch_size=batch_size,
                return_instance_segmentation=False, multimasking=multimasking,
                mask_threshold=mask_threshold, i=getattr(self, "_i", None), **prompts,
            )

        segmentation = util.apply_nms(
            predictions, min_size=min_size, nms_thresh=nms_threshold,
            intersection_over_min=intersection_over_min, shape=foreground.shape,
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
        foreground, center_distances, boundary_distances = \
            self._foreground, self._center_distances, self._boundary_distances

        prompt_function = _derive_point_prompts if prompt_function is None else prompt_function
        prompts = prompt_function(
            foreground, center_distances, boundary_distances,
            foreground_threshold=foreground_threshold,
            center_distance_threshold=center_distance_threshold,
            boundary_distance_threshold=boundary_distance_threshold,
        )

        shape = foreground.shape
        if prompts is None:
            return np.zeros(shape, dtype="uint32") if output_mode == "instance_segmentation" else []

        if optimize_memory:
            prompts.update(dict(
                min_size=min_size, nms_thresh=nms_threshold,
                intersection_over_min=intersection_over_min,
            ))
        predictions = batched_tiled_inference(
            self._predictor, image=None, batch_size=batch_size,
            image_embeddings=self._image_embeddings, return_instance_segmentation=False,
            multimasking=multimasking, optimize_memory=optimize_memory,
            i=getattr(self, "_i", None), **prompts,
        )
        if optimize_memory:
            return predictions

        if refine_with_box_prompts:
            raise NotImplementedError

        segmentation = util.apply_nms(
            predictions, shape=shape, min_size=min_size, nms_thresh=nms_threshold,
            intersection_over_min=intersection_over_min,
        )
        if output_mode != "instance_segmentation":
            segmentation = self._to_masks(segmentation, output_mode)
        return segmentation

    def get_state(self):
        raise NotImplementedError

    def set_state(self, state):
        raise NotImplementedError


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

    if segmentation_mode.lower() == "amg":
        cls = TiledAutomaticMaskGenerator if is_tiled else AutomaticMaskGenerator
        return cls(predictor, **kwargs)
    if segmentation_mode.lower() == "ais":
        assert decoder is not None
        cls = TiledInstanceSegmentationWithDecoder if is_tiled else InstanceSegmentationWithDecoder
        return cls(predictor, decoder, **kwargs)
    if segmentation_mode.lower() == "apg":
        assert decoder is not None
        cls = TiledAutomaticPromptGenerator if is_tiled else AutomaticPromptGenerator
        return cls(predictor, decoder, **kwargs)
    raise ValueError(
        f"Invalid segmentation_mode: {segmentation_mode}. Choose one of 'amg', 'ais', or 'apg'."
    )
