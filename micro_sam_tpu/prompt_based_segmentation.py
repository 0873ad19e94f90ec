"""Prompt-based segmentation: point / box / mask prompts -> binary masks.

TPU-native counterpart of micro_sam/prompt_based_segmentation.py. Prompt
derivation (distance-transform point sampling, inverse-sigmoid mask logits,
box extension) runs on host numpy; the decode is the predictor's jitted path.
Tiled embeddings are routed by prompt centroid (reference
prompt_based_segmentation.py:157-218), prompts are clipped into the tile and
the result is pasted back into the full frame.

Coordinate conventions match the reference: the public functions take points
and boxes in (y, x) / (y0, x0, y1, x1) image order; the predictor consumes
(x, y) / XYXY.
"""
from __future__ import annotations

import warnings
from typing import Optional, Tuple

import numpy as np

from . import util
from .ops.host_ops import (
    distance_transform_edt, find_boundaries_outer, gaussian_smooth, peak_local_max,
)
from .predictor import SamPredictor
from .utils.blocking import Blocking
from .utils.transforms import ResizeLongestSide


#
# helpers translating mask inputs into other prompts
#

def _compute_box_from_mask(mask, original_size=None, box_extension=0):
    coords = np.where(mask == 1)
    min_y, min_x = coords[0].min(), coords[1].min()
    max_y, max_x = coords[0].max(), coords[1].max()
    box = np.array([min_y, min_x, max_y + 1, max_x + 1])
    return _process_box(box, mask.shape, original_size=original_size, box_extension=box_extension)


def _compute_points_from_mask(mask, original_size, box_extension, use_single_point=False):
    """Sample positive points at inner distance maxima and negative points at
    outer (background ring) distance maxima."""
    box = _compute_box_from_mask(mask, box_extension=box_extension)

    bb = (slice(box[1], box[3]), slice(box[0], box[2]))
    offset = np.array([box[1], box[0]])

    cropped_mask = mask[bb]
    object_boundaries = find_boundaries_outer(cropped_mask)
    distances = gaussian_smooth(distance_transform_edt(object_boundaries == 0))
    inner_distances = distances.copy()
    cropped_mask = cropped_mask.astype(bool)
    inner_distances[~cropped_mask] = 0.0
    if use_single_point:
        center = np.unravel_index(inner_distances.argmax(), inner_distances.shape)
        point_coords = (np.asarray(center) + offset)[None]
        point_labels = np.ones(1, dtype="uint8")
        return point_coords[:, ::-1], point_labels

    outer_distances = distances.copy()
    outer_distances[cropped_mask] = 0.0

    inner_maxima = peak_local_max(inner_distances, exclude_border=False, min_distance=3)
    outer_maxima = peak_local_max(outer_distances, exclude_border=False, min_distance=5)
    if len(inner_maxima) == 0:
        # degenerate tiny mask: fall back to the mask centroid
        coords = np.column_stack(np.nonzero(cropped_mask))
        inner_maxima = coords.mean(axis=0).round()[None].astype("int64")

    point_coords = np.concatenate(
        [inner_maxima, outer_maxima] if len(outer_maxima) else [inner_maxima]
    ).astype("float64")
    point_coords += offset

    if original_size is not None:
        scale_factor = np.array([
            original_size[0] / float(mask.shape[0]), original_size[1] / float(mask.shape[1])
        ])[None]
        point_coords *= scale_factor

    point_labels = np.concatenate(
        [np.ones(len(inner_maxima), dtype="uint8"), np.zeros(len(outer_maxima), dtype="uint8")]
    )
    return point_coords[:, ::-1], point_labels


def _compute_logits_from_mask(mask, eps=1e-3, expected_shape=(256, 256)):
    """Binary mask -> low-res logit prompt via inverse sigmoid, resized/padded
    to SAM's expected (256, 256) mask-input shape."""

    def inv_sigmoid(x):
        return np.log(x / (1 - x))

    logits = np.zeros(mask.shape, dtype="float32")
    logits[mask == 1] = 1 - eps
    logits[mask == 0] = eps
    logits = inv_sigmoid(logits)

    assert logits.ndim == 2
    if logits.shape != expected_shape:
        import jax
        import jax.numpy as jnp
        trafo = ResizeLongestSide(expected_shape[0])
        from .utils.transforms import get_preprocess_shape
        new_shape = get_preprocess_shape(logits.shape[0], logits.shape[1], expected_shape[0])
        logits = np.asarray(jax.image.resize(
            jnp.asarray(logits), new_shape, method="bilinear"
        ))
        h, w = logits.shape
        if (h, w) != expected_shape:
            # IMPORTANT: zero padding, which SAM interprets as "unknown"
            logits = np.pad(
                logits, ((0, expected_shape[0] - h), (0, expected_shape[1] - w)),
                mode="constant", constant_values=0,
            )

    logits = logits[None]
    assert logits.shape == (1,) + expected_shape, f"{logits.shape}"
    return logits


#
# other helpers
#

def _process_box(box, shape, original_size=None, box_extension=0):
    """(y0, x0, y1, x1) -> extended, clipped XYXY int box."""
    if box_extension == 0:
        extension_y, extension_x = 0, 0
    elif box_extension >= 1:
        extension_y, extension_x = box_extension, box_extension
    else:
        len_y, len_x = box[2] - box[0], box[3] - box[1]
        extension_y, extension_x = box_extension * len_y, box_extension * len_x

    box = np.array([
        max(box[1] - extension_x, 0), max(box[0] - extension_y, 0),
        min(box[3] + extension_x, shape[1]), min(box[2] + extension_y, shape[0]),
    ])

    if original_size is not None:
        trafo = ResizeLongestSide(max(original_size))
        box = trafo.apply_boxes(box[None], (256, 256)).squeeze()
    return np.round(box).astype(int)


def _points_to_tile(prompts, shape, tile_shape, halo):
    """Pick the tile containing the point centroid; shift prompts into it."""
    points, labels = prompts
    points = np.asarray(points)
    labels = np.asarray(labels)

    tiling = Blocking([0, 0], shape, tile_shape)
    center = np.mean(points, axis=0).round().astype("int").tolist()
    tile_id = tiling.coordinates_to_block_id(center)

    tile = tiling.get_block_with_halo(tile_id, list(halo)).outer_block
    offset = tile.begin
    this_tile_shape = tile.shape

    points_in_tile = points - np.array(offset)
    labels_in_tile = labels

    valid = (points_in_tile >= 0).all(axis=1)
    valid &= (points_in_tile[:, 0] < this_tile_shape[0]) & (points_in_tile[:, 1] < this_tile_shape[1])
    if not valid.all():
        points_in_tile = points_in_tile[valid]
        labels_in_tile = labels_in_tile[valid]
        warnings.warn(f"{(~valid).sum()} points were not in the tile and are dropped")

    return tile_id, tile, (points_in_tile, labels_in_tile)


def _box_to_tile(box, shape, tile_shape, halo):
    tiling = Blocking([0, 0], shape, tile_shape)
    center = np.array([(box[0] + box[2]) / 2, (box[1] + box[3]) / 2]).round().astype("int").tolist()
    tile_id = tiling.coordinates_to_block_id(center)

    tile = tiling.get_block_with_halo(tile_id, list(halo)).outer_block
    offset = tile.begin
    this_tile_shape = tile.shape

    box_in_tile = np.array([
        max(box[0] - offset[0], 0), max(box[1] - offset[1], 0),
        min(box[2] - offset[0], this_tile_shape[0]), min(box[3] - offset[1], this_tile_shape[1]),
    ])
    return tile_id, tile, box_in_tile


def _mask_to_tile(mask, shape, tile_shape, halo):
    tiling = Blocking([0, 0], shape, tile_shape)
    coords = np.where(mask)
    center = np.array([np.mean(coords[0]), np.mean(coords[1])]).round().astype("int").tolist()
    tile_id = tiling.coordinates_to_block_id(center)

    tile = tiling.get_block_with_halo(tile_id, list(halo)).outer_block
    mask_in_tile = mask[tile.slicing]
    return tile_id, tile, mask_in_tile


def _initialize_predictor(predictor, image_embeddings, i, prompts, to_tile):
    tile = None
    if image_embeddings is not None and image_embeddings.get("input_size") is None:
        # tiled embeddings
        shape = tuple(image_embeddings["shape"])
        if len(shape) == 3:
            shape = shape[1:]
        tile_shape, halo = image_embeddings["tile_shape"], image_embeddings["halo"]
        tile_id, tile, prompts = to_tile(prompts, shape, tile_shape, halo)
        util.set_precomputed(predictor, image_embeddings, i, tile_id=tile_id)
    elif image_embeddings is not None:
        shape = image_embeddings["original_size"]
        util.set_precomputed(predictor, image_embeddings, i)
    else:
        shape = predictor.original_size
    return predictor, tile, prompts, shape


def _tile_to_full_mask(mask, shape, tile):
    full_mask = np.zeros(mask.shape[0:1] + tuple(shape), dtype=mask.dtype)
    full_mask[(slice(None),) + tile.slicing] = mask
    return full_mask


#
# prompted segmentation API
#

def segment_from_points(
    predictor: SamPredictor,
    points: np.ndarray,
    labels: np.ndarray,
    image_embeddings=None,
    i: Optional[int] = None,
    multimask_output: bool = False,
    return_all: bool = False,
    use_best_multimask: Optional[bool] = None,
):
    """Segmentation from point prompts given in (y, x) image coordinates.

    Returns the binary mask (1, H, W); with ``return_all`` also scores and
    low-res logits (reference prompt_based_segmentation.py:258).
    """
    predictor, tile, prompts, shape = _initialize_predictor(
        predictor, image_embeddings, i, (np.asarray(points), np.asarray(labels)), _points_to_tile
    )
    points, labels = prompts

    if use_best_multimask is None:
        use_best_multimask = len(points) == 1 and labels[0] == 1
    multimask_output_ = multimask_output or use_best_multimask

    mask, scores, logits = predictor.predict(
        point_coords=np.asarray(points)[:, ::-1],  # SAM has reversed XY conventions
        point_labels=np.asarray(labels),
        multimask_output=multimask_output_,
    )

    if use_best_multimask:
        best_mask_id = np.argmax(scores)
        mask = mask[best_mask_id][None]

    if tile is not None:
        mask = _tile_to_full_mask(mask, shape, tile)

    return (mask, scores, logits) if return_all else mask


def segment_from_mask(
    predictor: SamPredictor,
    mask: np.ndarray,
    image_embeddings=None,
    i: Optional[int] = None,
    use_box: bool = True,
    use_mask: bool = True,
    use_points: bool = False,
    original_size: Optional[Tuple[int, ...]] = None,
    multimask_output: bool = False,
    return_all: bool = False,
    return_logits: bool = False,
    box_extension: float = 0.0,
    box: Optional[np.ndarray] = None,
    points: Optional[np.ndarray] = None,
    labels: Optional[np.ndarray] = None,
    use_single_point: bool = False,
):
    """Segmentation from a mask prompt, optionally converted into box / point /
    logit prompts (reference prompt_based_segmentation.py:315)."""
    prompts = (mask, box, points, labels)

    def _to_tile(prompts, shape, tile_shape, halo):
        mask, box, points, labels = prompts
        tile_id, tile, mask = _mask_to_tile(mask, shape, tile_shape, halo)
        if points is not None:
            tile_id_points, tile, point_prompts = _points_to_tile((points, labels), shape, tile_shape, halo)
            if tile_id_points != tile_id:
                raise RuntimeError(
                    f"Inconsistent tile ids for mask and point prompts: {tile_id_points} != {tile_id}."
                )
            points, labels = point_prompts
        if box is not None:
            tile_id_box, tile, box = _box_to_tile(box, shape, tile_shape, halo)
            if tile_id_box != tile_id:
                raise RuntimeError(
                    f"Inconsistent tile ids for mask and box prompts: {tile_id_box} != {tile_id}."
                )
        return tile_id, tile, (mask, box, points, labels)

    predictor, tile, prompts, shape = _initialize_predictor(
        predictor, image_embeddings, i, prompts, _to_tile
    )
    mask, box, points, labels = prompts

    if points is not None:
        if labels is None:
            raise ValueError("If points are passed you also need to pass labels.")
        point_coords, point_labels = points, labels
    elif use_points and mask.sum() != 0:
        point_coords, point_labels = _compute_points_from_mask(
            mask, original_size=original_size, box_extension=box_extension,
            use_single_point=use_single_point,
        )
    else:
        point_coords, point_labels = None, None

    if box is None:
        box = _compute_box_from_mask(
            mask, original_size=original_size, box_extension=box_extension
        ) if use_box and mask.sum() != 0 else None
    else:
        box = _process_box(box, mask.shape, original_size=original_size, box_extension=box_extension)

    logits = _compute_logits_from_mask(
        mask, expected_shape=(predictor.model.config.embedding_size * 4,) * 2
    ) if use_mask else None

    mask, scores, logits = predictor.predict(
        point_coords=point_coords, point_labels=point_labels,
        mask_input=logits, box=box,
        multimask_output=multimask_output, return_logits=return_logits,
    )

    if tile is not None:
        mask = _tile_to_full_mask(mask, shape, tile)

    return (mask, scores, logits) if return_all else mask


def segment_from_box(
    predictor: SamPredictor,
    box: np.ndarray,
    image_embeddings=None,
    i: Optional[int] = None,
    multimask_output: bool = False,
    return_all: bool = False,
    box_extension: float = 0.0,
):
    """Segmentation from a (y0, x0, y1, x1) box prompt
    (reference prompt_based_segmentation.py:417)."""
    predictor, tile, box, shape = _initialize_predictor(
        predictor, image_embeddings, i, np.asarray(box), _box_to_tile
    )
    mask, scores, logits = predictor.predict(
        box=_process_box(box, shape, box_extension=box_extension),
        multimask_output=multimask_output,
    )
    if tile is not None:
        mask = _tile_to_full_mask(mask, shape, tile)
    return (mask, scores, logits) if return_all else mask


def segment_from_box_and_points(
    predictor: SamPredictor,
    box: np.ndarray,
    points: np.ndarray,
    labels: np.ndarray,
    image_embeddings=None,
    i: Optional[int] = None,
    multimask_output: bool = False,
    return_all: bool = False,
):
    """Segmentation from a box and point prompts
    (reference prompt_based_segmentation.py:459)."""

    def box_and_points_to_tile(prompts, shape, tile_shape, halo):
        box, points, labels = prompts
        tile_id, tile, point_prompts = _points_to_tile((points, labels), shape, tile_shape, halo)
        points, labels = point_prompts
        tile_id_box, tile, box = _box_to_tile(box, shape, tile_shape, halo)
        if tile_id_box != tile_id:
            raise RuntimeError(
                f"Inconsistent tile ids for box and point annotations: {tile_id_box} != {tile_id}."
            )
        return tile_id, tile, (box, points, labels)

    predictor, tile, prompts, shape = _initialize_predictor(
        predictor, image_embeddings, i,
        (np.asarray(box), np.asarray(points), np.asarray(labels)), box_and_points_to_tile,
    )
    box, points, labels = prompts

    mask, scores, logits = predictor.predict(
        point_coords=np.asarray(points)[:, ::-1],
        point_labels=np.asarray(labels),
        box=_process_box(box, shape),
        multimask_output=multimask_output,
    )
    if tile is not None:
        mask = _tile_to_full_mask(mask, shape, tile)
    return (mask, scores, logits) if return_all else mask
