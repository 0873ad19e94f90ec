"""Annotator core logic: layer->prompt conversion, interactive nd segmentation
and tracking drivers (reference micro_sam/sam_annotator/util.py).

All functions are framework-free: they accept either napari layers or the
lightweight ``PointData`` / ``ShapeData`` stand-ins below (anything with the
same ``.data`` / ``.properties`` duck type works).
"""
from __future__ import annotations

import warnings
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np
from scipy.ndimage import shift as ndi_shift

from .. import prompt_based_segmentation, util
from ..multi_dimensional_segmentation import _validate_projection


@dataclass
class PointData:
    """Duck-typed stand-in for a napari Points layer."""
    data: np.ndarray                                   # (N, 2|3)
    properties: Dict[str, np.ndarray] = field(default_factory=dict)


@dataclass
class ShapeData:
    """Duck-typed stand-in for a napari Shapes layer."""
    data: List[np.ndarray]                             # list of (K, 2|3) vertex arrays
    shape_type: List[str] = field(default_factory=list)
    properties: Dict[str, np.ndarray] = field(default_factory=dict)


def point_layer_to_prompts(
    layer, i=None, track_id=None, with_stop_annotation=True,
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Extract point prompts from a point layer (reference util.py:157).

    Returns (points, labels) in (y, x); a single negative point is a stop
    annotation and returns None.
    """
    points = np.asarray(layer.data)
    labels = np.asarray(layer.properties["label"])
    assert len(points) == len(labels)

    if i is None:
        assert points.shape[1] == 2, f"{points.shape}"
        this_points, this_labels = points, labels
    else:
        assert points.shape[1] == 3, f"{points.shape}"
        mask = np.round(points[:, 0]) == i
        this_points = points[mask][:, 1:]
        this_labels = labels[mask]
    assert len(this_points) == len(this_labels)

    if track_id is not None:
        assert i is not None
        track_ids = np.array(list(map(int, layer.properties["track_id"])))[mask]
        track_id_mask = track_ids == track_id
        this_labels, this_points = this_labels[track_id_mask], this_points[track_id_mask]
    assert len(this_points) == len(this_labels)

    this_labels = np.array([1 if label == "positive" else 0 for label in this_labels])
    if with_stop_annotation and (len(this_points) == 1 and this_labels[0] == 0):
        return None

    return this_points, this_labels


def _rasterize_polygon(vertices: np.ndarray, shape: Tuple[int, int]) -> np.ndarray:
    """Rasterize a polygon via matplotlib Path (skimage.draw.polygon equivalent)."""
    from matplotlib.path import Path as MplPath
    ys, xs = np.mgrid[0:shape[0], 0:shape[1]]
    pts = np.column_stack([ys.ravel(), xs.ravel()])
    path = MplPath(vertices)
    mask = path.contains_points(pts).reshape(shape)
    return mask


def _rasterize_ellipse(vertices: np.ndarray, shape: Tuple[int, int]) -> np.ndarray:
    center = np.mean(vertices, axis=0)
    radius_r = abs(((vertices[2] - vertices[1]) / 2)[0])
    radius_c = abs(((vertices[1] - vertices[0]) / 2)[1])
    ys, xs = np.mgrid[0:shape[0], 0:shape[1]]
    mask = ((ys - center[0]) / max(radius_r, 1e-7)) ** 2 + \
           ((xs - center[1]) / max(radius_c, 1e-7)) ** 2 <= 1
    return mask


def shape_layer_to_prompts(
    layer, shape: Tuple[int, int], i=None, track_id=None,
) -> Tuple[List[np.ndarray], List[Optional[np.ndarray]]]:
    """Extract box (+ mask) prompts from a shape layer (reference util.py:204)."""

    def _to_prompts(shape_data, shape_types):
        boxes, masks = [], []
        for data, type_ in zip(shape_data, shape_types):
            if type_ == "rectangle":
                boxes.append(data)
                masks.append(None)
            elif type_ == "ellipse":
                boxes.append(data)
                masks.append(_rasterize_ellipse(data, shape))
            elif type_ == "polygon":
                boxes.append(data)
                masks.append(_rasterize_polygon(data, shape))
            else:
                warnings.warn(f"Shape type {type_} is not supported and will be ignored.")
        boxes = [
            np.array([box[:, 0].min(), box[:, 1].min(), box[:, 0].max(), box[:, 1].max()])
            for box in boxes
        ]
        return boxes, masks

    shape_data, shape_types = layer.data, layer.shape_type
    assert len(shape_data) == len(shape_types)
    if len(shape_data) == 0:
        return [], []

    if i is not None:
        if track_id is None:
            prompt_selection = [j for j, data in enumerate(shape_data) if (data[:, 0] == i).all()]
        else:
            track_ids = np.array(list(map(int, layer.properties["track_id"])))
            prompt_selection = [
                j for j, (data, this_track_id) in enumerate(zip(shape_data, track_ids))
                if ((data[:, 0] == i).all() and this_track_id == track_id)
            ]
        shape_data = [shape_data[j][:, 1:] for j in prompt_selection]
        shape_types = [shape_types[j] for j in prompt_selection]

    return _to_prompts(shape_data, shape_types)


def prompt_layer_to_state(prompt_layer, i: int) -> str:
    """Track state ("division" / "track") of a frame (reference util.py:280)."""
    state = np.asarray(prompt_layer.properties["state"])
    points = np.asarray(prompt_layer.data)
    assert points.shape[1] == 3, f"{points.shape}"
    mask = points[:, 0] == i
    this_state = state[mask]
    if any(st == "division" for st in this_state):
        return "division"
    return "track"


def prompt_layers_to_state(point_layer, box_layer, i: int) -> str:
    """Track state from point and box layers (reference util.py:308)."""
    state = np.asarray(point_layer.properties["state"])
    points = np.asarray(point_layer.data)
    assert points.shape[1] == 3
    mask = points[:, 0] == i
    this_state = state[mask].tolist() if mask.sum() > 0 else []
    box_states = box_layer.properties.get("state", [])
    this_box_states = [
        s for box, s in zip(box_layer.data, box_states) if (box[:, 0] == i).all()
    ]
    this_state.extend(this_box_states)
    if any(st == "division" for st in this_state):
        return "division"
    return "track"


def segment_slices_with_prompts(
    predictor, point_prompts, box_prompts, image_embeddings, shape,
    track_id=None, update_progress=None,
):
    """Per-slice prompt segmentation of annotated slices (reference util.py:350)."""
    assert len(shape) == 3
    image_shape = shape[1:]
    seg = np.zeros(shape, dtype="uint32")

    z_values = np.round(np.asarray(point_prompts.data)[:, 0]) if len(point_prompts.data) \
        else np.zeros(0)
    z_values_boxes = np.concatenate([box[:1, 0] for box in box_prompts.data]) \
        if len(box_prompts.data) else np.zeros(0, dtype="int")

    if track_id is not None:
        track_ids_points = np.array(list(map(int, point_prompts.properties["track_id"])))
        assert len(track_ids_points) == len(z_values)
        z_values = z_values[track_ids_points == track_id]
        if len(z_values_boxes) > 0:
            track_ids_boxes = np.array(list(map(int, box_prompts.properties["track_id"])))
            assert len(track_ids_boxes) == len(z_values_boxes)
            z_values_boxes = z_values_boxes[track_ids_boxes == track_id]

    slices = np.unique(np.concatenate([z_values, z_values_boxes])).astype("int")
    stop_lower, stop_upper = False, False

    if update_progress is None:
        def update_progress(*args):
            pass

    for i in slices:
        points_i = point_layer_to_prompts(point_prompts, i, track_id)

        if points_i is None:  # stop annotation
            if i == slices[0]:
                stop_lower = True
                seg[i] = 0
            elif i == slices[-1]:
                stop_upper = True
                seg[i] = 0
            else:
                slices = np.setdiff1d(slices, i)
                print(f"You have provided a stop annotation (single red point) in slice {i},")
                print("but you have annotated slices above or below it. This stop annotation will")
                print(f"be ignored and the slice {i} will be segmented normally.")
            update_progress(1)
            continue

        boxes, masks = shape_layer_to_prompts(box_prompts, image_shape, i=i, track_id=track_id)
        points, labels = points_i

        seg_i = prompt_segmentation(
            predictor, points, labels, boxes, masks, image_shape,
            multiple_box_prompts=False, image_embeddings=image_embeddings, i=i,
        )
        if seg_i is None:
            print(f"The prompts at slice or frame {i} are invalid and the segmentation was skipped.")
            continue

        seg[i] = seg_i
        update_progress(1)

    return seg, slices, stop_lower, stop_upper


def _batched_interactive_segmentation(predictor, points, labels, boxes,
                                      image_embeddings, i, previous_segmentation):
    """One object per positive point / box, sharing negatives (reference
    util.py:430)."""
    prev_seg = previous_segmentation if i is None else previous_segmentation[i]
    seg = np.zeros(prev_seg.shape, dtype="uint32")

    batched_points, batched_labels = [], []
    negative_points, negative_labels = [], []
    for j in range(len(points)):
        if labels[j] == 1:
            batched_points.append(points[j:j + 1])
            batched_labels.append(labels[j:j + 1])
        else:
            negative_points.append(points[j:j + 1])
            negative_labels.append(labels[j:j + 1])

    batched_prompts = [(None, point, label) for point, label in zip(batched_points, batched_labels)]
    batched_prompts.extend([(box, None, None) for box in boxes])
    batched_prompts = {k: prompt for k, prompt in enumerate(batched_prompts, 1)}

    for seg_id, prompt in batched_prompts.items():
        box, point, label = prompt
        if len(negative_points) > 0:
            if point is None:
                point = np.concatenate(negative_points)
                label = np.concatenate(negative_labels)
            else:
                point = np.concatenate([point] + negative_points)
                label = np.concatenate([label] + negative_labels)

        if (box is not None) and (point is not None):
            prediction = prompt_based_segmentation.segment_from_box_and_points(
                predictor, box, point, label, image_embeddings=image_embeddings, i=i
            ).squeeze()
        elif box is not None:
            prediction = prompt_based_segmentation.segment_from_box(
                predictor, box, image_embeddings=image_embeddings, i=i
            ).squeeze()
        else:
            prediction = prompt_based_segmentation.segment_from_points(
                predictor, point, label, image_embeddings=image_embeddings, i=i
            ).squeeze()
        seg[prediction] = seg_id

    return seg


def prompt_segmentation(
    predictor, points, labels, boxes, masks, shape, multiple_box_prompts,
    image_embeddings=None, i=None, box_extension=0, batched=None,
    previous_segmentation=None,
):
    """Dispatch prompt segmentation by prompt combination (reference util.py:493)."""
    assert len(points) == len(labels)
    have_points = len(points) > 0
    have_boxes = len(boxes) > 0

    if not have_points and not have_boxes:
        return None

    if batched:
        assert previous_segmentation is not None
        seg = _batched_interactive_segmentation(
            predictor, points, labels, boxes, image_embeddings, i, previous_segmentation
        )
    elif have_points and have_boxes:
        if len(boxes) > 1:
            print("You have provided point prompts and more than one box prompt.")
            print("This setting is currently not supported.")
            return None
        mask = masks[0]
        if mask is None:
            seg = prompt_based_segmentation.segment_from_box_and_points(
                predictor, boxes[0], points, labels, image_embeddings=image_embeddings, i=i
            ).squeeze()
        else:
            seg = prompt_based_segmentation.segment_from_mask(
                predictor, mask, box=boxes[0], points=points, labels=labels,
                image_embeddings=image_embeddings, i=i
            ).squeeze()
    elif have_points:
        seg = prompt_based_segmentation.segment_from_points(
            predictor, points, labels, image_embeddings=image_embeddings, i=i
        ).squeeze()
    else:
        seg = np.zeros(shape, dtype="uint32")
        if len(boxes) > 1 and not multiple_box_prompts:
            print("You have provided more than one box annotation. "
                  "This is not yet supported in the 3d annotator.")
            return None
        for seg_id, (box, mask) in enumerate(zip(boxes, masks), 1):
            if mask is None:
                prediction = prompt_based_segmentation.segment_from_box(
                    predictor, box, image_embeddings=image_embeddings, i=i
                ).squeeze()
            else:
                prediction = prompt_based_segmentation.segment_from_mask(
                    predictor, mask, box=box, image_embeddings=image_embeddings, i=i,
                    box_extension=box_extension,
                ).squeeze()
            seg[prediction] = seg_id

    return seg


def _compute_movement(seg, t0, t1):
    def compute_center(t):
        center = np.where(seg[t] == 1)
        return np.array([np.mean(center[0]), np.mean(center[1])])
    return (compute_center(t1) - compute_center(t0)).astype("float64")


def _shift_object(mask, motion_model):
    mask_shifted = np.zeros_like(mask)
    ndi_shift(mask, motion_model, output=mask_shifted, order=0, prefilter=False)
    return mask_shifted


def track_from_prompts(
    point_prompts, box_prompts, seg, predictor, slices, image_embeddings,
    stop_upper, threshold, projection, motion_smoothing=0.5, box_extension=0,
    update_progress=None,
):
    """Interactive tracking loop with EMA motion model and division handling
    (reference util.py:582)."""
    use_box, use_mask, use_points, use_single_point = _validate_projection(projection)

    if update_progress is None:
        def update_progress(*args):
            pass

    def _update_motion_model(seg, t, t0, motion_model):
        if t in (t0, t0 + 1):
            pass
        elif t == t0 + 2:
            motion_model = _compute_movement(seg, t - 2, t - 1)
        else:
            current_move = _compute_movement(seg, t - 2, t - 1)
            alpha = motion_smoothing
            motion_model = alpha * motion_model + (1 - alpha) * current_move
        return motion_model

    has_division = False
    motion_model = None

    t0 = int(slices.min())
    t = t0 + 1
    while True:
        motion_model = _update_motion_model(seg, t, t0, motion_model)

        if t in slices:
            seg_prev = None
            seg_t = seg[t]
            track_state = prompt_layer_to_state(point_prompts, t)
        else:
            seg_prev = seg[t - 1]
            if motion_model is not None:
                seg_prev = _shift_object(seg_prev, motion_model)
            seg_t = prompt_based_segmentation.segment_from_mask(
                predictor, seg_prev, image_embeddings=image_embeddings, i=t,
                use_mask=use_mask, use_box=use_box, use_points=use_points,
                box_extension=box_extension, use_single_point=use_single_point,
            )
            track_state = "track"
            if t < slices[-1]:
                seg_prev = None
            update_progress(1)

        if (threshold is not None) and (seg_prev is not None):
            iou = util.compute_iou(seg_prev, seg_t)
            if iou < threshold:
                print(f"Tracking stopped at frame {t} due to IOU {iou} < {threshold}.")
                break

        if track_state == "division":
            has_division = True
            break

        seg[t] = seg_t
        t += 1

        if t == slices[-1] and stop_upper:
            break
        if t == seg.shape[0]:
            break

    return seg, has_division


# -----------------------------------------------------------------------------
# AMG / AIS state cache loading (reference sam_annotator/util.py:762-796)
# -----------------------------------------------------------------------------

def _load_amg_state(embedding_path) -> Dict:
    """Load cached per-slice AMG states (pickles under <emb>/amg_state)."""
    import os
    import pickle
    from glob import glob
    from pathlib import Path

    if embedding_path is None or not os.path.exists(str(embedding_path)):
        return {"cache_folder": None}
    cache_folder = os.path.join(str(embedding_path), "amg_state")
    os.makedirs(cache_folder, exist_ok=True)
    amg_state: Dict = {"cache_folder": cache_folder}
    for path in glob(os.path.join(cache_folder, "*.pkl")):
        with open(path, "rb") as f:
            state = pickle.load(f)
        amg_state[int(Path(path).stem.split("-")[-1])] = state
    return amg_state


def _load_is_state(embedding_path) -> Dict:
    """Load cached per-slice AIS decoder maps (<emb>/is_state.h5)."""
    import os

    if embedding_path is None or not os.path.exists(str(embedding_path)):
        return {"cache_path": None}
    import h5py
    cache_path = os.path.join(str(embedding_path), "is_state.h5")
    is_state: Dict = {"cache_path": cache_path}
    with h5py.File(cache_path, "a") as f:
        for name, g in f.items():
            is_state[int(name.split("-")[-1])] = {
                "foreground": g["foreground"][:],
                "boundary_distances": g["boundary_distances"][:],
                "center_distances": g["center_distances"][:],
            }
    return is_state


def toggle_label(prompt_layer) -> None:
    """Toggle the point-prompt label between positive and negative
    (reference sam_annotator/util.py 'toggle_label')."""
    labels = prompt_layer.properties.get("label")
    if labels is None or len(labels) == 0:
        return
    labels = np.asarray(labels, dtype=object).copy()
    labels[-1] = "negative" if labels[-1] == "positive" else "positive"
    prompt_layer.properties["label"] = labels
    if hasattr(prompt_layer, "refresh_colors"):
        prompt_layer.refresh_colors()


LABEL_COLOR_CYCLE = ["#00FF00", "#FF0000"]
