"""Grid search for automatic instance segmentation parameters.

Counterpart of micro_sam/evaluation/instance_segmentation.py: cartesian
parameter products per image (exploiting the initialize/generate split so the
expensive state is computed once per image), per-image CSVs, group-mean best
selection, then test inference with the best parameters.
"""
from __future__ import annotations

import os
from glob import glob
from itertools import product
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple, Union

import numpy as np
import pandas as pd

from .. import util
from .matching import mean_segmentation_accuracy


def _write_tif(path, data):
    import imageio.v3 as imageio
    try:
        imageio.imwrite(path, data, compression="zlib")
    except TypeError:
        imageio.imwrite(path, data)


def default_grid_search_values_amg(
    iou_thresh_values: Optional[List[float]] = None,
    stability_score_values: Optional[List[float]] = None,
) -> Dict[str, List[float]]:
    """Default grid-search values for AMG (reference
    evaluation/instance_segmentation.py:31)."""
    if iou_thresh_values is None:
        iou_thresh_values = np.arange(0.6, 0.925, 0.025).round(3).tolist()
    if stability_score_values is None:
        stability_score_values = np.arange(0.6, 0.925, 0.025).round(3).tolist()
    return {
        "pred_iou_thresh": iou_thresh_values,
        "stability_score_thresh": stability_score_values,
    }


def default_grid_search_values_instance_segmentation_with_decoder(
    center_distance_threshold_values: Optional[List[float]] = None,
    boundary_distance_threshold_values: Optional[List[float]] = None,
    distance_smoothing_values: Optional[List[float]] = None,
    min_size_values: Optional[List[float]] = None,
) -> Dict[str, List[float]]:
    """Default grid-search values for AIS (reference
    evaluation/instance_segmentation.py:59)."""
    if center_distance_threshold_values is None:
        center_distance_threshold_values = np.arange(0.3, 0.8, 0.1).round(2).tolist()
    if boundary_distance_threshold_values is None:
        boundary_distance_threshold_values = np.arange(0.3, 0.8, 0.1).round(2).tolist()
    if distance_smoothing_values is None:
        distance_smoothing_values = [1.0, 1.6, 2.2]
    grid = {
        "center_distance_threshold": center_distance_threshold_values,
        "boundary_distance_threshold": boundary_distance_threshold_values,
        "distance_smoothing": distance_smoothing_values,
    }
    if min_size_values is not None:
        grid["min_size"] = min_size_values
    return grid


def default_grid_search_values_apg(
    min_distance_values: Optional[List[float]] = None,
    threshold_abs_values: Optional[List[float]] = None,
    multimasking_values: Optional[List[float]] = None,
    prompt_selection_values: Optional[List[float]] = None,
    min_size_values: Optional[List[float]] = None,
    nms_threshold_values: Optional[List[float]] = None,
    intersection_over_min_values: Optional[List[bool]] = None,
    mask_threshold_values: Optional[List] = None,
    center_distance_threshold_values: Optional[List[float]] = None,
    boundary_distance_threshold_values: Optional[List[float]] = None,
) -> Dict[str, List[float]]:
    """Default grid-search values for APG (reference
    evaluation/instance_segmentation.py:103). Like the reference, the
    distance-based parameters (min_distance/threshold_abs/multimasking/
    prompt_selection) are accepted but excluded from the default grid —
    connected-components prompting doesn't use them."""
    if center_distance_threshold_values is None:
        center_distance_threshold_values = np.arange(0.3, 0.8, 0.1).round(2).tolist()
    if boundary_distance_threshold_values is None:
        boundary_distance_threshold_values = np.arange(0.3, 0.8, 0.1).round(2).tolist()
    if min_size_values is None:
        min_size_values = [50, 100, 200]
    if nms_threshold_values is None:
        nms_threshold_values = np.arange(0.5, 1.0, 0.1).round(2).tolist()
    if intersection_over_min_values is None:
        intersection_over_min_values = [True, False]
    grid = {
        "center_distance_threshold": center_distance_threshold_values,
        "boundary_distance_threshold": boundary_distance_threshold_values,
        "min_size": min_size_values,
        "nms_threshold": nms_threshold_values,
        "intersection_over_min": intersection_over_min_values,
    }
    if mask_threshold_values is not None:
        grid["mask_threshold"] = mask_threshold_values
    return grid


def _load(path):
    if isinstance(path, np.ndarray):
        return path
    return util.load_image_data(str(path))


def _name_of(path, fallback):
    return Path(str(path)).stem if not isinstance(path, np.ndarray) else fallback


def run_instance_segmentation_grid_search(
    segmenter,
    grid_search_values: Dict[str, List],
    image_paths: List,
    gt_paths: List,
    result_dir: Union[str, os.PathLike],
    embedding_dir: Optional[Union[str, os.PathLike]],
    fixed_generate_kwargs: Optional[Dict[str, Any]] = None,
    verbose_gs: bool = False,
    image_key: Optional[str] = None,
    gt_key: Optional[str] = None,
    rois: Optional[Tuple] = None,
    tiling_window_params: Optional[Dict[str, Tuple[int, int]]] = None,
) -> None:
    """Grid search per image: initialize once, re-generate per parameter combo
    (reference evaluation/instance_segmentation.py:103). ``rois`` restricts
    each image/gt pair to a region of interest; ``tiling_window_params``
    (tile_shape/halo) switches precompute + initialize to the tiled path."""
    assert len(image_paths) == len(gt_paths)
    fixed_generate_kwargs = fixed_generate_kwargs or {}
    tiling_window_params = tiling_window_params or {}
    os.makedirs(result_dir, exist_ok=True)

    gs_combinations = [
        dict(zip(grid_search_values.keys(), vals))
        for vals in product(*grid_search_values.values())
    ]

    predictor = segmenter._predictor
    for idx, (image_path, gt_path) in enumerate(zip(image_paths, gt_paths)):
        name = _name_of(image_path, f"image-{idx}")
        result_path = os.path.join(result_dir, f"{name}.csv")
        if os.path.exists(result_path):
            continue

        image = _load(image_path)
        gt = _load(gt_path)
        if rois is not None:
            image, gt = image[rois[idx]], gt[rois[idx]]

        embedding_path = None if embedding_dir is None else \
            os.path.join(embedding_dir, f"{name}.zarr")
        emb = util.precompute_image_embeddings(
            predictor, image, embedding_path, verbose=False, **tiling_window_params)
        segmenter.initialize(image, image_embeddings=emb, verbose=False,
                             **tiling_window_params)

        rows = []
        for gs_kwargs in gs_combinations:
            seg = segmenter.generate(**gs_kwargs, **fixed_generate_kwargs)
            if isinstance(seg, list):
                seg = np.zeros(gt.shape, dtype="uint32")
            msa, scores = mean_segmentation_accuracy(seg, gt, return_accuracies=True)
            row = dict(gs_kwargs)
            row.update({"mSA": msa, "SA50": scores[0], "SA75": scores[5]})
            rows.append(row)
            if verbose_gs:
                print(name, gs_kwargs, "->", msa)
        pd.DataFrame(rows).to_csv(result_path, index=False)


def evaluate_instance_segmentation_grid_search(
    result_dir: Union[str, os.PathLike],
    grid_search_parameters: List[str],
    criterion: str = "mSA",
) -> Tuple[Dict[str, Any], float]:
    """Pick the best parameters across images: group-mean over per-image CSVs
    (reference evaluation/instance_segmentation.py:218)."""
    csvs = sorted(glob(os.path.join(str(result_dir), "*.csv")))
    assert csvs, f"No grid-search results in {result_dir}"
    dfs = [pd.read_csv(p) for p in csvs]
    df = pd.concat(dfs, ignore_index=True)
    grouped = df.groupby(grid_search_parameters)[criterion].mean().reset_index()
    best_row = grouped.loc[grouped[criterion].idxmax()]
    best_kwargs = {p: best_row[p] for p in grid_search_parameters}
    return best_kwargs, float(best_row[criterion])


def save_grid_search_best_params(best_kwargs: Dict[str, Any], best_msa: float,
                                 grid_search_result_dir=None) -> str:
    """Persist the winning grid-search parameters + score to a results CSV
    (reference evaluation/instance_segmentation.py:413)."""
    row = {"best_msa": best_msa, **best_kwargs}
    is_amg = "pred_iou_thresh" in best_kwargs or "stability_score_thresh" in best_kwargs
    fname = ("grid_search_params_amg.csv" if is_amg
             else "grid_search_params_instance_segmentation_with_decoder.csv")
    if grid_search_result_dir is not None:
        os.makedirs(os.path.join(str(grid_search_result_dir), "results"), exist_ok=True)
        path = os.path.join(str(grid_search_result_dir), "results", fname)
    else:
        path = fname
    pd.DataFrame([row]).to_csv(path)
    return path


def run_instance_segmentation_inference(
    segmenter,
    image_paths: List,
    prediction_dir: Union[str, os.PathLike],
    embedding_dir: Optional[Union[str, os.PathLike]],
    generate_kwargs: Optional[Dict[str, Any]] = None,
    tiling_window_params: Optional[Dict[str, Tuple[int, int]]] = None,
) -> None:
    """Run inference with fixed generate kwargs (reference
    evaluation/instance_segmentation.py:324)."""
    generate_kwargs = generate_kwargs or {}
    tiling_window_params = tiling_window_params or {}
    os.makedirs(prediction_dir, exist_ok=True)
    predictor = segmenter._predictor

    for idx, image_path in enumerate(image_paths):
        name = _name_of(image_path, f"image-{idx}")
        prediction_path = os.path.join(prediction_dir, f"{name}.tif")
        if os.path.exists(prediction_path):
            continue
        image = _load(image_path)
        embedding_path = None if embedding_dir is None else \
            os.path.join(embedding_dir, f"{name}.zarr")
        emb = util.precompute_image_embeddings(
            predictor, image, embedding_path, verbose=False, **tiling_window_params)
        segmenter.initialize(image, image_embeddings=emb, verbose=False,
                             **tiling_window_params)
        seg = segmenter.generate(**generate_kwargs)
        if isinstance(seg, list):
            seg = np.zeros(image.shape[:2], dtype="uint32")
        _write_tif(prediction_path, seg.astype(np.uint32))


def run_instance_segmentation_grid_search_and_inference(
    segmenter,
    grid_search_values: Dict[str, List],
    val_image_paths: List,
    val_gt_paths: List,
    test_image_paths: List,
    embedding_dir: Optional[Union[str, os.PathLike]],
    prediction_dir: Union[str, os.PathLike],
    result_dir: Union[str, os.PathLike],
    fixed_generate_kwargs: Optional[Dict[str, Any]] = None,
    verbose_gs: bool = True,
    experiment_folder: Optional[Union[str, os.PathLike]] = None,
    tiling_window_params: Optional[Dict[str, Tuple[int, int]]] = None,
) -> str:
    """Grid search on val, then inference on test with the best parameters
    (reference evaluation/instance_segmentation.py:431). ``experiment_folder``
    overrides where the best-parameter CSV is written (defaults to the
    grid-search layout's parent)."""
    run_instance_segmentation_grid_search(
        segmenter, grid_search_values, val_image_paths, val_gt_paths,
        result_dir=result_dir, embedding_dir=embedding_dir,
        fixed_generate_kwargs=fixed_generate_kwargs, verbose_gs=verbose_gs,
        tiling_window_params=tiling_window_params,
    )
    best_kwargs, best_score = evaluate_instance_segmentation_grid_search(
        result_dir, list(grid_search_values.keys())
    )
    if verbose_gs:
        print("Best grid-search result:", best_score, "with", best_kwargs)
    if experiment_folder is not None:
        gs_parent = str(experiment_folder)
    else:
        gs_parent = os.path.dirname(str(result_dir).rstrip(os.sep))
        if os.path.basename(str(result_dir).rstrip(os.sep)) == "grid_search":
            # conventional layout <experiment>/<mode>/grid_search -> <experiment>
            gs_parent = os.path.dirname(gs_parent)
    save_grid_search_best_params(best_kwargs, best_score, gs_parent or None)
    generate_kwargs = dict(fixed_generate_kwargs or {})
    generate_kwargs.update(best_kwargs)
    run_instance_segmentation_inference(
        segmenter, test_image_paths, prediction_dir, embedding_dir, generate_kwargs,
        tiling_window_params=tiling_window_params,
    )
    return str(prediction_dir)
