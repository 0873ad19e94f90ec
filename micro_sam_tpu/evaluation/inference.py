"""Inference harnesses for evaluation (reference micro_sam/evaluation/inference.py).

GT-derived prompt inference (batched over all objects of an image), iterative
prompting evaluation (start from point or box, add corrective points each
round, optionally feeding back mask logits), and AMG/AIS/APG wrappers with
grid search.
"""
from __future__ import annotations

import os
import pickle
from glob import glob
from pathlib import Path
from typing import Dict, List, Optional, Tuple, Union

import numpy as np

from .. import util
from ..inference import batched_inference
from ..instance_segmentation import (
    AutomaticMaskGenerator, InstanceSegmentationWithDecoder, AutomaticPromptGenerator,
    get_predictor_and_decoder,
)
from ..prompt_generators import PointAndBoxPromptGenerator, IterativePromptGenerator
from . import instance_segmentation as grid_search_mod


def _write_tif(path, data):
    import imageio.v3 as imageio
    try:
        imageio.imwrite(path, data, compression="zlib")
    except TypeError:
        imageio.imwrite(path, data)


def precompute_all_embeddings(predictor, image_paths, embedding_dir, ndim: int = 2,
                              **kwargs) -> None:
    """Precompute embeddings for all images (reference evaluation/inference.py:95)."""
    os.makedirs(embedding_dir, exist_ok=True)
    for path in image_paths:
        image = util.load_image_data(str(path)) if not isinstance(path, np.ndarray) else path
        name = Path(str(path)).stem if not isinstance(path, np.ndarray) else "array"
        save_path = os.path.join(embedding_dir, f"{name}.zarr")
        util.precompute_image_embeddings(predictor, image, save_path, ndim=ndim,
                                         verbose=False, **kwargs)


def _get_batched_prompts(gt, gt_ids, use_points, use_boxes, n_positives, n_negatives,
                         dilation, rng=None):
    prompt_generator = PointAndBoxPromptGenerator(
        n_positive_points=n_positives if use_points else 0,
        n_negative_points=n_negatives if use_points else 0,
        dilation_strength=dilation,
        get_point_prompts=use_points,
        get_box_prompts=use_boxes,
        rng=rng,
    )
    center_coordinates, bbox_coordinates = util.get_centers_and_bounding_boxes(gt)
    centers = [center_coordinates[int(i)] for i in gt_ids]
    bboxes = [
        (bbox_coordinates[int(i)][0][0], bbox_coordinates[int(i)][1][0],
         bbox_coordinates[int(i)][0][1], bbox_coordinates[int(i)][1][1])
        for i in gt_ids
    ]
    masks = np.stack([gt == i for i in gt_ids])[:, None].astype(np.float32)
    points, labels, boxes, _ = prompt_generator(masks, bboxes, centers)
    return points, labels, boxes


def precompute_all_prompts(gt_paths, prompt_save_dir, prompt_settings: List[Dict]) -> None:
    """Precompute and pickle prompts for all settings (reference
    evaluation/inference.py:134)."""
    os.makedirs(prompt_save_dir, exist_ok=True)
    for settings in prompt_settings:
        suffix = "boxes" if settings.get("use_boxes") and not settings.get("use_points") else \
            f"points-p{settings['n_positives']}-n{settings['n_negatives']}"
        save_path = os.path.join(prompt_save_dir, f"{suffix}.pkl")
        if os.path.exists(save_path):
            continue
        all_prompts = {}
        for gt_path in gt_paths:
            gt = util.load_image_data(str(gt_path)) if not isinstance(gt_path, np.ndarray) else gt_path
            gt_ids = np.unique(gt)[1:]
            name = Path(str(gt_path)).stem if not isinstance(gt_path, np.ndarray) else "array"
            if len(gt_ids) == 0:
                continue
            all_prompts[name] = _get_batched_prompts(
                gt, gt_ids,
                use_points=settings.get("use_points", True),
                use_boxes=settings.get("use_boxes", False),
                n_positives=settings.get("n_positives", 1),
                n_negatives=settings.get("n_negatives", 0),
                dilation=settings.get("dilation", 5),
            )
        with open(save_path, "wb") as f:
            pickle.dump(all_prompts, f)


def run_inference_with_prompts(
    predictor,
    image_paths: List,
    gt_paths: List,
    embedding_dir: Union[str, os.PathLike],
    prediction_dir: Union[str, os.PathLike],
    use_points: bool,
    use_boxes: bool,
    n_positives: int,
    n_negatives: int,
    dilation: int = 5,
    prompt_save_dir: Optional[Union[str, os.PathLike]] = None,
    batch_size: int = 512,
) -> None:
    """Run segmentation from GT-derived prompts for all images (reference
    evaluation/inference.py:254)."""
    if not (use_points or use_boxes):
        raise ValueError("You need to use at least one of point or box prompts.")
    os.makedirs(prediction_dir, exist_ok=True)

    for image_path, gt_path in zip(image_paths, gt_paths):
        name = Path(str(image_path)).stem
        prediction_path = os.path.join(prediction_dir, f"{name}.tif")
        if os.path.exists(prediction_path):
            continue

        image = util.load_image_data(str(image_path)) if not isinstance(image_path, np.ndarray) else image_path
        gt = util.load_image_data(str(gt_path)) if not isinstance(gt_path, np.ndarray) else gt_path
        gt, _, _ = __import__("micro_sam_tpu.native", fromlist=["x"]).relabel_consecutive(gt)

        gt_ids = np.unique(gt)[1:]
        if len(gt_ids) == 0:
            continue

        embedding_path = None if embedding_dir is None else \
            os.path.join(embedding_dir, f"{name}.zarr")
        emb = util.precompute_image_embeddings(predictor, image, embedding_path, verbose=False)
        util.set_precomputed(predictor, emb)

        points, labels, boxes = _get_batched_prompts(
            gt, gt_ids, use_points, use_boxes, n_positives, n_negatives, dilation
        )
        if use_boxes and not use_points:
            seg = batched_inference(
                predictor, image=None, batch_size=batch_size, boxes=boxes.astype(np.float64),
                segmentation_ids=[int(i) for i in gt_ids],
            )
        else:
            seg = batched_inference(
                predictor, image=None, batch_size=batch_size,
                points=points[:, :, :].astype(np.float64).reshape(len(gt_ids), -1, 2),
                point_labels=np.asarray(labels).reshape(len(gt_ids), -1),
                boxes=boxes.astype(np.float64) if use_boxes else None,
                segmentation_ids=[int(i) for i in gt_ids],
            )
        _write_tif(prediction_path, seg.astype(np.uint32))


def _run_inference_with_iterative_prompting_for_image(
    predictor, image, gt, start_with_box_prompt, dilation, batch_size,
    n_iterations, prediction_paths, use_masks=False,
) -> None:
    prompt_generator = IterativePromptGenerator()

    gt_ids = np.unique(gt)[1:]
    if len(gt_ids) == 0:
        return

    points, labels, boxes = _get_batched_prompts(
        gt, gt_ids, use_points=not start_with_box_prompt,
        use_boxes=start_with_box_prompt, n_positives=1, n_negatives=0,
        dilation=dilation,
    )
    sampled_binary_gt = np.stack([gt == i for i in gt_ids]).astype(np.float32)

    logits_masks = None
    for it in range(n_iterations):
        if start_with_box_prompt and it == 0:
            records = batched_inference(
                predictor, image=None, batch_size=batch_size,
                boxes=boxes.astype(np.float64), return_instance_segmentation=False,
            )
        else:
            records = batched_inference(
                predictor, image=None, batch_size=batch_size,
                points=points.astype(np.float64), point_labels=labels,
                return_instance_segmentation=False,
                logits_masks=logits_masks,
            )

        # write the instance segmentation for this iteration
        seg = np.zeros(gt.shape, dtype=np.uint32)
        for obj_idx, rec in enumerate(records):
            seg[np.asarray(rec["segmentation"], dtype=bool)] = int(gt_ids[obj_idx])
        _write_tif(prediction_paths[it], seg)

        if it == n_iterations - 1:
            break
        # sample corrective points
        pred_masks = np.stack([np.asarray(r["segmentation"]) for r in records])[:, None]
        new_points, new_labels, _, _ = prompt_generator(
            sampled_binary_gt[:, None], pred_masks.astype(np.float32)
        )
        if it == 0 and start_with_box_prompt:
            points = new_points.astype(np.float64)
            labels = new_labels
        else:
            points = np.concatenate([points, new_points], axis=1)
            labels = np.concatenate([labels, new_labels], axis=1)
        if use_masks:
            logits_masks = np.stack([np.asarray(r["logits"]) for r in records])

    return


def run_inference_with_iterative_prompting(
    predictor,
    image_paths: List,
    gt_paths: List,
    embedding_dir: Union[str, os.PathLike],
    prediction_dir: Union[str, os.PathLike],
    start_with_box_prompt: bool = True,
    dilation: int = 5,
    batch_size: int = 32,
    n_iterations: int = 8,
    use_masks: bool = False,
) -> None:
    """Iterative-prompting inference over images (reference
    evaluation/inference.py:461); predictions per iteration go to
    ``iteration0*`` subfolders."""
    from .. import native

    prediction_folders = []
    for it in range(n_iterations):
        folder = os.path.join(prediction_dir, f"iteration{it:02}")
        os.makedirs(folder, exist_ok=True)
        prediction_folders.append(folder)

    for image_path, gt_path in zip(image_paths, gt_paths):
        name = Path(str(image_path)).stem
        prediction_paths = [os.path.join(f, f"{name}.tif") for f in prediction_folders]
        if all(os.path.exists(p) for p in prediction_paths):
            continue

        image = util.load_image_data(str(image_path)) if not isinstance(image_path, np.ndarray) else image_path
        gt = util.load_image_data(str(gt_path)) if not isinstance(gt_path, np.ndarray) else gt_path
        gt, _, _ = native.relabel_consecutive(gt)

        embedding_path = None if embedding_dir is None else \
            os.path.join(embedding_dir, f"{name}.zarr")
        emb = util.precompute_image_embeddings(predictor, image, embedding_path, verbose=False)
        util.set_precomputed(predictor, emb)

        _run_inference_with_iterative_prompting_for_image(
            predictor, image, gt, start_with_box_prompt=start_with_box_prompt,
            dilation=dilation, batch_size=batch_size, n_iterations=n_iterations,
            prediction_paths=prediction_paths, use_masks=use_masks,
        )


# alias kept for reference-API parity
get_predictions_with_iterative_prompting = _run_inference_with_iterative_prompting_for_image


#
# AMG / AIS / APG evaluation wrappers (reference evaluation/inference.py:534-760)
#

def run_amg(
    checkpoint: Optional[Union[str, os.PathLike]],
    model_type: str,
    experiment_folder: Union[str, os.PathLike],
    val_image_paths: List,
    val_gt_paths: List,
    test_image_paths: List,
    tiling_window_params: Optional[Dict[str, Tuple[int, int]]] = None,
    iou_thresh_values: Optional[List[float]] = None,
    stability_score_values: Optional[List[float]] = None,
    peft_kwargs: Optional[Dict] = None,
    cache_embeddings: bool = False,
    verbose_gs: bool = False,
) -> str:
    embedding_folder = os.path.join(experiment_folder, "embeddings") if cache_embeddings else None
    if embedding_folder:
        os.makedirs(embedding_folder, exist_ok=True)

    predictor = util.get_sam_model(
        model_type=model_type, checkpoint_path=checkpoint, peft_kwargs=peft_kwargs
    )
    amg = AutomaticMaskGenerator(predictor)
    amg_prefix = "amg"

    gs_result_folder = os.path.join(experiment_folder, amg_prefix, "grid_search")
    os.makedirs(gs_result_folder, exist_ok=True)

    grid_search_values = grid_search_mod.default_grid_search_values_amg(
        iou_thresh_values=iou_thresh_values,
        stability_score_values=stability_score_values,
    )
    prediction_folder = grid_search_mod.run_instance_segmentation_grid_search_and_inference(
        amg, grid_search_values, val_image_paths, val_gt_paths, test_image_paths,
        embedding_dir=embedding_folder,
        prediction_dir=os.path.join(experiment_folder, amg_prefix, "inference"),
        result_dir=gs_result_folder, verbose_gs=verbose_gs,
        experiment_folder=experiment_folder, tiling_window_params=tiling_window_params,
    )
    return prediction_folder


def run_instance_segmentation_with_decoder(
    checkpoint: Optional[Union[str, os.PathLike]],
    model_type: str,
    experiment_folder: Union[str, os.PathLike],
    val_image_paths: List,
    val_gt_paths: List,
    test_image_paths: List,
    tiling_window_params: Optional[Dict[str, Tuple[int, int]]] = None,
    peft_kwargs: Optional[Dict] = None,
    cache_embeddings: bool = False,
    verbose_gs: bool = False,
) -> str:
    embedding_folder = os.path.join(experiment_folder, "embeddings") if cache_embeddings else None
    if embedding_folder:
        os.makedirs(embedding_folder, exist_ok=True)

    predictor, decoder = get_predictor_and_decoder(
        model_type=model_type, checkpoint_path=checkpoint, peft_kwargs=peft_kwargs
    )
    segmenter = InstanceSegmentationWithDecoder(predictor, decoder)
    seg_prefix = "instance_segmentation_with_decoder"

    gs_result_folder = os.path.join(experiment_folder, seg_prefix, "grid_search")
    os.makedirs(gs_result_folder, exist_ok=True)

    grid_search_values = \
        grid_search_mod.default_grid_search_values_instance_segmentation_with_decoder()
    prediction_folder = grid_search_mod.run_instance_segmentation_grid_search_and_inference(
        segmenter, grid_search_values, val_image_paths, val_gt_paths, test_image_paths,
        embedding_dir=embedding_folder,
        prediction_dir=os.path.join(experiment_folder, seg_prefix, "inference"),
        result_dir=gs_result_folder, verbose_gs=verbose_gs,
        experiment_folder=experiment_folder, tiling_window_params=tiling_window_params,
    )
    return prediction_folder


def run_apg(
    checkpoint: Optional[Union[str, os.PathLike]],
    model_type: str,
    experiment_folder: Union[str, os.PathLike],
    val_image_paths: List,
    val_gt_paths: List,
    test_image_paths: List,
    tiling_window_params: Optional[Dict[str, Tuple[int, int]]] = None,
    peft_kwargs: Optional[Dict] = None,
    cache_embeddings: bool = False,
    verbose_gs: bool = False,
) -> str:
    embedding_folder = os.path.join(experiment_folder, "embeddings") if cache_embeddings else None
    if embedding_folder:
        os.makedirs(embedding_folder, exist_ok=True)

    predictor, decoder = get_predictor_and_decoder(
        model_type=model_type, checkpoint_path=checkpoint, peft_kwargs=peft_kwargs
    )
    segmenter = AutomaticPromptGenerator(predictor, decoder)
    prefix = "apg"

    gs_result_folder = os.path.join(experiment_folder, prefix, "grid_search")
    os.makedirs(gs_result_folder, exist_ok=True)

    grid_search_values = grid_search_mod.default_grid_search_values_apg()
    prediction_folder = grid_search_mod.run_instance_segmentation_grid_search_and_inference(
        segmenter, grid_search_values, val_image_paths, val_gt_paths, test_image_paths,
        embedding_dir=embedding_folder,
        prediction_dir=os.path.join(experiment_folder, prefix, "inference"),
        result_dir=gs_result_folder, verbose_gs=verbose_gs,
        experiment_folder=experiment_folder, tiling_window_params=tiling_window_params,
    )
    return prediction_folder
