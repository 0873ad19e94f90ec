"""Benchmarking suite over microscopy datasets (reference
micro_sam/evaluation/benchmark_datasets.py).

The reference enumerates ~30 torch_em-downloadable datasets; in this offline
environment datasets must already exist on disk as (image, gt) tif pairs under
``<root>/<dataset>/{images,labels}``. The runner covers the same evaluation
series: automatic modes (AIS if a decoder is present, AMG) and interactive
box/point prompting with and without iterative refinement.
"""
from __future__ import annotations

import os
from glob import glob
from pathlib import Path
from typing import Dict, List, Optional, Tuple, Union

import numpy as np
import pandas as pd

from .. import util
from . import inference as inference_mod
from .evaluation import run_evaluation, run_evaluation_for_iterative_prompting

LM_2D_DATASETS = [
    "livecell", "deepbacs", "tissuenet", "neurips_cellseg", "dynamicnuclearnet",
    "plantseg_root", "covid_if", "hpa", "lizard", "organoidnet", "gonuclear", "pannuke",
]
LM_3D_DATASETS = ["plantseg_ovules", "gonuclear", "mouse_embryo", "cellseg3d"]
EM_2D_DATASETS = ["mitolab_tem"]
EM_3D_DATASETS = [
    "mitoem_rat", "mitoem_human", "platynereis_nuclei", "lucchi", "mitolab",
    "nuc_mm_mouse", "num_mm_zebrafish", "uro_cell", "sponge_em", "platynereis_cilia",
]
DATASETS = LM_2D_DATASETS + LM_3D_DATASETS + EM_2D_DATASETS + EM_3D_DATASETS


def _get_dataset_paths(dataset_root: str, dataset: str) -> Tuple[List[str], List[str]]:
    img_dir = os.path.join(dataset_root, dataset, "images")
    gt_dir = os.path.join(dataset_root, dataset, "labels")
    if not (os.path.isdir(img_dir) and os.path.isdir(gt_dir)):
        raise RuntimeError(
            f"Dataset '{dataset}' not found under {dataset_root}. Expected "
            f"{img_dir} and {gt_dir} (datasets cannot be downloaded in this environment)."
        )
    image_paths = sorted(glob(os.path.join(img_dir, "*")))
    gt_paths = sorted(glob(os.path.join(gt_dir, "*")))
    assert len(image_paths) == len(gt_paths)
    return image_paths, gt_paths


def run_benchmark_evaluation(
    dataset_root: str,
    dataset: str,
    model_type: str,
    output_folder: str,
    checkpoint_path: Optional[str] = None,
    run_amg: bool = True,
    run_ais: bool = True,
    run_interactive: bool = True,
    n_val: int = 5,
    retain: bool = False,
) -> pd.DataFrame:
    """Run the evaluation series for one dataset (reference
    benchmark_datasets.py:744): automatic (AIS/AMG) + interactive box/points
    with iterative refinement."""
    image_paths, gt_paths = _get_dataset_paths(dataset_root, dataset)
    val_images, val_gts = image_paths[:n_val], gt_paths[:n_val]
    test_images, test_gts = image_paths[n_val:], gt_paths[n_val:]
    if not test_images:
        test_images, test_gts = image_paths, gt_paths

    experiment_folder = os.path.join(output_folder, dataset, model_type)
    os.makedirs(experiment_folder, exist_ok=True)
    results = {}

    predictor, state = util.get_sam_model(
        model_type=model_type, checkpoint_path=checkpoint_path, return_state=True
    )
    has_decoder = "decoder_state" in state

    if run_ais and has_decoder:
        pred_dir = inference_mod.run_instance_segmentation_with_decoder(
            checkpoint_path, model_type, experiment_folder,
            val_images, val_gts, test_images,
        )
        preds = sorted(glob(os.path.join(pred_dir, "*.tif")))
        res = run_evaluation(test_gts[:len(preds)], preds, save_path=None)
        results["ais"] = res.iloc[0].to_dict()

    if run_amg:
        pred_dir = inference_mod.run_amg(
            checkpoint_path, model_type, experiment_folder,
            val_images, val_gts, test_images,
        )
        preds = sorted(glob(os.path.join(pred_dir, "*.tif")))
        res = run_evaluation(test_gts[:len(preds)], preds, save_path=None)
        results["amg"] = res.iloc[0].to_dict()

    if run_interactive:
        for start_with_box in (False, True):
            pred_root = os.path.join(
                experiment_folder,
                "start_with_box" if start_with_box else "start_with_point",
            )
            inference_mod.run_inference_with_iterative_prompting(
                predictor, test_images, test_gts,
                embedding_dir=None, prediction_dir=pred_root,
                start_with_box_prompt=start_with_box, n_iterations=3,
            )
            res = run_evaluation_for_iterative_prompting(
                test_gts, pred_root, experiment_folder,
                start_with_box_prompt=start_with_box,
            )
            key = "interactive_box" if start_with_box else "interactive_point"
            results[key] = res.iloc[-1].to_dict()

    df = pd.DataFrame(results).T
    df.to_csv(os.path.join(experiment_folder, "benchmark_results.csv"))
    if not retain:
        import shutil
        for sub in ("embeddings",):
            shutil.rmtree(os.path.join(experiment_folder, sub), ignore_errors=True)
    return df


def main():
    """@private CLI: micro_sam_tpu.benchmark_sam."""
    import argparse
    parser = argparse.ArgumentParser(description="Benchmark SAM models on microscopy datasets.")
    parser.add_argument("-d", "--dataset_root", required=True)
    parser.add_argument("--dataset", required=True, choices=DATASETS + ["custom"])
    parser.add_argument("-m", "--model_type", default=util._DEFAULT_MODEL)
    parser.add_argument("-o", "--output_folder", required=True)
    parser.add_argument("-c", "--checkpoint_path", default=None)
    parser.add_argument("--no_amg", action="store_true")
    parser.add_argument("--no_interactive", action="store_true")
    parser.add_argument("--retain", action="store_true")
    args = parser.parse_args()

    df = run_benchmark_evaluation(
        args.dataset_root, args.dataset, args.model_type, args.output_folder,
        checkpoint_path=args.checkpoint_path,
        run_amg=not args.no_amg, run_interactive=not args.no_interactive,
        retain=args.retain,
    )
    print(df.to_string())


if __name__ == "__main__":
    main()
