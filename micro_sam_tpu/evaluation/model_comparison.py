"""Qualitative side-by-side comparison of two/three models
(reference micro_sam/evaluation/model_comparison.py)."""
from __future__ import annotations

import os
from glob import glob
from pathlib import Path
from typing import Optional, Union

import h5py
import numpy as np

from .. import util
from ..prompt_based_segmentation import segment_from_box, segment_from_points
from ..prompt_generators import PointAndBoxPromptGenerator
from .matching import mean_segmentation_accuracy


def generate_data_for_model_comparison(
    loader,
    output_folder: Union[str, os.PathLike],
    model_type1: str,
    model_type2: str,
    n_samples: int,
    model_type3: Optional[str] = None,
    checkpoint1: Optional[str] = None,
    checkpoint2: Optional[str] = None,
    checkpoint3: Optional[str] = None,
) -> None:
    """Predict identical prompts with 2-3 models into per-sample h5 files
    (reference model_comparison.py:32)."""
    os.makedirs(output_folder, exist_ok=True)
    prompt_generator = PointAndBoxPromptGenerator(
        n_positive_points=1, n_negative_points=0, dilation_strength=3,
        get_point_prompts=True, get_box_prompts=True,
    )

    predictors = [
        util.get_sam_model(model_type=model_type1, checkpoint_path=checkpoint1),
        util.get_sam_model(model_type=model_type2, checkpoint_path=checkpoint2),
    ]
    names = [model_type1, model_type2]
    if model_type3 is not None:
        predictors.append(util.get_sam_model(model_type=model_type3, checkpoint_path=checkpoint3))
        names.append(model_type3)

    for sample_idx, (image, gt) in enumerate(loader):
        if sample_idx >= n_samples:
            break
        image = np.asarray(image[0] if image.ndim == 4 else image)
        gt = np.asarray(gt[0] if np.asarray(gt).ndim == 3 and gt.shape[0] == 1 else gt)

        gt_ids = np.unique(gt)[1:]
        if len(gt_ids) == 0:
            continue
        centers, bboxes = util.get_centers_and_bounding_boxes(gt)

        with h5py.File(os.path.join(output_folder, f"sample{sample_idx}.h5"), "w") as f:
            f.create_dataset("image", data=image)
            f.create_dataset("gt", data=gt)
            for pred, name in zip(predictors, names):
                emb = util.precompute_image_embeddings(pred, image, verbose=False)
                seg_point = np.zeros_like(gt, dtype="uint32")
                seg_box = np.zeros_like(gt, dtype="uint32")
                for gt_id in gt_ids:
                    center = centers[int(gt_id)]
                    mask_p = segment_from_points(
                        pred, np.array([center]), np.array([1]), image_embeddings=emb
                    )
                    seg_point[mask_p[0]] = int(gt_id)
                    bb = bboxes[int(gt_id)]
                    box = np.array([bb[0][0], bb[1][0], bb[0][1], bb[1][1]])
                    mask_b = segment_from_box(pred, box, image_embeddings=emb)
                    seg_box[mask_b[0]] = int(gt_id)
                g = f.create_group(name.replace("/", "_"))
                g.create_dataset("points", data=seg_point, compression="gzip")
                g.create_dataset("box", data=seg_box, compression="gzip")


def model_comparison(
    output_folder: Union[str, os.PathLike],
    n_images_per_sample: int,
    min_size: int,
    plot_folder: Optional[Union[str, os.PathLike]] = None,
    point_radius: int = 4,
    outline_dilation: int = 0,
    have_model3: bool = False,
) -> None:
    """Create pairwise comparison figures from generated comparison data
    (reference model_comparison.py:414)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    files = sorted(glob(os.path.join(str(output_folder), "sample*.h5")))
    if plot_folder is not None:
        os.makedirs(plot_folder, exist_ok=True)

    for i, path in enumerate(files[:n_images_per_sample]):
        with h5py.File(path, "r") as f:
            image = f["image"][:]
            groups = [k for k in f.keys() if k not in ("image", "gt")]
            n = len(groups)
            fig, axes = plt.subplots(2, n, figsize=(4 * n, 8))
            axes = np.atleast_2d(axes)
            for col, name in enumerate(groups):
                for row, mode in enumerate(("points", "box")):
                    seg = f[name][mode][:]
                    ax = axes[row, col]
                    ax.imshow(image, cmap="gray")
                    ax.imshow(np.ma.masked_where(seg == 0, seg), alpha=0.5, cmap="tab20")
                    ax.set_title(f"{name} ({mode})")
                    ax.axis("off")
            if plot_folder is None:
                plt.show()
            else:
                fig.savefig(os.path.join(plot_folder, f"comparison-{i}.png"), dpi=120)
            plt.close(fig)
