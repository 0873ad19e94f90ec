"""Interactive (prompt-based) segmentation: points, boxes and masks.

Mirrors the reference's use of prompt_based_segmentation; runs offline on
synthetic data.
"""
import numpy as np

from micro_sam_tpu.prompt_based_segmentation import (
    segment_from_box, segment_from_mask, segment_from_points,
)
from micro_sam_tpu.sample_data import synthetic_data
from micro_sam_tpu.util import get_sam_model, precompute_image_embeddings


def main():
    image, gt = synthetic_data((512, 512), seed=5)
    predictor = get_sam_model(model_type="vit_b")

    embeddings = precompute_image_embeddings(
        predictor, image, save_path="./embeddings.zarr"
    )

    # a positive point on the first object
    ys, xs = np.where(gt == 1)
    point = np.array([[ys.mean(), xs.mean()]])  # (y, x) convention
    mask = segment_from_points(predictor, point, np.array([1]), image_embeddings=embeddings)
    print("point prompt mask:", mask.shape, mask.sum())

    box = np.array([ys.min(), xs.min(), ys.max() + 1, xs.max() + 1])
    mask = segment_from_box(predictor, box, image_embeddings=embeddings)
    print("box prompt mask:", mask.shape, mask.sum())

    mask = segment_from_mask(predictor, gt == 1, image_embeddings=embeddings,
                             use_box=True, use_mask=True)
    print("mask prompt mask:", mask.shape, mask.sum())


if __name__ == "__main__":
    main()
