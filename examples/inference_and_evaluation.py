"""Batch inference over an image folder + evaluation against ground truth.

Runnable-script port of the reference's notebooks/inference_and_evaluation.ipynb:
precompute embeddings for a set of images, run automatic instance segmentation
(and optionally iterative-prompting inference) on each, then score the
predictions with mean segmentation accuracy (mSA / SA50 / SA75).

Offline by default: generates a small synthetic dataset. Point --image_dir /
--gt_dir at real data (tif/png) to evaluate a real model.
"""
import argparse
import os

import numpy as np

from micro_sam_tpu.automatic_segmentation import (
    automatic_instance_segmentation, get_predictor_and_segmenter,
)
from micro_sam_tpu.evaluation.evaluation import run_evaluation
from micro_sam_tpu.sample_data import synthetic_data
from micro_sam_tpu.util import load_image_data


def _synthetic_dataset(n=3, shape=(512, 512)):
    images, gts = [], []
    for seed in range(n):
        im, seg = synthetic_data(shape, seed=seed)
        images.append(im)
        gts.append(seg)
    return images, gts


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--image_dir", default=None)
    parser.add_argument("--gt_dir", default=None)
    parser.add_argument("--model_type", default="vit_b")
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--embedding_dir", default=None,
                        help="Cache embeddings as zarr (skip recompute on rerun).")
    args = parser.parse_args()

    if args.image_dir:
        names = sorted(os.listdir(args.image_dir))
        images = [load_image_data(os.path.join(args.image_dir, n)) for n in names]
        gts = [load_image_data(os.path.join(args.gt_dir, n)) for n in names]
    else:
        images, gts = _synthetic_dataset()

    predictor, segmenter = get_predictor_and_segmenter(
        model_type=args.model_type, checkpoint=args.checkpoint)

    predictions = []
    for i, image in enumerate(images):
        embedding_path = (os.path.join(args.embedding_dir, f"im{i}.zarr")
                          if args.embedding_dir else None)
        seg = automatic_instance_segmentation(
            predictor=predictor, segmenter=segmenter, input_path=image,
            embedding_path=embedding_path)
        predictions.append(seg.astype(np.uint32))

    results = run_evaluation(gt_paths=gts, prediction_paths=predictions,
                             verbose=False)
    print(results.to_string(index=False))


if __name__ == "__main__":
    main()
