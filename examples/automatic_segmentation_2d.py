"""Automatic instance segmentation of a 2d image (AMG / AIS / APG).

Mirrors the reference's examples/automatic_segmentation.py; runs offline on
synthetic data. Pass --input/--checkpoint for real data and models.
"""
import argparse

import numpy as np

from micro_sam_tpu.automatic_segmentation import (
    automatic_instance_segmentation, get_predictor_and_segmenter,
)
from micro_sam_tpu.sample_data import synthetic_data
from micro_sam_tpu.util import load_image_data


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", default=None, help="Image path (default: synthetic).")
    parser.add_argument("--output", default="segmentation.tif")
    parser.add_argument("--model_type", default="vit_b")
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--mode", default="amg", choices=["auto", "amg", "ais", "apg"])
    args = parser.parse_args()

    image = load_image_data(args.input) if args.input else synthetic_data((512, 512))[0]

    predictor, segmenter = get_predictor_and_segmenter(
        model_type=args.model_type, checkpoint=args.checkpoint,
        segmentation_mode=args.mode,
    )
    segmentation = automatic_instance_segmentation(
        predictor, segmenter, image, output_path=args.output, verbose=True,
    )
    if segmentation is not None:
        print("objects:", len(np.unique(segmentation)) - 1)


if __name__ == "__main__":
    main()
