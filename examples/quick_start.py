"""Quick start: automatic instance segmentation with minimal effort.

Runnable-script port of the reference's notebooks/quick_start.ipynb: load an
image (synthetic sample data offline, or --input), pick a model, call
``automatic_instance_segmentation`` — that's the whole workflow.
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
    parser.add_argument("--model_type", default="vit_b_lm",
                        help="vit_b_lm / vit_b / vit_t ... (see util.get_model_names)")
    parser.add_argument("--checkpoint", default=None)
    args = parser.parse_args()

    image = load_image_data(args.input) if args.input else synthetic_data((512, 512))[0]

    # one call sets up the model (AIS when the model ships a decoder, AMG
    # otherwise) ...
    predictor, segmenter = get_predictor_and_segmenter(
        model_type=args.model_type, checkpoint=args.checkpoint)

    # ... and one call segments the image
    segmentation = automatic_instance_segmentation(
        predictor=predictor, segmenter=segmenter, input_path=image)

    n_objects = len(np.unique(segmentation)) - 1
    print(f"Segmented {n_objects} objects in an image of shape {image.shape}.")


if __name__ == "__main__":
    main()
