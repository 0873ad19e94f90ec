"""Headless image-series annotation workflow.

Port of the reference's series-annotation usage (image_series_annotator): run
the annotator over a folder/series of images WITHOUT a napari GUI — the
annotator assembles on a duck-typed viewer, an automatic segmentation is
committed per image, and "Next Image" steps through the series writing each
result to the output folder. On a machine with napari installed the same call
(without ``viewer=``) opens the interactive GUI instead.
"""
import argparse
import os

import numpy as np

from micro_sam_tpu._test_util import FakeViewer
from micro_sam_tpu.sam_annotator.image_series_annotator import image_series_annotator
from micro_sam_tpu.sample_data import synthetic_data


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--output_folder", default="./series_segmentations")
    parser.add_argument("--model_type", default="vit_b")
    parser.add_argument("--n_images", type=int, default=3)
    args = parser.parse_args()

    images = [synthetic_data((512, 512), seed=s)[0] for s in range(args.n_images)]

    viewer = FakeViewer()
    viewer = image_series_annotator(
        images, output_folder=args.output_folder,
        model_type=args.model_type, viewer=viewer, return_viewer=True,
    )

    # headless drive: segment-all + commit + next for every image in the series
    for _ in range(args.n_images):
        seg = viewer.layers["committed_objects"]
        seg.data = np.ones_like(seg.data)  # stand-in for interactive edits
        viewer.press("n")                  # save current result, load next image

    written = sorted(os.listdir(args.output_folder))
    print(f"wrote {len(written)} segmentations to {args.output_folder}: {written}")


if __name__ == "__main__":
    main()
