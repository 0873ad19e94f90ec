"""Shared test helpers (reference micro_sam/_test_util.py)."""
from __future__ import annotations


def check_layer_initialization(viewer, expected_shape):
    """Check the annotator layer contract on a napari viewer
    (reference _test_util.py:4)."""
    from .sam_annotator._annotator import ANNOTATOR_LAYERS

    assert len(viewer.layers) >= 6
    expected_layer_names = ("image",) + ANNOTATOR_LAYERS
    for name in expected_layer_names:
        assert name in viewer.layers

    for layer_name in ("current_object", "auto_segmentation", "committed_objects"):
        assert viewer.layers[layer_name].data.shape == expected_shape
