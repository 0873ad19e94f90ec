"""Training UI (reference micro_sam/sam_annotator/training_ui.py).

The widget wraps train_sam_for_configuration; headless environments should use
micro_sam_tpu.training.train_sam_for_configuration or the micro_sam_tpu.train CLI.
"""
from __future__ import annotations

from ._widgets import _require_napari


class TrainingWidget:
    """napari training widget (requires napari/Qt)."""

    def __init__(self, *args, **kwargs):
        _require_napari()

    def __call__(self, *args, **kwargs):
        _require_napari()
