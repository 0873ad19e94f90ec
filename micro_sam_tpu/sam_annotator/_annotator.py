"""napari annotator widget scaffold (reference micro_sam/sam_annotator/_annotator.py).

Defines the viewer-layer contract (current_object, auto_segmentation,
committed_objects, point_prompts, prompts) and keybindings (S segment,
C commit, Shift-S nd-segment, Shift-C clear, T toggle label). Requires napari.
"""
from __future__ import annotations

import numpy as np

from ._state import AnnotatorState
from ._widgets import _require_napari, segment_2d, segment_slice, segment_nd, commit_segmentation
from . import util as vutil

# The layer contract every annotator maintains (checked by tests).
ANNOTATOR_LAYERS = (
    "current_object", "auto_segmentation", "committed_objects",
    "point_prompts", "prompts",
)


class _AnnotatorBase:
    """Base class wiring napari layers, widgets and keybindings
    (reference _annotator.py:14)."""

    def __init__(self, viewer, ndim: int):
        _require_napari()
        self._viewer = viewer
        self._ndim = ndim
        self._require_layers()
        self._create_keybindings()

    def _require_layers(self):
        import napari
        state = AnnotatorState()
        shape = state.image_shape
        dummy = np.zeros(shape, dtype="uint32")
        for name in ("current_object", "auto_segmentation", "committed_objects"):
            if name not in self._viewer.layers:
                self._viewer.add_labels(data=dummy.copy(), name=name)
        if "point_prompts" not in self._viewer.layers:
            self._viewer.add_points(
                name="point_prompts",
                properties={"label": ["positive"]},
                ndim=self._ndim,
            )
            self._viewer.layers["point_prompts"].data = []
        if "prompts" not in self._viewer.layers:
            self._viewer.add_shapes(name="prompts", ndim=self._ndim)

    def _create_keybindings(self):
        viewer = self._viewer

        @viewer.bind_key("s", overwrite=True)
        def _segment(v):
            self._segment()

        @viewer.bind_key("c", overwrite=True)
        def _commit(v):
            self._commit()

        @viewer.bind_key("Shift-s", overwrite=True)
        def _segment_nd(v):
            self._segment_nd()

        @viewer.bind_key("Shift-c", overwrite=True)
        def _clear(v):
            self._clear()

    # subclass hooks -----------------------------------------------------
    def _segment(self):
        raise NotImplementedError

    def _segment_nd(self):
        pass

    def _commit(self):
        state = AnnotatorState()
        committed = self._viewer.layers["committed_objects"].data
        current = self._viewer.layers["current_object"].data
        self._viewer.layers["committed_objects"].data = commit_segmentation(
            committed, current, z_range=state.z_range
        )
        self._clear()

    def _clear(self):
        from ._widgets import clear_annotations
        clear_annotations(
            self._viewer.layers["point_prompts"], self._viewer.layers["prompts"]
        )
        self._viewer.layers["current_object"].data = np.zeros_like(
            self._viewer.layers["current_object"].data
        )

    def _update_image(self, segmentation_result=None):
        if segmentation_result is not None:
            self._viewer.layers["committed_objects"].data = segmentation_result


class Annotator2d(_AnnotatorBase):
    def __init__(self, viewer):
        super().__init__(viewer, ndim=2)

    def _segment(self):
        state = AnnotatorState()
        seg = segment_2d(
            state, self._viewer.layers["point_prompts"],
            self._viewer.layers["prompts"], state.image_shape,
        )
        if seg is not None:
            self._viewer.layers["current_object"].data = seg.astype("uint32")


class Annotator3d(_AnnotatorBase):
    def __init__(self, viewer):
        super().__init__(viewer, ndim=3)

    def _segment(self):
        state = AnnotatorState()
        i = int(self._viewer.dims.current_step[0])
        seg_i = segment_slice(
            state, self._viewer.layers["point_prompts"],
            self._viewer.layers["prompts"], state.image_shape, i,
        )
        if seg_i is not None:
            data = self._viewer.layers["current_object"].data
            data[i] = seg_i
            self._viewer.layers["current_object"].data = data

    def _segment_nd(self):
        state = AnnotatorState()
        seg, _ = segment_nd(
            state, self._viewer.layers["point_prompts"],
            self._viewer.layers["prompts"], state.image_shape,
        )
        self._viewer.layers["current_object"].data = seg


class AnnotatorTracking(Annotator3d):
    pass
