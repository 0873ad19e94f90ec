"""Annotator widget stack, exercised headless through the _compat form layer.

Mirrors the reference's test/test_sam_annotator/test_widgets.py (which drives
EmbeddingWidget end-to-end and asserts the zarr attrs), extended to the auto-
segmentation / nd / commit / clear widgets and the full annotator assembly —
all without napari, via the FakeViewer duck-type.
"""
import os

import numpy as np
import pytest

from micro_sam_tpu._test_util import FakeViewer, FakeLayer


@pytest.fixture()
def fresh_state():
    from micro_sam_tpu.sam_annotator._state import AnnotatorState
    state = AnnotatorState()
    state.reset_state()
    state.widgets = {}
    state.annotator = None
    state.skip_recomputing_embeddings = False
    yield state
    state.reset_state()
    state.widgets = {}
    state.annotator = None


@pytest.fixture(autouse=True)
def _collect_messages():
    """Capture generate_message calls instead of warning/dialog."""
    from micro_sam_tpu.sam_annotator import _compat
    messages = []

    def handler(message_type, message):
        messages.append((message_type, message))
        return message_type == "error"  # abort on errors, proceed on infos

    _compat.set_message_handler(handler)
    _compat._messages = messages
    yield messages
    _compat.set_message_handler(None)


def test_process_tiling_inputs():
    from micro_sam_tpu.sam_annotator._widgets import _process_tiling_inputs

    assert _process_tiling_inputs(0, 0, 0, 0) == (None, None)
    assert _process_tiling_inputs(512, 0, 0, 0) == ((512, 512), (0, 0))
    assert _process_tiling_inputs(100, 0, 0, 0) == ((256, 256), (0, 0))
    assert _process_tiling_inputs(512, 300, 0, 0) == ((512, 300), (0, 0))
    assert _process_tiling_inputs(100, 300, 0, 0) == ((256, 300), (0, 0))
    assert _process_tiling_inputs(512, 512, 64, 32) == ((512, 512), (64, 64))
    # halo without tiling is dropped
    assert _process_tiling_inputs(0, 0, 64, 64) == (None, None)


def test_form_field_wiring():
    """set_param fires change callbacks; blockSignals suppresses them."""
    from micro_sam_tpu.sam_annotator._compat import FormWidget

    class W(FormWidget):
        def __init__(self):
            super().__init__()
            self.calls = []
            self.f = self._add_choice_param(
                "mode", "a", ["a", "b"], update=lambda: self.calls.append(self.mode))

    w = W()
    assert w.mode == "a"
    w.set_param("mode", "b")
    assert w.mode == "b" and w.calls == ["b"]
    w.f.blockSignals(True)
    w.set_param("mode", "a")
    assert w.mode == "a" and w.calls == ["b"]


def test_model_selection_mapping():
    """Family/size dropdowns resolve to zoo model types (reference
    _widgets.py:291-346)."""
    from micro_sam_tpu.sam_annotator._widgets import EmbeddingWidget

    w = EmbeddingWidget()
    w.set_param("model_family", "Light Microscopy")
    w.set_param("model_size", "base")
    assert w._resolve_model_type() == "vit_b_lm"
    w.set_param("model_family", "Natural Images (SAM)")
    w.set_param("model_size", "huge")
    assert w._resolve_model_type() == "vit_h"


def _tiny_get_sam_model(monkeypatch, tiny_sam):
    """Patch model loading so the widget uses the tiny test SAM."""
    from micro_sam_tpu.predictor import SamPredictor
    from micro_sam_tpu import util

    def fake_get_sam_model(model_type="vit_b", device=None, checkpoint_path=None,
                           return_state=False, **kwargs):
        predictor = SamPredictor(tiny_sam)
        predictor.model_type = model_type
        if return_state:
            return predictor, {"model_state": tiny_sam.params}
        return predictor

    monkeypatch.setattr(util, "get_sam_model", fake_get_sam_model)
    return fake_get_sam_model


def test_embedding_widget_end_to_end(fresh_state, _collect_messages, monkeypatch,
                                     tiny_sam, synthetic_image, tmp_path):
    """EmbeddingWidget computes embeddings, writes the signature attrs, and a
    second run validates/adopts the stored settings (reference
    test_widgets.py:26-67)."""
    from micro_sam_tpu.sam_annotator._widgets import EmbeddingWidget
    from micro_sam_tpu.utils import zarr_lite

    _tiny_get_sam_model(monkeypatch, tiny_sam)
    image, _ = synthetic_image
    save_path = str(tmp_path / "embeddings.zarr")

    widget = EmbeddingWidget()
    widget.image = FakeLayer(image, name="image")
    widget.set_param("embeddings_save_path", save_path)
    widget.run_button.click()

    state = fresh_state
    assert state.image_embeddings is not None
    assert state.image_shape == image.shape
    assert state.predictor is not None

    f = zarr_lite.open(save_path, mode="r")
    assert "data_signature" in f.attrs
    assert "input_size" in f.attrs
    assert f.attrs["original_size"] == list(image.shape)

    # second run on the SAME image+path: validation adopts stored settings
    state.reset_state()
    widget2 = EmbeddingWidget()
    widget2.image = FakeLayer(image, name="image")
    widget2.set_param("embeddings_save_path", save_path)
    assert widget2._validate_inputs() is False  # info message, proceeds

    # a DIFFERENT image on the same path must abort with an error
    other = image.copy()
    other[:16, :16] = 0
    widget3 = EmbeddingWidget()
    widget3.image = FakeLayer(other, name="image")
    widget3.set_param("embeddings_save_path", save_path)
    assert widget3._validate_inputs() is True
    assert any("don't match" in m for t, m in _collect_messages if t == "error")


def test_annotator_2d_stack(fresh_state, monkeypatch, tiny_sam, synthetic_image):
    """Full 2d annotator assembly on a FakeViewer: layers, widgets,
    keybindings, segment + commit callback paths."""
    from micro_sam_tpu.sam_annotator.annotator_2d import annotator_2d
    from micro_sam_tpu.sam_annotator._annotator import ANNOTATOR_LAYERS
    from micro_sam_tpu.predictor import SamPredictor

    _tiny_get_sam_model(monkeypatch, tiny_sam)
    image, _ = synthetic_image
    viewer = FakeViewer()
    state = fresh_state
    state.image_shape = image.shape

    predictor = SamPredictor(tiny_sam)
    from micro_sam_tpu.util import precompute_image_embeddings
    emb = precompute_image_embeddings(predictor, image, verbose=False)
    state.predictor = predictor
    state.image_embeddings = emb

    ret = annotator_2d(image, embedding_path=emb, model_type="vit_b",
                       viewer=viewer, return_viewer=True)
    assert ret is viewer
    for name in ANNOTATOR_LAYERS:
        assert name in viewer.layers
    assert state.annotator is not None
    assert set(state.widgets) >= {"embeddings", "segment", "autosegment", "commit", "clear"}

    # place a positive point prompt on an object and segment via the keybinding
    pts = viewer.layers["point_prompts"]
    pts.data = np.array([[128.0, 128.0]])
    pts.properties = {"label": np.array(["positive"], dtype=object)}
    viewer.press("s")
    seg = viewer.layers["current_object"].data
    assert seg.shape == image.shape
    assert seg.max() >= 1  # random-init model still produces a mask

    # commit via the keybinding: objects move to committed_objects, prompts clear
    viewer.press("c")
    assert viewer.layers["committed_objects"].data.max() >= 1
    assert viewer.layers["current_object"].data.max() == 0
    assert len(viewer.layers["point_prompts"].data) == 0


@pytest.mark.slow
def test_autosegment_widget_2d(fresh_state, monkeypatch, tiny_predictor, synthetic_image):
    from micro_sam_tpu.sam_annotator._widgets import AutoSegmentWidget
    from micro_sam_tpu.util import precompute_image_embeddings

    image, _ = synthetic_image
    state = fresh_state
    state.predictor = tiny_predictor
    state.image_embeddings = precompute_image_embeddings(tiny_predictor, image, verbose=False)
    state.image_shape = image.shape

    viewer = FakeViewer()
    viewer.add_labels(np.zeros(image.shape, dtype="uint32"), name="auto_segmentation")

    widget = AutoSegmentWidget(viewer, with_decoder=False, volumetric=False)
    # random-init model: loosen thresholds so something survives
    widget.set_param("pred_iou_thresh", -10.0)
    widget.set_param("stability_score_thresh", 0.0)
    widget.set_param("min_object_size", 0)
    widget.run_button.click()
    assert viewer.layers["auto_segmentation"].data.max() > 0

    # settings rebuild when the decoder availability changes
    widget._reset_segmentation_mode(True)
    assert widget.with_decoder and hasattr(widget, "center_distance_thresh")


def test_segment_nd_widget(fresh_state, tiny_predictor):
    """SegmentNDWidget projects a slice annotation through a tiny volume."""
    from micro_sam_tpu.sam_annotator._widgets import SegmentNDWidget
    from micro_sam_tpu.sample_data import synthetic_data
    from micro_sam_tpu.util import precompute_image_embeddings

    image, _ = synthetic_data(shape=(256, 256), seed=7)
    volume = np.stack([image] * 3)
    state = fresh_state
    state.predictor = tiny_predictor
    state.image_embeddings = precompute_image_embeddings(
        tiny_predictor, volume, ndim=3, verbose=False)
    state.image_shape = volume.shape

    viewer = FakeViewer()
    viewer.add_labels(np.zeros(volume.shape, dtype="uint32"), name="current_object")
    viewer.add_points(np.array([[1, 128.0, 128.0]]), name="point_prompts",
                      properties={"label": np.array(["positive"], dtype=object)})
    viewer.add_shapes(name="prompts", ndim=3)

    widget = SegmentNDWidget(viewer, tracking=False)
    widget.set_param("projection", "box")
    widget.set_param("iou_threshold", 0.0)
    widget.run_button.click()
    assert viewer.layers["current_object"].data.max() >= 1
    assert state.z_range is not None


def test_commit_widget_to_file(fresh_state, tmp_path):
    from micro_sam_tpu.sam_annotator._widgets import CommitWidget
    from micro_sam_tpu.utils import zarr_lite

    state = fresh_state
    state.data_signature = "f00d"
    viewer = FakeViewer()
    seg = np.zeros((64, 64), dtype="uint32")
    seg[10:20, 10:20] = 3
    viewer.add_labels(seg, name="current_object")
    viewer.add_labels(np.zeros((64, 64), dtype="uint32"), name="committed_objects")
    viewer.add_points(name="point_prompts", ndim=2)
    viewer.add_shapes(name="prompts", ndim=2)

    widget = CommitWidget(viewer)
    commit_path = str(tmp_path / "commit.zarr")
    widget.set_param("commit_path", commit_path)
    widget.run_button.click()

    assert viewer.layers["committed_objects"].data.max() == 1  # relabeled
    assert viewer.layers["current_object"].data.max() == 0
    f = zarr_lite.open(commit_path, mode="r")
    assert f.attrs["data_signature"] == "f00d"
    assert np.asarray(f["committed_objects"][:]).max() == 1


def test_training_widget_loaders(fresh_state, tmp_path):
    """TrainingWidget builds loaders from folder inputs with a random split."""
    import imageio.v3 as imageio
    from micro_sam_tpu.sam_annotator.training_ui import TrainingWidget
    from micro_sam_tpu.sample_data import synthetic_data

    raw_dir, label_dir = tmp_path / "im", tmp_path / "gt"
    raw_dir.mkdir(); label_dir.mkdir()
    for i in range(3):
        image, seg = synthetic_data(shape=(128, 128), seed=i)
        imageio.imwrite(raw_dir / f"{i}.tif", image)
        imageio.imwrite(label_dir / f"{i}.tif", seg)

    widget = TrainingWidget()
    assert widget._validate_inputs() is True  # no paths yet -> error

    widget.set_param("raw_path", str(raw_dir))
    widget.set_param("raw_key", "*.tif")
    widget.set_param("label_path", str(label_dir))
    widget.set_param("label_key", "*.tif")
    widget.set_param("patch_x", 128)
    widget.set_param("patch_y", 128)
    assert widget._validate_inputs() is False

    train_loader, val_loader = widget._get_loaders()
    batch = next(iter(train_loader))
    assert len(batch) == 3  # with decoder targets by default
    assert len(val_loader) >= 1


def test_tracking_annotator_stack(fresh_state, tiny_sam, monkeypatch):
    """Tracking annotator: lineage init, division bookkeeping, commit reset."""
    from micro_sam_tpu.sam_annotator._annotator import AnnotatorTracking
    from micro_sam_tpu.sam_annotator._widgets import _update_lineage

    state = fresh_state
    state.image_shape = (3, 64, 64)
    viewer = FakeViewer()
    AnnotatorTracking(viewer)
    assert state.current_track_id == 1
    assert state.lineage == {1: []}
    assert "tracking" in state.widgets

    # a division spawns two daughters and extends the track-id menu
    _update_lineage(viewer)
    assert state.lineage[1] == [2, 3]
    assert set(state.lineage) == {1, 2, 3}
    assert state.widgets["tracking"].track_id_field.options == ["1", "2", "3"]

    # switching the track id through the menu updates the state
    state.widgets["tracking"].set_param("track_id", "2")
    assert state.current_track_id == 2


def test_image_series_annotator_gui(fresh_state, monkeypatch, tiny_sam, tmp_path):
    """Series annotation flow on a FakeViewer: annotate, press Next, the
    committed segmentation is saved and the next image loads (reference
    image_series_annotator.py:133-345)."""
    import imageio.v3 as imageio
    from micro_sam_tpu.sam_annotator.image_series_annotator import image_series_annotator
    from micro_sam_tpu.sample_data import synthetic_data

    _tiny_get_sam_model(monkeypatch, tiny_sam)
    images = [synthetic_data(shape=(128, 128), seed=80 + i, n_objects=2)[0]
              for i in range(3)]
    out = str(tmp_path / "series_out")

    viewer = FakeViewer()
    ret = image_series_annotator(
        images, out, model_type="vit_b", viewer=viewer, return_viewer=True)
    assert ret is viewer
    assert "committed_objects" in viewer.layers

    # simulate an annotation commit, then go to the next image
    seg = np.zeros((128, 128), dtype="uint32")
    seg[10:30, 10:30] = 1
    viewer.layers["committed_objects"].data = seg
    viewer.press("n")
    saved = imageio.imread(os.path.join(out, "seg_00000.tif"))
    np.testing.assert_array_equal(saved, seg)
    # next image loaded, committed layer reset
    assert viewer.layers["committed_objects"].data.max() == 0

    viewer.press("n")  # second image saved (empty)
    assert os.path.exists(os.path.join(out, "seg_00001.tif"))

    # restart with skip_segmented: first two are done -> starts at index 2
    from micro_sam_tpu.sam_annotator._state import AnnotatorState
    AnnotatorState().reset_state()
    viewer2 = FakeViewer()
    ret2 = image_series_annotator(
        images, out, model_type="vit_b", viewer=viewer2, return_viewer=True,
        skip_segmented=True)
    assert ret2 is viewer2


def test_object_classifier_gui(fresh_state, monkeypatch, tiny_sam, tmp_path):
    """Object-classifier flow on a FakeViewer: paint labels, train, predict,
    export (reference object_classifier.py:312-390)."""
    import pickle
    from micro_sam_tpu.sam_annotator.object_classifier import object_classifier
    from micro_sam_tpu.sample_data import synthetic_data

    _tiny_get_sam_model(monkeypatch, tiny_sam)
    image, seg = synthetic_data(shape=(128, 128), seed=90, n_objects=4)
    seg = seg.astype("uint32")

    viewer = FakeViewer()
    ret = object_classifier(
        image, seg, model_type="vit_b", viewer=viewer, return_viewer=True)
    assert ret is viewer
    assert "annotations" in viewer.layers and "prediction" in viewer.layers

    # paint class labels over two objects
    state = fresh_state
    ann = np.zeros_like(seg)
    ids = np.unique(seg)[1:]
    ys, xs = np.nonzero(seg == ids[0])
    ann[ys[0], xs[0]] = 1
    ys, xs = np.nonzero(seg == ids[1])
    ann[ys[0], xs[0]] = 2
    viewer.layers["annotations"].data = ann

    annotator = state.annotator
    pred = annotator.train_and_predict()
    assert pred is not None and pred.shape == seg.shape
    assert set(np.unique(pred)) - {0} <= {1, 2}
    assert viewer.layers["prediction"].data.max() >= 1

    # export through the widget
    rf_path = str(tmp_path / "rf.pkl")
    annotator._widgets["export"].set_param("export_path", rf_path)
    annotator.export_rf()
    with open(rf_path, "rb") as f:
        rf = pickle.load(f)
    assert hasattr(rf, "predict")


def test_image_series_object_classifier_gui(fresh_state, monkeypatch, tiny_sam, tmp_path):
    from micro_sam_tpu.sam_annotator.object_classifier import (
        image_series_object_classifier,
    )
    from micro_sam_tpu.sample_data import synthetic_data

    _tiny_get_sam_model(monkeypatch, tiny_sam)
    pairs = [synthetic_data(shape=(128, 128), seed=95 + i, n_objects=3)
             for i in range(2)]
    images = [p[0] for p in pairs]
    segs = [p[1].astype("uint32") for p in pairs]
    out = str(tmp_path / "clf_out")

    viewer = FakeViewer()
    ret = image_series_object_classifier(
        images, segs, out, model_type="vit_b", viewer=viewer, return_viewer=True)
    assert ret is viewer

    # label one object on the first image, then advance
    ann = np.zeros_like(segs[0])
    oid = np.unique(segs[0])[1]
    ys, xs = np.nonzero(segs[0] == oid)
    ann[ys[0], xs[0]] = 1
    viewer.layers["annotations"].data = ann
    viewer.press("n")
    assert os.path.exists(os.path.join(out, "prediction_00000.tif"))
    # the second image is now active
    np.testing.assert_array_equal(viewer.layers["segmentation"].data, segs[1])


def test_annotator_3d_stack(fresh_state, monkeypatch, tiny_sam):
    """Full 3d annotator assembly on a FakeViewer: volumetric layers, slice
    segmentation via the keybinding, nd projection via Shift-S, commit."""
    from micro_sam_tpu.sam_annotator.annotator_3d import annotator_3d
    from micro_sam_tpu.sam_annotator._annotator import ANNOTATOR_LAYERS
    from micro_sam_tpu.predictor import SamPredictor
    from micro_sam_tpu.sample_data import synthetic_data
    from micro_sam_tpu.util import precompute_image_embeddings

    _tiny_get_sam_model(monkeypatch, tiny_sam)
    image2d, _ = synthetic_data(shape=(128, 128), seed=77, n_objects=2)
    volume = np.stack([image2d] * 3)

    state = fresh_state
    state.image_shape = volume.shape
    predictor = SamPredictor(tiny_sam)
    emb = precompute_image_embeddings(predictor, volume, ndim=3, verbose=False)
    state.predictor = predictor
    state.image_embeddings = emb

    viewer = FakeViewer()
    ret = annotator_3d(volume, embedding_path=emb, model_type="vit_b",
                       viewer=viewer, return_viewer=True)
    assert ret is viewer
    for name in ANNOTATOR_LAYERS:
        assert name in viewer.layers
    assert viewer.layers["current_object"].data.shape == volume.shape
    assert set(state.widgets) >= {"segment", "segment_nd", "autosegment",
                                  "commit", "clear"}

    # segment the middle slice from a point prompt
    viewer.dims.point = (1, 0, 0)
    pts = viewer.layers["point_prompts"]
    pts.data = np.array([[1.0, 64.0, 64.0]])
    pts.properties = {"label": np.array(["positive"], dtype=object)}
    viewer.press("s")
    seg = viewer.layers["current_object"].data
    assert seg[1].max() >= 1
    assert seg[0].max() == 0  # only the current slice segmented

    # project through the volume (Shift-S -> segment_nd)
    viewer.press("Shift-S")
    seg = viewer.layers["current_object"].data
    assert (seg > 0).any(axis=(1, 2)).sum() >= 2  # reached other slices

    # commit
    viewer.press("c")
    assert viewer.layers["committed_objects"].data.max() >= 1
    assert viewer.layers["current_object"].data.max() == 0


def test_annotator_tracking_stack(fresh_state, monkeypatch, tiny_sam):
    """Tracking annotator assembly + interaction: frame segmentation from a
    track prompt, then projection through the timeseries via Shift-S."""
    from micro_sam_tpu.sam_annotator.annotator_tracking import annotator_tracking
    from micro_sam_tpu.predictor import SamPredictor
    from micro_sam_tpu.sample_data import synthetic_data
    from micro_sam_tpu.util import precompute_image_embeddings

    _tiny_get_sam_model(monkeypatch, tiny_sam)
    frame, _ = synthetic_data(shape=(128, 128), seed=88, n_objects=2)
    timeseries = np.stack([frame] * 3)

    state = fresh_state
    state.image_shape = timeseries.shape
    predictor = SamPredictor(tiny_sam)
    emb = precompute_image_embeddings(predictor, timeseries, ndim=3, verbose=False)
    state.predictor = predictor
    state.image_embeddings = emb

    viewer = FakeViewer()
    ret = annotator_tracking(timeseries, embedding_path=emb, model_type="vit_b",
                             viewer=viewer, return_viewer=True)
    assert ret is viewer
    assert state.current_track_id == 1
    assert "tracking" in state.widgets

    # a positive track prompt on frame 0
    viewer.dims.point = (0, 0, 0)
    pts = viewer.layers["point_prompts"]
    pts.data = np.array([[0.0, 64.0, 64.0]])
    pts.properties = {
        "label": np.array(["positive"], dtype=object),
        "track_id": np.array(["1"], dtype=object),
        "state": np.array(["track"], dtype=object),
    }
    viewer.press("s")
    seg = viewer.layers["current_object"].data
    assert seg[0].max() == 1  # frame written under the current track id

    # track through all frames
    viewer.press("Shift-S")
    seg = viewer.layers["current_object"].data
    tracked_frames = (seg == 1).any(axis=(1, 2)).sum()
    assert tracked_frames >= 2, f"tracked only {tracked_frames} frames"
