"""Headless annotator-core tests: state, prompt extraction, nd drivers, commit."""
import numpy as np
import pytest


@pytest.fixture()
def fresh_state():
    from micro_sam_tpu.sam_annotator._state import AnnotatorState
    state = AnnotatorState()
    state.reset_state()
    yield state
    state.reset_state()


def test_state_singleton(fresh_state):
    from micro_sam_tpu.sam_annotator._state import AnnotatorState
    s2 = AnnotatorState()
    assert s2 is fresh_state
    assert not fresh_state.initialized_for_interactive_segmentation()
    assert not fresh_state.initialized_for_tracking()


def test_point_layer_to_prompts():
    from micro_sam_tpu.sam_annotator.util import PointData, point_layer_to_prompts

    layer = PointData(
        data=np.array([[10.0, 20.0], [30.0, 40.0]]),
        properties={"label": np.array(["positive", "negative"])},
    )
    points, labels = point_layer_to_prompts(layer)
    assert points.shape == (2, 2)
    assert labels.tolist() == [1, 0]

    # stop annotation: single negative point
    stop = PointData(
        data=np.array([[5.0, 5.0]]), properties={"label": np.array(["negative"])}
    )
    assert point_layer_to_prompts(stop) is None

    # 3d with slice filter
    layer3d = PointData(
        data=np.array([[0, 1.0, 2.0], [1, 3.0, 4.0], [1, 5.0, 6.0]]),
        properties={"label": np.array(["positive", "positive", "negative"])},
    )
    points, labels = point_layer_to_prompts(layer3d, i=1)
    assert points.shape == (2, 2)
    assert labels.tolist() == [1, 0]


def test_shape_layer_to_prompts():
    from micro_sam_tpu.sam_annotator.util import ShapeData, shape_layer_to_prompts

    rect = np.array([[2.0, 3.0], [2.0, 10.0], [8.0, 10.0], [8.0, 3.0]])
    poly = np.array([[1.0, 1.0], [1.0, 12.0], [12.0, 6.0]])
    layer = ShapeData(data=[rect, poly], shape_type=["rectangle", "polygon"])
    boxes, masks = shape_layer_to_prompts(layer, (16, 16))
    assert len(boxes) == 2
    assert boxes[0].tolist() == [2.0, 3.0, 8.0, 10.0]
    assert masks[0] is None
    assert masks[1] is not None and masks[1].any()


def test_prompt_segmentation_dispatch(tiny_predictor, synthetic_image):
    from micro_sam_tpu.sam_annotator.util import prompt_segmentation
    from micro_sam_tpu.util import precompute_image_embeddings

    image, seg = synthetic_image
    emb = precompute_image_embeddings(tiny_predictor, image, verbose=False)

    # points only
    out = prompt_segmentation(
        tiny_predictor, np.array([[128.0, 128.0]]), np.array([1]), [], [],
        image.shape, multiple_box_prompts=True, image_embeddings=emb,
    )
    assert out.shape == image.shape

    # boxes only (2 boxes => 2 objects)
    boxes = [np.array([10.0, 10.0, 60.0, 60.0]), np.array([100.0, 100.0, 160.0, 160.0])]
    out = prompt_segmentation(
        tiny_predictor, np.zeros((0, 2)), np.zeros(0), boxes, [None, None],
        image.shape, multiple_box_prompts=True, image_embeddings=emb,
    )
    assert set(np.unique(out)) <= {0, 1, 2}

    # no prompts -> None
    assert prompt_segmentation(
        tiny_predictor, np.zeros((0, 2)), np.zeros(0), [], [], image.shape,
        multiple_box_prompts=True, image_embeddings=emb,
    ) is None

    # batched: one object per positive point
    out = prompt_segmentation(
        tiny_predictor, np.array([[60.0, 60.0], [128.0, 128.0]]), np.array([1, 1]),
        [], [], image.shape, multiple_box_prompts=True, image_embeddings=emb,
        batched=True, previous_segmentation=np.zeros(image.shape, dtype="uint32"),
    )
    assert set(np.unique(out)) <= {0, 1, 2}


def test_segment_slices_and_nd(tiny_predictor):
    from micro_sam_tpu.sam_annotator.util import (
        PointData, ShapeData, segment_slices_with_prompts,
    )
    from micro_sam_tpu.util import precompute_image_embeddings
    from micro_sam_tpu.sample_data import synthetic_data

    image2d, _ = synthetic_data(shape=(256, 256), seed=21, n_objects=3)
    volume = np.stack([image2d] * 3)
    emb = precompute_image_embeddings(tiny_predictor, volume, ndim=3, verbose=False)

    points = PointData(
        data=np.array([[1, 128.0, 128.0]]),
        properties={"label": np.array(["positive"])},
    )
    boxes = ShapeData(data=[], shape_type=[])
    seg, slices, stop_lower, stop_upper = segment_slices_with_prompts(
        tiny_predictor, points, boxes, emb, volume.shape
    )
    assert seg.shape == volume.shape
    assert slices.tolist() == [1]
    assert not stop_lower and not stop_upper


def test_commit_segmentation():
    from micro_sam_tpu.sam_annotator._widgets import commit_segmentation

    committed = np.zeros((32, 32), dtype=np.uint32)
    committed[2:10, 2:10] = 1

    current = np.zeros_like(committed)
    current[20:30, 20:30] = 5

    out = commit_segmentation(committed, current)
    assert (out[2:10, 2:10] == 1).all()
    assert (out[20:30, 20:30] == 2).all()  # relabeled to offset+1

    # overlapping commit replaces the old object (preserve_mode="objects")
    overlapping = np.zeros_like(committed)
    overlapping[2:12, 2:12] = 9
    out2 = commit_segmentation(out, overlapping)
    assert (out2[2:12, 2:12] == out2[3, 3]).all()
    assert out2[3, 3] != 1


def test_tracking_state(fresh_state):
    import importlib
    at = importlib.import_module("micro_sam_tpu.sam_annotator.annotator_tracking")

    at._init_tracking_state(fresh_state)
    assert fresh_state.initialized_for_tracking()
    assert fresh_state.current_track_id == 1

    new_id = at.add_new_track(fresh_state)
    assert new_id == 2
    c1, c2 = at.register_division(fresh_state, parent_track=1)
    assert fresh_state.lineage[1] == [c1, c2]
    assert fresh_state.current_track_id == c1


@pytest.mark.slow
def test_annotator_entry_requires_napari(tiny_predictor, synthetic_image, tmp_path):
    """annotator_2d initializes state headless, then raises a clear error for the GUI."""
    from micro_sam_tpu.sam_annotator import annotator_2d
    from micro_sam_tpu.sam_annotator._state import AnnotatorState
    from micro_sam_tpu.util import precompute_image_embeddings

    image, _ = synthetic_image
    emb = precompute_image_embeddings(tiny_predictor, image, verbose=False)
    state = AnnotatorState()
    state.reset_state()
    with pytest.raises(RuntimeError, match="napari"):
        annotator_2d(image, embedding_path=emb, model_type="vit_b")
    state.reset_state()


def test_object_classifier_workflow(tiny_predictor, synthetic_image):
    from micro_sam_tpu.sam_annotator.object_classifier import ObjectClassifierWorkflow

    image, seg = synthetic_image
    wf = ObjectClassifierWorkflow(predictor=tiny_predictor)
    wf.set_image(image, seg)

    # annotate two objects with brush-stroke-style labels
    annotations = np.zeros_like(seg, dtype=np.uint8)
    ids = np.unique(seg)[1:]
    ys, xs = np.where(seg == ids[0])
    annotations[ys[0], xs[0]] = 1
    ys, xs = np.where(seg == ids[1])
    annotations[ys[0], xs[0]] = 2
    n = wf.add_annotations(annotations)
    assert n == 2

    pred = wf.train_and_predict()
    assert pred.shape == seg.shape
    assert set(np.unique(pred)) <= {0, 1, 2}


def test_commit_to_file(tmp_path):
    from micro_sam_tpu.sam_annotator._widgets import commit_to_file
    from micro_sam_tpu.sam_annotator.util import PointData
    from micro_sam_tpu.utils import zarr_lite
    import pytest as _pytest

    committed = np.zeros((32, 32), dtype=np.uint32)
    seg = np.zeros_like(committed)
    seg[4:12, 4:12] = 1
    points = PointData(data=np.array([[8.0, 8.0]]),
                       properties={"label": np.array(["positive"])})

    path = str(tmp_path / "commit.zarr")
    out = commit_to_file(path, committed, seg, point_prompts=points,
                         data_signature="sig-1")
    assert out.max() == 1

    f = zarr_lite.open(path, mode="r")
    assert np.array_equal(f["committed_objects"][...], out)
    assert f.attrs["commit_history"] == [{"new_ids": [1]}]
    assert "object-1" in f["prompts"]

    # second commit with a different object
    seg2 = np.zeros_like(committed)
    seg2[20:30, 20:30] = 3
    out2 = commit_to_file(path, out, seg2, data_signature="sig-1")
    assert set(np.unique(out2)) == {0, 1, 2}
    f = zarr_lite.open(path, mode="r")
    assert len(f.attrs["commit_history"]) == 2

    # signature guard
    with _pytest.raises(RuntimeError):
        commit_to_file(path, out2, seg, data_signature="other-sig")
