"""Tests for prompt_based_segmentation and batched inference."""
import numpy as np
import pytest


@pytest.fixture()
def initialized_predictor(tiny_predictor, synthetic_image):
    from micro_sam_tpu.util import precompute_image_embeddings, set_precomputed
    image, seg = synthetic_image
    emb = precompute_image_embeddings(tiny_predictor, image, verbose=False)
    set_precomputed(tiny_predictor, emb)
    return tiny_predictor, emb, image, seg


def test_segment_from_points(initialized_predictor):
    from micro_sam_tpu.prompt_based_segmentation import segment_from_points
    predictor, emb, image, seg = initialized_predictor
    ys, xs = np.where(seg == 1)
    points = np.array([[ys.mean(), xs.mean()]])
    labels = np.array([1])
    mask = segment_from_points(predictor, points, labels, image_embeddings=emb)
    assert mask.shape == (1,) + image.shape
    assert mask.dtype == bool


def test_segment_from_box(initialized_predictor):
    from micro_sam_tpu.prompt_based_segmentation import segment_from_box
    predictor, emb, image, seg = initialized_predictor
    mask = segment_from_box(predictor, np.array([10.0, 10.0, 80.0, 80.0]), image_embeddings=emb)
    assert mask.shape == (1,) + image.shape


def test_segment_from_mask(initialized_predictor):
    from micro_sam_tpu.prompt_based_segmentation import segment_from_mask
    predictor, emb, image, seg = initialized_predictor
    mask0 = (seg == 1)
    for kwargs in [
        dict(use_box=True, use_mask=True),
        dict(use_box=False, use_mask=True),
        dict(use_box=True, use_mask=False),
        dict(use_box=True, use_mask=True, use_points=True),
        dict(use_box=False, use_mask=False, use_points=True, use_single_point=True),
    ]:
        mask = segment_from_mask(predictor, mask0, image_embeddings=emb, **kwargs)
        assert mask.shape == (1,) + image.shape, f"{kwargs}"


def test_segment_from_box_and_points(initialized_predictor):
    from micro_sam_tpu.prompt_based_segmentation import segment_from_box_and_points
    predictor, emb, image, seg = initialized_predictor
    mask = segment_from_box_and_points(
        predictor, np.array([10.0, 10.0, 80.0, 80.0]),
        np.array([[40.0, 40.0]]), np.array([1]), image_embeddings=emb,
    )
    assert mask.shape == (1,) + image.shape


def test_tiled_prompt_segmentation(tiny_predictor, tmp_path):
    from micro_sam_tpu.util import precompute_image_embeddings
    from micro_sam_tpu.prompt_based_segmentation import segment_from_points, segment_from_box

    image = (np.random.RandomState(5).rand(400, 300) * 255).astype(np.uint8)
    emb = precompute_image_embeddings(
        tiny_predictor, image, str(tmp_path / "emb.zarr"),
        tile_shape=(200, 200), halo=(20, 20), verbose=False,
    )
    mask = segment_from_points(
        tiny_predictor, np.array([[250.0, 120.0]]), np.array([1]), image_embeddings=emb
    )
    assert mask.shape == (1, 400, 300)
    mask = segment_from_box(
        tiny_predictor, np.array([210.0, 40.0, 380.0, 160.0]), image_embeddings=emb
    )
    assert mask.shape == (1, 400, 300)


def test_batched_inference(initialized_predictor):
    from micro_sam_tpu.inference import batched_inference
    predictor, emb, image, seg = initialized_predictor

    ids = np.unique(seg)[1:][:4]
    points, boxes = [], []
    for oid in ids:
        ys, xs = np.where(seg == oid)
        points.append([[xs.mean(), ys.mean()]])
        boxes.append([xs.min(), ys.min(), xs.max(), ys.max()])
    points = np.array(points)
    labels = np.ones((len(ids), 1), dtype=np.int32)
    boxes = np.array(boxes, dtype=np.float64)

    segm = batched_inference(predictor, image=None, batch_size=2, boxes=boxes)
    assert segm.shape == image.shape
    assert segm.dtype == np.uint32

    records = batched_inference(
        predictor, image=None, batch_size=3, points=points, point_labels=labels,
        multimasking=True, return_instance_segmentation=False,
    )
    assert len(records) == len(ids)
    for rec in records:
        assert rec["segmentation"].shape == image.shape
        assert 0 <= rec["stability_score"] <= 1.0

    with pytest.raises(ValueError):
        batched_inference(predictor, image=None, batch_size=2)
    with pytest.raises(ValueError):
        batched_inference(predictor, image=None, batch_size=2, points=points)


def test_amg_utils_rle():
    from micro_sam_tpu.ops.amg_utils import mask_to_rle, rle_to_mask, area_from_rle

    rng = np.random.RandomState(0)
    for _ in range(5):
        mask = rng.rand(17, 23) > 0.6
        rle = mask_to_rle(mask)
        assert rle["size"] == [17, 23]
        rec = rle_to_mask(rle)
        assert np.array_equal(rec, mask)
        assert area_from_rle(rle) == mask.sum()

    empty = np.zeros((5, 5), dtype=bool)
    assert np.array_equal(rle_to_mask(mask_to_rle(empty)), empty)
    full = np.ones((5, 5), dtype=bool)
    assert np.array_equal(rle_to_mask(mask_to_rle(full)), full)


def test_amg_utils_mask_to_box():
    import jax.numpy as jnp
    from micro_sam_tpu.ops.amg_utils import batched_mask_to_box

    masks = np.zeros((3, 10, 12), dtype=bool)
    masks[0, 2:5, 3:7] = True
    masks[1, 0:10, 0:12] = True
    boxes = np.asarray(batched_mask_to_box(jnp.asarray(masks)))
    assert boxes[0].tolist() == [3, 2, 7, 5]
    assert boxes[1].tolist() == [0, 0, 12, 10]
    assert boxes[2].tolist() == [0, 0, 0, 0]


def test_nms():
    from micro_sam_tpu.ops.amg_utils import batched_nms

    boxes = np.array([
        [0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60],
    ], dtype=np.float64)
    scores = np.array([0.9, 0.8, 0.7])
    keep = batched_nms(boxes, scores, None, iou_threshold=0.5)
    assert keep.tolist() == [0, 2]


def test_mask_data_to_segmentation(synthetic_image):
    from micro_sam_tpu.util import mask_data_to_segmentation
    _, seg = synthetic_image
    ids = np.unique(seg)[1:][:5]
    records = [
        {"segmentation": seg == oid, "area": int((seg == oid).sum())} for oid in ids
    ]
    out = mask_data_to_segmentation(records, shape=seg.shape, min_object_size=0)
    assert out.shape == seg.shape
    assert len(np.unique(out)) == len(ids) + 1
