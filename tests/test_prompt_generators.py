"""Prompt generator tests (reference test_prompt_generators.py)."""
import numpy as np
import pytest


@pytest.fixture()
def object_mask():
    from micro_sam_tpu.sample_data import synthetic_data
    _, seg = synthetic_data(shape=(128, 128), seed=3, n_objects=3)
    return seg


def test_point_and_box_prompt_generator(object_mask):
    from micro_sam_tpu.prompt_generators import PointAndBoxPromptGenerator
    from micro_sam_tpu.util import get_centers_and_bounding_boxes

    centers, bboxes = get_centers_and_bounding_boxes(object_mask)
    ids = np.unique(object_mask)[1:]
    masks = np.stack([object_mask == i for i in ids])[:, None].astype(np.float32)
    boxes = [
        (bboxes[int(i)][0][0], bboxes[int(i)][1][0], bboxes[int(i)][0][1], bboxes[int(i)][1][1])
        for i in ids
    ]
    center_list = [centers[int(i)] for i in ids]

    gen = PointAndBoxPromptGenerator(2, 3, dilation_strength=4,
                                     get_point_prompts=True, get_box_prompts=True,
                                     rng=np.random.RandomState(0))
    coords, labels, gen_boxes, _ = gen(masks, boxes, center_list)
    assert coords.shape == (len(ids), 5, 2)
    assert labels.shape == (len(ids), 5)
    assert (labels[:, :2] == 1).all() and (labels[:, 2:] == 0).all()
    assert gen_boxes.shape == (len(ids), 4)

    # positive points actually inside the objects (xy order!)
    for k, oid in enumerate(ids):
        for p in range(2):
            x, y = coords[k, p]
            assert object_mask[int(y), int(x)] == oid

    # box-only mode
    gen = PointAndBoxPromptGenerator(0, 0, 0, get_point_prompts=False, get_box_prompts=True)
    coords, labels, gen_boxes, _ = gen(masks, boxes)
    assert coords is None and labels is None
    assert gen_boxes.shape == (len(ids), 4)

    with pytest.raises(ValueError):
        PointAndBoxPromptGenerator(1, 0, 0, get_point_prompts=False, get_box_prompts=False)


def test_iterative_prompt_generator(object_mask):
    from micro_sam_tpu.prompt_generators import IterativePromptGenerator

    ids = np.unique(object_mask)[1:]
    gt = np.stack([object_mask == i for i in ids])[:, None].astype(np.float32)
    # prediction: shifted version -> false pos and false neg regions exist
    pred = np.roll(gt, shift=3, axis=-1)

    gen = IterativePromptGenerator(rng=np.random.RandomState(0))
    coords, labels, _, _ = gen(gt, pred)
    assert coords.shape == (len(ids), 2, 2)
    assert labels.shape == (len(ids), 2)
    assert (labels[:, 0] == 1).all() and (labels[:, 1] == 0).all()

    # positive point lies in the false-negative region (gt & ~pred), xy order
    for k in range(len(ids)):
        x, y = coords[k, 0]
        assert gt[k, 0, int(y), int(x)] == 1

    # perfect prediction: falls back to overlap / ring sampling without error
    coords, labels, _, _ = gen(gt, gt)
    assert coords.shape == (len(ids), 2, 2)

    # 3d path
    gt3d = np.stack([gt[:, 0]] * 2, axis=1)[:, None]  # (N, 1, 2, H, W)
    pred3d = np.roll(gt3d, 2, axis=-1)
    coords, labels, _, _ = gen(gt3d, pred3d)
    assert coords.shape == (len(ids), 2, 3)


@pytest.mark.slow
def test_sam_3d_wrapper():
    import jax
    from micro_sam_tpu.models.sam import SamConfig, init_sam_params, Sam
    from micro_sam_tpu.models.sam_3d_wrapper import Sam3DWrapper, SimpleSam3DWrapper

    cfg = SamConfig(model_type="vit_b", embed_dim=64, depth=2, num_heads=2,
                    global_attn_indexes=(1,), img_size=128)
    sam = Sam(cfg, init_sam_params(jax.random.PRNGKey(0), cfg))

    wrapper = Sam3DWrapper(sam, d_size=2)
    vol = np.random.RandomState(0).rand(1, 2, 128, 128, 3).astype(np.float32) * 255
    import jax.numpy as jnp
    out = jax.jit(wrapper.__call__)(wrapper.params, jnp.asarray(vol))
    assert out.shape[:2] == (1, 2)
    assert np.isfinite(np.asarray(out)).all()

    # zero-init adapters: forward equals the base model per slice
    base_out = jax.jit(wrapper.__call__)(sam.params | {
        "image_encoder": wrapper.params["image_encoder"]}, jnp.asarray(vol))
    assert np.allclose(np.asarray(out), np.asarray(base_out), atol=1e-5)

    simple = SimpleSam3DWrapper(sam, out_channels=1)
    out = jax.jit(simple.__call__)(sam.params, jnp.asarray(vol))
    assert out.shape == (1, 2, 8, 8, 1)
