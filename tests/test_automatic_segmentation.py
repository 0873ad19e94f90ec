"""Tests for the automatic segmentation driver and state precompute
(reference test/test_automatic_segmentation.py strategy)."""
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_predictor_state():
    import jax
    from micro_sam_tpu.models.sam import SamConfig, init_sam_params, Sam
    from micro_sam_tpu.predictor import SamPredictor
    from micro_sam_tpu.models.unetr import init_unetr_decoder

    cfg = SamConfig(model_type="vit_b", embed_dim=64, depth=2, num_heads=2,
                    global_attn_indexes=(1,), img_size=128)
    params = init_sam_params(jax.random.PRNGKey(0), cfg)
    predictor = SamPredictor(Sam(cfg, params))
    decoder_state = init_unetr_decoder(jax.random.PRNGKey(5), embed_dim=256, out_channels=3)
    state = {"model_state": params, "decoder_state": decoder_state}
    return predictor, state


def test_get_predictor_and_segmenter(tiny_predictor_state):
    from micro_sam_tpu.automatic_segmentation import get_predictor_and_segmenter
    from micro_sam_tpu import instance_segmentation as iseg

    predictor, state = tiny_predictor_state
    p, seg = get_predictor_and_segmenter(
        "vit_b", predictor=predictor, state={"model_state": state["model_state"]}
    )
    assert isinstance(seg, iseg.AutomaticMaskGenerator)

    p, seg = get_predictor_and_segmenter("vit_b", predictor=predictor, state=state)
    assert isinstance(seg, iseg.InstanceSegmentationWithDecoder)

    p, seg = get_predictor_and_segmenter(
        "vit_b", predictor=predictor, state=state, segmentation_mode="apg", is_tiled=False
    )
    assert isinstance(seg, iseg.AutomaticPromptGenerator)

    with pytest.raises(RuntimeError):
        get_predictor_and_segmenter(
            "vit_b", predictor=predictor, state={"model_state": state["model_state"]},
            segmentation_mode="ais",
        )


def test_automatic_instance_segmentation_2d(tiny_predictor_state, tmp_path):
    from micro_sam_tpu.automatic_segmentation import (
        automatic_instance_segmentation, get_predictor_and_segmenter,
    )
    from micro_sam_tpu.sample_data import synthetic_data

    predictor, state = tiny_predictor_state
    _, segmenter = get_predictor_and_segmenter("vit_b", predictor=predictor, state=state)

    image, _ = synthetic_data(shape=(128, 128), seed=13, n_objects=4)
    out_path = str(tmp_path / "seg.tif")
    result = automatic_instance_segmentation(
        predictor, segmenter, image, output_path=out_path, verbose=False, min_size=5,
    )
    assert result.shape == image.shape
    assert os.path.exists(out_path)

    # skip-existing: second call returns None without recomputation
    assert automatic_instance_segmentation(
        predictor, segmenter, image, output_path=out_path, verbose=False
    ) is None


def test_automatic_instance_segmentation_3d(tiny_predictor_state, tmp_path):
    from micro_sam_tpu.automatic_segmentation import (
        automatic_instance_segmentation, get_predictor_and_segmenter,
    )
    from micro_sam_tpu.sample_data import synthetic_data

    predictor, state = tiny_predictor_state
    _, segmenter = get_predictor_and_segmenter("vit_b", predictor=predictor, state=state)

    image2d, _ = synthetic_data(shape=(128, 128), seed=17, n_objects=3)
    volume = np.stack([image2d] * 3)
    result = automatic_instance_segmentation(
        predictor, segmenter, volume, verbose=False, min_size=5,
    )
    assert result.shape == volume.shape


def test_precompute_state_amg(tiny_predictor_state, tmp_path):
    from micro_sam_tpu.precompute_state import cache_amg_state
    from micro_sam_tpu.util import precompute_image_embeddings
    from micro_sam_tpu.sample_data import synthetic_data

    predictor, _ = tiny_predictor_state
    image, _ = synthetic_data(shape=(128, 128), seed=19, n_objects=3)
    emb = precompute_image_embeddings(predictor, image, verbose=False)

    amg = cache_amg_state(predictor, image, emb, str(tmp_path), verbose=False,
                          points_per_side=4)
    assert amg.is_initialized
    assert os.path.exists(tmp_path / "amg_state" / "state.pkl")

    # loads from cache
    amg2 = cache_amg_state(predictor, image, emb, str(tmp_path), verbose=False,
                           points_per_side=4)
    assert amg2.is_initialized


def test_precompute_state_is(tiny_predictor_state, tmp_path):
    from micro_sam_tpu.precompute_state import cache_is_state
    from micro_sam_tpu.instance_segmentation import get_decoder
    from micro_sam_tpu.util import precompute_image_embeddings
    from micro_sam_tpu.sample_data import synthetic_data

    predictor, state = tiny_predictor_state
    decoder = get_decoder(decoder_state=state["decoder_state"])
    image, _ = synthetic_data(shape=(128, 128), seed=23, n_objects=3)
    emb = precompute_image_embeddings(predictor, image, verbose=False)

    seg = cache_is_state(predictor, decoder, image, emb, str(tmp_path), verbose=False)
    assert seg.is_initialized
    assert os.path.exists(tmp_path / "is_state.h5")
    seg2 = cache_is_state(predictor, decoder, image, emb, str(tmp_path), verbose=False)
    assert seg2.is_initialized


def test_split_kwargs():
    from micro_sam_tpu.automatic_segmentation import _split_kwargs

    init_kwargs, gen_kwargs = _split_kwargs(
        ["--points_per_side", "16", "--pred_iou_thresh", "0.7", "--output_mode", "binary_mask"]
    )
    assert init_kwargs == {"points_per_side": 16}
    assert gen_kwargs == {"pred_iou_thresh": 0.7, "output_mode": "binary_mask"}
