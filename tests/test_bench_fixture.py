"""The AMG bench fixture (tests/fixtures/bench_sam_tiny1024.npz) is a SAM
finetuned on synthetic cells (development/train_bench_decoder.py) whose
prompt-encoder/mask-decoder run the production decode program (the decoder
geometry is encoder-independent). These tests pin the contract bench.py
relies on: the fixture loads into a working model and its masks are
localized and realistically sized — the property that makes the AMG bench
measure the compact crop-transfer path instead of full-frame fallbacks."""
import os
import sys

import numpy as np
import pytest

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "bench_sam_tiny1024.npz")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


@pytest.mark.skipif(not os.path.exists(FIXTURE), reason="fixture not built")
def test_bench_fixture_loads():
    """Fast contract: the fixture deserializes into the production decode
    geometry with finite trained params."""
    from bench import _load_bench_fixture
    cfg, params = _load_bench_fixture(FIXTURE)
    assert cfg.img_size == 1024
    assert cfg.embedding_size == 64          # production decode geometry
    leaves = []

    def rec(n):
        if isinstance(n, dict):
            [rec(v) for k, v in n.items() if not k.startswith("_")]
        elif isinstance(n, (list, tuple)):
            [rec(v) for v in n]
        else:
            leaves.append(np.asarray(n))
    rec(params)
    assert all(np.isfinite(a).all() for a in leaves if a.dtype.kind == "f")


@pytest.mark.slow  # 1024-px CPU encode+decode, ~45 s
@pytest.mark.skipif(not os.path.exists(FIXTURE), reason="fixture not built")
def test_bench_fixture_localizes():
    import jax.numpy as jnp
    from bench import _load_bench_fixture
    from micro_sam_tpu.models.sam import Sam, preprocess
    from micro_sam_tpu.predictor import SamPredictor, _AmgDecoder
    from micro_sam_tpu.sample_data import synthetic_data
    from micro_sam_tpu.ops.amg_utils import build_point_grid

    cfg, params = _load_bench_fixture(FIXTURE)
    sam = Sam(cfg, params)

    image, _ = synthetic_data(shape=(1024, 1024), seed=200, n_objects=20,
                              radius_range=(30, 110))
    px = jnp.asarray(np.stack([image] * 3, -1), jnp.float32)[None]
    feats = sam.encode_image(params, preprocess(px, cfg.img_size))
    assert feats.shape == (1, 64, 64, 256)

    predictor = SamPredictor(sam)
    predictor.set_features(feats, (1024, 1024), (1024, 1024))
    grid = (build_point_grid(8) * 1024).astype(np.float32)
    dec = _AmgDecoder(predictor, mask_threshold=0.0)
    packed, iou, stab, boxes = dec(grid)

    # trained iou head: confident predictions, meaningful filtering range
    assert float(np.median(iou)) > 0.5
    # localized masks: median bbox fits the 256-px crop-transfer window
    bw = (boxes[..., 2] - boxes[..., 0]).ravel()
    bh = (boxes[..., 3] - boxes[..., 1]).ravel()
    assert float(np.median(bw)) < 256 and float(np.median(bh)) < 256
    # realistic area band (cells ~0.3-4% of frame; bench needs >= 0.01 mean
    # over iou-filtered masks — unfiltered median is the stable proxy here)
    areas = np.unpackbits(packed, axis=-1).sum(axis=(1, 2)) / float(1024 * 1024)
    good = areas[np.asarray(iou).ravel() > 0.5]
    assert 0.001 < float(np.median(good)) < 0.2
