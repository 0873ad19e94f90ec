"""Model-stack tests: shapes, jit-ability, torch checkpoint round-trip.

Mirrors the reference's test strategy (SURVEY.md §4): tiny CPU-runnable models,
shape contracts, and conversion correctness.
"""
import numpy as np
import pytest


@pytest.mark.slow
def test_encoder_shapes(tiny_sam):
    import jax.numpy as jnp
    from micro_sam_tpu.models.sam import preprocess

    x = np.random.RandomState(0).rand(2, 200, 256, 3).astype(np.float32) * 255
    px = preprocess(jnp.asarray(x), tiny_sam.config.img_size)
    assert px.shape == (2, 256, 256, 3)
    emb = tiny_sam.encode_image(tiny_sam.params, px)
    assert emb.shape == (2, 16, 16, 256)
    assert np.isfinite(np.asarray(emb)).all()


def test_decoder_shapes(tiny_sam):
    import jax
    import jax.numpy as jnp

    emb = jnp.zeros((3, 16, 16, 256))
    pts = jnp.zeros((3, 2, 2))
    lbl = jnp.array([[1, -1]] * 3)
    masks, iou = jax.jit(tiny_sam.decode_masks)(tiny_sam.params, emb, pts, lbl)
    assert masks.shape == (3, 4, 64, 64)
    assert iou.shape == (3, 4)
    assert np.isfinite(np.asarray(masks)).all()


def test_window_partition_roundtrip():
    import jax.numpy as jnp
    from micro_sam_tpu.models.image_encoder import window_partition, window_unpartition

    x = jnp.arange(2 * 10 * 10 * 3, dtype=jnp.float32).reshape(2, 10, 10, 3)
    w, pad_hw = window_partition(x, 4)
    assert w.shape == (2 * 9, 4, 4, 3)
    y = window_unpartition(w, 4, pad_hw, (10, 10))
    assert np.allclose(np.asarray(x), np.asarray(y))


def test_conv_transpose_matches_torch():
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp
    from micro_sam_tpu.models import common as cm

    w_t = torch.randn(6, 4, 2, 2)
    b_t = torch.randn(4)
    x_t = torch.randn(1, 6, 5, 5)
    ref = torch.nn.functional.conv_transpose2d(x_t, w_t, b_t, stride=2).numpy()
    p = {"w": jnp.asarray(w_t.numpy().transpose(2, 3, 1, 0)), "b": jnp.asarray(b_t.numpy())}
    y = cm.conv_transpose2d(p, jnp.asarray(x_t.numpy().transpose(0, 2, 3, 1)), stride=2)
    assert np.allclose(np.asarray(y).transpose(0, 3, 1, 2), ref, atol=1e-5)


def test_conv_transpose_bf16_drift_bound():
    """The kernel==stride fast path multiplies in the operand dtype (bf16 on
    bf16 paths) with f32 accumulation; pin the bf16-vs-f32 drift so the
    upscaler/UNETR deconv tolerance is a tested contract, not an assumption."""
    import jax.numpy as jnp
    from micro_sam_tpu.models import common as cm

    rng = np.random.RandomState(0)
    # UNETR-deconv-like shape: 2x2 kernel == stride, wide channels
    w = rng.randn(2, 2, 32, 64).astype(np.float32) / 8.0
    b = rng.randn(32).astype(np.float32) / 8.0
    x = rng.randn(2, 16, 16, 64).astype(np.float32)
    p32 = {"w": jnp.asarray(w), "b": jnp.asarray(b)}
    y32 = np.asarray(cm.conv_transpose2d(p32, jnp.asarray(x), stride=2))
    y16 = np.asarray(cm.conv_transpose2d(
        p32, jnp.asarray(x, jnp.bfloat16), stride=2)).astype(np.float32)
    scale = np.abs(y32).max()
    drift = np.abs(y16 - y32).max() / scale
    # bf16 has ~3 decimal digits; inputs+weights rounded once each, f32 accum
    assert drift < 2e-2, drift


def test_torch_checkpoint_conversion_roundtrip(tmp_path, tiny_sam):
    """export -> torch state dict -> convert back -> identical forward."""
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp
    from micro_sam_tpu.models.convert import (
        convert_sam_state_dict, export_torch_state_dict, normalize_state_dict,
    )

    sd = export_torch_state_dict(tiny_sam.params, tiny_sam.config)
    sd_t = {f"sam.{k}": torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}
    state = {"model_state": sd_t}

    sam_state, decoder_state = normalize_state_dict(state)
    assert decoder_state is None
    cfg, params = convert_sam_state_dict(sam_state, tiny_sam.config)

    emb = jnp.ones((1, 16, 16, 256)) * 0.1
    pts = jnp.array([[[100.0, 120.0], [0.0, 0.0]]])
    lbl = jnp.array([[1, -1]])
    m1, i1 = tiny_sam.decode_masks(tiny_sam.params, emb, pts, lbl)
    m2, i2 = tiny_sam.decode_masks(params, emb, pts, lbl)
    assert np.allclose(np.asarray(m1), np.asarray(m2), atol=1e-5)
    assert np.allclose(np.asarray(i1), np.asarray(i2), atol=1e-5)


def test_predictor_point_and_box(tiny_predictor, synthetic_image):
    image, _ = synthetic_image
    from micro_sam_tpu.util import _to_image

    tiny_predictor.set_image(_to_image(image))
    masks, iou, low_res = tiny_predictor.predict(
        point_coords=np.array([[128.0, 128.0]]), point_labels=np.array([1]),
    )
    assert masks.shape == (3, 256, 256)
    assert iou.shape == (3,)
    assert low_res.shape == (3, 64, 64)
    assert masks.dtype == bool

    masks, iou, _ = tiny_predictor.predict(box=np.array([50.0, 50.0, 120.0, 120.0]),
                                           multimask_output=False)
    assert masks.shape == (1, 256, 256)


def test_predictor_batched_prompts(tiny_predictor, synthetic_image):
    image, _ = synthetic_image
    from micro_sam_tpu.util import _to_image

    tiny_predictor.set_image(_to_image(image))
    boxes = np.array([[10.0, 10.0, 60.0, 60.0], [100.0, 100.0, 150.0, 150.0]])
    masks, iou, low = tiny_predictor.predict(box=boxes, multimask_output=False)
    assert masks.shape == (2, 1, 256, 256)
    assert iou.shape == (2, 1)


@pytest.mark.slow
def test_tiny_vit_vit_t():
    """vit_t (TinyViT) builds and runs through the predictor."""
    import numpy as np
    from micro_sam_tpu.models.build_sam import build_sam
    from micro_sam_tpu.predictor import SamPredictor
    from dataclasses import replace

    sam = build_sam("vit_t")
    sam.config = replace(sam.config, img_size=256)  # small input for CPU speed
    # re-init with the small size: TinyViT is resolution-agnostic, embeddings
    # change spatial dims only
    predictor = SamPredictor(sam)
    image = (np.random.RandomState(0).rand(200, 256, 3) * 255).astype(np.uint8)
    predictor.set_image(image)
    assert predictor.features.shape == (1, 16, 16, 256)
    masks, iou, low = predictor.predict(
        point_coords=np.array([[100.0, 100.0]]), point_labels=np.array([1])
    )
    assert masks.shape == (3, 200, 256)


@pytest.mark.slow
def test_windowed_run_layout_equivalence():
    """The run-fused window layout must match per-block partitioning exactly."""
    import jax
    import jax.numpy as jnp
    from micro_sam_tpu.models import image_encoder as ie
    from micro_sam_tpu.models import common as cm

    # grid 10, window 4 -> padding path exercised
    key = jax.random.PRNGKey(0)
    dim, heads, depth = 32, 2, 3
    params = ie.init_image_encoder(
        key, img_size=160, patch_size=16, embed_dim=dim, depth=depth,
        num_heads=heads, window_size=4, global_attn_indexes=(2,),
    )
    # randomize rel-pos so the bias path is covered
    for b in params["blocks"]:
        for k in ("rel_pos_h", "rel_pos_w"):
            b["attn"][k] = jax.random.normal(jax.random.fold_in(key, hash(k) % 100),
                                             b["attn"][k].shape) * 0.1

    x = jax.random.normal(jax.random.fold_in(key, 7), (1, 160, 160, 3))

    out_fused = ie.apply_image_encoder(
        params, x, num_heads=heads, window_size=4, global_attn_indexes=(2,),
    )

    # reference path: per-block partitioning
    ref = cm.conv2d(params["patch_embed"], x, stride=16, padding="VALID")
    ref = ref + params["pos_embed"].astype(ref.dtype)
    for i, bp in enumerate(params["blocks"]):
        ws = 0 if i == 2 else 4
        ref = ie.apply_block(bp, ref, heads, ws)
    ref = cm.conv2d(params["neck"]["conv1"], ref, stride=1, padding="VALID")
    ref = cm.layer_norm_2d(params["neck"]["ln1"], ref)
    ref = cm.conv2d(params["neck"]["conv2"], ref, stride=1, padding=1)
    ref = cm.layer_norm_2d(params["neck"]["ln2"], ref)

    assert np.allclose(np.asarray(out_fused), np.asarray(ref), atol=1e-5), \
        np.abs(np.asarray(out_fused) - np.asarray(ref)).max()


def test_vit_t_export_roundtrip():
    """vit_t (TinyViT) torch export -> reimport gives back identical params
    (unblocks export_custom_sam_model / bioimageio packaging for vit_t)."""
    import jax
    import numpy as np
    from micro_sam_tpu.models.build_sam import get_config
    from micro_sam_tpu.models.convert import (
        convert_sam_state_dict, export_torch_state_dict)
    from micro_sam_tpu.models.sam import init_sam_params

    cfg = get_config("vit_t")
    params = init_sam_params(jax.random.PRNGKey(11), cfg)
    sd = export_torch_state_dict(params, cfg)
    assert any(k.startswith("image_encoder.layers.1.blocks.0.attn.qkv")
               for k in sd), sorted(sd)[:5]

    cfg2, params2 = convert_sam_state_dict(sd, cfg)
    flat1 = jax.tree.leaves(params["image_encoder"])
    flat2 = jax.tree.leaves(params2["image_encoder"])
    assert len(flat1) == len(flat2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # decoder/prompt-encoder shared path round-trips too
    for a, b in zip(jax.tree.leaves(params["mask_decoder"]),
                    jax.tree.leaves(params2["mask_decoder"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
