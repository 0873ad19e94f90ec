"""Training stack tests: converters, trainers (1-epoch smoke), PEFT.

Mirrors the reference test strategy: tiny model + synthetic data.
"""
import os

import numpy as np
import pytest


def _make_loader(n_batches=2, batch_size=1, size=128, with_decoder=False, seed=0):
    from micro_sam_tpu.sample_data import synthetic_data
    from micro_sam_tpu.training.training import PerObjectDistanceTransform

    batches = []
    trafo = PerObjectDistanceTransform()
    for i in range(n_batches):
        imgs, labs, targets = [], [], []
        for b in range(batch_size):
            image, seg = synthetic_data(shape=(size, size), seed=seed + i * 10 + b, n_objects=4)
            imgs.append(np.repeat(image[..., None], 3, axis=-1).astype(np.float32))
            labs.append(seg)
            if with_decoder:
                targets.append(trafo(seg))
        if with_decoder:
            batches.append((np.stack(imgs), np.stack(labs), np.stack(targets)))
        else:
            batches.append((np.stack(imgs), np.stack(labs)))
    return batches


@pytest.fixture(scope="module")
def tiny_trainable():
    import jax
    from micro_sam_tpu.models.sam import SamConfig, init_sam_params, Sam
    from micro_sam_tpu.training.trainable_sam import TrainableSAM

    cfg = SamConfig(model_type="vit_b", embed_dim=64, depth=2, num_heads=2,
                    global_attn_indexes=(1,), img_size=128)
    params = init_sam_params(jax.random.PRNGKey(0), cfg)
    return TrainableSAM(Sam(cfg, params))


def test_convert_to_sam_inputs():
    from micro_sam_tpu.training.util import ConvertToSamInputs
    from micro_sam_tpu.sample_data import synthetic_data

    image, seg = synthetic_data(shape=(128, 128), seed=3, n_objects=4)
    conv = ConvertToSamInputs()
    out = conv(image[None], seg[None], n_objects=3, get_points=True, get_boxes=True)
    images, gt, valid, points, labels, boxes = out
    assert images.shape == (1, 128, 128, 3)
    assert gt.shape[0] == 1 and gt.shape[1] <= 3
    assert valid.shape == gt.shape[:2]
    assert points.shape[:2] == gt.shape[:2]
    assert boxes.shape[-1] == 4
    # boxes xyxy within bounds
    assert np.all(np.asarray(boxes) >= 0) and np.all(np.asarray(boxes) <= 128)


@pytest.mark.slow
def test_sam_trainer_smoke(tiny_trainable, tmp_path):
    from micro_sam_tpu.training.sam_trainer import SamTrainer

    loader = _make_loader(n_batches=2, size=128)
    trainer = SamTrainer(
        name="test-run", train_loader=loader, val_loader=loader[:1],
        model=tiny_trainable, n_sub_iteration=2, n_objects_per_batch=3,
        save_root=str(tmp_path),
    )
    p0 = np.asarray(tiny_trainable.params["mask_decoder"]["iou_token"]["w"]).copy()
    trainer.fit(epochs=1, verbose=False)
    p1 = np.asarray(tiny_trainable.params["mask_decoder"]["iou_token"]["w"])
    assert not np.allclose(p0, p1), "Parameters did not change during training."
    assert (tmp_path / "test-run" / "latest.pkl").exists()
    assert (tmp_path / "test-run" / "best.pkl").exists()
    assert np.isfinite(trainer.train_metrics[0]["train_loss"])


@pytest.mark.slow
def test_sam_trainer_vit_t_smoke(tmp_path):
    """One finetune epoch through the TinyViT encoder: integrates the fused
    vit_t kernels' custom_vjp backward (unfused fallback) inside the real
    one-jit iterative train step."""
    import jax
    from micro_sam_tpu.models.sam import SamConfig, init_sam_params, Sam
    from micro_sam_tpu.training.trainable_sam import TrainableSAM
    from micro_sam_tpu.training.sam_trainer import SamTrainer

    cfg = SamConfig(model_type="vit_t", encoder="tiny_vit", img_size=128)
    params = init_sam_params(jax.random.PRNGKey(0), cfg)
    model = TrainableSAM(Sam(cfg, params))

    loader = _make_loader(n_batches=1, size=128)
    trainer = SamTrainer(
        name="vit-t-run", train_loader=loader, val_loader=loader,
        model=model, n_sub_iteration=2, n_objects_per_batch=2,
        save_root=str(tmp_path),
    )
    p0 = np.asarray(jax.tree.leaves(model.params["image_encoder"])[0]).copy()
    trainer.fit(epochs=1, verbose=False)
    p1 = np.asarray(jax.tree.leaves(model.params["image_encoder"])[0])
    assert not np.allclose(p0, p1), "TinyViT encoder did not train."
    assert np.isfinite(trainer.train_metrics[0]["train_loss"])


@pytest.mark.slow
def test_joint_sam_trainer_smoke(tiny_trainable, tmp_path):
    import jax
    from micro_sam_tpu.training.joint_sam_trainer import JointSamTrainer
    from micro_sam_tpu.models.unetr import init_unetr_decoder

    loader = _make_loader(n_batches=2, size=128, with_decoder=True)
    unetr = init_unetr_decoder(jax.random.PRNGKey(7), embed_dim=256, out_channels=3)
    trainer = JointSamTrainer(
        name="joint-run", train_loader=loader, val_loader=loader[:1],
        model=tiny_trainable, n_sub_iteration=2, n_objects_per_batch=2,
        save_root=str(tmp_path), unetr=unetr,
    )
    trainer.fit(epochs=1, verbose=False)
    import pickle
    with open(tmp_path / "joint-run" / "latest.pkl", "rb") as f:
        state = pickle.load(f)
    assert "decoder_state" in state


@pytest.mark.slow
def test_checkpoint_roundtrip_into_inference(tiny_trainable, tmp_path):
    """Finetune -> export -> get_sam_model / get_predictor_and_decoder must
    round-trip (ADVICE r1: get_sam_model used to route .pkl to torch.load)."""
    import jax
    import pickle
    from micro_sam_tpu.training.joint_sam_trainer import JointSamTrainer
    from micro_sam_tpu.training.training import export_instance_segmentation_model
    from micro_sam_tpu.models.unetr import init_unetr_decoder
    from micro_sam_tpu.util import get_sam_model
    from micro_sam_tpu.instance_segmentation import get_predictor_and_decoder

    loader = _make_loader(n_batches=1, size=128, with_decoder=True)
    unetr = init_unetr_decoder(jax.random.PRNGKey(7), embed_dim=256, out_channels=3)
    trainer = JointSamTrainer(
        name="rt-run", train_loader=loader, val_loader=loader,
        model=tiny_trainable, n_sub_iteration=2, n_objects_per_batch=2,
        save_root=str(tmp_path), unetr=unetr,
    )
    trainer.fit(epochs=1, verbose=False)

    ckpt = tmp_path / "rt-run" / "best.pkl"
    exported = tmp_path / "exported_model.pkl"
    export_instance_segmentation_model(str(ckpt), str(exported))

    # raw training checkpoint loads directly
    predictor = get_sam_model(model_type="vit_b", checkpoint_path=str(ckpt))
    trained_leaf = np.asarray(tiny_trainable.params["mask_decoder"]["iou_token"]["w"])
    got_leaf = np.asarray(predictor.model.params["mask_decoder"]["iou_token"]["w"])
    np.testing.assert_allclose(got_leaf, trained_leaf)
    assert predictor.model.config.embed_dim == 64  # tiny geometry restored

    # exported model loads with the decoder
    predictor2, decoder = get_predictor_and_decoder(
        model_type="vit_b", checkpoint_path=str(exported)
    )
    with open(exported, "rb") as f:
        state = pickle.load(f)
    assert "decoder_state" in state
    # the predictor actually works end-to-end with the restored weights
    from micro_sam_tpu.sample_data import synthetic_data
    image, _ = synthetic_data(shape=(128, 128), seed=2)
    predictor2.set_image(np.repeat(image[..., None], 3, axis=-1))
    masks, ious, _ = predictor2.predict(
        point_coords=np.array([[64.0, 64.0]]), point_labels=np.array([1])
    )
    assert masks.shape[-2:] == (128, 128)


def test_dataset_and_loader():
    from micro_sam_tpu.training.training import default_sam_loader
    from micro_sam_tpu.sample_data import synthetic_data

    image, seg = synthetic_data(shape=(256, 256), seed=5)
    loader = default_sam_loader(
        raw_paths=[image], raw_key=None, label_paths=[seg], label_key=None,
        patch_shape=(128, 128), with_segmentation_decoder=True, batch_size=1,
        n_samples=2,
    )
    batches = list(loader)
    assert len(batches) == 2
    raw, labels, targets = batches[0]
    assert raw.shape[1:3] == (128, 128)
    assert targets.shape[1] == 3
    assert targets[0, 0].max() <= 1.0


@pytest.mark.slow
def test_train_sam_end_to_end(tmp_path):
    """train_sam through the public API with a tiny custom model registry hack."""
    from micro_sam_tpu.sample_data import synthetic_data
    from micro_sam_tpu.training.training import default_sam_loader
    from micro_sam_tpu.training import sam_trainer as st
    from micro_sam_tpu.training.trainable_sam import TrainableSAM
    from micro_sam_tpu.models.sam import SamConfig, init_sam_params, Sam
    import jax

    image, seg = synthetic_data(shape=(256, 256), seed=9)
    loader = default_sam_loader(
        raw_paths=[image], raw_key=None, label_paths=[seg], label_key=None,
        patch_shape=(128, 128), with_segmentation_decoder=False, batch_size=1,
        n_samples=2,
    )
    cfg = SamConfig(model_type="vit_b", embed_dim=64, depth=2, num_heads=2,
                    global_attn_indexes=(1,), img_size=128)
    model = TrainableSAM(Sam(cfg, init_sam_params(jax.random.PRNGKey(1), cfg)))
    trainer = st.SamTrainer(
        name="e2e", train_loader=loader, val_loader=loader, model=model,
        n_sub_iteration=2, n_objects_per_batch=2, save_root=str(tmp_path),
    )
    trainer.fit(epochs=1, verbose=False)


@pytest.mark.slow
def test_training_quality_threshold(tmp_path):
    """Quality bar (reference test/test_training.py:197-226): finetune a small
    SAM on synthetic data, export, reload through get_sam_model, run
    iterative-prompting eval, and require SA50 above a threshold.

    The reference finetunes a *pretrained* vit_t one epoch and asserts
    SA50 > 0.8 on iteration02. No pretrained checkpoints exist in this
    zero-egress environment, so this trains a tiny SAM from random init
    (60 epochs, ~15 min CPU) — measured SA50 at iteration00 is ~0.83; the
    0.7 bar fails on any silent quality regression in the trainer or the
    prompt loop (convention bugs measure ~0.05)."""
    import glob
    import imageio.v3 as imageio
    import jax
    import optax
    from micro_sam_tpu.models.sam import SamConfig, init_sam_params, Sam
    from micro_sam_tpu.training.trainable_sam import TrainableSAM
    from micro_sam_tpu.training.sam_trainer import SamTrainer
    from micro_sam_tpu.training.training import (
        default_sam_loader, export_instance_segmentation_model,
    )
    from micro_sam_tpu.sample_data import synthetic_data
    from micro_sam_tpu.util import get_sam_model
    from micro_sam_tpu.evaluation.inference import run_inference_with_iterative_prompting
    from micro_sam_tpu.evaluation.evaluation import run_evaluation

    S = 128
    cfg = SamConfig(model_type="vit_b", embed_dim=96, depth=2, num_heads=2,
                    global_attn_indexes=(1,), img_size=S, window_size=8)
    model = TrainableSAM(Sam(cfg, init_sam_params(jax.random.PRNGKey(0), cfg)))

    train_images, train_labels = [], []
    for i in range(8):
        im, seg = synthetic_data(shape=(S, S), seed=i, n_objects=6)
        train_images.append(im)
        train_labels.append(seg)
    loader = default_sam_loader(
        raw_paths=train_images, raw_key=None, label_paths=train_labels, label_key=None,
        patch_shape=(S, S), with_segmentation_decoder=False, batch_size=1, n_samples=24,
    )
    val_im, val_seg = synthetic_data(shape=(S, S), seed=100, n_objects=6)
    val_loader = default_sam_loader(
        raw_paths=[val_im], raw_key=None, label_paths=[val_seg], label_key=None,
        patch_shape=(S, S), with_segmentation_decoder=False, batch_size=1, n_samples=2,
    )

    trainer = SamTrainer(
        name="quality", train_loader=loader, val_loader=val_loader, model=model,
        optimizer=optax.adamw(
            optax.warmup_cosine_decay_schedule(0.0, 6e-4, 100, 1500, 1e-5)),
        n_sub_iteration=3, n_objects_per_batch=4, save_root=str(tmp_path),
        mask_prob=0.5,
    )
    trainer.fit(epochs=60, verbose=False)

    # export + reload round trip
    exported = tmp_path / "exported.pkl"
    export_instance_segmentation_model(
        str(tmp_path / "quality" / "best.pkl"), str(exported))
    predictor = get_sam_model(checkpoint_path=str(exported))

    # iterative-prompting eval on held-out synthetic images
    data_dir = tmp_path / "test-data"
    data_dir.mkdir()
    image_paths, label_paths = [], []
    for i in range(2):
        im, seg = synthetic_data(shape=(S, S), seed=200 + i, n_objects=6)
        ip, lp = str(data_dir / f"im{i}.tif"), str(data_dir / f"gt{i}.tif")
        imageio.imwrite(ip, im)
        imageio.imwrite(lp, seg)
        image_paths.append(ip)
        label_paths.append(lp)

    pred_dir = str(tmp_path / "predictions")
    run_inference_with_iterative_prompting(
        predictor, image_paths, label_paths, embedding_dir=None,
        prediction_dir=pred_dir, start_with_box_prompt=False, n_iterations=3,
    )
    sa50 = []
    for it in range(3):
        preds = sorted(glob.glob(os.path.join(pred_dir, f"iteration{it:02}", "*.tif")))
        assert len(preds) == len(label_paths)
        res = run_evaluation(label_paths, preds, verbose=False)
        sa50.append(res["SA50"].values.item())
    # always emit the measured values so quality-gate runs can be recorded
    # in PARITY.md (run with -s to see them on success)
    print(f"SA50 per iteration: {[round(s, 4) for s in sa50]}")
    assert max(sa50) > 0.7, f"SA50 per iteration: {sa50}"


def test_peft_lora_forward(tiny_trainable):
    import jax
    import jax.numpy as jnp
    from micro_sam_tpu.models.peft_sam import apply_peft, get_peft_mask
    from micro_sam_tpu.models.sam import preprocess

    sam = tiny_trainable.sam
    params = apply_peft(sam.params, sam.config, rank=2, peft_module="lora")
    assert "lora" in params["image_encoder"]["blocks"][0]["attn"]

    x = jnp.zeros((1, 128, 128, 3))
    px = preprocess(x, sam.config.img_size)
    emb0 = sam.encode_image(sam.params, px)
    emb1 = sam.encode_image(params, px)
    # LoRA B starts at zero -> identical forward
    assert np.allclose(np.asarray(emb0), np.asarray(emb1), atol=1e-6)

    mask = get_peft_mask(params, "lora")
    flat = jax.tree.leaves(mask["image_encoder"])
    assert any(flat) and not all(flat)


@pytest.mark.parametrize("module", ["ssf", "adaptformer", "bias_tuning"])
def test_peft_variants(tiny_trainable, module):
    import jax.numpy as jnp
    from micro_sam_tpu.models.peft_sam import apply_peft, get_peft_mask
    from micro_sam_tpu.models.sam import preprocess

    sam = tiny_trainable.sam
    params = apply_peft(sam.params, sam.config, rank=2, peft_module=module)
    x = jnp.zeros((1, 128, 128, 3))
    emb = sam.encode_image(params, preprocess(x, sam.config.img_size))
    assert np.isfinite(np.asarray(emb)).all()
    get_peft_mask(params, module)


@pytest.mark.slow
def test_peft_int4_quantization(tiny_trainable):
    """Real int4 blockwise quantization of the frozen base (reference
    peft_sam.py:432-462 uses bitsandbytes Linear4bit): storage is jnp.int4,
    the dequantized forward tracks the full-precision one, and the LoRA
    gradient path stays intact."""
    import jax
    import jax.numpy as jnp
    from micro_sam_tpu.models.peft_sam import (
        apply_peft, dequantize_int4, get_peft_mask, quantize_int4,
    )
    from micro_sam_tpu.models.sam import preprocess

    sam = tiny_trainable.sam

    # unit: quantize/dequantize round trip within int4 step size
    w = np.asarray(sam.params["image_encoder"]["blocks"][0]["attn"]["qkv"]["w"])
    qd = quantize_int4(w)
    assert qd["w_q4"].dtype == jnp.int4
    deq = np.asarray(dequantize_int4(qd), dtype="float32")
    step = np.abs(w).max() / 7.0
    assert np.abs(deq - w).max() <= step + 1e-6

    params = apply_peft(sam.params, sam.config, rank=2, peft_module="lora",
                        quantize=True)
    attn0 = params["image_encoder"]["blocks"][0]["attn"]
    assert "w" not in attn0["qkv"] and attn0["qkv"]["w_q4"].dtype == jnp.int4

    x = jnp.zeros((1, 128, 128, 3)) + 0.5
    px = preprocess(x, sam.config.img_size)
    emb_fp = np.asarray(sam.encode_image(sam.params, px), dtype="float32")
    emb_q4 = np.asarray(sam.encode_image(params, px), dtype="float32")
    rel = np.abs(emb_q4 - emb_fp).max() / (np.abs(emb_fp).max() + 1e-9)
    assert rel < 0.35, f"int4 forward drift {rel}"
    assert np.isfinite(emb_q4).all()

    # gradients flow into LoRA params, not into the quantized storage
    from micro_sam_tpu.training.util import value_and_grad_allow_int

    def loss_fn(p):
        return jnp.sum(jnp.abs(sam.encode_image(p, px).astype(jnp.float32)))

    _, grads = value_and_grad_allow_int(loss_fn)(params)
    q_grad = grads["image_encoder"]["blocks"][0]["attn"]["qkv"]["w_q4"]
    assert q_grad.dtype == jnp.int4  # float0 replaced by same-dtype zeros
    la = grads["image_encoder"]["blocks"][0]["attn"]["lora"]["q"]
    assert float(jnp.abs(la["b"]).sum()) >= 0.0  # structure intact
    assert np.isfinite(np.asarray(la["a"], dtype="float32")).all()
    mask = get_peft_mask(params, "lora")
    q_mask = mask["image_encoder"]["blocks"][0]["attn"]["qkv"]
    assert q_mask["w_q4"] is False and q_mask["w_scale"] is False
