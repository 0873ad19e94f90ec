"""Train a tiny-encoder SAM at img_size=1024 on synthetic blobs and save it
as the AMG bench fixture (round-5, VERDICT ask #3).

Why: with a random-init decoder the AMG bench cannot produce realistic
masks — logits don't localize around the prompt, bboxes span most of the
frame, and the compacted crop-transfer path degenerates to its full-frame
fallback (probe 2026-08-20: fit_frac 0.34, mean_area_frac 0.0009,
197 masks/s). The SAM prompt-encoder + mask-decoder geometry is
encoder-independent (256-dim on 64x64 features for every encoder size), so
a SAM with a 2-block / 96-dim encoder at img_size=1024 runs the IDENTICAL
production decode program the bench times — and the SA50 quality gate
(tests/test_training.py:221) proves this trainer reaches SA50 ~0.83 from
random init on the same synthetic data family.

The fixture (tests/fixtures/bench_sam_tiny1024.npz, float16) holds the full
trained param tree + config. bench.py encodes a synthetic cell image with
the tiny encoder and drives the standard AMG pipeline with the trained
decoder, so masks/s is measured on compact, realistically-sized masks.

Usage: python development/train_bench_decoder.py [epochs] [img_size]
  (img_size=256 for a fast CPU mechanics check; 1024 for the real fixture)
"""
import json
import os
import sys

import numpy as np

FIXTURE = os.path.join(os.path.dirname(__file__), os.pardir,
                       "tests", "fixtures", "bench_sam_tiny1024.npz")


def flatten_params(params):
    flat = {}

    def rec(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                if not k.startswith("_"):
                    rec(f"{prefix}/{k}" if prefix else k, v)
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                rec(f"{prefix}/{i}", v)
        else:
            flat[prefix] = np.asarray(v if (v := node) is not None else node)
    rec("", params)
    return flat


def main():
    import jax
    import optax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from micro_sam_tpu.models.sam import SamConfig, init_sam_params, Sam
    from micro_sam_tpu.training.trainable_sam import TrainableSAM
    from micro_sam_tpu.training.sam_trainer import SamTrainer
    from micro_sam_tpu.training.training import default_sam_loader
    from micro_sam_tpu.sample_data import synthetic_data

    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    S = int(sys.argv[2]) if len(sys.argv) > 2 else 1024

    cfg = SamConfig(model_type="vit_b", embed_dim=96, depth=2, num_heads=2,
                    global_attn_indexes=(1,), img_size=S, window_size=8)
    model = TrainableSAM(Sam(cfg, init_sam_params(jax.random.PRNGKey(0), cfg)))

    # cell-like density: radii 30-110 px at 1024 -> 0.3-3.6% frame area each
    rr = (max(6, 30 * S // 1024), max(12, 110 * S // 1024))
    train_images, train_labels = [], []
    for i in range(8):
        im, seg = synthetic_data(shape=(S, S), seed=i, n_objects=20,
                                 radius_range=rr)
        train_images.append(im)
        train_labels.append(seg)
    loader = default_sam_loader(
        raw_paths=train_images, raw_key=None, label_paths=train_labels,
        label_key=None, patch_shape=(S, S), with_segmentation_decoder=False,
        batch_size=1, n_samples=24,
    )
    val_im, val_seg = synthetic_data(shape=(S, S), seed=100, n_objects=20,
                                     radius_range=rr)
    val_loader = default_sam_loader(
        raw_paths=[val_im], raw_key=None, label_paths=[val_seg], label_key=None,
        patch_shape=(S, S), with_segmentation_decoder=False,
        batch_size=1, n_samples=2,
    )

    import tempfile
    tmp = tempfile.mkdtemp(prefix="bench_decoder_")
    trainer = SamTrainer(
        name="bench_fixture", train_loader=loader, val_loader=val_loader,
        model=model,
        optimizer=optax.adamw(
            optax.warmup_cosine_decay_schedule(0.0, 6e-4, 100, 1500, 1e-5)),
        n_sub_iteration=3, n_objects_per_batch=4, save_root=tmp,
        mask_prob=0.5,
    )
    trainer.fit(epochs=epochs, verbose=True)

    import pickle
    with open(os.path.join(tmp, "bench_fixture", "best.pkl"), "rb") as f:
        state = pickle.load(f)
    params = state["model_state"]

    flat = {k: v.astype(np.float16) if v.dtype.kind == "f" else v
            for k, v in flatten_params(params).items()}
    cfg_json = json.dumps({
        "model_type": cfg.model_type, "embed_dim": cfg.embed_dim,
        "depth": cfg.depth, "num_heads": cfg.num_heads,
        "global_attn_indexes": list(cfg.global_attn_indexes),
        "img_size": cfg.img_size, "window_size": cfg.window_size,
    })
    out = FIXTURE if S == 1024 else FIXTURE.replace(".npz", f"_{S}.npz")
    np.savez_compressed(out, __config__=np.array(cfg_json), **flat)
    print(f"saved {out} ({os.path.getsize(out)/1e6:.1f} MB)")

    # self-check: decode a point grid with the trained decoder and report
    # the mask-area / bbox statistics the bench relies on
    import jax.numpy as jnp
    from micro_sam_tpu.predictor import SamPredictor, _AmgDecoder
    from micro_sam_tpu.models.sam import preprocess
    from micro_sam_tpu.ops.amg_utils import build_point_grid

    sam = Sam(cfg, params)
    predictor = SamPredictor(sam)
    test_im, _ = synthetic_data(shape=(S, S), seed=200, n_objects=20,
                                radius_range=rr)
    px = jnp.asarray(np.stack([test_im] * 3, -1), jnp.float32)[None]
    feats = sam.encode_image(params, preprocess(px, cfg.img_size))
    predictor.set_features(feats, (S, S), (S, S))
    grid = (build_point_grid(16) * S).astype(np.float32)
    dec = _AmgDecoder(predictor, mask_threshold=0.0)
    packed, iou, stab, boxes = dec(grid[:64])
    bw = (boxes[..., 2] - boxes[..., 0]).ravel()
    bh = (boxes[..., 3] - boxes[..., 1]).ravel()
    areas = np.unpackbits(packed, axis=-1).sum(axis=(1, 2)) / float(S * S)
    print(f"iou p50={np.median(iou):.3f}  stab p50={np.median(stab):.3f}")
    print(f"bbox w p50={np.median(bw):.0f} p90={np.percentile(bw, 90):.0f}  "
          f"h p50={np.median(bh):.0f} p90={np.percentile(bh, 90):.0f}")
    print(f"mask area frac p50={np.median(areas):.4f} "
          f"mean={areas.mean():.4f}")


if __name__ == "__main__":
    main()
