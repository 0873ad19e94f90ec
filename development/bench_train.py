"""Training-path microbenchmark: ViT-B encoder fwd vs fwd+bwd on the chip.

Isolates where a finetuning step spends time — if backward dominates by much
more than the theoretical 2x, the einsum-VJP fallback of the flash-attention
kernel is the bottleneck and a Pallas backward kernel is worth building.
"""
import time

import jax
import jax.numpy as jnp

import micro_sam_tpu  # noqa: F401  (compilation cache)
from micro_sam_tpu.models.sam import SamConfig, init_sam_params
from micro_sam_tpu.models.image_encoder import apply_image_encoder


def fence(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def main(batch=2, steps=5):
    cfg = SamConfig(model_type="vit_b")
    params = init_sam_params(jax.random.PRNGKey(0), cfg)
    enc = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                       if a.dtype == jnp.float32 else a, params["image_encoder"])
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, 1024, 1024, 3), jnp.bfloat16)

    def fwd(p, x):
        return apply_image_encoder(p, x, cfg.num_heads,
                                   global_attn_indexes=cfg.global_attn_indexes)

    f_jit = jax.jit(lambda p, x: jnp.sum(fwd(p, x).astype(jnp.float32)))
    g_jit = jax.jit(jax.grad(lambda p, x: jnp.sum(fwd(p, x).astype(jnp.float32))))

    fence(f_jit(enc, x))
    t0 = time.perf_counter()
    for _ in range(steps):
        r = f_jit(enc, x)
    fence(r)
    fwd_ms = (time.perf_counter() - t0) / steps * 1e3

    g = g_jit(enc, x)
    fence(g["patch_embed"]["w"])
    t0 = time.perf_counter()
    for _ in range(steps):
        g = g_jit(enc, x)
    fence(g["patch_embed"]["w"])
    bwd_ms = (time.perf_counter() - t0) / steps * 1e3

    print(f"batch={batch} fwd={fwd_ms:.1f}ms fwd+bwd={bwd_ms:.1f}ms "
          f"ratio={bwd_ms / fwd_ms:.2f} (theoretical ~3x fwd)")


def full_trainer_step(batch=2, n_objects=25, steps=3, n_sub=8):
    """End-to-end SamTrainer step (encoder + 8 corrective decode rounds +
    backward + adamw) on real vit_b at 1024^2 — the reference's A100 "vit_b
    bs=2/40-object" configuration."""
    import numpy as np
    from micro_sam_tpu.models.sam import SamConfig, init_sam_params, Sam
    from micro_sam_tpu.training.sam_trainer import SamTrainer
    from micro_sam_tpu.training.trainable_sam import TrainableSAM

    # params stay f32 (optimizer precision); compute_dtype drives the
    # apply-time bf16 casts, matching get_trainable_sam_model on TPU
    cfg = SamConfig(model_type="vit_b", compute_dtype="bfloat16")
    params = init_sam_params(jax.random.PRNGKey(0), cfg)
    model = TrainableSAM(Sam(cfg, params))

    rng = np.random.RandomState(0)
    image = rng.randint(0, 255, (batch, 1, 1024, 1024)).astype(np.float32)
    labels = np.zeros((batch, 1, 1024, 1024), dtype=np.int64)
    gy, gx = np.meshgrid(np.arange(1024) // 128, np.arange(1024) // 128,
                         indexing="ij")
    labels[:, 0] = 1 + gy * 8 + gx          # 64 square objects per image

    trainer = SamTrainer("bench", [(image, labels)], [(image, labels)], model,
                         n_objects_per_batch=n_objects, save_root="/tmp/bench_ckpt",
                         n_sub_iteration=n_sub)
    batch_data = trainer._prepare_batch(image, labels, True, False)
    images_j, gt, obj_valid, points0, labels0, boxes0 = batch_data
    step = trainer._build_step(True, False, True, tuple(gt.shape[2:]))

    key = jax.random.PRNGKey(1)
    p, o = model.params, trainer.opt_state
    p, o, (loss, miou) = step(p, o, key, images_j, gt, obj_valid, points0, labels0, boxes0)
    fence(loss)
    t0 = time.perf_counter()
    for _ in range(steps):
        p, o, (loss, miou) = step(p, o, key, images_j, gt, obj_valid,
                                  points0, labels0, boxes0)
    fence(loss)
    ms = (time.perf_counter() - t0) / steps * 1e3
    print(f"full trainer step: batch={batch} objects={n_objects} n_sub={n_sub} "
          f"{ms:.1f} ms ({batch / ms * 1e3:.2f} images/s)")


if __name__ == "__main__":
    import sys
    if "--full" in sys.argv:
        n_sub = 2 if "--nsub2" in sys.argv else 8
        batch = 8 if "--batch8" in sys.argv else 2
        full_trainer_step(batch=batch, n_sub=n_sub)
    else:
        main()
