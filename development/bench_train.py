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


if __name__ == "__main__":
    main()
