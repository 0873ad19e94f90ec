"""Per-block A/B probe for the fused WINDOW kernel at any model geometry.

Times one fused window block at (batch x 1024px) window-partitioned shapes,
for the env-selected variant (MSAM_TPU_WINDOW_MERGED=0/1). Used to tune the
hd=80 (vit_h) merged-slices design without paying full-encoder compiles.

Usage: [MSAM_TPU_WINDOW_MERGED=0] python development/probe_window_kernel.py [vit_h] [batch]
"""
import json
import os
import sys
import time

import numpy as np

GEOM = {  # C, num_heads
    "vit_b": (768, 12),
    "vit_l": (1024, 16),
    "vit_h": (1280, 16),
}


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    assert jax.devices()[0].platform != "cpu"

    from micro_sam_tpu.models.image_encoder import init_image_encoder, window_partition
    from micro_sam_tpu.ops.fused_window_block import fused_window_block

    model = sys.argv[1] if len(sys.argv) > 1 else "vit_h"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    C, NH = GEOM[model]
    G, WS = 64, 14

    p = init_image_encoder(jax.random.PRNGKey(0), embed_dim=C, depth=1,
                           num_heads=NH, global_attn_indexes=())
    bp = p["blocks"][0]
    dt = jnp.bfloat16
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(B, G, G, C), dt)
    valid_c, _ = window_partition(jnp.ones((B, G, G, 1), dt), WS)
    valid2 = valid_c.reshape(valid_c.shape[0], WS * WS, 1)
    xw, _ = window_partition(x0, WS)
    xw = xw.reshape(xw.shape[0], WS * WS, C)

    @jax.jit
    def run(xw):
        def body(c, _):
            y = fused_window_block(xw + c.astype(xw.dtype), valid2, bp,
                                   (WS, WS), NH)
            return jnp.sum(y.astype(jnp.float32)) * 1e-30, None
        s, _ = lax.scan(body, jnp.float32(0.0), None, length=10)
        return s

    float(run(xw))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(xw))
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({
        "model": model, "batch": B,
        "merged": os.environ.get("MSAM_TPU_WINDOW_MERGED", "1"),
        "block_ms": round(best / 10 * 1e3, 2),
    }))


if __name__ == "__main__":
    main()
