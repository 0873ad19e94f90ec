"""Isolate the in-context window-block penalty (round-5).

The bisect puts a 5-block vit_l run at ~21.1 ms while the isolated block
probe says 3.77 ms/block and the isolated shuffle roundtrip 0.86 ms
(5*3.77 + 0.86 = 19.7, gap ~1.4 ms/run). Hypotheses: (a) consecutive
pallas_call launches pay a per-launch pipeline drain; (b) the shuffles cost
more in context than isolated.

Times, at the real geometry (token layout, no shuffles):
  1 block      — baseline
  5 blocks (distinct weights) chained in one jit
  5 blocks + partition/unpartition roundtrip (the full run shape)

Usage: python development/probe_run_context.py [vit_l|vit_h] [batch]
"""
import sys
import time

import numpy as np

GEOM = {"vit_b": (768, 12), "vit_l": (1024, 16), "vit_h": (1280, 16)}


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from micro_sam_tpu.models.image_encoder import (
        init_image_encoder, window_partition, window_unpartition)
    from micro_sam_tpu.ops.fused_window_block import fused_window_block

    model = sys.argv[1] if len(sys.argv) > 1 else "vit_l"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    C, NH = GEOM[model]
    G, WS = 64, 14

    p = init_image_encoder(jax.random.PRNGKey(0), embed_dim=C, depth=5,
                           num_heads=NH, global_attn_indexes=())
    bps = p["blocks"]
    dt = jnp.bfloat16
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(B, G, G, C), dt)
    valid_c, _ = window_partition(jnp.ones((B, G, G, 1), dt), WS)
    valid2 = valid_c.reshape(valid_c.shape[0], WS * WS, 1)
    xw0, pad_hw = window_partition(x0, WS)
    xw0 = xw0.reshape(xw0.shape[0], WS * WS, C)

    def timeit(f, x, iters=10):
        @jax.jit
        def run(x):
            def body(c, _):
                y = f(x + c.astype(x.dtype))
                return jnp.sum(y.astype(jnp.float32)) * 1e-30, None
            s, _ = lax.scan(body, jnp.float32(0.0), None, length=iters)
            return s
        float(run(x))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(x))
            best = min(best, time.perf_counter() - t0)
        return best * 1e3 / iters

    one = timeit(lambda xw: fused_window_block(xw, valid2, bps[0], (WS, WS), NH), xw0)

    def five(xw):
        for k in range(5):
            xw = fused_window_block(xw, valid2, bps[k], (WS, WS), NH)
        return xw

    five_ms = timeit(five, xw0)

    def full_run(x):
        xw, ph = window_partition(x, WS)
        xw = xw.reshape(xw.shape[0], WS * WS, C)
        for k in range(5):
            xw = fused_window_block(xw, valid2, bps[k], (WS, WS), NH)
        xw = xw.reshape(xw.shape[0], WS, WS, C)
        return window_unpartition(xw, WS, ph, (G, G))

    run_ms = timeit(full_run, x0)
    print(f"one_block          {one:7.3f} ms")
    print(f"five_blocks        {five_ms:7.3f} ms ({five_ms/5:.3f}/block; "
          f"launch_penalty={(five_ms - 5*one)/4:.3f}/extra)")
    print(f"run_with_shuffles  {run_ms:7.3f} ms (shuffle cost "
          f"{run_ms - five_ms:.3f})")


if __name__ == "__main__":
    main()
