"""Per-stage probe at vit_h geometry (C=1280, 16 heads, batch 4, bf16).

vit_h is the one zoo model whose GLOBAL blocks run unfused: its 26 MB
resident MLP weights exceed every scoped-VMEM block choice
(ops/fused_window_block.py:global_block_config). This probe measures what
that costs — the unfused global block (flash attention + XLA LN/MLP) vs the
fused window block — to size a potential attention-only fused variant.

Comparison caveat: the window path processes 100 windows x 196 tokens
(19,600 token slots, ~20% zero padding at G=64 / WS=14) against the global
path's 64x64 = 16,384 real tokens, so the fused-window number is biased
HIGH per valid token — conservative for the ~5% fused-global headroom bound
derived from it.

Run on the real chip (compile cache at /tmp/jax_cache). Timings are
min-of-3 runs of a 10-iteration scan.
"""
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    assert jax.devices()[0].platform != "cpu"

    from micro_sam_tpu.models.image_encoder import (
        init_image_encoder, window_partition, apply_block)
    from micro_sam_tpu.ops.fused_window_block import fused_window_block

    # vit_h geometry (the real model is depth 32; 3 blocks suffice to probe
    # one window + one global block at full channel width)
    B, G, C, NH, WS = 4, 64, 1280, 16, 14
    p = init_image_encoder(
        jax.random.PRNGKey(0), embed_dim=C, depth=3, num_heads=NH,
        global_attn_indexes=(2,), window_size=WS)
    dt = jnp.bfloat16
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(B, G, G, C), dt)

    valid_c, _ = window_partition(jnp.ones((B, G, G, 1), dt), WS)
    valid2_c = valid_c.reshape(valid_c.shape[0], WS * WS, 1)
    xw0, _ = window_partition(x0, WS)
    xw0 = xw0.reshape(xw0.shape[0], WS * WS, C)

    def timeit(f, x, iters=10):
        @jax.jit
        def run(x):
            def body(c, _):
                y = f(x + c.astype(x.dtype))
                return jnp.sum(y.astype(jnp.float32)) * 1e-30, None
            s, _ = lax.scan(body, jnp.float32(0.0), None, length=iters)
            return s
        float(run(x))  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(x))
            best = min(best, time.perf_counter() - t0)
        return best / iters * 1e3  # ms (min-of-3)

    bpg = p["blocks"][2]   # no PEFT in this probe, raw params are prepped
    bp0 = p["blocks"][0]

    def global_unfused(x):
        # the current vit_h production path (global_block_config returns None)
        return apply_block(bpg, x, NH, 0)

    def one_winblock(xw):
        return fused_window_block(xw, valid2_c, bp0, (WS, WS), NH)

    out = {
        "global_unfused_ms": round(timeit(global_unfused, x0), 2),
        "window_block_fused_ms": round(timeit(one_winblock, xw0), 2),
    }
    # vit_h: 4 globals, 28 window blocks
    out["implied_globals_ms"] = round(4 * out["global_unfused_ms"], 1)
    out["implied_windows_ms"] = round(28 * out["window_block_fused_ms"], 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
