"""In-process A/B of the global kernel's skip-max softmax (vit_b geometry,
batch 8, bf16). Toggles the module flag between jit builds so both variants
compile and run in ONE process (tunnel throughput varies across sessions)."""
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

    from micro_sam_tpu.models.image_encoder import init_image_encoder
    from micro_sam_tpu.ops import fused_window_block as fwb

    from micro_sam_tpu.models.image_encoder import window_partition

    p = init_image_encoder(jax.random.PRNGKey(0))
    B, G, C, NH, WS = 8, 64, 768, 12, 14
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(B, G, G, C), jnp.bfloat16)
    bpg = p["blocks"][2]
    bp0 = p["blocks"][0]

    valid_c, _ = window_partition(jnp.ones((B, G, G, 1), jnp.bfloat16), WS)
    valid2_c = valid_c.reshape(valid_c.shape[0], WS * WS, 1)
    xw0, _ = window_partition(x0, WS)
    xw0 = xw0.reshape(xw0.shape[0], WS * WS, C)

    def timed(f, x, iters=20):
        @jax.jit
        def run(x):
            def body(c, _):
                y = f(x + c.astype(x.dtype))
                return jnp.sum(y.astype(jnp.float32)) * 1e-30, None
            s, _ = lax.scan(body, jnp.float32(0.0), None, length=iters)
            return s
        v = float(run(x))
        t0 = time.perf_counter()
        float(run(x))
        return (time.perf_counter() - t0) / iters * 1e3, v

    def global_blk(x):
        return fwb.fused_global_block(
            x.reshape(B, G * G, C), bpg, (G, G), NH).reshape(B, G, G, C)

    def win_blk(xw):
        return fwb.fused_window_block(xw, valid2_c, bp0, (WS, WS), NH)

    out = {}
    fwb._SKIPMAX = False
    out["g_maxsub_ms"], gv0 = timed(global_blk, x0)
    out["w_maxsub_ms"], wv0 = timed(win_blk, xw0)
    fwb._SKIPMAX = True
    out["g_skipmax_ms"], gv1 = timed(global_blk, x0)
    out["w_skipmax_ms"], wv1 = timed(win_blk, xw0)
    out["g_rel_diff"] = abs(gv1 - gv0) / max(abs(gv0), 1e-30)
    out["w_rel_diff"] = abs(wv1 - wv0) / max(abs(wv0), 1e-30)
    print(json.dumps({k: round(v, 4) for k, v in out.items()}))


if __name__ == "__main__":
    main()
