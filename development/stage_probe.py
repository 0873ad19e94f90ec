"""Per-stage encoder timing on the real chip (vit_b, batch 8, bf16).

Isolates patch embed / window runs / window blocks / shuffles / global block /
neck with in-graph lax.scan repetition and a carry perturbation so XLA cannot
hoist or DCE the stage under test (see memory: block_until_ready lies through
the tunnel; fence by fetching a scalar).
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

    from micro_sam_tpu.models import common as cm
    from micro_sam_tpu.models.image_encoder import (
        init_image_encoder, window_partition, window_unpartition)
    from micro_sam_tpu.ops.fused_window_block import (
        fused_window_block, fused_global_block)

    p = init_image_encoder(jax.random.PRNGKey(0))
    dt = jnp.bfloat16
    B, G, C, NH, WS = 8, 64, 768, 12, 14
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(B, G, G, C), dt)
    px0 = jnp.asarray(rng.rand(B, 1024, 1024, 3), dt)

    valid_c, _ = window_partition(jnp.ones((B, G, G, 1), dt), WS)
    valid2_c = valid_c.reshape(valid_c.shape[0], WS * WS, 1)
    xw0, pad_hw = window_partition(x0, WS)
    xw0 = xw0.reshape(xw0.shape[0], WS * WS, C)

    def timeit(f, x, iters=20):
        @jax.jit
        def run(x):
            def body(c, _):
                s = c
                y = f(x + s.astype(x.dtype))
                return jnp.sum(y.astype(jnp.float32)) * 1e-30, None
            s, _ = lax.scan(body, jnp.float32(0.0), None, length=iters)
            return s
        float(run(x))  # compile + warm
        t0 = time.perf_counter()
        float(run(x))
        return (time.perf_counter() - t0) / iters * 1e3  # ms

    bp0, bp1, bpg = p["blocks"][0], p["blocks"][1], p["blocks"][2]

    def patch(px):
        ps = 16
        w = p["patch_embed"]["w"]
        xp = px.reshape(B, 64, ps, 64, ps, 3).transpose(0, 1, 3, 2, 4, 5)
        xp = xp.reshape(B, 64, 64, ps * ps * 3)
        y = jnp.dot(xp, w.reshape(-1, w.shape[-1]).astype(px.dtype),
                    preferred_element_type=jnp.float32).astype(px.dtype)
        return y + p["patch_embed"]["b"].astype(px.dtype)

    def shuffle_only(x):
        xw, ph = window_partition(x, WS)
        return window_unpartition(xw, WS, ph, (G, G))

    def one_winblock(xw):  # pre-partitioned, no shuffles
        return fused_window_block(xw, valid2_c, bp0, (WS, WS), NH)

    def winrun(x):  # 2 blocks + the run's partition/unpartition, as in encode
        xw, ph = window_partition(x, WS)
        BWn = xw.shape[0]
        xw2 = xw.reshape(BWn, WS * WS, C)
        for bp in (bp0, bp1):
            xw2 = fused_window_block(xw2, valid2_c, bp, (WS, WS), NH)
        return window_unpartition(
            xw2.reshape(BWn, WS, WS, C), WS, ph, (G, G))

    def global_blk(x):
        return fused_global_block(
            x.reshape(B, G * G, C), bpg, (G, G), NH).reshape(B, G, G, C)

    def neck(x):
        y = cm.conv2d(p["neck"]["conv1"], x, stride=1, padding="VALID")
        y = cm.layer_norm_2d(p["neck"]["ln1"], y)
        y = cm.conv2d(p["neck"]["conv2"], y, stride=1, padding=1)
        return cm.layer_norm_2d(p["neck"]["ln2"], y)

    out = {
        "patch_ms": round(timeit(patch, px0), 2),
        "shuffle_roundtrip_ms": round(timeit(shuffle_only, x0), 2),
        "window_block_ms": round(timeit(one_winblock, xw0), 2),
        "window_run2_ms": round(timeit(winrun, x0), 2),
        "global_block_ms": round(timeit(global_blk, x0), 2),
        "neck_ms": round(timeit(neck, x0), 2),
    }
    # implied totals for vit_b: 4 runs of 2 window blocks, 4 globals
    out["implied_encoder_ms"] = round(
        out["patch_ms"] + 4 * out["window_run2_ms"]
        + 4 * out["global_block_ms"] + out["neck_ms"], 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
