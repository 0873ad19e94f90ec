"""Per-stage encoder timing for ANY ViT zoo size (vit_b / vit_l / vit_h).

Generalizes development/stage_probe.py (vit_b-only) so the vit_l / vit_h
speed-of-light tables can be derived the same way (VERDICT r3 weak#2):
patch embed / one fused window block / window shuffles / one global block
(fused when global_block_config accepts the geometry, the unfused composition
otherwise — exactly what encode_image does) / neck, with in-graph lax.scan
repetition and a carry perturbation so XLA cannot hoist the stage.

Usage: python development/stage_probe_model.py [vit_h] [batch]
"""
import json
import sys
import time

import numpy as np

GEOM = {  # C, num_heads, depth, globals
    "vit_b": (768, 12, 12, (2, 5, 8, 11)),
    "vit_l": (1024, 16, 24, (5, 11, 17, 23)),
    "vit_h": (1280, 16, 32, (7, 15, 23, 31)),
}


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    assert jax.devices()[0].platform != "cpu"

    from micro_sam_tpu.models import common as cm
    from micro_sam_tpu.models.image_encoder import (
        init_image_encoder, window_partition, window_unpartition,
        apply_block)
    from micro_sam_tpu.ops.fused_window_block import (
        fused_window_block, fused_global_block, global_block_config)

    model = sys.argv[1] if len(sys.argv) > 1 else "vit_h"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    C, NH, DEPTH, GLOBALS = GEOM[model]
    G, WS = 64, 14
    n_globals = len(GLOBALS)
    n_windows = DEPTH - n_globals
    # runs of consecutive window blocks between globals (encode_image layout)
    runs, start = [], 0
    for g in sorted(GLOBALS):
        if g > start:
            runs.append(g - start)
        start = g + 1
    if start < DEPTH:
        runs.append(DEPTH - start)

    # a 3-block probe model: window, window, global (weights representative)
    p = init_image_encoder(jax.random.PRNGKey(0), embed_dim=C, depth=3,
                           num_heads=NH, global_attn_indexes=(2,))
    dt = jnp.bfloat16
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(B, G, G, C), dt)
    px0 = jnp.asarray(rng.rand(B, 1024, 1024, 3), dt)

    valid_c, _ = window_partition(jnp.ones((B, G, G, 1), dt), WS)
    valid2_c = valid_c.reshape(valid_c.shape[0], WS * WS, 1)
    xw0, pad_hw = window_partition(x0, WS)
    xw0 = xw0.reshape(xw0.shape[0], WS * WS, C)

    # Each fenced dispatch through the axon tunnel costs a fixed RTT (~ms);
    # at iters=10 that bias was ~+3 ms/stage and made the per-stage sums
    # exceed the measured end-to-end encoder. Measure the null-dispatch
    # baseline once and subtract it from every stage timing.
    def _timeit_raw(f, x, iters):
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
        return best * 1e3  # ms for the whole dispatch

    tiny = jnp.zeros((8, 128), jnp.float32)
    dispatch_ms = _timeit_raw(lambda x: x * 1.000001, tiny, 1)

    def timeit(f, x, iters=10):
        return max(0.0, _timeit_raw(f, x, iters) - dispatch_ms) / iters

    bp0, bpg = p["blocks"][0], p["blocks"][2]

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

    def one_winblock(xw):
        return fused_window_block(xw, valid2_c, bp0, (WS, WS), NH)

    hidden = bpg["mlp"]["lin1"]["w"].shape[-1]
    global_fused = global_block_config(G, G, dt, channels=C,
                                       mlp_hidden=hidden,
                                       num_heads=NH) is not None

    def global_blk(x):
        if global_fused:
            return fused_global_block(
                x.reshape(B, G * G, C), bpg, (G, G), NH).reshape(B, G, G, C)
        return apply_block(bpg, x, NH, 0)

    def neck(x):
        y = cm.conv2d(p["neck"]["conv1"], x, stride=1, padding="VALID")
        y = cm.layer_norm_2d(p["neck"]["ln1"], y)
        y = cm.conv2d(p["neck"]["conv2"], y, stride=1, padding=1)
        return cm.layer_norm_2d(p["neck"]["ln2"], y)

    out = {
        "model": model, "batch": B, "global_fused": global_fused,
        "dispatch_baseline_ms": round(dispatch_ms, 2),
        "patch_ms": round(timeit(patch, px0, iters=20), 2),
        "shuffle_roundtrip_ms": round(timeit(shuffle_only, x0, iters=20), 2),
        "window_block_ms": round(timeit(one_winblock, xw0, iters=20), 2),
        "global_block_ms": round(timeit(global_blk, x0, iters=20), 2),
        "neck_ms": round(timeit(neck, x0, iters=20), 2),
    }
    out["implied_encoder_ms"] = round(
        out["patch_ms"]
        + n_windows * out["window_block_ms"]
        + len(runs) * out["shuffle_roundtrip_ms"]
        + n_globals * out["global_block_ms"]
        + out["neck_ms"], 1)
    out["implied_tiles_per_sec"] = round(B / out["implied_encoder_ms"] * 1e3, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
