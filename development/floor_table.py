"""Measured speed-of-light floor table for any ViT zoo size (VERDICT r3 weak#2).

Methodology (same as the vit_b analysis in PARITY.md): time every matmul and
VPU stage of one window / one global block STANDALONE at the exact shapes the
encoder uses, on this chip, in bf16; the per-block floor is their sum (the
no-overlap model — VPU LN/softmax/GELU serialize against dependent matmuls
inside a program, so summing is the realistic bound, not pessimistic). The
encoder floor adds the measured patch/shuffle/neck stages from
development/stage_probe_model.py, which this script re-runs inline.

Every timing is min-of-3 over a 4-iteration loop, fenced by fetching a
checksum (block_until_ready returns early through the axon tunnel).

Usage: python development/floor_table.py [vit_l] [batch]
Prints one JSON line per stage and a final summary line.
"""
import json
import sys
import time

import numpy as np

GEOM = {  # C, num_heads, depth, global block indexes
    "vit_b": (768, 12, 12, (2, 5, 8, 11)),
    "vit_l": (1024, 16, 24, (5, 11, 17, 23)),
    "vit_h": (1280, 16, 32, (7, 15, 23, 31)),
}


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    assert jax.devices()[0].platform != "cpu"

    model = sys.argv[1] if len(sys.argv) > 1 else "vit_l"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    C, NH, DEPTH, GLOBALS = GEOM[model]
    HD = C // NH
    G, WS = 64, 14
    NWIN = (G + WS - 1) // WS  # 5 per axis -> 25 windows, 70x70 padded
    L = WS * WS                # 196 tokens per window
    T = B * G * G              # global tokens
    WROWS = B * NWIN * NWIN * L  # padded window tokens

    rng = np.random.RandomState(0)

    # Each dispatch through the axon tunnel costs ~3.4 ms of host time, which
    # swamps sub-ms matmul stages. Every stage is therefore timed as ONE
    # dispatch of an in-graph lax.scan (iterations serialized by a carry
    # perturbation so XLA cannot hoist the op), and the null-scan dispatch
    # baseline is subtracted.
    from jax import lax

    ITERS = 30

    def _scan_time(body1, *args):
        """body1(carry_scalar) -> new checksum scalar; returns ms/iteration."""
        @jax.jit
        def run(*args):
            def body(c, _):
                return body1(c, *args), None
            s, _ = lax.scan(body, jnp.float32(0.0), None, length=ITERS)
            return s
        float(run(*args))  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(*args))
            best = min(best, time.perf_counter() - t0)
        return best / ITERS * 1e3

    baseline_ms = _scan_time(lambda c: c * 1.000001)
    print(json.dumps({"stage": "scan_baseline_ms_per_iter",
                      "ms": round(baseline_ms, 4)}), flush=True)

    def timeit_graph(make_out, *args):
        """make_out(c, *args) -> array whose f32 sum is the checksum."""
        def body1(c, *a):
            out = make_out(c, *a)
            return jnp.sum(out.astype(jnp.float32)) * 1e-30
        return max(0.0, _scan_time(body1, *args) - baseline_ms)

    import jax

    def mm(batch, M, K, N):
        """ms for a (possibly batched) bf16 matmul at the encoder's shape."""
        a = jnp.asarray(rng.rand(batch, M, K), jnp.bfloat16) if batch > 1 else \
            jnp.asarray(rng.rand(M, K), jnp.bfloat16)
        b = jnp.asarray(rng.rand(batch, K, N), jnp.bfloat16) if batch > 1 else \
            jnp.asarray(rng.rand(K, N), jnp.bfloat16)

        ms = timeit_graph(
            lambda c, a, b: jnp.einsum(
                "...mk,...kn->...mn", a + c.astype(a.dtype), b), a, b)
        gflop = 2 * batch * M * K * N / 1e9
        return ms, round(gflop / max(ms, 1e-6), 1)  # ms, TFLOP/s

    def vpu_softmax(batch, rows, cols):
        x = jnp.asarray(rng.rand(batch, rows, cols), jnp.bfloat16)
        return timeit_graph(
            lambda c, x: jax.nn.softmax(x + c.astype(x.dtype), axis=-1), x)

    def vpu_ln_gelu(rows, c):
        x = jnp.asarray(rng.rand(rows, c), jnp.bfloat16)

        def f(carry, x):
            x = x + carry.astype(x.dtype)
            m = jnp.mean(x.astype(jnp.float32), -1, keepdims=True)
            v = jnp.var(x.astype(jnp.float32), -1, keepdims=True)
            y = ((x - m) / jnp.sqrt(v + 1e-6)).astype(jnp.bfloat16)
            return jax.nn.gelu(y)

        return timeit_graph(f, x)

    stages = {}

    # ---- window block shapes
    stages["w_qkv"] = mm(1, WROWS, C, 3 * C)
    stages["w_qk"] = mm(B * NWIN * NWIN * NH, L, HD, L)
    stages["w_av"] = mm(B * NWIN * NWIN * NH, L, L, HD)
    stages["w_proj"] = mm(1, WROWS, C, C)
    stages["w_mlp1"] = mm(1, WROWS, C, 4 * C)
    stages["w_mlp2"] = mm(1, WROWS, 4 * C, C)
    stages["w_softmax"] = (vpu_softmax(B * NWIN * NWIN * NH, L, L), None)
    stages["w_ln_gelu"] = (2 * vpu_ln_gelu(WROWS, C), None)

    # ---- global block shapes
    stages["g_qkv"] = mm(1, T, C, 3 * C)
    stages["g_qk"] = mm(B * NH, G * G, HD, G * G)
    stages["g_av"] = mm(B * NH, G * G, G * G, HD)
    stages["g_proj"] = mm(1, T, C, C)
    stages["g_mlp1"] = mm(1, T, C, 4 * C)
    stages["g_mlp2"] = mm(1, T, 4 * C, C)
    stages["g_softmax"] = (vpu_softmax(B * NH, G * G, G * G), None)
    stages["g_ln_gelu"] = (2 * vpu_ln_gelu(T, C), None)

    for k, v in stages.items():
        ms = v[0] if isinstance(v, tuple) else v
        rec = {"stage": k, "ms": round(ms, 3)}
        if isinstance(v, tuple) and v[1] is not None:
            rec["tflops"] = v[1]
        print(json.dumps(rec), flush=True)

    def tot(prefix):
        return sum((v[0] if isinstance(v, tuple) else v)
                   for k, v in stages.items() if k.startswith(prefix))

    w_floor, g_floor = tot("w_"), tot("g_")
    n_g = len(GLOBALS)
    n_w = DEPTH - n_g
    summary = {
        "model": model, "batch": B,
        "window_block_floor_ms": round(w_floor, 2),
        "global_block_floor_ms": round(g_floor, 2),
        "blocks_floor_ms": round(n_w * w_floor + n_g * g_floor, 1),
        "note": "add measured patch/shuffle/neck from stage_probe_model.py",
    }
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
