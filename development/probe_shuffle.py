"""A/B window partition/unpartition relayouts (round-5: the encoder bisect
attributes ~2.1 ms/run (vit_l) and ~2.6 ms/run (vit_h) to the XLA
partition/unpartition transposes — 8.5/10.4 ms per encode).

Variants for the roundtrip (B, G, G, C) -> (BW, N, C) -> (B, G, G, C):
  xla    — current: pad + 6-D reshape/transpose both ways
  pallas — pad (XLA) + band relayout kernel: grid (B, nH); each program DMAs
           one 14-row band contiguously and does the window interleave as an
           in-VMEM sublane transpose (14, nW, w*C) <-> (nW, 14, w*C)

Usage: python development/probe_shuffle.py [C] [batch]
"""
import functools
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import os
    os.environ.setdefault("MSAM_TPU_FUSED_BLOCK", "1")
    sys.path.insert(0, "/root/repo")
    from micro_sam_tpu.models.image_encoder import (
        window_partition, window_unpartition)

    C = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    G, w = 64, 14
    nH = -(-G // w)           # 5
    Hp = nH * w               # 70
    dt = jnp.bfloat16

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, G, G, C), dt)

    def xla_roundtrip(x):
        xw, pad_hw = window_partition(x, w)
        xw = xw * 1.000001  # keep the pair from cancelling
        return window_unpartition(xw, w, pad_hw, (G, G))

    # --- pallas band kernels -------------------------------------------
    def _part_kernel(x_ref, o_ref):
        # x_ref: (1, 1, w, nW * w * C) one band; o: (1, nW, w, w * C)
        xb = x_ref[...].reshape(w, nH, w * C)
        o_ref[...] = xb.transpose(1, 0, 2).reshape(1, nH, w, w * C)

    def _unpart_kernel(x_ref, o_ref):
        # x_ref: (1, nW, w, w * C); o: (1, 1, w, nW * w * C)
        xb = x_ref[...].reshape(nH, w, w * C)
        o_ref[...] = xb.transpose(1, 0, 2).reshape(1, 1, w, nH * w * C)

    interpret = jax.default_backend() == "cpu"

    def pallas_partition(xp):
        # xp: (B, Hp, Wp, C) padded
        x4 = xp.reshape(B, nH, w, nH * w * C)
        out = pl.pallas_call(
            _part_kernel,
            grid=(B, nH),
            in_specs=[pl.BlockSpec((1, 1, w, nH * w * C),
                                   lambda b, i: (b, i, 0, 0))],
            out_specs=pl.BlockSpec((1, nH, w, w * C),
                                   lambda b, i: (b * nH + i, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B * nH, nH, w, w * C), dt),
            interpret=interpret,
        )(x4)
        return out.reshape(B * nH * nH, w * w, C)

    def pallas_unpartition(xw):
        xw4 = xw.reshape(B * nH, nH, w, w * C)
        out = pl.pallas_call(
            _unpart_kernel,
            grid=(B, nH),
            in_specs=[pl.BlockSpec((1, nH, w, w * C),
                                   lambda b, i: (b * nH + i, 0, 0, 0))],
            out_specs=pl.BlockSpec((1, 1, w, nH * w * C),
                                   lambda b, i: (b, i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, nH, w, nH * w * C), dt),
            interpret=interpret,
        )(xw4)
        return out.reshape(B, Hp, Hp, C)

    def pallas_roundtrip(x):
        pad = Hp - G
        xp = jnp.pad(x, ((0, 0), (0, pad), (0, pad), (0, 0)))
        xw = pallas_partition(xp)
        xw = xw * 1.000001
        return pallas_unpartition(xw)[:, :G, :G, :]

    # correctness
    ref = np.asarray(xla_roundtrip(x), np.float32)
    got = np.asarray(pallas_roundtrip(x), np.float32)
    err = float(np.max(np.abs(got - ref)))
    xw_ref, _ = window_partition(x, w)
    xw_got = pallas_roundtrip.__wrapped__ if False else None
    pad = Hp - G
    xp = jnp.pad(x, ((0, 0), (0, pad), (0, pad), (0, 0)))
    err_p = float(np.max(np.abs(
        np.asarray(pallas_partition(xp), np.float32)
        - np.asarray(xw_ref.reshape(-1, w * w, C), np.float32))))
    print(f"roundtrip max|err|={err:.5f}  partition max|err|={err_p:.5f}",
          flush=True)

    def timeit(f, iters=30):
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

    for name, f in [("xla", xla_roundtrip), ("pallas", pallas_roundtrip)]:
        print(f"{name:8s} {timeit(f):7.3f} ms/roundtrip", flush=True)


if __name__ == "__main__":
    main()
