"""A/B the patch-embed formulations on the chip (round-5: the bisect put
patch+pos+neck at ~4.0 ms/batch-4 while the matmul floor is ~0.5 ms — the
space-to-depth transpose (B,1024,1024,3)->(B,64,64,768) is the difference).

Variants:
  s2d     — current: 6-D reshape + transpose + one K=768 matmul
  rowsum  — transpose-free: x viewed (B, 64, 16, 64, 48) by FREE reshapes
            (both splits cut contiguous dims), one K=48 matmul per pixel-row
            r with weight slab w[r] (48, C), accumulated. Same FLOPs, no
            relayout; K=48 underfills the MXU but the op is tiny.
  conv    — XLA stride-16 conv (the historical 2.2x-slower baseline)

Usage: python development/probe_patch_embed.py [C] [batch]
"""
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    C = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    ps = 16
    dt = jnp.bfloat16

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, 1024, 1024, 3), dt)
    w = jnp.asarray(rng.randn(ps, ps, 3, C) * 0.02, dt)
    b = jnp.asarray(rng.randn(C) * 0.02, jnp.float32)

    def s2d(x):
        xp = x.reshape(B, 64, ps, 64, ps, 3).transpose(0, 1, 3, 2, 4, 5)
        xp = xp.reshape(B, 64, 64, ps * ps * 3)
        y = jnp.dot(xp, w.reshape(-1, C), preferred_element_type=jnp.float32)
        return (y + b).astype(dt)

    def rowsum(x):
        # (B, 1024, 1024, 3) -> (B, 64, 16, 64, 48): both splits are of
        # contiguous dims, so no data movement
        xr = x.reshape(B, 64, ps, 64, ps * 3)
        wr = w.reshape(ps, ps * 3, C)  # row r slab
        y = jnp.einsum("bhrwk,rkc->bhwc", xr, wr,
                       preferred_element_type=jnp.float32)
        return (y + b).astype(dt)

    def rowsum_unrolled(x):
        xr = x.reshape(B, 64, ps, 64, ps * 3)
        wr = w.reshape(ps, ps * 3, C)
        y = jnp.zeros((B, 64, 64, C), jnp.float32)
        for r in range(ps):
            y = y + jnp.dot(xr[:, :, r], wr[r],
                            preferred_element_type=jnp.float32)
        return (y + b).astype(dt)

    def conv(x):
        y = lax.conv_general_dilated(
            x, w, (ps, ps), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return (y + b).astype(dt)

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

    base = timeit(lambda x: x * 1.000001, iters=1)  # dispatch baseline ~RTT
    ref = np.asarray(s2d(x), np.float32)
    for name, f in [("s2d", s2d), ("rowsum", rowsum),
                    ("rowsum_unrolled", rowsum_unrolled), ("conv", conv)]:
        got = np.asarray(f(x), np.float32)
        err = float(np.max(np.abs(got - ref)))
        ms = timeit(f)
        print(f"{name:16s} {ms:7.3f} ms  max|err|={err:.4f}", flush=True)


if __name__ == "__main__":
    main()
