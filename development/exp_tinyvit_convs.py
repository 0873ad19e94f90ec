"""On-chip experiments: TinyViT conv/attention reformulations.

Per-program dispatch through the axon tunnel costs ~1-2 ms, which swamps
micro-benchmarks. So each candidate op is timed INSIDE one jitted program:
a fori_loop whose carry feeds a 1-element perturbation of the input back in
(defeats loop hoisting; serializes iterations), and the reported number is
the marginal time between n=24 and n=4 iterations — dispatch and fence
overhead cancel in the difference.
"""
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N_LO, N_HI = 4, 24


def marginal_ms(op, x, label="", reps=6):
    """Marginal per-iteration time of op(x) inside one program."""
    def run(x, n):
        def body(i, carry):
            x, acc = carry
            y = op(x)
            s = jnp.sum(y.astype(jnp.float32))
            x = jax.lax.dynamic_update_index_in_dim(
                x.reshape(-1), x.reshape(-1)[0] + (s * 1e-30).astype(x.dtype), 0, 0
            ).reshape(x.shape)
            return (x, acc + s)
        return jax.lax.fori_loop(0, n, body, (x, jnp.float32(0)))[1]

    lo = jax.jit(partial(run, n=N_LO))
    hi = jax.jit(partial(run, n=N_HI))
    float(lo(x)); float(hi(x))  # compile + warm

    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter(); float(lo(x)); t_lo = time.perf_counter() - t0
        t0 = time.perf_counter(); float(hi(x)); t_hi = time.perf_counter() - t0
        best = min(best, (t_hi - t_lo) / (N_HI - N_LO))
    ms = best * 1e3
    print(f"  {label:46s} {ms:8.3f} ms")
    return ms


def check(ref_fn, new_fn, x, label=""):
    r = np.asarray(ref_fn(x), np.float32)
    n = np.asarray(new_fn(x), np.float32)
    print(f"   [{label}] max_err {np.abs(r - n).max():.5f}")


def conv_ref(x, w, stride):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")).astype(x.dtype)


def dw_ref(x, w, stride):
    C = x.shape[-1]
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C).astype(x.dtype)


def dw_shift(x, w, stride):
    B, H, W, C = x.shape
    Ho = (H - 1) // stride + 1
    Wo = (W - 1) // stride + 1
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = jnp.zeros((B, Ho, Wo, C), x.dtype)
    for di in range(3):
        for dj in range(3):
            sl = jax.lax.slice(
                xp, (0, di, dj, 0),
                (B, di + (Ho - 1) * stride + 1, dj + (Wo - 1) * stride + 1, C),
                (1, stride, stride, 1))
            out = out + sl * w[di, dj, 0].astype(x.dtype)
    return out


def _s2d(x):
    B, H, W, C = x.shape
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 4 * C)


def _s2d_kernel(w):
    C, O = w.shape[2], w.shape[3]
    K = np.zeros((2, 2, 2, 2, C, O), np.float32)
    for u in range(2):
        for a in range(2):
            if u == 0 and a == 0:
                continue
            di = 0 if (u == 0 and a == 1) else a + 1
            for v in range(2):
                for b in range(2):
                    if v == 0 and b == 0:
                        continue
                    dj = 0 if (v == 0 and b == 1) else b + 1
                    K[u, v, a, b] = w[di, dj]
    return jnp.asarray(K.reshape(2, 2, 4 * C, O))


def conv_s2d(x, k4):
    s = _s2d(x)
    return jax.lax.conv_general_dilated(
        s, k4.astype(x.dtype), (1, 1), [(1, 0), (1, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")).astype(x.dtype)


def main():
    on_tpu = jax.devices()[0].platform != "cpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    B = 8
    rng = np.random.RandomState(0)

    print("== dw 3x3 s1 (256^2, C=256; MBConv hidden) ==")
    x = jnp.asarray(rng.rand(B, 256, 256, 256), dtype)
    w = jnp.asarray(rng.rand(3, 3, 1, 256).astype(np.float32) * 0.1)
    marginal_ms(partial(dw_ref, w=w, stride=1), x, "XLA grouped conv")
    marginal_ms(partial(dw_shift, w=w, stride=1), x, "shifted-add")
    check(partial(dw_ref, w=w, stride=1), partial(dw_shift, w=w, stride=1), x, "dw s1")

    print("== dw 3x3 s1 (128^2, C=128; stage1 local_conv) ==")
    x = jnp.asarray(rng.rand(B, 128, 128, 128), dtype)
    w = jnp.asarray(rng.rand(3, 3, 1, 128).astype(np.float32) * 0.1)
    marginal_ms(partial(dw_ref, w=w, stride=1), x, "XLA grouped conv")
    marginal_ms(partial(dw_shift, w=w, stride=1), x, "shifted-add")

    print("== dw 3x3 s2 (256^2->128^2, C=128; merge0) ==")
    x = jnp.asarray(rng.rand(B, 256, 256, 128), dtype)
    w = jnp.asarray(rng.rand(3, 3, 1, 128).astype(np.float32) * 0.1)
    marginal_ms(partial(dw_ref, w=w, stride=2), x, "XLA grouped conv")
    marginal_ms(partial(dw_shift, w=w, stride=2), x, "shifted-add")
    check(partial(dw_ref, w=w, stride=2), partial(dw_shift, w=w, stride=2), x, "dw s2")

    print("== patch conv1: 3x3 s2, 1024^2, 3->32 ==")
    x = jnp.asarray(rng.rand(B, 1024, 1024, 3), dtype)
    w = jnp.asarray(rng.rand(3, 3, 3, 32).astype(np.float32) * 0.1)
    k4 = _s2d_kernel(np.asarray(w))
    marginal_ms(partial(conv_ref, w=w, stride=2), x, "XLA conv")
    marginal_ms(partial(conv_s2d, k4=k4), x, "s2d + 2x2 conv")
    check(partial(conv_ref, w=w, stride=2), partial(conv_s2d, k4=k4), x, "conv1")

    print("== patch conv2: 3x3 s2, 512^2, 32->64 ==")
    x = jnp.asarray(rng.rand(B, 512, 512, 32), dtype)
    w = jnp.asarray(rng.rand(3, 3, 32, 64).astype(np.float32) * 0.1)
    k4 = _s2d_kernel(np.asarray(w))
    marginal_ms(partial(conv_ref, w=w, stride=2), x, "XLA conv")
    marginal_ms(partial(conv_s2d, k4=k4), x, "s2d + 2x2 conv")
    check(partial(conv_ref, w=w, stride=2), partial(conv_s2d, k4=k4), x, "conv2")

    print("== 1x1 convs (MBConv expand/shrink at 256^2) ==")
    x = jnp.asarray(rng.rand(B, 256, 256, 64), dtype)
    w = jnp.asarray(rng.rand(1, 1, 64, 256).astype(np.float32) * 0.1)
    marginal_ms(partial(conv_ref, w=w, stride=1), x, "1x1 64->256 XLA conv")

    print("== neck 3x3 s1, 64^2, 256->256 ==")
    x = jnp.asarray(rng.rand(B, 64, 64, 256), dtype)
    w = jnp.asarray(rng.rand(3, 3, 256, 256).astype(np.float32) * 0.02)
    marginal_ms(partial(conv_ref, w=w, stride=1), x, "XLA conv")


if __name__ == "__main__":
    main()
