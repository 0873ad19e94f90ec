"""Cold-cache compile + numerics check for the Pallas encoder kernels.

The scoped-VMEM failure mode that zeroed round 1's bench and rc=1'd round 2's
first run is only visible on a FRESH compile: the persistent compilation
cache (/tmp/jax_cache) serves stale-but-working executables, so a kernel edit
that grows the scoped stack passes every warm run and then OOMs on the
driver's cold compile. This script compiles with NO persistent cache and must
be run on the real chip before committing any kernel change.

Usage:  python development/cold_compile_check.py [--full-encoder]

Prints one JSON line: {"ok": bool, "global_ms": ..., "max_err": ...}
"""
import argparse
import json
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full-encoder", action="store_true",
                    help="also compile+time the full vit_b encoder")
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    # NO jax_compilation_cache_dir: that is the point of this script.

    platform = jax.devices()[0].platform
    out = {"platform": platform}
    if platform == "cpu":
        print(json.dumps({"ok": False, "error": "needs the real chip"}))
        return 1

    from micro_sam_tpu.models.image_encoder import init_block
    from micro_sam_tpu.ops.fused_window_block import (
        fused_global_block, _unfused_reference)

    # vit_b global-block shape: N=4096, C=768, 12 heads, bf16
    C, nH, HW = 768, 12, 64
    N = HW * HW
    B = args.batch
    key = jax.random.PRNGKey(0)
    bp = init_block(key, C, nH, 4.0, (HW, HW), use_rel_pos=True)
    bp["attn"]["rel_pos_h"] = 0.1 * jax.random.normal(
        jax.random.PRNGKey(1), bp["attn"]["rel_pos_h"].shape)
    bp["attn"]["rel_pos_w"] = 0.1 * jax.random.normal(
        jax.random.PRNGKey(2), bp["attn"]["rel_pos_w"].shape)
    bp = jax.tree.map(lambda a: a.astype(jnp.bfloat16), bp)
    x = jax.random.normal(jax.random.PRNGKey(3), (B, N, C), jnp.bfloat16)

    fused = jax.jit(lambda x_, p_: jnp.sum(
        fused_global_block(x_, p_, (HW, HW), nH).astype(jnp.float32),
        axis=(1, 2)))
    t0 = time.perf_counter()
    y = fused(x, bp)          # cold compile happens here
    ycs = np.asarray(y)       # fetch fences (tunnel: block_until_ready lies)
    out["compile_s"] = round(time.perf_counter() - t0, 1)

    # numerics vs the unfused composition (bf16 tolerance)
    ref = jax.jit(lambda x_, p_: _unfused_reference(x_, None, p_, (HW, HW), nH))
    yf = jax.jit(lambda x_, p_: fused_global_block(x_, p_, (HW, HW), nH))
    a = np.asarray(yf(x, bp)).astype(np.float32)
    b = np.asarray(ref(x, bp)).astype(np.float32)
    scale = np.abs(b).max()
    out["max_err"] = float(np.abs(a - b).max())
    out["rel_err"] = float(np.abs(a - b).max() / scale)

    # timing: scan-repeat in-graph with a carry so XLA can't DCE or hoist
    def step(c, _):
        o = fused_global_block(c, bp, (HW, HW), nH)
        return o, ()
    reps = 10
    timed = jax.jit(lambda x_: jnp.sum(
        jax.lax.scan(step, x_, (), length=reps)[0].astype(jnp.float32)))
    float(timed(x))
    t0 = time.perf_counter()
    chk = timed(x)
    float(chk)
    out["global_ms"] = round((time.perf_counter() - t0) / reps * 1e3, 2)

    # window-STACK kernel at vit_b window geometry (NW=25, N=196, C=768)
    from micro_sam_tpu.ops.fused_window_block import (
        fused_window_stack, window_stack_config)
    Wn = 14
    Nw = Wn * Wn
    NW = 25
    bw = init_block(jax.random.PRNGKey(4), C, nH, 4.0, (Wn, Wn), use_rel_pos=True)
    bw["attn"]["rel_pos_h"] = 0.1 * jax.random.normal(
        jax.random.PRNGKey(5), bw["attn"]["rel_pos_h"].shape)
    bw["attn"]["rel_pos_w"] = 0.1 * jax.random.normal(
        jax.random.PRNGKey(6), bw["attn"]["rel_pos_w"].shape)
    bw = jax.tree.map(lambda a: a.astype(jnp.bfloat16), bw)
    assert window_stack_config(NW, Nw, C, 4 * C, jnp.bfloat16) is not None
    xw = jax.random.normal(jax.random.PRNGKey(7), (B * NW, Nw, C), jnp.bfloat16)

    fws = jax.jit(lambda x_, p_: fused_window_stack(x_, None, p_, (Wn, Wn), nH, B))
    t0 = time.perf_counter()
    yw = np.asarray(fws(xw, bw)).astype(np.float32)
    out["wstack_compile_s"] = round(time.perf_counter() - t0, 1)
    refw = np.asarray(jax.jit(
        lambda x_, p_: _unfused_reference(x_, None, p_, (Wn, Wn), nH))(xw, bw)
    ).astype(np.float32)
    out["wstack_rel_err"] = float(
        np.abs(yw - refw).max() / max(np.abs(refw).max(), 1e-6))

    def wstep(c, _):
        return fused_window_stack(c, None, bw, (Wn, Wn), nH, B), ()
    reps = 10
    timedw = jax.jit(lambda x_: jnp.sum(
        jax.lax.scan(wstep, x_, (), length=reps)[0].astype(jnp.float32)))
    float(timedw(xw))
    t0 = time.perf_counter()
    chk = timedw(xw)
    float(chk)
    out["wstack_ms"] = round((time.perf_counter() - t0) / reps * 1e3, 2)

    # vit_t fused kernels (tiny attention + MBConv + block tail) at the
    # production batch-8 1024^2 geometry: cold compile + fused-vs-unfused
    # numerics (unfused path differs by the bf16 tanh-gelu, so the gate is
    # relative)
    import os as _os
    from micro_sam_tpu.models import tiny_vit as tv
    tvp = tv.init_tiny_vit(jax.random.PRNGKey(8))
    pxt = jnp.asarray(np.random.rand(B, 1024, 1024, 3), jnp.bfloat16)
    enc_t = jax.jit(lambda px: (lambda f: (f, jnp.sum(f.astype(jnp.float32))))(
        tv.apply_tiny_vit(tvp, px)))
    t0 = time.perf_counter()
    ft, ct = enc_t(pxt)
    float(ct)
    out["tiny_compile_s"] = round(time.perf_counter() - t0, 1)
    ft = np.asarray(ft).astype(np.float32)
    _os.environ["MSAM_TPU_FUSED_TINY"] = "0"
    try:
        rt = np.asarray(jax.jit(lambda px: tv.apply_tiny_vit(tvp, px))(pxt)
                        ).astype(np.float32)
    finally:
        _os.environ.pop("MSAM_TPU_FUSED_TINY", None)
    out["tiny_rel_err"] = float(
        np.abs(ft - rt).max() / max(np.abs(rt).max(), 1e-6))
    n_iter = 10
    t0 = time.perf_counter()
    for _ in range(n_iter):
        ft2, ct = enc_t(pxt)
    float(ct)
    out["tiny_tiles_per_s"] = round(n_iter * B / (time.perf_counter() - t0), 1)

    if args.full_encoder:
        from micro_sam_tpu.models.build_sam import get_config
        from micro_sam_tpu.models.sam import init_sam_params, Sam, preprocess
        cfg = get_config("vit_b", compute_dtype="bfloat16")
        params = init_sam_params(jax.random.PRNGKey(0), cfg)
        sam = Sam(cfg, params)
        enc = jax.jit(lambda p_, px: (
            lambda f: (f, jnp.sum(f.astype(jnp.float32))))(
                sam.encode_image(p_, preprocess(px, cfg.img_size))))
        px = jnp.asarray(np.random.rand(B, 1024, 1024, 3).astype(np.float32) * 255)
        t0 = time.perf_counter()
        f, c = enc(params, px)
        float(c)
        out["encoder_compile_s"] = round(time.perf_counter() - t0, 1)
        n_iter = 10
        t0 = time.perf_counter()
        for _ in range(n_iter):
            f, c = enc(params, px)
        float(c)
        dt = time.perf_counter() - t0
        out["encoder_tiles_per_s"] = round(n_iter * B / dt, 2)

    # bf16 kernel vs bf16 reference at matched dtype: expect ~1e-1 absolute
    # on O(30) outputs (bf16 has ~2-3 decimal digits); gate on relative err
    out["ok"] = (out["rel_err"] < 2e-2 and out["wstack_rel_err"] < 2e-2
                 and out["tiny_rel_err"] < 5e-2)
    print(json.dumps(out))
    return 0 if out["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
