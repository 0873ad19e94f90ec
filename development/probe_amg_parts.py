"""Sub-component device timing INSIDE the AMG decode program (round 5: the
whole program costs ~129 ms/256-prompt batch = 5.9k masks/s device floor;
find which stage eats it).

Each stage is timed as one in-graph lax.scan dispatch (carry-perturbed, null
baseline subtracted) at the bench shapes: 256 prompts x 4 masks, vit_b bf16,
1024^2 frame.

Usage: python development/probe_amg_parts.py [ppb] [iters]
"""
import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    assert jax.devices()[0].platform != "cpu"

    from micro_sam_tpu.models.build_sam import get_config
    from micro_sam_tpu.models.sam import init_sam_params, Sam, postprocess_masks
    from micro_sam_tpu.ops.amg_utils import (
        batched_mask_to_box, calculate_stability_score)

    ppb = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    cfg = get_config("vit_b", compute_dtype="bfloat16")
    params = init_sam_params(jax.random.PRNGKey(0), cfg)
    model = Sam(cfg, params)

    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(1, 64, 64, 256), jnp.bfloat16)
    feats_d = jnp.broadcast_to(feats, (ppb,) + feats.shape[1:])
    pts = jnp.asarray(np.concatenate(
        [rng.rand(ppb, 1, 2).astype(np.float32) * 1024,
         np.zeros((ppb, 1, 2), np.float32)], axis=1))
    lbl = jnp.asarray(np.concatenate(
        [np.ones((ppb, 1), np.int32), -np.ones((ppb, 1), np.int32)], axis=1))
    size = (1024, 1024)

    def scan_time(body1, *args):
        @jax.jit
        def run(*args):
            def body(c, _):
                return body1(c, *args), None
            s, _ = lax.scan(body, jnp.float32(0.0), None, length=ITERS)
            return s
        float(run(*args))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(*args))
            best = min(best, time.perf_counter() - t0)
        return best / ITERS * 1e3

    base = scan_time(lambda c: c * 1.000001)
    print(json.dumps({"stage": "baseline_ms", "ms": round(base, 3)}), flush=True)

    def t(name, body1, *args):
        ms = max(0.0, scan_time(body1, *args) - base)
        print(json.dumps({"stage": name, "ms": round(ms, 2)}), flush=True)
        return ms

    # 1. decoder transformer + upscaler + hypernet -> low-res logits
    def dec(c, feats, pts, lbl):
        low_res, iou = model.decode_masks(params, feats, pts + c, lbl)
        return jnp.sum(low_res[:, :, ::31, ::31].astype(jnp.float32)) + jnp.sum(iou)
    t("decode_lowres", dec, feats_d, pts, lbl)

    low_res, iou = model.decode_masks(params, feats_d, pts, lbl)
    low_res = jax.block_until_ready(low_res)
    print(json.dumps({"lowres_dtype": str(low_res.dtype),
                      "lowres_shape": list(low_res.shape)}), flush=True)

    # 2. postprocess (bilinear 256 -> 1024), all 4 channels as shipped
    def post4(c, lr):
        m = postprocess_masks(lr + c.astype(lr.dtype), size, size,
                              model.config.img_size)
        return jnp.sum(m[:, :, ::97, ::97].astype(jnp.float32))
    t("postprocess_4ch", post4, low_res)

    # 2b. postprocess with the unused channel dropped first
    def post3(c, lr):
        m = postprocess_masks(lr[:, 1:] + c.astype(lr.dtype), size, size,
                              model.config.img_size)
        return jnp.sum(m[:, :, ::97, ::97].astype(jnp.float32))
    t("postprocess_3ch", post3, low_res)

    # 2c. matmul-based two-pass resize (explicit bilinear weights)
    def resize_mm(lr):
        B, C, h, w = lr.shape
        H = 1024

        def bilin_matrix(n_in, n_out):
            # jax.image.resize "bilinear" (align_corners=False, half-pixel)
            scale = n_in / n_out
            out = np.arange(n_out, dtype=np.float64)
            src = (out + 0.5) * scale - 0.5
            lo = np.floor(src).astype(int)
            frac = src - lo
            m = np.zeros((n_in, n_out), np.float32)
            for j in range(n_out):
                l = min(max(lo[j], 0), n_in - 1)
                r = min(max(lo[j] + 1, 0), n_in - 1)
                m[l, j] += 1 - frac[j]
                m[r, j] += frac[j]
            return jnp.asarray(m)

        M = bilin_matrix(h, H).astype(lr.dtype)
        x = jnp.einsum("bchw,hH->bcHw", lr, M)
        return jnp.einsum("bcHw,wW->bcHW", x, M)

    def post3_mm(c, lr):
        m = resize_mm(lr[:, 1:] + c.astype(lr.dtype))
        return jnp.sum(m[:, :, ::97, ::97].astype(jnp.float32))
    t("postprocess_3ch_matmul", post3_mm, low_res)

    masks = postprocess_masks(low_res, size, size, model.config.img_size)[:, 1:]
    masks = jax.block_until_ready(masks)

    # 3. stability score on full-res masks
    t("stability", lambda c, m: jnp.sum(
        calculate_stability_score(m + c.astype(m.dtype), 0.0, 1.0)), masks)

    # 4. boxes
    t("boxes", lambda c, m: jnp.sum(
        batched_mask_to_box((m + c.astype(m.dtype)) > 0.0)
        .astype(jnp.float32)), masks)

    # 5. transpose + packbits
    def pack(c, m):
        bm = (m + c.astype(m.dtype)) > 0.0
        B, C, H, W = bm.shape
        tp = bm.transpose(0, 1, 3, 2).reshape(B * C, W, H)
        return jnp.sum(jnp.packbits(tp, axis=-1)[:, ::31, ::7]
                       .astype(jnp.float32))
    t("transpose_packbits", pack, masks)

    # 6. crop gather (dynamic_slice per mask)
    def crops(c, m):
        bm = (m + c.astype(m.dtype)) > 0.0
        B, C, H, W = bm.shape
        tp = bm.transpose(0, 1, 3, 2).reshape(B * C, W, H)
        cx = jnp.zeros((B * C,), jnp.int32)
        cr = jax.vmap(lambda mm, x0: lax.dynamic_slice(mm, (x0, x0), (256, 256))
                      )(tp, cx)
        return jnp.sum(jnp.packbits(cr, axis=-1)[:, ::31, ::7]
                       .astype(jnp.float32))
    t("crop_slice_pack", crops, masks)


if __name__ == "__main__":
    main()
