"""Per-component device timing for the AMG decode program (VERDICT r4 weak#2:
the compact pipeline cost ~23% of raw device rate — find where it goes).

Times, at the bench shapes (ppb=256 prompts x 3 masks, 1024^2 frame, bf16
vit_b, random init):
  decode_only      decode_masks + postprocess to full res (the irreducible part)
  scores           + stability/boxes/packbits-free scalar work
  legacy           _amg_decode_impl (packbits everything, no compaction)
  compact_nocrop   _amg_compact_impl with crop_size=None (argsort + full gather)
  compact          _amg_compact_impl full (crops + packed_big path)

Every program returns a checksum; a null-dispatch baseline is subtracted.
Usage: python development/probe_amg_device.py [ppb]
"""
import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    assert jax.devices()[0].platform != "cpu"

    from micro_sam_tpu.models.build_sam import get_config
    from micro_sam_tpu.models.sam import init_sam_params, Sam, postprocess_masks
    from micro_sam_tpu.ops.amg_utils import (
        batched_mask_to_box, calculate_stability_score)
    from micro_sam_tpu import predictor as pr

    ppb = int(sys.argv[1]) if len(sys.argv) > 1 else 256
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

    def timeit(fn, *args, loops=6):
        chk = fn(*args)
        jax.tree.map(lambda h: np.asarray(h).ravel()[:1], chk)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(loops):
                chk = fn(*args)
            jax.tree.map(lambda h: float(np.asarray(h).ravel()[0]) if h.size else 0,
                         chk)
            best = min(best, (time.perf_counter() - t0) / loops)
        return best * 1e3

    null = jax.jit(lambda x: jnp.sum(x))
    base_ms = timeit(null, jnp.zeros((8, 128), jnp.float32))

    @jax.jit
    def decode_only(params, feats, pts, lbl):
        low_res, iou = model.decode_masks(params, feats, pts, lbl)
        masks = postprocess_masks(low_res, size, size, model.config.img_size)
        return jnp.sum(masks[:, 1:].astype(jnp.float32)[:, :, ::97, ::97])

    @jax.jit
    def scores(params, feats, pts, lbl):
        low_res, iou = model.decode_masks(params, feats, pts, lbl)
        masks = postprocess_masks(low_res, size, size, model.config.img_size)[:, 1:]
        stab = calculate_stability_score(masks, 0.0, 1.0)
        boxes = batched_mask_to_box(masks > 0.0)
        return jnp.sum(iou) + jnp.sum(stab) + jnp.sum(boxes.astype(jnp.float32))

    import functools
    legacy = jax.jit(functools.partial(pr._amg_decode_impl, model),
                     static_argnums=(4, 5, 6, 7))
    compact_nocrop = jax.jit(functools.partial(pr._amg_compact_impl, model),
                             static_argnums=(5, 6, 7, 8, 9, 10, 11))
    compact = jax.jit(functools.partial(pr._amg_compact_impl, model),
                      static_argnums=(5, 6, 7, 8, 9, 10, 11))

    out = {"ppb": ppb, "dispatch_baseline_ms": round(base_ms, 2)}
    out["decode_only_ms"] = round(timeit(decode_only, params, feats_d, pts, lbl) - base_ms, 2)
    out["scores_ms"] = round(timeit(scores, params, feats_d, pts, lbl) - base_ms, 2)
    out["legacy_ms"] = round(timeit(
        lambda *a: legacy(*a, 0.0, 1.0, size, size)[1],
        params, feats_d, pts, lbl) - base_ms, 2)
    out["compact_nocrop_ms"] = round(timeit(
        lambda *a: compact_nocrop(
            *a, jnp.int32(ppb), 0.0, 1.0, size, size, 0.5, 0.5, None)["iou"],
        params, feats_d, pts, lbl) - base_ms, 2)
    out["compact_ms"] = round(timeit(
        lambda *a: compact(
            *a, jnp.int32(ppb), 0.0, 1.0, size, size, 0.5, 0.5, 256)["iou"],
        params, feats_d, pts, lbl) - base_ms, 2)
    for k in ("legacy_ms", "compact_nocrop_ms", "compact_ms"):
        out[k.replace("_ms", "_masks_per_s")] = round(ppb * 3 / out[k] * 1e3, 0)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
