"""Instrumented end-to-end AMG loop (the bench's production-overlap path)
with per-phase wall timers: dispatch call, device-side completion, fetch
(survivor transfer), consume (C++ RLE + MaskData). Finds where the
end-to-end masks/s goes relative to the ~6k/s device decode rate.

Usage: python development/probe_amg_e2e.py [n_grid_side] [ppb]
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
    from micro_sam_tpu.models.sam import init_sam_params, Sam
    from micro_sam_tpu.predictor import SamPredictor, _AmgDecoder
    from micro_sam_tpu.instance_segmentation import AutomaticMaskGenerator
    from micro_sam_tpu.ops.amg_utils import build_point_grid

    side = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    ppb = int(sys.argv[2]) if len(sys.argv) > 2 else 256

    cfg = get_config("vit_b", compute_dtype="bfloat16")
    params = init_sam_params(jax.random.PRNGKey(0), cfg)
    sam = Sam(cfg, params)
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(1, 64, 64, 256), jnp.bfloat16)
    predictor = SamPredictor(sam)
    predictor.set_features(feats, (1024, 1024), (1024, 1024))

    grid_pts = (build_point_grid(side) * 1024).astype(np.float32)

    # realistic mask density: threshold at the ~2% logit quantile (same
    # calibration as bench.py)
    @jax.jit
    def decode16(feats16, pts, lbl):
        low, iou = sam.decode_masks(params, feats16, pts, lbl)
        return low
    f16 = jnp.broadcast_to(feats, (16,) + feats.shape[1:])
    pts16 = jnp.asarray(np.concatenate(
        [grid_pts[:16, None, :], np.zeros((16, 1, 2), np.float32)], 1))
    lbl16 = jnp.asarray(np.concatenate(
        [np.ones((16, 1), np.int32), -np.ones((16, 1), np.int32)], 1))
    low16 = decode16(f16, pts16, lbl16)
    mask_threshold = float(np.quantile(
        np.asarray(low16[:, 1:], np.float32), 0.98))

    probe = _AmgDecoder(predictor, mask_threshold=mask_threshold)
    _, iou_w, stab_w, _ = probe(grid_pts[:ppb])
    floors = (float(np.quantile(iou_w, 0.6)), float(np.quantile(stab_w, 0.6)))

    gen = AutomaticMaskGenerator(predictor, points_per_side=side,
                                 points_per_batch=ppb,
                                 prefilter_thresholds=floors)
    gen._amg_decoder = _AmgDecoder(predictor, 1.0,
                                   mask_threshold=mask_threshold,
                                   prefilter=floors)
    crop_box = [0, 0, 1024, 1024]
    # warmup/compile
    gen._consume_batch(
        _AmgDecoder.fetch(gen._dispatch_batch(grid_pts[:ppb], (1024, 1024))),
        grid_pts[:ppb], crop_box, (1024, 1024))

    chunks = [grid_pts[s:s + ppb]
              for s in range(0, len(grid_pts) - ppb + 1, ppb)]

    t_dispatch, t_fetch, t_consume = [], [], []
    n_masks, areas = 0, []
    from concurrent import futures as _futures

    def timed_fetch(handles):
        t0 = time.perf_counter()
        out = _AmgDecoder.fetch(handles)
        t_fetch.append(time.perf_counter() - t0)
        return out

    t_all0 = time.perf_counter()
    with _futures.ThreadPoolExecutor(max_workers=1) as fetcher:
        queue = []

        def consume(fut_pts):
            nonlocal n_masks
            fut, pts = fut_pts
            fetched = fut.result()
            t0 = time.perf_counter()
            data = gen._consume_batch(fetched, pts, crop_box, (1024, 1024))
            t_consume.append(time.perf_counter() - t0)
            n_masks += len(data["rles"])
            for rle in data["rles"][:8]:
                areas.append(sum(rle["counts"][1::2]))

        for chunk in chunks:
            t0 = time.perf_counter()
            handles = gen._dispatch_batch(chunk, (1024, 1024))
            t_dispatch.append(time.perf_counter() - t0)
            queue.append((fetcher.submit(timed_fetch, handles), chunk))
            if len(queue) > 1:
                consume(queue.pop(0))
        for fut_pts in queue:
            consume(fut_pts)
    total = time.perf_counter() - t_all0

    ms = lambda ts: [round(t * 1e3, 1) for t in ts]
    print(json.dumps({
        "batches": len(chunks), "ppb": ppb,
        "mask_threshold": round(mask_threshold, 4),
        "mean_mask_area_frac": round(float(np.mean(areas)) / 1024 ** 2, 4)
        if areas else 0.0,
        "n_masks": n_masks,
        "total_ms": round(total * 1e3, 1),
        "masks_per_sec": round(n_masks / total, 1),
        "dispatch_ms": ms(t_dispatch),
        "fetch_ms": ms(t_fetch),
        "consume_ms": ms(t_consume),
    }), flush=True)


if __name__ == "__main__":
    main()
