"""Validate the bench's synthetic-feature AMG workload (round-5, VERDICT
ask #3): masks must be compact blobs (crop-window transfers, realistic RLE),
mean area ~1-5% of the frame, and the end-to-end rate measured on that
honest workload.

Reports: calibrated threshold, survivor fraction, mean mask area fraction,
crop-fit fraction, end-to-end masks/s, device masks/s.

Usage: python development/probe_amg_density.py [points_per_side]
"""
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from micro_sam_tpu.models.build_sam import get_config
    from micro_sam_tpu.models.sam import init_sam_params, Sam
    from micro_sam_tpu.predictor import SamPredictor, _AmgDecoder
    from micro_sam_tpu.instance_segmentation import AutomaticMaskGenerator
    from micro_sam_tpu.ops.amg_utils import build_point_grid

    on_tpu = jax.devices()[0].platform != "cpu"
    cfg = get_config("vit_b", compute_dtype="bfloat16" if on_tpu else "float32")
    params = init_sam_params(jax.random.PRNGKey(0), cfg)
    sam = Sam(cfg, params)
    predictor = SamPredictor(sam)

    # synthetic coherent features (same recipe as bench.py)
    fshape = (1, 64, 64, 256)
    rng0 = np.random.RandomState(7)
    coarse = jnp.asarray(rng0.randn(1, 8, 8, 256), jnp.float32)
    smooth = np.asarray(jax.image.resize(coarse, fshape, "linear"))
    yy, xx = np.mgrid[0:64, 0:64]
    env = np.exp(-(((yy - 31.5) ** 2 + (xx - 31.5) ** 2) / (2.0 * 8.0 ** 2)))
    smooth = smooth * env[None, :, :, None].astype(np.float32)
    smooth = smooth / (smooth.std() + 1e-6)
    feats = jnp.asarray(smooth, cfg.dtype)
    predictor.set_features(feats, (1024, 1024), (1024, 1024))

    pps = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    grid_pts = (build_point_grid(pps) * 1024).astype(np.float32)
    ppb = 256

    @jax.jit
    def decode(params, feats, pts, lbl):
        low, iou = sam.decode_masks(params, feats, pts, lbl)
        return low, iou

    f16 = jnp.broadcast_to(feats, (16,) + feats.shape[1:])
    pts16 = jnp.asarray(np.concatenate(
        [grid_pts[:16, None, :], np.zeros((16, 1, 2), np.float32)], 1))
    lbl16 = jnp.asarray(np.concatenate(
        [np.ones((16, 1), np.int32), -np.ones((16, 1), np.int32)], 1))
    low16, _ = decode(params, f16, pts16, lbl16)
    TARGET = 0.02
    mask_threshold = float(np.quantile(
        np.asarray(low16[:, 1:], np.float32), 1.0 - TARGET))
    print(f"threshold={mask_threshold:.3f}", flush=True)

    probe = _AmgDecoder(predictor, mask_threshold=mask_threshold)
    _, iou_w, stab_w, boxes_w = probe(grid_pts[:ppb])
    floors = (float(np.quantile(iou_w, 0.6)), float(np.quantile(stab_w, 0.6)))
    bw = boxes_w[:, :, 2] - boxes_w[:, :, 0]
    bh = boxes_w[:, :, 3] - boxes_w[:, :, 1]
    print(f"floors={floors}  probe bbox w p50={np.median(bw):.0f} "
          f"p90={np.percentile(bw, 90):.0f} h p50={np.median(bh):.0f} "
          f"p90={np.percentile(bh, 90):.0f}", flush=True)

    gen = AutomaticMaskGenerator(
        predictor, points_per_side=pps, points_per_batch=ppb,
        prefilter_thresholds=floors)
    gen._amg_decoder = _AmgDecoder(
        predictor, 1.0, mask_threshold=mask_threshold, prefilter=floors)
    crop_box = [0, 0, 1024, 1024]
    first = gen._consume_batch(
        _AmgDecoder.fetch(gen._dispatch_batch(grid_pts[:ppb], (1024, 1024))),
        grid_pts[:ppb], crop_box, (1024, 1024))
    areas0 = [sum(r["counts"][1::2]) for r in first["rles"]]
    print(f"warmup: n={len(first['rles'])} mean_area_frac="
          f"{np.mean(areas0)/2**20:.4f}", flush=True)

    from concurrent import futures as _futures
    chunks = [grid_pts[s:s + ppb]
              for s in range(0, len(grid_pts) - ppb + 1, ppb)]
    n_masks, areas, nfit = 0, [], [0, 0]
    t0 = time.perf_counter()
    with _futures.ThreadPoolExecutor(max_workers=1) as fetcher:
        queue = []

        def consume(fut_pts):
            nonlocal n_masks
            fut, pts = fut_pts
            res = fut.result()
            if isinstance(res, dict) and "fits" in res:
                nfit[0] += int(res["fits"].sum())
                nfit[1] += len(res["fits"])
            data = gen._consume_batch(res, pts, crop_box, (1024, 1024))
            n_masks += len(data["rles"])
            for rle in data["rles"][:8]:
                areas.append(sum(rle["counts"][1::2]))

        for chunk in chunks:
            queue.append((fetcher.submit(
                _AmgDecoder.fetch,
                gen._dispatch_batch(chunk, (1024, 1024))), chunk))
            if len(queue) > 1:
                consume(queue.pop(0))
        for fut_pts in queue:
            consume(fut_pts)
    dt = time.perf_counter() - t0
    print(f"masks_per_sec={n_masks/dt:.1f}  n={n_masks} "
          f"survivor_frac={n_masks/(len(grid_pts)*3):.3f} "
          f"mean_area_frac={np.mean(areas)/2**20 if areas else 0:.4f} "
          f"fit_frac={nfit[0]/max(nfit[1],1):.3f}", flush=True)

    # device-only rates: legacy program (the bench's historical number) and
    # the compact program (prefilter + crop machinery in-graph)
    pts_d = jnp.asarray(np.concatenate(
        [grid_pts[:ppb, None, :], np.zeros((ppb, 1, 2), np.float32)], axis=1))
    lbl_d = jnp.asarray(np.concatenate(
        [np.ones((ppb, 1), np.int32), -np.ones((ppb, 1), np.int32)], axis=1))
    feats_d = jnp.broadcast_to(feats, (ppb,) + feats.shape[1:])
    _, iou_d, _, _ = probe._jit(params, feats_d, pts_d, lbl_d,
                                mask_threshold, 1.0, (1024, 1024), (1024, 1024))
    float(jnp.sum(iou_d))
    t0 = time.perf_counter()
    for _ in range(8):
        _, iou_d, _, _ = probe._jit(params, feats_d, pts_d, lbl_d,
                                    mask_threshold, 1.0, (1024, 1024),
                                    (1024, 1024))
    float(jnp.sum(iou_d))
    print(f"device_masks_per_sec_legacy={8*ppb*3/(time.perf_counter()-t0):.1f}",
          flush=True)

    dec = gen._amg_decoder
    h = dec.dispatch(grid_pts[:ppb])
    float(np.asarray(h["n"]))
    t0 = time.perf_counter()
    for _ in range(8):
        h = dec.dispatch(grid_pts[:ppb])
    float(np.asarray(h["n"]))
    print(f"device_masks_per_sec_compact={8*ppb*3/(time.perf_counter()-t0):.1f}",
          flush=True)


if __name__ == "__main__":
    main()
