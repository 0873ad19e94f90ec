"""A/B the AMG crop-transfer window size on the trained-fixture workload
(round-5). Steady-state end-to-end masks/s per CROP_SIZE, warm pass first
(the pow2-bucket slice programs otherwise compile inside the timed loop).

Usage: python development/probe_amg_crop.py [crop ...]   (default 256 384 512)
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import _load_bench_fixture
    from micro_sam_tpu.models.sam import Sam, preprocess
    from micro_sam_tpu.predictor import SamPredictor, _AmgDecoder
    from micro_sam_tpu.instance_segmentation import AutomaticMaskGenerator
    from micro_sam_tpu.sample_data import synthetic_data
    from micro_sam_tpu.ops.amg_utils import build_point_grid

    crops = [int(a) for a in sys.argv[1:]] or [256, 384, 512]

    fixture = os.path.join(os.path.dirname(__file__), os.pardir,
                           "tests", "fixtures", "bench_sam_tiny1024.npz")
    cfg, params = _load_bench_fixture(fixture)
    sam = Sam(cfg, params)
    predictor = SamPredictor(sam)
    image, _ = synthetic_data(shape=(1024, 1024), seed=200, n_objects=20,
                              radius_range=(30, 110))
    px = jnp.asarray(np.stack([image] * 3, -1), jnp.float32)[None]
    feats = jax.jit(lambda p, v: sam.encode_image(p, preprocess(v, 1024)))(
        params, px)
    predictor.set_features(feats, (1024, 1024), (1024, 1024))

    grid_pts = (build_point_grid(32) * 1024).astype(np.float32)
    ppb = 256
    probe = _AmgDecoder(predictor, mask_threshold=0.0)
    _, iou_w, stab_w, _ = probe(grid_pts[:ppb])
    floors = (float(np.quantile(iou_w, 0.6)), float(np.quantile(stab_w, 0.6)))
    print(f"floors={floors}", flush=True)

    from concurrent import futures as _futures
    chunks = [grid_pts[s:s + ppb]
              for s in range(0, len(grid_pts) - ppb + 1, ppb)]
    crop_box = [0, 0, 1024, 1024]

    for cs in crops:
        _AmgDecoder.CROP_SIZE = cs
        gen = AutomaticMaskGenerator(
            predictor, points_per_side=32, points_per_batch=ppb,
            prefilter_thresholds=floors)
        gen._amg_decoder = _AmgDecoder(
            predictor, 1.0, mask_threshold=0.0, prefilter=floors)
        # warm: compiles + pow2 buckets
        for chunk in chunks:
            gen._consume_batch(
                _AmgDecoder.fetch(gen._dispatch_batch(chunk, (1024, 1024))),
                chunk, crop_box, (1024, 1024))

        best = 0.0
        for _ in range(3):
            n_masks, nfit = 0, [0, 0]
            t0 = time.perf_counter()
            with _futures.ThreadPoolExecutor(max_workers=2) as fetcher:
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

                for chunk in chunks:
                    queue.append((fetcher.submit(
                        _AmgDecoder.fetch,
                        gen._dispatch_batch(chunk, (1024, 1024))), chunk))
                    if len(queue) > 2:
                        consume(queue.pop(0))
                for fut_pts in queue:
                    consume(fut_pts)
            rate = n_masks / (time.perf_counter() - t0)
            best = max(best, rate)
        fitf = nfit[0] / nfit[1] if nfit[1] else float("nan")
        print(f"crop={cs:4d}  masks_per_sec={best:7.1f}  n={n_masks} "
              f"fit_frac={fitf:.3f}", flush=True)


if __name__ == "__main__":
    main()
