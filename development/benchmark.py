"""Wall-clock benchmark harness (reference development/benchmark.py):
embedding compute, the four prompt variants, and AMG — printed as a pandas
table. Use --profile to additionally capture a jax profiler trace.

Example:
    python development/benchmark.py --model_type vit_b -n 3
    python development/benchmark.py --profile /tmp/trace
"""
import argparse
import time

import numpy as np
import pandas as pd


def _time(fn, n):
    fn()  # warmup/compile
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return min(times)


def benchmark_embeddings(predictor, image, n):
    from micro_sam_tpu.util import precompute_image_embeddings

    def run():
        precompute_image_embeddings(predictor, image, save_path=None, verbose=False)
    return [{"benchmark": "embeddings", "runtime": _time(run, n)}]


def benchmark_prompts(predictor, image, n, rng):
    from micro_sam_tpu import util
    from micro_sam_tpu.prompt_based_segmentation import (
        segment_from_box, segment_from_box_and_points, segment_from_points,
    )

    emb = util.precompute_image_embeddings(predictor, image, save_path=None, verbose=False)
    util.set_precomputed(predictor, emb)
    h, w = image.shape[:2]
    results = []

    # p1-n0
    pts, lbl = np.array([[h / 2, w / 2]]), np.array([1])
    results.append({"benchmark": "prompt-p1n0", "runtime": _time(
        lambda: segment_from_points(predictor, pts, lbl), n)})
    # p2-n4
    pts = rng.rand(6, 2) * [h, w]
    lbl = np.array([1, 1, 0, 0, 0, 0])
    results.append({"benchmark": "prompt-p2n4", "runtime": _time(
        lambda: segment_from_points(predictor, pts, lbl), n)})
    # box
    box = np.array([h * 0.25, w * 0.25, h * 0.75, w * 0.75])
    results.append({"benchmark": "prompt-box", "runtime": _time(
        lambda: segment_from_box(predictor, box), n)})
    # box and points
    results.append({"benchmark": "prompt-box-and-points", "runtime": _time(
        lambda: segment_from_box_and_points(
            predictor, box, np.array([[h / 2, w / 2]]), np.array([1])), n)})
    return results


def benchmark_amg(predictor, image, n):
    from micro_sam_tpu.instance_segmentation import AutomaticMaskGenerator

    amg = AutomaticMaskGenerator(predictor, points_per_side=32, points_per_batch=256)

    def run_init():
        amg.clear_state()
        amg.initialize(image, verbose=False)
    results = [{"benchmark": "amg-initialize", "runtime": _time(run_init, n)}]
    results.append({"benchmark": "amg-generate", "runtime": _time(
        lambda: amg.generate(), max(n, 1))})
    return results


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-m", "--model_type", default="vit_b")
    parser.add_argument("-c", "--checkpoint", default=None)
    parser.add_argument("-n", type=int, default=3, help="Timing repetitions.")
    parser.add_argument("--image_size", type=int, default=1024)
    parser.add_argument("--skip_amg", action="store_true")
    parser.add_argument("--profile", default=None,
                        help="Directory for a jax profiler trace of one embedding pass.")
    args = parser.parse_args()

    from micro_sam_tpu.sample_data import synthetic_data
    from micro_sam_tpu.util import get_sam_model

    image, _ = synthetic_data((args.image_size, args.image_size), seed=0)
    predictor = get_sam_model(model_type=args.model_type, checkpoint_path=args.checkpoint)

    rng = np.random.RandomState(0)
    results = []
    results.extend(benchmark_embeddings(predictor, image, args.n))
    results.extend(benchmark_prompts(predictor, image, args.n, rng))
    if not args.skip_amg:
        results.extend(benchmark_amg(predictor, image, max(1, args.n // 3)))

    if args.profile:
        import jax
        from micro_sam_tpu.util import precompute_image_embeddings
        with jax.profiler.trace(args.profile):
            precompute_image_embeddings(predictor, image, save_path=None, verbose=False)
        print(f"profiler trace written to {args.profile}")

    df = pd.DataFrame(results)
    df["runtime_ms"] = (df.pop("runtime") * 1e3).round(2)
    print(df.to_string(index=False))


if __name__ == "__main__":
    main()
