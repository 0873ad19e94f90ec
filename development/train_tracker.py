"""Train and evaluate the packaged learned-tracker weights.

Trains the association scorer on HeLa-like deformable-cell sequences (the
offline stand-in for CTC DIC-C2DH-HeLa), evaluates learned vs native-greedy
linking on held-out sequences, and writes the weights to
micro_sam_tpu/assets/learned_tracker.npz (shipped with the package; the role
Trackastra's pretrained 'general_2d' plays for the reference).

Usage: python development/train_tracker.py [--steps 800] [--eval-only]
"""
import argparse
import json
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def evaluate(tracker, n_eval=4, seed0=1000):
    from micro_sam_tpu import learned_tracking as lt

    agg = {"learned": [], "greedy": []}
    for k in range(n_eval):
        images, segs, gt_links = lt.hela_like_tracking_sequence(
            n_frames=12, n_cells=5 + k % 3, division_prob=0.06, seed=seed0 + k)
        node_l, parents_l = tracker.link(segs, images)
        agg["learned"].append(lt.evaluate_tracking(segs, gt_links, node_l, parents_l))
        node_g, parents_g = lt.greedy_node_to_track(segs)
        agg["greedy"].append(lt.evaluate_tracking(segs, gt_links, node_g, parents_g))

    out = {}
    for name, results in agg.items():
        out[name] = {
            key: round(float(np.mean([r[key] for r in results])), 4)
            for key in results[0]
        }
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=800)
    ap.add_argument("--eval-only", action="store_true")
    args = ap.parse_args()

    from micro_sam_tpu import learned_tracking as lt

    if not args.eval_only:
        params = lt.train_hela_like_linker(n_steps=args.steps, verbose=True)
        os.makedirs(os.path.dirname(lt._PACKAGED_WEIGHTS), exist_ok=True)
        lt.save_linker(lt._PACKAGED_WEIGHTS, params)
        print("saved", lt._PACKAGED_WEIGHTS)

    tracker = lt.LearnedTracker.from_pretrained("general_2d")
    print(json.dumps(evaluate(tracker), indent=2))


if __name__ == "__main__":
    main()
