"""Calibrate choose_linker's thresholds: print estimate_linking_signals and
the resulting choice for every adversarial regime plus the learned linker's
win regime (small fast objects). The right answer per regime comes from the
measured table in doc/tracking_robustness.md.

Usage: JAX_PLATFORMS=cpu python development/calibrate_tracker_choice.py
"""
import json

import numpy as np

from micro_sam_tpu.learned_tracking import (
    TRACKING_REGIMES, choose_linker, hela_like_tracking_sequence)


def main():
    # measured winner by div F1 (links are near-tied): regime -> best linker
    expected = {
        "slow_drift": "greedy", "fast_drift": "greedy",
        "occlusion_gap2": "learned", "birth_death_churn": "learned",
        "dense_touching": "either",
        "extreme_drift_10": "greedy", "extreme_drift_16": "greedy",
        "small_fast_win": "learned",
    }
    regimes = dict(TRACKING_REGIMES)
    regimes["extreme_drift_10"] = dict(drift_scale=10.0, division_prob=0.05)
    regimes["extreme_drift_16"] = dict(drift_scale=16.0, division_prob=0.05)

    ok = True
    for name, kwargs in regimes.items():
        for seed in range(4):
            _, segs, _ = hela_like_tracking_sequence(
                n_frames=12, seed=1000 + seed, **kwargs)
            choice, s = choose_linker(segs)
            good = expected[name] in (choice, "either")
            ok &= good
            print(json.dumps({"regime": name, "seed": seed, "choice": choice,
                              "ok": good,
                              **{k: round(v, 3) for k, v in s.items()}}),
                  flush=True)

    from micro_sam_tpu.learned_tracking import synthetic_tracking_sequence
    for seed in range(4):
        _, segs, _ = synthetic_tracking_sequence(seed=seed)
        choice, s = choose_linker(np.asarray(segs))
        good = choice == "learned"
        ok &= good
        print(json.dumps({"regime": "small_fast_win", "seed": seed,
                          "choice": choice, "ok": good,
                          **{k: round(v, 3) for k, v in s.items()}}),
              flush=True)
    print("ALL OK" if ok else "MISCLASSIFIED REGIMES PRESENT")


if __name__ == "__main__":
    main()
