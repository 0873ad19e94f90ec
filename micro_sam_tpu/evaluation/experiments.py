"""Predefined experiment settings for evaluation
(reference micro_sam/evaluation/experiments.py)."""
from __future__ import annotations

from typing import Dict, List, Optional

# The prompt settings for the experiments.
ExperimentSetting = Dict


def full_experiment_settings(
    use_boxes: bool = False,
    positive_range: Optional[List[int]] = None,
    negative_range: Optional[List[int]] = None,
) -> List[ExperimentSetting]:
    """The full experiment settings (reference experiments.py:13):
    p in {1,2,4,8,16} x n in {0,...,16} (+ box settings)."""
    experiment_settings = []
    if use_boxes:
        experiment_settings.append({"use_points": False, "use_boxes": True,
                                    "n_positives": 0, "n_negatives": 0})

    if positive_range is None:
        positive_range = [1, 2, 4, 8, 16]
    if negative_range is None:
        negative_range = [0, 1, 2, 4, 8, 16]

    for n_positives in positive_range:
        for n_negatives in negative_range:
            if n_positives == 0 and n_negatives == 0:
                continue
            experiment_settings.append({
                "use_points": True, "use_boxes": use_boxes,
                "n_positives": n_positives, "n_negatives": n_negatives,
            })
    return experiment_settings


def default_experiment_settings() -> List[ExperimentSetting]:
    """The four default settings (reference experiments.py:51):
    p1-n0, p2-n4, p4-n8 and box."""
    return [
        {"use_points": True, "use_boxes": False, "n_positives": 1, "n_negatives": 0},
        {"use_points": True, "use_boxes": False, "n_positives": 2, "n_negatives": 4},
        {"use_points": True, "use_boxes": False, "n_positives": 4, "n_negatives": 8},
        {"use_points": False, "use_boxes": True, "n_positives": 0, "n_negatives": 0},
    ]


def get_experiment_setting_name(setting: ExperimentSetting) -> str:
    """Name for an experiment setting (reference experiments.py:69)."""
    use_points, use_boxes = setting["use_points"], setting["use_boxes"]
    assert use_points or use_boxes
    prefix = "points" if use_points else "box"
    if use_points:
        pos, neg = setting["n_positives"], setting["n_negatives"]
        name = f"p{pos}-n{neg}"
        if use_boxes:
            prefix = "box-and-points"
        return f"{prefix}-{name}"
    return prefix
