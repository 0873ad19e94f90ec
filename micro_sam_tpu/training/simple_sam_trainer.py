"""Simplified trainers: single-iteration prompting (reference
micro_sam/training/simple_sam_trainer.py)."""
from __future__ import annotations

import random

from .sam_trainer import SamTrainer


class SimpleSamTrainer(SamTrainer):
    """Trains with a single prompting round per step: either one point or one
    box (reference simple_sam_trainer.py:6)."""

    def __init__(self, *args, use_points: bool = True, use_box: bool = True, **kwargs):
        kwargs.setdefault("n_sub_iteration", 1)
        kwargs.setdefault("mask_prob", 0.0)
        super().__init__(*args, **kwargs)
        self.use_points = use_points
        self.use_box = use_box

    def _get_prompt_and_multimasking_choices(self, iteration):
        if self.use_points and self.use_box:
            if random.random() < 0.5:
                return True, False, True, 1, 0
            return False, True, False, 0, 0
        if self.use_points:
            return True, False, True, 1, 0
        return False, True, False, 0, 0

    def _get_prompt_and_multimasking_choices_for_val(self, iteration):
        if self.use_points and self.use_box:
            return (True, False, True, 1, 0) if iteration % 2 == 0 else (False, True, False, 0, 0)
        if self.use_points:
            return True, False, True, 1, 0
        return False, True, False, 0, 0


class MedSAMTrainer(SimpleSamTrainer):
    """Box-prompt-only trainer (MedSAM recipe; reference simple_sam_trainer.py:60)."""

    def __init__(self, *args, **kwargs):
        kwargs["use_points"] = False
        kwargs["use_box"] = True
        super().__init__(*args, **kwargs)
