"""Joint training of SAM (iterative prompting) + UNETR decoder (AIS).

Counterpart of micro_sam/training/joint_sam_trainer.py: per batch, the SAM
iterative loss step runs first, then a second update through the UNETR decoder
on distance-channel targets (dice-based distance loss). The decoder reuses the
batch's image embeddings — in JAX both updates are separate jit programs
sharing the encoder forward inside the first one; the decoder step re-encodes
with stop_gradient (cheap relative to the SAM step and keeps programs simple).
"""
from __future__ import annotations

import os
import pickle
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .sam_trainer import SamLogger, SamTrainer, dice_score
from .util import value_and_grad_allow_int
from ..models import unetr as unetr_mod


class JointSamTrainer(SamTrainer):
    """SamTrainer + joint UNETR-decoder training (reference
    joint_sam_trainer.py:16).

    Args:
        unetr_params: Decoder parameter pytree (models/unetr.py layout).
        instance_loss / instance_metric: kept for API parity (dice-based
            distance loss is built in).
    """

    def __init__(self, *args, unetr=None, instance_loss=None, instance_metric=None,
                 **kwargs):
        super().__init__(*args, **kwargs)
        assert unetr is not None, "Pass unetr=<decoder params pytree>"
        self.unetr_params = unetr
        self.unetr_optimizer = optax.adamw(1e-5)
        self.unetr_opt_state = self.unetr_optimizer.init(self.unetr_params)
        self._unetr_step = None

    def _build_unetr_step(self):
        if self._unetr_step is not None:
            return self._unetr_step
        model = self.model

        def loss_fn(dec_params, sam_params, images, targets):
            feats = jax.lax.stop_gradient(model.image_embeddings_oft(sam_params, images))
            out = unetr_mod.apply_unetr_decoder(dec_params, feats)  # (B, S, S, 3)
            out = jax.image.resize(
                out, (out.shape[0],) + targets.shape[-2:] + (3,), method="bilinear"
            )
            pred = jnp.moveaxis(out, -1, 1)  # (B, 3, H, W)
            # dice-based distance loss over the 3 channels (fg, center, boundary)
            d = dice_score(pred, targets)
            return jnp.mean(1.0 - d)

        def step(dec_params, opt_state, sam_params, images, targets):
            loss, grads = value_and_grad_allow_int(loss_fn)(dec_params, sam_params, images, targets)
            updates, opt_state = self.unetr_optimizer.update(grads, opt_state, dec_params)
            dec_params = optax.apply_updates(dec_params, updates)
            return dec_params, opt_state, loss

        self._unetr_step = jax.jit(step, donate_argnums=(0, 1))
        return self._unetr_step

    def _instance_iteration(self, images_j, distance_targets):
        """UNETR decoder update on (B, 3, H, W) distance targets."""
        step = self._build_unetr_step()
        self.unetr_params, self.unetr_opt_state, loss = step(
            self.unetr_params, self.unetr_opt_state, self.model.params,
            images_j, distance_targets,
        )
        return float(loss)

    def _run_epoch(self, train: bool = True):
        loader = self.train_loader if train else self.val_loader
        losses, ious, inst_losses = [], [], []
        for batch in loader:
            if len(batch) == 3:
                image, labels, distance_targets = batch
            else:
                image, labels = batch
                distance_targets = None

            if train:
                use_points, use_box, multimask, n_pos, n_neg = \
                    self._get_prompt_and_multimasking_choices(self._iteration)
            else:
                use_points, use_box, multimask, n_pos, n_neg = \
                    self._get_prompt_and_multimasking_choices_for_val(self._iteration)

            prepared = self._prepare_batch(image, labels, use_points, use_box, n_pos, n_neg)
            if prepared is None:
                continue
            images_j, gt, obj_valid, points0, labels0, boxes0 = prepared
            patch_hw = tuple(gt.shape[2:])

            self._key, key = jax.random.split(self._key)
            step = self._build_step(use_points, use_box, multimask, patch_hw, with_grad=train)
            if train:
                self.model.params, self.opt_state, (loss, miou) = step(
                    self.model.params, self.opt_state, key,
                    images_j, gt, obj_valid, points0, labels0, boxes0,
                )
                if distance_targets is not None:
                    inst_losses.append(
                        self._instance_iteration(images_j, jnp.asarray(np.asarray(distance_targets)))
                    )
                self._iteration += 1
            else:
                loss, miou = step(
                    self.model.params, key, images_j, gt, obj_valid, points0, labels0, boxes0,
                )
            losses.append(float(loss))
            ious.append(float(miou))
        return float(np.mean(losses)) if losses else np.inf, \
            float(np.mean(ious)) if ious else 0.0

    def _checkpoint_state(self) -> Dict:
        state = super()._checkpoint_state()
        state["decoder_state"] = jax.tree.map(np.asarray, self.unetr_params)
        return state

    def load_checkpoint(self, name: str = "latest", checkpoint: str = None) -> Dict:
        # `checkpoint` is the reference's name for the same argument
        # (reference joint_sam_trainer.py:51)
        state = super().load_checkpoint(checkpoint or name)
        if "decoder_state" in state:
            self.unetr_params = jax.tree.map(jnp.asarray, state["decoder_state"])
        return state


class JointSamLogger(SamLogger):
    """TensorBoard logger for the joint trainer (reference
    joint_sam_trainer.py JointSamLogger): adds the decoder's instance-
    segmentation sample images next to the SAM samples."""

    def add_image(self, x, y, samples, name, step):
        if self.tb is None or x is None:
            return
        import numpy as _np
        self.tb.add_image(f"{name}/input", self._chw(_np.asarray(x)[0]), step)
        if y is not None:
            self.tb.add_image(f"{name}/target", self._chw(_np.asarray(y)[0]), step)
        if samples:
            for i, sample in enumerate(samples[:4]):
                self.tb.add_image(
                    f"{name}/samples/{i}", self._chw(_np.asarray(sample)[0]), step)
