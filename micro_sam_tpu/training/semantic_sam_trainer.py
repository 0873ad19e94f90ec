"""Semantic segmentation trainers (no prompts) — reference
micro_sam/training/semantic_sam_trainer.py:42,173."""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .sam_trainer import SamTrainer, dice_score
from .util import ConvertToSemanticSamInputs, value_and_grad_allow_int


class CustomDiceLoss:
    """Dice over one-hot class labels (reference semantic_sam_trainer.py:11).

    Callable on ``(B, num_classes, H, W)`` logits and ``(B, 1, H, W)`` (or
    ``(B, H, W)``) integer targets; returns the scalar mean dice loss as a
    jnp array.
    """

    def __init__(self, num_classes: int, softmax: bool = True) -> None:
        self.num_classes = num_classes
        self.softmax = softmax

    def _one_hot(self, target: jnp.ndarray) -> jnp.ndarray:
        target = jnp.squeeze(target, axis=1) if target.ndim == 4 else target
        return jax.nn.one_hot(target.astype(jnp.int32), self.num_classes, axis=1)

    def __call__(self, pred, target) -> jnp.ndarray:
        pred = jnp.asarray(pred)
        if self.softmax:
            pred = jax.nn.softmax(pred, axis=1)
        one_hot = self._one_hot(jnp.asarray(target))
        return jnp.mean(1.0 - dice_score(pred, one_hot))


class SemanticSamTrainer(SamTrainer):
    """Trains SAM encoder + decoder for semantic (class-map) segmentation with
    a compound dice + cross-entropy loss and no prompt inputs."""

    def __init__(self, *args, num_classes: int = 3, convert_inputs=None,
                 dice_weight: float = 0.5, **kwargs):
        kwargs.setdefault("n_objects_per_batch", 1)
        super().__init__(*args, **kwargs)
        assert num_classes > 1
        self.num_classes = num_classes
        self.dice_weight = dice_weight
        self.convert_inputs = convert_inputs or ConvertToSemanticSamInputs()
        self._sem_step_cache = {}

    def _build_semantic_step(self, patch_hw, with_grad=True):
        key = (patch_hw, with_grad)
        if key in self._sem_step_cache:
            return self._sem_step_cache[key]
        model = self.model
        C = self.num_classes
        dice_weight = self.dice_weight
        optimizer = self.optimizer

        def loss_fn(params, images, targets):
            feats = model.image_embeddings_oft(params, images)
            B = feats.shape[0]
            # promptless decode: empty sparse prompts
            points = jnp.zeros((B, 0, 2), jnp.float32)
            labels = jnp.zeros((B, 0), jnp.int32)
            low_res, _ = model.forward_decoder(params, feats, points, labels)
            logits = model.upscale_masks(low_res, patch_hw)[:, :C]  # (B, C, H, W)
            one_hot = jax.nn.one_hot(targets.astype(jnp.int32), C, axis=1)
            probs = jax.nn.softmax(logits, axis=1)
            dice = jnp.mean(1.0 - dice_score(probs, one_hot))
            ce = optax.softmax_cross_entropy(
                jnp.moveaxis(logits, 1, -1), jnp.moveaxis(one_hot, 1, -1)
            ).mean()
            return dice_weight * dice + (1.0 - dice_weight) * ce, (dice, ce)

        def train_step(params, opt_state, images, targets):
            (loss, aux), grads = value_and_grad_allow_int(loss_fn, has_aux=True)(
                params, images, targets)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        def eval_step(params, images, targets):
            loss, aux = loss_fn(params, images, targets)
            return loss

        fn = jax.jit(train_step, donate_argnums=(0, 1)) if with_grad else jax.jit(eval_step)
        self._sem_step_cache[key] = fn
        return fn

    def _run_epoch(self, train: bool = True):
        loader = self.train_loader if train else self.val_loader
        losses = []
        for image, labels in loader:
            images_j, targets = self.convert_inputs(image, labels)
            patch_hw = tuple(np.asarray(targets).shape[-2:])
            step = self._build_semantic_step(patch_hw, with_grad=train)
            if train:
                self.model.params, self.opt_state, loss = step(
                    self.model.params, self.opt_state, images_j, targets)
                self._iteration += 1
            else:
                loss = step(self.model.params, images_j, targets)
            losses.append(float(loss))
        return float(np.mean(losses)) if losses else np.inf, 0.0


class SemanticMapsSamTrainer(SemanticSamTrainer):
    """Semantic trainer for continuous target maps (regression-style dice),
    reference semantic_sam_trainer.py:173."""

    def _build_semantic_step(self, patch_hw, with_grad=True):
        key = ("maps", patch_hw, with_grad)
        if key in self._sem_step_cache:
            return self._sem_step_cache[key]
        model = self.model
        C = self.num_classes
        optimizer = self.optimizer

        def loss_fn(params, images, targets):
            feats = model.image_embeddings_oft(params, images)
            B = feats.shape[0]
            points = jnp.zeros((B, 0, 2), jnp.float32)
            labels = jnp.zeros((B, 0), jnp.int32)
            low_res, _ = model.forward_decoder(params, feats, points, labels)
            pred = jax.nn.sigmoid(model.upscale_masks(low_res, patch_hw)[:, :C])
            if targets.ndim == 3:
                targets_ = targets[:, None]
            else:
                targets_ = targets
            return jnp.mean(1.0 - dice_score(pred, targets_))

        def train_step(params, opt_state, images, targets):
            loss, grads = value_and_grad_allow_int(loss_fn)(params, images, targets)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        def eval_step(params, images, targets):
            return loss_fn(params, images, targets)

        fn = jax.jit(train_step, donate_argnums=(0, 1)) if with_grad else jax.jit(eval_step)
        self._sem_step_cache[key] = fn
        return fn
