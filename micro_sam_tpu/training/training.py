"""Training entry points: datasets, loaders, train_sam, presets, CLI.

Counterpart of micro_sam/training/training.py. The torch_em data stack is
replaced by a numpy patch-sampling dataset with the same contract: patches with
a minimum number of instances, optional per-object distance targets for joint
decoder training (PerObjectDistanceTransform equivalent), 8-bit raw
normalization.
"""
from __future__ import annotations

import os
import pickle
import time
from glob import glob
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import numpy as np
from scipy import ndimage

from .. import util as sam_util
from .sam_trainer import SamTrainer
from .joint_sam_trainer import JointSamTrainer
from .trainable_sam import TrainableSAM
from .util import ConvertToSamInputs, get_trainable_sam_model, normalize_to_8bit, require_8bit


# -----------------------------------------------------------------------------
# Label transform: per-object distance targets (torch_em PerObjectDistanceTransform)
# -----------------------------------------------------------------------------

class PerObjectDistanceTransform:
    """Compute per-object [foreground, center-distance, boundary-distance]
    target channels. Conventions match the AIS watershed: center distance is 0
    at the object center, boundary distance is 0 in the innermost point and 1
    at the object boundary (both normalized per object)."""

    def __init__(self, distances=True, boundary_distances=True, directed_distances=False,
                 foreground=True, instances=False, min_size: int = 25):
        self.min_size = min_size
        self.instances = instances

    def __call__(self, labels: np.ndarray) -> np.ndarray:
        labels = np.asarray(labels).astype(np.int64)
        fg = (labels > 0).astype(np.float32)
        center_dist = np.ones(labels.shape, dtype=np.float32)
        boundary_dist = np.ones(labels.shape, dtype=np.float32)

        for prop_slice, label_id in _iter_objects(labels, self.min_size):
            mask = labels[prop_slice] == label_id
            # distance to boundary (inside the object)
            edt = ndimage.distance_transform_edt(mask)
            m = edt.max()
            if m > 0:
                bdist = 1.0 - edt / m
            else:
                bdist = np.zeros_like(edt)
            # distance to the (eccentricity) center = edt argmax
            cy, cx = np.unravel_index(np.argmax(edt), edt.shape)
            yy, xx = np.meshgrid(
                np.arange(mask.shape[0]), np.arange(mask.shape[1]), indexing="ij"
            )
            cdist = np.sqrt((yy - cy) ** 2 + (xx - cx) ** 2)
            cmax = cdist[mask].max() if mask.any() else 1.0
            cdist = cdist / max(cmax, 1e-7)

            center_dist[prop_slice][mask] = cdist[mask].astype(np.float32)
            boundary_dist[prop_slice][mask] = bdist[mask].astype(np.float32)

        out = [fg, center_dist, boundary_dist]
        if self.instances:
            out = [labels.astype(np.float32)] + out
        return np.stack(out)


def _iter_objects(labels, min_size):
    slices = ndimage.find_objects(labels)
    for idx, sl in enumerate(slices, start=1):
        if sl is None:
            continue
        if (labels[sl] == idx).sum() < min_size:
            continue
        yield sl, idx


class MinInstanceSampler:
    """Accept patches with at least ``min_num_instances`` objects
    (torch_em MinInstanceSampler equivalent)."""

    def __init__(self, min_num_instances: int = 2, min_size: Optional[int] = None):
        self.min_num_instances = min_num_instances
        self.min_size = min_size

    def __call__(self, raw, labels) -> bool:
        ids, sizes = np.unique(labels, return_counts=True)
        if self.min_size is not None:
            ids = ids[sizes >= self.min_size]
        return len(ids[ids != 0]) >= self.min_num_instances


# -----------------------------------------------------------------------------
# Dataset & loader
# -----------------------------------------------------------------------------

def _load_stack(paths, key):
    if isinstance(paths, np.ndarray):
        return [paths]
    if isinstance(paths, (list, tuple)) and isinstance(paths[0], np.ndarray):
        return list(paths)
    if isinstance(paths, (str, os.PathLike)):
        # directory + glob key (torch_em convention: raw_paths=<dir>, raw_key="*.tif")
        if os.path.isdir(str(paths)):
            from glob import glob
            pattern = key if key else "*"
            files = sorted(glob(os.path.join(str(paths), pattern)))
            if not files:
                raise ValueError(f"No files matching {pattern!r} in {paths}.")
            return [sam_util.load_image_data(p) for p in files]
        paths = [paths]
    return [sam_util.load_image_data(str(p), key) for p in paths]


class SamDataset:
    """Random patch dataset over image/label arrays with instance sampling."""

    def __init__(
        self,
        raw_images: List[np.ndarray],
        label_images: List[np.ndarray],
        patch_shape: Tuple[int, int],
        n_samples: Optional[int] = None,
        with_segmentation_decoder: bool = False,
        raw_transform=None,
        label_transform=None,
        sampler: Optional[MinInstanceSampler] = None,
        max_sampling_attempts: int = 50,
        seed: int = 0,
    ):
        assert len(raw_images) == len(label_images)
        self.raw_images = [np.asarray(r) for r in raw_images]
        self.label_images = [np.asarray(l) for l in label_images]
        self.patch_shape = tuple(patch_shape)
        self.with_segmentation_decoder = with_segmentation_decoder
        self.raw_transform = raw_transform or require_8bit
        self.label_transform = label_transform or (
            PerObjectDistanceTransform() if with_segmentation_decoder else None
        )
        self.sampler = sampler or MinInstanceSampler(2)
        self.max_sampling_attempts = max_sampling_attempts
        self._rng = np.random.RandomState(seed)
        self.n_samples = n_samples or max(
            1, sum(int(np.prod([max(1, s - p + 1) for s, p in
                                zip(im.shape[:2], self.patch_shape)]) ** 0.25)
                   for im in self.raw_images)
        )

    def __len__(self):
        return self.n_samples

    def _sample_patch(self):
        ph, pw = self.patch_shape
        for _ in range(self.max_sampling_attempts):
            idx = self._rng.randint(len(self.raw_images))
            raw, labels = self.raw_images[idx], self.label_images[idx]
            H, W = labels.shape[-2], labels.shape[-1]
            if H < ph or W < pw:
                continue
            y0 = self._rng.randint(0, H - ph + 1)
            x0 = self._rng.randint(0, W - pw + 1)
            raw_p = raw[..., y0:y0 + ph, x0:x0 + pw] if raw.ndim == 3 and raw.shape[0] in (1, 3) \
                else raw[y0:y0 + ph, x0:x0 + pw]
            lab_p = labels[y0:y0 + ph, x0:x0 + pw]
            lab_p, _, _ = _relabel(lab_p)
            if self.sampler(raw_p, lab_p):
                return raw_p, lab_p
        return raw_p, lab_p  # fall back to the last sample

    def __getitem__(self, i):
        raw, labels = self._sample_patch()
        raw = self.raw_transform(raw.astype(np.float32))
        if self.with_segmentation_decoder:
            targets = self.label_transform(labels)
            return raw, labels, targets
        return raw, labels

    def split(self, n_val: int):
        """Random split into (train, val) datasets sharing the image arrays
        (the torch.random_split equivalent used by the training UI)."""
        import copy
        n_val = max(1, min(n_val, len(self) - 1))
        train = copy.copy(self)
        val = copy.copy(self)
        train.n_samples = len(self) - n_val
        val.n_samples = n_val
        val._rng = np.random.RandomState(1)
        return train, val


def _relabel(labels):
    from .. import native
    return native.relabel_consecutive(labels)


class SamLoader:
    """Mini-batch loader over a SamDataset (shuffle per epoch)."""

    def __init__(self, dataset: SamDataset, batch_size: int = 1, shuffle: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle

    def __len__(self):
        return max(1, len(self.dataset) // self.batch_size)

    def __iter__(self):
        for b in range(len(self)):
            items = [self.dataset[b * self.batch_size + k] for k in range(self.batch_size)]
            raws = np.stack([it[0] for it in items])
            labels = np.stack([it[1] for it in items])
            if self.dataset.with_segmentation_decoder:
                targets = np.stack([it[2] for it in items])
                yield raws, labels, targets
            else:
                yield raws, labels


def default_sam_dataset(
    raw_paths,
    raw_key,
    label_paths,
    label_key,
    patch_shape: Tuple[int, ...],
    with_segmentation_decoder: bool = True,
    with_channels: bool = False,
    sampler=None,
    raw_transform=None,
    n_samples: Optional[int] = None,
    is_train: bool = True,
    min_size: int = 25,
    max_sampling_attempts: Optional[int] = None,
    **kwargs,
) -> SamDataset:
    """Create a dataset for SAM training (reference training/training.py:626)."""
    raw_images = _load_stack(raw_paths, raw_key)
    label_images = _load_stack(label_paths, label_key)
    patch_2d = tuple(patch_shape[-2:])
    return SamDataset(
        raw_images, label_images, patch_2d,
        n_samples=n_samples,
        with_segmentation_decoder=with_segmentation_decoder,
        raw_transform=raw_transform,
        sampler=sampler or MinInstanceSampler(2, min_size=min_size),
        max_sampling_attempts=max_sampling_attempts or 50,
        seed=0 if is_train else 1,
    )


def default_sam_loader(batch_size: int = 1, shuffle: bool = True, **ds_kwargs) -> SamLoader:
    """Create a loader for SAM training (reference training/training.py:780)."""
    ds = default_sam_dataset(**ds_kwargs)
    return SamLoader(ds, batch_size=batch_size, shuffle=shuffle)


# -----------------------------------------------------------------------------
# Loader validation (reference training/training.py:40)
# -----------------------------------------------------------------------------

def _check_loader(loader, with_segmentation_decoder, name=None, verbose=False):
    n_batches = 0
    for batch in loader:
        if with_segmentation_decoder:
            if len(batch) != 3:
                raise ValueError(
                    "Loaders for training with the segmentation decoder must yield "
                    "(raw, labels, distance_targets)."
                )
            x, y, t = batch
            if t.shape[1] not in (3, 4):
                raise ValueError(f"Expected 3 or 4 target channels, got {t.shape[1]}.")
        else:
            if len(batch) != 2:
                raise ValueError("Loaders must yield (raw, labels).")
            x, y = batch
        if np.asarray(x).max() <= 1.0 + 1e-6:
            raise ValueError(
                "The raw data does not look like 8-bit images; normalize to [0, 255]."
            )
        if len(np.unique(y[0])) <= 1:
            raise ValueError("A batch without instances was sampled.")
        n_batches += 1
        if n_batches >= 2:
            break


# -----------------------------------------------------------------------------
# train_sam & configurations
# -----------------------------------------------------------------------------

def train_sam(
    name: str,
    model_type: str,
    train_loader,
    val_loader,
    n_epochs: int = 100,
    early_stopping: Optional[int] = 10,
    n_objects_per_batch: Optional[int] = 25,
    checkpoint_path: Optional[Union[str, os.PathLike]] = None,
    with_segmentation_decoder: bool = True,
    freeze: Optional[List[str]] = None,
    device: Optional[str] = None,
    lr: float = 1e-5,
    n_sub_iteration: int = 8,
    save_root: Optional[str] = None,
    mask_prob: float = 0.5,
    n_iterations: Optional[int] = None,
    scheduler_kwargs: Optional[Dict[str, Any]] = None,
    save_every_kth_epoch: Optional[int] = None,
    pbar_signals=None,
    optimizer_class=None,
    peft_kwargs: Optional[Dict] = None,
    ignore_warnings: bool = True,
    verify_n_labels_in_loader: Optional[int] = 50,
    box_distortion_factor: Optional[float] = 0.025,
    overwrite_training: bool = True,
    **model_kwargs,
) -> None:
    """Run training for a SAM model (reference training/training.py:196)."""
    import jax
    import optax

    t_start = time.time()

    if verify_n_labels_in_loader:
        _check_loader(train_loader, with_segmentation_decoder, "train")
        _check_loader(val_loader, with_segmentation_decoder, "val")

    # don't overwrite a finished training run
    save_dir = os.path.join(save_root or "./checkpoints", name)
    if not overwrite_training and os.path.exists(os.path.join(save_dir, "best.pkl")):
        print(f"Training {name} is already finished; skipping (overwrite_training=False).")
        return

    model, state = get_trainable_sam_model(
        model_type=model_type, device=device, checkpoint_path=checkpoint_path,
        freeze=freeze, return_state=True, peft_kwargs=peft_kwargs, **model_kwargs,
    )

    # optimizer with optional freezing via mask
    tx = optax.adamw(lr)
    if freeze:
        from .util import freeze_mask
        mask = freeze_mask(model.params, freeze)
        tx = optax.chain(optax.masked(tx, mask))
    if optimizer_class is not None:
        tx = optimizer_class(lr)

    convert_inputs = ConvertToSamInputs(transform=None, box_distortion_factor=box_distortion_factor)

    trainer_kwargs = dict(
        name=name,
        train_loader=train_loader,
        val_loader=val_loader,
        model=model,
        optimizer=tx,
        n_sub_iteration=n_sub_iteration,
        n_objects_per_batch=n_objects_per_batch,
        convert_inputs=convert_inputs,
        mask_prob=mask_prob,
        save_root=save_root,
        lr=lr,
    )
    if with_segmentation_decoder:
        from ..instance_segmentation import get_unetr
        decoder_state = state.get("decoder_state")
        unetr_params = get_unetr(decoder_state=decoder_state, flexible_load_checkpoint=True)
        trainer = JointSamTrainer(unetr=unetr_params, **trainer_kwargs)
    else:
        trainer = SamTrainer(**trainer_kwargs)

    if n_iterations is not None:
        trainer.fit(iterations=n_iterations, save_every_kth_epoch=save_every_kth_epoch)
    else:
        trainer.fit(epochs=n_epochs, save_every_kth_epoch=save_every_kth_epoch)
    print(f"Training took {time.time() - t_start:.1f}s")


#
# Hardware presets (reference training/training.py:800; TPU entries added).
#
CONFIGURATIONS = {
    "Minimal": {"model_type": "vit_t", "n_objects_per_batch": 4, "n_sub_iteration": 4},
    "CPU": {"model_type": "vit_b", "n_objects_per_batch": 10},
    "gtx1080": {"model_type": "vit_t", "n_objects_per_batch": 5},
    "rtx5000": {"model_type": "vit_b", "n_objects_per_batch": 10},
    "V100": {"model_type": "vit_b", "n_objects_per_batch": 10},
    "A100": {"model_type": "vit_h", "n_objects_per_batch": 25},
    "v5e": {"model_type": "vit_b", "n_objects_per_batch": 25},
    "v5p": {"model_type": "vit_h", "n_objects_per_batch": 25},
}


def _find_best_configuration() -> str:
    import jax
    platform = jax.devices()[0].platform
    if platform == "tpu":
        return "v5e"
    if platform == "gpu":
        return "A100"
    return "CPU"


def train_sam_for_configuration(
    name: str,
    configuration: str,
    train_loader,
    val_loader,
    checkpoint_path=None,
    with_segmentation_decoder: bool = True,
    model_type: Optional[str] = None,
    **kwargs,
) -> None:
    """Run training with a hardware preset (reference training/training.py:839)."""
    if configuration in CONFIGURATIONS:
        train_kwargs = dict(CONFIGURATIONS[configuration])
    else:
        raise ValueError(f"Invalid configuration {configuration} expect one of {list(CONFIGURATIONS)}")
    if model_type is None:
        model_type = train_kwargs.pop("model_type")
    else:
        train_kwargs.pop("model_type")
    train_kwargs.update(**kwargs)
    train_sam(
        name=name, train_loader=train_loader, val_loader=val_loader,
        checkpoint_path=checkpoint_path,
        with_segmentation_decoder=with_segmentation_decoder,
        model_type=model_type, **train_kwargs,
    )


def train_instance_segmentation(
    name: str,
    model_type: str,
    train_loader,
    val_loader,
    **kwargs,
) -> None:
    """Train only the additional instance segmentation decoder (reference
    training/training.py:421): SAM weights frozen, UNETR decoder trained on
    distance targets."""
    kwargs.setdefault("freeze", ["image_encoder", "prompt_encoder", "mask_decoder"])
    train_sam(
        name=name, model_type=model_type, train_loader=train_loader,
        val_loader=val_loader, with_segmentation_decoder=True, **kwargs,
    )


def export_instance_segmentation_model(checkpoint_path: str = None, output_path: str = None,
                                       model_type: Optional[str] = None,
                                       trained_model_path: str = None,
                                       initial_checkpoint_path: str = None) -> None:
    """Export a trained checkpoint into the standalone format consumed by
    get_sam_model / get_predictor_and_decoder (reference training/training.py:378).
    ``trained_model_path`` is the reference's name for ``checkpoint_path``;
    ``initial_checkpoint_path`` is accepted for signature parity (the exported
    state is self-contained here, so the initial checkpoint is not needed)."""
    checkpoint_path = checkpoint_path or trained_model_path
    if checkpoint_path is None or output_path is None:
        raise ValueError("checkpoint_path/trained_model_path and output_path are required")
    with open(checkpoint_path, "rb") as f:
        state = pickle.load(f)
    out = {
        "model_state": state["model_state"],
        "model_type": state.get("model_type", model_type),
    }
    if "model_config" in state:
        out["model_config"] = state["model_config"]
    if "decoder_state" in state:
        out["decoder_state"] = state["decoder_state"]
    with open(output_path, "wb") as f:
        pickle.dump(out, f)


def _export_helper(save_root, checkpoint_name, output_path, model_type,
                   with_segmentation_decoder, val_loader=None):
    checkpoint_path = os.path.join(save_root or "./checkpoints", checkpoint_name, "best.pkl")
    export_instance_segmentation_model(checkpoint_path, output_path, model_type)
    return output_path


def main():
    """@private CLI: micro_sam_tpu.train."""
    import argparse

    parser = argparse.ArgumentParser(description="Finetune SAM models on microscopy data.")
    # reference flag set (reference training/training.py main) + earlier
    # spellings kept as aliases
    parser.add_argument("--name", "--trained_model_name", dest="name",
                        default="sam_model",
                        help="Checkpoint name of the finetuned model.")
    parser.add_argument("--images", required=True, nargs="+", help="Image file paths or glob.")
    parser.add_argument("--labels", required=True, nargs="+", help="Label file paths or glob.")
    parser.add_argument("--image_key", default=None)
    parser.add_argument("--label_key", default=None)
    parser.add_argument("--val_images", nargs="*", default=None,
                        help="Validation image paths (default: a fraction of --images).")
    parser.add_argument("--val_labels", nargs="*", default=None)
    parser.add_argument("--val_image_key", default=None)
    parser.add_argument("--val_label_key", default=None)
    parser.add_argument("--val_fraction", type=float, default=0.1)
    parser.add_argument("-m", "--model_type", default=sam_util._DEFAULT_MODEL)
    parser.add_argument("-c", "--checkpoint_path", default=None)
    parser.add_argument("--patch_shape", nargs="+", type=int, default=[512, 512])
    parser.add_argument("--n_epochs", type=int, default=100)
    parser.add_argument("--num_workers", type=int, default=1,
                        help="Dataloader workers (accepted for parity; loading "
                        "is in-process here).")
    parser.add_argument("--batch_size", type=int, default=1)
    parser.add_argument("--preprocess", default=None,
                        choices=("normalize_minmax", "normalize_percentile"),
                        help="Raw-data normalization before training.")
    parser.add_argument("--n_objects_per_batch", type=int, default=25)
    parser.add_argument("--segmentation_decoder", default="instances",
                        help="'instances' trains the extra decoder, 'none' disables it.")
    parser.add_argument("--without_segmentation_decoder", action="store_true")
    parser.add_argument("--configuration", default=None)
    parser.add_argument("-s", "--save_root", default=None)
    parser.add_argument("-d", "--device", default=None,
                        help="Compute device (resolved via jax; accepted for parity).")
    parser.add_argument("--export_path", "--output_path", dest="export_path",
                        default=None, help="Where to export the trained model.")

    args = parser.parse_args()

    def expand(paths):
        out = []
        for p in paths:
            out.extend(sorted(glob(p)) if any(c in p for c in "*?[") else [p])
        return out

    image_paths, label_paths = expand(args.images), expand(args.labels)
    assert len(image_paths) == len(label_paths), "Image and label counts must match."

    if args.val_images:
        train_images, train_labels = image_paths, label_paths
        val_images, val_labels = expand(args.val_images), expand(args.val_labels)
        val_keys = dict(raw_key=args.val_image_key or args.image_key,
                        label_key=args.val_label_key or args.label_key)
    else:
        n_val = max(1, int(len(image_paths) * args.val_fraction))
        train_images, val_images = image_paths[:-n_val] or image_paths, image_paths[-n_val:]
        train_labels, val_labels = label_paths[:-n_val] or label_paths, label_paths[-n_val:]
        val_keys = dict(raw_key=args.image_key, label_key=args.label_key)

    with_decoder = (not args.without_segmentation_decoder
                    and str(args.segmentation_decoder).lower() not in ("none", ""))
    raw_transform = None
    if args.preprocess is not None:
        from .util import get_raw_transform
        raw_transform = get_raw_transform(args.preprocess)
    loader_kwargs = dict(
        patch_shape=tuple(args.patch_shape),
        with_segmentation_decoder=with_decoder, batch_size=args.batch_size,
    )
    if raw_transform is not None:
        loader_kwargs["raw_transform"] = raw_transform
    train_loader = default_sam_loader(
        raw_paths=train_images, label_paths=train_labels,
        raw_key=args.image_key, label_key=args.label_key, **loader_kwargs)
    val_loader = default_sam_loader(
        raw_paths=val_images, label_paths=val_labels, **val_keys, **loader_kwargs)

    if args.configuration:
        train_sam_for_configuration(
            name=args.name, configuration=args.configuration,
            train_loader=train_loader, val_loader=val_loader,
            checkpoint_path=args.checkpoint_path,
            with_segmentation_decoder=with_decoder, n_epochs=args.n_epochs,
            save_root=args.save_root,
        )
    else:
        train_sam(
            name=args.name, model_type=args.model_type,
            train_loader=train_loader, val_loader=val_loader,
            checkpoint_path=args.checkpoint_path, n_epochs=args.n_epochs,
            n_objects_per_batch=args.n_objects_per_batch,
            with_segmentation_decoder=with_decoder, save_root=args.save_root,
        )

    if args.export_path:
        _export_helper(args.save_root, args.name, args.export_path, args.model_type,
                       with_decoder)


if __name__ == "__main__":
    main()
