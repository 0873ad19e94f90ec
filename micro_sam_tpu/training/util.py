"""Training utilities: trainable model factory, GT->prompt conversion, raw
transforms (reference micro_sam/training/util.py)."""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple, Union

import numpy as np

from .. import util
from ..models.sam import Sam
from ..prompt_generators import PointAndBoxPromptGenerator
from .trainable_sam import TrainableSAM


def identity(x):
    """Identity transform (reference training/util.py:35)."""
    return x


def require_8bit(x):
    """Transform to require 8bit input data range (reference training/util.py:40)."""
    if x.max() < 1:
        x = x * 255
    return x


def normalize_to_8bit(raw):
    raw = normalize(raw) * 255
    return raw


def normalize(raw, minval=None, maxval=None):
    raw = raw.astype("float32")
    minval = raw.min() if minval is None else minval
    maxval = raw.max() if maxval is None else maxval
    raw -= minval
    scale = maxval - minval
    if scale > 0:
        raw /= scale
    return raw


def normalize_percentile(raw, lower=1.0, upper=99.0):
    v_lower, v_upper = np.percentile(raw, [lower, upper])
    return normalize(raw, v_lower, v_upper)


def to_rgb(image: np.ndarray) -> np.ndarray:
    """Ensure a 3-channel channel-first image by replicating a single channel
    (reference training/util.py to_rgb usage in ResizeRawTrafo)."""
    image = np.asarray(image)
    if image.ndim == 2:
        image = image[None]
    if image.shape[0] == 1:
        image = np.concatenate([image] * 3, axis=0)
    return image


def get_raw_transform(preprocess: Optional[str] = None):
    """Select the raw-data normalization transform (reference
    training/util.py:53): ``None`` -> 8-bit passthrough, ``normalize_minmax``
    or ``normalize_percentile`` -> rescaled to [0, 255]."""
    if preprocess is None:
        return require_8bit
    if preprocess == "normalize_minmax":
        return normalize_to_8bit
    if preprocess == "normalize_percentile":
        def _percentile_to_8bit(raw):
            return np.clip(normalize_percentile(raw), 0, 1) * 255
        return _percentile_to_8bit
    raise ValueError(f"'{preprocess}' is not a supported preprocessing.")


class ResizeRawTrafo:
    """Pad (and optionally rescale) raw data to a fixed shape
    (reference training/util.py:293)."""

    def __init__(self, desired_shape: Tuple[int, ...], do_rescaling: bool = False,
                 valid_channels=None, padding: str = "constant",
                 ensure_rgb: bool = True):
        self.desired_shape = tuple(desired_shape)
        self.do_rescaling = do_rescaling
        self.valid_channels = valid_channels
        self.padding = padding
        self.ensure_rgb = ensure_rgb

    def __call__(self, raw: np.ndarray) -> np.ndarray:
        raw = np.asarray(raw)
        if self.ensure_rgb:
            raw = to_rgb(raw)
        if self.do_rescaling:
            raw = normalize_percentile(raw)
            raw = normalize(raw) * 255
        pad_width = []
        for want, have in zip(self.desired_shape, raw.shape):
            gap = max(want - have, 0)
            pad_width.append((int(np.ceil(gap / 2)), gap // 2))
        raw = np.pad(raw, pad_width=pad_width, mode=self.padding)
        assert raw.shape == self.desired_shape, (raw.shape, self.desired_shape)
        return raw


class ResizeLabelTrafo:
    """Distance-transform labels, then pad to a fixed 2d shape
    (reference training/util.py:327)."""

    def __init__(self, desired_shape: Tuple[int, ...], min_size: int = 0,
                 padding: str = "constant"):
        self.desired_shape = tuple(desired_shape)
        self.min_size = min_size
        self.padding = padding

    def __call__(self, labels: np.ndarray) -> np.ndarray:
        from .training import PerObjectDistanceTransform

        channels = PerObjectDistanceTransform(
            distances=True, boundary_distances=True, directed_distances=False,
            foreground=True, instances=True, min_size=self.min_size,
        )(np.asarray(labels))
        pad_width = [(0, 0)]
        for want, have in zip(self.desired_shape, channels.shape[1:]):
            gap = max(want - have, 0)
            pad_width.append((int(np.ceil(gap / 2)), gap // 2))
        channels = np.pad(channels, pad_width=pad_width, mode=self.padding)
        assert channels.shape[1:] == self.desired_shape, channels.shape
        return channels


def get_trainable_sam_model(
    model_type: str = util._DEFAULT_MODEL,
    device=None,
    checkpoint_path=None,
    freeze: Optional[List[str]] = None,
    return_state: bool = False,
    peft_kwargs: Optional[Dict] = None,
    **model_kwargs,
) -> Union[TrainableSAM, Tuple[TrainableSAM, Dict]]:
    """Get a trainable SAM model (reference training/util.py:77).

    ``freeze`` lists parts to freeze: subset of ("image_encoder",
    "prompt_encoder", "mask_decoder"). Freezing is realized with an optax
    mask at optimizer construction (see training.py); the list is stored on
    the returned model.
    """
    # bf16 compute on TPU (grads/optimizer state stay f32 via optax): training
    # in f32 is ~2.5x slower on the MXU and pushes the flash kernels past the
    # per-program VMEM budget at useful batch sizes
    model_kwargs.setdefault(
        "compute_dtype", "bfloat16" if util._on_accelerator() else "float32")
    predictor, state = util.get_sam_model(
        model_type=model_type, device=device, checkpoint_path=checkpoint_path,
        return_state=True, peft_kwargs=peft_kwargs, **model_kwargs,
    )
    trainable = TrainableSAM(predictor.model)
    trainable.freeze = freeze or []
    if return_state:
        return trainable, state
    return trainable


def freeze_mask(params: dict, freeze: List[str]) -> dict:
    """Pytree of booleans: True = trainable (for optax.masked)."""
    import jax
    def build(tree, top):
        frozen = top in (freeze or [])
        return jax.tree.map(lambda _: not frozen, tree)
    return {k: build(v, k) for k, v in params.items()}


class ConvertToSamInputs:
    """Convert ground-truth segmentation into object masks + prompts for the
    trainer (reference training/util.py:153).

    Called with a numpy batch (image (B, H, W, C) or (B, C, H, W), labels
    (B, H, W)); returns fixed-capacity arrays:
    (images (B, H, W, C), gt (B, O, H, W), obj_valid (B, O),
    points (B, O, n_pos+n_neg, 2) xy, point_labels (B, O, P), boxes (B, O, 4) xyxy).
    """

    def __init__(
        self,
        transform=None,
        dilation_strength: int = 10,
        box_distortion_factor: Optional[float] = 0.025,
        rng: Optional[np.random.RandomState] = None,
    ):
        self.dilation_strength = dilation_strength
        self.transform = transform
        self.box_distortion_factor = box_distortion_factor
        self._rng = rng or np.random.RandomState()

    def _distort_boxes(self, bbox_coordinates, shape, rng):
        distorted_boxes = []
        for bbox in bbox_coordinates:
            # the bounding box is given in the format (y0, x0, y1, x1)
            bbox_length = [bbox[3] - bbox[1], bbox[2] - bbox[0]]
            sf = self.box_distortion_factor
            # draw from rng (not the global numpy state) so a seeded
            # converter is fully reproducible
            y0 = min(shape[0], max(0, bbox[0] + rng.uniform(-sf, sf) * bbox_length[1]))
            x0 = min(shape[1], max(0, bbox[1] + rng.uniform(-sf, sf) * bbox_length[0]))
            y1 = min(shape[0], max(0, bbox[2] + rng.uniform(-sf, sf) * bbox_length[1]))
            x1 = min(shape[1], max(0, bbox[3] + rng.uniform(-sf, sf) * bbox_length[0]))
            distorted_boxes.append([y0, x0, y1, x1])
        return distorted_boxes

    def _get_prompt_lists(self, gt, n_samples, prompt_generator, rng):
        """Sample objects and derive prompts (reference training/util.py:187)."""
        center_coordinates, bbox_coordinates = util.get_centers_and_bounding_boxes(gt, mode="p")
        cell_ids = np.unique(gt)[1:]
        if n_samples is not None and len(cell_ids) > n_samples:
            sampled_cell_ids = rng.choice(cell_ids, size=n_samples, replace=False)
            sampled_cell_ids = np.sort(sampled_cell_ids)
        else:
            sampled_cell_ids = cell_ids

        centers = [center_coordinates.get(int(i)) for i in sampled_cell_ids]
        bboxes = []
        for i in sampled_cell_ids:
            bb = bbox_coordinates[int(i)]
            bboxes.append((bb[0][0], bb[1][0], bb[0][1], bb[1][1]))  # y0, x0, y1, x1

        if self.box_distortion_factor is not None:
            bboxes = self._distort_boxes(bboxes, shape=gt.shape[-2:], rng=rng)

        object_masks = np.stack([gt == i for i in sampled_cell_ids])[:, None].astype(np.float32)
        point_coords, point_labels, box_prompts, _ = prompt_generator(
            object_masks,
            [(int(b[0]), int(b[1]), int(b[2]), int(b[3])) for b in bboxes],
            centers,
        )
        if box_prompts is None and bboxes:
            box_prompts = np.array(bboxes)[:, [1, 0, 3, 2]]  # -> xyxy
        return sampled_cell_ids, object_masks[:, 0], point_coords, point_labels, box_prompts

    #: SamTrainer passes per-sample seeds when this is True, making the
    #: sampled objects/prompts a function of (seed, iteration, global sample
    #: index) — the property that makes multi-host shard-fed training equal
    #: to single-process training (parallel/distributed.py dryrun asserts it)
    supports_sample_seeds = True

    def __call__(self, x, y, n_pos: int = 1, n_neg: int = 0, get_boxes: bool = False,
                 n_samples: Optional[int] = None, n_objects: Optional[int] = None,
                 get_points: bool = True,
                 sample_seeds: Optional[Sequence[int]] = None):
        import jax.numpy as jnp

        n_samples = n_objects if n_samples is None else n_samples
        x = np.asarray(x)
        y = np.asarray(y)
        if x.ndim == 3:
            x = x[..., None]
        if x.shape[1] in (1, 3) and x.shape[-1] not in (1, 3):
            x = np.moveaxis(x, 1, -1)  # NCHW -> NHWC
        if x.shape[-1] == 1:
            x = np.repeat(x, 3, axis=-1)

        B, H, W = y.shape[0], y.shape[-2], y.shape[-1]
        y2d = y.reshape(B, H, W)
        if sample_seeds is not None and len(sample_seeds) != B:
            raise ValueError(f"sample_seeds must have one entry per image "
                             f"({len(sample_seeds)} given for batch {B})")

        def make_generator(rng):
            return PointAndBoxPromptGenerator(
                n_positive_points=max(n_pos, 1) if get_points else 1,
                n_negative_points=n_neg,
                dilation_strength=self.dilation_strength,
                get_point_prompts=True,
                get_box_prompts=True,
                rng=rng,
            )

        shared_generator = make_generator(self._rng)

        per_image = []
        max_o = 0
        for b in range(B):
            gt = y2d[b]
            if len(np.unique(gt)) <= 1:
                per_image.append(None)
                continue
            if sample_seeds is None:
                rng, generator = self._rng, shared_generator
            else:
                # per-image stream: sampling is independent of batch order
                # and of which process handles the image
                rng = np.random.RandomState(int(sample_seeds[b]) & 0xFFFFFFFF)
                generator = make_generator(rng)
            res = self._get_prompt_lists(gt, n_samples, generator, rng)
            per_image.append(res)
            max_o = max(max_o, len(res[0]))

        if max_o == 0:
            return None
        O = min(max_o, n_samples) if n_samples else max_o
        P = (max(n_pos, 1) if get_points else 1) + n_neg

        gt_out = np.zeros((B, O, H, W), np.float32)
        valid = np.zeros((B, O), bool)
        points = np.zeros((B, O, P, 2), np.float32)
        plabels = -np.ones((B, O, P), np.int32)
        boxes = np.zeros((B, O, 4), np.float32)

        for b, res in enumerate(per_image):
            if res is None:
                continue
            ids, masks, pc, pl, bx = res
            k = min(len(ids), O)
            gt_out[b, :k] = masks[:k]
            valid[b, :k] = True
            if pc is not None:
                points[b, :k, :pc.shape[1]] = pc[:k]
                plabels[b, :k, :pl.shape[1]] = pl[None, :].repeat(k, 0) if pl.ndim == 1 else pl[:k]
            if bx is not None:
                boxes[b, :k] = np.asarray(bx)[:k]

        images_j = jnp.asarray(x.astype(np.float32))
        return (
            images_j, jnp.asarray(gt_out), jnp.asarray(valid),
            jnp.asarray(points), jnp.asarray(plabels), jnp.asarray(boxes),
        )


class ConvertToSemanticSamInputs:
    """Convert inputs for semantic segmentation training: no prompts, the
    labels are per-pixel class maps (reference training/util.py:268)."""

    def __call__(self, x, y):
        import jax.numpy as jnp
        x = np.asarray(x)
        y = np.asarray(y)
        if x.ndim == 3:
            x = x[..., None]
        if x.shape[1] in (1, 3) and x.shape[-1] not in (1, 3):
            x = np.moveaxis(x, 1, -1)
        if x.shape[-1] == 1:
            x = np.repeat(x, 3, axis=-1)
        return jnp.asarray(x.astype(np.float32)), jnp.asarray(y)


def value_and_grad_allow_int(fn, has_aux: bool = False):
    """jax.value_and_grad that tolerates integer (e.g. int4-quantized, see
    models/peft_sam.quantize_encoder_int4) leaves in the param pytree:
    their float0 gradients become same-dtype zeros, so masked optax chains
    and optax.apply_updates pass them through unchanged."""
    import jax
    import jax.numpy as jnp

    vg = jax.value_and_grad(fn, has_aux=has_aux, allow_int=True)

    def wrapped(params, *args, **kwargs):
        out, grads = vg(params, *args, **kwargs)
        grads = jax.tree.map(
            lambda g, p: jnp.zeros_like(p) if g.dtype == jax.dtypes.float0 else g,
            grads, params)
        return out, grads

    return wrapped
