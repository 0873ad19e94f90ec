"""SamPredictor: the interactive inference interface.

Equivalent of ``segment_anything.SamPredictor`` as used across the reference
(micro_sam/util.py:317 returns one; prompt_based_segmentation and
instance_segmentation drive it). TPU-native design decisions:

- The image encoder and the prompt decode are separate jitted programs; the
  decode path pads prompts to power-of-two capacity buckets so the whole
  interactive session reuses a handful of compiled programs (<50 ms p50 target,
  SURVEY.md §3.2).
- Boxes are packed as two extra points with labels 2/3 before entering jit.
- ``features`` are cached as (1, 64, 64, 256) NHWC on device; the zarr cache
  layer stores them NCHW for interoperability with reference caches.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .models.sam import Sam, preprocess, postprocess_masks, MASK_THRESHOLD
from .utils.transforms import ResizeLongestSide, get_preprocess_shape


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


class SamPredictor:
    def __init__(self, sam: Sam, mesh=None):
        self.model = sam
        self.transform = ResizeLongestSide(sam.config.img_size)
        # model metadata the reference attaches in get_sam_model (util.py:443-470)
        self.model_type: str = sam.config.model_type
        self.model_name: Optional[str] = None
        self._checkpoint_hash: Optional[str] = None
        self.reset_image()
        self.mesh = None
        self.batch_multiple = 1   # encode/decode batches pad to this
        self._encode_fn = jax.jit(self._encode_impl)
        self._decode_fn = jax.jit(self._decode_impl)
        self._upscale_fn = jax.jit(self._upscale_impl, static_argnames=("input_size", "original_size"))
        if mesh is not None:
            self.shard_on_mesh(mesh)

    def shard_on_mesh(self, mesh) -> "SamPredictor":
        """Make this predictor's compiled programs SPMD over a device mesh.

        This is the production multi-chip path (not a side-car): params are
        tensor-sharded on the mesh "model" axis (attention qkv/proj + MLP
        hidden dims; see parallel.mesh.sam_param_shardings) and every
        encode/decode batch is split over the "data" axis, so
        precompute_image_embeddings, batched_inference and the AMG decode
        pipeline all fan out over chips with XLA-inserted collectives.
        Replaces the reference's DDP surface (reference
        micro_sam/training/sam_trainer.py:67; util.py:764-898 encodes tile
        batches sequentially on one device).
        """
        from jax.sharding import NamedSharding, PartitionSpec as P
        from .parallel.mesh import sam_param_shardings
        self.mesh = mesh
        self.batch_multiple = int(mesh.shape.get("data", 1))
        p_shard = sam_param_shardings(self.model.params, mesh)
        self.model.params = jax.device_put(self.model.params, p_shard)
        self._repl_sharding = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        self._data_sharding = data
        self._encode_fn = jax.jit(
            self._encode_impl, in_shardings=(p_shard, data), out_shardings=data)
        self._decode_fn = jax.jit(
            self._decode_impl,
            in_shardings=(p_shard, data, data, data, data, data),
            out_shardings=(data, data))
        return self

    def _pad_batch(self, *arrays):
        """Pad axis 0 of every array to a batch_multiple multiple (repeating
        the last element); returns (*padded, true_n)."""
        n = arrays[0].shape[0]
        r = (-n) % self.batch_multiple
        if r == 0:
            return (*arrays, n)
        padded = tuple(
            np.concatenate([a, np.repeat(a[-1:], r, axis=0)], axis=0)
            for a in (np.asarray(a) for a in arrays)
        )
        return (*padded, n)

    def encode_batch(self, batch: np.ndarray) -> jnp.ndarray:
        """(B, h, w, 3) resized pixels -> (B, 64, 64, 256) embeddings.

        The production encode entry: pads the batch to the mesh data-axis
        multiple so one compiled program serves every batch size, and shards
        it over the mesh when the predictor is meshed.
        """
        batch, n = self._pad_batch(np.asarray(batch))
        feats = self._encode_fn(self.model.params, jnp.asarray(batch))
        return feats[:n] if feats.shape[0] != n else feats

    # ------------------------------------------------------------------
    # jitted cores
    # ------------------------------------------------------------------
    def _encode_impl(self, params, x):
        """x: (B, h, w, 3) raw resized pixels (pre-pad) -> (B, 64, 64, 256)."""
        px = preprocess(x, self.model.config.img_size)
        return self.model.encode_image(params, px)

    def _decode_impl(self, params, features, points, labels, mask_input, has_mask):
        return self.model.decode_masks(params, features, points, labels, mask_input, has_mask)

    def _upscale_impl(self, masks, input_size, original_size):
        return postprocess_masks(
            masks, input_size, original_size, self.model.config.img_size
        )

    # ------------------------------------------------------------------
    # reference-parity API
    # ------------------------------------------------------------------
    def reset_image(self) -> None:
        self.is_image_set = False
        self.features = None
        self.original_size: Optional[Tuple[int, int]] = None
        self.input_size: Optional[Tuple[int, int]] = None

    def set_image(self, image: np.ndarray, image_format: str = "RGB") -> None:
        """image: (H, W, 3) uint8 (use util._to_image for normalization)."""
        assert image.ndim == 3 and image.shape[2] == 3, f"Bad image shape {image.shape}"
        if image_format == "BGR":
            image = image[..., ::-1]
        self.original_size = tuple(image.shape[:2])
        resized = self._resize_longest_host(image)
        self.input_size = tuple(resized.shape[:2])
        feats = self.encode_batch(resized[None])
        if self.mesh is not None:
            # interactive decode broadcasts these over prompt batches:
            # keep them replicated so no per-decode resharding transfer
            feats = jax.device_put(np.asarray(feats), self._repl_sharding)
        self.features = feats
        self.is_image_set = True

    def set_features(
        self,
        features,
        original_size: Tuple[int, int],
        input_size: Optional[Tuple[int, int]] = None,
    ) -> None:
        """Install precomputed embeddings (reference: util.set_precomputed).

        Accepts NHWC (1, 64, 64, 256) or NCHW (1, 256, 64, 64) (cache layout).
        """
        features = jnp.asarray(np.asarray(features))
        if features.ndim == 3:
            features = features[None]
        if features.shape[1] == 256 and features.shape[-1] != 256:
            features = jnp.transpose(features, (0, 2, 3, 1))
        if self.mesh is not None:
            features = jax.device_put(np.asarray(features), self._repl_sharding)
        self.features = features
        self.original_size = tuple(int(x) for x in original_size)
        if input_size is None:
            input_size = get_preprocess_shape(
                self.original_size[0], self.original_size[1], self.model.config.img_size
            )
        self.input_size = tuple(int(x) for x in input_size)
        self.is_image_set = True

    def get_image_embedding(self) -> np.ndarray:
        """Embeddings in the reference's NCHW layout (1, 256, 64, 64)."""
        if not self.is_image_set:
            raise RuntimeError("An image must be set with .set_image(...).")
        return np.asarray(jnp.transpose(self.features, (0, 3, 1, 2)), dtype=np.float32)

    def _resize_longest_host(self, image: np.ndarray) -> np.ndarray:
        """PIL bilinear (antialiased) resize — matches torchvision's resize used
        by the reference's ResizeLongestSide.apply_image."""
        from PIL import Image
        h, w = image.shape[:2]
        new_h, new_w = get_preprocess_shape(h, w, self.model.config.img_size)
        if (new_h, new_w) == (h, w):
            return np.asarray(image, dtype=np.float32)
        im = Image.fromarray(np.asarray(image, dtype=np.uint8))
        im = im.resize((new_w, new_h), Image.BILINEAR)
        return np.asarray(im, dtype=np.float32)

    # ------------------------------------------------------------------
    # prompt packing
    # ------------------------------------------------------------------
    def _pack_prompts(
        self,
        point_coords: Optional[np.ndarray],   # (B, N, 2) or (N, 2), xy original coords
        point_labels: Optional[np.ndarray],
        box: Optional[np.ndarray],            # (B, 4) or (4,) XYXY original coords
        mask_input: Optional[np.ndarray],     # (B, 1, 256, 256) or (1, 256, 256)
    ):
        batched = True
        if point_coords is not None and np.asarray(point_coords).ndim == 2:
            batched = False
        if point_coords is None and box is not None and np.asarray(box).ndim == 1:
            batched = False
        if (point_coords is None and box is None and mask_input is not None
                and np.asarray(mask_input).ndim == 3):
            batched = False

        def at_least_3d(a):
            a = np.asarray(a, dtype=np.float32)
            return a if a.ndim == 3 else a[None]

        pts_list, lbl_list = [], []
        B = 1
        if point_coords is not None:
            pc = at_least_3d(point_coords)
            pl = np.asarray(point_labels, dtype=np.int32)
            if pl.ndim == 1:
                pl = pl[None]
            B = pc.shape[0]
            pc = self.transform.apply_coords(pc, self.original_size)
            pts_list.append(pc.reshape(B, -1, 2))
            lbl_list.append(pl)
        if box is not None:
            bx = np.asarray(box, dtype=np.float32)
            if bx.ndim == 1:
                bx = bx[None]
            B = max(B, bx.shape[0])
            bx = self.transform.apply_boxes(bx, self.original_size).reshape(-1, 2, 2)
            pts_list.append(bx)
            lbl_list.append(np.tile(np.array([[2, 3]], dtype=np.int32), (bx.shape[0], 1)))

        if pts_list:
            # broadcast batch dims
            pts_list = [np.broadcast_to(p, (B,) + p.shape[1:]) if p.shape[0] != B else p
                        for p in pts_list]
            lbl_list = [np.broadcast_to(l, (B,) + l.shape[1:]) if l.shape[0] != B else l
                        for l in lbl_list]
            points = np.concatenate(pts_list, axis=1)
            labels = np.concatenate(lbl_list, axis=1)
        elif mask_input is not None:
            # mask-only prompting: empty sparse prompt set (SAM semantics)
            if np.asarray(mask_input).ndim == 4:
                B = np.asarray(mask_input).shape[0]
            points = np.zeros((B, 0, 2), np.float32)
            labels = np.zeros((B, 0), np.int32)
        else:
            raise ValueError("At least one of point, box or mask prompts is required.")

        # If only points (no box), SAM appends a padding point.
        if box is None and points.shape[1] > 0:
            points = np.concatenate([points, np.zeros((B, 1, 2), np.float32)], axis=1)
            labels = np.concatenate([labels, -np.ones((B, 1), np.int32)], axis=1)

        # pad to capacity bucket for stable jit shapes
        P = points.shape[1]
        if P > 0:
            cap = _next_pow2(max(P, 2))
            if cap > P:
                points = np.concatenate([points, np.zeros((B, cap - P, 2), np.float32)], axis=1)
                labels = np.concatenate([labels, -np.ones((B, cap - P), np.int32)], axis=1)

        mask_hw = self.model.config.embedding_size * 4  # 256 for 1024-input models
        if mask_input is not None:
            mi = np.asarray(mask_input, dtype=np.float32)
            if mi.ndim == 3:
                mi = mi[None]
            # (B, 1, s, s) -> (B, s, s, 1)
            mi = np.transpose(mi, (0, 2, 3, 1))
            if mi.shape[0] != B:
                mi = np.broadcast_to(mi, (B,) + mi.shape[1:])
            has_mask = np.ones((B,), bool)
        else:
            mi = np.zeros((B, mask_hw, mask_hw, 1), np.float32)
            has_mask = np.zeros((B,), bool)
        return points, labels, mi, has_mask, batched

    # ------------------------------------------------------------------
    # predict
    # ------------------------------------------------------------------
    def predict(
        self,
        point_coords: Optional[np.ndarray] = None,
        point_labels: Optional[np.ndarray] = None,
        box: Optional[np.ndarray] = None,
        mask_input: Optional[np.ndarray] = None,
        multimask_output: bool = True,
        return_logits: bool = False,
    ):
        """Single-image prediction from prompts in original-image coordinates.

        Returns (masks (C, H, W), iou_predictions (C,), low_res_masks (C, 256, 256))
        for unbatched prompts, with a leading batch axis otherwise.
        """
        if not self.is_image_set:
            raise RuntimeError("An image must be set with .set_image(...) before prediction.")
        points, labels, mi, has_mask, batched = self._pack_prompts(
            point_coords, point_labels, box, mask_input
        )
        points, labels, mi, has_mask, true_b = self._pad_batch(
            points, labels, mi, has_mask)
        feats = self.features
        B = points.shape[0]
        if feats.shape[0] != B:
            feats = jnp.broadcast_to(feats, (B,) + feats.shape[1:])
        if self.mesh is not None:
            # replicated->data resharding is a local slice per chip; jit with
            # in_shardings refuses committed arrays with a different layout
            feats = jax.device_put(feats, self._data_sharding)
        low_res, iou = self._decode_fn(
            self.model.params, feats, jnp.asarray(points), jnp.asarray(labels),
            jnp.asarray(mi), jnp.asarray(has_mask),
        )
        low_res, iou = low_res[:true_b], iou[:true_b]
        if multimask_output:
            low_res, iou = low_res[:, 1:], iou[:, 1:]
        else:
            low_res, iou = low_res[:, 0:1], iou[:, 0:1]
        masks = self._upscale_fn(
            low_res, input_size=tuple(self.input_size), original_size=tuple(self.original_size)
        )
        masks = np.asarray(masks)
        iou = np.asarray(iou)
        low_res = np.asarray(low_res)
        if not return_logits:
            masks = masks > MASK_THRESHOLD
        if not batched:
            return masks[0], iou[0], low_res[0]
        return masks, iou, low_res

    # torch-API compatibility shim used by ported call sites
    def predict_batched(self, point_coords=None, point_labels=None, boxes=None,
                        mask_input=None, multimask_output=True, return_logits=False):
        return self.predict(point_coords, point_labels, boxes, mask_input,
                            multimask_output, return_logits)


# ---------------------------------------------------------------------------
# Device-side AMG fast path
# ---------------------------------------------------------------------------

def _amg_decode_impl(model, params, features, points, labels, mask_threshold,
                     stability_offset, input_size, original_size):
    """Decode point prompts and reduce on device: thresholded masks are
    bit-packed, stability scores / IoU / boxes computed in-graph. Transfers
    ~32x less data than shipping float32 masks to the host."""
    import jax
    import jax.numpy as jnp
    from .models.sam import postprocess_masks
    from .ops.amg_utils import batched_mask_to_box, calculate_stability_score

    low_res, iou_pred = model.decode_masks(params, features, points, labels)
    masks = postprocess_masks(low_res, input_size, original_size, model.config.img_size)
    masks = masks[:, 1:]      # multimask outputs
    iou_pred = iou_pred[:, 1:]

    stability = calculate_stability_score(masks, mask_threshold, stability_offset)
    bool_masks = masks > mask_threshold
    boxes = batched_mask_to_box(bool_masks)

    # pack the TRANSPOSED masks so the packed bytes form the Fortran-order
    # bitstream each RLE needs (native.rle_from_packed decodes it directly)
    B, C, H, W = bool_masks.shape
    transposed = bool_masks.transpose(0, 1, 3, 2)  # (B, C, W, H)
    pad_h = (-H) % 8
    if pad_h:
        transposed = jnp.pad(transposed, ((0, 0), (0, 0), (0, 0), (0, pad_h)))
    packed = jnp.packbits(transposed.reshape(B * C, W, -1), axis=-1)
    return packed, iou_pred, stability, boxes


class _AmgDecoder:
    """Cached jitted AMG decode programs per (batch, original_size)."""

    def __init__(self, predictor: "SamPredictor", stability_offset: float = 1.0,
                 mask_threshold: float = 0.0):
        self.predictor = predictor
        self.stability_offset = stability_offset
        self.mask_threshold = mask_threshold
        self._jit = None

    def __call__(self, points_xy: np.ndarray) -> tuple:
        """points_xy: (B, 2) transformed (1024-frame) xy coords.

        Returns numpy (packed_masks (B*3, W, ceil(H/8)), iou (B, 3),
        stability (B, 3), boxes (B, 3, 4)).
        """
        return self.fetch(self.dispatch(points_xy))

    @staticmethod
    def fetch(handles: tuple) -> tuple:
        """Pull dispatched device results to the host. Safe to call from a
        worker thread, which is how the AMG loop overlaps this transfer with
        host-side RLE of the previous batch."""
        return tuple(np.asarray(h) for h in handles)

    def dispatch(self, points_xy: np.ndarray) -> tuple:
        """Launch the decode program asynchronously; returns device arrays
        (fetch() materializes them)."""
        import functools
        import jax
        import jax.numpy as jnp

        pred = self.predictor
        if self._jit is None:
            if pred.mesh is not None:
                # production mesh path: prompt batch + all reduced outputs
                # ride the data axis; params keep their (possibly
                # tensor-sharded) placement
                from jax.sharding import NamedSharding, PartitionSpec as P
                from .parallel.mesh import sam_param_shardings
                data = NamedSharding(pred.mesh, P("data"))
                p_shard = sam_param_shardings(pred.model.params, pred.mesh)
                self._jit = jax.jit(
                    functools.partial(_amg_decode_impl, pred.model),
                    static_argnums=(4, 5, 6, 7),
                    in_shardings=(p_shard, data, data, data),
                    out_shardings=(data, data, data, data),
                )
            else:
                self._jit = jax.jit(
                    functools.partial(_amg_decode_impl, pred.model),
                    static_argnums=(4, 5, 6, 7),
                )
        points_xy, true_b = pred._pad_batch(points_xy)[0], points_xy.shape[0]
        B = points_xy.shape[0]
        pts = np.concatenate(
            [points_xy[:, None, :], np.zeros((B, 1, 2), np.float32)], axis=1
        )
        lbl = np.concatenate(
            [np.ones((B, 1), np.int32), -np.ones((B, 1), np.int32)], axis=1
        )
        feats = pred.features
        if feats.shape[0] != B:
            feats = jnp.broadcast_to(feats, (B,) + feats.shape[1:])
        if pred.mesh is not None:
            feats = jax.device_put(feats, pred._data_sharding)
        # statics passed positionally: pjit rejects kwargs when in_shardings
        # is specified (the meshed path)
        packed, iou, stability, boxes = self._jit(
            pred.model.params, feats, jnp.asarray(pts), jnp.asarray(lbl),
            self.mask_threshold, self.stability_offset,
            tuple(pred.input_size), tuple(pred.original_size),
        )
        if true_b != B:
            c = packed.shape[0] // B
            packed = packed[:true_b * c]
            iou, stability, boxes = iou[:true_b], stability[:true_b], boxes[:true_b]
        # packed: (B*3, W, ceil(H/8)) Fortran-order bitstreams (see
        # native.rle_from_packed); stays packed — RLE reads the bits directly.
        return packed, iou, stability, boxes
