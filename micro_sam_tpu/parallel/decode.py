"""Mesh-sharded AMG grid decode.

AMG decodes hundreds of point prompts against one (replicated) embedding —
an embarrassingly data-parallel workload. The prompt batch is sharded on the
mesh ``data`` axis; the decode program (prompt encode + mask decode + on-
device packing, predictor._amg_decode_impl) runs under jit with sharded
in/out so XLA splits it across chips without collectives in the hot loop.

This replaces the reference's single-GPU ``points_per_batch`` loop
(micro_sam/instance_segmentation.py:389-399) with a multi-chip fan-out.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import make_mesh, sam_param_shardings


class ShardedAmgDecoder:
    """Drop-in for predictor._AmgDecoder that fans the prompt batch out over
    a device mesh. Call with (B, 2) transformed point coords; B is padded to
    a multiple of the data-axis size."""

    def __init__(self, predictor, mesh: Optional[Mesh] = None,
                 stability_offset: float = 1.0, mask_threshold: float = 0.0):
        from ..predictor import _amg_decode_impl

        self.predictor = predictor
        self.mesh = mesh or make_mesh()
        self.stability_offset = stability_offset
        self.mask_threshold = mask_threshold
        self._data = NamedSharding(self.mesh, P("data"))
        self._repl = NamedSharding(self.mesh, P())

        p_shard = sam_param_shardings(predictor.model.params, self.mesh)
        self._params = jax.device_put(predictor.model.params, p_shard)
        self._p_shard = p_shard
        self._decode_impl = _amg_decode_impl
        self._jit_cache = {}

    def _get_jit(self, input_size, original_size):
        # pjit rejects kwargs when in_shardings is given: bind the static
        # geometry into the traced function instead
        key = (input_size, original_size)
        if key not in self._jit_cache:
            model = self.predictor.model
            impl = self._decode_impl

            def decode(params, feats, pts, lbl):
                # one replicated embedding, broadcast per-shard in the program
                feats_b = jnp.broadcast_to(feats, (pts.shape[0],) + feats.shape[1:])
                return impl(
                    model, params, feats_b, pts, lbl,
                    mask_threshold=self.mask_threshold,
                    stability_offset=self.stability_offset,
                    input_size=input_size, original_size=original_size,
                )

            self._jit_cache[key] = jax.jit(
                decode,
                in_shardings=(self._p_shard, self._repl, self._data, self._data),
                out_shardings=self._data,
            )
        return self._jit_cache[key]

    def __call__(self, points_xy: np.ndarray) -> Tuple[np.ndarray, ...]:
        data_size = self.mesh.shape["data"]
        B = points_xy.shape[0]
        pad = (-B) % data_size
        if pad:
            points_xy = np.concatenate(
                [points_xy, np.repeat(points_xy[-1:], pad, axis=0)], axis=0)
        n = points_xy.shape[0]

        pred = self.predictor
        pts = np.concatenate(
            [points_xy[:, None, :], np.zeros((n, 1, 2), np.float32)], axis=1)
        lbl = np.concatenate(
            [np.ones((n, 1), np.int32), -np.ones((n, 1), np.int32)], axis=1)
        feats = pred.features
        if feats.shape[0] != 1:
            feats = feats[:1]

        jit_fn = self._get_jit(tuple(pred.input_size), tuple(pred.original_size))
        packed, iou, stability, boxes = jit_fn(
            self._params,
            jax.device_put(jnp.asarray(feats), self._repl),
            jax.device_put(jnp.asarray(pts), self._data),
            jax.device_put(jnp.asarray(lbl), self._data),
        )
        # packed rows are (B*3, ...): trim the padded prompts' 3 masks each
        keep = B * 3
        return (np.asarray(packed)[:keep], np.asarray(iou)[:B],
                np.asarray(stability)[:B], np.asarray(boxes)[:B])
