"""Device-mesh + sharding layout for SAM models.

The reference's only distributed mechanism is DDP gradient averaging
(SURVEY.md §2.2); here parallelism is expressed TPU-natively through a
``jax.sharding.Mesh`` with axes:

- ``data``:  batch / tile parallelism (embedding precompute fan-out, training
  batch). Gradients all-reduce over ICI automatically under jit.
- ``model``: tensor parallelism within the encoder — attention QKV/proj and
  MLP weights are sharded on their hidden dimension so the MXU-heavy matmuls
  split across chips; XLA's SPMD partitioner inserts the collectives.

Everything else (norms, embeddings, decoder) is replicated: the decoder is
latency-bound and tiny compared to the encoder.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None, model_axis: int = 1) -> Mesh:
    """Mesh with ("data", "model") axes over the given devices."""
    devices = list(jax.devices()) if devices is None else list(devices)
    n = len(devices)
    model_axis = max(1, model_axis)
    assert n % model_axis == 0, f"{n} devices not divisible by model axis {model_axis}"
    arr = np.asarray(devices).reshape(n // model_axis, model_axis)
    return Mesh(arr, ("data", "model"))


def _spec_for_path(path: str) -> P:
    """PartitionSpec for a SAM parameter, by its tree path."""
    if "image_encoder" in path:
        if path.endswith("attn/qkv/w") or path.endswith("mlp/lin1/w"):
            return P(None, "model")  # shard hidden/output dim
        if path.endswith("attn/qkv/b") or path.endswith("mlp/lin1/b"):
            return P("model")
        if path.endswith("attn/proj/w") or path.endswith("mlp/lin2/w"):
            return P("model", None)  # shard input dim; output all-reduced
    return P()


def _tree_paths(tree, prefix=""):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _tree_paths(v, f"{prefix}/{k}" if prefix else k)
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            yield from _tree_paths(v, f"{prefix}/{i}")
    else:
        yield prefix, tree


def sam_param_shardings(params: dict, mesh: Mesh):
    """NamedSharding tree matching ``params``' structure."""
    def build(tree, prefix=""):
        if isinstance(tree, dict):
            return {k: build(v, f"{prefix}/{k}" if prefix else k) for k, v in tree.items()}
        if isinstance(tree, (list, tuple)):
            return [build(v, f"{prefix}/{i}") for i, v in enumerate(tree)]
        return NamedSharding(mesh, _spec_for_path(prefix))
    return build(params)


def shard_params(params: dict, mesh: Mesh):
    shardings = sam_param_shardings(params, mesh)
    return jax.device_put(params, shardings), shardings
