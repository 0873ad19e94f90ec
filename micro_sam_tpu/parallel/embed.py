"""Mesh-sharded embedding precompute: the tiled-embedding fan-out over chips.

The reference's tiled precompute is sequential per batch (util.py:764-898);
on TPU the tile batch is embarrassingly parallel — shard the batch axis over
the mesh's data axis with pjit and let every chip encode its shard
(SURVEY.md §5 "embedding-precompute fan-out is embarrassingly parallel").
"""
from __future__ import annotations

from typing import Iterator, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import make_mesh, sam_param_shardings


class ShardedEncoder:
    """Data-parallel batched encoder over a device mesh.

    Pads the final partial batch to the fixed batch size (one compiled
    program), shards inputs on the mesh data axis, keeps params replicated or
    tensor-sharded (mesh model axis).
    """

    def __init__(self, sam, mesh: Optional[Mesh] = None, batch_size: Optional[int] = None):
        self.sam = sam
        self.mesh = mesh or make_mesh()
        data_size = self.mesh.shape["data"]
        self.batch_size = batch_size or data_size
        assert self.batch_size % data_size == 0, \
            f"batch size {self.batch_size} must be divisible by data axis {data_size}"

        self._data_sharding = NamedSharding(self.mesh, P("data"))
        p_shard = sam_param_shardings(sam.params, self.mesh)
        self._params = jax.device_put(sam.params, p_shard)

        from ..models.sam import preprocess

        def encode(params, pixels):
            return sam.encode_image(params, preprocess(pixels, sam.config.img_size))

        self._encode = jax.jit(
            encode,
            in_shardings=(p_shard, self._data_sharding),
            out_shardings=self._data_sharding,
        )

    def encode_batch(self, batch: np.ndarray) -> np.ndarray:
        """batch: (B, h, w, 3) resized pixels -> (B, e, e, 256) float32."""
        n = batch.shape[0]
        if n < self.batch_size:
            pad = np.repeat(batch[-1:], self.batch_size - n, axis=0)
            batch = np.concatenate([batch, pad], axis=0)
        x = jax.device_put(jnp.asarray(batch), self._data_sharding)
        out = self._encode(self._params, x)
        return np.asarray(out[:n], dtype=np.float32)

    def encode_tiles(self, tiles: Sequence[np.ndarray]) -> List[np.ndarray]:
        """Encode a sequence of same-shape tiles in mesh-sized batches."""
        results: List[np.ndarray] = []
        for start in range(0, len(tiles), self.batch_size):
            chunk = np.stack(tiles[start:start + self.batch_size])
            results.extend(self.encode_batch(chunk))
        return results


def precompute_image_embeddings_sharded(
    predictor,
    input_: np.ndarray,
    tile_shape: Tuple[int, int],
    halo: Tuple[int, int],
    save_path: Optional[str] = None,
    mesh: Optional[Mesh] = None,
    batch_size: Optional[int] = None,
    verbose: bool = False,
):
    """Tiled 2d embedding precompute with the encoder sharded over the mesh.

    Compatibility alias: the mesh is wired into the PRODUCTION precompute
    (get_sam_model(mesh=...) / SamPredictor.shard_on_mesh), so this delegates
    to util.precompute_image_embeddings on a meshed predictor — same
    ImageEmbeddings structure and cache layout, drop-in.
    """
    from .. import util

    if predictor.mesh is None:
        predictor.shard_on_mesh(mesh or make_mesh())
    return util.precompute_image_embeddings(
        predictor, input_, save_path=save_path, ndim=2,
        tile_shape=tuple(tile_shape), halo=tuple(halo),
        batch_size=batch_size or predictor.batch_multiple, verbose=verbose,
    )
