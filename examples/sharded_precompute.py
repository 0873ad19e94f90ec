"""Mesh-sharded tiled embedding precompute for a large mosaic.

TPU-native feature with no reference counterpart: the tile batch fans out over
a jax.sharding.Mesh (data parallel), with optional tensor-parallel encoder
sharding on the model axis. Test on CPU with
XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu.
"""
import numpy as np

from micro_sam_tpu.parallel.embed import precompute_image_embeddings_sharded
from micro_sam_tpu.parallel.mesh import make_mesh
from micro_sam_tpu.sample_data import synthetic_data
from micro_sam_tpu.util import get_sam_model


def main():
    mosaic, _ = synthetic_data((4096, 4096), seed=11)
    predictor = get_sam_model(model_type="vit_b")

    mesh = make_mesh()  # all devices, data axis
    embeddings = precompute_image_embeddings_sharded(
        predictor, mosaic, tile_shape=(1024, 1024), halo=(128, 128),
        save_path="./mosaic_embeddings.zarr", mesh=mesh,
    )
    print("tiles:", len(embeddings["features"]))


if __name__ == "__main__":
    main()
