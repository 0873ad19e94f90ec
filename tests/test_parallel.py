"""Mesh/sharding tests on the virtual 8-device CPU mesh."""
import numpy as np
import pytest


def test_make_mesh():
    import jax
    from micro_sam_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(jax.devices()[:8], model_axis=2)
    assert mesh.shape["data"] == 4 and mesh.shape["model"] == 2


def test_param_shardings(tiny_sam):
    import jax
    from micro_sam_tpu.parallel.mesh import make_mesh, sam_param_shardings
    from jax.sharding import PartitionSpec as P

    mesh = make_mesh(jax.devices()[:8], model_axis=2)
    shardings = sam_param_shardings(tiny_sam.params, mesh)
    qkv = shardings["image_encoder"]["blocks"][0]["attn"]["qkv"]["w"]
    assert qkv.spec == P(None, "model")
    norm = shardings["image_encoder"]["blocks"][0]["norm1"]["scale"]
    assert norm.spec == P()


def test_sharded_encoder_matches_single(tiny_sam):
    import jax
    from micro_sam_tpu.parallel.embed import ShardedEncoder
    from micro_sam_tpu.parallel.mesh import make_mesh
    from micro_sam_tpu.models.sam import preprocess

    mesh = make_mesh(jax.devices()[:8], model_axis=2)
    enc = ShardedEncoder(tiny_sam, mesh=mesh)
    batch = (np.random.RandomState(0).rand(4, 256, 256, 3) * 255).astype(np.float32)

    out_sharded = enc.encode_batch(batch)
    import jax.numpy as jnp
    ref = np.asarray(tiny_sam.encode_image(
        tiny_sam.params, preprocess(jnp.asarray(batch), tiny_sam.config.img_size)
    ))
    assert out_sharded.shape == ref.shape
    assert np.allclose(out_sharded, ref, atol=2e-4), np.abs(out_sharded - ref).max()

    # partial batch (padding path)
    out_partial = enc.encode_batch(batch[:3])
    assert out_partial.shape[0] == 3
    assert np.allclose(out_partial, ref[:3], atol=2e-4)


def test_sharded_precompute(tiny_predictor, tmp_path):
    import jax
    from micro_sam_tpu.parallel.embed import precompute_image_embeddings_sharded
    from micro_sam_tpu.parallel.mesh import make_mesh
    from micro_sam_tpu.util import precompute_image_embeddings

    mesh = make_mesh(jax.devices()[:8], model_axis=1)
    image = (np.random.RandomState(3).rand(400, 400) * 255).astype(np.uint8)

    emb_sharded = precompute_image_embeddings_sharded(
        tiny_predictor, image, tile_shape=(200, 200), halo=(24, 24),
        save_path=str(tmp_path / "sharded.zarr"), mesh=mesh,
    )
    emb_ref = precompute_image_embeddings(
        tiny_predictor, image, str(tmp_path / "ref.zarr"),
        tile_shape=(200, 200), halo=(24, 24), verbose=False,
    )
    assert set(emb_sharded["features"].keys()) == set(emb_ref["features"].keys())
    for tid in emb_ref["features"]:
        a = emb_sharded["features"][tid]["features"]
        b = emb_ref["features"][tid]["features"]
        assert np.allclose(a, b, atol=2e-4), np.abs(a - b).max()


def test_dryrun_training_step():
    import jax
    from micro_sam_tpu.parallel.train_step import dryrun_training_step

    dryrun_training_step(jax.devices()[:8])
