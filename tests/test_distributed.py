"""Multi-host execution tests (parallel.distributed).

The heavy check is a REAL 2-process jax.distributed cluster (subprocess
workers on 4 virtual CPU devices each, Gloo collectives) asserting the
multi-host tiled precompute and one sharded training step are numerically
equal to the single-process 8-device run. The fast tests cover the
single-process mechanics the cluster builds on (tile assignment, sharded
zarr writes, stale-cache guard).
"""
import numpy as np
import pytest


def test_process_tile_ids():
    from micro_sam_tpu.parallel.distributed import process_tile_ids

    assert process_tile_ids(10, 0, 3) == [0, 3, 6, 9]
    assert process_tile_ids(10, 2, 3) == [2, 5, 8]
    shards = [process_tile_ids(7, p, 2) for p in range(2)]
    assert sorted(shards[0] + shards[1]) == list(range(7))
    assert not set(shards[0]) & set(shards[1])


def test_tile_subset_sharded_writes_equal_direct(tiny_predictor, tmp_path):
    """Disjoint tile_subset passes + finalize=False reproduce the direct
    computation exactly once the cache is stamped (the multi-host write
    pattern, driven single-process)."""
    from micro_sam_tpu.util import precompute_image_embeddings

    image = (np.random.RandomState(6).rand(300, 300) * 255).astype(np.uint8)
    path = str(tmp_path / "mh.zarr")
    kw = dict(tile_shape=(150, 150), halo=(16, 16), verbose=False)

    precompute_image_embeddings(tiny_predictor, image, path, tile_subset=[0, 2],
                                finalize=False, **kw)
    precompute_image_embeddings(tiny_predictor, image, path, tile_subset=[1, 3],
                                finalize=False, **kw)
    # coordinator pass: adopts every shard, stamps signature + done
    full = precompute_image_embeddings(tiny_predictor, image, path, **kw)
    ref = precompute_image_embeddings(tiny_predictor, image, None, **kw)
    assert set(full["features"]) == set(ref["features"]) == {0, 1, 2, 3}
    for tid in ref["features"]:
        a = np.asarray(full["features"][tid]["features"])
        b = np.asarray(ref["features"][tid]["features"])
        assert np.array_equal(a, b), tid

    # and the stamped cache is a pure cache hit afterwards
    again = precompute_image_embeddings(tiny_predictor, image, path, **kw)
    assert set(again["features"]) == {0, 1, 2, 3}


def test_stale_partial_cache_not_adopted(tiny_predictor, tmp_path):
    """Partial tiles from a DIFFERENT image (interrupted earlier run) must be
    recomputed, not adopted — the partial_signature marker guards this."""
    from micro_sam_tpu.util import precompute_image_embeddings

    rng = np.random.RandomState(6)
    image_a = (rng.rand(300, 300) * 255).astype(np.uint8)
    image_b = (rng.rand(300, 300) * 255).astype(np.uint8)
    path = str(tmp_path / "stale.zarr")
    kw = dict(tile_shape=(150, 150), halo=(16, 16), verbose=False)

    precompute_image_embeddings(tiny_predictor, image_a, path,
                                tile_subset=[0, 1, 2, 3], finalize=False, **kw)
    got = precompute_image_embeddings(tiny_predictor, image_b, path, **kw)
    ref = precompute_image_embeddings(tiny_predictor, image_b, None, **kw)
    for tid in ref["features"]:
        a = np.asarray(got["features"][tid]["features"])
        b = np.asarray(ref["features"][tid]["features"])
        assert np.array_equal(a, b), f"stale tile {tid} adopted"


def test_crash_resume_adopts_matching_tiles(tiny_predictor, tmp_path):
    """Partial tiles from the SAME image (crash resume) are adopted: the
    second pass computes only the missing tiles and finalizes."""
    from micro_sam_tpu.util import precompute_image_embeddings
    from micro_sam_tpu.utils import zarr_lite

    image = (np.random.RandomState(8).rand(300, 300) * 255).astype(np.uint8)
    path = str(tmp_path / "resume.zarr")
    kw = dict(tile_shape=(150, 150), halo=(16, 16), verbose=False)

    precompute_image_embeddings(tiny_predictor, image, path,
                                tile_subset=[0, 3], finalize=False, **kw)
    f = zarr_lite.open(path, mode="a")
    assert "done" not in dict(f.attrs) or not f.attrs.get("done")

    full = precompute_image_embeddings(tiny_predictor, image, path, **kw)
    assert set(full["features"]) == {0, 1, 2, 3}
    f = zarr_lite.open(path, mode="a")
    assert f.attrs.get("done")


@pytest.mark.slow
def test_dryrun_multihost_cluster():
    """The real thing: a 2-process x 4-device jax.distributed CPU cluster.
    dryrun_multihost asserts precompute-sha / step-loss / param-checksum
    equality against the single-process 8-device baseline and that the REAL
    SamTrainer runs one epoch with per-process data feeding + a coordinator
    checkpoint."""
    from micro_sam_tpu.parallel.distributed import dryrun_multihost

    results = dryrun_multihost(n_devices=8, n_processes=2)
    assert results["cluster"][0]["nproc"] == 2
    assert results["single"]["nproc"] == 1
    assert results["cluster"][0]["emb_sha"] == results["single"]["emb_sha"]
