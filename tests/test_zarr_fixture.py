"""zarr interop golden fixtures: the committed trees under tests/fixtures/
were written byte-for-byte from the zarr v2/v3 specs by an independent
json+zlib writer (tests/make_zarr_fixture.py) in the upstream framework's
cache layout — so these tests prove zarr_lite and the embedding-cache loader
accept stores this framework did not itself produce (VERDICT r1 next#9;
reference micro_sam/util.py:1069-1093 signature contract).
"""
import json
import os
import shutil
import zlib

import numpy as np
import pytest

from tests.make_zarr_fixture import feature_pattern, fixture_input

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def test_zarr_lite_reads_untiled_fixture():
    from micro_sam_tpu.utils import zarr_lite

    f = zarr_lite.open(os.path.join(FIXTURES, "zarr_ref_cache"), mode="r")
    assert f.attrs["model_type"] == "vit_b"
    assert f.attrs["tile_shape"] is None
    assert f.attrs["model_hash"].startswith("xxh128:")
    feats = f["features"][...]
    np.testing.assert_array_equal(feats, feature_pattern((1, 256, 64, 64)))
    # partial read crossing the chunk boundary (chunks are (1,128,64,64))
    np.testing.assert_array_equal(
        f["features"][0, 100:140, 3],
        feature_pattern((1, 256, 64, 64))[0, 100:140, 3],
    )


def test_zarr_lite_reads_v3_fixture():
    from micro_sam_tpu.utils import zarr_lite

    f = zarr_lite.open(os.path.join(FIXTURES, "zarr_ref_v3"), mode="r")
    arr = f["emb"]
    assert arr.shape == (4, 6)
    np.testing.assert_array_equal(arr[...], feature_pattern((4, 6)).astype(np.float32))
    assert arr.attrs["purpose"] == "v3 interop"


def test_zarr_lite_reads_raw_chunks():
    from micro_sam_tpu.utils import zarr_lite

    f = zarr_lite.open(os.path.join(FIXTURES, "zarr_ref_cache_tiled"), mode="r")
    np.testing.assert_array_equal(f["raw_probe"][...], feature_pattern((8, 12)))


def _no_encode(monkeypatch):
    from micro_sam_tpu import util

    def boom(*a, **k):
        raise AssertionError("cache hit expected: encoder must not run")

    monkeypatch.setattr(util, "_encode_batch", boom)


def test_precompute_accepts_reference_cache(tiny_predictor, tmp_path, monkeypatch):
    """A cache written by the upstream layout (input_size attr, no 'done'
    marker) must load without recomputing (reference util.py:1069-1072)."""
    from micro_sam_tpu.util import precompute_image_embeddings

    cache = tmp_path / "cache.zarr"
    shutil.copytree(os.path.join(FIXTURES, "zarr_ref_cache"), cache)
    _no_encode(monkeypatch)
    emb = precompute_image_embeddings(
        tiny_predictor, fixture_input(), save_path=str(cache), verbose=False)
    np.testing.assert_array_equal(
        np.asarray(emb["features"]), feature_pattern((1, 256, 64, 64)))
    assert tuple(emb["input_size"]) == (914, 1024)
    assert tuple(emb["original_size"]) == (96, 112)


def test_precompute_accepts_reference_tiled_cache(tiny_predictor, tmp_path, monkeypatch):
    from micro_sam_tpu.util import precompute_image_embeddings

    cache = tmp_path / "cache.zarr"
    shutil.copytree(os.path.join(FIXTURES, "zarr_ref_cache_tiled"), cache)
    _no_encode(monkeypatch)
    emb = precompute_image_embeddings(
        tiny_predictor, fixture_input((96, 112)), save_path=str(cache),
        tile_shape=(64, 64), halo=(8, 8), verbose=False)
    assert emb["tile_shape"] == (64, 64) and emb["halo"] == (8, 8)
    tiles = emb["features"]
    assert sorted(tiles) == [0, 1, 2, 3]
    np.testing.assert_array_equal(
        tiles[2]["features"], feature_pattern((1, 256, 64, 64)) + 2)
    assert tuple(tiles[2]["input_size"]) == (1024, 1024)


def test_precompute_rejects_wrong_data_signature(tiny_predictor, tmp_path):
    from micro_sam_tpu.util import precompute_image_embeddings

    cache = tmp_path / "cache.zarr"
    shutil.copytree(os.path.join(FIXTURES, "zarr_ref_cache"), cache)
    other = fixture_input().copy()
    other[0, 0] ^= 0xFF
    with pytest.raises(RuntimeError, match="data_signature"):
        precompute_image_embeddings(
            tiny_predictor, other, save_path=str(cache), verbose=False)


def _spec_read_v2_array(root, prefix=""):
    """Independent zarr v2 reader: json + zlib only, no zarr_lite."""
    with open(os.path.join(root, *(prefix + ".zarray").split("/")), "rb") as f:
        meta = json.load(f)
    assert meta["zarr_format"] == 2 and meta["order"] == "C"
    assert meta["filters"] is None
    comp = meta["compressor"]
    assert comp is None or comp["id"] in ("zlib", "gzip")
    shape, chunks = meta["shape"], meta["chunks"]
    dtype = np.dtype(meta["dtype"])
    out = np.zeros(shape, dtype)
    import itertools
    grid = [range((s + c - 1) // c) for s, c in zip(shape, chunks)]
    for idx in itertools.product(*grid):
        fn = os.path.join(root, *(prefix + ".".join(map(str, idx))).split("/"))
        with open(fn, "rb") as f:
            raw = f.read()
        if comp is not None:
            raw = zlib.decompress(raw, 47 if comp["id"] == "gzip" else 15)
        block = np.frombuffer(raw, dtype).reshape(chunks)
        sl = tuple(slice(i * c, min((i + 1) * c, s))
                   for i, c, s in zip(idx, chunks, shape))
        out[sl] = block[tuple(slice(0, s.stop - s.start) for s in sl)]
    return out


def test_written_cache_is_spec_conformant(tiny_predictor, tmp_path):
    """Reverse direction: a cache written by precompute_image_embeddings must
    parse under an independent spec-only reader with matching bytes."""
    from micro_sam_tpu.util import precompute_image_embeddings

    image = fixture_input((64, 80))
    cache = str(tmp_path / "out.zarr")
    emb = precompute_image_embeddings(
        tiny_predictor, image, save_path=cache, verbose=False)

    with open(os.path.join(cache, ".zattrs")) as f:
        attrs = json.load(f)
    for key in ("data_signature", "model_type", "input_size", "original_size"):
        assert key in attrs, f"missing signature attr {key}"
    feats = _spec_read_v2_array(cache, "features/")
    np.testing.assert_array_equal(feats, np.asarray(emb["features"]))


def _spec_read_v3_array(root, prefix=""):
    """Independent zarr v3 reader: json + zlib only, no zarr_lite."""
    with open(os.path.join(root, *(prefix + "zarr.json").split("/"))) as f:
        meta = json.load(f)
    assert meta["zarr_format"] == 3 and meta["node_type"] == "array"
    shape = meta["shape"]
    grid_cfg = meta["chunk_grid"]
    assert grid_cfg["name"] == "regular"
    chunks = grid_cfg["configuration"]["chunk_shape"]
    key_enc = meta["chunk_key_encoding"]
    assert key_enc["name"] == "default"
    sep = key_enc.get("configuration", {}).get("separator", "/")
    codecs = [c["name"] for c in meta["codecs"]]
    assert codecs[0] == "bytes", "v3 arrays need an array->bytes codec first"
    assert set(codecs[1:]) <= {"gzip"}
    dtype = np.dtype(meta["data_type"])
    out = np.zeros(shape, dtype)
    import itertools
    grid = [range((s + c - 1) // c) for s, c in zip(shape, chunks)]
    for idx in itertools.product(*grid):
        key = "c" + "".join(f"{sep}{i}" for i in idx)
        with open(os.path.join(root, *(prefix + key).split("/")), "rb") as f:
            raw = f.read()
        if "gzip" in codecs:
            raw = zlib.decompress(raw, 47)  # gzip framing per the v3 codec
        block = np.frombuffer(raw, dtype).reshape(chunks)
        sl = tuple(slice(i * c, min((i + 1) * c, s))
                   for i, c, s in zip(idx, chunks, shape))
        out[sl] = block[tuple(slice(0, s.stop - s.start) for s in sl)]
    return out


def test_written_v3_cache_is_spec_conformant(tiny_predictor, tmp_path, monkeypatch):
    """MICROSAM_ZARR_FORMAT=3 must produce a pure zarr-v3 store (no v2
    markers) that parses under an independent v3 spec reader and still cache
    -hits on re-open — the round-trip a v3-writing reference install needs
    (reference micro_sam/util.py:684-706)."""
    from micro_sam_tpu import util
    from micro_sam_tpu.util import precompute_image_embeddings

    monkeypatch.setenv("MICROSAM_ZARR_FORMAT", "3")
    image = fixture_input((64, 80))
    cache = str(tmp_path / "out_v3.zarr")
    emb = precompute_image_embeddings(
        tiny_predictor, image, save_path=cache, verbose=False)

    # layout: v3 markers only
    assert os.path.exists(os.path.join(cache, "zarr.json"))
    for key in (".zgroup", ".zattrs", os.path.join("features", ".zarray")):
        assert not os.path.exists(os.path.join(cache, key)), f"v2 marker {key} in v3 store"
    with open(os.path.join(cache, "zarr.json")) as f:
        root_meta = json.load(f)
    assert root_meta["zarr_format"] == 3 and root_meta["node_type"] == "group"
    attrs = root_meta["attributes"]
    for key in ("data_signature", "model_type", "input_size", "original_size"):
        assert key in attrs, f"missing signature attr {key}"
    feats = _spec_read_v3_array(cache, "features/")
    np.testing.assert_array_equal(feats, np.asarray(emb["features"]))

    # re-open WITHOUT the env var: format auto-detected, cache hit (no encode)
    monkeypatch.delenv("MICROSAM_ZARR_FORMAT")
    _no_encode(monkeypatch)
    emb2 = precompute_image_embeddings(
        tiny_predictor, image, save_path=cache, verbose=False)
    np.testing.assert_array_equal(
        np.asarray(emb2["features"]), np.asarray(emb["features"]))


def test_written_v3_tiled_cache_round_trips(tiny_predictor, tmp_path, monkeypatch):
    """Tiled v3 cache: per-tile datasets land as v3 arrays and resume works."""
    from micro_sam_tpu.util import precompute_image_embeddings

    monkeypatch.setenv("MICROSAM_ZARR_FORMAT", "3")
    image = fixture_input((96, 112))
    cache = str(tmp_path / "tiled_v3.zarr")
    emb = precompute_image_embeddings(
        tiny_predictor, image, save_path=cache, tile_shape=(64, 64),
        halo=(8, 8), verbose=False)
    tiles = emb["features"]
    tile0 = _spec_read_v3_array(cache, "features/0/")
    np.testing.assert_array_equal(tile0, np.asarray(tiles[0]["features"]))
    _no_encode(monkeypatch)
    emb2 = precompute_image_embeddings(
        tiny_predictor, image, save_path=cache, tile_shape=(64, 64),
        halo=(8, 8), verbose=False)
    np.testing.assert_array_equal(
        np.asarray(emb2["features"][0]["features"]), tile0)
