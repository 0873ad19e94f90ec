"""Tests for util: normalization, embedding precompute + cache contract.

Mirrors reference test/test_util.py: embedding caching correctness incl.
tiled/3d layouts and zarr attribute signatures.
"""
import numpy as np
import pytest


def test_to_image():
    from micro_sam_tpu.util import _to_image

    x = np.random.RandomState(0).rand(64, 64).astype(np.float32)
    img = _to_image(x)
    assert img.shape == (64, 64, 3)
    assert img.dtype == np.uint8
    # reference truncates after /(max+1e-7), so the top lands on 254
    assert img.max() in (254, 255)

    x8 = (x * 255).astype(np.uint8)
    img = _to_image(x8)
    assert img.shape == (64, 64, 3)

    # uint8 inputs are min-max stretched too (reference util.py:642-646):
    # a low-dynamic-range image must use the full range after normalization
    xlow = ((x * 50) + 100).astype(np.uint8)  # values in [100, 150]
    img = _to_image(xlow)
    assert img.min() == 0 and img.max() in (254, 255)

    x2 = np.random.RandomState(0).rand(64, 64, 2)
    assert _to_image(x2).shape == (64, 64, 3)

    x5 = np.random.RandomState(0).rand(64, 64, 5)
    assert _to_image(x5).shape == (64, 64, 3)


def test_blocking():
    from micro_sam_tpu.utils.blocking import Blocking

    b = Blocking((0, 0), (250, 250), (100, 100))
    assert len(b) == 9
    blk = b.get_block(8)
    assert blk.begin == (200, 200) and blk.end == (250, 250)

    bh = b.get_block_with_halo(4, (10, 10))
    assert bh.outer_block.begin == (90, 90) and bh.outer_block.end == (210, 210)
    assert bh.inner_block.begin == (100, 100) and bh.inner_block.end == (200, 200)
    assert bh.inner_block_local.begin == (10, 10) and bh.inner_block_local.end == (110, 110)

    # border clipping of halo
    bh0 = b.get_block_with_halo(0, (10, 10))
    assert bh0.outer_block.begin == (0, 0)
    assert b.coordinates_to_block_id((150, 50)) == 3


def test_zarr_lite_roundtrip(tmp_path):
    from micro_sam_tpu.utils import zarr_lite

    path = str(tmp_path / "test.zarr")
    f = zarr_lite.open(path)
    f.attrs["hello"] = "world"
    ds = f.create_dataset("x", data=np.arange(24).reshape(4, 6), chunks=(2, 3))
    ds.attrs["meta"] = [1, 2]

    g = zarr_lite.open(path, mode="r")
    assert g.attrs["hello"] == "world"
    arr = g["x"]
    assert arr.shape == (4, 6)
    assert np.array_equal(arr[...], np.arange(24).reshape(4, 6))
    assert np.array_equal(arr[1:3, 2:5], np.arange(24).reshape(4, 6)[1:3, 2:5])
    assert arr.attrs["meta"] == [1, 2]

    # partial write
    arr[0:2, 0:2] = 99
    expected = np.arange(24).reshape(4, 6).copy()
    expected[0:2, 0:2] = 99
    assert np.array_equal(g["x"][...], expected)

    # group nesting
    grp = f.require_group("features")
    grp.create_dataset("0", data=np.ones((2, 2)))
    assert "features" in f
    assert list(f["features"].keys()) == ["0"]


def test_embeddings_2d(tiny_predictor, synthetic_image, tmp_path):
    from micro_sam_tpu.util import precompute_image_embeddings, set_precomputed

    image, _ = synthetic_image
    save_path = str(tmp_path / "emb.zarr")
    emb = precompute_image_embeddings(tiny_predictor, image, save_path, verbose=False)
    assert emb["features"].shape == (1, 256, 16, 16)
    assert emb["original_size"] == (256, 256)

    # cache hit: second call loads from disk
    emb2 = precompute_image_embeddings(tiny_predictor, image, save_path, verbose=False)
    assert np.allclose(emb["features"], emb2["features"])

    # signature mismatch on different data -> hard error
    other = np.asarray(image).copy()
    other[:10] = 0
    with pytest.raises(RuntimeError):
        precompute_image_embeddings(tiny_predictor, other, save_path, verbose=False)

    set_precomputed(tiny_predictor, emb)
    assert tiny_predictor.is_image_set
    assert tiny_predictor.features.shape == (1, 16, 16, 256)


def test_embeddings_tiled_2d(tiny_predictor, tmp_path):
    from micro_sam_tpu.util import precompute_image_embeddings, set_precomputed

    image = (np.random.RandomState(0).rand(400, 300) * 255).astype(np.uint8)
    emb = precompute_image_embeddings(
        tiny_predictor, image, str(tmp_path / "emb.zarr"),
        tile_shape=(200, 200), halo=(24, 24), verbose=False,
    )
    assert emb["shape"] == (400, 300)
    feats = emb["features"]
    assert set(feats.keys()) == {0, 1, 2, 3}
    assert feats[0]["features"].shape == (1, 256, 16, 16)
    # border tile original size includes halo
    assert feats[0]["original_size"] == (224, 224)

    set_precomputed(tiny_predictor, emb, tile_id=3)
    assert tiny_predictor.original_size == feats[3]["original_size"]

    # reload from cache
    emb2 = precompute_image_embeddings(
        tiny_predictor, image, str(tmp_path / "emb.zarr"),
        tile_shape=(200, 200), halo=(24, 24), verbose=False,
    )
    assert np.allclose(emb2["features"][2]["features"], feats[2]["features"])


def test_embeddings_3d(tiny_predictor, tmp_path):
    from micro_sam_tpu.util import precompute_image_embeddings, set_precomputed

    volume = (np.random.RandomState(0).rand(4, 128, 128) * 255).astype(np.uint8)
    emb = precompute_image_embeddings(
        tiny_predictor, volume, str(tmp_path / "emb3d.zarr"), ndim=3,
        verbose=False, batch_size=2,
    )
    assert emb["features"].shape == (4, 1, 256, 16, 16)
    set_precomputed(tiny_predictor, emb, i=2)
    assert tiny_predictor.features.shape == (1, 16, 16, 256)

    emb2 = precompute_image_embeddings(
        tiny_predictor, volume, str(tmp_path / "emb3d.zarr"), ndim=3, verbose=False,
    )
    assert np.allclose(emb["features"], emb2["features"])


def test_segmentation_to_one_hot():
    from micro_sam_tpu.util import segmentation_to_one_hot

    seg = np.zeros((10, 10), dtype=np.uint32)
    seg[:3, :3] = 1
    seg[5:, 5:] = 4
    oh = segmentation_to_one_hot(seg)
    assert oh.shape == (2, 1, 10, 10)
    assert oh[0].sum() == 9
    oh = segmentation_to_one_hot(seg, np.array([4]))
    assert oh.shape == (1, 1, 10, 10)


def test_zarr_lite_v3(tmp_path):
    from micro_sam_tpu.utils import zarr_lite

    path = str(tmp_path / "test_v3.zarr")
    f = zarr_lite.open(path, zarr_format=3)
    f.attrs["hello"] = "v3"
    ds = f.create_dataset("x", data=np.arange(24).reshape(4, 6), chunks=(2, 3))
    ds.attrs["meta"] = 7

    # auto-detection on reopen
    g = zarr_lite.open(path, mode="r")
    assert g.attrs["hello"] == "v3"
    arr = g["x"]
    assert arr.shape == (4, 6)
    assert np.array_equal(arr[...], np.arange(24).reshape(4, 6))
    assert arr.attrs["meta"] == 7

    # v3 layout on disk: zarr.json + c/-prefixed chunk keys
    import os, json
    assert os.path.exists(tmp_path / "test_v3.zarr" / "zarr.json")
    meta = json.loads((tmp_path / "test_v3.zarr" / "x" / "zarr.json").read_text())
    assert meta["zarr_format"] == 3 and meta["node_type"] == "array"
    assert os.path.exists(tmp_path / "test_v3.zarr" / "x" / "c" / "0" / "0")

    # nested groups + partial write
    grp = f.require_group("features")
    d0 = grp.create_dataset("0", data=np.ones((2, 2), dtype="float32"))
    d0[0:1, :] = 5.0
    assert zarr_lite.open(path)["features"]["0"][0, 0] == 5.0


def test_embeddings_cache_v3(tiny_predictor, synthetic_image, tmp_path):
    """The embedding cache round-trips through a v3 store too."""
    from micro_sam_tpu.util import precompute_image_embeddings
    from micro_sam_tpu.utils import zarr_lite

    image, _ = synthetic_image
    path = str(tmp_path / "emb_v3.zarr")
    # pre-create the store as v3; precompute writes into it
    zarr_lite.open(path, zarr_format=3)
    emb = precompute_image_embeddings(tiny_predictor, image, path, verbose=False)
    assert emb["features"].shape == (1, 256, 16, 16)
    emb2 = precompute_image_embeddings(tiny_predictor, image, path, verbose=False)
    assert np.allclose(emb["features"], emb2["features"])
    import os
    assert os.path.exists(tmp_path / "emb_v3.zarr" / "zarr.json")


# ---------------------------------------------------------------------------
# Model zoo cache + hash validation (reference util.py:97-141, 258-266)
# ---------------------------------------------------------------------------

def test_model_registry_has_hashes_and_urls():
    from micro_sam_tpu.util import models

    registry = models()
    assert "vit_b" in registry and "vit_b_lm_decoder" in registry
    for name, entry in registry.items():
        assert entry["hash"].startswith("xxh128:"), name
    assert registry["vit_b"]["url"].endswith("sam_vit_b_01ec64.pth")


def test_cached_model_hash_validation(tmp_path, monkeypatch):
    import xxhash
    from micro_sam_tpu import util as sam_util

    monkeypatch.setenv("MICROSAM_CACHEDIR", str(tmp_path))
    model_dir = tmp_path / "models"
    model_dir.mkdir()

    # no cached file -> None
    assert sam_util._resolve_cached_model("vit_b") is None

    # corrupt cached file -> hard error naming the hash mismatch
    (model_dir / "vit_b").write_bytes(b"not a real checkpoint")
    with pytest.raises(RuntimeError, match="hash"):
        sam_util._resolve_cached_model("vit_b")

    # matching hash -> resolved path
    payload = b"pretend checkpoint bytes"
    (model_dir / "vit_b").write_bytes(payload)
    good = f"xxh128:{xxhash.xxh128(payload).hexdigest()}"
    monkeypatch.setitem(sam_util._MODEL_HASHES, "vit_b", good)
    assert sam_util._resolve_cached_model("vit_b").endswith("vit_b")


def test_embedding_signature_carries_model_hash(tiny_predictor):
    from micro_sam_tpu.util import _embedding_signature

    tiny_predictor._hash = "xxh128:deadbeef"
    sig = _embedding_signature(tiny_predictor, np.zeros((8, 8), "uint8"), None, None)
    assert sig["model_hash"] == "xxh128:deadbeef"


def test_pairwise_overlap_varshape_matches_dense():
    """The tiled-NMS overlap computed on bbox-intersection windows must match
    a dense full-frame computation (new round-3 path for masks living in
    different tile frames)."""
    import numpy as np
    from micro_sam_tpu.util import _pairwise_overlap_varshape

    rng = np.random.RandomState(3)
    H = W = 64
    n = 6
    full, masks, offsets, boxes = [], [], [], []
    for _ in range(n):
        cy, cx = rng.randint(10, 54, 2)
        r = rng.randint(4, 12)
        yy, xx = np.ogrid[:H, :W]
        frame = (yy - cy) ** 2 + (xx - cx) ** 2 <= r ** 2
        full.append(frame)
        ys, xs = np.nonzero(frame)
        y0, y1, x0, x1 = ys.min(), ys.max() + 1, xs.min(), xs.max() + 1
        # each mask lives in its own cropped frame with a random margin
        my0 = max(0, y0 - rng.randint(0, 4)); mx0 = max(0, x0 - rng.randint(0, 4))
        my1 = min(H, y1 + rng.randint(0, 4)); mx1 = min(W, x1 + rng.randint(0, 4))
        masks.append(frame[my0:my1, mx0:mx1])
        offsets.append([mx0, my0])
        boxes.append([x0, y0, x1, y1])
    offsets = np.asarray(offsets, np.int64)
    boxes = np.asarray(boxes, np.float64)

    for iomin in (False, True):
        got = _pairwise_overlap_varshape(masks, offsets, boxes, iomin)
        dense = np.eye(n)
        for i in range(n):
            for j in range(n):
                if i == j:
                    continue
                inter = np.logical_and(full[i], full[j]).sum()
                if iomin:
                    denom = min(full[i].sum(), full[j].sum()) + 1e-6
                else:
                    denom = full[i].sum() + full[j].sum() - inter + 1e-6
                dense[i, j] = inter / denom
        np.testing.assert_allclose(got, dense, atol=1e-6)
