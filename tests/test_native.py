"""Native C++ postprocess ops vs numpy/scipy fallbacks."""
import numpy as np
import pytest

from micro_sam_tpu import native


def test_native_available():
    # the build step runs in CI/setup; if the .so is missing the fallbacks
    # cover functionality, but in this repo we expect the built library
    assert native.has_native()


def test_label_multilabel():
    seg = np.zeros((20, 20), dtype=np.uint32)
    seg[2:8, 2:8] = 5
    seg[2:8, 8:14] = 9     # touching block with different id -> stays separate
    seg[12:18, 12:18] = 5  # same id, disconnected -> new component
    out = native.label(seg)
    ids = np.unique(out)
    assert len(ids[ids != 0]) == 3
    assert (out[seg == 0] == 0).all()
    # components are uniform
    for i in np.unique(out):
        if i == 0:
            continue
        region = out == i
        assert len(np.unique(seg[region])) == 1


def test_watershed_c_vs_py():
    rng = np.random.RandomState(0)
    hm = rng.rand(40, 40).astype(np.float32)
    seeds = np.zeros((40, 40), dtype=np.uint32)
    seeds[5, 5] = 1
    seeds[30, 30] = 2
    mask = np.ones((40, 40), dtype=np.uint8)
    mask[20, :] = 0  # wall with a gap
    mask[20, 35:] = 1

    out_c = native.seeded_watershed(hm, seeds, mask)
    out_py = native._watershed_py(hm, seeds.copy(), mask)
    assert np.array_equal(out_c, out_py)
    assert (out_c[mask == 0] == 0).all()
    assert set(np.unique(out_c)) <= {0, 1, 2}


def test_watershed_3d():
    hm = np.random.RandomState(1).rand(4, 16, 16).astype(np.float32)
    seeds = np.zeros((4, 16, 16), dtype=np.uint32)
    seeds[0, 2, 2] = 1
    seeds[3, 12, 12] = 2
    out = native.seeded_watershed(hm, seeds)
    assert (out != 0).all()
    assert set(np.unique(out)) == {1, 2}


def test_rle_c_matches_numpy():
    from micro_sam_tpu.ops.amg_utils import mask_to_rle
    rng = np.random.RandomState(2)
    for shape in [(16, 16), (7, 13), (1, 5)]:
        mask = rng.rand(*shape) > 0.5
        ref = mask_to_rle(mask)
        out = native.compute_rle_batch(mask[None])[0]
        assert out["size"] == ref["size"]
        assert out["counts"] == ref["counts"], (out, ref)


def test_greedy_multicut():
    # two clusters {0,1,2} and {3,4}, repulsive edge between them
    uv = np.array([[0, 1], [1, 2], [3, 4], [2, 3]])
    costs = np.array([5.0, 4.0, 3.0, -10.0])
    labels = native.greedy_multicut(5, uv, costs)
    assert labels[0] == labels[1] == labels[2]
    assert labels[3] == labels[4]
    assert labels[0] != labels[3]


def test_size_filter_and_relabel():
    seg = np.zeros((20, 20), dtype=np.uint32)
    seg[:3, :3] = 1       # 9 px
    seg[10:18, 10:18] = 7  # 64 px
    out = native.size_filter(seg, min_size=10)
    ids = np.unique(out)
    assert set(ids) == {0, 1}
    assert (out[seg == 7] == 1).all()


def test_watershed_unionfind_parallel():
    """Multithreaded union-find watershed: identical output for any thread
    count, full labeling, close agreement with the priority-flood variant
    (they differ only in boundary/tie policy)."""
    import scipy.ndimage as ndi
    from micro_sam_tpu import native

    rng = np.random.RandomState(0)
    h = ndi.gaussian_filter(rng.rand(256, 256).astype(np.float32), 8)
    seeds = np.zeros((256, 256), np.uint32)
    for i, (y, x) in enumerate(rng.randint(0, 256, (12, 2))):
        seeds[y, x] = i + 1
    mask = np.ones((256, 256), np.uint8)
    mask[:8] = 0  # excluded region stays 0

    a1 = native.seeded_watershed(h, seeds, mask, method="unionfind", n_threads=1)
    a8 = native.seeded_watershed(h, seeds, mask, method="unionfind", n_threads=8)
    pf = native.seeded_watershed(h, seeds, mask, method="priority")
    np.testing.assert_array_equal(a1, a8)
    assert (a1[8:] != 0).all() and (a1[:8] == 0).all()
    assert (a1 == pf).mean() > 0.9
    # seeds keep their labels
    ys, xs = np.nonzero(seeds)
    np.testing.assert_array_equal(a1[ys, xs], seeds[ys, xs])

    # 3d
    h3 = ndi.gaussian_filter(rng.rand(8, 64, 64).astype(np.float32), 4)
    seeds3 = np.zeros((8, 64, 64), np.uint32)
    seeds3[2, 16, 16] = 1
    seeds3[5, 48, 48] = 2
    b1 = native.seeded_watershed(h3, seeds3, method="unionfind", n_threads=1)
    b8 = native.seeded_watershed(h3, seeds3, method="unionfind", n_threads=8)
    np.testing.assert_array_equal(b1, b8)
    assert (b1 != 0).all()


def test_label_multilabel_parallel():
    """Strip-parallel CC matches the single-threaded implementation exactly."""
    import ctypes
    from micro_sam_tpu import native

    lib = native._load_lib()
    if not lib or not hasattr(lib, "label_multilabel_2d_par"):
        import pytest
        pytest.skip("native backend not built")

    rng = np.random.RandomState(1)
    seg = (rng.rand(333, 257) * 4).astype(np.uint32)  # touching multi-label regions
    out_serial = np.zeros(seg.shape, np.uint32)
    out_par = np.zeros(seg.shape, np.uint32)
    seg_c = np.ascontiguousarray(seg)
    lib.label_multilabel_2d(
        seg_c.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        out_serial.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        ctypes.c_int64(seg.shape[0]), ctypes.c_int64(seg.shape[1]))
    lib.label_multilabel_2d_par(
        seg_c.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        out_par.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        ctypes.c_int64(seg.shape[0]), ctypes.c_int64(seg.shape[1]),
        ctypes.c_int64(4))
    np.testing.assert_array_equal(out_serial, out_par)
