"""Tests for 3d segmentation, multicut merging and tracking."""
import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_setup():
    import jax
    from micro_sam_tpu.models.sam import SamConfig, init_sam_params, Sam
    from micro_sam_tpu.predictor import SamPredictor
    from micro_sam_tpu.sample_data import synthetic_data

    cfg = SamConfig(model_type="vit_b", embed_dim=64, depth=2, num_heads=2,
                    global_attn_indexes=(1,), img_size=128)
    params = init_sam_params(jax.random.PRNGKey(0), cfg)
    predictor = SamPredictor(Sam(cfg, params))
    # small stack of shifted disks (reference-style synthetic volume)
    image2d, seg2d = synthetic_data(shape=(128, 128), seed=11, n_objects=4)
    volume = np.stack([np.roll(image2d, shift=2 * z, axis=0) for z in range(4)])
    vol_seg = np.stack([np.roll(seg2d, shift=2 * z, axis=0) for z in range(4)])
    return predictor, volume, vol_seg


def test_segment_mask_in_volume(tiny_setup):
    from micro_sam_tpu.util import precompute_image_embeddings
    from micro_sam_tpu.multi_dimensional_segmentation import segment_mask_in_volume

    predictor, volume, vol_seg = tiny_setup
    emb = precompute_image_embeddings(predictor, volume, ndim=3, verbose=False)

    seg = np.zeros(volume.shape, dtype="uint32")
    seg[1] = (vol_seg[1] == 1).astype("uint32")
    out, (zmin, zmax) = segment_mask_in_volume(
        seg, predictor, emb, segmented_slices=np.array([1]),
        stop_lower=False, stop_upper=False, iou_threshold=0.0, projection="box",
    )
    assert out.shape == volume.shape
    assert zmin <= 1 <= zmax


def test_merge_instance_segmentation_3d():
    from micro_sam_tpu.multi_dimensional_segmentation import merge_instance_segmentation_3d

    # stacked 2d segmentations of the same 2 objects with unique ids per slice
    seg = np.zeros((3, 32, 32), dtype="uint32")
    offset = 0
    for z in range(3):
        seg[z, 4:12, 4:12] = offset + 1
        seg[z, 20:28, 20:28] = offset + 2
        offset += 2
    merged = merge_instance_segmentation_3d(seg, verbose=False)
    ids = np.unique(merged)
    ids = ids[ids != 0]
    assert len(ids) == 2
    # each object is one consistent 3d id
    for z in range(3):
        assert len(np.unique(merged[z][merged[z] != 0])) == 2
    assert (merged[0] == merged[1]).all()


def test_merge_with_gap_closing():
    from micro_sam_tpu.multi_dimensional_segmentation import merge_instance_segmentation_3d

    seg = np.zeros((5, 16, 16), dtype="uint32")
    # object present in z=0,1,3,4 but missing in z=2 (gap)
    for i, z in enumerate([0, 1, 3, 4]):
        seg[z, 4:12, 4:12] = i + 1
    merged = merge_instance_segmentation_3d(seg, gap_closing=1, verbose=False)
    ids = np.unique(merged)
    assert len(ids[ids != 0]) >= 1


def test_automatic_3d_segmentation(tiny_setup, tiny_decoder_module):
    from micro_sam_tpu.instance_segmentation import InstanceSegmentationWithDecoder
    from micro_sam_tpu.multi_dimensional_segmentation import automatic_3d_segmentation

    predictor, volume, _ = tiny_setup
    segmenter = InstanceSegmentationWithDecoder(predictor, tiny_decoder_module)
    out = automatic_3d_segmentation(
        volume, predictor, segmenter, verbose=False, min_size=10,
    )
    assert out.shape == volume.shape
    assert out.dtype == np.uint32


@pytest.fixture(scope="module")
def tiny_decoder_module():
    import jax
    from micro_sam_tpu.instance_segmentation import DecoderAdapter
    from micro_sam_tpu.models.unetr import init_unetr_decoder

    params = init_unetr_decoder(jax.random.PRNGKey(3), embed_dim=256, out_channels=3)
    return DecoderAdapter(params)


def test_tracking_greedy_linker():
    from micro_sam_tpu.multi_dimensional_segmentation import track_across_frames

    # two objects moving; one divides at t=2
    seg = np.zeros((4, 64, 64), dtype="uint32")
    seg[0, 5:15, 5:15] = 1
    seg[1, 7:17, 5:15] = 2
    seg[2, 9:14, 5:15] = 3   # division child A
    seg[2, 15:20, 5:15] = 4  # division child B
    seg[3, 10:15, 5:15] = 5
    timeseries = (seg > 0).astype(np.uint8) * 200

    tracks, lineages = track_across_frames(timeseries, seg, verbose=False)
    assert tracks.shape == seg.shape
    track_ids = set(np.unique(tracks)) - {0}
    assert len(track_ids) >= 2
    # lineage structure: every dict maps track -> list of children
    assert all(isinstance(v, list) for lineage in lineages for v in lineage.values())
    # at least one division was detected
    assert any(len(v) > 0 for lineage in lineages for v in lineage.values())


def test_get_napari_track_data():
    from micro_sam_tpu.multi_dimensional_segmentation import get_napari_track_data

    tracks = np.zeros((2, 16, 16), dtype="uint32")
    tracks[0, 2:6, 2:6] = 1
    tracks[1, 3:7, 2:6] = 1
    data, parents = get_napari_track_data(tracks, [{1: []}])
    assert data.shape[1] == 4
    assert parents == {}


def test_ctc_export(tmp_path):
    from micro_sam_tpu.multi_dimensional_segmentation import _export_ctc

    tracks = np.zeros((2, 16, 16), dtype="uint32")
    tracks[0, 2:6, 2:6] = 1
    tracks[1, 3:7, 2:6] = 1
    out = str(tmp_path / "ctc")
    _export_ctc(tracks, [{1: []}], out)
    import os
    assert os.path.exists(os.path.join(out, "mask000.tif"))
    assert os.path.exists(os.path.join(out, "res_track.txt"))


def test_preprocess_closing_reconciliation():
    """Gap closing must fill a 1-slice hole in an isolated object (adopting
    the closed component) but must NOT fuse two objects a single closed
    component would span; ids come out globally unique across slices."""
    import numpy as np
    from micro_sam_tpu.multi_dimensional_segmentation import _preprocess_closing

    Z, H, W = 7, 32, 32
    seg = np.zeros((Z, H, W), dtype="uint32")
    # object A: present every slice except z=3 (a gap the closing bridges)
    for z in range(Z):
        if z != 3:
            seg[z, 4:10, 4:10] = 1
    # objects B and C: adjacent boxes on every slice — their closed
    # foreground is one component per slice, which would FUSE them
    for z in range(Z):
        seg[z, 18:24, 4:12] = 2
        seg[z, 18:24, 12:20] = 3

    out = _preprocess_closing(seg.copy(), gap_closing=1, pbar_update=lambda *a: None)

    # the A-gap got filled
    assert (out[3, 4:10, 4:10] > 0).any(), "closed gap was not filled"
    # B and C keep distinct labels on an interior slice
    b_ids = set(np.unique(out[3, 18:24, 4:12])) - {0}
    c_ids = set(np.unique(out[3, 18:24, 12:20])) - {0}
    assert b_ids and c_ids and b_ids.isdisjoint(c_ids), (b_ids, c_ids)
    # labels are globally unique across slices (running offset)
    seen = set()
    for z in range(Z):
        ids = set(np.unique(out[z])) - {0}
        assert seen.isdisjoint(ids)
        seen |= ids


def test_segment_mask_in_volume_bridges_interior_gaps(tiny_setup):
    """The volume walk fills slices strictly between two user-segmented
    anchors (even and odd gaps) and respects stop_lower/stop_upper."""
    import numpy as np
    from micro_sam_tpu.multi_dimensional_segmentation import segment_mask_in_volume
    from micro_sam_tpu.util import precompute_image_embeddings

    from micro_sam_tpu.sample_data import synthetic_data

    predictor, _, _ = tiny_setup
    image2d, _ = synthetic_data(shape=(128, 128), seed=13, n_objects=3)
    volume = np.stack([image2d] * 8)   # 8 slices, constant content
    n_slices = volume.shape[0]
    emb = precompute_image_embeddings(predictor, volume, ndim=3, verbose=False)

    seg = np.zeros(volume.shape, dtype="uint32")
    # anchors at z=1 and z=6: odd gap of 4 interior slices (2..5)
    for z in (1, 6):
        seg[z, 20:40, 20:40] = 1

    out, (zmin, zmax) = segment_mask_in_volume(
        seg.copy(), predictor, emb, np.array([1, 6]),
        stop_lower=True, stop_upper=True, iou_threshold=0.5, projection="box",
    )
    for z in range(2, 6):
        assert (out[z] > 0).any(), f"interior slice {z} not segmented"
    # stop flags: nothing outside the anchors
    assert not (out[0] > 0).any() and zmin == 1 and zmax == 6
    if n_slices > 7:
        assert not (out[7:] > 0).any()
