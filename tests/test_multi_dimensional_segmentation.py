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
