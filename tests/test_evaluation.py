"""Evaluation subsystem tests: matching metrics, run_evaluation, grid search."""
import numpy as np
import pytest


def test_matching_perfect():
    from micro_sam_tpu.evaluation.matching import matching, mean_segmentation_accuracy

    seg = np.zeros((64, 64), dtype=np.uint32)
    seg[5:20, 5:20] = 1
    seg[30:50, 30:50] = 2

    res = matching(seg, seg)
    assert res["precision"] == 1.0 and res["recall"] == 1.0 and res["f1"] == 1.0
    assert mean_segmentation_accuracy(seg, seg) == 1.0


def test_matching_partial():
    from micro_sam_tpu.evaluation.matching import matching, mean_segmentation_accuracy

    gt = np.zeros((64, 64), dtype=np.uint32)
    gt[5:20, 5:20] = 1
    gt[30:50, 30:50] = 2
    pred = np.zeros_like(gt)
    pred[5:20, 5:20] = 7          # perfect match, different id
    pred[52:60, 52:60] = 3        # false positive

    res = matching(pred, gt, threshold=0.5)
    assert res["tp"] == 1 and res["fp"] == 1 and res["fn"] == 1
    assert res["precision"] == 0.5 and res["recall"] == 0.5

    msa = mean_segmentation_accuracy(pred, gt)
    assert 0 < msa < 1


def test_matching_empty():
    from micro_sam_tpu.evaluation.matching import matching, mean_segmentation_accuracy

    empty = np.zeros((32, 32), dtype=np.uint32)
    gt = np.zeros_like(empty)
    gt[2:10, 2:10] = 1
    res = matching(empty, gt)
    assert res["recall"] == 0.0
    assert mean_segmentation_accuracy(empty, gt) == 0.0


def test_run_evaluation(tmp_path):
    from micro_sam_tpu.evaluation import run_evaluation

    gt = np.zeros((64, 64), dtype=np.uint32)
    gt[5:20, 5:20] = 1
    res = run_evaluation([gt], [gt], save_path=str(tmp_path / "res.csv"))
    assert res["mSA"].iloc[0] == 1.0
    # cached read
    res2 = run_evaluation([gt], [gt], save_path=str(tmp_path / "res.csv"))
    assert res2["mSA"].iloc[0] == 1.0


def test_grid_search(tmp_path):
    """AIS grid search end-to-end with a tiny model."""
    import jax
    from micro_sam_tpu.models.sam import SamConfig, init_sam_params, Sam
    from micro_sam_tpu.predictor import SamPredictor
    from micro_sam_tpu.instance_segmentation import (
        DecoderAdapter, InstanceSegmentationWithDecoder,
    )
    from micro_sam_tpu.models.unetr import init_unetr_decoder
    from micro_sam_tpu.evaluation.instance_segmentation import (
        run_instance_segmentation_grid_search_and_inference,
    )
    from micro_sam_tpu.sample_data import synthetic_data

    cfg = SamConfig(model_type="vit_b", embed_dim=64, depth=2, num_heads=2,
                    global_attn_indexes=(1,), img_size=128)
    predictor = SamPredictor(Sam(cfg, init_sam_params(jax.random.PRNGKey(0), cfg)))
    decoder = DecoderAdapter(init_unetr_decoder(jax.random.PRNGKey(1)))
    segmenter = InstanceSegmentationWithDecoder(predictor, decoder)

    image, seg = synthetic_data(shape=(128, 128), seed=31, n_objects=3)
    grid = {"center_distance_threshold": [0.4, 0.6], "boundary_distance_threshold": [0.5]}
    pred_dir = run_instance_segmentation_grid_search_and_inference(
        segmenter, grid,
        val_image_paths=[image], val_gt_paths=[seg], test_image_paths=[image],
        embedding_dir=None,
        prediction_dir=str(tmp_path / "pred"),
        result_dir=str(tmp_path / "gs"),
        verbose_gs=False,
    )
    import os
    from glob import glob
    assert len(glob(os.path.join(pred_dir, "*.tif"))) == 1
    assert len(glob(str(tmp_path / "gs" / "*.csv"))) == 1


def test_experiments():
    from micro_sam_tpu.evaluation.experiments import (
        default_experiment_settings, full_experiment_settings, get_experiment_setting_name,
    )
    defaults = default_experiment_settings()
    assert len(defaults) == 4
    names = [get_experiment_setting_name(s) for s in defaults]
    assert "points-p1-n0" in names and "box" in names
    full = full_experiment_settings()
    assert len(full) == 5 * 6


def test_visualization():
    from micro_sam_tpu.visualization import compute_pca

    emb = np.random.RandomState(0).randn(1, 32, 16, 16).astype(np.float32)
    vis = compute_pca(emb)
    assert vis.shape == (16, 16, 3)
    assert vis.min() >= 0 and vis.max() <= 1


def test_object_features(synthetic_image):
    from micro_sam_tpu.object_classification import (
        compute_object_features, project_prediction_to_segmentation, train_classifier,
        run_prediction_with_classifier,
    )
    image, seg = synthetic_image
    emb = {
        "features": np.random.RandomState(0).randn(1, 32, 16, 16).astype(np.float32),
        "input_size": (256, 256), "original_size": (256, 256),
    }
    ids, feats = compute_object_features(emb, seg)
    assert len(ids) == len(np.unique(seg)) - 1
    assert feats.shape == (len(ids), 33)

    labels = (np.arange(len(ids)) % 2) + 1
    rf = train_classifier(feats, labels)
    pred = run_prediction_with_classifier(rf, feats)
    out = project_prediction_to_segmentation(seg, pred.astype(np.uint32), ids)
    assert out.shape == seg.shape
