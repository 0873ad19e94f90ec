"""Integration tests for evaluation user flows: GT-prompt inference,
iterative prompting, 3d eval, the benchmark-dataset runner, visualization."""
import os
from glob import glob

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_env(tmp_path_factory):
    """Tiny model + a small on-disk dataset in the benchmark layout."""
    import imageio.v3 as imageio
    import jax
    from micro_sam_tpu.models.sam import SamConfig, init_sam_params, Sam
    from micro_sam_tpu.predictor import SamPredictor
    from micro_sam_tpu.sample_data import synthetic_data

    cfg = SamConfig(model_type="vit_b", embed_dim=64, depth=2, num_heads=2,
                    global_attn_indexes=(1,), img_size=128)
    predictor = SamPredictor(Sam(cfg, init_sam_params(jax.random.PRNGKey(0), cfg)))

    root = tmp_path_factory.mktemp("bench_data")
    img_dir = root / "tiny" / "images"
    gt_dir = root / "tiny" / "labels"
    img_dir.mkdir(parents=True)
    gt_dir.mkdir(parents=True)
    for i in range(3):
        image, seg = synthetic_data(shape=(128, 128), seed=40 + i, n_objects=3)
        imageio.imwrite(str(img_dir / f"im{i}.tif"), image)
        imageio.imwrite(str(gt_dir / f"im{i}.tif"), seg.astype(np.uint16))
    return predictor, str(root)


def test_run_inference_with_prompts(tiny_env, tmp_path):
    from micro_sam_tpu.evaluation.inference import run_inference_with_prompts
    from micro_sam_tpu.evaluation import run_evaluation

    predictor, root = tiny_env
    images = sorted(glob(os.path.join(root, "tiny", "images", "*")))
    gts = sorted(glob(os.path.join(root, "tiny", "labels", "*")))

    pred_dir = str(tmp_path / "preds")
    run_inference_with_prompts(
        predictor, images, gts, embedding_dir=None, prediction_dir=pred_dir,
        use_points=False, use_boxes=True, n_positives=0, n_negatives=0,
    )
    preds = sorted(glob(os.path.join(pred_dir, "*.tif")))
    assert len(preds) == 3
    res = run_evaluation(gts, preds)
    assert 0.0 <= res["mSA"].iloc[0] <= 1.0


def test_run_inference_with_iterative_prompting(tiny_env, tmp_path):
    from micro_sam_tpu.evaluation.inference import run_inference_with_iterative_prompting
    from micro_sam_tpu.evaluation import run_evaluation_for_iterative_prompting

    predictor, root = tiny_env
    images = sorted(glob(os.path.join(root, "tiny", "images", "*")))[:1]
    gts = sorted(glob(os.path.join(root, "tiny", "labels", "*")))[:1]

    pred_root = str(tmp_path / "iter")
    run_inference_with_iterative_prompting(
        predictor, images, gts, embedding_dir=None, prediction_dir=pred_root,
        start_with_box_prompt=False, n_iterations=2, use_masks=True,
    )
    assert len(glob(os.path.join(pred_root, "iteration00", "*.tif"))) == 1
    assert len(glob(os.path.join(pred_root, "iteration01", "*.tif"))) == 1

    res = run_evaluation_for_iterative_prompting(
        gts, pred_root, str(tmp_path / "exp"), start_with_box_prompt=False,
        use_masks=True,
    )
    assert len(res) == 2


def test_segment_slices_from_ground_truth(tiny_env):
    from micro_sam_tpu.evaluation.multi_dimensional_segmentation import (
        segment_slices_from_ground_truth,
    )
    from micro_sam_tpu.sample_data import synthetic_data

    predictor, _ = tiny_env
    image2d, seg2d = synthetic_data(shape=(128, 128), seed=50, n_objects=2)
    volume = np.stack([image2d] * 3)
    gt = np.stack([seg2d] * 3)

    scores = segment_slices_from_ground_truth(
        volume, gt, predictor=predictor, interactive_seg_mode="box",
        iou_threshold=0.0, projection="box",
    )
    assert "sa" in scores and 0.0 <= scores["sa"] <= 1.0


def test_benchmark_runner(tiny_env, tmp_path, monkeypatch):
    from micro_sam_tpu.evaluation import benchmark_datasets as bd
    from micro_sam_tpu import util as sam_util

    predictor, root = tiny_env
    monkeypatch.setattr(
        sam_util, "get_sam_model",
        lambda **kw: (predictor, {"model_state": predictor.model.params})
        if kw.get("return_state") else predictor,
    )
    df = bd.run_benchmark_evaluation(
        root, "tiny", "vit_b", str(tmp_path / "out"),
        run_amg=False, run_ais=False, run_interactive=True, n_val=1,
    )
    assert "interactive_point" in df.index
    assert os.path.exists(tmp_path / "out" / "tiny" / "vit_b" / "benchmark_results.csv")


def test_visualization_flows(tiny_env, tmp_path):
    from micro_sam_tpu.util import precompute_image_embeddings
    from micro_sam_tpu.visualization import project_embeddings_for_visualization
    from micro_sam_tpu.sample_data import synthetic_data

    predictor, _ = tiny_env
    image, _ = synthetic_data(shape=(128, 96), seed=60, n_objects=2)

    emb = precompute_image_embeddings(predictor, image, verbose=False)
    vis, scale = project_embeddings_for_visualization(emb)
    assert vis.ndim == 3 and vis.shape[-1] == 3

    volume = np.stack([image] * 2)
    emb3 = precompute_image_embeddings(predictor, volume, ndim=3, verbose=False)
    vis3, scale3 = project_embeddings_for_visualization(emb3)
    assert vis3.shape[0] == 2

    embt = precompute_image_embeddings(
        predictor, np.tile(image, (2, 3)), tile_shape=(128, 96), halo=(16, 16),
        verbose=False,
    )
    vist, scalet = project_embeddings_for_visualization(embt)
    assert vist.ndim == 3


# ---------------------------------------------------------------------------
# Full benchmark series (reference benchmark_datasets.py:259-828)
# ---------------------------------------------------------------------------

def _make_pair_dataset(root, name, n=2, shape=(128, 128), volumetric=False):
    import imageio.v3 as imageio
    from micro_sam_tpu.sample_data import synthetic_data

    img_dir = os.path.join(root, name, "images")
    gt_dir = os.path.join(root, name, "labels")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(gt_dir, exist_ok=True)
    for i in range(n):
        image, seg = synthetic_data(shape=shape, seed=70 + i, n_objects=3)
        if volumetric:
            image, seg = np.stack([image] * 3), np.stack([seg] * 3)
        imageio.imwrite(os.path.join(img_dir, f"im{i}.tif"), image)
        imageio.imwrite(os.path.join(gt_dir, f"im{i}.tif"), seg.astype(np.uint16))


def test_benchmark_crop_extraction_2d(tmp_path):
    from micro_sam_tpu.evaluation import benchmark_datasets as bd

    _make_pair_dataset(str(tmp_path), "livecell", n=2)
    ndim = bd._extract_slices_from_dataset(str(tmp_path / "livecell"), "livecell")
    assert ndim == 2
    images, gts = bd._get_image_label_paths(str(tmp_path / "livecell"), 2)
    assert len(images) == len(gts) > 0
    import imageio.v3 as imageio
    gt = imageio.imread(gts[0])
    assert len(np.unique(gt)) > 1  # most-instances-first selection kept objects
    # idempotent: re-running detects existing crops
    assert bd._extract_slices_from_dataset(str(tmp_path / "livecell"), "livecell") == 2


def test_benchmark_crop_extraction_3d_extracts_2d_too(tmp_path):
    from micro_sam_tpu.evaluation import benchmark_datasets as bd

    _make_pair_dataset(str(tmp_path), "lucchi", n=1, volumetric=True)
    ndim = bd._extract_slices_from_dataset(str(tmp_path / "lucchi"), "lucchi")
    assert ndim == 3
    images3, gts3 = bd._get_image_label_paths(str(tmp_path / "lucchi"), 3)
    images2, gts2 = bd._get_image_label_paths(str(tmp_path / "lucchi"), 2)
    assert len(images3) > 0 and len(images2) > 0
    import imageio.v3 as imageio
    assert imageio.imread(images3[0]).ndim == 3
    assert imageio.imread(images2[0]).ndim == 2


def test_benchmark_automatic_series(tiny_env, tmp_path, monkeypatch):
    from micro_sam_tpu.evaluation import benchmark_datasets as bd
    from micro_sam_tpu.automatic_segmentation import get_predictor_and_segmenter

    predictor, root = tiny_env
    state = {"model_state": predictor.model.params}
    monkeypatch.setattr(
        bd, "get_predictor_and_segmenter",
        lambda model_type, checkpoint=None, segmentation_mode=None, is_tiled=False:
        get_predictor_and_segmenter(
            model_type, predictor=predictor, state=state,
            segmentation_mode=segmentation_mode, is_tiled=is_tiled,
            points_per_side=4, points_per_batch=16,
        ))

    images = sorted(glob(os.path.join(root, "tiny", "images", "*")))[:1]
    gts = sorted(glob(os.path.join(root, "tiny", "labels", "*")))[:1]
    out = str(tmp_path / "out")
    bd._run_automatic_segmentation_per_dataset(
        images, gts, "vit_b", out, ndim=2, segmentation_mode="amg")
    assert os.path.exists(os.path.join(out, "results", "amg_2d.csv"))
    import pandas as pd
    res = pd.read_csv(os.path.join(out, "results", "amg_2d.csv"))
    assert "mSA" in res.columns


def test_benchmark_interactive_3d_series(tiny_env, tmp_path, monkeypatch):
    from micro_sam_tpu.evaluation import benchmark_datasets as bd
    from micro_sam_tpu.evaluation import multi_dimensional_segmentation as mds
    from micro_sam_tpu import util as sam_util

    predictor, _ = tiny_env
    monkeypatch.setattr(
        sam_util, "get_sam_model",
        lambda **kw: (predictor, {"model_state": predictor.model.params})
        if kw.get("return_state") else predictor)

    root = str(tmp_path / "data")
    _make_pair_dataset(root, "vol", n=1, volumetric=True)
    images = sorted(glob(os.path.join(root, "vol", "images", "*")))
    gts = sorted(glob(os.path.join(root, "vol", "labels", "*")))
    out = str(tmp_path / "out")
    os.makedirs(os.path.join(out, "results"), exist_ok=True)

    bd._run_interactive_segmentation_per_dataset(
        images, gts, out, "vit_b", prompt_choice="box", ndim=3)
    csv = os.path.join(out, "results", "interactive_segmentation_3d_with_box.csv")
    assert os.path.exists(csv)
    # the per-volume segmentation is persisted and resuming skips recompute
    saved = glob(os.path.join(out, "interactive_segmentation_3d", "box", "*"))
    assert len(saved) == 1

    def _boom(*a, **k):
        raise AssertionError("resume must not resegment")
    monkeypatch.setattr(mds, "segment_mask_in_volume", _boom)
    os.remove(csv)
    bd._run_interactive_segmentation_per_dataset(
        images, gts, out, "vit_b", prompt_choice="box", ndim=3)
    assert os.path.exists(csv)


def test_benchmark_cleanup_never_deletes_source_data_by_default(tmp_path):
    """Deviation from the reference, on purpose: source data cannot be
    re-downloaded here, so the default cleanup must keep images/ and labels/."""
    from micro_sam_tpu.evaluation import benchmark_datasets as bd

    data = tmp_path / "ds"
    for sub in ("images", "labels", "roi_2d"):
        (data / sub).mkdir(parents=True)
        (data / sub / "f.tif").write_bytes(b"x")
    out = tmp_path / "out"
    (out / "amg_2d").mkdir(parents=True)
    (out / "interactive_segmentation_2d").mkdir(parents=True)

    bd._clear_cached_items(retain=None, path=str(data), output_folder=str(out))
    assert (data / "images" / "f.tif").exists()
    assert (data / "labels" / "f.tif").exists()
    assert not (data / "roi_2d").exists()          # crops removed
    assert not (out / "amg_2d").exists()           # predictions removed
    assert not (out / "interactive_segmentation_2d").exists()

    # explicit empty retain opts into the reference behavior (remove data too)
    bd._clear_cached_items(retain=[], path=str(data), output_folder=str(out))
    assert not (data / "images").exists()


def test_model_comparison_flow(tmp_path):
    """generate -> advantage-ranked galleries -> files on disk; napari
    gallery raises cleanly without napari."""
    import h5py
    import jax
    import pytest
    from micro_sam_tpu.evaluation import model_comparison as mc
    from micro_sam_tpu.models.sam import SamConfig, init_sam_params, Sam
    from micro_sam_tpu.predictor import SamPredictor
    from micro_sam_tpu.sample_data import synthetic_data
    from micro_sam_tpu import util as msutil

    cfg = SamConfig(model_type="vit_b", embed_dim=64, depth=2, num_heads=2,
                    global_attn_indexes=(1,), img_size=128)

    built = []

    def fake_get_sam_model(model_type, checkpoint_path=None, **kwargs):
        pred = SamPredictor(Sam(cfg, init_sam_params(
            jax.random.PRNGKey(len(built)), cfg)))
        built.append(model_type)
        return pred

    image, seg = synthetic_data(shape=(128, 128), seed=9, n_objects=3)
    image = np.repeat(image[..., None], 3, axis=-1)  # (H, W, 3)
    loader = [(image[None], seg[None])]

    orig = msutil.get_sam_model
    msutil.get_sam_model = fake_get_sam_model
    try:
        mc.generate_data_for_model_comparison(
            loader, str(tmp_path / "cmp"), model_type1="vit_b",
            model_type2="vit_b", n_samples=1)
    finally:
        msutil.get_sam_model = orig

    sample = tmp_path / "cmp" / "sample0.h5"
    assert sample.exists()
    with h5py.File(sample, "r") as f:
        assert "objects" in f and len(f["objects"]) >= 1
        obj = next(iter(f["objects"].values()))
        assert "gt_mask" in obj and "points/mask1" in obj and "box/mask2" in obj
        assert "box" in obj.attrs and "point_coords" in obj.attrs
        scores = mc._score_objects(f, "points", min_size=0, have_model3=False)
        assert {"score1", "score2", "advantage1", "advantage2"} <= set(scores.columns)

    mc.model_comparison(str(tmp_path / "cmp"), n_images_per_sample=2,
                        min_size=0, plot_folder=str(tmp_path / "plots"))
    import glob as _glob
    plots = _glob.glob(str(tmp_path / "plots" / "*.png"))
    assert len(plots) >= 1

    with pytest.raises(RuntimeError, match="napari"):
        mc.model_comparison_with_napari(str(tmp_path / "cmp"))
