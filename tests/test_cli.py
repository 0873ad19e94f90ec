"""CLI tests: real subprocess runs against tmp files (reference test_cli.py).

Uses the tiny vit_b override via MICROSAM_TINY env hook? No — runs the real
console scripts with a tiny monkeypatched registry through `python -c`.
"""
import os
import subprocess
import sys

import numpy as np
import pytest


def _run(code: str, timeout=520):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    return subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=timeout, env=env,
    )


TINY_PRELUDE = """
import os; os.environ['JAX_PLATFORMS']='cpu'
import micro_sam_tpu.models.build_sam as bs
from micro_sam_tpu.models.sam import SamConfig
bs.SAM_CONFIGS['vit_b'] = SamConfig(model_type='vit_b', embed_dim=64, depth=2,
                                    num_heads=2, global_attn_indexes=(1,), img_size=256)
"""


@pytest.fixture(scope="module")
def sample_image(tmp_path_factory):
    import imageio.v3 as imageio
    from micro_sam_tpu.sample_data import synthetic_data
    path = tmp_path_factory.mktemp("cli") / "image.png"
    image, _ = synthetic_data(shape=(256, 256), seed=42)
    imageio.imwrite(str(path), image)
    return str(path)


def test_cli_entrypoints_exist():
    import shutil
    try:
        import importlib.metadata as md
        md.distribution("micro_sam_tpu")
    except Exception:
        pytest.skip("package not pip-installed (console scripts need "
                    "`pip install -e .`, doc/development.md)")
    for name in [
        "micro_sam_tpu.automatic_segmentation",
        "micro_sam_tpu.precompute_embeddings",
        "micro_sam_tpu.train",
        "micro_sam_tpu.evaluate",
        "micro_sam_tpu.info",
        "micro_sam_tpu.benchmark_sam",
    ]:
        assert shutil.which(name) is not None, f"console script {name} missing"


def test_info_cli():
    res = _run("from micro_sam_tpu.info import main; import sys; sys.argv=['x']; main()")
    assert res.returncode == 0, res.stderr
    assert "micro_sam_tpu" in res.stdout
    assert "Supported Models" in res.stdout
    assert "vit_b" in res.stdout
    assert "System Information" in res.stdout


@pytest.mark.slow
def test_precompute_embeddings_cli(sample_image, tmp_path):
    out = str(tmp_path / "emb.zarr")
    code = TINY_PRELUDE + f"""
import sys; sys.argv = ['x', '-i', {sample_image!r}, '-o', {out!r}]
from micro_sam_tpu.precompute_state import main; main()
"""
    res = _run(code)
    assert res.returncode == 0, res.stderr
    assert os.path.exists(os.path.join(out, ".zattrs"))
    from micro_sam_tpu.utils import zarr_lite
    f = zarr_lite.open(out, mode="r")
    assert f.attrs["done"] is True
    assert f["features"].shape == (1, 256, 16, 16)


@pytest.mark.slow
def test_automatic_segmentation_cli(sample_image, tmp_path):
    out = str(tmp_path / "seg.tif")
    code = TINY_PRELUDE + f"""
import sys
sys.argv = ['x', '-i', {sample_image!r}, '-o', {out!r}, '-m', 'vit_b',
            '--segmentation_mode', 'amg', '--points_per_side', '4',
            '--pred_iou_thresh', '-10.0', '--stability_score_thresh', '0.0']
from micro_sam_tpu.automatic_segmentation import main; main()
"""
    res = _run(code)
    assert res.returncode == 0, res.stderr
    import imageio.v3 as imageio
    seg = imageio.imread(out)
    assert seg.shape == (256, 256)


def test_evaluate_cli(tmp_path):
    import imageio.v3 as imageio
    gt = np.zeros((64, 64), dtype=np.uint16)
    gt[5:20, 5:20] = 1
    gt_path = str(tmp_path / "gt.tif")
    imageio.imwrite(gt_path, gt)
    code = f"""
import sys; sys.argv = ['x', '-g', {gt_path!r}, '-p', {gt_path!r}]
from micro_sam_tpu.evaluation.evaluation import main; main()
"""
    res = _run(code)
    assert res.returncode == 0, res.stderr
    assert "mSA" in res.stdout
    assert "1.0" in res.stdout
