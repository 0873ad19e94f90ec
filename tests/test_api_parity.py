"""Tests for the reference-API-parity surface added in round 3: every public
name of the reference package must exist (audit test) and the substantive ones
must behave (functional tests).

Reference files: micro_sam/training/util.py:53,293,327;
micro_sam/training/sam_trainer.py:489; micro_sam/training/semantic_sam_trainer.py:11;
micro_sam/models/peft_sam.py:16-391; micro_sam/evaluation/instance_segmentation.py:413;
micro_sam/sam_annotator/_widgets.py:359-1110; micro_sam/sam_annotator/util.py:135.
"""
import ast
import os

import numpy as np
import pytest


REF_ROOT = "/root/reference/micro_sam"
REPO_ROOT = os.path.join(os.path.dirname(__file__), "..", "micro_sam_tpu")


def _public_names(path):
    tree = ast.parse(open(path).read())
    names = set()
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            if not node.name.startswith("_"):
                names.add(node.name)
        elif isinstance(node, ast.Assign):
            for t in node.targets:
                if isinstance(t, ast.Name) and not t.id.startswith("_") and t.id.isupper():
                    names.add(t.id)
    return names


@pytest.mark.skipif(not os.path.isdir(REF_ROOT), reason="reference tree not present")
def test_every_reference_public_name_exists():
    repo_names = set()
    for dirpath, dirs, files in os.walk(REPO_ROOT):
        dirs[:] = [d for d in dirs if d != "__pycache__"]
        for f in files:
            if f.endswith(".py"):
                repo_names |= _public_names(os.path.join(dirpath, f))

    missing = {}
    for dirpath, dirs, files in os.walk(REF_ROOT):
        dirs[:] = [d for d in dirs if d != "__pycache__"]
        for f in files:
            if not f.endswith(".py"):
                continue
            gap = _public_names(os.path.join(dirpath, f)) - repo_names
            if gap:
                missing[os.path.relpath(os.path.join(dirpath, f), REF_ROOT)] = sorted(gap)
    assert not missing, f"reference public names absent from micro_sam_tpu: {missing}"


def _sigs(path):
    tree = ast.parse(open(path).read())
    out = {}

    def visit(node, prefix=""):
        for n in getattr(node, "body", []):
            if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef)):
                if n.name.startswith("_") and n.name != "__init__":
                    continue
                a = n.args
                out[f"{prefix}{n.name}"] = (
                    [x.arg for x in a.posonlyargs + a.args + a.kwonlyargs],
                    bool(a.kwarg),
                )
            elif isinstance(n, ast.ClassDef) and not n.name.startswith("_"):
                visit(n, prefix=f"{n.name}.")
    visit(tree)
    return out


@pytest.mark.skipif(not os.path.isdir(REF_ROOT), reason="reference tree not present")
def test_reference_signatures_are_accepted():
    """Every parameter of every shared public function/method must be accepted
    by a same-named repo callable (or absorbed by **kwargs) — drop-in calls
    written against the reference must not raise TypeError."""
    repo_sigs = {}
    for dp, ds, fs in os.walk(REPO_ROOT):
        ds[:] = [d for d in ds if d != "__pycache__"]
        for f in fs:
            if f.endswith(".py"):
                for k, v in _sigs(os.path.join(dp, f)).items():
                    repo_sigs.setdefault(k, []).append(v)

    problems = {}
    for dp, ds, fs in os.walk(REF_ROOT):
        ds[:] = [d for d in ds if d != "__pycache__"]
        for f in sorted(fs):
            if not f.endswith(".py"):
                continue
            for name, (args, _) in sorted(_sigs(os.path.join(dp, f)).items()):
                if name not in repo_sigs:
                    continue
                want = set(args) - {"self"}
                best = None
                for rargs, rkw in repo_sigs[name]:
                    missing = set() if rkw else want - (set(rargs) - {"self"})
                    if best is None or len(missing) < len(best):
                        best = missing
                if best:
                    problems[name] = sorted(best)
    assert not problems, f"reference parameters not accepted: {problems}"


def test_raw_transforms():
    from micro_sam_tpu.training import get_raw_transform, ResizeRawTrafo, ResizeLabelTrafo

    raw = np.random.RandomState(0).rand(60, 62).astype("float32") * 1000
    out = get_raw_transform("normalize_percentile")(raw)
    assert 0 <= out.min() and out.max() <= 255.0 + 1e-4
    out = get_raw_transform("normalize_minmax")(raw)
    assert abs(out.max() - 255) < 1e-3
    with pytest.raises(ValueError):
        get_raw_transform("nope")

    rt = ResizeRawTrafo((3, 64, 64), do_rescaling=True)
    assert rt(raw).shape == (3, 64, 64)

    labels = np.zeros((60, 62), int)
    labels[10:30, 10:30] = 1
    lt = ResizeLabelTrafo((64, 64))
    out = lt(labels)
    assert out.shape == (4, 64, 64)  # instances + fg + center-dist + boundary-dist


def test_custom_dice_loss():
    import jax.numpy as jnp
    from micro_sam_tpu.training import CustomDiceLoss

    loss = CustomDiceLoss(num_classes=3)
    pred = jnp.zeros((2, 3, 16, 16))
    target = jnp.ones((2, 1, 16, 16))
    val = float(loss(pred, target))
    assert 0.0 < val <= 1.0
    # a correct prediction scores strictly better than a wrong one
    # (empty channels keep dice 0 by the eps convention, as in the reference)
    right = jnp.full((1, 3, 8, 8), -50.0).at[:, 1].set(50.0)
    wrong = jnp.full((1, 3, 8, 8), -50.0).at[:, 2].set(50.0)
    target = jnp.ones((1, 8, 8))
    assert float(loss(right, target)) < float(loss(wrong, target)) - 0.2


def test_peft_surgery_classes_select_modules():
    from micro_sam_tpu.models.peft_sam import (
        LoRASurgery, FacTSurgery, SSFSurgery, AdaptFormer, AttentionSurgery,
        BiasSurgery, LayerNormSurgery, ClassicalSurgery,
    )
    expect = {
        LoRASurgery: "lora", FacTSurgery: "fact", SSFSurgery: "ssf",
        AdaptFormer: "adaptformer", AttentionSurgery: "attention_tuning",
        BiasSurgery: "bias_tuning", LayerNormSurgery: "layernorm_tuning",
        ClassicalSurgery: "classical",
    }
    for cls, name in expect.items():
        assert cls.peft_module_name == name


def test_peft_sam_accepts_surgery_class(tiny_sam):
    from micro_sam_tpu.models.peft_sam import PEFT_Sam, LoRASurgery

    import copy
    sam = copy.copy(tiny_sam)
    sam.params = copy.deepcopy(tiny_sam.params)
    wrapped = PEFT_Sam(sam, rank=2, peft_module=LoRASurgery)
    assert wrapped.peft_module == "lora"
    assert "lora" in sam.params["image_encoder"]["blocks"][0]["attn"]


def test_save_grid_search_best_params(tmp_path):
    from micro_sam_tpu.evaluation.instance_segmentation import save_grid_search_best_params

    p = save_grid_search_best_params(
        {"pred_iou_thresh": 0.8, "stability_score_thresh": 0.9}, 0.71, str(tmp_path))
    assert os.path.basename(p) == "grid_search_params_amg.csv"
    assert os.path.exists(p)
    p = save_grid_search_best_params({"center_distance_threshold": 0.5}, 0.6, str(tmp_path))
    assert "decoder" in os.path.basename(p)


@pytest.mark.slow
def test_sam_logger_classes(tmp_path):
    from micro_sam_tpu.training import SamLogger, JointSamLogger

    class FakeTrainer:
        name = "run"
        log_image_interval = 1

    logger = SamLogger(FakeTrainer(), str(tmp_path))
    logger.log_train(0, 1.0, 1e-4, x=np.zeros((1, 1, 8, 8)), y=np.zeros((1, 1, 8, 8)),
                     samples=[np.zeros((1, 1, 8, 8))])
    logger.log_validation(0, 0.5, 1.0)
    jlogger = JointSamLogger(FakeTrainer(), str(tmp_path))
    jlogger.add_image(np.zeros((1, 1, 8, 8)), np.zeros((1, 1, 8, 8)), [], "val", 0)


def test_prompt_menu_and_pbar_signals():
    from micro_sam_tpu._test_util import FakeViewer
    from micro_sam_tpu.sam_annotator._widgets import PBarSignals, create_prompt_menu

    viewer = FakeViewer()
    layer = viewer.add_points(np.zeros((0, 2)), name="pts",
                              properties={"label": np.zeros(0, dtype=object)})
    menu = create_prompt_menu(layer, ["positive", "negative"])
    assert menu is not None

    got = []
    sig = PBarSignals()
    sig.pbar_total.connect(got.append)
    sig.pbar_total.emit(7)
    assert got == [7]


def test_clear_annotations_slice():
    from micro_sam_tpu._test_util import FakeViewer
    from micro_sam_tpu.sam_annotator.util import clear_annotations_slice

    viewer = FakeViewer()
    viewer.add_points(
        np.array([[0.0, 4.0, 4.0], [1.0, 5.0, 5.0]]), name="point_prompts",
        properties={"label": np.array(["positive", "positive"], dtype=object)})
    viewer.add_shapes([np.array([[0.0, 1.0, 1.0], [0.0, 8.0, 8.0]])], name="prompts")
    seg = np.zeros((2, 16, 16), dtype="uint32")
    seg[0, :4, :4] = 1
    viewer.add_labels(seg, name="current_object")

    clear_annotations_slice(viewer, i=0)
    assert len(viewer.layers["point_prompts"].data) == 1
    assert viewer.layers["point_prompts"].data[0, 0] == 1.0
    assert len(viewer.layers["prompts"].data) == 0
    assert viewer.layers["current_object"].data[0].max() == 0


def test_relabel_consecutive_accepts_bool():
    from micro_sam_tpu import native

    mask = np.zeros((8, 8), dtype=bool)
    mask[2:4, 2:4] = True
    out, max_id, mapping = native.relabel_consecutive(mask)
    assert max_id == 1 and out.max() == 1


@pytest.mark.slow
def test_livecell_functions_exist_and_validate(tmp_path):
    from micro_sam_tpu.evaluation import livecell

    # data layout is absent -> path resolution must raise a clear error
    with pytest.raises((RuntimeError, AssertionError)):
        livecell.run_livecell_precompute_embeddings(None, str(tmp_path), "vit_t", str(tmp_path))
    with pytest.raises(ValueError):
        livecell.livecell_inference(None, str(tmp_path), "vit_t", str(tmp_path),
                                    use_points=False, use_boxes=False)


def test_build_sam_aliases():
    from micro_sam_tpu.models.build_sam import (
        build_sam_vit_b, build_sam_vit_l, build_sam_vit_h)
    assert callable(build_sam_vit_b) and callable(build_sam_vit_l) and callable(build_sam_vit_h)


def test_misc_constants():
    from micro_sam_tpu._model_settings import ND_SEGMENT_SETTINGS, ND_SEGMENTATION_SETTINGS
    from micro_sam_tpu.evaluation.benchmark_datasets import DATASET_RETURNS_FOLDER
    from micro_sam_tpu.bioimageio.model_export import ARBITRARY_SIZE
    from micro_sam_tpu.sam_annotator.annotator_tracking import STATE_COLOR_CYCLE
    from micro_sam_tpu.util import get_cache_directory

    assert ND_SEGMENT_SETTINGS is ND_SEGMENTATION_SETTINGS
    assert DATASET_RETURNS_FOLDER["deepbacs"] == "*.tif"
    assert ARBITRARY_SIZE.min == 1 and ARBITRARY_SIZE.step == 1
    assert len(STATE_COLOR_CYCLE) == 2
    assert isinstance(get_cache_directory(), str)


@pytest.mark.skipif(not os.path.isdir(REF_ROOT), reason="reference tree not present")
def test_cli_flags_cover_reference():
    """Every CLI flag of the reference's console-script mains must be accepted
    by the corresponding repo CLI."""
    def cli_flags(path):
        tree = ast.parse(open(path).read())
        flags = set()
        for node in ast.walk(tree):
            if isinstance(node, ast.Call) and isinstance(node.func, ast.Attribute) \
                    and node.func.attr == "add_argument":
                for a in node.args:
                    if isinstance(a, ast.Constant) and isinstance(a.value, str) \
                            and a.value.startswith("-"):
                        flags.add(a.value)
        return flags

    pairs = [
        ("precompute_state.py", "precompute_state.py"),
        ("automatic_segmentation.py", "automatic_segmentation.py"),
        ("training/training.py", "training/training.py"),
        ("evaluation/evaluation.py", "evaluation/evaluation.py"),
        ("evaluation/benchmark_datasets.py", "evaluation/benchmark_datasets.py"),
        ("sam_annotator/annotator_2d.py", "sam_annotator/annotator_2d.py"),
        ("sam_annotator/annotator_3d.py", "sam_annotator/annotator_3d.py"),
        ("sam_annotator/annotator_tracking.py", "sam_annotator/annotator_tracking.py"),
        ("sam_annotator/image_series_annotator.py", "sam_annotator/image_series_annotator.py"),
    ]
    problems = {}
    for ref, repo in pairs:
        missing = cli_flags(os.path.join(REF_ROOT, ref)) - \
            cli_flags(os.path.join(REPO_ROOT, repo))
        if missing:
            problems[repo] = sorted(missing)
    assert not problems, f"CLI flags missing vs reference: {problems}"
