"""Structural validation of the napari plugin manifest (napari.yaml).

napari itself is not installable in this environment (zero egress), so this
is the npe2-style check the round-2 review asked for: every contribution's
python_name must import and resolve, widget contributions must be classes or
factories constructible without an image argument (napari passes only the
viewer), and sample-data commands must be callable.
"""
import importlib
from pathlib import Path

import pytest
import yaml

MANIFEST = Path(__file__).parent.parent / "micro_sam_tpu" / "napari.yaml"


@pytest.fixture(scope="module")
def manifest():
    with open(MANIFEST) as f:
        return yaml.safe_load(f)


def _resolve(python_name):
    module_name, attr = python_name.split(":")
    module = importlib.import_module(module_name)
    assert hasattr(module, attr), f"{module_name} has no attribute {attr}"
    return getattr(module, attr)


def test_manifest_structure(manifest):
    assert manifest["name"] == "micro-sam-tpu"
    contrib = manifest["contributions"]
    command_ids = {c["id"] for c in contrib["commands"]}
    # every widget / sample_data contribution references a declared command
    for section in ("widgets", "sample_data"):
        for entry in contrib[section]:
            assert entry["command"] in command_ids, entry
    # ids must be namespaced with the plugin name (npe2 requirement)
    for cid in command_ids:
        assert cid.startswith("micro-sam-tpu."), cid


def test_manifest_commands_resolve(manifest):
    for command in manifest["contributions"]["commands"]:
        obj = _resolve(command["python_name"])
        assert callable(obj), command["id"]


def test_widget_contributions_construct_headless(manifest):
    """Widget commands must construct from a viewer alone (the round-2 review
    found function contributions requiring an `image` argument, which napari
    cannot supply — reference pattern napari.yaml:36-60 registers classes)."""
    import inspect
    from micro_sam_tpu._test_util import FakeViewer

    contrib = manifest["contributions"]
    by_id = {c["id"]: c for c in contrib["commands"]}
    for entry in contrib["widgets"]:
        target = _resolve(by_id[entry["command"]]["python_name"])
        params = [
            p for p in inspect.signature(target).parameters.values()
            if p.default is inspect.Parameter.empty
            and p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD)
        ]
        names = [p.name for p in params if p.name != "self"]
        assert names in ([], ["viewer"]), (
            f"{entry['command']} requires arguments napari cannot supply: {names}"
        )
        if names == ["viewer"]:
            widget = target(FakeViewer())
            assert widget is not None
        else:
            # settings/training style widgets take no viewer
            assert target() is not None


def test_sample_data_commands_return_layer_data(manifest):
    contrib = manifest["contributions"]
    by_id = {c["id"]: c for c in contrib["commands"]}
    # one representative is enough (they all share the fetch-or-synthesize path)
    entry = next(e for e in contrib["sample_data"] if e["key"] == "segmentation")
    fn = _resolve(by_id[entry["command"]]["python_name"])
    layers = fn()
    assert isinstance(layers, list) and len(layers) >= 1
    data, meta = layers[0][0], layers[0][1]
    assert hasattr(data, "shape") and "name" in meta
