"""bioimage.io export tests (tiny model)."""
import os
import zipfile

import numpy as np
import pytest


def test_export_sam_model(tiny_predictor, synthetic_image, tmp_path):
    from micro_sam_tpu.bioimageio import export_sam_model

    image, seg = synthetic_image
    out = export_sam_model(
        image, seg, model_type="vit_b", name="test-model",
        output_path=str(tmp_path / "model.zip"), predictor=tiny_predictor,
    )
    assert os.path.exists(out)
    with zipfile.ZipFile(out) as z:
        names = z.namelist()
    assert "rdf.yaml" in names
    assert any(n.startswith("model.") for n in names)
    assert "test_input.npy" in names and "test_mask.npy" in names


def test_predictor_adaptor(tiny_predictor, synthetic_image):
    from micro_sam_tpu.bioimageio import PredictorAdaptor

    image, seg = synthetic_image
    adaptor = PredictorAdaptor(tiny_predictor)
    input_ = image[None, None].astype(np.float32)
    boxes = np.array([[[10.0, 10.0, 60.0, 60.0]]])
    masks, scores, embeddings = adaptor(input_, box_prompts=boxes)
    assert masks.shape[0] == 1 and masks.shape[-2:] == image.shape
    assert embeddings.shape[1] == 256


def test_export_image_encoder(tiny_predictor, tmp_path, monkeypatch):
    from micro_sam_tpu.bioimageio import bioengine_export
    from micro_sam_tpu import util as sam_util

    monkeypatch.setattr(sam_util, "get_sam_model", lambda **kw: tiny_predictor)
    out = bioengine_export.export_image_encoder("vit_b", str(tmp_path))
    assert os.path.exists(out)
    assert os.path.getsize(out) > 1000
    assert os.path.exists(tmp_path / "image-encoder" / "config.pbtxt")


def test_package_round_trip(tiny_predictor, synthetic_image, tmp_path):
    """Export -> reload -> re-run packaged test tensors -> outputs must match
    (offline equivalent of the reference's bioimageio.core round trip)."""
    from micro_sam_tpu.bioimageio import export_sam_model
    from micro_sam_tpu.bioimageio.model_export import (
        load_sam_package, test_model_package,
    )

    image, seg = synthetic_image
    out = export_sam_model(
        image, seg, model_type="vit_b", name="roundtrip-test",
        output_path=str(tmp_path / "model.zip"), predictor=tiny_predictor,
    )

    predictor, meta = load_sam_package(out)
    assert meta["name"] == "roundtrip-test"
    assert predictor.model.config.embed_dim == tiny_predictor.model.config.embed_dim

    report = test_model_package(out)
    assert report["passed"], report
    assert report["mask_agreement"] > 0.999
