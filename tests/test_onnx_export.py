"""ONNX decoder export: the traced decode module must match the independent
torch reimplementation, and export_onnx_model must produce a valid ModelProto
without the onnx pip package (reference bioimageio/bioengine_export.py:106)."""
import os

import numpy as np
import pytest
import torch


@pytest.fixture(scope="module")
def tiny_sd(tiny_sam):
    from micro_sam_tpu.models.convert import export_torch_state_dict

    sd_np = export_torch_state_dict(tiny_sam.params, tiny_sam.config)
    return {k: torch.from_numpy(np.ascontiguousarray(v)).float()
            for k, v in sd_np.items()}


def test_onnx_decoder_matches_torch_ref(tiny_sam, tiny_sd):
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from torch_sam_ref import dense_pe, embed_points, mask_decoder

    from micro_sam_tpu.bioimageio.onnx_decoder import OnnxSamDecoder

    cfg = tiny_sam.config
    e = cfg.embedding_size
    dec = OnnxSamDecoder(tiny_sd, img_size=cfg.img_size, embedding_size=e).eval()

    rng = np.random.RandomState(0)
    emb = torch.from_numpy(rng.rand(1, cfg.prompt_embed_dim, e, e).astype("float32"))
    coords = torch.tensor([[[40., 60.], [100., 30.], [0., 0.]]])
    labels_f = torch.tensor([[1., 0., -1.]])

    with torch.no_grad():
        masks, iou, low_res = dec(
            emb, coords, labels_f, torch.zeros(1, 1, 4 * e, 4 * e),
            torch.zeros(1), torch.tensor([float(cfg.img_size)] * 2))

        # reference: no-mask dense embedding + same sparse prompts
        sparse = embed_points(
            tiny_sd, coords, labels_f.long(), (cfg.img_size, cfg.img_size))
        dense = (torch.zeros(1, cfg.prompt_embed_dim, e, e)
                 + tiny_sd["prompt_encoder.no_mask_embed.weight"][0][None, :, None, None])
        ref_masks, ref_iou = mask_decoder(
            tiny_sd, emb, dense_pe(tiny_sd, (e, e)), sparse, dense)

    torch.testing.assert_close(low_res, ref_masks, rtol=1e-4, atol=1e-4)
    torch.testing.assert_close(iou, ref_iou, rtol=1e-4, atol=1e-4)
    assert masks.shape == (1, 4, cfg.img_size, cfg.img_size)


def test_onnx_decoder_mask_input_path(tiny_sam, tiny_sd):
    """has_mask_input toggles between the downscaled mask embedding and the
    no-mask embedding; the two must differ and be deterministic."""
    from micro_sam_tpu.bioimageio.onnx_decoder import OnnxSamDecoder

    cfg = tiny_sam.config
    e = cfg.embedding_size
    dec = OnnxSamDecoder(tiny_sd, img_size=cfg.img_size, embedding_size=e).eval()
    rng = np.random.RandomState(1)
    emb = torch.from_numpy(rng.rand(1, cfg.prompt_embed_dim, e, e).astype("float32"))
    coords = torch.tensor([[[40., 60.]]])
    labels = torch.tensor([[1.]])
    mask_in = torch.from_numpy(rng.randn(1, 1, 4 * e, 4 * e).astype("float32"))

    with torch.no_grad():
        with_mask = dec(emb, coords, labels, mask_in, torch.ones(1),
                        torch.tensor([64., 64.]))[2]
        without = dec(emb, coords, labels, mask_in, torch.zeros(1),
                      torch.tensor([64., 64.]))[2]
    assert not torch.allclose(with_mask, without)


def test_export_onnx_model(tiny_predictor, tmp_path, monkeypatch):
    from micro_sam_tpu import util as sam_util
    from micro_sam_tpu.bioimageio.bioengine_export import export_onnx_model

    monkeypatch.setattr(sam_util, "get_sam_model", lambda **kw: tiny_predictor)
    path = export_onnx_model(
        "vit_b", str(tmp_path), export_name="onnx", return_path=True)
    assert path is not None and os.path.exists(path)
    data = open(path, "rb").read()
    assert len(data) > 10_000
    # ModelProto begins with ir_version (field 1, varint) then opset imports;
    # the graph must name our IO contract
    assert data[0] == 0x08
    for io_name in (b"image_embeddings", b"point_coords", b"orig_im_size",
                    b"iou_predictions", b"low_res_masks"):
        assert io_name in data, io_name


def test_export_bioengine_model(tiny_predictor, tmp_path, monkeypatch):
    from micro_sam_tpu import util as sam_util
    from micro_sam_tpu.bioimageio import bioengine_export as be

    monkeypatch.setattr(sam_util, "get_sam_model", lambda **kw: tiny_predictor)
    root = be.export_bioengine_model("vit_b", str(tmp_path / "triton"))
    assert os.path.exists(os.path.join(root, "image-encoder", "config.pbtxt"))
    assert os.path.exists(os.path.join(root, "image-encoder", "1", "model.stablehlo"))
    assert os.path.exists(os.path.join(root, "vit_b-decoder", "config.pbtxt"))
    assert os.path.exists(os.path.join(root, "vit_b-decoder", "1", "model.onnx"))
