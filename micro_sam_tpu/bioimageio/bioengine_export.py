"""BioEngine / Triton export (reference micro_sam/bioimageio/bioengine_export.py).

The TPU-native equivalents of the reference's torchscript/ONNX exports:
- export_image_encoder: serialize the jitted encoder as StableHLO via
  jax.export (portable, runnable by any StableHLO consumer incl. XLA runtimes).
- export_onnx_model: exports the decode path to ONNX when the onnx toolchain
  is available (not baked into this environment -> clear gating).
- export_bioengine_model: writes the Triton model-repository layout with
  config.pbtxt files for both parts.
"""
from __future__ import annotations

import os
import warnings
from typing import Optional, Union

import numpy as np

from .. import util

ENCODER_CONFIG = """name: "%s"
backend: "%s"
platform: "%s"

max_batch_size : 1
input [
  {
    name: "input0__0"
    data_type: TYPE_FP32
    dims: [3, -1, -1]
  }
]
output [
  {
    name: "output0__0"
    data_type: TYPE_FP32
    dims: [256, 64, 64]
  }
]

parameters: {
  key: "INFERENCE_MODE"
  value: {
    string_value: "true"
  }
}
"""

DECODER_CONFIG = """name: "%s"
backend: "onnxruntime"
platform: "onnxruntime_onnx"

parameters: {
  key: "INFERENCE_MODE"
  value: {
    string_value: "true"
  }
}
"""


def export_image_encoder(
    model_type: str,
    output_root: Union[str, os.PathLike],
    export_name: str = "image-encoder",
    checkpoint_path: Optional[Union[str, os.PathLike]] = None,
) -> str:
    """Export the image encoder as StableHLO (reference bioengine_export.py:67
    exports torchscript; StableHLO is the portable TPU-native equivalent)."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    predictor = util.get_sam_model(model_type=model_type, checkpoint_path=checkpoint_path)
    sam = predictor.model
    cfg = sam.config

    def encode(pixels):
        from ..models.sam import preprocess
        return sam.encode_image(sam.params, preprocess(pixels, cfg.img_size))

    x = jnp.zeros((1, cfg.img_size, cfg.img_size, 3), jnp.float32)
    exported = jexport.export(jax.jit(encode))(x)

    output_root = str(output_root)
    model_dir = os.path.join(output_root, export_name, "1")
    os.makedirs(model_dir, exist_ok=True)
    out_path = os.path.join(model_dir, "model.stablehlo")
    with open(out_path, "wb") as f:
        f.write(exported.serialize())

    config_path = os.path.join(output_root, export_name, "config.pbtxt")
    with open(config_path, "w") as f:
        f.write(ENCODER_CONFIG % (export_name, "stablehlo", "stablehlo"))
    return out_path


def export_onnx_model(
    model_type: str,
    output_root: Union[str, os.PathLike],
    opset: int = 17,
    export_name: str = "onnx",
    checkpoint_path: Optional[Union[str, os.PathLike]] = None,
    return_path: bool = False,
    quantize_model: bool = False,
    return_single_mask: bool = False,
    gelu_approximate: bool = False,
    use_stability_score: bool = False,
    return_extra_metrics: bool = False,
) -> Optional[str]:
    """Export the prompt-decode path to ONNX (reference bioengine_export.py:106).

    The decode module (bioimageio/onnx_decoder.py) is rebuilt in torch from
    the JAX params and traced with the legacy torchscript exporter. The
    exporter's final ``_add_onnxscript_fn`` pass — which only injects
    onnxscript custom functions this vanilla model does not contain — needs
    the ``onnx`` pip package, so it is bypassed with an identity patch; the
    serialized ModelProto before that pass is already complete and valid.
    """
    import unittest.mock as mock

    import torch

    from ..models.convert import export_torch_state_dict
    from .onnx_decoder import OnnxSamDecoder

    predictor = util.get_sam_model(model_type=model_type, checkpoint_path=checkpoint_path)
    cfg = predictor.model.config
    sd_np = export_torch_state_dict(predictor.model.params, cfg)
    sd = {k: torch.from_numpy(np.ascontiguousarray(v)).float() for k, v in sd_np.items()}
    if gelu_approximate:
        # tanh-approximated GELU for ONNX backends without an Erf op
        from .onnx_decoder import set_gelu_approximate
        set_gelu_approximate("tanh")
    decoder = OnnxSamDecoder(
        sd, img_size=cfg.img_size, embedding_size=cfg.embedding_size,
        return_single_mask=return_single_mask,
        use_stability_score=use_stability_score,
        return_extra_metrics=return_extra_metrics,
    ).eval()

    e = cfg.embedding_size
    example = (
        torch.randn(1, cfg.prompt_embed_dim, e, e),
        torch.randint(0, cfg.img_size, (1, 5, 2)).float(),
        torch.tensor([[1., 0., 2., 3., -1.]]),
        torch.randn(1, 1, 4 * e, 4 * e),
        torch.ones(1),
        torch.tensor([720., 960.]),
    )
    dynamic_axes = {
        "point_coords": {1: "num_points"},
        "point_labels": {1: "num_points"},
    }

    output_root = str(output_root)
    os.makedirs(os.path.join(output_root, export_name), exist_ok=True)
    weight_path = os.path.join(output_root, export_name, "model.onnx")

    from torch.onnx._internal.torchscript_exporter import onnx_proto_utils
    with torch.no_grad(), warnings.catch_warnings(), mock.patch.object(
            onnx_proto_utils, "_add_onnxscript_fn", lambda b, c: b):
        warnings.simplefilter("ignore")
        torch.onnx.export(
            decoder, example, weight_path,
            export_params=True, opset_version=opset, do_constant_folding=True,
            input_names=["image_embeddings", "point_coords", "point_labels",
                         "mask_input", "has_mask_input", "orig_im_size"],
            output_names=["masks", "iou_predictions", "low_res_masks"],
            dynamic_axes=dynamic_axes, dynamo=False,
        )

    if quantize_model:
        try:
            from onnxruntime.quantization import QuantType, quantize_dynamic
            quantized_path = os.path.join(output_root, export_name, "model_quantized.onnx")
            quantize_dynamic(
                model_input=weight_path, model_output=quantized_path,
                per_channel=False, reduce_range=False, weight_type=QuantType.QUInt8,
            )
            weight_path = quantized_path
        except ImportError:
            warnings.warn("onnxruntime is not available; skipping quantization.")

    return weight_path if return_path else None


def export_bioengine_model(
    model_type: str,
    output_root: Union[str, os.PathLike],
    opset: int = 17,
    checkpoint_path: Optional[Union[str, os.PathLike]] = None,
    export_name: str = "onnx",
    return_single_mask: bool = True,
    gelu_approximate: bool = False,
    use_stability_score: bool = False,
    return_extra_metrics: bool = False,
) -> str:
    """Export the Triton model-repository layout (reference
    bioengine_export.py:229): encoder (StableHLO) + decoder config."""
    output_root = str(output_root)
    export_image_encoder(model_type, output_root, "image-encoder", checkpoint_path)

    decoder_name = f"{model_type}-decoder"
    decoder_dir = os.path.join(output_root, decoder_name, "1")
    os.makedirs(decoder_dir, exist_ok=True)
    with open(os.path.join(output_root, decoder_name, "config.pbtxt"), "w") as f:
        f.write(DECODER_CONFIG % decoder_name)
    export_onnx_model(
        model_type, os.path.join(output_root, decoder_name), opset,
        export_name="1", checkpoint_path=checkpoint_path,
    )
    return output_root
