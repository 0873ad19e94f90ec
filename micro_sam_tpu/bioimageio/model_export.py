"""bioimage.io-style model export (reference micro_sam/bioimageio/model_export.py).

Produces a self-contained model package: the SAM weights in the interoperable
torch state-dict layout, an rdf.yaml description following the bioimage.io
model spec structure, test input/output tensors and a cover image. When the
``bioimageio.core`` package is available the package is additionally validated
with a round-trip check; otherwise the archive is produced as-is.
"""
from __future__ import annotations

import json
import os
import tempfile
import zipfile
from pathlib import Path
from typing import Dict, Optional, Union

import numpy as np

from .. import util, __version__
from .predictor_adaptor import PredictorAdaptor


class _ParameterizedSize:
    """Offline stand-in for bioimageio.spec ParameterizedSize: an axis size
    of min + n*step for any n >= 0 (reference model_export.py:41)."""

    def __init__(self, min: int = 1, step: int = 1):
        self.min = min
        self.step = step

    def __repr__(self):
        return f"ParameterizedSize(min={self.min}, step={self.step})"


# Arbitrary spatial axis size used in exported rdf axis specs.
ARBITRARY_SIZE = _ParameterizedSize(min=1, step=1)

DEFAULTS = {
    "authors": [{"name": "micro_sam_tpu"}],
    "description": "Segment Anything for Microscopy (TPU-native build)",
    "cite": [{
        "text": "Archit et al. Segment Anything for Microscopy.",
        "doi": "10.1038/s41592-024-02580-4",
    }],
    "tags": ["segment-anything", "instance-segmentation", "microscopy", "tpu"],
}


def _create_test_inputs_and_outputs(predictor, image, box, tmp_dir):
    """Run the PredictorAdaptor once to create test tensors
    (reference model_export.py:44)."""
    adaptor = PredictorAdaptor(predictor)
    input_ = image[None, None] if image.ndim == 2 else image[None]
    boxes = np.asarray(box, dtype=np.float64)[None, None]
    masks, scores, embeddings = adaptor(input_, box_prompts=boxes)

    paths = {}
    for name, arr in [
        ("test_input", input_), ("test_box", boxes), ("test_mask", masks),
        ("test_score", scores), ("test_embeddings", embeddings),
    ]:
        path = os.path.join(tmp_dir, f"{name}.npy")
        np.save(path, np.asarray(arr))
        paths[name] = path
    return paths


def export_sam_model(
    image: np.ndarray,
    label_image: Optional[np.ndarray],
    model_type: str,
    name: str,
    output_path: Union[str, os.PathLike],
    checkpoint_path: Optional[Union[str, os.PathLike]] = None,
    predictor=None,
    decoder_state=None,
    **kwargs,
) -> str:
    """Export a SAM model as a bioimage.io-style package
    (reference model_export.py:270).

    Args:
        image: Test image for the export round trip.
        label_image: Optional label image used to derive the test box prompt.
        model_type: The SAM model type.
        name: Model name in the package metadata.
        output_path: Where to save the .zip package.
        checkpoint_path: Optional checkpoint to load.
        kwargs: Extra metadata fields (authors, description, ...).

    Returns:
        The path of the written package.
    """
    if predictor is None:
        predictor = util.get_sam_model(model_type=model_type, checkpoint_path=checkpoint_path)

    # derive a test box from the labels (or a central box)
    if label_image is not None and label_image.max() > 0:
        oid = np.unique(label_image)[1]
        ys, xs = np.where(label_image == oid)
        box = [xs.min(), ys.min(), xs.max(), ys.max()]
    else:
        h, w = image.shape[:2]
        box = [w // 4, h // 4, 3 * w // 4, 3 * h // 4]

    meta = dict(DEFAULTS)
    meta.update({k: v for k, v in kwargs.items() if v is not None})
    meta.update({
        "format_version": "0.5.3",
        "type": "model",
        "name": name,
        "version": "1",
        "license": "CC-BY-4.0",
        "attachments": [],
        "inputs": [{
            "id": "image", "axes": ["batch", "channel", "y", "x"],
            "test_tensor": "test_input.npy",
        }],
        "outputs": [
            {"id": "masks", "test_tensor": "test_mask.npy"},
            {"id": "scores", "test_tensor": "test_score.npy"},
            {"id": "embeddings", "test_tensor": "test_embeddings.npy"},
        ],
        "weights": {
            "pytorch_state_dict": {"source": "model.pt"},
        },
        "config": {
            "micro_sam_tpu": {
                "model_type": model_type, "version": __version__,
                # full architecture record so the round-trip loader rebuilds
                # the exact config without shape inference
                "model_config": {
                    k: (list(v) if isinstance(v, tuple) else v)
                    for k, v in vars(predictor.model.config).items()
                    if isinstance(v, (int, float, str, bool, tuple, type(None)))
                },
            },
        },
    })

    with tempfile.TemporaryDirectory() as tmp_dir:
        tensors = _create_test_inputs_and_outputs(
            predictor, util._to_image(image)[..., 0] if image.ndim == 2 else image,
            box, tmp_dir,
        )

        # weights in the interoperable torch layout
        model_path = os.path.join(tmp_dir, "model.pt")
        try:
            import torch
            from ..models.convert import export_torch_state_dict
            sd = export_torch_state_dict(predictor.model.params, predictor.model.config)
            sd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}
            if decoder_state is not None:
                torch.save({"model_state": sd, "decoder_state": decoder_state}, model_path)
            else:
                torch.save(sd, model_path)
        except NotImplementedError:
            # vit_t export path pending; save the native pytree instead
            from ..util import save_native_checkpoint
            model_path = os.path.join(tmp_dir, "model.npz")
            save_native_checkpoint(model_path, predictor.model.params, predictor.model.config)
            meta["weights"] = {"native_npz": {"source": "model.npz"}}

        # cover image: input with the test mask overlayed
        cover_path = _write_cover(tmp_dir, util._to_image(image), np.load(tensors["test_mask"]))
        if cover_path:
            meta["covers"] = ["cover.png"]

        # rdf.yaml (json is a yaml subset; avoids a yaml dependency)
        rdf_path = os.path.join(tmp_dir, "rdf.yaml")
        with open(rdf_path, "w") as f:
            json.dump(meta, f, indent=2)

        output_path = str(Path(output_path).with_suffix(".zip"))
        with zipfile.ZipFile(output_path, "w", zipfile.ZIP_DEFLATED) as z:
            z.write(rdf_path, "rdf.yaml")
            z.write(model_path, os.path.basename(model_path))
            for key, path in tensors.items():
                z.write(path, os.path.basename(path))
            if cover_path:
                z.write(cover_path, "cover.png")

    return output_path


def load_sam_package(package_path: Union[str, os.PathLike], compute_dtype="float32"):
    """Load an exported package back into a predictor (round-trip direction;
    the reference delegates to bioimageio.core, unavailable offline).

    Returns (predictor, rdf_metadata_dict).
    """
    import torch

    from ..models.convert import convert_sam_state_dict
    from ..models.sam import Sam
    from ..predictor import SamPredictor

    with tempfile.TemporaryDirectory() as tmp_dir:
        with zipfile.ZipFile(str(package_path)) as z:
            z.extractall(tmp_dir)
        with open(os.path.join(tmp_dir, "rdf.yaml")) as f:
            meta = json.load(f)

        ms_meta = meta["config"]["micro_sam_tpu"]
        model_type = ms_meta["model_type"]
        cfg = None
        if "model_config" in ms_meta:
            from ..models.sam import SamConfig
            cfg_kwargs = dict(ms_meta["model_config"])
            for key, val in cfg_kwargs.items():
                if isinstance(val, list):
                    cfg_kwargs[key] = tuple(val)
            cfg = SamConfig(**{**cfg_kwargs, "compute_dtype": compute_dtype})

        weights = meta["weights"]
        if "pytorch_state_dict" in weights:
            src = os.path.join(tmp_dir, weights["pytorch_state_dict"]["source"])
            sd = torch.load(src, map_location="cpu", weights_only=False)
            if isinstance(sd, dict) and "model_state" in sd:
                sd = sd["model_state"]
            sd = {k: np.asarray(v) for k, v in sd.items()}
            cfg, params = convert_sam_state_dict(sd, cfg)
        else:
            from ..util import load_native_checkpoint
            src = os.path.join(tmp_dir, weights["native_npz"]["source"])
            cfg, params = load_native_checkpoint(src, model_type)

    predictor = SamPredictor(Sam(cfg, params))
    predictor.model_type = model_type
    predictor.model_name = meta.get("name", model_type)
    return predictor, meta


def test_model_package(package_path: Union[str, os.PathLike],
                       atol: float = 1e-2) -> Dict[str, object]:
    """Round-trip check of an exported package: reload the weights, re-run the
    packaged test input + box prompt, and compare against the packaged test
    outputs (offline equivalent of bioimageio.core.test_model; cf. reference
    model_export.py:270 'run_test')."""
    predictor, meta = load_sam_package(package_path)
    adaptor = PredictorAdaptor(predictor)

    with tempfile.TemporaryDirectory() as tmp_dir:
        with zipfile.ZipFile(str(package_path)) as z:
            z.extractall(tmp_dir)
        input_ = np.load(os.path.join(tmp_dir, "test_input.npy"))
        boxes = np.load(os.path.join(tmp_dir, "test_box.npy"))
        ref_mask = np.load(os.path.join(tmp_dir, "test_mask.npy"))
        ref_score = np.load(os.path.join(tmp_dir, "test_score.npy"))
        ref_emb = np.load(os.path.join(tmp_dir, "test_embeddings.npy"))

    masks, scores, embeddings = adaptor(input_, box_prompts=boxes)

    mask_agree = float(np.mean(np.asarray(masks) == ref_mask))
    emb_err = float(np.max(np.abs(np.asarray(embeddings) - ref_emb)))
    score_err = float(np.max(np.abs(np.asarray(scores) - ref_score)))
    passed = mask_agree > 0.999 and emb_err < atol and score_err < atol
    return {
        "passed": passed,
        "name": meta.get("name"),
        "mask_agreement": mask_agree,
        "embedding_max_err": emb_err,
        "score_max_err": score_err,
    }


def _write_cover(tmp_dir, image, masks) -> Optional[str]:
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(figsize=(4, 4))
        ax.imshow(image[..., 0] if image.ndim == 3 else image, cmap="gray")
        mask = np.squeeze(masks)
        while mask.ndim > 2:
            mask = mask[0]
        ax.imshow(np.ma.masked_where(mask == 0, mask), alpha=0.5, cmap="autumn")
        ax.axis("off")
        path = os.path.join(tmp_dir, "cover.png")
        fig.savefig(path, dpi=100, bbox_inches="tight")
        plt.close(fig)
        return path
    except Exception:
        return None
