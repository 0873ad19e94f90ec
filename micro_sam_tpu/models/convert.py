"""Convert torch SAM checkpoints (the reference model zoo formats) to JAX pytrees.

Handles both checkpoint layouts the reference loads (micro_sam/util.py:272-289):
raw ``segment_anything`` state dicts, and micro_sam training checkpoints with a
``model_state`` dict whose keys carry a ``sam.`` prefix plus an optional
``decoder_state``. Torch tensors are mapped to this package's parameter layout:

- Linear ``weight`` (out, in)            -> ``w`` (in, out)        [transpose]
- Conv2d ``weight`` (O, I, kh, kw)       -> ``w`` (kh, kw, I, O)
- ConvTranspose2d ``weight`` (I, O, k, k)-> ``w`` (kh, kw, O, I)
- LayerNorm / LayerNorm2d weight/bias    -> scale / bias
"""
from __future__ import annotations

import re
from typing import Dict, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from .sam import SamConfig
from .build_sam import get_config


def _np(t) -> np.ndarray:
    try:
        import torch
        if isinstance(t, torch.Tensor):
            return t.detach().cpu().numpy()
    except ImportError:
        pass
    return np.asarray(t)


def _lin(sd, name) -> dict:
    p = {"w": jnp.asarray(_np(sd[f"{name}.weight"]).T)}
    if f"{name}.bias" in sd:
        p["b"] = jnp.asarray(_np(sd[f"{name}.bias"]))
    return p


def _conv(sd, name) -> dict:
    p = {"w": jnp.asarray(_np(sd[f"{name}.weight"]).transpose(2, 3, 1, 0))}
    if f"{name}.bias" in sd:
        p["b"] = jnp.asarray(_np(sd[f"{name}.bias"]))
    return p


def _convT(sd, name) -> dict:
    p = {"w": jnp.asarray(_np(sd[f"{name}.weight"]).transpose(2, 3, 1, 0))}
    if f"{name}.bias" in sd:
        p["b"] = jnp.asarray(_np(sd[f"{name}.bias"]))
    return p


def _ln(sd, name) -> dict:
    return {
        "scale": jnp.asarray(_np(sd[f"{name}.weight"])),
        "bias": jnp.asarray(_np(sd[f"{name}.bias"])),
    }


def _emb(sd, name) -> dict:
    return {"w": jnp.asarray(_np(sd[f"{name}.weight"]))}


def _attn_ds(sd, prefix, num_heads) -> dict:
    return {
        "q": _lin(sd, f"{prefix}.q_proj"),
        "k": _lin(sd, f"{prefix}.k_proj"),
        "v": _lin(sd, f"{prefix}.v_proj"),
        "out": _lin(sd, f"{prefix}.out_proj"),
    }


def normalize_state_dict(state) -> Tuple[Dict, Optional[Dict]]:
    """Accept raw SAM state dicts or micro_sam training checkpoints.

    Returns (sam_state_dict, decoder_state or None) with the ``sam.`` prefix
    stripped — same normalization as micro_sam/util.py:272-289.
    """
    decoder_state = None
    if isinstance(state, dict) and "model_state" in state:
        decoder_state = state.get("decoder_state")
        state = state["model_state"]
    if any(k.startswith("sam.") for k in state):
        state = {k[len("sam."):]: v for k, v in state.items() if k.startswith("sam.")}
    return state, decoder_state


def infer_model_type(sam_state: Dict) -> str:
    """Infer vit_t/b/l/h from encoder shapes (cf. build_sam._validate_model_type)."""
    if any("layers.0.blocks" in k or k.startswith("image_encoder.layers") for k in sam_state):
        return "vit_t"
    w = _np(sam_state["image_encoder.patch_embed.proj.weight"])
    embed_dim = w.shape[0]
    return {768: "vit_b", 1024: "vit_l", 1280: "vit_h"}[embed_dim]


def convert_sam_state_dict(sam_state: Dict, config: Optional[SamConfig] = None
                           ) -> Tuple[SamConfig, dict]:
    """Torch SAM state dict -> (config, params pytree)."""
    if config is None:
        config = get_config(infer_model_type(sam_state))
    sd = sam_state

    if config.encoder == "tiny_vit":
        from .tiny_vit import convert_tiny_vit
        enc = convert_tiny_vit(sd)
    else:
        enc = _convert_vit_encoder(sd, config)

    prompt = {
        "pe_gaussian": jnp.asarray(
            _np(sd["prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"])
        ),
        "point_embeddings": [
            _emb(sd, f"prompt_encoder.point_embeddings.{i}") for i in range(4)
        ],
        "not_a_point_embed": _emb(sd, "prompt_encoder.not_a_point_embed"),
        "no_mask_embed": _emb(sd, "prompt_encoder.no_mask_embed"),
        "mask_downscaling": {
            "conv1": _conv(sd, "prompt_encoder.mask_downscaling.0"),
            "ln1": _ln(sd, "prompt_encoder.mask_downscaling.1"),
            "conv2": _conv(sd, "prompt_encoder.mask_downscaling.3"),
            "ln2": _ln(sd, "prompt_encoder.mask_downscaling.4"),
            "conv3": _conv(sd, "prompt_encoder.mask_downscaling.6"),
        },
    }

    def two_way_block(i):
        pre = f"mask_decoder.transformer.layers.{i}"
        return {
            "self_attn": _attn_ds(sd, f"{pre}.self_attn", 8),
            "norm1": _ln(sd, f"{pre}.norm1"),
            "cross_attn_t2i": _attn_ds(sd, f"{pre}.cross_attn_token_to_image", 8),
            "norm2": _ln(sd, f"{pre}.norm2"),
            "mlp": {"lin1": _lin(sd, f"{pre}.mlp.lin1"), "lin2": _lin(sd, f"{pre}.mlp.lin2")},
            "norm3": _ln(sd, f"{pre}.norm3"),
            "cross_attn_i2t": _attn_ds(sd, f"{pre}.cross_attn_image_to_token", 8),
            "norm4": _ln(sd, f"{pre}.norm4"),
        }

    def _mlp(prefix, n_layers):
        return {"layers": [_lin(sd, f"{prefix}.layers.{j}") for j in range(n_layers)]}

    n_hyper = len({k.split(".")[2] for k in sd if k.startswith("mask_decoder.output_hypernetworks_mlps.")})
    decoder = {
        "transformer": {
            "layers": [two_way_block(i) for i in range(2)],
            "final_attn": _attn_ds(sd, "mask_decoder.transformer.final_attn_token_to_image", 8),
            "norm_final": _ln(sd, "mask_decoder.transformer.norm_final_attn"),
        },
        "iou_token": _emb(sd, "mask_decoder.iou_token"),
        "mask_tokens": _emb(sd, "mask_decoder.mask_tokens"),
        "upscale_conv1": _convT(sd, "mask_decoder.output_upscaling.0"),
        "upscale_ln": _ln(sd, "mask_decoder.output_upscaling.1"),
        "upscale_conv2": _convT(sd, "mask_decoder.output_upscaling.3"),
        "hyper_mlps": [
            _mlp(f"mask_decoder.output_hypernetworks_mlps.{i}", 3) for i in range(n_hyper)
        ],
        "iou_head": _mlp("mask_decoder.iou_prediction_head", 3),
    }

    params = {"image_encoder": enc, "prompt_encoder": prompt, "mask_decoder": decoder}
    return config, params


def _convert_vit_encoder(sd: Dict, config: SamConfig) -> dict:
    enc = {
        "patch_embed": _conv(sd, "image_encoder.patch_embed.proj"),
        "blocks": [],
        "neck": {
            "conv1": _conv(sd, "image_encoder.neck.0"),
            "ln1": _ln(sd, "image_encoder.neck.1"),
            "conv2": _conv(sd, "image_encoder.neck.2"),
            "ln2": _ln(sd, "image_encoder.neck.3"),
        },
    }
    if "image_encoder.pos_embed" in sd:
        enc["pos_embed"] = jnp.asarray(_np(sd["image_encoder.pos_embed"]))
    for i in range(config.depth):
        pre = f"image_encoder.blocks.{i}"
        block = {
            "norm1": _ln(sd, f"{pre}.norm1"),
            "attn": {
                "qkv": _lin(sd, f"{pre}.attn.qkv"),
                "proj": _lin(sd, f"{pre}.attn.proj"),
            },
            "norm2": _ln(sd, f"{pre}.norm2"),
            "mlp": {"lin1": _lin(sd, f"{pre}.mlp.lin1"), "lin2": _lin(sd, f"{pre}.mlp.lin2")},
        }
        if f"{pre}.attn.rel_pos_h" in sd:
            block["attn"]["rel_pos_h"] = jnp.asarray(_np(sd[f"{pre}.attn.rel_pos_h"]))
            block["attn"]["rel_pos_w"] = jnp.asarray(_np(sd[f"{pre}.attn.rel_pos_w"]))
        enc["blocks"].append(block)
    return enc


def load_torch_checkpoint(path: str, model_type: Optional[str] = None):
    """Load a torch ``.pt`` checkpoint from disk and convert.

    Returns (config, params, decoder_state_or_None).
    """
    import torch
    state = torch.load(path, map_location="cpu", weights_only=False)
    sam_state, decoder_state = normalize_state_dict(state)
    config = get_config(model_type) if model_type else get_config(infer_model_type(sam_state))
    config, params = convert_sam_state_dict(sam_state, config)
    return config, params, decoder_state


def export_torch_state_dict(params: dict, config: SamConfig) -> Dict[str, np.ndarray]:
    """Inverse conversion: JAX params -> torch-layout SAM state dict (numpy).

    Used by export_custom_sam_model so checkpoints finetuned here can round-trip
    into torch tooling.
    """
    sd: Dict[str, np.ndarray] = {}

    def put_lin(name, p):
        sd[f"{name}.weight"] = np.asarray(p["w"]).T
        if "b" in p:
            sd[f"{name}.bias"] = np.asarray(p["b"])

    def put_conv(name, p):
        sd[f"{name}.weight"] = np.asarray(p["w"]).transpose(3, 2, 0, 1)
        if "b" in p:
            sd[f"{name}.bias"] = np.asarray(p["b"])

    def put_convT(name, p):
        sd[f"{name}.weight"] = np.asarray(p["w"]).transpose(3, 2, 0, 1)
        if "b" in p:
            sd[f"{name}.bias"] = np.asarray(p["b"])

    def put_ln(name, p):
        sd[f"{name}.weight"] = np.asarray(p["scale"])
        sd[f"{name}.bias"] = np.asarray(p["bias"])

    def put_attn_ds(name, p):
        put_lin(f"{name}.q_proj", p["q"])
        put_lin(f"{name}.k_proj", p["k"])
        put_lin(f"{name}.v_proj", p["v"])
        put_lin(f"{name}.out_proj", p["out"])

    enc = params["image_encoder"]
    if config.encoder == "tiny_vit":
        from .tiny_vit import export_tiny_vit
        sd.update(export_tiny_vit(enc))
    else:
        put_conv("image_encoder.patch_embed.proj", enc["patch_embed"])
        if "pos_embed" in enc:
            sd["image_encoder.pos_embed"] = np.asarray(enc["pos_embed"])
        for i, b in enumerate(enc["blocks"]):
            pre = f"image_encoder.blocks.{i}"
            put_ln(f"{pre}.norm1", b["norm1"])
            put_lin(f"{pre}.attn.qkv", b["attn"]["qkv"])
            put_lin(f"{pre}.attn.proj", b["attn"]["proj"])
            if "rel_pos_h" in b["attn"]:
                sd[f"{pre}.attn.rel_pos_h"] = np.asarray(b["attn"]["rel_pos_h"])
                sd[f"{pre}.attn.rel_pos_w"] = np.asarray(b["attn"]["rel_pos_w"])
            put_ln(f"{pre}.norm2", b["norm2"])
            put_lin(f"{pre}.mlp.lin1", b["mlp"]["lin1"])
            put_lin(f"{pre}.mlp.lin2", b["mlp"]["lin2"])
        put_conv("image_encoder.neck.0", enc["neck"]["conv1"])
        put_ln("image_encoder.neck.1", enc["neck"]["ln1"])
        put_conv("image_encoder.neck.2", enc["neck"]["conv2"])
        put_ln("image_encoder.neck.3", enc["neck"]["ln2"])

    pr = params["prompt_encoder"]
    sd["prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"] = np.asarray(pr["pe_gaussian"])
    for i, p in enumerate(pr["point_embeddings"]):
        sd[f"prompt_encoder.point_embeddings.{i}.weight"] = np.asarray(p["w"])
    sd["prompt_encoder.not_a_point_embed.weight"] = np.asarray(pr["not_a_point_embed"]["w"])
    sd["prompt_encoder.no_mask_embed.weight"] = np.asarray(pr["no_mask_embed"]["w"])
    mdn = pr["mask_downscaling"]
    put_conv("prompt_encoder.mask_downscaling.0", mdn["conv1"])
    put_ln("prompt_encoder.mask_downscaling.1", mdn["ln1"])
    put_conv("prompt_encoder.mask_downscaling.3", mdn["conv2"])
    put_ln("prompt_encoder.mask_downscaling.4", mdn["ln2"])
    put_conv("prompt_encoder.mask_downscaling.6", mdn["conv3"])

    de = params["mask_decoder"]
    for i, lp in enumerate(de["transformer"]["layers"]):
        pre = f"mask_decoder.transformer.layers.{i}"
        put_attn_ds(f"{pre}.self_attn", lp["self_attn"])
        put_ln(f"{pre}.norm1", lp["norm1"])
        put_attn_ds(f"{pre}.cross_attn_token_to_image", lp["cross_attn_t2i"])
        put_ln(f"{pre}.norm2", lp["norm2"])
        put_lin(f"{pre}.mlp.lin1", lp["mlp"]["lin1"])
        put_lin(f"{pre}.mlp.lin2", lp["mlp"]["lin2"])
        put_ln(f"{pre}.norm3", lp["norm3"])
        put_attn_ds(f"{pre}.cross_attn_image_to_token", lp["cross_attn_i2t"])
        put_ln(f"{pre}.norm4", lp["norm4"])
    put_attn_ds("mask_decoder.transformer.final_attn_token_to_image", de["transformer"]["final_attn"])
    put_ln("mask_decoder.transformer.norm_final_attn", de["transformer"]["norm_final"])
    sd["mask_decoder.iou_token.weight"] = np.asarray(de["iou_token"]["w"])
    sd["mask_decoder.mask_tokens.weight"] = np.asarray(de["mask_tokens"]["w"])
    put_convT("mask_decoder.output_upscaling.0", de["upscale_conv1"])
    put_ln("mask_decoder.output_upscaling.1", de["upscale_ln"])
    put_convT("mask_decoder.output_upscaling.3", de["upscale_conv2"])
    for i, hp in enumerate(de["hyper_mlps"]):
        for j, lp in enumerate(hp["layers"]):
            put_lin(f"mask_decoder.output_hypernetworks_mlps.{i}.layers.{j}", lp)
    for j, lp in enumerate(de["iou_head"]["layers"]):
        put_lin(f"mask_decoder.iou_prediction_head.layers.{j}", lp)
    return sd
