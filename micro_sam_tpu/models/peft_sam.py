"""Parameter-efficient finetuning (PEFT) as parameter-tree surgery.

Counterpart of micro_sam/models/peft_sam.py. Where the torch reference
monkey-patches modules (LoRASurgery etc.), the JAX design simply *adds keys to
the parameter pytree*; the forward functions apply them when present
(models/common.py linear / image_encoder attention). Trainability is expressed
as an optax freeze mask (get_peft_mask), replacing requires_grad toggling.

Supported surgeries (reference peft_sam.py:16-393):
- lora: low-rank updates on attention q/v (optionally k and the MLP)
- fact: factorized (shared-core) low-rank qkv updates
- ssf: scale-shift on linear outputs
- adaptformer: parallel MLP adapter
- attention_tuning / bias_tuning / layernorm_tuning / classical (last-N blocks):
  pure freeze-mask surgeries
"""
from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from .sam import SamConfig


def _lora_pair(key, in_dim: int, out_dim: int, rank: int):
    k1, _ = jax.random.split(key)
    # A: kaiming-ish init, B: zeros (standard LoRA init)
    a = jax.random.normal(k1, (in_dim, rank)) * (1.0 / math.sqrt(in_dim))
    b = jnp.zeros((rank, out_dim))
    return {"a": a, "b": b}


def apply_peft(
    params: dict,
    config: SamConfig,
    rank: Optional[int] = None,
    peft_module: str = "lora",
    attention_layers_to_update: Optional[Sequence[int]] = None,
    update_matrices: Sequence[str] = ("q", "v"),
    projection_size: int = 64,
    alpha: float = 1.0,
    dropout: Optional[float] = None,
    quantize: bool = False,
    **kwargs,
) -> dict:
    """Attach PEFT parameters to a SAM param pytree (in a copy)."""
    import copy
    params = copy.copy(params)
    enc = copy.copy(params["image_encoder"])
    blocks = [copy.copy(b) for b in enc["blocks"]]
    rank = rank or 4
    key = jax.random.PRNGKey(42)

    layers = range(len(blocks)) if attention_layers_to_update is None \
        else attention_layers_to_update

    name = peft_module.lower()
    for i in layers:
        block = blocks[i]
        attn = copy.copy(block["attn"])
        dim = attn["qkv"]["w"].shape[0]
        key, *sub = jax.random.split(key, 6)

        if name == "lora":
            peft = {}
            if "q" in update_matrices:
                peft["q"] = _lora_pair(sub[0], dim, dim, rank)
            if "v" in update_matrices:
                peft["v"] = _lora_pair(sub[1], dim, dim, rank)
            if "k" in update_matrices:
                peft["k"] = _lora_pair(sub[2], dim, dim, rank)
            attn["lora"] = peft
            if "mlp" in update_matrices:
                mlp = copy.copy(block["mlp"])
                hidden = mlp["lin1"]["w"].shape[1]
                mlp["lin1"] = dict(mlp["lin1"], lora=_lora_pair(sub[3], dim, hidden, rank))
                mlp["lin2"] = dict(mlp["lin2"], lora=_lora_pair(sub[4], hidden, dim, rank))
                block["mlp"] = mlp
        elif name == "fact":
            # factorized: shared core FacTu/FacTv at encoder level + per-layer scaling
            if "fact_u" not in enc:
                enc["fact_u"] = jax.random.normal(sub[0], (dim, rank)) * 0.02
                enc["fact_v"] = jax.random.normal(sub[1], (rank, dim)) * 0.0
            attn["fact"] = {
                "q_scale": jnp.zeros((rank,)),
                "v_scale": jnp.zeros((rank,)),
            }
        elif name == "ssf":
            attn["qkv"] = dict(attn["qkv"], ssf_scale=jnp.ones((3 * dim,)),
                               ssf_shift=jnp.zeros((3 * dim,)))
            attn["proj"] = dict(attn["proj"], ssf_scale=jnp.ones((dim,)),
                                ssf_shift=jnp.zeros((dim,)))
            mlp = copy.copy(block["mlp"])
            hidden = mlp["lin1"]["w"].shape[1]
            mlp["lin1"] = dict(mlp["lin1"], ssf_scale=jnp.ones((hidden,)),
                               ssf_shift=jnp.zeros((hidden,)))
            mlp["lin2"] = dict(mlp["lin2"], ssf_scale=jnp.ones((dim,)),
                               ssf_shift=jnp.zeros((dim,)))
            block["mlp"] = mlp
        elif name == "adaptformer":
            mlp = copy.copy(block["mlp"])
            proj = projection_size
            mlp["adapter"] = {
                "down": jax.random.normal(sub[0], (dim, proj)) * (1.0 / math.sqrt(dim)),
                "up": jnp.zeros((proj, dim)),
                "scale": jnp.asarray(float(kwargs.get("adapter_scale", 1.0))),
            }
            block["mlp"] = mlp
        elif name in ("attention_tuning", "bias_tuning", "layernorm_tuning", "classical"):
            pass  # freeze-mask-only surgeries; see get_peft_mask
        else:
            raise ValueError(f"Unknown peft_module: {peft_module}")

        block["attn"] = attn
        blocks[i] = block

    enc["blocks"] = blocks
    params["image_encoder"] = enc
    if quantize:
        params["image_encoder"] = quantize_encoder_int4(params["image_encoder"])
    return params


# -----------------------------------------------------------------------------
# int4 weight quantization (QLoRA-style; reference peft_sam.py:432-462 swaps
# linears for bitsandbytes Linear4bit — here the frozen base weights become
# native jnp.int4 block storage that the forward dequantizes on the fly)
# -----------------------------------------------------------------------------

QUANT_BLOCK = 64


def quantize_int4(w, block: int = QUANT_BLOCK) -> dict:
    """Symmetric blockwise int4 quantization of a (in, out) weight.

    Per (input-block, output-column) absmax scales; values land in [-7, 7].
    Returns {"w_q4": int4 (in, out), "w_scale": bf16 (in//block, out)}.
    """
    w = jnp.asarray(w)
    in_dim, out_dim = w.shape
    assert in_dim % block == 0, (in_dim, block)
    wb = w.astype(jnp.float32).reshape(in_dim // block, block, out_dim)
    scale = jnp.max(jnp.abs(wb), axis=1) / 7.0 + 1e-12       # (nb, out)
    q = jnp.clip(jnp.round(wb / scale[:, None, :]), -7, 7)
    return {
        "w_q4": q.astype(jnp.int4).reshape(in_dim, out_dim),
        "w_scale": scale.astype(jnp.bfloat16),
    }


def dequantize_int4(qd: dict) -> jnp.ndarray:
    from . import common as cm
    return cm.dense_weight(qd)


def quantize_encoder_int4(enc: dict) -> dict:
    """Quantize the frozen base linear weights of every encoder block
    (qkv / proj / mlp.lin1 / mlp.lin2); biases, norms, rel-pos tables,
    patch embed, neck convs and all PEFT parameters stay full precision."""
    import copy
    enc = copy.copy(enc)
    blocks = []
    for block in enc["blocks"]:
        block = copy.copy(block)
        attn = copy.copy(block["attn"])
        mlp = copy.copy(block["mlp"])
        for layer_parent, name in ((attn, "qkv"), (attn, "proj"),
                                   (mlp, "lin1"), (mlp, "lin2")):
            layer = dict(layer_parent[name])
            w = layer.pop("w")
            layer.update(quantize_int4(w))
            layer_parent[name] = layer
        block["attn"] = attn
        block["mlp"] = mlp
        blocks.append(block)
    enc["blocks"] = blocks
    return enc


def get_peft_mask(params: dict, peft_module: str = "lora",
                  unfreeze_blocks: Optional[int] = None) -> dict:
    """Optax mask: True = trainable. The encoder base weights freeze; PEFT
    params, prompt encoder and mask decoder stay trainable (reference
    PEFT_Sam freezing, peft_sam.py:393)."""
    name = peft_module.lower()

    def encoder_mask(tree, path=""):
        if isinstance(tree, dict):
            return {k: encoder_mask(v, f"{path}/{k}") for k, v in tree.items()}
        if isinstance(tree, (list, tuple)):
            return [encoder_mask(v, f"{path}/{i}") for i, v in enumerate(tree)]
        if name == "bias_tuning":
            return path.endswith("/b") or path.endswith("/bias")
        if name == "layernorm_tuning":
            return "/norm" in path or path.endswith("scale")
        if name == "attention_tuning":
            return "/attn/" in path
        trainable_markers = ("/lora/", "/fact", "ssf_", "/adapter/")
        return any(m in path or path.endswith(m.strip("/")) for m in trainable_markers) \
            or "/lora" in path or "ssf" in path or "/adapter" in path or "fact" in path

    mask = {
        "image_encoder": encoder_mask(params["image_encoder"]),
        "prompt_encoder": jax.tree.map(lambda _: True, params["prompt_encoder"]),
        "mask_decoder": jax.tree.map(lambda _: True, params["mask_decoder"]),
    }
    if name == "classical" and unfreeze_blocks:
        blocks = params["image_encoder"]["blocks"]
        n = len(blocks)
        mask["image_encoder"]["blocks"] = [
            jax.tree.map(lambda _: i >= n - unfreeze_blocks, b) for i, b in enumerate(blocks)
        ]
    return mask


# -----------------------------------------------------------------------------
# Reference class surface (peft_sam.py:16-391). The reference implements each
# surgery as an nn.Module that wraps torch layers; here the surgeries are
# functional parameter transformations (apply_peft above), and these classes
# are the selectors users pass as ``PEFT_Sam(sam, peft_module=LoRASurgery)``.
# Each carries the functional module name it dispatches to.
# -----------------------------------------------------------------------------

class _SurgeryName:
    """Base for the reference's surgery selector classes."""
    peft_module_name = "lora"


class LoRASurgery(_SurgeryName):
    """Low-rank adaptation of the attention (+ optionally MLP) matrices
    (reference peft_sam.py:16)."""
    peft_module_name = "lora"


class AttentionLoRA(_SurgeryName):
    """LoRA over attention projection matrices (reference peft_sam.py:50)."""
    peft_module_name = "lora"


class MLPLoRA(_SurgeryName):
    """LoRA over the MLP layers (reference peft_sam.py:113). Select MLP
    updates via ``update_matrices=("q", "v", "mlp")``."""
    peft_module_name = "lora"


class FacTSurgery(_SurgeryName):
    """Factorized-tuning: shared low-rank cores + per-layer scales
    (reference peft_sam.py:149)."""
    peft_module_name = "fact"


class ScaleShiftLayer(_SurgeryName):
    """Per-feature scale + shift (the SSF building block, reference
    peft_sam.py:207)."""
    peft_module_name = "ssf"


class SSFSurgery(_SurgeryName):
    """Scale-shift tuning of attention and MLP features (reference
    peft_sam.py:226)."""
    peft_module_name = "ssf"


class AdaptFormer(_SurgeryName):
    """Bottleneck adapter parallel to the MLP (reference peft_sam.py:290)."""
    peft_module_name = "adaptformer"


class SelectiveSurgery(_SurgeryName):
    """Base for freeze-mask-only surgeries (reference peft_sam.py:254)."""
    peft_module_name = "classical"


class AttentionSurgery(SelectiveSurgery):
    """Unfreeze only the attention layers (reference peft_sam.py:352)."""
    peft_module_name = "attention_tuning"


class BiasSurgery(SelectiveSurgery):
    """Unfreeze only bias terms (reference peft_sam.py:361)."""
    peft_module_name = "bias_tuning"


class LayerNormSurgery(SelectiveSurgery):
    """Unfreeze only layer norms (reference peft_sam.py:370)."""
    peft_module_name = "layernorm_tuning"


class ClassicalSurgery(SelectiveSurgery):
    """Unfreeze the last k encoder blocks (reference peft_sam.py:379)."""
    peft_module_name = "classical"


class PEFT_Sam:
    """Functional stand-in for the reference PEFT_Sam wrapper: applies the
    surgery and keeps the freeze mask."""

    def __init__(self, sam, rank: Optional[int] = None, peft_module="lora", **kwargs):
        if isinstance(peft_module, str):
            module_name = peft_module
        elif isinstance(peft_module, type) and issubclass(peft_module, _SurgeryName):
            module_name = peft_module.peft_module_name
        else:
            module_name = getattr(
                peft_module, "__name__", "lora").lower().replace("surgery", "")
        self.peft_module = module_name
        self.sam = sam
        sam.params = apply_peft(sam.params, sam.config, rank=rank,
                                peft_module=module_name, **kwargs)
        self.mask = get_peft_mask(sam.params, module_name,
                                  unfreeze_blocks=kwargs.get("unfreeze_blocks"))

    def __getattr__(self, item):
        return getattr(self.sam, item)
