"""SAM model configurations and builders (vit_t / vit_b / vit_l / vit_h).

Mirrors the parameterization of micro_sam/models/build_sam.py:40-142 (embed
dims 768/1024/1280, depths 12/24/32, per-size global-attention indexes,
prompt_embed_dim=256, window 14) with a TinyViT (MobileSAM) vit_t variant.
"""
from __future__ import annotations

from typing import Optional

import jax

from .sam import Sam, SamConfig, init_sam_params


def _cfg(**kw) -> SamConfig:
    return SamConfig(**kw)


SAM_CONFIGS = {
    "vit_b": _cfg(
        model_type="vit_b", embed_dim=768, depth=12, num_heads=12,
        global_attn_indexes=(2, 5, 8, 11),
    ),
    "vit_l": _cfg(
        model_type="vit_l", embed_dim=1024, depth=24, num_heads=16,
        global_attn_indexes=(5, 11, 17, 23),
    ),
    "vit_h": _cfg(
        model_type="vit_h", embed_dim=1280, depth=32, num_heads=16,
        global_attn_indexes=(7, 15, 23, 31),
    ),
    "vit_t": _cfg(model_type="vit_t", encoder="tiny_vit", embed_dim=320, depth=12,
                  num_heads=10),
}


def get_config(model_type: str, compute_dtype: Optional[str] = None) -> SamConfig:
    base = model_type[:5]  # e.g. "vit_b" from "vit_b_lm"
    if base not in SAM_CONFIGS:
        raise ValueError(f"Unknown model type {model_type}; options: {list(SAM_CONFIGS)}")
    cfg = SAM_CONFIGS[base]
    if compute_dtype is not None:
        from dataclasses import replace
        cfg = replace(cfg, compute_dtype=compute_dtype)
    return cfg


def build_sam_params(model_type: str, seed: int = 0, compute_dtype: Optional[str] = None):
    """Random-init SAM params for the given model type. Returns (config, params)."""
    cfg = get_config(model_type, compute_dtype)
    params = init_sam_params(jax.random.PRNGKey(seed), cfg)
    return cfg, params


def build_sam(model_type: str, seed: int = 0, compute_dtype: Optional[str] = None) -> Sam:
    cfg, params = build_sam_params(model_type, seed, compute_dtype)
    return Sam(cfg, params)


sam_model_registry = {
    name: (lambda name=name, **kw: build_sam(name, **kw)) for name in SAM_CONFIGS
}


def build_sam_vit_b(**kwargs) -> "Sam":
    """ViT-B SAM builder (reference models/build_sam.py:40)."""
    return build_sam("vit_b", **kwargs)


def build_sam_vit_l(**kwargs) -> "Sam":
    """ViT-L SAM builder (reference models/build_sam.py:55)."""
    return build_sam("vit_l", **kwargs)


def build_sam_vit_h(**kwargs) -> "Sam":
    """ViT-H SAM builder (reference models/build_sam.py:70)."""
    return build_sam("vit_h", **kwargs)


def _validate_model_type(model_type: str) -> None:
    base = model_type[:5]
    if base not in SAM_CONFIGS:
        raise ValueError(
            f"Invalid model type {model_type}. Expected one of {list(SAM_CONFIGS)} "
            "(optionally with a suffix such as vit_b_lm)."
        )
