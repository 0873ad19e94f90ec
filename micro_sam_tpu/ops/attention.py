"""Attention cores for the SAM encoders and the mask decoder.

Single dispatch point so the encoder can swap between the XLA einsum
implementation (always correct, used on CPU and as fallback) and the Pallas
TPU flash-attention kernel (ops/flash_attention.py) without touching model
code. Semantics follow the reference encoder's decomposed relative-position
attention (segment_anything image encoder; see SURVEY.md L0): the rel-pos
terms use the *unscaled* query, the logits use q * head_dim**-0.5.
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_USE_PALLAS = os.environ.get("MSAM_TPU_FLASH_ATTN", "1") != "0"


def attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Plain softmax attention. q,k,v: (..., N, nH, hd) -> (..., N, nH, hd)."""
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum(
        "...qhd,...khd->...hqk", q * scale, k, preferred_element_type=jnp.float32
    )
    w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("...hqk,...khd->...qhd", w, v, preferred_element_type=jnp.float32).astype(v.dtype)


def _einsum_attention_rel_pos(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    hw: Tuple[int, int],
    rel_h: Optional[jnp.ndarray], rel_w: Optional[jnp.ndarray],
) -> jnp.ndarray:
    B, N, nH, hd = q.shape
    H, W = hw
    scale = hd ** -0.5
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q * scale, k, preferred_element_type=jnp.float32
    )  # (B, nH, N, N) in f32
    if rel_h is not None:
        r_q = q.reshape(B, H, W, nH, hd)
        # rel_h: (H, H, hd); rel_w: (W, W, hd)
        rh = jnp.einsum("bijnc,ikc->bnijk", r_q, rel_h.astype(q.dtype),
                        preferred_element_type=jnp.float32)  # (B,nH,H,W,kH)
        rw = jnp.einsum("bijnc,jkc->bnijk", r_q, rel_w.astype(q.dtype),
                        preferred_element_type=jnp.float32)  # (B,nH,H,W,kW)
        logits = logits.reshape(B, nH, H, W, H, W)
        logits = logits + rh[..., :, None] + rw[..., None, :]
        logits = logits.reshape(B, nH, N, N)
    w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", w, v, preferred_element_type=jnp.float32)
    return out.astype(v.dtype)


def attention_qkv_with_rel_pos(
    qkv: jnp.ndarray,                       # (B, 3, nH, N, hd) fused
    hw: Tuple[int, int],
    rel_h: Optional[jnp.ndarray] = None, rel_w: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Fused-qkv attention entry: on TPU the Pallas kernel reads q/k/v as
    views into the fused head-major tensor (no kernel-side transposes);
    elsewhere falls back to the einsum implementation.

    Returns (B, nH, N, hd)."""
    if _USE_PALLAS and _on_tpu():
        try:
            from .flash_attention import flash_attention_qkv
            return flash_attention_qkv(qkv, hw, rel_h, rel_w, qkv.shape[2])
        except ImportError:
            pass
    q = jnp.transpose(qkv[:, 0], (0, 2, 1, 3))
    k = jnp.transpose(qkv[:, 1], (0, 2, 1, 3))
    v = jnp.transpose(qkv[:, 2], (0, 2, 1, 3))
    out = _einsum_attention_rel_pos(q, k, v, hw, rel_h, rel_w)
    return jnp.transpose(out, (0, 2, 1, 3))


def attention_with_rel_pos(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    hw: Tuple[int, int],
    rel_h: Optional[jnp.ndarray] = None, rel_w: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Self-attention over an (H, W) token grid with decomposed rel-pos bias.

    q, k, v: (B, N, nH, hd) with N == H*W. Returns (B, N, nH, hd).

    Dispatches to the Pallas flash kernel on TPU for both the global (N=4096)
    and windowed (N=196) blocks — the einsum path materializes the rel-pos
    bias as a 6d float32 tensor, which is HBM-bandwidth-bound even for small
    windows.
    """
    if _USE_PALLAS and _on_tpu():
        try:
            from .flash_attention import flash_attention_rel_pos
            return flash_attention_rel_pos(q, k, v, hw, rel_h, rel_w)
        except ImportError:
            pass
    return _einsum_attention_rel_pos(q, k, v, hw, rel_h, rel_w)


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False
