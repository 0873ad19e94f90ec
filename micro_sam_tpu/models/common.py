"""Functional neural-net building blocks over plain parameter pytrees.

The whole model zoo is implemented as pure functions over nested dicts of
``jnp`` arrays — the most transparent representation for jit/pjit, for mapping
torch checkpoints onto (models/convert.py), and for PEFT-style parameter-tree
surgery (models/peft_sam.py). Layout is NHWC throughout (TPU-native), weights
are stored float32 and cast to a compute dtype (bfloat16 on TPU) at apply time
with float32 MXU accumulation via ``preferred_element_type``.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = dict

# ---------------------------------------------------------------------------
# Initializers
# ---------------------------------------------------------------------------

def trunc_normal(key, shape, std=0.02, dtype=jnp.float32):
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)


def kaiming_uniform(key, shape, fan_in, dtype=jnp.float32):
    bound = math.sqrt(1.0 / fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, -bound * math.sqrt(3.0), bound * math.sqrt(3.0))


def init_linear(key, in_dim: int, out_dim: int, bias: bool = True) -> Params:
    kw, kb = jax.random.split(key)
    p = {"w": kaiming_uniform(kw, (in_dim, out_dim), in_dim)}
    if bias:
        bound = 1.0 / math.sqrt(in_dim) if in_dim > 0 else 0.0
        p["b"] = jax.random.uniform(kb, (out_dim,), jnp.float32, -bound, bound)
    return p


def init_conv(key, kh: int, kw: int, in_ch: int, out_ch: int, bias: bool = True,
              groups: int = 1) -> Params:
    """HWIO conv kernel. For grouped conv, I = in_ch // groups."""
    k1, k2 = jax.random.split(key)
    fan_in = kh * kw * (in_ch // groups)
    p = {"w": kaiming_uniform(k1, (kh, kw, in_ch // groups, out_ch), fan_in)}
    if bias:
        bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
        p["b"] = jax.random.uniform(k2, (out_ch,), jnp.float32, -bound, bound)
    return p


def init_layer_norm(dim: int) -> Params:
    return {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}


def init_embedding(key, num: int, dim: int, std: float = 1.0) -> Params:
    return {"w": std * jax.random.normal(key, (num, dim))}


def init_batch_norm(dim: int) -> Params:
    return {
        "scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,)),
        "mean": jnp.zeros((dim,)), "var": jnp.ones((dim,)),
    }


# ---------------------------------------------------------------------------
# Apply functions
# ---------------------------------------------------------------------------

def dense_weight(p: Params) -> jnp.ndarray:
    """A layer's dense weight; dequantizes int4 block storage when present.

    Quantized layers (models/peft_sam.py quantize_int4) hold ``w_q4``
    (in, out) int4 + ``w_scale`` (in//block, out) bf16 instead of ``w``; the
    dequant is elementwise and fuses into the consuming matmul under XLA."""
    if "w" in p:
        return p["w"]
    q, s = p["w_q4"], p["w_scale"]
    nb = s.shape[0]
    block = q.shape[0] // nb
    return (q.astype(s.dtype).reshape(nb, block, -1) * s[:, None, :]).reshape(q.shape)


def linear(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    y = jnp.dot(x, dense_weight(p).astype(x.dtype), preferred_element_type=jnp.float32)
    if "b" in p:
        y = y + p["b"]
    if "lora" in p:  # PEFT low-rank update (models/peft_sam.py)
        la = p["lora"]
        y = y + jnp.dot(
            jnp.dot(x, la["a"].astype(x.dtype), preferred_element_type=jnp.float32).astype(x.dtype),
            la["b"].astype(x.dtype), preferred_element_type=jnp.float32,
        )
    if "ssf_scale" in p:  # PEFT scale-shift
        y = y * p["ssf_scale"] + p["ssf_shift"]
    return y.astype(x.dtype)


def layer_norm(p: Params, x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """LayerNorm over the last axis, computed in float32."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


# NHWC channel-last makes "LayerNorm2d" (torch: over channel dim of NCHW) the
# same op as plain layer_norm.
layer_norm_2d = layer_norm


def batch_norm(p: Params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Inference-mode batch norm over the channel (last) axis using running stats.

    Training in this framework treats BN statistics as frozen (the microscopy
    finetuning regime uses small batches where frozen BN is standard).
    """
    # running stats are statistics, not parameters: no gradients ever
    mean = jax.lax.stop_gradient(p["mean"])
    var = jax.lax.stop_gradient(p["var"])
    inv = jax.lax.rsqrt(var.astype(jnp.float32) + eps)
    scale = (p["scale"] * inv).astype(x.dtype)
    bias = (p["bias"] - mean * p["scale"] * inv).astype(x.dtype)
    return x * scale + bias


def conv2d(p: Params, x: jnp.ndarray, stride: int = 1, padding="SAME",
           groups: int = 1) -> jnp.ndarray:
    """NHWC conv with HWIO kernel."""
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    # NOTE: no preferred_element_type here — the conv VJP would emit a mixed
    # bf16/f32 conv (unsupported); the TPU conv unit accumulates in f32 anyway.
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    ).astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def init_conv_transpose(key, kh: int, kw: int, in_ch: int, out_ch: int,
                        bias: bool = True) -> Params:
    """Kernel stored (kh, kw, out, in) — torch ConvTranspose2d layout transposed
    spatially-last, so checkpoint conversion is a pure transpose."""
    k1, k2 = jax.random.split(key)
    fan_in = in_ch * kh * kw
    p = {"w": kaiming_uniform(k1, (kh, kw, out_ch, in_ch), fan_in)}
    if bias:
        bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
        p["b"] = jax.random.uniform(k2, (out_ch,), jnp.float32, -bound, bound)
    return p


def conv_transpose2d(p: Params, x: jnp.ndarray, stride: int = 2) -> jnp.ndarray:
    """NHWC transposed conv; kernel (kh, kw, out, in) with torch
    ``ConvTranspose2d(kernel=s, stride=s)`` semantics (verified vs torch).

    kernel == stride (every user: the SAM mask-decoder upscaler and the UNETR
    deconvs) makes the windows non-overlapping, so the op IS one matmul
    followed by depth-to-space:
        out[b, s*i+di, s*j+dj, o] = sum_ci x[b, i, j, ci] * w[di, dj, o, ci]
    XLA's conv_transpose lowering ran this at ~7 TFLOP/s in f32 (it also
    could not run in bf16: the VJP rejects a f32 preferred_element_type over
    bf16 operands); the matmul form runs at matmul rate in the operand dtype
    with f32 accumulation and a clean dot VJP.
    """
    w = p["w"]
    kh, kw, co, ci = w.shape
    if kh == stride and kw == stride:
        B, H, W, C = x.shape
        w2 = w.transpose(3, 0, 1, 2).reshape(ci, kh * kw * co)
        y = jnp.dot(x.reshape(B * H * W, C), w2.astype(x.dtype),
                    preferred_element_type=jnp.float32).astype(x.dtype)
        y = y.reshape(B, H, W, kh, kw, co).transpose(0, 1, 3, 2, 4, 5)
        y = y.reshape(B, H * kh, W * kw, co)
    else:  # general fallback (no current user)
        y = jax.lax.conv_transpose(
            x.astype(jnp.float32), w.astype(jnp.float32),
            strides=(stride, stride),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            transpose_kernel=True,
        ).astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def embedding(p: Params, idx: jnp.ndarray) -> jnp.ndarray:
    return jnp.take(p["w"], idx, axis=0)


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.gelu(x, approximate=False)


def init_mlp_block(key, dim: int, hidden: int) -> Params:
    k1, k2 = jax.random.split(key)
    return {"lin1": init_linear(k1, dim, hidden), "lin2": init_linear(k2, hidden, dim)}


def mlp_block(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    y = linear(p["lin2"], gelu(linear(p["lin1"], x)))
    if "adapter" in p:  # PEFT parallel adapter (AdaptFormer)
        a = p["adapter"]
        down = jax.nn.relu(jnp.dot(x, a["down"].astype(x.dtype),
                                   preferred_element_type=jnp.float32)).astype(x.dtype)
        y = y + a["scale"] * jnp.dot(down, a["up"].astype(x.dtype),
                                     preferred_element_type=jnp.float32).astype(x.dtype)
    return y


def init_mlp(key, in_dim: int, hidden: int, out_dim: int, depth: int) -> Params:
    """Multi-layer MLP matching SAM's ``MLP`` (hypernetworks / iou head)."""
    dims = [in_dim] + [hidden] * (depth - 1) + [out_dim]
    keys = jax.random.split(key, depth)
    return {"layers": [init_linear(k, a, b) for k, a, b in zip(keys, dims[:-1], dims[1:])]}


def mlp(p: Params, x: jnp.ndarray, sigmoid_output: bool = False) -> jnp.ndarray:
    n = len(p["layers"])
    for i, lp in enumerate(p["layers"]):
        x = linear(lp, x)
        if i < n - 1:
            x = jax.nn.relu(x)
    if sigmoid_output:
        x = jax.nn.sigmoid(x)
    return x
