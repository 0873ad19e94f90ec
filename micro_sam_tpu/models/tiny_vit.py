"""TinyViT encoder for vit_t (MobileSAM) in functional JAX.

TPU-native re-implementation of the mobile_sam TinyViT backbone the reference
uses for vit_t (SURVEY.md L0): conv patch embed (stride 4), an MBConv stage,
three window-attention stages (windows 7/14/7, learned per-offset attention
biases), patch-merging downsamples (the last one stride 1 so the final feature
map stays 64x64 at 320 channels for 1024^2 inputs), and the SAM neck to 256
channels. BatchNorm uses running statistics (frozen-BN finetuning regime).
"""
from __future__ import annotations

import itertools
import math
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import common as cm

Params = dict

EMBED_DIMS = (64, 128, 160, 320)
DEPTHS = (2, 2, 6, 2)
NUM_HEADS = (2, 4, 5, 10)
WINDOW_SIZES = (7, 7, 14, 7)
MBCONV_EXPAND = 4.0
MLP_RATIO = 4.0


# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------

def _init_conv_bn(key, kh, kw, in_ch, out_ch, groups=1) -> Params:
    return {
        "conv": cm.init_conv(key, kh, kw, in_ch, out_ch, bias=False, groups=groups),
        "bn": cm.init_batch_norm(out_ch),
    }


def _conv_bn(p, x, stride=1, padding="SAME", groups=1):
    return cm.batch_norm(p["bn"], cm.conv2d(p["conv"], x, stride=stride,
                                            padding=padding, groups=groups))


def _gelu_tv(x):
    """gelu for the XLA glue between the fused vit_t kernels: exact erf at
    f32 (or when the fused family is disabled), the kernels' 6-op bf16
    tanh-sigmoid form otherwise — the exact-erf VPU chain dominates the
    patch-embed/merge elementwise passes on TPU."""
    if x.dtype != jnp.bfloat16 or not _use_fused_attention():
        return cm.gelu(x)
    from ..ops.fused_mbconv import _gelu
    return _gelu(x, fast=True)


def _conv3x3_s2_matmul(p, x):
    """3x3 stride-2 pad-1 dense conv as a 9-tap im2col matmul + BN.

    XLA's conv lowering pays a large layout tax when the channel (minor) dim
    is tiny — the patch-embed convs (C_in = 3 and 32) measured 13.4 / 2.7 ms
    of vit_t's batch-8 step on v5e. Building the im2col explicitly from
    pixel-parity views (the column dim folded in pairs, so every tap is a
    contiguous lane slice) turns each conv into one (B*Ho*Wo, 9C) @ (9C, O)
    matmul. Bit-identical to the conv (same summation order per tap).
    Requires even H and W (the pixel-parity fold); callers fall back to the
    conv otherwise."""
    B, H, W, C = x.shape
    Ho, Wo = H // 2, W // 2
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    xp2 = xp.reshape(B, H + 2, (W + 2) // 2, 2 * C)
    taps = []
    for di in range(3):
        rows = jax.lax.slice(
            xp2, (0, di, 0, 0), (B, di + 2 * (Ho - 1) + 1, (W + 2) // 2, 2 * C),
            (1, 2, 1, 1))
        taps.append(jax.lax.slice(rows, (0, 0, 0, 0), (B, Ho, Wo, C)))
        taps.append(jax.lax.slice(rows, (0, 0, 0, C), (B, Ho, Wo, 2 * C)))
        taps.append(jax.lax.slice(rows, (0, 0, 1, 0), (B, Ho, 1 + Wo, C)))
    im = jnp.concatenate(taps, axis=-1)                     # (B, Ho, Wo, 9C)
    w = p["conv"]["w"].reshape(9 * C, -1).astype(x.dtype)   # HWIO -> (9C, O)
    y = jnp.dot(im, w, preferred_element_type=jnp.float32).astype(x.dtype)
    return cm.batch_norm(p["bn"], y)


def _init_mbconv(key, in_ch, out_ch) -> Params:
    hidden = int(in_ch * MBCONV_EXPAND)
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "conv1": _init_conv_bn(k1, 1, 1, in_ch, hidden),
        "conv2": _init_conv_bn(k2, 3, 3, hidden, hidden, groups=hidden),
        "conv3": _init_conv_bn(k3, 1, 1, hidden, out_ch),
    }


def _mbconv_unfused(p, x):
    shortcut = x
    hidden = p["conv2"]["conv"]["w"].shape[-1]
    x = cm.gelu(_conv_bn(p["conv1"], x))
    x = cm.gelu(_conv_bn(p["conv2"], x, padding=1, groups=hidden))
    x = _conv_bn(p["conv3"], x)
    return cm.gelu(shortcut + x)


def _mbconv(p, x):
    if _use_fused_attention() and x.shape[1] % 8 == 0:
        from ..ops.fused_mbconv import fused_mbconv
        return fused_mbconv(x, p)
    return _mbconv_unfused(p, x)


def _init_patch_merging(key, in_ch, out_ch) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "conv1": _init_conv_bn(k1, 1, 1, in_ch, out_ch),
        "conv2": _init_conv_bn(k2, 3, 3, out_ch, out_ch, groups=out_ch),
        "conv3": _init_conv_bn(k3, 1, 1, out_ch, out_ch),
    }


def _patch_merging(p, x, stride):
    # left to XLA by measurement: a fused Pallas merge kernel (stride 2 via
    # pixel-parity plane pre-split) was built and measured SLOWER in context
    # (27.8 vs 26.3 ms encoder) — after the cheap glue gelu, the merge's cost
    # is its two already-efficient 1x1 matmuls and a fast XLA grouped conv
    out_ch = p["conv1"]["conv"]["w"].shape[-1]
    x = _gelu_tv(_conv_bn(p["conv1"], x))
    x = _gelu_tv(_conv_bn(p["conv2"], x, stride=stride, padding=1, groups=out_ch))
    return _conv_bn(p["conv3"], x)


def _use_fused_attention() -> bool:
    """Fused vit_t kernel family (interpret-mode on CPU); the env kill switch
    MSAM_TPU_FUSED_TINY=0 restores the plain XLA composition everywhere —
    attention, MBConv, block tails, the im2col patch conv and the glue gelu."""
    from ..ops.fused_tiny_attention import fused_tiny_enabled
    return fused_tiny_enabled()


def _attention_bias_idxs(window: int) -> np.ndarray:
    """Index map (N, N) into the (num_offsets,) attention-bias table."""
    points = list(itertools.product(range(window), range(window)))
    offsets = {}
    idxs = np.zeros((len(points), len(points)), dtype=np.int32)
    for i, p1 in enumerate(points):
        for j, p2 in enumerate(points):
            off = (abs(p1[0] - p2[0]), abs(p1[1] - p2[1]))
            if off not in offsets:
                offsets[off] = len(offsets)
            idxs[i, j] = offsets[off]
    return idxs, len(offsets)


def _init_tiny_attention(key, dim, num_heads, window) -> Params:
    key_dim = dim // num_heads
    h = dim + 2 * key_dim * num_heads  # value dim (= dim, attn_ratio 1) + q + k
    k1, k2 = jax.random.split(key)
    idxs, n_offsets = _attention_bias_idxs(window)
    return {
        "norm": cm.init_layer_norm(dim),
        "qkv": cm.init_linear(k1, dim, h),
        "proj": cm.init_linear(k2, dim, dim),
        "attention_biases": jnp.zeros((num_heads, n_offsets)),
    }


def _tiny_attention(p, x, num_heads, window):
    """x: (B, N, C) tokens of one window batch."""
    B, N, C = x.shape
    key_dim = C // num_heads
    x = cm.layer_norm(p["norm"], x, eps=1e-5)
    qkv = cm.linear(p["qkv"], x)
    q, k, v = jnp.split(qkv, [num_heads * key_dim, 2 * num_heads * key_dim], axis=-1)
    q = q.reshape(B, N, num_heads, key_dim)
    k = k.reshape(B, N, num_heads, key_dim)
    v = v.reshape(B, N, num_heads, key_dim)

    idxs, _ = _attention_bias_idxs(window)
    bias = p["attention_biases"][:, jnp.asarray(idxs)]  # (nH, N, N)

    scale = key_dim ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k,
                        preferred_element_type=jnp.float32)
    logits = logits + bias.astype(logits.dtype)[None]
    w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", w, v,
                     preferred_element_type=jnp.float32).astype(v.dtype)
    return cm.linear(p["proj"], out.reshape(B, N, C))


def _init_tiny_block(key, dim, num_heads, window) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    hidden = int(dim * MLP_RATIO)
    return {
        "attn": _init_tiny_attention(k1, dim, num_heads, window),
        "local_conv": _init_conv_bn(k2, 3, 3, dim, dim, groups=dim),
        "mlp": {
            "norm": cm.init_layer_norm(dim),
            "lin1": cm.init_linear(jax.random.fold_in(k3, 0), dim, hidden),
            "lin2": cm.init_linear(jax.random.fold_in(k3, 1), hidden, dim),
        },
    }


def _tiny_block(p, x, num_heads, window):
    """x: (B, H, W, C)."""
    B, H, W, C = x.shape

    pad_h = (window - H % window) % window
    pad_w = (window - W % window) % window
    if _use_fused_attention():
        # fused Pallas path: window partition, LN1, qkv, block-diagonal-packed
        # per-head attention, proj and the residual in ONE kernel
        # (ops/fused_tiny_attention.py); pad tokens participate in attention
        # exactly like the unfused path below
        from ..ops.fused_tiny_attention import fused_tiny_attention
        xw = (jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
              if (pad_h or pad_w) else x)
        idxs, _ = _attention_bias_idxs(window)
        n = window * window
        bias_cat = p["attn"]["attention_biases"][:, jnp.asarray(idxs)]
        bias_cat = bias_cat.transpose(1, 0, 2).reshape(n, num_heads * n)
        x = fused_tiny_attention(
            xw, p["attn"], bias_cat, num_heads, window)[:, :H, :W]
    else:
        res = x
        # windowed attention with padding
        xw = (jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
              if (pad_h or pad_w) else x)
        Hp, Wp = H + pad_h, W + pad_w
        xw = xw.reshape(B, Hp // window, window, Wp // window, window, C)
        xw = xw.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window * window, C)
        xw = _tiny_attention(p["attn"], xw, num_heads, window)
        xw = xw.reshape(B, Hp // window, Wp // window, window, window, C)
        xw = xw.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, C)[:, :H, :W]
        x = res + xw

    if _use_fused_attention() and H % 8 == 0:
        # local_conv + LN + MLP + residual in one kernel
        from ..ops.fused_tiny_tail import fused_tiny_tail
        return fused_tiny_tail(x, p["local_conv"], p["mlp"])

    x = _conv_bn(p["local_conv"], x, padding=1, groups=C)

    tokens = x.reshape(B, H * W, C)
    y = cm.layer_norm(p["mlp"]["norm"], tokens, eps=1e-5)
    y = cm.linear(p["mlp"]["lin2"], cm.gelu(cm.linear(p["mlp"]["lin1"], y)))
    return (tokens + y).reshape(B, H, W, C)


# ---------------------------------------------------------------------------
# full model
# ---------------------------------------------------------------------------

def init_tiny_vit(key, img_size: int = 1024, out_chans: int = 256) -> Params:
    keys = jax.random.split(key, 32)
    ki = iter(keys)
    p: Params = {
        "patch_embed": {
            "conv1": _init_conv_bn(next(ki), 3, 3, 3, EMBED_DIMS[0] // 2),
            "conv2": _init_conv_bn(next(ki), 3, 3, EMBED_DIMS[0] // 2, EMBED_DIMS[0]),
        },
        "stage0": [_init_mbconv(next(ki), EMBED_DIMS[0], EMBED_DIMS[0])
                   for _ in range(DEPTHS[0])],
        "merge0": _init_patch_merging(next(ki), EMBED_DIMS[0], EMBED_DIMS[1]),
        "stage1": [_init_tiny_block(next(ki), EMBED_DIMS[1], NUM_HEADS[1], WINDOW_SIZES[1])
                   for _ in range(DEPTHS[1])],
        "merge1": _init_patch_merging(next(ki), EMBED_DIMS[1], EMBED_DIMS[2]),
        "stage2": [_init_tiny_block(next(ki), EMBED_DIMS[2], NUM_HEADS[2], WINDOW_SIZES[2])
                   for _ in range(DEPTHS[2])],
        "merge2": _init_patch_merging(next(ki), EMBED_DIMS[2], EMBED_DIMS[3]),
        "stage3": [_init_tiny_block(next(ki), EMBED_DIMS[3], NUM_HEADS[3], WINDOW_SIZES[3])
                   for _ in range(DEPTHS[3])],
        "neck": {
            "conv1": cm.init_conv(next(ki), 1, 1, EMBED_DIMS[3], out_chans, bias=False),
            "ln1": cm.init_layer_norm(out_chans),
            "conv2": cm.init_conv(next(ki), 3, 3, out_chans, out_chans, bias=False),
            "ln2": cm.init_layer_norm(out_chans),
        },
    }
    return p


def apply_tiny_vit(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """x: (B, S, S, 3) preprocessed pixels -> (B, S/16, S/16, 256)."""
    # (a parity-packed two-conv formulation was tried and measured SLOWER in
    # context, 30.0 vs 28.5 ms encoder: its stride-4 im2col still reads a
    # lane-padded (..., 3)-minor pad intermediate)
    if _use_fused_attention() and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
        x = _gelu_tv(_conv3x3_s2_matmul(p["patch_embed"]["conv1"], x))
    else:
        x = cm.gelu(_conv_bn(p["patch_embed"]["conv1"], x, stride=2, padding=1))
    x = _conv_bn(p["patch_embed"]["conv2"], x, stride=2, padding=1)

    for bp in p["stage0"]:
        x = _mbconv(bp, x)
    x = _patch_merging(p["merge0"], x, stride=2)                     # S/8, 128

    for bp in p["stage1"]:
        x = _tiny_block(bp, x, NUM_HEADS[1], WINDOW_SIZES[1])
    x = _patch_merging(p["merge1"], x, stride=2)                     # S/16, 160

    for bp in p["stage2"]:
        x = _tiny_block(bp, x, NUM_HEADS[2], WINDOW_SIZES[2])
    x = _patch_merging(p["merge2"], x, stride=1)                     # S/16, 320

    for bp in p["stage3"]:
        x = _tiny_block(bp, x, NUM_HEADS[3], WINDOW_SIZES[3])

    x = cm.conv2d(p["neck"]["conv1"], x, stride=1, padding="VALID")
    x = cm.layer_norm_2d(p["neck"]["ln1"], x)
    x = cm.conv2d(p["neck"]["conv2"], x, stride=1, padding=1)
    x = cm.layer_norm_2d(p["neck"]["ln2"], x)
    return x


# ---------------------------------------------------------------------------
# torch checkpoint conversion (mobile_sam TinyViT layout)
# ---------------------------------------------------------------------------

def convert_tiny_vit(sd) -> Params:
    """Convert a mobile_sam TinyViT state dict (keys 'image_encoder.*') to this
    layout. Layer indexing: mobile_sam layers.0 = conv stage, layers.1..3 =
    attention stages; downsample ops live inside the preceding layer."""
    from .convert import _np

    def conv_bn(prefix):
        return {
            "conv": {"w": jnp.asarray(_np(sd[f"{prefix}.c.weight"]).transpose(2, 3, 1, 0))},
            "bn": {
                "scale": jnp.asarray(_np(sd[f"{prefix}.bn.weight"])),
                "bias": jnp.asarray(_np(sd[f"{prefix}.bn.bias"])),
                "mean": jnp.asarray(_np(sd[f"{prefix}.bn.running_mean"])),
                "var": jnp.asarray(_np(sd[f"{prefix}.bn.running_var"])),
            },
        }

    def lin(prefix):
        out = {"w": jnp.asarray(_np(sd[f"{prefix}.weight"]).T)}
        if f"{prefix}.bias" in sd:
            out["b"] = jnp.asarray(_np(sd[f"{prefix}.bias"]))
        return out

    def ln(prefix):
        return {"scale": jnp.asarray(_np(sd[f"{prefix}.weight"])),
                "bias": jnp.asarray(_np(sd[f"{prefix}.bias"]))}

    e = "image_encoder"
    p: Params = {
        "patch_embed": {
            "conv1": conv_bn(f"{e}.patch_embed.seq.0"),
            "conv2": conv_bn(f"{e}.patch_embed.seq.2"),
        },
    }
    # stage0: layers.0.blocks.{i}.conv{1,2,3}
    p["stage0"] = [
        {
            "conv1": conv_bn(f"{e}.layers.0.blocks.{i}.conv1"),
            "conv2": conv_bn(f"{e}.layers.0.blocks.{i}.conv2"),
            "conv3": conv_bn(f"{e}.layers.0.blocks.{i}.conv3"),
        } for i in range(DEPTHS[0])
    ]
    p["merge0"] = {
        "conv1": conv_bn(f"{e}.layers.0.downsample.conv1"),
        "conv2": conv_bn(f"{e}.layers.0.downsample.conv2"),
        "conv3": conv_bn(f"{e}.layers.0.downsample.conv3"),
    }
    for stage_idx in (1, 2, 3):
        blocks = []
        for i in range(DEPTHS[stage_idx]):
            pre = f"{e}.layers.{stage_idx}.blocks.{i}"
            blocks.append({
                "attn": {
                    "norm": ln(f"{pre}.attn.norm"),
                    "qkv": lin(f"{pre}.attn.qkv"),
                    "proj": lin(f"{pre}.attn.proj"),
                    "attention_biases": jnp.asarray(_np(sd[f"{pre}.attn.attention_biases"])),
                },
                "local_conv": conv_bn(f"{pre}.local_conv"),
                "mlp": {
                    "norm": ln(f"{pre}.mlp.norm"),
                    "lin1": lin(f"{pre}.mlp.fc1"),
                    "lin2": lin(f"{pre}.mlp.fc2"),
                },
            })
        p[f"stage{stage_idx}"] = blocks
        if stage_idx < 3:
            p[f"merge{stage_idx}"] = {
                "conv1": conv_bn(f"{e}.layers.{stage_idx}.downsample.conv1"),
                "conv2": conv_bn(f"{e}.layers.{stage_idx}.downsample.conv2"),
                "conv3": conv_bn(f"{e}.layers.{stage_idx}.downsample.conv3"),
            }
    p["neck"] = {
        "conv1": {"w": jnp.asarray(_np(sd[f"{e}.neck.0.weight"]).transpose(2, 3, 1, 0))},
        "ln1": ln(f"{e}.neck.1"),
        "conv2": {"w": jnp.asarray(_np(sd[f"{e}.neck.2.weight"]).transpose(2, 3, 1, 0))},
        "ln2": ln(f"{e}.neck.3"),
    }
    return p


def export_tiny_vit(params: Params) -> dict:
    """Inverse of convert_tiny_vit: this package's TinyViT pytree back to a
    mobile_sam-layout state dict ('image_encoder.*' keys, numpy values).

    The derived 'attention_bias_idxs' buffer is intentionally omitted —
    mobile_sam recomputes it from the window geometry at construction.
    """
    import numpy as np
    sd = {}

    def put_conv_bn(prefix, p):
        sd[f"{prefix}.c.weight"] = np.asarray(p["conv"]["w"]).transpose(3, 2, 0, 1)
        bn = p["bn"]
        sd[f"{prefix}.bn.weight"] = np.asarray(bn["scale"])
        sd[f"{prefix}.bn.bias"] = np.asarray(bn["bias"])
        sd[f"{prefix}.bn.running_mean"] = np.asarray(bn["mean"])
        sd[f"{prefix}.bn.running_var"] = np.asarray(bn["var"])

    def put_lin(prefix, p):
        sd[f"{prefix}.weight"] = np.asarray(p["w"]).T
        if "b" in p:
            sd[f"{prefix}.bias"] = np.asarray(p["b"])

    def put_ln(prefix, p):
        sd[f"{prefix}.weight"] = np.asarray(p["scale"])
        sd[f"{prefix}.bias"] = np.asarray(p["bias"])

    def put_merge(prefix, p):
        for name in ("conv1", "conv2", "conv3"):
            put_conv_bn(f"{prefix}.{name}", p[name])

    e = "image_encoder"
    put_conv_bn(f"{e}.patch_embed.seq.0", params["patch_embed"]["conv1"])
    put_conv_bn(f"{e}.patch_embed.seq.2", params["patch_embed"]["conv2"])

    for i, block in enumerate(params["stage0"]):
        put_merge(f"{e}.layers.0.blocks.{i}", block)
    put_merge(f"{e}.layers.0.downsample", params["merge0"])

    for stage_idx in (1, 2, 3):
        for i, block in enumerate(params[f"stage{stage_idx}"]):
            pre = f"{e}.layers.{stage_idx}.blocks.{i}"
            put_ln(f"{pre}.attn.norm", block["attn"]["norm"])
            put_lin(f"{pre}.attn.qkv", block["attn"]["qkv"])
            put_lin(f"{pre}.attn.proj", block["attn"]["proj"])
            sd[f"{pre}.attn.attention_biases"] = np.asarray(
                block["attn"]["attention_biases"])
            put_conv_bn(f"{pre}.local_conv", block["local_conv"])
            put_ln(f"{pre}.mlp.norm", block["mlp"]["norm"])
            put_lin(f"{pre}.mlp.fc1", block["mlp"]["lin1"])
            put_lin(f"{pre}.mlp.fc2", block["mlp"]["lin2"])
        if stage_idx < 3:
            put_merge(f"{e}.layers.{stage_idx}.downsample", params[f"merge{stage_idx}"])

    sd[f"{e}.neck.0.weight"] = np.asarray(params["neck"]["conv1"]["w"]).transpose(3, 2, 0, 1)
    put_ln(f"{e}.neck.1", params["neck"]["ln1"])
    sd[f"{e}.neck.2.weight"] = np.asarray(params["neck"]["conv2"]["w"]).transpose(3, 2, 0, 1)
    put_ln(f"{e}.neck.3", params["neck"]["ln2"])
    return sd
