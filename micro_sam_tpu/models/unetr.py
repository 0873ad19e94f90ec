"""UNETR-style segmentation decoder over SAM image embeddings (for AIS).

TPU-native counterpart of the torch_em UNETR decoder the reference wraps in
DecoderAdapter (micro_sam/instance_segmentation.py:691-740): from (B, 64, 64,
256) embeddings, four transposed-conv side branches (z9/z6/z3/z0), a base conv,
a skip-connected upsampling decoder, and a 3-channel head predicting
[foreground, center distances, boundary distances] with sigmoid. Same dataflow
as the reference's ``DecoderAdapter._forward_impl``; NHWC layout, jit-compiled
end to end, bfloat16-capable.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from . import common as cm

Params = dict

# feature widths of the side branches z9/z6/z3/z0 (128^2 .. 1024^2 resolution)
FEATURES = (128, 64, 32, 16)


def _init_conv_block(key, in_ch: int, out_ch: int) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "conv1": cm.init_conv(k1, 3, 3, in_ch, out_ch),
        "ln1": cm.init_layer_norm(out_ch),
        "conv2": cm.init_conv(k2, 3, 3, out_ch, out_ch),
        "ln2": cm.init_layer_norm(out_ch),
    }


def _conv_block(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    x = cm.conv2d(p["conv1"], x, stride=1, padding=1)
    x = jax.nn.relu(cm.layer_norm_2d(p["ln1"], x))
    x = cm.conv2d(p["conv2"], x, stride=1, padding=1)
    return jax.nn.relu(cm.layer_norm_2d(p["ln2"], x))


def _init_deconv(key, in_ch: int, out_ch: int) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "up": cm.init_conv_transpose(k1, 2, 2, in_ch, out_ch),
        "conv": _init_conv_block(k2, out_ch, out_ch),
    }


def _deconv(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    return _conv_block(p["conv"], cm.conv_transpose2d(p["up"], x, stride=2))


def init_unetr_decoder(key, embed_dim: int = 256, out_channels: int = 3,
                       features: Sequence[int] = FEATURES) -> Params:
    keys = jax.random.split(key, 12)
    f0, f1, f2, f3 = features
    return {
        "deconv1": _init_deconv(keys[0], embed_dim, f0),
        "deconv2": _init_deconv(keys[1], f0, f1),
        "deconv3": _init_deconv(keys[2], f1, f2),
        "deconv4": _init_deconv(keys[3], f2, f3),
        "base": _init_conv_block(keys[4], embed_dim, f0),
        "dec1": {"up": cm.init_conv_transpose(keys[5], 2, 2, f0, f0),
                 "conv": _init_conv_block(keys[6], 2 * f0, f1)},
        "dec2": {"up": cm.init_conv_transpose(keys[7], 2, 2, f1, f1),
                 "conv": _init_conv_block(keys[8], f1 + f1, f2)},
        "dec3": {"up": cm.init_conv_transpose(keys[9], 2, 2, f2, f2),
                 "conv": _init_conv_block(keys[10], f2 + f2, f3)},
        "deconv_out": _init_deconv(keys[11], f3, f3),
        "decoder_head": _init_conv_block(jax.random.fold_in(key, 99), 2 * f3, f3),
        "out_conv": cm.init_conv(jax.random.fold_in(key, 100), 1, 1, f3, out_channels),
    }


def apply_unetr_decoder(p: Params, embeddings: jnp.ndarray,
                        final_activation: bool = True) -> jnp.ndarray:
    """embeddings: (B, 64, 64, C) -> (B, 1024, 1024, out_channels).

    Mirrors DecoderAdapter._forward_impl: side branches provide the skip
    inputs for the upsampling decoder; z0 joins before the head.
    """
    z12 = embeddings
    z9 = _deconv(p["deconv1"], z12)    # 128^2
    z6 = _deconv(p["deconv2"], z9)     # 256^2
    z3 = _deconv(p["deconv3"], z6)     # 512^2
    z0 = _deconv(p["deconv4"], z3)     # 1024^2

    x = _conv_block(p["base"], z12)    # 64^2

    for dec, skip in (("dec1", z9), ("dec2", z6), ("dec3", z3)):
        x = cm.conv_transpose2d(p[dec]["up"], x, stride=2)
        x = jnp.concatenate([x, skip], axis=-1)
        x = _conv_block(p[dec]["conv"], x)

    x = _deconv(p["deconv_out"], x)    # 1024^2
    x = jnp.concatenate([x, z0], axis=-1)
    x = _conv_block(p["decoder_head"], x)
    x = cm.conv2d(p["out_conv"], x, stride=1, padding="VALID")
    if final_activation:
        x = jax.nn.sigmoid(x)
    return x


def postprocess_decoder_output(
    output: jnp.ndarray,               # (B, S, S, C) with S = 16 * embed grid
    input_size: Tuple[int, int],
    original_size: Tuple[int, int],
) -> jnp.ndarray:
    """Crop away the encoder padding and resize to the original image
    (UNETR.postprocess_masks semantics)."""
    out = output[:, : input_size[0], : input_size[1], :]
    B, _, _, C = out.shape
    return jax.image.resize(out, (B,) + tuple(original_size) + (C,), method="bilinear")
