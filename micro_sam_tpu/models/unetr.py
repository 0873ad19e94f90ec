"""UNETR-style segmentation decoder over SAM image embeddings (for AIS).

TPU-native counterpart of the torch_em UNETR decoder the reference wraps in
DecoderAdapter (micro_sam/instance_segmentation.py:691-740). Faithful to the
torch_em module composition so that published ``*_decoder`` zoo checkpoints
convert and produce identical foreground/center/boundary maps:

- four ``Deconv2DBlock`` side branches (upsample -> 3x3 conv -> BatchNorm ->
  ReLU) producing z9/z6/z3/z0 at 2x/4x/8x/16x the embedding resolution,
- a ``base`` ConvBlock (InstanceNorm -> conv -> ReLU, twice) on the embedding,
- a 3-stage skip-connected ``Decoder`` (upsampler + ConvBlock per stage),
- ``deconv_out`` single upsampler, concat with z0, ``decoder_head`` ConvBlock,
  1x1 ``out_conv`` and sigmoid.

Upsamplers come in the two torch_em variants and are detected structurally
(reference instance_segmentation.py:771-775 uses the same trick on key names):
ConvTranspose2d(k=2, s=2) stores ``{"w", "b"}``; interpolation + 1x1 conv
stores ``{"conv": {...}}``.

BatchNorm runs with stored statistics (frozen-BN); training from random init
starts at mean=0/var=1 so BN degenerates to a learnable affine, which is the
standard small-batch finetuning regime. All shapes are derived from the
parameters, so converted checkpoints define the channel widths. NHWC layout,
jit-compiled end to end, bfloat16-capable.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from . import common as cm

Params = dict

# decoder feature widths, wide -> narrow (torch_em: initial_features 64,
# depth 3, gain 2 -> [512, 256, 128, 64])
FEATURES = (512, 256, 128, 64)


# ---------------------------------------------------------------------------
# blocks
# ---------------------------------------------------------------------------

def _instance_norm(x: jnp.ndarray, p: Optional[Params] = None,
                   eps: float = 1e-5) -> jnp.ndarray:
    """Per-sample, per-channel normalization over H, W (InstanceNorm2d,
    affine-free by torch default; optional affine params for checkpoints
    trained with affine norms)."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
    var = jnp.var(x32, axis=(1, 2), keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    if p is not None:
        y = y * p["scale"] + p["bias"]
    return y.astype(x.dtype)


def _init_conv_block(key, in_ch: int, out_ch: int) -> Params:
    """torch_em unet.ConvBlock2d: norm -> conv3x3 -> ReLU -> norm -> conv3x3
    -> ReLU (InstanceNorm without affine => no norm params)."""
    k1, k2 = jax.random.split(key)
    return {
        "conv1": cm.init_conv(k1, 3, 3, in_ch, out_ch),
        "conv2": cm.init_conv(k2, 3, 3, out_ch, out_ch),
    }


def _conv_block(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    x = _instance_norm(x, p.get("norm1"))
    x = jax.nn.relu(cm.conv2d(p["conv1"], x, stride=1, padding=1))
    x = _instance_norm(x, p.get("norm2"))
    return jax.nn.relu(cm.conv2d(p["conv2"], x, stride=1, padding=1))


def _init_upsampler(key, in_ch: int, out_ch: int, use_conv_transpose: bool) -> Params:
    if use_conv_transpose:
        return cm.init_conv_transpose(key, 2, 2, in_ch, out_ch)
    return {"conv": cm.init_conv(key, 1, 1, in_ch, out_ch)}


def _upsample(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    if "conv" in p:  # bilinear x2 + 1x1 conv (torch_em Upsampler2d)
        B, H, W, C = x.shape
        x = jax.image.resize(x, (B, 2 * H, 2 * W, C), method="bilinear")
        return cm.conv2d(p["conv"], x, stride=1, padding="VALID")
    return cm.conv_transpose2d(p, x, stride=2)


def _init_deconv(key, in_ch: int, out_ch: int, use_conv_transpose: bool = True) -> Params:
    """torch_em unetr.Deconv2DBlock: upsampler -> conv3x3 -> BatchNorm -> ReLU."""
    k1, k2 = jax.random.split(key)
    return {
        "up": _init_upsampler(k1, in_ch, out_ch, use_conv_transpose),
        "conv": cm.init_conv(k2, 3, 3, out_ch, out_ch),
        "bn": cm.init_batch_norm(out_ch),
    }


def _deconv(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    x = _upsample(p["up"], x)
    x = cm.conv2d(p["conv"], x, stride=1, padding=1)
    return jax.nn.relu(cm.batch_norm(p["bn"], x))


# ---------------------------------------------------------------------------
# init + forward
# ---------------------------------------------------------------------------

def init_unetr_decoder(key, embed_dim: int = 256, out_channels: int = 3,
                       features: Sequence[int] = FEATURES,
                       use_conv_transpose: bool = True) -> Params:
    keys = jax.random.split(key, 14)
    f0, f1, f2, f3 = features
    uct = use_conv_transpose
    return {
        # side branches: z9 (2x), z6 (4x), z3 (8x), z0 (16x)
        "deconv1": _init_deconv(keys[0], embed_dim, f1, uct),
        "deconv2": _init_deconv(keys[1], f1, f2, uct),
        "deconv3": _init_deconv(keys[2], f2, f3, uct),
        "deconv4": _init_deconv(keys[3], f3, f3, uct),
        "base": _init_conv_block(keys[4], embed_dim, f0),
        "decoder": {
            "samplers": [
                _init_upsampler(keys[5], f0, f1, uct),
                _init_upsampler(keys[6], f1, f2, uct),
                _init_upsampler(keys[7], f2, f3, uct),
            ],
            "blocks": [
                _init_conv_block(keys[8], f1 + f1, f1),
                _init_conv_block(keys[9], f2 + f2, f2),
                _init_conv_block(keys[10], f3 + f3, f3),
            ],
        },
        "deconv_out": _init_upsampler(keys[11], f3, f3, uct),
        "decoder_head": _init_conv_block(keys[12], 2 * f3, f3),
        "out_conv": cm.init_conv(keys[13], 1, 1, f3, out_channels),
    }


def apply_unetr_decoder(p: Params, embeddings: jnp.ndarray,
                        final_activation: bool = True) -> jnp.ndarray:
    """embeddings: (B, 64, 64, C) -> (B, 1024, 1024, out_channels).

    Mirrors DecoderAdapter._forward_impl (reference
    instance_segmentation.py:713-732): side branches provide the skip inputs
    for the upsampling decoder; z0 joins before the head.
    """
    z12 = embeddings
    z9 = _deconv(p["deconv1"], z12)    # 2x
    z6 = _deconv(p["deconv2"], z9)     # 4x
    z3 = _deconv(p["deconv3"], z6)     # 8x
    z0 = _deconv(p["deconv4"], z3)     # 16x

    x = _conv_block(p["base"], z12)    # 1x

    dec = p["decoder"]
    for sampler, block, skip in zip(dec["samplers"], dec["blocks"], (z9, z6, z3)):
        x = _upsample(sampler, x)
        x = _conv_block(block, jnp.concatenate([x, skip], axis=-1))

    x = _upsample(p["deconv_out"], x)  # 16x
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


# ---------------------------------------------------------------------------
# torch_em state-dict conversion
# ---------------------------------------------------------------------------

def is_torch_decoder_state(decoder_state) -> bool:
    """True if ``decoder_state`` looks like a flat torch_em UNETR state dict
    (string keys with dots, tensor/ndarray values)."""
    if not isinstance(decoder_state, dict) or not decoder_state:
        return False
    return all(isinstance(k, str) for k in decoder_state) and any(
        k.startswith(("deconv1.", "base.", "decoder.", "out_conv."))
        for k in decoder_state
    )


def convert_torch_em_decoder(decoder_state) -> Params:
    """Convert a torch_em UNETR decoder state dict into this module's pytree.

    Handles both upsampler flavors (the reference detects conv-transpose by
    '.block.' inside 'decoder.samplers' keys, instance_segmentation.py:775 —
    the same structure falls out of the name-driven parsing here), BatchNorm
    statistics, and optional affine norms inside ConvBlocks. All channel
    widths are taken from the tensors, so any decoder geometry loads.
    """
    import numpy as np

    sd = {k: np.asarray(v) for k, v in decoder_state.items()
          if not k.startswith("encoder") and not k.endswith("num_batches_tracked")}

    def take(prefix):
        out = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
        for k in list(sd):
            if k.startswith(prefix):
                del sd[k]
        return out

    def conv(sub, eg):  # torch (O, I, kh, kw) -> HWIO
        p = {"w": jnp.asarray(sub[f"{eg}.weight"].transpose(2, 3, 1, 0))}
        if f"{eg}.bias" in sub:
            p["b"] = jnp.asarray(sub[f"{eg}.bias"])
        return p

    def conv_t(sub, eg):  # torch (I, O, kh, kw) -> (kh, kw, O, I)
        p = {"w": jnp.asarray(sub[f"{eg}.weight"].transpose(2, 3, 1, 0))}
        if f"{eg}.bias" in sub:
            p["b"] = jnp.asarray(sub[f"{eg}.bias"])
        return p

    def upsampler(sub, eg):
        if f"{eg}.conv.weight" in sub:      # Upsampler2d: interpolate + 1x1
            return {"conv": conv(sub, f"{eg}.conv")}
        if f"{eg}.block.weight" in sub:     # SingleDeconv2DBlock: ConvTranspose
            return conv_t(sub, f"{eg}.block")
        if f"{eg}.weight" in sub:           # bare ConvTranspose2d
            return conv_t(sub, eg)
        raise ValueError(f"Unrecognized upsampler keys under '{eg}': "
                         f"{sorted(sub)[:8]}")

    def conv_block(sub):
        """ConvBlock2d Sequential: 4D weights are the two convs in order;
        1D weight/bias pairs before each conv are affine norms (absent for
        torch's default InstanceNorm2d)."""
        idxs = sorted({int(k.split(".")[1]) for k in sub if k.startswith("block.")})
        convs, norms = [], []
        pending_norm = None
        for i in idxs:
            w = sub.get(f"block.{i}.weight")
            if w is None:
                continue
            if w.ndim == 4:
                convs.append(conv(sub, f"block.{i}"))
                norms.append(pending_norm)
                pending_norm = None
            elif w.ndim == 1:
                pending_norm = {"scale": jnp.asarray(w),
                                "bias": jnp.asarray(sub[f"block.{i}.bias"])}
        if len(convs) != 2:
            raise ValueError(f"Expected 2 convs in ConvBlock, got {len(convs)} "
                             f"from keys {sorted(sub)[:8]}")
        out = {"conv1": convs[0], "conv2": convs[1]}
        if norms[0] is not None:
            out["norm1"] = norms[0]
        if norms[1] is not None:
            out["norm2"] = norms[1]
        return out

    def deconv_block(sub):
        """Deconv2DBlock Sequential: [0] upsampler, [1] SingleConv2DBlock,
        [2] BatchNorm2d."""
        return {
            "up": upsampler(sub, "block.0"),
            "conv": conv(sub, "block.1.block"),
            "bn": {
                "scale": jnp.asarray(sub["block.2.weight"]),
                "bias": jnp.asarray(sub["block.2.bias"]),
                "mean": jnp.asarray(sub["block.2.running_mean"]),
                "var": jnp.asarray(sub["block.2.running_var"]),
            },
        }

    def reprefix(sub):
        """Nest a stripped sub-dict under a synthetic 's' module name so the
        eg-based helpers above can address it uniformly."""
        return {f"s.{k}" if k else "s": v for k, v in sub.items()}

    n_stages = len({k.split(".")[2] for k in sd if k.startswith("decoder.blocks.")})
    params = {
        "deconv1": deconv_block(take("deconv1.")),
        "deconv2": deconv_block(take("deconv2.")),
        "deconv3": deconv_block(take("deconv3.")),
        "deconv4": deconv_block(take("deconv4.")),
        "base": conv_block(take("base.")),
        "decoder": {
            "samplers": [upsampler(reprefix(take(f"decoder.samplers.{i}.")), "s")
                         for i in range(n_stages)],
            "blocks": [conv_block(take(f"decoder.blocks.{i}."))
                       for i in range(n_stages)],
        },
        "deconv_out": upsampler(reprefix(take("deconv_out.")), "s"),
        "decoder_head": conv_block(take("decoder_head.")),
        "out_conv": conv(reprefix(take("out_conv.")), "s"),
    }

    if sd:
        raise ValueError(f"Unconsumed decoder-state keys: {sorted(sd)[:8]}")
    return params
