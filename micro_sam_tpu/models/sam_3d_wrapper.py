"""3d SAM wrapper: depth-adapter blocks around the ViT encoder
(reference micro_sam/models/sam_3d_wrapper.py).

Each encoder block gets two 3d depth-wise conv adapters (before and after
attention) that mix information along z; the volume is processed as a batch of
slices with the depth dimension threaded through the adapters. Promptless
semantic 3d segmentation head on top.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from . import common as cm
from . import image_encoder as ie
from .sam import Sam, SamConfig, preprocess

Params = dict


def _init_depth_adapter(key, dim: int) -> Params:
    """3d depthwise conv over (z, h, w) with kernel (3, 1, 1) + pointwise."""
    k1, k2 = jax.random.split(key)
    return {
        "depth_conv": {"w": jnp.zeros((3, 1, 1, 1, dim))},  # zero-init: identity at start
        "norm": cm.init_layer_norm(dim),
        "point": cm.init_linear(k2, dim, dim),
    }


def _apply_depth_adapter(p: Params, x: jnp.ndarray, d_size: int) -> jnp.ndarray:
    """x: (B*D, H, W, C) -> mix along depth with a residual adapter."""
    BD, H, W, C = x.shape
    B = BD // d_size
    xv = x.reshape(B, d_size, H, W, C)
    y = jax.lax.conv_general_dilated(
        xv, p["depth_conv"]["w"].astype(x.dtype),
        window_strides=(1, 1, 1), padding=[(1, 1), (0, 0), (0, 0)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        feature_group_count=C,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    y = cm.layer_norm(p["norm"], y)
    y = cm.linear(p["point"], y)
    return x + y.reshape(BD, H, W, C)


def init_sam_3d_params(key, config: SamConfig, base_params: dict) -> dict:
    """Attach depth adapters to an existing SAM param tree."""
    import copy
    params = copy.copy(base_params)
    enc = copy.copy(params["image_encoder"])
    blocks = []
    for i, b in enumerate(enc["blocks"]):
        b = copy.copy(b)
        kb = jax.random.fold_in(key, i)
        b["adapter_pre"] = _init_depth_adapter(jax.random.fold_in(kb, 0), config.embed_dim)
        b["adapter_post"] = _init_depth_adapter(jax.random.fold_in(kb, 1), config.embed_dim)
        blocks.append(b)
    enc["blocks"] = blocks
    params["image_encoder"] = enc
    return params


def apply_sam_3d_encoder(params: dict, config: SamConfig, volume_pixels: jnp.ndarray,
                         d_size: int) -> jnp.ndarray:
    """volume_pixels: (B*D, S, S, 3) preprocessed -> (B*D, e, e, 256) with
    depth adapters threading d_size through every block."""
    p = params["image_encoder"]
    x = cm.conv2d(p["patch_embed"], volume_pixels.astype(config.dtype),
                  stride=config.patch_size, padding="VALID")
    if "pos_embed" in p:
        x = x + p["pos_embed"].astype(x.dtype)
    for i, bp in enumerate(p["blocks"]):
        ws = 0 if i in tuple(config.global_attn_indexes) else config.window_size
        if "adapter_pre" in bp:
            x = _apply_depth_adapter(bp["adapter_pre"], x, d_size)
        x = ie.apply_block(bp, x, config.num_heads, ws)
        if "adapter_post" in bp:
            x = _apply_depth_adapter(bp["adapter_post"], x, d_size)
    x = cm.conv2d(p["neck"]["conv1"], x, stride=1, padding="VALID")
    x = cm.layer_norm_2d(p["neck"]["ln1"], x)
    x = cm.conv2d(p["neck"]["conv2"], x, stride=1, padding=1)
    x = cm.layer_norm_2d(p["neck"]["ln2"], x)
    return x


class Sam3DWrapper:
    """Promptless semantic 3d segmentation with depth-adapted encoder
    (reference sam_3d_wrapper.py:14)."""

    def __init__(self, sam: Sam = None, d_size: int = 8,
                 sam_model: Sam = None, freeze_encoder: bool = False,
                 model_type: str = None):
        # reference calling convention: Sam3DWrapper(sam_model, freeze_encoder,
        # model_type) — reference sam_3d_wrapper.py:48. freeze_encoder is an
        # optimizer-mask concern in this functional design; the flag is kept
        # and exposed via encoder_frozen for trainer integration.
        sam = sam if sam is not None else sam_model
        if sam is None:
            raise ValueError("Pass the Sam model (sam= or sam_model=).")
        self.sam = sam
        self.config = sam.config
        self.d_size = d_size
        self.encoder_frozen = bool(freeze_encoder)
        self.params = init_sam_3d_params(
            jax.random.PRNGKey(17), sam.config, sam.params
        )

    def __call__(self, params, volume: jnp.ndarray) -> jnp.ndarray:
        """volume: (B, D, S, S, 3) raw -> (B, D, 4*e, 4*e, C_mask) mask logits
        from the promptless decoder."""
        B, D = volume.shape[:2]
        flat = volume.reshape((B * D,) + volume.shape[2:])
        px = preprocess(flat, self.config.img_size)
        feats = apply_sam_3d_encoder(params, self.config, px, d_size=D)
        points = jnp.zeros((B * D, 0, 2), jnp.float32)
        labels = jnp.zeros((B * D, 0), jnp.int32)
        masks, _ = self.sam.decode_masks(params, feats, points, labels)
        return masks.reshape((B, D) + masks.shape[1:])


class SimpleSam3DWrapper:
    """Per-slice encoder + 3d conv decoder pyramid (reference
    simple_sam_3d_wrapper.py:12)."""

    def __init__(self, sam: Sam, out_channels: int = 1, seed: int = 23,
                 num_classes: int = None, freeze_encoder: bool = False):
        # reference convention: SimpleSam3DWrapper(sam, num_classes,
        # freeze_encoder) — reference simple_sam_3d_wrapper.py:116
        if num_classes is not None:
            out_channels = num_classes
        self.sam = sam
        self.encoder_frozen = bool(freeze_encoder)
        self.config = sam.config
        key = jax.random.PRNGKey(seed)
        dims = [256, 128, 64, 32]
        keys = jax.random.split(key, 8)
        self.decoder_params = {
            "blocks": [
                {
                    "conv1": cm.init_conv(keys[2 * i], 3, 3, dims[i], dims[i + 1]),
                    "ln1": cm.init_layer_norm(dims[i + 1]),
                    "conv2": cm.init_conv(keys[2 * i + 1], 3, 3, dims[i + 1], dims[i + 1]),
                    "ln2": cm.init_layer_norm(dims[i + 1]),
                } for i in range(3)
            ],
            "head": cm.init_conv(keys[-1], 1, 1, dims[-1], out_channels),
        }

    def __call__(self, sam_params, volume: jnp.ndarray) -> jnp.ndarray:
        """volume: (B, D, S, S, 3) -> (B, D, e, e, out_channels) logits."""
        B, D = volume.shape[:2]
        flat = volume.reshape((B * D,) + volume.shape[2:])
        px = preprocess(flat, self.config.img_size)
        feats = self.sam.encode_image(sam_params, px)  # (B*D, e, e, 256)
        x = feats
        for bp in self.decoder_params["blocks"]:
            x = cm.conv2d(bp["conv1"], x, stride=1, padding=1)
            x = jax.nn.relu(cm.layer_norm_2d(bp["ln1"], x))
            x = cm.conv2d(bp["conv2"], x, stride=1, padding=1)
            x = jax.nn.relu(cm.layer_norm_2d(bp["ln2"], x))
        x = cm.conv2d(self.decoder_params["head"], x, stride=1, padding="VALID")
        return x.reshape((B, D) + x.shape[1:])


def get_sam_3d_model(model_type: str = "vit_b", d_size: int = 8, **kwargs) -> Sam3DWrapper:
    """Build a 3d-adapted SAM (reference sam_3d_wrapper.py:150)."""
    from .build_sam import build_sam
    sam = build_sam(model_type, **kwargs)
    return Sam3DWrapper(sam, d_size=d_size)


def get_simple_sam_3d_model(model_type: str = "vit_b", **kwargs) -> SimpleSam3DWrapper:
    """Build a simple 3d SAM (reference simple_sam_3d_wrapper.py:115)."""
    from .build_sam import build_sam
    sam = build_sam(model_type, **kwargs)
    return SimpleSam3DWrapper(sam)


# -----------------------------------------------------------------------------
# Reference class surface. The reference (torch) wraps the encoder and each
# ViT block in nn.Modules (sam_3d_wrapper.py ImageEncoderViT3DWrapper /
# NDBlockWrapper); here the same structure is functional, and these classes
# are callable views over the param tree for users porting reference code.
# -----------------------------------------------------------------------------

class ImageEncoderViT3DWrapper:
    """Depth-adapted encoder as a callable (reference sam_3d_wrapper.py:60):
    ``enc(params, preprocessed_slices, d_size)`` -> (B*D, e, e, 256)."""

    def __init__(self, config: SamConfig = None, num_heads: int = None,
                 embed_dim: int = None, image_encoder=None):
        # reference convention: ImageEncoderViT3DWrapper(image_encoder,
        # num_heads, embed_dim) — here the "encoder" is its config
        if config is None:
            config = getattr(image_encoder, "config", image_encoder)
        self.config = config

    def __call__(self, params: dict, volume_pixels: jnp.ndarray, d_size: int) -> jnp.ndarray:
        return apply_sam_3d_encoder(params, self.config, volume_pixels, d_size)


class NDBlockWrapper:
    """One ViT block with its pre/post depth adapters (reference
    sam_3d_wrapper.py:120): ``block(block_params, x, d_size)``."""

    def __init__(self, config: SamConfig = None, block_index: int = 0,
                 block=None, dim: int = None, num_heads: int = None,
                 norm_layer=None, adapter_channels: int = 384):
        # reference convention: NDBlockWrapper(block, dim, num_heads, ...) —
        # the functional analogue takes the model config + block index; the
        # torch-style args are accepted and used to locate the config.
        if config is None:
            config = getattr(block, "config", block)
        self.config = config
        self.block_index = block_index

    def __call__(self, block_params: dict, x: jnp.ndarray, d_size: int) -> jnp.ndarray:
        cfg = self.config
        ws = 0 if self.block_index in tuple(cfg.global_attn_indexes) else cfg.window_size
        if "adapter_pre" in block_params:
            x = _apply_depth_adapter(block_params["adapter_pre"], x, d_size)
        x = ie.apply_block(block_params, x, cfg.num_heads, ws)
        if "adapter_post" in block_params:
            x = _apply_depth_adapter(block_params["adapter_post"], x, d_size)
        return x


class BasicBlock:
    """Conv3d->norm->act (x2) residual-free block of the simple 3d decoder
    (reference simple_sam_3d_wrapper.py:36). Functional: init once, then
    ``block(params, x)`` on (B, H, W, C) feature maps."""

    def __init__(self, key, in_channels: int = None, out_channels: int = None,
                 kernel_size=(3, 3), stride=(1, 1), padding=(1, 1),
                 bias: bool = True, mode: str = "nearest"):
        if out_channels is None and isinstance(key, int) and in_channels is not None:
            # reference convention BasicBlock(in_channels, out_channels, ...):
            # shift the positionals and use a fixed init key
            key, in_channels, out_channels = 0, key, in_channels
        k1, k2 = jax.random.split(jax.random.PRNGKey(key) if isinstance(key, int) else key)
        ks = kernel_size[-1] if isinstance(kernel_size, (tuple, list)) else kernel_size
        self.params = {
            "conv1": cm.init_conv(k1, ks, ks, in_channels, out_channels),
            "ln1": cm.init_layer_norm(out_channels),
            "conv2": cm.init_conv(k2, ks, ks, out_channels, out_channels),
            "ln2": cm.init_layer_norm(out_channels),
        }

    def __call__(self, params: dict, x: jnp.ndarray) -> jnp.ndarray:
        x = cm.conv2d(params["conv1"], x, stride=1, padding=1)
        x = jax.nn.relu(cm.layer_norm_2d(params["ln1"], x))
        x = cm.conv2d(params["conv2"], x, stride=1, padding=1)
        x = jax.nn.relu(cm.layer_norm_2d(params["ln2"], x))
        return x


class SegmentationHead:
    """1x1 conv head mapping decoder features to class logits
    (reference simple_sam_3d_wrapper.py:80)."""

    def __init__(self, key, in_channels: int = None, out_channels: int = None,
                 kernel_size=(1, 1), stride=(1, 1), padding=(0, 0),
                 bias: bool = True):
        if out_channels is None and isinstance(key, int) and in_channels is not None:
            key, in_channels, out_channels = 0, key, in_channels
        k = jax.random.PRNGKey(key) if isinstance(key, int) else key
        self.params = {"head": cm.init_conv(k, 1, 1, in_channels, out_channels)}

    def __call__(self, params: dict, x: jnp.ndarray) -> jnp.ndarray:
        return cm.conv2d(params["head"], x, stride=1, padding="VALID")
