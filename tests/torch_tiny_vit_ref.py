"""Independent torch reimplementation of the mobile_sam TinyViT encoder.

Parity oracle for ``micro_sam_tpu/models/tiny_vit.py`` (test asset, not
package code): consumes the mobile_sam-layout state dict produced by
``export_tiny_vit`` (keys ``image_encoder.*``) and reproduces the vit_t
forward in plain torch ops — conv patch embed, MBConv stage, three
window-attention stages with learned per-offset attention biases,
patch-merging downsamples, and the SAM neck. Used by tests/make_golden.py to
generate committed golden bytes so the JAX stack is pinned to numbers
produced by the other implementation.

Reference architecture: mobile_sam TinyViT as instantiated by
/root/reference/micro_sam/util.py (vit_t registry entry) via
mobile_sam.build_sam_vit_t; frozen-BN inference semantics.
"""
import itertools

import torch
import torch.nn.functional as F


def _bn(sd, pre, x):
    """Inference-mode BatchNorm2d over NCHW channels using running stats."""
    return F.batch_norm(
        x, sd[f"{pre}.running_mean"], sd[f"{pre}.running_var"],
        sd[f"{pre}.weight"], sd[f"{pre}.bias"], training=False, eps=1e-5,
    )


def _conv_bn(sd, pre, x, stride=1, padding=0, groups=1):
    x = F.conv2d(x, sd[f"{pre}.c.weight"], None, stride=stride,
                 padding=padding, groups=groups)
    return _bn(sd, f"{pre}.bn", x)


def _gelu(x):
    return F.gelu(x, approximate="none")


def _mbconv(sd, pre, x):
    hidden = sd[f"{pre}.conv2.c.weight"].shape[0]
    shortcut = x
    x = _gelu(_conv_bn(sd, f"{pre}.conv1", x))
    x = _gelu(_conv_bn(sd, f"{pre}.conv2", x, padding=1, groups=hidden))
    x = _conv_bn(sd, f"{pre}.conv3", x)
    return _gelu(shortcut + x)


def _patch_merging(sd, pre, x, stride):
    out_ch = sd[f"{pre}.conv1.c.weight"].shape[0]
    x = _gelu(_conv_bn(sd, f"{pre}.conv1", x))
    x = _gelu(_conv_bn(sd, f"{pre}.conv2", x, stride=stride, padding=1,
                       groups=out_ch))
    return _conv_bn(sd, f"{pre}.conv3", x)


def attention_bias_idxs(window):
    """Same per-offset index map as the package (tiny_vit.py) and mobile_sam."""
    points = list(itertools.product(range(window), range(window)))
    offsets = {}
    idxs = torch.zeros(len(points), len(points), dtype=torch.long)
    for i, p1 in enumerate(points):
        for j, p2 in enumerate(points):
            off = (abs(p1[0] - p2[0]), abs(p1[1] - p2[1]))
            if off not in offsets:
                offsets[off] = len(offsets)
            idxs[i, j] = offsets[off]
    return idxs


def _tiny_attention(sd, pre, x, num_heads, window):
    """x: (B, N, C) tokens of one window batch."""
    B, N, C = x.shape
    key_dim = C // num_heads
    x = F.layer_norm(x, (C,), sd[f"{pre}.norm.weight"], sd[f"{pre}.norm.bias"],
                     eps=1e-5)
    qkv = F.linear(x, sd[f"{pre}.qkv.weight"], sd.get(f"{pre}.qkv.bias"))
    q, k, v = qkv.split([num_heads * key_dim, num_heads * key_dim, C], dim=-1)
    q = q.view(B, N, num_heads, key_dim).permute(0, 2, 1, 3)
    k = k.view(B, N, num_heads, key_dim).permute(0, 2, 1, 3)
    v = v.view(B, N, num_heads, key_dim).permute(0, 2, 1, 3)

    bias = sd[f"{pre}.attention_biases"][:, attention_bias_idxs(window)]
    attn = (q @ k.transpose(-2, -1)) * key_dim ** -0.5 + bias[None]
    attn = attn.softmax(dim=-1)
    out = (attn @ v).permute(0, 2, 1, 3).reshape(B, N, C)
    return F.linear(out, sd[f"{pre}.proj.weight"], sd.get(f"{pre}.proj.bias"))


def _tiny_block(sd, pre, x, num_heads, window):
    """x: (B, H, W, C) channel-last."""
    B, H, W, C = x.shape
    res = x
    pad_h = (window - H % window) % window
    pad_w = (window - W % window) % window
    xw = F.pad(x, (0, 0, 0, pad_w, 0, pad_h)) if (pad_h or pad_w) else x
    Hp, Wp = H + pad_h, W + pad_w
    xw = xw.view(B, Hp // window, window, Wp // window, window, C)
    xw = xw.permute(0, 1, 3, 2, 4, 5).reshape(-1, window * window, C)
    xw = _tiny_attention(sd, f"{pre}.attn", xw, num_heads, window)
    xw = xw.view(B, Hp // window, Wp // window, window, window, C)
    xw = xw.permute(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, C)[:, :H, :W]
    x = res + xw

    xc = x.permute(0, 3, 1, 2)
    xc = _conv_bn(sd, f"{pre}.local_conv", xc, padding=1, groups=C)
    tokens = xc.permute(0, 2, 3, 1).reshape(B, H * W, C)
    y = F.layer_norm(tokens, (C,), sd[f"{pre}.mlp.norm.weight"],
                     sd[f"{pre}.mlp.norm.bias"], eps=1e-5)
    y = F.linear(y, sd[f"{pre}.mlp.fc1.weight"], sd.get(f"{pre}.mlp.fc1.bias"))
    y = F.linear(_gelu(y), sd[f"{pre}.mlp.fc2.weight"],
                 sd.get(f"{pre}.mlp.fc2.bias"))
    return (tokens + y).view(B, H, W, C)


def _ln2d(sd, pre, x):
    """LayerNorm over NCHW channels (mobile_sam LayerNorm2d, eps 1e-6)."""
    u = x.mean(1, keepdim=True)
    s = (x - u).pow(2).mean(1, keepdim=True)
    x = (x - u) / torch.sqrt(s + 1e-6)
    return sd[f"{pre}.weight"][:, None, None] * x + sd[f"{pre}.bias"][:, None, None]


DEPTHS = (2, 2, 6, 2)
NUM_HEADS = (2, 4, 5, 10)
WINDOW_SIZES = (7, 7, 14, 7)


def tiny_vit_encoder(sd, pixels):
    """pixels: (B, 3, S, S) preprocessed -> (B, 256, S/16, S/16)."""
    e = "image_encoder"
    x = _gelu(_conv_bn(sd, f"{e}.patch_embed.seq.0", pixels, stride=2, padding=1))
    x = _conv_bn(sd, f"{e}.patch_embed.seq.2", x, stride=2, padding=1)

    for i in range(DEPTHS[0]):
        x = _mbconv(sd, f"{e}.layers.0.blocks.{i}", x)
    x = _patch_merging(sd, f"{e}.layers.0.downsample", x, stride=2)

    for stage, stride in ((1, 2), (2, 1)):
        x = x.permute(0, 2, 3, 1)                       # NCHW -> NHWC
        for i in range(DEPTHS[stage]):
            x = _tiny_block(sd, f"{e}.layers.{stage}.blocks.{i}", x,
                            NUM_HEADS[stage], WINDOW_SIZES[stage])
        x = x.permute(0, 3, 1, 2)
        x = _patch_merging(sd, f"{e}.layers.{stage}.downsample", x, stride=stride)

    x = x.permute(0, 2, 3, 1)
    for i in range(DEPTHS[3]):
        x = _tiny_block(sd, f"{e}.layers.3.blocks.{i}", x,
                        NUM_HEADS[3], WINDOW_SIZES[3])
    x = x.permute(0, 3, 1, 2)

    x = F.conv2d(x, sd[f"{e}.neck.0.weight"])
    x = _ln2d(sd, f"{e}.neck.1", x)
    x = F.conv2d(x, sd[f"{e}.neck.2.weight"], padding=1)
    return _ln2d(sd, f"{e}.neck.3", x)
