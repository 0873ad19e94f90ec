"""Independent torch implementation of the SAM forward for parity testing.

Implements the official segment_anything semantics (ViT encoder with
decomposed rel-pos windowed attention, prompt encoder, TwoWayTransformer mask
decoder) in plain torch, consuming the torch-layout state dict exported by
micro_sam_tpu.models.convert. Used by test_parity.py to check that the JAX
forward matches an independent torch execution of the same weights.
"""
import math

import numpy as np
import torch
import torch.nn.functional as F


# ---------------------------------------------------------------------------
# image encoder
# ---------------------------------------------------------------------------

def get_rel_pos(q_size, k_size, rel_pos):
    max_rel_dist = 2 * max(q_size, k_size) - 1
    if rel_pos.shape[0] != max_rel_dist:
        rel_pos = F.interpolate(
            rel_pos.reshape(1, rel_pos.shape[0], -1).permute(0, 2, 1),
            size=max_rel_dist, mode="linear",
        ).reshape(-1, max_rel_dist).permute(1, 0)
    q_coords = torch.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = torch.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    relative_coords = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos[relative_coords.long()]


def add_decomposed_rel_pos(attn, q, rel_pos_h, rel_pos_w, q_size, k_size):
    q_h, q_w = q_size
    k_h, k_w = k_size
    Rh = get_rel_pos(q_h, k_h, rel_pos_h)
    Rw = get_rel_pos(q_w, k_w, rel_pos_w)
    B, _, dim = q.shape
    r_q = q.reshape(B, q_h, q_w, dim)
    rel_h = torch.einsum("bhwc,hkc->bhwk", r_q, Rh)
    rel_w = torch.einsum("bhwc,wkc->bhwk", r_q, Rw)
    attn = (
        attn.view(B, q_h, q_w, k_h, k_w)
        + rel_h[:, :, :, :, None] + rel_w[:, :, :, None, :]
    ).view(B, q_h * q_w, k_h * k_w)
    return attn


def window_partition(x, window_size):
    B, H, W, C = x.shape
    pad_h = (window_size - H % window_size) % window_size
    pad_w = (window_size - W % window_size) % window_size
    if pad_h > 0 or pad_w > 0:
        x = F.pad(x, (0, 0, 0, pad_w, 0, pad_h))
    Hp, Wp = H + pad_h, W + pad_w
    x = x.view(B, Hp // window_size, window_size, Wp // window_size, window_size, C)
    windows = x.permute(0, 1, 3, 2, 4, 5).contiguous().view(-1, window_size, window_size, C)
    return windows, (Hp, Wp)


def window_unpartition(windows, window_size, pad_hw, hw):
    Hp, Wp = pad_hw
    H, W = hw
    B = windows.shape[0] // (Hp * Wp // window_size // window_size)
    x = windows.view(B, Hp // window_size, Wp // window_size, window_size, window_size, -1)
    x = x.permute(0, 1, 3, 2, 4, 5).contiguous().view(B, Hp, Wp, -1)
    return x[:, :H, :W, :].contiguous()


def attention(sd, pre, x, num_heads):
    B, H, W, C = x.shape
    qkv = F.linear(x.reshape(B, H * W, C), sd[f"{pre}.qkv.weight"], sd[f"{pre}.qkv.bias"])
    qkv = qkv.reshape(B, H * W, 3, num_heads, -1).permute(2, 0, 3, 1, 4)
    q, k, v = qkv.reshape(3, B * num_heads, H * W, -1).unbind(0)
    scale = q.shape[-1] ** -0.5
    attn = (q * scale) @ k.transpose(-2, -1)
    if f"{pre}.rel_pos_h" in sd:
        attn = add_decomposed_rel_pos(
            attn, q, sd[f"{pre}.rel_pos_h"], sd[f"{pre}.rel_pos_w"], (H, W), (H, W)
        )
    attn = attn.softmax(dim=-1)
    x = (attn @ v).view(B, num_heads, H, W, -1).permute(0, 2, 3, 1, 4).reshape(B, H, W, -1)
    return F.linear(x, sd[f"{pre}.proj.weight"], sd[f"{pre}.proj.bias"])


def encoder_block(sd, pre, x, num_heads, window_size):
    shortcut = x
    x = F.layer_norm(x, (x.shape[-1],), sd[f"{pre}.norm1.weight"],
                     sd[f"{pre}.norm1.bias"], eps=1e-6)
    if window_size > 0:
        H, W = x.shape[1], x.shape[2]
        x, pad_hw = window_partition(x, window_size)
        x = attention(sd, f"{pre}.attn", x, num_heads)
        x = window_unpartition(x, window_size, pad_hw, (H, W))
    else:
        x = attention(sd, f"{pre}.attn", x, num_heads)
    x = shortcut + x
    y = F.layer_norm(x, (x.shape[-1],), sd[f"{pre}.norm2.weight"],
                     sd[f"{pre}.norm2.bias"], eps=1e-6)
    y = F.linear(y, sd[f"{pre}.mlp.lin1.weight"], sd[f"{pre}.mlp.lin1.bias"])
    y = F.gelu(y)
    y = F.linear(y, sd[f"{pre}.mlp.lin2.weight"], sd[f"{pre}.mlp.lin2.bias"])
    return x + y


def layer_norm_2d(x, w, b):
    u = x.mean(1, keepdim=True)
    s = (x - u).pow(2).mean(1, keepdim=True)
    x = (x - u) / torch.sqrt(s + 1e-6)
    return w[:, None, None] * x + b[:, None, None]


def image_encoder(sd, pixels, depth, num_heads, window_size, global_idx, patch=16):
    """pixels: (B, 3, S, S) preprocessed."""
    x = F.conv2d(pixels, sd["image_encoder.patch_embed.proj.weight"],
                 sd["image_encoder.patch_embed.proj.bias"], stride=patch)
    x = x.permute(0, 2, 3, 1)
    if "image_encoder.pos_embed" in sd:
        x = x + sd["image_encoder.pos_embed"]
    for i in range(depth):
        ws = 0 if i in global_idx else window_size
        x = encoder_block(sd, f"image_encoder.blocks.{i}", x, num_heads, ws)
    x = x.permute(0, 3, 1, 2)
    x = F.conv2d(x, sd["image_encoder.neck.0.weight"])
    x = layer_norm_2d(x, sd["image_encoder.neck.1.weight"], sd["image_encoder.neck.1.bias"])
    x = F.conv2d(x, sd["image_encoder.neck.2.weight"], padding=1)
    x = layer_norm_2d(x, sd["image_encoder.neck.3.weight"], sd["image_encoder.neck.3.bias"])
    return x


# ---------------------------------------------------------------------------
# prompt encoder
# ---------------------------------------------------------------------------

def pe_encoding(sd, coords):
    coords = 2 * coords - 1
    coords = coords @ sd["prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"]
    coords = 2 * np.pi * coords
    return torch.cat([torch.sin(coords), torch.cos(coords)], dim=-1)


def embed_points(sd, points, labels, input_size):
    points = points + 0.5
    coords = points / torch.tensor([input_size[1], input_size[0]], dtype=torch.float32)
    pe = pe_encoding(sd, coords)
    out = torch.where(labels[..., None] == -1,
                      sd["prompt_encoder.not_a_point_embed.weight"][0], pe)
    for val, idx in ((0, 0), (1, 1), (2, 2), (3, 3)):
        out = out + torch.where(
            labels[..., None] == val,
            sd[f"prompt_encoder.point_embeddings.{idx}.weight"][0],
            torch.zeros(1),
        )
    return out


def dense_pe(sd, size):
    h, w = size
    grid = torch.ones((h, w))
    y = (grid.cumsum(dim=0) - 0.5) / h
    x = (grid.cumsum(dim=1) - 0.5) / w
    pe = pe_encoding(sd, torch.stack([x, y], dim=-1))
    return pe.permute(2, 0, 1)


# ---------------------------------------------------------------------------
# mask decoder
# ---------------------------------------------------------------------------

def attn_ds(sd, pre, q, k, v, num_heads=8):
    q = F.linear(q, sd[f"{pre}.q_proj.weight"], sd[f"{pre}.q_proj.bias"])
    k = F.linear(k, sd[f"{pre}.k_proj.weight"], sd[f"{pre}.k_proj.bias"])
    v = F.linear(v, sd[f"{pre}.v_proj.weight"], sd[f"{pre}.v_proj.bias"])
    B, N, C = q.shape
    q = q.reshape(B, N, num_heads, C // num_heads).transpose(1, 2)
    k = k.reshape(B, k.shape[1], num_heads, C // num_heads).transpose(1, 2)
    v = v.reshape(B, v.shape[1], num_heads, C // num_heads).transpose(1, 2)
    attn = (q / math.sqrt(C // num_heads)) @ k.transpose(-2, -1)
    attn = attn.softmax(dim=-1)
    out = (attn @ v).transpose(1, 2).reshape(B, N, C)
    return F.linear(out, sd[f"{pre}.out_proj.weight"], sd[f"{pre}.out_proj.bias"])


def ln(sd, pre, x):
    return F.layer_norm(x, (x.shape[-1],), sd[f"{pre}.weight"], sd[f"{pre}.bias"], eps=1e-5)


def two_way_block(sd, pre, queries, keys, query_pe, key_pe, skip_first):
    if skip_first:
        queries = attn_ds(sd, f"{pre}.self_attn", queries, queries, queries)
    else:
        q = queries + query_pe
        queries = queries + attn_ds(sd, f"{pre}.self_attn", q, q, queries)
    queries = ln(sd, f"{pre}.norm1", queries)
    q = queries + query_pe
    k = keys + key_pe
    queries = queries + attn_ds(sd, f"{pre}.cross_attn_token_to_image", q, k, keys)
    queries = ln(sd, f"{pre}.norm2", queries)
    y = F.linear(queries, sd[f"{pre}.mlp.lin1.weight"], sd[f"{pre}.mlp.lin1.bias"])
    y = F.linear(F.gelu(y), sd[f"{pre}.mlp.lin2.weight"], sd[f"{pre}.mlp.lin2.bias"])
    queries = ln(sd, f"{pre}.norm3", queries + y)
    q = queries + query_pe
    k = keys + key_pe
    keys = keys + attn_ds(sd, f"{pre}.cross_attn_image_to_token", k, q, queries)
    keys = ln(sd, f"{pre}.norm4", keys)
    return queries, keys


def mask_decoder(sd, image_embeddings, image_pe, sparse, dense):
    """image_embeddings: (B, 256, e, e); returns (masks (B,4,4e,4e), iou (B,4))."""
    output_tokens = torch.cat(
        [sd["mask_decoder.iou_token.weight"], sd["mask_decoder.mask_tokens.weight"]], dim=0
    )
    B = sparse.shape[0]
    tokens = torch.cat([output_tokens.unsqueeze(0).expand(B, -1, -1), sparse], dim=1)

    src = image_embeddings + dense
    b, c, h, w = src.shape
    src_f = src.flatten(2).permute(0, 2, 1)
    pe_f = image_pe.flatten(1).reshape(c, h * w).permute(1, 0).unsqueeze(0).expand(B, -1, -1)

    queries, keys = tokens, src_f
    for i in range(2):
        queries, keys = two_way_block(
            sd, f"mask_decoder.transformer.layers.{i}", queries, keys,
            tokens, pe_f, skip_first=(i == 0),
        )
    q = queries + tokens
    k = keys + pe_f
    queries = queries + attn_ds(
        sd, "mask_decoder.transformer.final_attn_token_to_image", q, k, keys)
    queries = ln(sd, "mask_decoder.transformer.norm_final_attn", queries)

    iou_token_out = queries[:, 0]
    mask_tokens_out = queries[:, 1:5]

    src_out = keys.transpose(1, 2).view(b, c, h, w)
    up = F.conv_transpose2d(src_out, sd["mask_decoder.output_upscaling.0.weight"],
                            sd["mask_decoder.output_upscaling.0.bias"], stride=2)
    up = layer_norm_2d(up, sd["mask_decoder.output_upscaling.1.weight"],
                       sd["mask_decoder.output_upscaling.1.bias"])
    up = F.gelu(up)
    up = F.conv_transpose2d(up, sd["mask_decoder.output_upscaling.3.weight"],
                            sd["mask_decoder.output_upscaling.3.bias"], stride=2)
    up = F.gelu(up)

    hyper = []
    for i in range(4):
        x = mask_tokens_out[:, i]
        for j in range(3):
            pre = f"mask_decoder.output_hypernetworks_mlps.{i}.layers.{j}"
            x = F.linear(x, sd[f"{pre}.weight"], sd[f"{pre}.bias"])
            if j < 2:
                x = F.relu(x)
        hyper.append(x)
    hyper_in = torch.stack(hyper, dim=1)
    bb, cc, hh, ww = up.shape
    masks = (hyper_in @ up.view(bb, cc, hh * ww)).view(bb, -1, hh, ww)

    x = iou_token_out
    for j in range(3):
        pre = f"mask_decoder.iou_prediction_head.layers.{j}"
        x = F.linear(x, sd[f"{pre}.weight"], sd[f"{pre}.bias"])
        if j < 2:
            x = F.relu(x)
    return masks, x
