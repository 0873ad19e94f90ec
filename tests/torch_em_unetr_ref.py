"""Torch reconstruction of the torch_em UNETR decoder — conversion oracle.

Faithful reimplementation of the modules referenced by micro-sam's
DecoderAdapter (reference micro_sam/instance_segmentation.py:691-740) from
torch_em (torch_em/model/unetr.py + torch_em/model/unet.py): Deconv2DBlock /
SingleDeconv2DBlock / SingleConv2DBlock / Upsampler2d / ConvBlock2d / Decoder.
Key layout matches what the reference's state-dict surgery expects — e.g.
conv-transpose upsamplers appear as 'decoder.samplers.N.block.weight' and
interpolation upsamplers as 'decoder.samplers.N.conv.weight' (the exact
property the reference tests at instance_segmentation.py:775).
"""
import torch
import torch.nn as nn
import torch.nn.functional as F


class SingleDeconv2DBlock(nn.Module):
    def __init__(self, scale_factor, in_channels, out_channels):
        super().__init__()
        self.block = nn.ConvTranspose2d(
            in_channels, out_channels, kernel_size=2, stride=2, padding=0, output_padding=0
        )

    def forward(self, x):
        return self.block(x)


class Upsampler2d(nn.Module):
    def __init__(self, scale_factor, in_channels, out_channels):
        super().__init__()
        self.scale_factor = scale_factor
        self.conv = nn.Conv2d(in_channels, out_channels, kernel_size=1)

    def forward(self, x):
        x = F.interpolate(x, scale_factor=self.scale_factor, mode="bilinear",
                          align_corners=False)
        return self.conv(x)


class SingleConv2DBlock(nn.Module):
    def __init__(self, in_planes, out_planes, kernel_size):
        super().__init__()
        self.block = nn.Conv2d(in_planes, out_planes, kernel_size=kernel_size,
                               stride=1, padding=((kernel_size - 1) // 2))

    def forward(self, x):
        return self.block(x)


class Conv2DBlock(nn.Module):  # unetr-local conv block (conv + BN + ReLU)
    def __init__(self, in_planes, out_planes, kernel_size=3):
        super().__init__()
        self.block = nn.Sequential(
            SingleConv2DBlock(in_planes, out_planes, kernel_size),
            nn.BatchNorm2d(out_planes),
            nn.ReLU(True),
        )

    def forward(self, x):
        return self.block(x)


class Deconv2DBlock(nn.Module):
    def __init__(self, in_channels, out_channels, kernel_size=3, use_conv_transpose=True):
        super().__init__()
        _upsampler = SingleDeconv2DBlock if use_conv_transpose else Upsampler2d
        self.block = nn.Sequential(
            _upsampler(scale_factor=2, in_channels=in_channels, out_channels=out_channels),
            SingleConv2DBlock(out_channels, out_channels, kernel_size),
            nn.BatchNorm2d(out_channels),
            nn.ReLU(True),
        )

    def forward(self, x):
        return self.block(x)


class ConvBlock2d(nn.Module):  # torch_em unet.ConvBlock2d, norm="InstanceNorm"
    def __init__(self, in_channels, out_channels, kernel_size=3, padding=1):
        super().__init__()
        self.block = nn.Sequential(
            nn.InstanceNorm2d(in_channels),
            nn.Conv2d(in_channels, out_channels, kernel_size=kernel_size, padding=padding),
            nn.ReLU(inplace=True),
            nn.InstanceNorm2d(out_channels),
            nn.Conv2d(out_channels, out_channels, kernel_size=kernel_size, padding=padding),
            nn.ReLU(inplace=True),
        )

    def forward(self, x):
        return self.block(x)


class Decoder(nn.Module):  # torch_em unet.Decoder
    def __init__(self, features, scale_factors, conv_block_impl, sampler_impl):
        super().__init__()
        assert len(features) == len(scale_factors) + 1
        self.blocks = nn.ModuleList(
            [conv_block_impl(features[i], features[i + 1])
             for i in range(len(features) - 1)]
        )
        self.samplers = nn.ModuleList(
            [sampler_impl(factor, features[i], features[i + 1])
             for i, factor in enumerate(scale_factors)]
        )

    def forward(self, x, encoder_inputs):
        assert len(encoder_inputs) == len(self.blocks)
        for block, sampler, from_encoder in zip(self.blocks, self.samplers, encoder_inputs):
            x = sampler(x)
            x = block(torch.cat([x, from_encoder], dim=1))
        return x


class UnetrDecoder(nn.Module):
    """The decoder-only part of torch_em's UNETR (backbone='sam',
    use_skip_connection=False) with DecoderAdapter._forward_impl dataflow."""

    def __init__(self, embed_dim=256, out_channels=3, features=(512, 256, 128, 64),
                 use_conv_transpose=True):
        super().__init__()
        f0, f1, f2, f3 = features
        _upsampler = SingleDeconv2DBlock if use_conv_transpose else Upsampler2d
        self.deconv1 = Deconv2DBlock(embed_dim, f1, use_conv_transpose=use_conv_transpose)
        self.deconv2 = Deconv2DBlock(f1, f2, use_conv_transpose=use_conv_transpose)
        self.deconv3 = Deconv2DBlock(f2, f3, use_conv_transpose=use_conv_transpose)
        self.deconv4 = Deconv2DBlock(f3, f3, use_conv_transpose=use_conv_transpose)
        self.base = ConvBlock2d(embed_dim, f0)
        self.decoder = Decoder(
            features=list(features), scale_factors=[2, 2, 2],
            conv_block_impl=ConvBlock2d, sampler_impl=_upsampler,
        )
        self.deconv_out = _upsampler(scale_factor=2, in_channels=f3, out_channels=f3)
        self.decoder_head = ConvBlock2d(2 * f3, f3)
        self.out_conv = nn.Conv2d(f3, out_channels, 1)

    def forward(self, z12):
        z9 = self.deconv1(z12)
        z6 = self.deconv2(z9)
        z3 = self.deconv3(z6)
        z0 = self.deconv4(z3)

        x = self.base(z12)
        x = self.decoder(x, encoder_inputs=[z9, z6, z3])
        x = self.deconv_out(x)

        x = torch.cat([x, z0], dim=1)
        x = self.decoder_head(x)
        x = self.out_conv(x)
        return torch.sigmoid(x)
