"""torch_em UNETR decoder state-dict conversion: numerics vs the torch oracle.

VERDICT r1 item 2: without this surgery, AIS cannot use any published
``*_decoder`` zoo checkpoint (reference instance_segmentation.py:741-833).
"""
import numpy as np
import pytest
import torch


def _randomize_bn_stats(model, seed):
    """Give BatchNorm layers non-trivial running statistics so the test
    actually checks that frozen-BN inference uses them."""
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.copy_(0.5 * torch.randn(m.running_mean.shape, generator=g))
            m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)


@pytest.mark.parametrize("use_conv_transpose", [True, False])
def test_torch_em_decoder_conversion(use_conv_transpose):
    from tests.torch_em_unetr_ref import UnetrDecoder
    from micro_sam_tpu.models.unetr import (
        convert_torch_em_decoder, apply_unetr_decoder, is_torch_decoder_state,
    )

    torch.manual_seed(0)
    model = UnetrDecoder(
        embed_dim=32, out_channels=3, features=(64, 32, 16, 8),
        use_conv_transpose=use_conv_transpose,
    ).eval()
    _randomize_bn_stats(model, seed=1)

    sd = model.state_dict()
    # the property the reference's format detection relies on
    sampler_keys = [k for k in sd if k.startswith("decoder.samplers")]
    has_block = any(".block." in k for k in sampler_keys)
    assert has_block == use_conv_transpose

    assert is_torch_decoder_state(sd)
    params = convert_torch_em_decoder(sd)

    x = torch.randn(2, 32, 16, 16, generator=torch.Generator().manual_seed(2))
    with torch.no_grad():
        ref = model(x).numpy()  # (B, 3, 256, 256)

    out = np.asarray(apply_unetr_decoder(params, np.transpose(x.numpy(), (0, 2, 3, 1))))
    out = np.transpose(out, (0, 3, 1, 2))

    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


def test_get_unetr_accepts_torch_state():
    """get_unetr / get_predictor_and_decoder route torch_em state dicts
    through the converter."""
    from tests.torch_em_unetr_ref import UnetrDecoder
    from micro_sam_tpu.instance_segmentation import get_unetr

    torch.manual_seed(3)
    model = UnetrDecoder(embed_dim=32, out_channels=3, features=(64, 32, 16, 8))
    params = get_unetr(decoder_state=model.state_dict())
    assert "deconv1" in params and "decoder" in params
    # converted widths come from the checkpoint, not the init defaults
    assert params["base"]["conv1"]["w"].shape == (3, 3, 32, 64)


def test_decoder_adapter_with_converted_state():
    """DecoderAdapter end-to-end on converted weights: fg/center/boundary maps
    have the right shape and the sigmoid range."""
    from tests.torch_em_unetr_ref import UnetrDecoder
    from micro_sam_tpu.instance_segmentation import get_decoder

    torch.manual_seed(4)
    model = UnetrDecoder(embed_dim=32, out_channels=3, features=(64, 32, 16, 8)).eval()
    decoder = get_decoder(decoder_state=model.state_dict())

    emb = np.random.RandomState(0).rand(1, 16, 16, 32).astype(np.float32)
    out = decoder(emb, input_shape=(256, 256), original_shape=(200, 220))
    out = np.asarray(out)
    assert out.shape[-3:-1] == (200, 220) or out.shape[1:3] == (200, 220) or out.shape[-2:] == (200, 220)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
