"""Fused TinyViT window attention (ops/fused_tiny_attention.py) vs the
unfused einsum composition, forward and backward, across all three vit_t
stage geometries (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _make_attn(C, nh, w, seed=0):
    from micro_sam_tpu.models import tiny_vit as tv

    p = tv._init_tiny_attention(jax.random.PRNGKey(seed), C, nh, w)
    rng = np.random.RandomState(seed)
    p["attention_biases"] = jnp.asarray(
        rng.randn(*p["attention_biases"].shape).astype(np.float32))
    idxs, _ = tv._attention_bias_idxs(w)
    n = w * w
    bias_cat = p["attention_biases"][:, jnp.asarray(idxs)]
    return p, bias_cat.transpose(1, 0, 2).reshape(n, nh * n)


@pytest.mark.parametrize("C,nh,w,Hp", [
    (128, 4, 7, 21),    # stage1 geometry
    (160, 5, 14, 28),   # stage2 (window 14)
    (320, 10, 7, 14),   # stage3 (10 heads)
])
def test_fused_tiny_attention_matches_unfused(C, nh, w, Hp):
    from micro_sam_tpu.ops.fused_tiny_attention import (
        _tiny_fused_forward, _unfused_reference)

    p, bias_cat = _make_attn(C, nh, w)
    x = jnp.asarray(np.random.RandomState(1).randn(2, Hp, Hp, C)
                    .astype(np.float32) * 0.5)
    ref = _unfused_reference(x, p, bias_cat, nh, w)
    out = _tiny_fused_forward(x, p, bias_cat, nh, w)
    assert float(jnp.max(jnp.abs(ref - out))) < 5e-5


@pytest.mark.slow
def test_fused_tiny_attention_grad():
    """custom_vjp backward (unfused fallback) is differentiable and matches
    the unfused gradients."""
    from micro_sam_tpu.ops.fused_tiny_attention import (
        fused_tiny_attention, _unfused_reference)

    C, nh, w = 128, 4, 7
    p, bias_cat = _make_attn(C, nh, w)
    x = jnp.asarray(np.random.RandomState(2).randn(1, 14, 14, C)
                    .astype(np.float32) * 0.5)

    g1 = jax.grad(lambda x_, p_: jnp.sum(jnp.sin(
        fused_tiny_attention(x_, p_, bias_cat, nh, w))), argnums=(0, 1))(x, p)
    g2 = jax.grad(lambda x_, p_: jnp.sum(jnp.sin(
        _unfused_reference(x_, p_, bias_cat, nh, w))), argnums=(0, 1))(x, p)
    err = max(float(jnp.max(jnp.abs(a - b)))
              for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)))
    assert err < 5e-4


@pytest.mark.slow
def test_tiny_vit_fused_matches_unfused(monkeypatch):
    """Whole vit_t encoder: fused path vs MSAM_TPU_FUSED_TINY=0."""
    from micro_sam_tpu.models import tiny_vit as tv

    rng = np.random.RandomState(0)
    params = tv.init_tiny_vit(jax.random.PRNGKey(0), img_size=128)
    for stage in ("stage1", "stage2", "stage3"):
        for bp in params[stage]:
            bp["attn"]["attention_biases"] = jnp.asarray(
                rng.randn(*bp["attn"]["attention_biases"].shape)
                .astype(np.float32) * 0.5)
    x = jnp.asarray(rng.rand(1, 128, 128, 3).astype(np.float32))

    monkeypatch.setenv("MSAM_TPU_FUSED_TINY", "0")
    ref = tv.apply_tiny_vit(params, x)
    monkeypatch.setenv("MSAM_TPU_FUSED_TINY", "1")
    out = tv.apply_tiny_vit(params, x)
    assert float(jnp.max(jnp.abs(ref - out))) < 1e-4


@pytest.mark.slow
def test_fused_mbconv_matches_unfused():
    """Fused MBConv kernel vs the conv composition, incl. the image-edge
    zero-halo rows and the cross-chunk halo (H=64 -> two row chunks)."""
    from micro_sam_tpu.models import tiny_vit as tv
    from micro_sam_tpu.ops.fused_mbconv import fused_mbconv, _mbconv_fused_forward

    rng = np.random.RandomState(0)
    p = tv._init_mbconv(jax.random.PRNGKey(0), 64, 64)
    for cb in ("conv1", "conv2", "conv3"):
        n = p[cb]["bn"]["mean"].shape[0]
        p[cb]["bn"]["mean"] = jnp.asarray(rng.randn(n).astype(np.float32) * 0.1)
        p[cb]["bn"]["var"] = jnp.asarray(1 + rng.rand(n).astype(np.float32))
    for H, W in ((64, 48), (8, 16)):
        x = jnp.asarray(rng.randn(2, H, W, 64).astype(np.float32) * 0.5)
        ref = tv._mbconv_unfused(p, x)
        out = _mbconv_fused_forward(x, p)
        assert float(jnp.max(jnp.abs(ref - out))) < 1e-5

    # grad falls back to the unfused composition
    x = jnp.asarray(rng.randn(1, 16, 16, 64).astype(np.float32) * 0.5)
    g1 = jax.grad(lambda x_, p_: jnp.sum(jnp.sin(
        fused_mbconv(x_, p_))), argnums=(0, 1))(x, p)
    g2 = jax.grad(lambda x_, p_: jnp.sum(jnp.sin(
        tv._mbconv_unfused(p_, x_))), argnums=(0, 1))(x, p)
    err = max(float(jnp.max(jnp.abs(a - b)))
              for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)))
    assert err < 5e-4


@pytest.mark.slow
def test_tiny_vit_odd_size(monkeypatch):
    """Odd spatial sizes fall back to the conv patch embed instead of
    crashing the even-parity im2col fold."""
    from micro_sam_tpu.models import tiny_vit as tv

    params = tv.init_tiny_vit(jax.random.PRNGKey(0), img_size=101)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 101, 101, 3)
                    .astype(np.float32))
    out = tv.apply_tiny_vit(params, x)
    monkeypatch.setenv("MSAM_TPU_FUSED_TINY", "0")
    ref = tv.apply_tiny_vit(params, x)
    assert out.shape == ref.shape
    assert float(jnp.max(jnp.abs(out - ref))) < 1e-4


def test_conv3x3_s2_matmul_matches_conv():
    """Patch-embed 9-tap im2col matmul vs the plain conv lowering."""
    from micro_sam_tpu.models import tiny_vit as tv

    rng = np.random.RandomState(0)
    for Cin, Cout, H in ((3, 32, 64), (32, 64, 32)):
        p = tv._init_conv_bn(jax.random.PRNGKey(1), 3, 3, Cin, Cout)
        p["bn"]["mean"] = jnp.asarray(rng.randn(Cout).astype(np.float32) * 0.1)
        p["bn"]["var"] = jnp.asarray(1 + rng.rand(Cout).astype(np.float32))
        x = jnp.asarray(rng.randn(2, H, H, Cin).astype(np.float32))
        ref = tv._conv_bn(p, x, stride=2, padding=1)
        new = tv._conv3x3_s2_matmul(p, x)
        assert ref.shape == new.shape
        assert float(jnp.max(jnp.abs(ref - new))) < 1e-5
