"""Flash-attention kernel vs einsum reference (interpret mode on CPU)."""
import numpy as np
import pytest


@pytest.mark.parametrize("with_rel", [True, False])
def test_flash_matches_einsum(with_rel):
    import jax
    import jax.numpy as jnp
    from micro_sam_tpu.ops.attention import _einsum_attention_rel_pos
    from micro_sam_tpu.ops.flash_attention import flash_attention_rel_pos

    H = W = 8
    N, nH, hd = H * W, 2, 32
    B = 2
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, N, nH, hd).astype(np.float32) * 0.5)
    k = jnp.asarray(rng.randn(B, N, nH, hd).astype(np.float32) * 0.5)
    v = jnp.asarray(rng.randn(B, N, nH, hd).astype(np.float32))
    if with_rel:
        rel_h = jnp.asarray(rng.randn(H, H, hd).astype(np.float32) * 0.2)
        rel_w = jnp.asarray(rng.randn(W, W, hd).astype(np.float32) * 0.2)
    else:
        rel_h = rel_w = None

    ref = _einsum_attention_rel_pos(q, k, v, (H, W), rel_h, rel_w)
    out = flash_attention_rel_pos(q, k, v, (H, W), rel_h, rel_w)
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=2e-5), \
        np.abs(np.asarray(out) - np.asarray(ref)).max()


def test_flash_window_size():
    """Window-sized attention (N=196, W=14) through the kernel path."""
    import numpy as np
    import jax.numpy as jnp
    from micro_sam_tpu.ops.attention import _einsum_attention_rel_pos
    from micro_sam_tpu.ops.flash_attention import flash_attention_rel_pos

    H = W = 14
    N, nH, hd = H * W, 4, 32
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(3, N, nH, hd).astype(np.float32) * 0.4)
    k = jnp.asarray(rng.randn(3, N, nH, hd).astype(np.float32) * 0.4)
    v = jnp.asarray(rng.randn(3, N, nH, hd).astype(np.float32))
    rel_h = jnp.asarray(rng.randn(H, H, hd).astype(np.float32) * 0.2)
    rel_w = jnp.asarray(rng.randn(W, W, hd).astype(np.float32) * 0.2)

    ref = _einsum_attention_rel_pos(q, k, v, (H, W), rel_h, rel_w)
    out = flash_attention_rel_pos(q, k, v, (H, W), rel_h, rel_w)
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=2e-5), \
        np.abs(np.asarray(out) - np.asarray(ref)).max()


@pytest.mark.parametrize("hw", [(8, 8), (14, 14)])
def test_flash_qkv_matches_einsum(hw):
    import jax.numpy as jnp
    from micro_sam_tpu.ops.attention import _einsum_attention_rel_pos
    from micro_sam_tpu.ops.flash_attention import flash_attention_qkv

    H, W = hw
    N, nH, hd = H * W, 4, 32
    rng = np.random.RandomState(2)
    qkv = jnp.asarray(rng.randn(2, 3, nH, N, hd).astype(np.float32) * 0.4)
    rel_h = jnp.asarray(rng.randn(H, H, hd).astype(np.float32) * 0.2)
    rel_w = jnp.asarray(rng.randn(W, W, hd).astype(np.float32) * 0.2)

    # reference on the (B, N, nH, hd) layout
    q = jnp.transpose(qkv[:, 0], (0, 2, 1, 3))
    k = jnp.transpose(qkv[:, 1], (0, 2, 1, 3))
    v = jnp.transpose(qkv[:, 2], (0, 2, 1, 3))
    ref = jnp.transpose(
        _einsum_attention_rel_pos(q, k, v, (H, W), rel_h, rel_w), (0, 2, 1, 3)
    )
    out = flash_attention_qkv(qkv, (H, W), rel_h, rel_w, nH)
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=2e-5), \
        np.abs(np.asarray(out) - np.asarray(ref)).max()


@pytest.mark.slow
def test_flash_backward_matches_einsum_vjp():
    """Pallas backward kernel vs the einsum VJP, including rel-pos table
    grads, on both the heads-in-kernel path and the per-head-grid path
    (N > 1024) with multiple q/k blocks."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from micro_sam_tpu.ops.flash_attention import flash_attention_qkv
    from micro_sam_tpu.ops.attention import _einsum_attention_rel_pos

    rng = np.random.RandomState(7)
    for (H, W, nH, B) in [(14, 14, 2, 2), (64, 32, 1, 1)]:
        N, hd = H * W, 32
        qkv = jnp.asarray(rng.randn(B, 3, nH, N, hd).astype(np.float32)) * 0.5
        rh = jnp.asarray(rng.randn(H, H, hd).astype(np.float32)) * 0.2
        rw = jnp.asarray(rng.randn(W, W, hd).astype(np.float32)) * 0.2

        def f_flash(qkv, rh, rw):
            return jnp.sum(jnp.sin(flash_attention_qkv(qkv, (H, W), rh, rw, nH)))

        def f_ref(qkv, rh, rw):
            q = jnp.transpose(qkv[:, 0], (0, 2, 1, 3))
            k = jnp.transpose(qkv[:, 1], (0, 2, 1, 3))
            v = jnp.transpose(qkv[:, 2], (0, 2, 1, 3))
            o = _einsum_attention_rel_pos(q, k, v, (H, W), rh, rw)
            return jnp.sum(jnp.sin(jnp.transpose(o, (0, 2, 1, 3))))

        g1 = jax.grad(f_flash, argnums=(0, 1, 2))(qkv, rh, rw)
        g2 = jax.grad(f_ref, argnums=(0, 1, 2))(qkv, rh, rw)
        for a, b in zip(g1, g2):
            ref = float(jnp.max(jnp.abs(b))) + 1e-9
            assert float(jnp.max(jnp.abs(a - b))) / ref < 2e-5
