"""Fused windowed transformer block (ops/fused_window_block.py) vs the
unfused composition, forward and backward, masked and unmasked."""
import jax
import jax.numpy as jnp
import pytest


@pytest.mark.parametrize("masked", [False, True])
def test_fused_window_block_matches_unfused(masked):
    from micro_sam_tpu.models.image_encoder import init_block
    from micro_sam_tpu.ops.fused_window_block import (
        fused_window_block, _unfused_reference,
    )

    C, nH, W = 64, 2, 7
    N = W * W
    BW = 3
    bp = init_block(jax.random.PRNGKey(0), C, nH, 4.0, (W, W), use_rel_pos=True)
    bp["attn"]["rel_pos_h"] = 0.2 * jax.random.normal(
        jax.random.PRNGKey(1), bp["attn"]["rel_pos_h"].shape)
    bp["attn"]["rel_pos_w"] = 0.2 * jax.random.normal(
        jax.random.PRNGKey(2), bp["attn"]["rel_pos_w"].shape)
    x = jax.random.normal(jax.random.PRNGKey(3), (BW, N, C), jnp.float32)
    valid = None
    if masked:
        valid = (jax.random.uniform(jax.random.PRNGKey(4), (BW, N, 1)) > 0.2
                 ).astype(jnp.float32)

    y1 = fused_window_block(x, valid, bp, (W, W), nH)
    y2 = _unfused_reference(x, valid, bp, (W, W), nH)
    assert float(jnp.max(jnp.abs(y1 - y2))) < 5e-5

    g1 = jax.grad(lambda x_, p_: jnp.sum(jnp.sin(
        fused_window_block(x_, valid, p_, (W, W), nH))), argnums=(0, 1))(x, bp)
    g2 = jax.grad(lambda x_, p_: jnp.sum(jnp.sin(
        _unfused_reference(x_, valid, p_, (W, W), nH))), argnums=(0, 1))(x, bp)
    err = max(float(jnp.max(jnp.abs(a - b)))
              for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)))
    assert err < 5e-4
