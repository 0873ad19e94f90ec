"""Per-stage timing of the training-shape mask decode (N=200 objects).

The batch-8 train step's marginal corrective round is ~224 ms; decode fwd
alone is ~40 ms at ~430 GFLOP (=~3% MFU), i.e. HBM-bound. This probe splits
the decode into prompt-encode / two-way transformer / upscale+hypernet and
times fwd and fwd+bwd of each at the training shapes, so the optimization
targets the measured wall, not the guessed one.

Usage: python development/probe_decode.py [N] (default 200)
"""
import json
import sys
import time

import numpy as np


def timeit(fn, *args, iters=10):
    import jax
    fn(*args)  # warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        chk = None
        for _ in range(iters):
            chk = fn(*args)
        float(chk)  # fence: only a fetch forces completion through the tunnel
        best = min(best, (time.perf_counter() - t0) / iters)
    return round(best * 1e3, 2)


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from micro_sam_tpu.models.build_sam import get_config
    from micro_sam_tpu.models.sam import init_sam_params, Sam
    from micro_sam_tpu.models import mask_decoder as md
    from micro_sam_tpu.models import prompt_encoder as pe
    from micro_sam_tpu.models import common as cm

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    cfg = get_config("vit_b", compute_dtype="bfloat16")
    params = init_sam_params(jax.random.PRNGKey(0), cfg)
    dp = params["mask_decoder"]
    pp = params["prompt_encoder"]

    rng = np.random.RandomState(0)
    e = cfg.embedding_size
    feats = jnp.asarray(rng.rand(N, e, e, 256).astype(np.float32), cfg.dtype)
    P = 21  # points capacity at n_sub=8 with box prompts
    points = jnp.asarray(rng.rand(N, P, 2).astype(np.float32) * 1024)
    labels = jnp.asarray((rng.rand(N, P) > 0.5).astype(np.int32))
    mask_input = jnp.asarray(rng.rand(N, 256, 256, 1).astype(np.float32))
    has_mask = jnp.ones((N,), bool)

    out = {"n_objects": N}

    # full decode (what the trainer calls per round)
    sam = Sam(cfg, params)

    @jax.jit
    def full(feats, points, labels, mask_input, has_mask):
        low, iou = sam.decode_masks(params, feats, points, labels, mask_input, has_mask)
        return jnp.sum(low.astype(jnp.float32)) + jnp.sum(iou)

    out["decode_full_fwd_ms"] = timeit(full, feats, points, labels, mask_input, has_mask)

    # prompt encode only
    @jax.jit
    def prompts(points, labels, mask_input, has_mask):
        sparse, dense = pe.encode_prompts(
            pp, points, labels, mask_input, has_mask,
            input_image_size=(cfg.img_size,) * 2, image_embedding_size=(e, e))
        return jnp.sum(sparse.astype(jnp.float32)) + jnp.sum(dense.astype(jnp.float32))

    out["prompt_encode_fwd_ms"] = timeit(prompts, points, labels, mask_input, has_mask)

    # two-way transformer only (training-shape tokens)
    sparse, dense = pe.encode_prompts(
        pp, points, labels, mask_input, has_mask,
        input_image_size=(cfg.img_size,) * 2, image_embedding_size=(e, e))
    image_pe = pe.get_dense_pe(pp, (e, e))
    output_tokens = jnp.concatenate(
        [dp["iou_token"]["w"], dp["mask_tokens"]["w"]], axis=0).astype(cfg.dtype)
    tokens = jnp.concatenate(
        [jnp.broadcast_to(output_tokens, (N,) + output_tokens.shape),
         sparse.astype(cfg.dtype)], axis=1)
    src = feats + dense.astype(cfg.dtype)

    @jax.jit
    def transformer(src, tokens):
        hs, src_out = md.apply_two_way_transformer(
            dp["transformer"], src, image_pe[None].astype(cfg.dtype), tokens)
        return jnp.sum(hs.astype(jnp.float32)) + jnp.sum(src_out.astype(jnp.float32))

    out["two_way_fwd_ms"] = timeit(transformer, src, tokens)

    # upscale + hypernet tail
    hs, src_out = md.apply_two_way_transformer(
        dp["transformer"], src, image_pe[None].astype(cfg.dtype), tokens)

    @jax.jit
    def tail(hs, src_out):
        mask_tokens_out = hs[:, 1:1 + md.NUM_MASK_TOKENS]
        src_img = src_out.reshape(N, e, e, -1)
        up = cm.conv_transpose2d(dp["upscale_conv1"], src_img, stride=2)
        up = cm.gelu(cm.layer_norm_2d(dp["upscale_ln"], up))
        up = cm.gelu(cm.conv_transpose2d(dp["upscale_conv2"], up, stride=2))
        hyper_in = jnp.stack(
            [cm.mlp(dp["hyper_mlps"][i], mask_tokens_out[:, i])
             for i in range(md.NUM_MASK_TOKENS)], axis=1)
        masks = jnp.einsum("bnc,bhwc->bnhw", hyper_in, up,
                           preferred_element_type=jnp.float32)
        return jnp.sum(masks)

    out["upscale_tail_fwd_ms"] = timeit(tail, hs, src_out)

    # fwd+bwd of the full decode (what each corrective round pays in backward)
    @jax.jit
    def full_grad(feats, points, labels, mask_input, has_mask):
        def loss(prm):
            low, iou = Sam(cfg, prm).decode_masks(
                prm, feats, points, labels, mask_input, has_mask)
            return jnp.sum(low.astype(jnp.float32) ** 2) + jnp.sum(iou ** 2)
        l, g = jax.value_and_grad(loss)(params)
        return l + jax.tree.reduce(
            lambda a, b: a + b, jax.tree.map(lambda x: jnp.sum(jnp.abs(x.astype(jnp.float32))), g))

    out["decode_full_fwdbwd_ms"] = timeit(full_grad, feats, points, labels, mask_input, has_mask)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
