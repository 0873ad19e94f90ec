"""Isolate the train step's base cost (everything outside the corrective
rounds): encoder fwd+bwd at the step's shapes, feats repeat, optimizer update,
decoder sub-parts (twoway vs upscale deconvs). Complements
profile_train_step.py (which measures the full step and the round slope).

Usage: python development/probe_train_parts.py [batch] [n_objects] [patch]
"""
import json
import sys
import time

import numpy as np


def timeit(fn, iters=3):
    out = fn()
    float(np.asarray(out).ravel()[0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        float(np.asarray(out).ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1e3


def main():
    import jax
    import jax.numpy as jnp
    import optax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    assert jax.devices()[0].platform != "cpu"

    from micro_sam_tpu.models.build_sam import get_config
    from micro_sam_tpu.models.sam import init_sam_params, Sam
    from micro_sam_tpu.training.trainable_sam import TrainableSAM
    from micro_sam_tpu.training.util import value_and_grad_allow_int

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    O = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    S = int(sys.argv[3]) if len(sys.argv) > 3 else 512

    cfg = get_config("vit_b", compute_dtype="bfloat16")
    params = init_sam_params(jax.random.PRNGKey(0), cfg)
    model = TrainableSAM(Sam(cfg, params))
    rng = np.random.RandomState(0)
    results = {"batch": B, "objects": O, "patch": S}
    N = B * O
    e = cfg.embedding_size

    imgs = jnp.asarray(rng.rand(B, S, S, 3).astype(np.float32) * 255)

    # encoder fwd+bwd through the SAME entry the step uses, comparing
    # remat=True (per-block jax.checkpoint, unfused XLA blocks — the current
    # training path) with remat=False (fused Pallas forward whose custom_vjp
    # backward recomputes through the unfused composition anyway, so the
    # activation footprint is residual-inputs only in both cases)
    for remat in (True, False):
        @jax.jit
        def enc_fwd(params, images, remat=remat):
            f = model.sam.encode_image(params, model.preprocess(images),
                                       remat=remat)
            return jnp.sum(f.astype(jnp.float32))

        @jax.jit
        def enc_fwdbwd(params, images, remat=remat):
            def loss(p):
                f = model.sam.encode_image(p, model.preprocess(images),
                                           remat=remat)
                return jnp.sum(f.astype(jnp.float32))
            l, g = value_and_grad_allow_int(loss)(params)
            return l + jnp.sum(g["image_encoder"]["neck"]["conv1"]["w"].astype(jnp.float32))

        tag = "remat" if remat else "norem"
        results[f"encoder_fwd_{tag}_ms"] = round(
            timeit(lambda: enc_fwd(params, imgs)), 1)
        results[f"encoder_fwdbwd_{tag}_ms"] = round(
            timeit(lambda: enc_fwdbwd(params, imgs)), 1)

    # feats repeat (B -> N) as the step does it
    feats_b = jnp.asarray(rng.rand(B, e, e, 256).astype(np.float32), cfg.dtype)

    @jax.jit
    def rep(feats):
        return jnp.sum(jnp.repeat(feats, O, axis=0).astype(jnp.float32))

    results["feats_repeat_ms"] = round(timeit(lambda: rep(feats_b)), 1)

    # optimizer update at the step's param scale
    optimizer = optax.adamw(1e-5)
    opt_state = jax.jit(optimizer.init)(params)
    grads = jax.tree.map(jnp.zeros_like, params)

    @jax.jit
    def opt_step(params, opt_state, grads):
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return jnp.sum(params["image_encoder"]["neck"]["conv1"]["w"].astype(jnp.float32))

    results["optimizer_ms"] = round(timeit(lambda: opt_step(params, opt_state, grads)), 1)

    # decoder sub-parts at the step's prompt shapes
    feats = jnp.asarray(rng.rand(N, e, e, 256).astype(np.float32), cfg.dtype)
    cap = 1 + 2 * 8 + 1
    pts = jnp.asarray((rng.rand(N, cap, 2) * cfg.img_size).astype(np.float32))
    lbl = jnp.asarray(np.where(rng.rand(N, cap) < 0.5, 1, -1).astype(np.int32))
    mask_hw = e * 4
    mi = jnp.zeros((N, mask_hw, mask_hw, 1), jnp.float32)
    hm = jnp.zeros((N,), bool)

    from micro_sam_tpu.models import mask_decoder as md
    from micro_sam_tpu.models import prompt_encoder as pe

    @jax.jit
    def prompts_only(params):
        sparse, dense = pe.encode_prompts(
            params["prompt_encoder"], pts, lbl, mi, hm,
            (cfg.img_size, cfg.img_size), (e, e))
        return jnp.sum(sparse.astype(jnp.float32)) + jnp.sum(dense.astype(jnp.float32))

    try:
        results["prompt_encoder_ms"] = round(timeit(lambda: prompts_only(params)), 1)
    except Exception as ex:  # signature drift — skip, the decoder total matters
        results["prompt_encoder_ms"] = str(ex)[:80]

    @jax.jit
    def decode_full(params):
        low, iou = model.forward_decoder(params, feats, pts, lbl, mi, hm)
        return jnp.sum(iou.astype(jnp.float32)) + jnp.sum(low.astype(jnp.float32))

    results["decode_full_ms"] = round(timeit(lambda: decode_full(params)), 1)

    # decoder fwd+bwd (what one remat round pays in backward)
    @jax.jit
    def decode_fwdbwd(params):
        def loss(p):
            low, iou = model.forward_decoder(p, feats, pts, lbl, mi, hm)
            return jnp.sum(low.astype(jnp.float32)) + jnp.sum(iou.astype(jnp.float32))
        l, g = value_and_grad_allow_int(loss)(params)
        return l + jnp.sum(g["mask_decoder"]["iou_token"]["w"].astype(jnp.float32))

    results["decode_fwdbwd_ms"] = round(timeit(lambda: decode_fwdbwd(params)), 1)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
