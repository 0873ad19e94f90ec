"""Per-stage breakdown of the SamTrainer one-jit training step on the chip.

VERDICT r3 weak#3: the batch-8 step was 2901 ms, of which encoder fwd+bwd is
~615 ms — the rest lives in the 8 corrective decode/loss rounds, unprofiled.
This isolates the marginal cost of one corrective round and its components:

  full(n_sub)      — the real train step at n_sub corrective rounds; the
                     slope over n_sub is the marginal round cost (fwd+bwd,
                     remat included, exactly as production runs it)
  decode_fwd       — one decoder forward at the step's prompt shapes
  upscale_loss     — mask upsample + dice/iou loss chain, fwd only
  gumbel           — the two corrective-point Gumbel picks

Usage: python development/profile_train_step.py [batch] [n_objects] [patch]
Timings are min-of-3 (fenced by fetching a scalar).
"""
import json
import os
import sys
import time

import numpy as np


def timeit(fn, *args, iters=3):
    out = fn(*args)
    float(np.asarray(out).ravel()[0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        float(np.asarray(out).ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1e3


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    O = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    S = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    results = {"batch": B, "objects": O, "patch": S}

    # full-step configs run in SUBPROCESSES, dispatched BEFORE the parent
    # touches the TPU: a resident step executable + its loaded-program
    # footprint pushed later configs over the 16G chip in-process, and even
    # the parent's idle client reservation collided with the child's peak.
    single = os.environ.get("MSAM_PROF_NSUB")
    if single is None:
        import subprocess
        for n_sub in (1, 2, 8):
            env = dict(os.environ, MSAM_PROF_NSUB=str(n_sub))
            proc = subprocess.run(
                [sys.executable, __file__, str(B), str(O), str(S)],
                env=env, capture_output=True, text=True)
            if proc.returncode != 0:
                sys.stderr.write(proc.stderr[-4000:])
                raise SystemExit(f"n_sub={n_sub} subprocess failed")
            results.update(json.loads(proc.stdout.strip().splitlines()[-1]))

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    assert jax.devices()[0].platform != "cpu"

    from micro_sam_tpu.models.build_sam import get_config
    from micro_sam_tpu.models.sam import init_sam_params, Sam
    from micro_sam_tpu.training.trainable_sam import TrainableSAM
    from micro_sam_tpu.training.sam_trainer import SamTrainer, _gumbel_pick

    cfg = get_config("vit_b", compute_dtype="bfloat16")
    params = init_sam_params(jax.random.PRNGKey(0), cfg)
    # the train step donates params: every consumer below gets a FRESH device
    # copy so one trainer's donation can't delete another's buffers. The
    # init-time device copy is dropped immediately — a full-step config needs
    # every spare byte of the 16G chip (an extra resident param set tipped
    # the batch-8 n_sub=2 config over).
    params_host = jax.tree.map(np.asarray, params)
    del params
    fresh = lambda: jax.tree.map(jnp.asarray, params_host)

    rng = np.random.RandomState(0)
    imgs = (rng.rand(B, S, S, 3) * 255).astype(np.float32)
    lbls = np.zeros((B, S, S), np.int64)
    for b in range(B):
        for i in range(O):
            y, x = rng.randint(0, S - 40, 2)
            lbls[b, y:y + 32, x:x + 32] = i + 1

    if single is not None:
        n_sub = int(single)
        trainer = SamTrainer(
            name=f"prof{n_sub}", train_loader=[(imgs, lbls)],
            val_loader=[(imgs, lbls)],
            model=TrainableSAM(Sam(cfg, fresh())),
            n_sub_iteration=n_sub, n_objects_per_batch=O,
            save_root="/tmp/prof_ckpt",
        )
        batch = trainer._prepare_batch(imgs, lbls, True, False, 1, 0)
        images_j, gt, obj_valid, points0, labels0, boxes0 = batch
        step = trainer._build_step(True, False, True, tuple(gt.shape[2:]), True)
        key = trainer._key
        # the step donates (params, opt_state): thread the NEW state through so
        # no call touches a donated (deleted) buffer
        state = {"p": trainer.model.params, "o": trainer.opt_state}

        def run():
            p2, o2, (loss, miou) = step(state["p"], state["o"], key, images_j,
                                        gt, obj_valid, points0, labels0, boxes0)
            state["p"], state["o"] = p2, o2
            return loss

        print(json.dumps({f"full_step_ms_nsub{n_sub}": round(timeit(run), 1)}))
        return

    n1, n8 = results["full_step_ms_nsub1"], results["full_step_ms_nsub8"]
    results["marginal_round_ms"] = round((n8 - n1) / 7, 1)

    # isolated stages at the step's shapes (parent process only — the full
    # steps above ran in subprocesses)
    model = TrainableSAM(Sam(cfg, fresh()))
    N = B * O
    e = cfg.embedding_size
    feats = jnp.asarray(rng.rand(N, e, e, 256).astype(np.float32), cfg.dtype)
    cap = 1 + 2 * 8 + 1
    pts = jnp.asarray((rng.rand(N, cap, 2) * cfg.img_size).astype(np.float32))
    lbl = jnp.asarray(np.where(rng.rand(N, cap) < 0.5, 1, -1).astype(np.int32))
    mask_hw = e * 4
    mi = jnp.zeros((N, mask_hw, mask_hw, 1), jnp.float32)
    hm = jnp.zeros((N,), bool)

    @jax.jit
    def decode_fwd(params, feats, pts, lbl, mi, hm):
        low, iou = model.forward_decoder(params, feats, pts, lbl, mi, hm)
        return jnp.sum(iou.astype(jnp.float32))

    dec_params = fresh()
    results["decode_fwd_ms"] = round(
        timeit(lambda: decode_fwd(dec_params, feats, pts, lbl, mi, hm)), 1)

    low_res = jnp.asarray(rng.randn(N, 4, mask_hw, mask_hw).astype(np.float32), cfg.dtype)
    gt_flat = jnp.asarray((rng.rand(N, S, S) > 0.9).astype(np.float32), cfg.dtype)

    @jax.jit
    def upscale_loss(low_res, gt_flat):
        up = model.upscale_masks(low_res, (S, S))
        pred = jax.nn.sigmoid(up)
        num = 2 * jnp.sum(pred * gt_flat[:, None], axis=(-2, -1), dtype=jnp.float32)
        den = jnp.sum(pred * pred, axis=(-2, -1), dtype=jnp.float32) + \
            jnp.sum(gt_flat * gt_flat, axis=(-2, -1), dtype=jnp.float32)[:, None]
        return jnp.sum(1 - num / (den + 1e-7))

    results["upscale_loss_fwd_ms"] = round(
        timeit(lambda: upscale_loss(low_res, gt_flat)), 1)

    region = jnp.asarray(rng.rand(N, S, S) > 0.9)
    key2 = jax.random.key(0, impl="rbg")

    @jax.jit
    def gumbel2(key, region):
        k1, k2 = jax.random.split(key)
        a, _ = _gumbel_pick(k1, region)
        b, _ = _gumbel_pick(k2, region)
        return jnp.sum(a + b)

    results["gumbel_two_picks_ms"] = round(
        timeit(lambda: gumbel2(key2, region)), 1)

    results["images_per_sec_nsub8"] = round(B / (n8 / 1e3), 2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
