"""In-context bisection of the REAL encoder program (round-5: attribute the
implied-vs-measured gap — stage probes say vit_l should run at 38.2 tiles/s,
the end-to-end program measures 32.9).

Times `apply_image_encoder` with the block list truncated to a prefix, for a
ladder of prefixes that isolates (a) patch+pos, (b) each window run,
(c) each global block, (d) the neck. All timings are whole real dispatches
(loop 8, fetch once) so per-dispatch tunnel cost is amortized equally.

Usage: python development/bisect_encoder.py [vit_l|vit_h|vit_b] [batch]
"""
import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from micro_sam_tpu.models.build_sam import get_config
    from micro_sam_tpu.models.sam import init_sam_params
    from micro_sam_tpu.models.image_encoder import apply_image_encoder

    model = sys.argv[1] if len(sys.argv) > 1 else "vit_l"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    cfg = get_config(model, compute_dtype="bfloat16")
    params = init_sam_params(jax.random.PRNGKey(0), cfg)
    enc = params["image_encoder"]
    glob = tuple(cfg.global_attn_indexes)
    depth = len(enc["blocks"])

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, 1024, 1024, 3), jnp.bfloat16)

    def encode_prefix(k, with_neck=True):
        """Encoder with only the first k blocks (and optionally no neck)."""
        sub = dict(enc, blocks=enc["blocks"][:k])
        if not with_neck:
            sub = {kk: vv for kk, vv in sub.items() if kk != "neck"}

        @jax.jit
        def run(sub, x):
            import micro_sam_tpu.models.image_encoder as ie
            if with_neck:
                out = apply_image_encoder(
                    sub, x, cfg.num_heads,
                    window_size=14,
                    global_attn_indexes=[g for g in glob if g < k])
            else:
                # inline: blocks only (copy of apply minus neck via monkey
                # config is messy; neckless is approximated by k blocks with
                # neck and subtracting the neck-only config instead)
                raise NotImplementedError
            return jnp.sum(out.astype(jnp.float32))
        return run, sub

    def timeit(k):
        run, sub = encode_prefix(k)
        float(run(sub, x))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(8):
                chk = run(sub, x)
            float(chk)
            best = min(best, (time.perf_counter() - t0) / 8)
        return best * 1e3

    # ladder: 0 blocks (patch+neck), then after each run boundary / global
    points = [0]
    for g in glob:
        if g < depth:
            points += [g, g + 1]  # before/after each global block
    points.append(depth)
    points = sorted(set(points))

    out = {"model": model, "batch": B}
    times = {}
    for k in points:
        times[k] = timeit(k)
        print(json.dumps({"prefix_blocks": k, "ms": round(times[k], 2)}),
              flush=True)

    # attribute
    attrib = {"patch_pos_neck_ms": round(times[0], 2)}
    prev = 0
    for g in glob:
        if g >= depth:
            continue
        nwin = g - prev
        run_ms = times[g] - times[prev]
        attrib[f"window_run_{prev}_{g}_ms"] = round(run_ms, 2)
        attrib[f"window_block_in_context_ms"] = round(run_ms / max(nwin, 1), 2)
        attrib[f"global_{g}_ms"] = round(times[g + 1] - times[g], 2)
        prev = g + 1
    attrib["total_ms"] = round(times[depth], 2)
    attrib["tiles_per_sec"] = round(B / times[depth] * 1e3, 1)
    out.update(attrib)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
