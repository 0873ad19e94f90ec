"""A/B the attention-only kernel split (MLP through XLA) for vit_l / vit_h.

Usage: python development/ab_attn_only.py <model> <window01> <global01> [batch]
Prints one JSON line. Run each config in its OWN process: resident step
executables accumulate on the 16G chip otherwise.
"""
import json
import os
import sys
import time

import numpy as np


def main():
    model_type = sys.argv[1]
    os.environ["MSAM_TPU_WINDOW_ATTN_ONLY"] = sys.argv[2]
    os.environ["MSAM_TPU_GLOBAL_ATTN_ONLY"] = sys.argv[3]
    batch = int(sys.argv[4]) if len(sys.argv) > 4 else 4

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from micro_sam_tpu.models.build_sam import get_config
    from micro_sam_tpu.models.sam import init_sam_params, Sam, preprocess

    assert jax.devices()[0].platform != "cpu"
    cfg = get_config(model_type, compute_dtype="bfloat16")
    params = init_sam_params(jax.random.PRNGKey(0), cfg)
    sam = Sam(cfg, params)

    @jax.jit
    def encode(params, pixels):
        f = sam.encode_image(params, preprocess(pixels, cfg.img_size))
        return jnp.sum(f.astype(jnp.float32))

    x = jnp.asarray(np.random.rand(batch, 1024, 1024, 3).astype(np.float32) * 255)
    t0 = time.perf_counter()
    float(encode(params, x))
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        n_iter = 10
        t0 = time.perf_counter()
        for _ in range(n_iter):
            c = encode(params, x)
        float(c)
        best = min(best, (time.perf_counter() - t0) / n_iter)
    print(json.dumps({
        "model": model_type, "batch": batch,
        "window_attn_only": sys.argv[2], "global_attn_only": sys.argv[3],
        "tiles_per_s": round(batch / best, 2),
        "ms_per_batch": round(best * 1e3, 1),
        "compile_s": round(compile_s, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
