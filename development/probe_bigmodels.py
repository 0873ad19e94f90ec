"""Per-model encoder A/B probe on the chip: current kernels vs env-toggled
variants (fast gelu, window group). Prints one JSON line per model.

Usage: MSAM_TPU_FAST_GELU=0/1 [MSAM_TPU_WINDOW_GROUP=g] python
development/probe_bigmodels.py [vit_b vit_l vit_h]
Timings are min-of-3 of a 4-iteration loop (fenced by a checksum fetch).
"""
import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    assert jax.devices()[0].platform != "cpu"

    from micro_sam_tpu.models.build_sam import get_config
    from micro_sam_tpu.models.sam import init_sam_params, Sam, preprocess

    models = sys.argv[1:] or ["vit_b", "vit_l", "vit_h"]
    batches = {"vit_t": 8, "vit_b": 8, "vit_l": 4, "vit_h": 4}
    for model_type in models:
        batch = int(os.environ.get("MSAM_PROBE_BATCH", batches[model_type]))
        cfg = get_config(model_type, compute_dtype="bfloat16")
        params = init_sam_params(jax.random.PRNGKey(0), cfg)
        sam = Sam(cfg, params)

        @jax.jit
        def encode(params, pixels):
            f = sam.encode_image(params, preprocess(pixels, cfg.img_size))
            return jnp.sum(f.astype(jnp.float32))

        x = jnp.asarray(np.random.rand(batch, 1024, 1024, 3).astype(np.float32) * 255)
        float(encode(params, x))  # compile + warm
        best = float("inf")
        iters = 4
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                chk = encode(params, x)
            float(chk)
            best = min(best, time.perf_counter() - t0)
        print(json.dumps({
            "model": model_type, "batch": batch,
            "fast_gelu": os.environ.get("MSAM_TPU_FAST_GELU", "1"),
            "group": os.environ.get("MSAM_TPU_WINDOW_GROUP", "1"),
            "ms_per_batch": round(best / iters * 1e3, 2),
            "tiles_per_sec": round(iters * batch / best, 1),
        }))
        del params, sam


if __name__ == "__main__":
    main()
