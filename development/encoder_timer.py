"""Time the full encoder end-to-end under the CURRENT env knobs.

Usage: [env knobs] python development/encoder_timer.py [vit_l] [batch] [iters]
Prints one JSON line with ms/batch and tiles/s.
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
    from micro_sam_tpu.models.sam import init_sam_params, Sam, preprocess

    model = sys.argv[1] if len(sys.argv) > 1 else "vit_l"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    cfg = get_config(model, compute_dtype="bfloat16")
    params = init_sam_params(jax.random.PRNGKey(0), cfg)
    sam = Sam(cfg, params)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, 1024, 1024, 3) * 255, jnp.float32)

    @jax.jit
    def encode(params, px):
        f = sam.encode_image(params, preprocess(px, cfg.img_size))
        return jnp.sum(f.astype(jnp.float32))

    float(encode(params, x))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            chk = encode(params, x)
        float(chk)
        best = min(best, (time.perf_counter() - t0) / iters)
    print(json.dumps({
        "model": model, "batch": B, "ms": round(best * 1e3, 2),
        "tiles_per_sec": round(B / best, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
