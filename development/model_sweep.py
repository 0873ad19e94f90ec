"""Per-model encoder throughput sweep (vit_t / vit_b / vit_l / vit_h) on the
chip. Appends one JSON line per model."""
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from micro_sam_tpu.models.build_sam import get_config
    from micro_sam_tpu.models.sam import init_sam_params, Sam, preprocess

    assert jax.devices()[0].platform != "cpu"
    for model_type, batch in (("vit_t", 8), ("vit_b", 8), ("vit_l", 4), ("vit_h", 4)):
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
        n_iter = 10
        t0 = time.perf_counter()
        for _ in range(n_iter):
            c = encode(params, x)
        float(c)
        dt = time.perf_counter() - t0
        print(json.dumps({
            "model": model_type, "batch": batch,
            "tiles_per_s": round(n_iter * batch / dt, 2),
            "ms_per_tile": round(dt / n_iter / batch * 1e3, 2),
            "compile_s": round(compile_s, 1),
        }), flush=True)
        del params, sam, x


if __name__ == "__main__":
    main()
