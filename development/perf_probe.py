"""One-session TPU perf probe: encoder batch scaling + device-RLE transfer.

Run on the real chip. Uses the persistent compile cache for speed; any kernel
edits must separately pass development/cold_compile_check.py.
"""
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
    cfg = get_config("vit_b", compute_dtype="bfloat16")
    params = init_sam_params(jax.random.PRNGKey(0), cfg)
    sam = Sam(cfg, params)

    out = {}
    for batch in (8, 16):
        @jax.jit
        def encode(params, pixels):
            f = sam.encode_image(params, preprocess(pixels, cfg.img_size))
            return jnp.sum(f.astype(jnp.float32))

        x = jnp.asarray(np.random.rand(batch, 1024, 1024, 3).astype(np.float32) * 255)
        float(encode(params, x))  # compile+warm
        n_iter = 10
        t0 = time.perf_counter()
        for _ in range(n_iter):
            c = encode(params, x)
        float(c)
        dt = time.perf_counter() - t0
        out[f"tiles_per_s_b{batch}"] = round(n_iter * batch / dt, 2)
        out[f"ms_per_batch_b{batch}"] = round(dt / n_iter * 1e3, 1)

    # ---- device RLE: transitions + capped nonzero vs packed-bitstream ----
    # mask batch like the AMG inner loop: (192, 1024, 1024) bool
    H = W = 1024
    n_masks = 192
    rng = np.random.RandomState(0)
    masks_np = np.zeros((n_masks, H, W), bool)
    for i in range(n_masks):
        cy, cx = rng.randint(200, 800, 2)
        r = rng.randint(40, 200)
        yy, xx = np.ogrid[:H, :W]
        masks_np[i] = (yy - cy) ** 2 + (xx - cx) ** 2 <= r ** 2
    masks = jnp.asarray(masks_np)

    CAP = 4096  # max runs per mask (fallback to packed path above this)

    @jax.jit
    def device_rle(masks):
        # Fortran-order flatten (column-major) to match the RLE convention
        flat = masks.transpose(0, 2, 1).reshape(n_masks, H * W)
        prev = jnp.concatenate(
            [jnp.zeros((n_masks, 1), flat.dtype), flat[:, :-1]], axis=1)
        trans = flat != prev
        n_runs = trans.sum(axis=1)
        idx = jax.vmap(
            lambda t: jnp.nonzero(t, size=CAP, fill_value=H * W)[0])(trans)
        return idx.astype(jnp.int32), n_runs.astype(jnp.int32)

    @jax.jit
    def device_pack(masks):
        t = masks.transpose(0, 2, 1)
        return jnp.packbits(t.reshape(n_masks, W, H // 8 * 8).reshape(n_masks, -1))

    idx, n_runs = device_rle(masks)
    np.asarray(idx)
    packed = device_pack(masks)
    np.asarray(packed)

    t0 = time.perf_counter()
    for _ in range(5):
        idx, n_runs = device_rle(masks)
        a = np.asarray(idx); b = np.asarray(n_runs)
    out["device_rle_ms"] = round((time.perf_counter() - t0) / 5 * 1e3, 1)
    out["rle_transfer_mb"] = round(a.nbytes / 1e6, 2)
    out["max_runs"] = int(b.max())

    t0 = time.perf_counter()
    for _ in range(5):
        packed = device_pack(masks)
        p = np.asarray(packed)
    out["packed_ms"] = round((time.perf_counter() - t0) / 5 * 1e3, 1)
    out["packed_transfer_mb"] = round(p.nbytes / 1e6, 2)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
