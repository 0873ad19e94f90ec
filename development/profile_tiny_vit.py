"""Per-stage timing of the TinyViT (vit_t) encoder on the current device.

Times each stage as its own jitted program (checksum-fenced through the axon
relay) and the whole encoder, so we can see where vit_t's batch-8 step goes.
Usage: python development/profile_tiny_vit.py [batch]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from micro_sam_tpu.models import tiny_vit as tv
from micro_sam_tpu.models import common as cm


def timed(fn, *args, n=20, label=""):
    jfn = jax.jit(fn)
    out = jfn(*args)
    float(out[1])  # fence warmup
    t0 = time.perf_counter()
    for _ in range(n):
        out = jfn(*args)
    float(out[1])
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{label:34s} {dt:8.3f} ms")
    return out[0], dt


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    dtype = jnp.bfloat16 if jax.devices()[0].platform != "cpu" else jnp.float32
    params = tv.init_tiny_vit(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.rand(batch, 1024, 1024, 3), dtype)

    total = 0.0

    def chk(y):
        return y, jnp.sum(y.astype(jnp.float32))

    def patch(x):
        y = cm.gelu(tv._conv_bn(params["patch_embed"]["conv1"], x, stride=2, padding=1))
        return chk(tv._conv_bn(params["patch_embed"]["conv2"], y, stride=2, padding=1))

    x, dt = timed(patch, x, label="patch_embed (512->256, 64ch)")
    total += dt

    def stage0(x):
        for bp in params["stage0"]:
            x = tv._mbconv(bp, x)
        return chk(x)

    x, dt = timed(stage0, x, label="stage0 2xMBConv (256^2, 64ch)")
    total += dt

    def merge0(x):
        return chk(tv._patch_merging(params["merge0"], x, stride=2))

    x, dt = timed(merge0, x, label="merge0 (->128^2, 128ch)")
    total += dt

    def stage1(x):
        for bp in params["stage1"]:
            x = tv._tiny_block(bp, x, tv.NUM_HEADS[1], tv.WINDOW_SIZES[1])
        return chk(x)

    x, dt = timed(stage1, x, label="stage1 2 blocks w7 (128^2, 128ch)")
    total += dt

    def merge1(x):
        return chk(tv._patch_merging(params["merge1"], x, stride=2))

    x, dt = timed(merge1, x, label="merge1 (->64^2, 160ch)")
    total += dt

    def stage2(x):
        for bp in params["stage2"]:
            x = tv._tiny_block(bp, x, tv.NUM_HEADS[2], tv.WINDOW_SIZES[2])
        return chk(x)

    x, dt = timed(stage2, x, label="stage2 6 blocks w14 (64^2, 160ch)")
    total += dt

    def merge2(x):
        return chk(tv._patch_merging(params["merge2"], x, stride=1))

    x, dt = timed(merge2, x, label="merge2 (64^2, 320ch)")
    total += dt

    def stage3(x):
        for bp in params["stage3"]:
            x = tv._tiny_block(bp, x, tv.NUM_HEADS[3], tv.WINDOW_SIZES[3])
        return chk(x)

    x, dt = timed(stage3, x, label="stage3 2 blocks w7 (64^2, 320ch)")
    total += dt

    def neck(x):
        y = cm.conv2d(params["neck"]["conv1"], x, stride=1, padding="VALID")
        y = cm.layer_norm_2d(params["neck"]["ln1"], y)
        y = cm.conv2d(params["neck"]["conv2"], y, stride=1, padding=1)
        return chk(cm.layer_norm_2d(params["neck"]["ln2"], y))

    _, dt = timed(neck, x, label="neck (64^2, 320->256)")
    total += dt

    print(f"{'sum of stages':34s} {total:8.3f} ms")

    xin = jnp.asarray(np.random.rand(batch, 1024, 1024, 3), dtype)

    def full(x):
        return chk(tv.apply_tiny_vit(params, x))

    _, dt = timed(full, xin, label="full encoder")
    print(f"=> {batch / (dt / 1e3):.1f} tiles/s at batch {batch}")


if __name__ == "__main__":
    main()
