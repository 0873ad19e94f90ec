"""Test configuration: force local CPU with 8 virtual devices.

The container pins JAX to the axon TPU tunnel via env; tests must run on the
host CPU (fast compiles, virtual multi-device mesh for sharding tests). These
env vars must be set before jax initializes its backends.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

# The jaxtyping pytest plugin imports jax before this conftest runs, so the
# env var alone is too late — force the platform through the config API too
# (backends are not initialized yet at collection time).
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def tiny_sam():
    """A tiny random-init SAM (fast CPU forward) shared across tests."""
    import jax
    from micro_sam_tpu.models.sam import SamConfig, init_sam_params, Sam

    cfg = SamConfig(
        model_type="vit_b", embed_dim=64, depth=2, num_heads=2,
        global_attn_indexes=(1,), img_size=256,
    )
    params = init_sam_params(jax.random.PRNGKey(0), cfg)
    return Sam(cfg, params)


@pytest.fixture()
def tiny_predictor(tiny_sam):
    from micro_sam_tpu.predictor import SamPredictor
    return SamPredictor(tiny_sam)


@pytest.fixture(scope="session")
def synthetic_image():
    """Deterministic image with disk objects (reference-style synthetic fixture)."""
    from micro_sam_tpu.sample_data import synthetic_data
    image, segmentation = synthetic_data(shape=(256, 256), seed=42)
    return image, segmentation
