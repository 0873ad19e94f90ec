"""micro_sam_tpu — a TPU-native (JAX/XLA/Pallas) framework for Segment Anything in Microscopy.

Built from scratch with the capabilities of computational-cell-analytics/micro-sam
(see SURVEY.md for the blueprint). The compute core is JAX: jit-compiled SAM
encoders (ViT-T/B/L/H) with Pallas attention kernels, a low-latency jitted
prompt-decode path, vmapped automatic mask generation, and pjit/mesh sharding
for tiled embedding precompute. Host-side postprocessing (connected components,
watershed, RLE, multicut) is backed by a native C++ library with numpy fallbacks.
"""

__version__ = "0.1.0"


def _setup_compilation_cache():
    """Enable jax's persistent compilation cache by default (first TPU compile
    of the ViT encoder takes tens of seconds; the cache makes every subsequent
    process start instantly). Opt out with MICROSAM_NO_JAX_CACHE=1; an
    explicitly configured JAX_COMPILATION_CACHE_DIR wins."""
    import os
    if os.environ.get("MICROSAM_NO_JAX_CACHE"):
        return
    try:
        import jax
        if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
            return  # user-configured
        cache_dir = os.path.join(
            os.environ.get("MICROSAM_CACHEDIR")
            or os.path.join(os.path.expanduser("~"), ".cache", "micro_sam_tpu"),
            "jax_cache",
        )
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_setup_compilation_cache()
