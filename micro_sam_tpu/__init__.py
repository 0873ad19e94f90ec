"""micro_sam_tpu — a TPU-native (JAX/XLA/Pallas) framework for Segment Anything in Microscopy.

Built from scratch with the capabilities of computational-cell-analytics/micro-sam
(see SURVEY.md for the blueprint). The compute core is JAX: jit-compiled SAM
encoders (ViT-T/B/L/H) with Pallas attention kernels, a low-latency jitted
prompt-decode path, vmapped automatic mask generation, and pjit/mesh sharding
for tiled embedding precompute. Host-side postprocessing (connected components,
watershed, RLE, multicut) is backed by a native C++ library with numpy fallbacks.
"""

__version__ = "0.1.0"
