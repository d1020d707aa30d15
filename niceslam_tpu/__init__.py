"""niceslam_tpu — a TPU-native dense neural-implicit SLAM engine.

A from-scratch JAX/XLA/Pallas re-design of the NICE-SLAM-class pipeline that the
reference C++/libtorch implementation (cjpurackal/nice-slam-cpp) specifies:
RGB-D ingest, gradient-based camera tracking against rendered depth/color,
hierarchical feature-grid mapping with tiny-MLP decoders, and per-ray
volumetric rendering — built TPU-first:

- all hot paths are jitted with static shapes (masking instead of gathers),
- grid interpolation / tiny-MLP / compositing run as fused XLA or Pallas
  kernels,
- multi-chip scaling uses a `jax.sharding.Mesh` with psum-reduced mapping
  gradients (no NCCL-style hand-written comms),
- state is an explicit immutable pytree (`MapState`), not shared mutable
  dictionaries.

Reference layer map: see SURVEY.md §1 (reference: src/main.cpp, src/Tracker.cpp,
src/Mapper.cpp, src/Renderer.cpp, src/models/*, include/torchlib/utils.h).
"""

__version__ = "0.1.0"
