"""f2nerf_tpu — a TPU-native differentiable NeRF framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
SakodaShintaro/f2-nerf (an Instant-NGP-style LibTorch/CUDA NeRF trainer,
renderer and pose localizer): anchored multi-level hash-grid fields,
stratified ray sampling with transmittance-based early termination,
spherical-harmonics shading, alpha-composited volume rendering, and
particle-search + differentiable camera-pose optimization.

Design stance (see SURVEY.md §7): instead of the reference's ragged
CSR sample layout + five CUDA custom-op families, we keep a dense
``[n_rays, n_samples]`` layout with a validity mask so the whole
compositing chain is fused by XLA, and implement the hash-grid
encode (the one true hot op) both as pure-jnp (correctness oracle)
and as a Pallas TPU kernel. Multi-chip scaling uses a
``jax.sharding.Mesh`` with rays sharded on a ``data`` axis and
parameters replicated; XLA inserts the gradient all-reduce.
"""

__version__ = "0.1.0"

from f2nerf_tpu.core.config import Config, ModelConfig, TrainConfig  # noqa: F401
