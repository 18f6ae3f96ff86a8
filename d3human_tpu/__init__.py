"""d3human_tpu — TPU-native dynamic disentangled digital human reconstruction.

A from-scratch JAX/XLA/Pallas framework with the capabilities of D3-Human
(USTC3DV/D3Human-code): given a monocular RGB video with per-frame SMPL-X
fits, normals and garment/body masks, it optimizes a hybrid implicit
representation (SDF + mSDF "G-Shell" field on a tetrahedral grid) by
differentiable rasterization, producing disentangled, animatable garment and
body meshes.

Design (TPU-first, not a port):
  * All per-iteration compute (field eval -> G-Shell marching tets ->
    rasterize -> shade -> losses -> grads -> optimizer) compiles into a
    single jitted XLA program with static shapes.
  * Dynamic mesh topology is handled with fixed-capacity buffers and
    ``jnp.nonzero(..., size=K)`` compaction over a *statically precomputed*
    tet-grid edge list (the grid topology never changes, only SDF signs do).
  * The differentiable rasterizer factors hard visibility (a z-buffer
    kernel, non-differentiable) from attribute interpolation (analytic
    perspective-correct barycentrics, recomputed in JAX => exact gradients)
    and silhouette antialiasing (edge-crossing blend with gradients to clip
    vertices).
  * Multi-chip scaling uses jax.sharding Mesh + shard_map: frame-parallel
    seq-stage optimization and replicated-gradient data parallelism.
"""

__version__ = "0.1.0"

from d3human_tpu.config import Config, load_config  # noqa: F401
