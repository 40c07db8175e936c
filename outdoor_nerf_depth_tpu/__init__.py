"""outdoor_nerf_depth_tpu: a TPU-native outdoor-NeRF-with-depth-priors framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
cwchenwang/outdoor-nerf-depth (ACM MM 2023, "Digging into Depth Priors for
Outdoor Neural Radiance Fields"): differentiable volume rendering of unbounded
driving scenes with three interchangeable scene-field plugins (inverted-sphere
fg/bg MLPs, cone-tracing proposal MLPs with scene contraction, and hash-grid
fields with occupancy skipping), an end-to-end differentiable depth-supervision
path, and data-parallel training over `jax.sharding.Mesh` device meshes.

Layout:
  ops/       pure array math: step functions, coordinate warps, volume rendering
  models/    scene-field plugins sharing one renderer interface
  data/      COLMAP ingestion, ray casting, host-sharded batching
  train/     losses, metrics, train-step factory, checkpointing
  parallel/  mesh construction and sharding specs
  utils/     image helpers and visualization
"""

__version__ = "0.1.0"
