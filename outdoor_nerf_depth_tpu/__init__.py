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


def _enable_persistent_compilation_cache():
    """Point XLA at an on-disk executable cache (opt out: ONDT_NO_XLA_CACHE).

    TPU compiles of the full train step take minutes; caching serialized
    executables makes every re-run of train/eval/bench after the first start
    in seconds. Safe to set lazily here: jax only reads these options at
    first compile, and a backend that doesn't support serialization simply
    ignores the cache.
    """
    import os

    if os.environ.get("ONDT_NO_XLA_CACHE"):
        return
    try:
        import jax

        cache_dir = os.environ.get(
            "ONDT_XLA_CACHE_DIR",
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".xla_cache"),
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_persistent_compilation_cache()
