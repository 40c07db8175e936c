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


def apply_platform_env():
    """Honor the JAX_PLATFORMS env var despite plugin pre-configuration.

    On this image a TPU plugin pre-sets `jax_platforms=axon,cpu`, which makes
    jax silently ignore the JAX_PLATFORMS environment variable. Entry points
    call this before any backend query so `JAX_PLATFORMS=cpu python train.py`
    behaves as documented.
    """
    import logging
    import os

    val = os.environ.get("JAX_PLATFORMS")
    if not val:
        return
    try:
        import jax

        jax.config.update("jax_platforms", val)
    except Exception as e:  # pragma: no cover
        logging.warning("could not apply JAX_PLATFORMS=%s: %s", val, e)


def enable_compilation_cache(cache_dir=None):
    """Point XLA at an on-disk executable cache (opt out: ONDT_NO_XLA_CACHE).

    TPU compiles of the full train step take minutes; caching serialized
    executables makes every re-run of train/eval/bench after the first start
    in seconds. Called explicitly by the CLI/driver entry points (train.py,
    bench.py, eval.py, __graft_entry__.py, tests/conftest.py) — importing the
    package has no jax-config side effects.

    Cache location: `cache_dir` arg > ONDT_XLA_CACHE_DIR env > `.xla_cache`
    at the repo root for an in-tree checkout > ~/.cache/ondt-xla otherwise.
    """
    import logging
    import os

    if os.environ.get("ONDT_NO_XLA_CACHE"):
        return
    try:
        import jax

        if cache_dir is None:
            cache_dir = os.environ.get("ONDT_XLA_CACHE_DIR")
        if cache_dir is None:
            pkg_parent = os.path.dirname(
                os.path.dirname(os.path.abspath(__file__))
            )
            if os.path.isdir(os.path.join(pkg_parent, ".git")):
                cache_dir = os.path.join(pkg_parent, ".xla_cache")
            else:
                cache_dir = os.path.expanduser("~/.cache/ondt-xla")
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # pragma: no cover - cache is best-effort
        logging.warning("XLA compilation cache disabled: %s", e)
