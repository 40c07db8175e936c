"""Test harness: force CPU with a virtual 8-device mesh before jax init.

Mirrors the reference's CPU-only unit-test strategy
(`/root/reference/nerf-methods/mipnerf360/scripts/run_all_unit_tests.sh`) but
adds what the reference never had: multi-device tests, faked via
`--xla_force_host_platform_device_count` so sharding paths compile and run
without TPU hardware.

NOTE: on this image a TPU plugin pre-configures `jax_platforms`, so the
`JAX_PLATFORMS` env var alone is silently ignored — `jax.config.update`
after import is required to actually select CPU.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (must import after the env mutation above)

jax.config.update("jax_platforms", "cpu")

import outdoor_nerf_depth_tpu as _ondt  # noqa: E402

_ondt.enable_compilation_cache()


import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _reset_hashgrid_grad_mesh():
    """The train-step factories bind a module-global mesh for the
    hash-table gradient's shard-local path (ops/hashgrid.set_grad_mesh);
    sharded-step tests must not leak it into later single-device encoder
    tests (the full-suite-only failures of r5)."""
    yield
    from outdoor_nerf_depth_tpu.ops import hashgrid

    hashgrid.set_grad_mesh(None)
