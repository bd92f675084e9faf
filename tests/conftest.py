"""Test configuration: run on CPU with 8 virtual devices.

Tests must be fast and deterministic; the TPU (one real chip over a tunnel,
139 s first Pallas compile) is reserved for bench.py.  Multi-chip sharding
tests use the 8 virtual CPU devices, mirroring how the driver validates
``dryrun_multichip``.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# CLI tests call utils.runtime.setup_cache(); DISABLE the persistent
# compilation cache for the test process (VULCAN_TPU_CACHE="" is the
# setup_cache off-switch).  This platform's patched cache machinery
# segfaulted deserializing its own freshly written CPU entries -- even
# with an isolated per-run cache dir and no concurrent writers (3x,
# round 3) -- and CPU compiles are cheap.
os.environ.setdefault("VULCAN_TPU_CACHE", "")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment exports JAX_PLATFORMS=axon (TPU tunnel) in a way that
# survives the env var above; override via config so tests really run on CPU.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled-executable state after each test module.

    The full-suite run segfaulted INSIDE XLA:CPU compilation (the
    platform patches jax's backend_compile_and_load) once enough
    executables had accumulated -- deterministically around the 70th
    test, while every per-file run passes.  Clearing jit caches between
    modules keeps the compiler state bounded; per-module recompiles are
    cheap on CPU."""
    yield
    import jax

    jax.clear_caches()
