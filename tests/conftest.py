"""Test configuration: run on CPU with 8 virtual devices.

Tests must be fast and deterministic; the TPU (one real chip over a tunnel,
139 s first Pallas compile) is reserved for bench.py.  Multi-chip sharding
tests use the 8 virtual CPU devices, mirroring how the driver validates
``dryrun_multichip``.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
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
