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


# --- quick suite -----------------------------------------------------------
# ``pytest -m quick`` runs one representative test per subsystem (~3 min on
# this 1-core box) so iteration does not pay the ~29-min full-suite tax
# (round-4 VERDICT weak 5).  Selected centrally here instead of scattering
# decorators: the list IS the definition of "one per subsystem".
_QUICK = {
    "test_se3.py::test_se3_exp_log_roundtrip",
    "test_camera.py::test_project_unproject_roundtrip",
    "test_hashing.py::test_insert_then_lookup",
    "test_preprocess.py::test_bilateral_matches_cpu_reference",
    "test_dense.py::test_single_frame_integration_matches_analytic_sdf",
    "test_sparse.py::test_sparse_matches_analytic_sdf",
    "test_sparse.py::test_onehot_patch_gather_matches_flat_exactly",
    "test_icp.py::test_icp_recovers_small_perturbation",
    "test_mcubes.py::test_sphere_mesh_geometry_and_color",
    "test_pipeline.py::test_step_seq_matches_step",
    "test_light.py::test_sh_estimation_recovers_coeffs",
    "test_parallel.py::test_dryrun_multichip_2",
    "test_cli.py::test_cli_requires_a_source",
    "test_stress.py::test_alloc_batch_overflow_counted",
    "test_utils.py::test_horn_align_recovers_rigid_transform",
    "test_native.py::test_native_ply_roundtrip",
}


def pytest_collection_modifyitems(items):
    for item in items:
        rel = "::".join(item.nodeid.split("/")[-1].split("::")[:2])
        if rel.split("[")[0] in _QUICK:
            item.add_marker(pytest.mark.quick)
