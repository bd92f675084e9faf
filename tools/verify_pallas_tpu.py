"""Pin Pallas-vs-XLA kernel equality ON THE REAL TPU (VERDICT r3 item 6).

The ``interpret=True`` tests (tests/test_preprocess.py,
tests/test_sparse.py) prove the KERNEL BODIES match the XLA math, but
they run the bodies in the Pallas interpreter -- a Mosaic compile-flag
regression on the device itself would ship silently.  This tool runs the
two production Pallas stencils (25-tap bilateral depth filter, splat
hole-fill+smooth) compiled FOR the TPU against their XLA fallback math on
identical inputs and asserts closeness.  It is a recorded step of the
verify skill (.claude/skills/verify/SKILL.md); run it after touching
preprocess.py, splat.py, or upgrading jax.

Usage: python tools/verify_pallas_tpu.py       (needs the TPU; ~1-3 min)
"""
import sys

sys.path.insert(0, ".")
from vulcan_tpu.utils.runtime import setup_cache

setup_cache()

import jax
import jax.numpy as jnp
import numpy as np

from vulcan_tpu.config import Config
from vulcan_tpu.ops import preprocess, splat


def main():
    backend = jax.default_backend()
    if backend != "tpu":
        print(f"FAIL: need the TPU backend, got {backend}")
        return 1
    config = Config()
    rng = np.random.default_rng(11)
    h, w = 480, 640
    # Depth with structure: smooth ramp + a step edge + dropout holes +
    # sensor-scale noise (exercises the range kernel, the edge-preserving
    # path, and the invalid-pixel guard).
    depth = 1.5 + 0.5 * np.fromfunction(
        lambda y, x: np.sin(y / 37.0) + np.cos(x / 53.0), (h, w)
    )
    depth[:, w // 2 :] += 0.4
    depth += rng.normal(0.0, 0.004, (h, w))
    depth[rng.random((h, w)) < 0.03] = 0.0
    d = jnp.asarray(depth, jnp.float32)

    failures = 0

    # --- bilateral: Pallas on device vs XLA math on device ---
    out_p = np.asarray(
        jax.jit(lambda x: preprocess._bilateral_pallas(x, config))(d)
    )
    out_x = np.asarray(
        jax.jit(lambda x: preprocess._bilateral_math(x, config))(d)
    )
    err = np.max(np.abs(out_p - out_x))
    print(f"bilateral   max|pallas-xla| = {err:.3e}  (tol 1e-4)")
    failures += err > 1e-4

    # --- splat fill+smooth: Pallas on device vs XLA math on device ---
    # Input mimics a splat z-buffer: valid depths with scattered holes
    # (encoded 0) that the fill rounds diffuse into.
    zbuf = np.where(rng.random((h, w)) < 0.12, 0.0, depth)
    z = jnp.asarray(zbuf, jnp.float32)
    out_p = np.asarray(
        jax.jit(lambda x: splat._fill_smooth_pallas(x, config))(z)
    )
    out_x = np.asarray(
        jax.jit(lambda x: splat._fill_smooth_math(x, config))(z)
    )
    err = np.max(np.abs(out_p - out_x))
    print(f"fill+smooth max|pallas-xla| = {err:.3e}  (tol 1e-4)")
    failures += err > 1e-4

    if failures:
        print(f"FAIL: {failures} kernel(s) diverge on the TPU")
        return 1
    print("OK: Pallas kernels match XLA math on the real TPU")
    return 0


if __name__ == "__main__":
    sys.exit(main())
