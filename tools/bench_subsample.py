"""Stride-2 image subsampling: what is the fastest TPU formulation?

The round-3 source-attributed trace (tools/trace_by_source.py) shows
plain ``x[::2, ::2]`` strided slices costing ~4 ms/frame across the ICP
model pyramid (icp.py:196), the live-side stride (icp.py:721-723) and
the integrate mip build (sparse.py:114) -- ~1.5 GB/s effective, 500x
off HBM roofline.  Column striding crosses lanes in the T(8,128)
layout, and XLA lowers it as a pathological strided DMA.

Candidates, all bit-exact (pure selection):
  1. x[::2, ::2]                       (baseline)
  2. x[::2].reshape(h2, w2, 2)[:, :, 0]  (row stride + minor-dim split)
  3. reshape(h2, 2, w2, 2)[:, 0, :, 0]   (all-reshape)
  4. Pallas VMEM kernel (in-kernel reshape+slice)
  5. one-hot column matmul (bf16 roundtrip -- NOT exact for f32; listed
     for rate context only)

Run: python tools/bench_subsample.py
"""
import os
import sys

sys.path.insert(0, ".")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "_proto"))
from vulcan_tpu.utils.runtime import setup_cache

setup_cache()

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from bench_patch_gather import run_case  # noqa: E402


def main():
    rng = np.random.default_rng(3)
    H, W = 480, 640
    K = 16
    x0 = jnp.asarray(rng.integers(0, 1 << 30, (H, W)), jnp.int32)

    def mk(fn):
        def chain(x):
            def body(i, x):
                s = fn(x)
                # feed back so nothing is elided; tile back up
                return x + jnp.tile(s, (2, 2)) + i
            return jax.lax.fori_loop(0, K, body, x)
        return chain

    def s_stride(x):
        return x[::2, ::2]

    def s_rowsplit(x):
        h, w = x.shape
        return x[::2].reshape(h // 2, w // 2, 2)[:, :, 0]

    def s_allreshape(x):
        h, w = x.shape
        return x.reshape(h // 2, 2, w // 2, 2)[:, 0, :, 0]

    def s_pallas(x):
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        h, w = x.shape

        def kernel(x_ref, o_ref):
            o_ref[:] = x_ref[:].reshape(h // 2, 2, w // 2, 2)[:, 0, :, 0]

        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((h // 2, w // 2), x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    for tag, fn in (
        ("x[::2, ::2] strided slice", s_stride),
        ("row-stride + minor split", s_rowsplit),
        ("all-reshape + slice", s_allreshape),
        ("pallas VMEM kernel", s_pallas),
    ):
        try:
            # correctness
            ref = np.asarray(x0)[::2, ::2]
            got = np.asarray(jax.jit(fn)(x0))
            assert (got == ref).all(), f"{tag} WRONG"
            ms = run_case(f"{tag} (480x640 int32)", mk(fn), x0)
            n = K * (H // 2) * (W // 2) * 4
            print(f"    -> {n / max(ms, 1e-9) * 1e3 / 1e9:.2f} GB/s out")
        except Exception as e:  # noqa: BLE001
            print(f"{tag}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
