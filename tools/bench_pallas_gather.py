"""Measure tpu.dynamic_gather throughput inside a Pallas kernel.

The only per-lane random access Mosaic supports is 2D take_along_axis
(idx same shape as table): out[i,j] = table[idx[i,j], j].  If this runs at
vector rate on VMEM it is ~100x faster than XLA's HBM gather lowering and
becomes the core primitive for a Pallas raycast.
"""
import glob
import os
import sys
from collections import defaultdict

sys.path.insert(0, ".")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "_proto"))
from vulcan_tpu.utils.runtime import setup_cache

setup_cache()

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def device_totals(outdir):
    import xplane_pb2

    paths = glob.glob(os.path.join(outdir, "**", "*.xplane.pb"), recursive=True)
    paths.sort(key=os.path.getmtime)
    with open(paths[-1], "rb") as f:
        xspace = xplane_pb2.XSpace.FromString(f.read())
    totals = defaultdict(float)
    for plane in xspace.planes:
        if "TPU" not in plane.name:
            continue
        for line in plane.lines:
            if "XLA Ops" not in line.name:
                continue
            for ev in line.events:
                name = plane.event_metadata[ev.metadata_id].name
                totals[name] += ev.duration_ps / 1e9
    return totals


CASE = [0]


def run(tag, fn, *args):
    CASE[0] += 1
    outdir = f"/tmp/ptrace/c{CASE[0]}"
    os.makedirs(outdir, exist_ok=True)
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    with jax.profiler.trace(outdir):
        out = f(*args)
        jax.block_until_ready(out)
    totals = device_totals(outdir)
    dev_ms = sum(totals.values())
    top = max(totals.items(), key=lambda kv: kv[1]) if totals else ("-", 0)
    print(f"{tag:46s} device {dev_ms:9.3f} ms  (top: {top[0][:40]} {top[1]:.3f})")
    return dev_ms


def main():
    T, L = 2048, 128   # table rows x lanes
    K = 32             # chained rounds inside the kernel
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((T, L)), jnp.float32)
    idx0 = jnp.asarray(rng.integers(0, T, (T, L)), jnp.int32)

    def kernel(table_ref, idx_ref, out_ref):
        def body(k, carry):
            idx, acc = carry
            v = jnp.take_along_axis(table_ref[:], idx, axis=0)
            idx = jnp.abs(idx + v.astype(jnp.int32) + k) % T
            return idx, acc + v

        _, acc = jax.lax.fori_loop(
            0, K, body, (idx_ref[:], jnp.zeros((T, L), jnp.float32))
        )
        out_ref[:] = acc

    def run_pallas(table, idx0):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((T, L), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(table, idx0)

    n = T * L * K
    ms = run("pallas take_along_axis f32 (2048x128) x32", run_pallas, table, idx0)
    print(f"    -> {n/max(ms,1e-9)*1e3/1e6:.0f} M lookups/s ({n/1e6:.1f}M total)")

    # int32 variant (march texture dtype)
    table_i = jnp.asarray(rng.integers(-128, 127, (T, L)), jnp.int32)

    def kernel_i(table_ref, idx_ref, out_ref):
        def body(k, carry):
            idx, acc = carry
            v = jnp.take_along_axis(table_ref[:], idx, axis=0)
            idx = jnp.abs(idx + v + k) % T
            return idx, acc + v

        _, acc = jax.lax.fori_loop(
            0, K, body, (idx_ref[:], jnp.zeros((T, L), jnp.int32))
        )
        out_ref[:] = acc

    def run_pallas_i(table, idx0):
        return pl.pallas_call(
            kernel_i,
            out_shape=jax.ShapeDtypeStruct((T, L), jnp.int32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(table_i, idx0)

    ms = run("pallas take_along_axis i32 (2048x128) x32", run_pallas_i, table_i, idx0)
    print(f"    -> {n/max(ms,1e-9)*1e3/1e6:.0f} M lookups/s")

    # bigger table: 16384 x 128 = 8MB f32
    T2 = 16384
    table2 = jnp.asarray(rng.standard_normal((T2, L)), jnp.float32)
    idx2 = jnp.asarray(rng.integers(0, T2, (T2, L)), jnp.int32)

    def kernel2(table_ref, idx_ref, out_ref):
        def body(k, carry):
            idx, acc = carry
            v = jnp.take_along_axis(table_ref[:], idx, axis=0)
            idx = jnp.abs(idx + v.astype(jnp.int32) + k) % T2
            return idx, acc + v

        _, acc = jax.lax.fori_loop(
            0, 4, body, (idx_ref[:], jnp.zeros((T2, L), jnp.float32))
        )
        out_ref[:] = acc

    def run_pallas2(table, idx0):
        return pl.pallas_call(
            kernel2,
            out_shape=jax.ShapeDtypeStruct((T2, L), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(table2, idx2)

    n2 = T2 * L * 4
    ms = run("pallas take_along_axis f32 (16384x128) x4", run_pallas2, table2, idx2)
    print(f"    -> {n2/max(ms,1e-9)*1e3/1e6:.0f} M lookups/s ({n2/1e6:.1f}M total)")


if __name__ == "__main__":
    main()
