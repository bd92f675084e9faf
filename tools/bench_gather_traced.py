"""Ground-truth TPU gather throughput via the device profiler.

Chains K gathers inside one jit (so nothing can be elided), traces it, and
reports device-time per gather from the xplane dump.
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


def device_ms(outdir):
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


_CASE = [0]


def run_case(tag, fn, *args, K=16):
    _CASE[0] += 1
    outdir = f"/tmp/gtrace/case{_CASE[0]}"
    os.makedirs(outdir, exist_ok=True)
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    with jax.profiler.trace(outdir):
        out = f(*args)
        jax.block_until_ready(out)
    totals = device_ms(outdir)
    jit_total = sum(v for k, v in totals.items() if k.startswith("jit"))
    gather_ms = sum(
        v for k, v in totals.items()
        if ("gather" in k or "fusion" in k or "dynamic-slice" in k)
        and not k.startswith("jit_")
    )
    print(f"{tag:44s} jit {jit_total:8.3f} ms   gatherish {gather_ms:8.3f} ms")
    return jit_total


def main():
    rng = np.random.default_rng(0)
    N = 1 << 20  # 1M queries
    K = 16

    def chain(table, idx, mod):
        def body(i, idx):
            v = table[idx]
            return (idx + v.astype(jnp.int32) + i) % mod
        return jax.lax.fori_loop(0, K, body, idx)

    for tsize, tag in ((8192, "8k"), (1 << 20, "1M"), (1 << 23, "8M")):
        table = jnp.asarray(rng.integers(0, 97, tsize), jnp.int32)
        idx = jnp.asarray(rng.integers(0, tsize, N), jnp.int32)
        ms = run_case(
            f"i32 1D table[{tag}] x{K} gathers of 1M",
            lambda t, i: chain(t, i, tsize), table, idx,
        )
        print(f"    -> {K*N/max(ms,1e-9)*1e3/1e6:.0f} M gathers/s")

    # int8 table
    t8 = jnp.asarray(rng.integers(-100, 100, 1 << 20), jnp.int8)
    idx = jnp.asarray(rng.integers(0, 1 << 20, N), jnp.int32)

    def chain8(table, idx):
        def body(i, idx):
            v = table[idx].astype(jnp.int32)
            return (idx + v + i) % (1 << 20)
        return jax.lax.fori_loop(0, K, body, idx)

    ms = run_case("int8 1D table[1M]", chain8, t8, idx)
    print(f"    -> {K*N/max(ms,1e-9)*1e3/1e6:.0f} M gathers/s")

    # batched sublane gather: table replicated over 128 lanes, shape (T,128)
    T = 1024
    table2 = jnp.asarray(rng.integers(0, 97, (T, 128)), jnp.int32)
    idx2 = jnp.asarray(rng.integers(0, T, (8192, 128)), jnp.int32)  # 1M

    def chain_batched(table, idx):
        def body(i, idx):
            v = jnp.take_along_axis(table, idx % T, axis=0)
            return (idx + v + i) % T
        return jax.lax.fori_loop(0, K, body, idx)

    ms = run_case("take_along_axis (1024,128) batched", chain_batched, table2, idx2)
    print(f"    -> {K*idx2.size/max(ms,1e-9)*1e3/1e6:.0f} M gathers/s")

    # f32 gather
    tf = jnp.asarray(rng.standard_normal(1 << 20), jnp.float32)

    def chainf(table, idx):
        def body(i, idx):
            v = table[idx]
            return (idx + v.astype(jnp.int32) + i) % (1 << 20)
        return jax.lax.fori_loop(0, K, body, idx)

    ms = run_case("f32 1D table[1M]", chainf, tf, idx)
    print(f"    -> {K*N/max(ms,1e-9)*1e3/1e6:.0f} M gathers/s")

    # scatter rate
    def chain_scatter(dst, idx):
        def body(i, carry):
            dst, idx = carry
            dst = dst.at[idx].add(1.0)
            return dst, (idx * 5 + i) % (1 << 20)
        return jax.lax.fori_loop(0, K, body, (dst, idx))[0]

    dst = jnp.zeros((1 << 20,), jnp.float32)
    ms = run_case("scatter-add f32[1M] x16 of 1M", chain_scatter, dst, idx)
    print(f"    -> {K*N/max(ms,1e-9)*1e3/1e6:.0f} M scatters/s")


if __name__ == "__main__":
    main()
