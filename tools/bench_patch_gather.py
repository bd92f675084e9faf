"""Measure the candidate primitives for patch-based random access.

The round-2 floor analysis (PERFORMANCE.md "Gap to 30 FPS") says the
pipeline is bound by ~4.4M per-element random accesses/frame at
~140M lanes/s.  The accesses are NOT arbitrary though: integrate gathers
depth at the projected pixels of one BLOCK (a compact image patch), and
ICP association gathers model maps along a smooth warp (a compact patch
per image tile).  If "extract a patch per row + gather within the patch"
runs faster per lane than flat element gathers, both stages can be
rebuilt around it.

Findings feed ops/ redesigns; methodology: state-chained inside one jit
(nothing served lazily), device time from xplane.

NOTE: a first attempt expressed patch extraction as lax.gather with
slice_sizes=(32,) at 98k arbitrary starts -- it sat in XLA compilation
for >15 minutes and was abandoned.  The viable formulation snaps patch
columns to 32-aligned tiles so extraction is a plain ROW GATHER from a
statically reshaped (H*W/32, 32) image.

Run: python tools/bench_patch_gather.py
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

    paths = glob.glob(
        os.path.join(outdir, "**", "*.xplane.pb"), recursive=True
    )
    paths.sort(key=os.path.getmtime)
    with open(paths[-1], "rb") as f:
        xspace = xplane_pb2.XSpace.FromString(f.read())
    total = 0.0
    for plane in xspace.planes:
        if "TPU" not in plane.name:
            continue
        for line in plane.lines:
            if "XLA Ops" not in line.name:
                continue
            for ev in line.events:
                total += ev.duration_ps / 1e9
    return total


_CASE = [0]


def run_case(tag, fn, *args):
    _CASE[0] += 1
    outdir = f"/tmp/pgtrace/case{_CASE[0]}"
    os.makedirs(outdir, exist_ok=True)
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    with jax.profiler.trace(outdir):
        out = f(*args)
        jax.block_until_ready(out)
    ms = device_ms(outdir)
    print(f"{tag:46s} device {ms:8.3f} ms", flush=True)
    return ms


def main():
    rng = np.random.default_rng(0)
    K = 16
    HW = 480 * 640

    # --- 1. flat element gather: 1.6M lanes (the integrate shape) -------
    N = 3072 * 512
    img = jnp.asarray(rng.integers(0, 1 << 30, HW), jnp.int32)
    idx = jnp.asarray(rng.integers(0, HW, N), jnp.int32)

    def chain_elem(table, idx):
        def body(i, idx):
            v = table[idx]
            return (idx + (v & 0xFF) + i) % HW
        return jax.lax.fori_loop(0, K, body, idx)

    ms = run_case(f"flat elem gather {N/1e6:.1f}M from 307k", chain_elem,
                  img, idx)
    print(f"    -> {K*N/max(ms,1e-9)*1e3/1e6:.0f} M lanes/s")

    # --- 2. patch extraction as ROW gathers from (H*W/32, 32) -----------
    C = 3072
    rows_per = 64  # 32 rows x 2 column-tiles per block patch
    img_tiles = img.reshape(HW // 32, 32)
    rids = jnp.asarray(
        rng.integers(0, HW // 32, C * rows_per), jnp.int32
    )

    def chain_rowpatch(tiles, rids):
        def body(i, rids):
            out = tiles[rids]                      # (C*64, 32)
            s = out[:, 0]
            return (rids + (s & 0x3F) + i) % (HW // 32)
        return jax.lax.fori_loop(0, K, body, rids)

    ms = run_case(f"patch extract: {C*rows_per/1e3:.0f}k row-gathers x32w",
                  chain_rowpatch, img_tiles, rids)
    print(f"    -> {K*C*rows_per/max(ms,1e-9)*1e3/1e6:.2f} M rows/s "
          f"({K*C*rows_per*32/max(ms,1e-9)*1e3/1e6:.0f} M elem/s)")

    # --- 3. take_along_axis within patches ------------------------------
    P, Kv = 1024, 512
    patches = jnp.asarray(rng.integers(0, 1 << 30, (C, P)), jnp.int32)
    pidx = jnp.asarray(rng.integers(0, P, (C, Kv)), jnp.int32)

    def chain_taa(patches, pidx):
        def body(i, pidx):
            v = jnp.take_along_axis(patches, pidx, axis=1)
            return (pidx + (v & 0xFF) + i) % P
        return jax.lax.fori_loop(0, K, body, pidx)

    ms = run_case(f"take_along_axis ({C},{P}) x ({C},{Kv})", chain_taa,
                  patches, pidx)
    print(f"    -> {K*C*Kv/max(ms,1e-9)*1e3/1e6:.0f} M lanes/s")

    # --- 4. one-hot matmul gather (MXU) ---------------------------------
    patches_f = (patches & 0xFFFF).astype(jnp.float32)

    def chain_onehot(patches_f, pidx):
        iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, P), 2)

        def body(i, pidx):
            onehot = (pidx[:, :, None] == iota).astype(jnp.bfloat16)
            v = jax.lax.dot_general(
                onehot, patches_f.astype(jnp.bfloat16)[:, :, None],
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )[..., 0]
            return (pidx + (v.astype(jnp.int32) & 0x3F) + i) % P
        return jax.lax.fori_loop(0, K, body, pidx)

    ms = run_case(f"one-hot matmul ({C},{Kv})x({C},{P})", chain_onehot,
                  patches_f, pidx)
    print(f"    -> {K*C*Kv/max(ms,1e-9)*1e3/1e6:.0f} M lanes/s")

    # --- 5. row gather upper bound --------------------------------------
    NB = 65536
    vol = jnp.asarray(rng.integers(0, 1 << 30, (NB, 512)), jnp.int32)
    ids = jnp.asarray(rng.integers(0, NB, C), jnp.int32)

    def chain_rows(vol, ids):
        def body(i, ids):
            r = vol[ids]
            return (ids + (r[:, 0] & 0xFF) + i) % NB
        return jax.lax.fori_loop(0, K, body, ids)

    ms = run_case(f"row gather {C} x 512-wide", chain_rows, vol, ids)
    print(f"    -> {K*C/max(ms,1e-9)*1e3/1e6:.2f} M rows/s "
          f"({K*C*512/max(ms,1e-9)*1e3/1e6:.0f} M elem/s)")


if __name__ == "__main__" and "--extra" not in sys.argv:
    main()


def extra():
    """Design-question cases: f32 one-hot, P scaling, multi-column rhs,
    row scatter-min (splat patch merge).  Select with --case=onehot|
    scatter (default: all); each one-hot variant costs minutes of
    remote compile, so run only what you need."""
    rng = np.random.default_rng(1)
    K = 16
    C, Kv = 3072, 512
    HW = 480 * 640
    case = "all"
    for a in sys.argv[1:]:
        if a.startswith("--case="):
            case = a.split("=", 1)[1]

    for P, cols, dt in (
        (2048, 2, jnp.float32),
        (512, 2, jnp.float32),
    ) if case in ("all", "onehot") else ():
        patches = jnp.asarray(
            rng.integers(0, 1 << 16, (C, P, cols)), jnp.float32
        )
        pidx = jnp.asarray(rng.integers(0, P, (C, Kv)), jnp.int32)

        def chain(patches, pidx, P=P, dt=dt):
            iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, P), 2)

            def body(i, pidx):
                onehot = (pidx[:, :, None] == iota).astype(dt)
                v = jax.lax.dot_general(
                    onehot, patches.astype(dt),
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )
                return (pidx + (v[..., 0].astype(jnp.int32) & 0x3F) + i) % P
            return jax.lax.fori_loop(0, K, body, pidx)

        ms = run_case(
            f"one-hot P={P} cols={cols} {dt.__name__}", chain, patches, pidx
        )
        print(f"    -> {K*C*Kv/max(ms,1e-9)*1e3/1e6:.0f} M lanes/s")

    if case not in ("all", "scatter"):
        return
    # Row scatter-min: merge (R, 32) patch rows into a (HW/32, 32) zbuf.
    R = 3072 * 16
    zbuf = jnp.full((HW // 32, 32), jnp.inf, jnp.float32)
    rows = jnp.asarray(rng.uniform(0.5, 5.0, (R, 32)), jnp.float32)
    rids = jnp.asarray(rng.integers(0, HW // 32, R), jnp.int32)

    def chain_scatmin(zbuf, rows, rids):
        def body(i, carry):
            zbuf, rids = carry
            zbuf = zbuf.at[rids].min(rows)
            return zbuf, (rids * 5 + i) % (HW // 32)
        return jax.lax.fori_loop(0, K, body, (zbuf, rids))[0]

    ms = run_case(f"row scatter-min {R/1e3:.0f}k x 32w", chain_scatmin,
                  zbuf, rows, rids)
    print(f"    -> {K*R/max(ms,1e-9)*1e3/1e6:.2f} M rows/s")

    # Dense per-block patch z-min: iota-compare + min-reduce (the splat
    # patch rasterizer candidate): out[c,p] = min over v of z[c,v] where
    # pidx[c,v] == p.
    P = 512
    z = jnp.asarray(rng.uniform(0.5, 5.0, (C, Kv)), jnp.float32)
    pidx = jnp.asarray(rng.integers(0, P, (C, Kv)), jnp.int32)

    def chain_patchmin(z, pidx):
        iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, P), 2)

        def body(i, z):
            m = jnp.where(
                pidx[:, :, None] == iota, z[:, :, None], jnp.inf
            ).min(axis=1)                        # (C, P)
            return z + 0.0 * m[:, :1]
            # (keep z the carry; m consumed so nothing is elided)
        return jax.lax.fori_loop(0, K, body, z)

    ms = run_case(f"patch z-min ({C},{Kv})->({C},{P})", chain_patchmin,
                  z, pidx)
    print(f"    -> {K*C*Kv/max(ms,1e-9)*1e3/1e6:.0f} M lanes/s")


if __name__ == "__main__" and "--extra" in sys.argv:
    extra()
