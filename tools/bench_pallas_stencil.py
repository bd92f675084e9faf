"""Pallas spike (round-1 VERDICT item 9): fuse the splat renderer's dense
image-space passes (hole-fill rounds + edge-aware depth smoothing) into ONE
VMEM-resident stencil kernel, and time it against the XLA version on the
real chip.

Rationale: the gather-bound stages can't win from Pallas on v5e (no general
VMEM gather -- tools/bench_pallas_gather.py), but the post-splat image
passes are pure 3x3 stencils over a 640x480 f32 image (1.2 MB -- the whole
image fits VMEM).  The XLA version lowers each shift as pad+slice with HBM
round-trips between fusions; a single kernel keeps every round on-chip.

Run:  python tools/bench_pallas_stencil.py [HxW]
Writes the verdict into stdout; PERFORMANCE.md records the result.
"""
import sys
import time

sys.path.insert(0, ".")
from vulcan_tpu.utils.runtime import setup_cache

setup_cache()

import jax
import jax.numpy as jnp
import numpy as np

from vulcan_tpu.config import Config

FILL_ROUNDS = 2
INF = jnp.inf


def _shift(d, dy, dx, fill):
    """Static +-1 shifts via concatenate (Pallas-safe, no pad+dyn-slice)."""
    h, w = d.shape
    if dy == 1:
        d = jnp.concatenate([d[1:], jnp.full((1, w), fill, d.dtype)], 0)
    elif dy == -1:
        d = jnp.concatenate([jnp.full((1, w), fill, d.dtype), d[:-1]], 0)
    if dx == 1:
        d = jnp.concatenate([d[:, 1:], jnp.full((h, 1), fill, d.dtype)], 1)
    elif dx == -1:
        d = jnp.concatenate([jnp.full((h, 1), fill, d.dtype), d[:, :-1]], 1)
    return d


def fill_and_smooth(d, mu):
    """The splat post-pass: consistency-gated hole fill + edge-aware
    smoothing (identical math to ops/splat.py)."""
    for _ in range(FILL_ROUNDS):
        best = d
        worst = jnp.where(jnp.isfinite(d), d, -INF)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dx == 0 and dy == 0:
                    continue
                n_d = _shift(d, dy, dx, INF)
                best = jnp.minimum(best, n_d)
                worst = jnp.maximum(
                    worst, jnp.where(jnp.isfinite(n_d), n_d, -INF)
                )
        consistent = (worst - best) < 2.0 * mu
        d = jnp.where(jnp.isfinite(d) | ~consistent, d, best)
    acc = jnp.where(jnp.isfinite(d), d, 0.0)
    cnt = jnp.isfinite(d).astype(jnp.float32)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            n_d = _shift(d, dy, dx, INF)
            ok = jnp.isfinite(n_d) & (jnp.abs(n_d - d) < 0.5 * mu)
            acc = acc + jnp.where(ok, n_d, 0.0)
            cnt = cnt + ok
    return jnp.where(jnp.isfinite(d), acc / jnp.maximum(cnt, 1.0), d)


def make_pallas(h, w, mu):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(d_ref, out_ref):
        out_ref[:] = fill_and_smooth(d_ref[:], mu)

    return jax.jit(
        lambda d: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((h, w), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(d)
    )


def chain_time(fn, x, n=30):
    """Chained timing: out feeds back in so dispatches can't be elided."""
    out = fn(x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(out)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    shape = sys.argv[1] if len(sys.argv) > 1 else "480x640"
    h, w = (int(x) for x in shape.split("x"))
    mu = Config().trunc_dist

    rng = np.random.default_rng(0)
    d = rng.uniform(0.5, 3.0, (h, w)).astype(np.float32)
    d[rng.uniform(size=d.shape) < 0.3] = np.inf  # splat holes
    d = jnp.asarray(d)

    xla_fn = jax.jit(lambda x: fill_and_smooth(x, mu))
    pallas_fn = make_pallas(h, w, mu)

    want = np.asarray(xla_fn(d))
    got = np.asarray(pallas_fn(d))
    mask = np.isfinite(want)
    assert np.array_equal(mask, np.isfinite(got)), "finite masks differ"
    np.testing.assert_allclose(got[mask], want[mask], atol=1e-5)
    print("correctness: PASS")

    ms_xla = chain_time(xla_fn, d)
    ms_pal = chain_time(pallas_fn, d)
    print(f"XLA    fill+smooth {h}x{w}: {ms_xla:8.3f} ms")
    print(f"Pallas fill+smooth {h}x{w}: {ms_pal:8.3f} ms")
    print(f"speedup: {ms_xla / ms_pal:.2f}x")


if __name__ == "__main__":
    main()
