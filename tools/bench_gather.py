"""TPU gather cost model: measure the primitives the raycast march uses."""
import sys
import time

sys.path.insert(0, ".")
from vulcan_tpu.utils.runtime import setup_cache

setup_cache()

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, n=30):
    fn(*args)[0].block_until_ready() if isinstance(
        fn(*args), tuple
    ) else jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:44s} {(time.perf_counter()-t0)/n*1e3:8.3f} ms")


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    N = 120 * 160  # query count (tiny image)
    N2 = 480 * 640

    for nq, tag in ((N, "19k"), (N2, "307k")):
        idx = jnp.asarray(rng.integers(0, 8192, nq), jnp.int32)
        table1 = jnp.asarray(rng.standard_normal(8192), jnp.float32)
        f = jax.jit(lambda t, i: t[i])
        timeit(f"1D table[8192] f32 gather ({tag} queries)", f, table1, idx)

        table3 = jnp.asarray(
            rng.standard_normal((8192, 3)), jnp.float32
        )
        f3 = jax.jit(lambda t, i: t[i])
        timeit(f"row gather (8192,3) ({tag})", f3, table3, idx)

        # 3D grid gather (the render-cache grid read)
        G = 128
        grid = jnp.asarray(
            rng.integers(0, 100, (G, G, G)), jnp.int32
        )
        gx = jnp.asarray(rng.integers(0, G, nq), jnp.int32)
        gy = jnp.asarray(rng.integers(0, G, nq), jnp.int32)
        gz = jnp.asarray(rng.integers(0, G, nq), jnp.int32)
        fg = jax.jit(lambda g, x, y, z: g[x, y, z])
        timeit(f"grid (128^3)[x,y,z] ({tag})", fg, grid, gx, gy, gz)

        # flat version of the same
        flat = grid.reshape(-1)
        fi = (gx * G + gy) * G + gz
        ff = jax.jit(lambda g, i: g[i])
        timeit(f"grid flat [i] ({tag})", ff, flat, fi)

        # halo voxel gather (16385, 9,9,9)
        halo = jnp.asarray(
            rng.standard_normal((16385, 9, 9, 9)), jnp.float32
        )
        hr = jnp.asarray(rng.integers(0, 16385, nq), jnp.int32)
        hl = jnp.asarray(rng.integers(0, 8, (3, nq)), jnp.int32)
        fh = jax.jit(lambda h, r, l: h[r, l[0], l[1], l[2]])
        timeit(f"halo (16k,9,9,9)[r,x,y,z] ({tag})", fh, halo, hr, hl)

        halo_flat = halo.reshape(-1)
        fhf = jax.jit(
            lambda h, r, l: h[((r * 9 + l[0]) * 9 + l[1]) * 9 + l[2]]
        )
        timeit(f"halo flat [i] ({tag})", fhf, halo_flat, hr, hl)

        # one-hot matmul alternative for small table
        fo = jax.jit(
            lambda t, i: jax.nn.one_hot(i, 8192, dtype=jnp.bfloat16)
            @ t.astype(jnp.bfloat16)
        )
        timeit(f"one-hot matmul table[8192] ({tag})", fo, table1, idx)

    # fori_loop of K gathers: per-iteration overhead
    table = jnp.asarray(rng.standard_normal(8192 * 4), jnp.float32)
    idx0 = jnp.asarray(rng.integers(0, 8192, N), jnp.int32)

    def loop(table, idx0, iters):
        def body(i, carry):
            acc, idx = carry
            v = table[idx]
            idx = (idx + v.astype(jnp.int32) + i) % (8192 * 4)
            return acc + v, idx

        acc, _ = jax.lax.fori_loop(
            0, iters, body, (jnp.zeros(N), idx0)
        )
        return acc

    for iters in (8, 32, 96):
        f = jax.jit(lambda t, i0: loop(t, i0, iters))
        timeit(f"fori_loop x{iters} of 1 gather (19k)", f, table, idx0)


if __name__ == "__main__":
    main()
