"""How much does one dense (480, 640) image pass cost on this TPU?

The round-3 xplane trace shows single elementwise fusions over flat
f32[307200] buffers costing ~1.4 ms -- absurd against HBM roofline
(1.2 MB should be ~10 us).  This chains K dependent dense passes in one
jit and divides: if per-pass cost is ~constant vs shape, the platform
has a fixed per-op overhead and FUSING passes (one Pallas kernel for
the whole post-splat pipeline) is worth ~1 ms per pass removed.

Run: python tools/bench_dense_ops.py
"""
import sys
import time

sys.path.insert(0, ".")
from vulcan_tpu.utils.runtime import setup_cache

setup_cache()

import jax
import jax.numpy as jnp
from functools import partial


def chain(x, k, shifty):
    for i in range(k):
        if shifty:
            # shift-style stencil pass (concat slices, like fill/normals)
            x = jnp.concatenate([x[1:], x[:1]], 0) + 0.5 * x
        else:
            x = x * 1.000001 + 0.1
    return x


@partial(jax.jit, static_argnames=("k", "shifty"))
def run(x, k, shifty):
    return chain(x, k, shifty)


def timeit(shape, k, shifty, n=20):
    x = jnp.zeros(shape, jnp.float32)
    r = run(x, k, shifty)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = run(r, k, shifty)  # chained: no lazy-dispatch lies
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    for shape in ((480, 640), (307200,)):
        for shifty in (False, True):
            t2 = timeit(shape, 2, shifty)
            t16 = timeit(shape, 16, shifty)
            per = (t16 - t2) / 14.0
            print(
                f"shape={shape!s:12s} shifty={shifty!s:5s} "
                f"k=2: {t2:6.3f} ms  k=16: {t16:6.3f} ms  "
                f"-> per extra pass {per:6.3f} ms"
            )


if __name__ == "__main__":
    main()
