"""Runtime setup: persistent compilation cache and platform helpers.

First Pallas compile on this host's TPU was measured at 139 s (SURVEY.md §7
[E]); the persistent compilation cache makes that a one-time cost.  Call
``setup_cache()`` before the first jit -- the CLI, bench, and graft entry all
do.
"""
from __future__ import annotations

import os

_DEFAULT_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".jax_cache")


def setup_cache(cache_dir: str | None = None) -> None:
    """Enable the persistent compilation cache.

    ``VULCAN_TPU_CACHE=""`` (empty) DISABLES it: the CPU test suite must
    run cache-less -- this platform's patched cache machinery segfaulted
    deserializing its own freshly written CPU entries (3x, round 3), and
    CPU compiles are cheap anyway."""
    import jax

    cache_dir = cache_dir or os.environ.get("VULCAN_TPU_CACHE", _DEFAULT_CACHE)
    if not cache_dir:
        return
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older/newer jax config names; cache is an optimization only


def prefetch_to_device(iterator, lookahead: int = 2):
    """Yield items from ``iterator`` with their leading arrays already
    `jax.device_put` -- the async H2D upload of frame i+1..i+lookahead
    overlaps device compute of frame i, taking the host feed off the
    per-frame critical path (round-1 VERDICT item 3).

    Items are tuples; array leaves are device_put, non-arrays pass
    through untouched.
    """
    import collections

    import jax
    import numpy as np

    def put(item):
        return tuple(
            jax.device_put(x)
            if isinstance(x, (np.ndarray, jax.Array))
            else x
            for x in item
        )

    queue = collections.deque()
    it = iter(iterator)
    try:
        for _ in range(lookahead):
            queue.append(put(next(it)))
    except StopIteration:
        pass
    while queue:
        out = queue.popleft()
        try:
            queue.append(put(next(it)))
        except StopIteration:
            pass
        yield out
