import jax.numpy as jnp
import numpy as np

from vulcan_tpu.config import TINY
from vulcan_tpu.ops import blocks as B
from vulcan_tpu.ops import hashing


def empty_table(cfg):
    codes = jnp.full((cfg.hash_size,), hashing.EMPTY_CODE, jnp.int32)
    values = jnp.zeros((cfg.hash_size,), jnp.int32)
    return codes, values


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    coords = jnp.asarray(
        rng.integers(-B.COORD_BOUND, B.COORD_BOUND, (1000, 3)), jnp.int32
    )
    codes = B.pack_block_coords(coords)
    back = B.unpack_block_coords(codes)
    np.testing.assert_array_equal(back, coords)
    # Packing is injective: unique coords -> unique codes.
    assert len(np.unique(np.asarray(codes))) == len(
        np.unique(np.asarray(coords), axis=0)
    )


def test_insert_then_lookup():
    cfg = TINY
    keys, values = empty_table(cfg)
    rng = np.random.default_rng(1)
    coords = np.unique(
        rng.integers(-100, 100, (500, 3)).astype(np.int32), axis=0
    )
    n = len(coords)
    coords_j = jnp.asarray(coords)
    want = jnp.ones((n,), bool)
    keys, values, free, assigned, ok = hashing.insert_unique(
        keys, values, jnp.asarray(1, jnp.int32), coords_j, want, cfg
    )
    assert np.all(np.asarray(ok)), "all inserts should succeed"
    a = np.asarray(assigned)
    assert int(free) == 1 + n
    # Block indices are dense 1..n with no duplicates.
    assert sorted(a.tolist()) == list(range(1, n + 1))

    idx, found = hashing.lookup(keys, values, coords_j, cfg)
    assert np.all(np.asarray(found))
    np.testing.assert_array_equal(np.asarray(idx), a)

    # Lookup of absent coords: not found.
    absent = jnp.asarray([[500, 0, 0], [-500, 12, 3]], jnp.int32)
    _, found2 = hashing.lookup(keys, values, absent, cfg)
    assert not np.any(np.asarray(found2))


def test_insert_existing_returns_same_index():
    cfg = TINY
    keys, values = empty_table(cfg)
    coords = jnp.asarray([[1, 2, 3], [4, 5, 6]], jnp.int32)
    want = jnp.ones((2,), bool)
    keys, values, free, a1, _ = hashing.insert_unique(
        keys, values, jnp.asarray(1, jnp.int32), coords, want, cfg
    )
    keys2, values2, free2, a2, ok2 = hashing.insert_unique(
        keys, values, free, coords, want, cfg
    )
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    assert int(free2) == int(free), "re-insert must not allocate"
    np.testing.assert_array_equal(np.asarray(keys), np.asarray(keys2))
    assert np.all(np.asarray(ok2))


def test_insert_respects_capacity():
    import dataclasses

    cfg = dataclasses.replace(TINY, num_blocks=8)
    keys, values = empty_table(cfg)
    coords = jnp.asarray(
        np.stack([np.arange(20), np.zeros(20), np.zeros(20)], -1), jnp.int32
    )
    want = jnp.ones((20,), bool)
    keys, values, free, assigned, ok = hashing.insert_unique(
        keys, values, jnp.asarray(1, jnp.int32), coords, want, cfg
    )
    assert int(free) == 8  # slots 1..7 allocated, block 0 reserved
    assert int(np.asarray(ok).sum()) == 7
    a = np.asarray(assigned)
    assert sorted(a[a >= 0].tolist()) == list(range(1, 8))


def test_colliding_coords_probe_correctly():
    """Coords engineered to share a hash slot must still all be found."""
    cfg = TINY
    keys, values = empty_table(cfg)
    base = np.asarray([3, 1, 4], np.int32)
    h0 = int(hashing.hash_coords(jnp.asarray(base), cfg.hash_size))
    # Vectorized search for coords hashing to the same slot.
    rng = np.random.default_rng(7)
    pool = np.unique(rng.integers(-200, 200, (60000, 3)).astype(np.int32), axis=0)
    hashes = np.asarray(hashing.hash_coords(jnp.asarray(pool), cfg.hash_size))
    same = pool[hashes == h0]
    same = same[~np.all(same == base, axis=1)][:3]
    colliders = [base] + list(same)
    assert len(colliders) >= 3, "could not find collisions for the test"
    coords = jnp.asarray(np.stack(colliders), jnp.int32)
    want = jnp.ones((len(colliders),), bool)
    keys, values, free, assigned, ok = hashing.insert_unique(
        keys, values, jnp.asarray(1, jnp.int32), coords, want, cfg
    )
    assert np.all(np.asarray(ok))
    idx, found = hashing.lookup(keys, values, coords, cfg)
    assert np.all(np.asarray(found))
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(assigned))


def test_incremental_inserts_preserve_probe_invariant():
    """Insert in several batches; every key inserted earlier stays findable."""
    cfg = TINY
    keys, values = empty_table(cfg)
    free = jnp.asarray(1, jnp.int32)
    rng = np.random.default_rng(3)
    all_coords = np.unique(
        rng.integers(-50, 50, (600, 3)).astype(np.int32), axis=0
    )
    seen = {}
    for start in range(0, len(all_coords), 100):
        batch = all_coords[start : start + 100]
        keys, values, free, assigned, ok = hashing.insert_unique(
            keys,
            values,
            free,
            jnp.asarray(batch),
            jnp.ones((len(batch),), bool),
            cfg,
        )
        assert np.all(np.asarray(ok))
        for c, a in zip(batch, np.asarray(assigned)):
            seen[tuple(c)] = int(a)
    idx, found = hashing.lookup(keys, values, jnp.asarray(all_coords), cfg)
    assert np.all(np.asarray(found))
    for c, i in zip(all_coords, np.asarray(idx)):
        assert seen[tuple(c)] == int(i)
