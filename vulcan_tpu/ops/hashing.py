"""Spatial hashing for voxel blocks.

TPU-native rebuild of SURVEY.md components #11-#12 (reference: ``hash.h`` /
``volume.cu`` [M], InfiniTAM bucket+excess-list hash with CUDA atomics
[P:1410.0925]).  Design differences, deliberate and TPU-first:

  * **Open addressing with bounded linear probing** instead of buckets +
    excess lists: lookups are a fixed-trip unrolled gather chain (no pointer
    chasing), which vectorizes over every query pixel/voxel at once.
  * **Deterministic parallel insertion** instead of CUDA atomics: each probe
    round resolves slot contention with a segment-min (lowest candidate index
    wins), scatters the winners, and re-checks -- a fixed number of
    sort-free vectorized rounds.  Same-coordinate duplicates must be removed
    by the caller first (see ``ops/allocate.py``).

Table layout (structure-of-arrays, all static shapes):
  * ``keys``   (hash_size, 3) int32 -- block coords; x == EMPTY_KEY marks empty.
  * ``values`` (hash_size,)   int32 -- block storage index.

The hash function is the InfiniTAM spatial hash
``(x * 73856093 ^ y * 19349669 ^ z * 83492791) mod hash_size``
[P:1410.0925], with hash_size a power of two so the mod is a mask.
Probing is *triangular* (slot0 + p(p+1)/2), which visits every slot of a
power-of-two table and avoids the primary clustering that made bounded
linear probing overflow at ~0.25 load.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import Config

EMPTY_KEY = jnp.int32(0x7FFFFFFF)

_P1 = jnp.uint32(73856093)
_P2 = jnp.uint32(19349669)
_P3 = jnp.uint32(83492791)


def hash_coords(coords: jax.Array, hash_size: int) -> jax.Array:
    """Block coords (..., 3) int32 -> slot (...,) int32 in [0, hash_size)."""
    c = coords.astype(jnp.uint32)
    h = (c[..., 0] * _P1) ^ (c[..., 1] * _P2) ^ (c[..., 2] * _P3)
    return (h & jnp.uint32(hash_size - 1)).astype(jnp.int32)


def probe_slot(slot0: jax.Array, p: int, hash_size: int) -> jax.Array:
    """p-th probe position: triangular probing, full-cycle on 2^k tables."""
    return (slot0 + (p * (p + 1)) // 2) & (hash_size - 1)


def lookup(
    keys: jax.Array,
    values: jax.Array,
    coords: jax.Array,
    config: Config,
):
    """Batched hash lookup.

    Returns (block_idx, found): block_idx (...,) int32 (-1 if absent).
    Fixed ``max_probes`` linear-probe rounds, fully vectorized -- this is the
    hot path inside raycast, one call per ray step.
    """
    hs = config.hash_size
    slot0 = hash_coords(coords, hs)
    found = jnp.zeros(coords.shape[:-1], bool)
    result = jnp.full(coords.shape[:-1], -1, jnp.int32)
    live = jnp.ones(coords.shape[:-1], bool)  # still probing
    for p in range(config.max_probes):
        slot = probe_slot(slot0, p, hs)
        k = keys[slot]          # (..., 3)
        empty = k[..., 0] == EMPTY_KEY
        match = jnp.all(k == coords, axis=-1) & ~empty
        hit = live & match
        result = jnp.where(hit, values[slot], result)
        found = found | hit
        # An empty slot terminates the probe chain: key cannot be further on.
        live = live & ~match & ~empty
    return result, found


def insert_unique(
    keys: jax.Array,
    values: jax.Array,
    free_count: jax.Array,
    coords: jax.Array,
    want: jax.Array,
    config: Config,
):
    """Insert up to N *unique* block coords; allocate block slots in order.

    Args:
      keys/values: the table (SoA, see module docstring).
      free_count: scalar int32, number of block slots already allocated;
        new blocks get indices free_count, free_count+1, ...
      coords: (N, 3) int32 candidate coords (duplicates NOT allowed).
      want: (N,) bool, which rows are real candidates.

    Returns (keys, values, free_count, inserted_idx, ok):
      inserted_idx (N,) int32 -- block index for each wanted coord (new or
      pre-existing), -1 where not inserted; ok (N,) bool -- False where the
      probe bound or block capacity was exhausted (surfaced as an overflow
      counter by the caller, never silent).

    Deterministic contention rule: within one probe round, the lowest
    candidate row index targeting a slot wins it (segment-min over slots).
    """
    n = coords.shape[0]
    hs = config.hash_size
    cap = config.num_blocks

    # Resolve pre-existing entries first.
    existing_idx, exists = lookup(keys, values, coords, config)
    pending = want & ~exists
    assigned = jnp.where(exists & want, existing_idx, -1)

    slot0 = hash_coords(coords, hs)
    row_ids = jnp.arange(n, dtype=jnp.int32)

    # Capacity gate BEFORE probing: rows whose pending-order exceeds the free
    # block slots never claim a hash slot, so no rollback is ever needed (a
    # rollback would punch an EMPTY hole into other keys' probe chains).
    remaining = cap - free_count
    order_pending = jnp.cumsum(pending.astype(jnp.int32)) - 1
    in_capacity = order_pending < remaining
    pending = pending & in_capacity

    # Phase 1: claim hash slots (keys only).  max_probes is small and static,
    # so a Python loop of vectorized scatter rounds keeps XLA happy.
    claimed_slot = jnp.full((n,), -1, jnp.int32)
    for p in range(config.max_probes):
        slot = probe_slot(slot0, p, hs)
        slot_empty = keys[slot][..., 0] == EMPTY_KEY
        # Occupied-by-our-own-coord can't happen: caller deduped + we
        # resolved pre-existing keys above.
        claimable = pending & slot_empty
        # Contention: the lowest candidate row targeting a slot wins it.
        winner = jnp.full((hs,), n, jnp.int32)
        winner = winner.at[jnp.where(claimable, slot, hs)].min(
            row_ids, mode="drop"
        )
        is_winner = claimable & (winner[slot] == row_ids)
        keys = keys.at[jnp.where(is_winner, slot, hs)].set(
            coords, mode="drop"
        )
        claimed_slot = jnp.where(is_winner, slot, claimed_slot)
        pending = pending & ~is_winner

    # Phase 2: dense, gap-free block-index assignment over actual winners.
    success = claimed_slot >= 0
    order = jnp.cumsum(success.astype(jnp.int32)) - 1
    new_block_idx = jnp.where(success, free_count + order, -1)
    values = values.at[jnp.where(success, claimed_slot, hs)].set(
        new_block_idx, mode="drop"
    )
    assigned = jnp.where(success, new_block_idx, assigned)

    ok = ~want | exists | success
    return keys, values, free_count + jnp.sum(success), assigned, ok
