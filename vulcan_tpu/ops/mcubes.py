"""Colored marching-cubes mesh extraction from the sparse TSDF volume.

TPU-native rebuild of the reference ``Extractor`` (SURVEY.md component #18,
``extractor.cu`` [M]; per-voxel-cube classify + prefix-scan compaction +
emit kernels [B]).  TPU-first structure:

  1. **Halo construction**: instead of per-corner hash lookups (the CUDA
     pattern), each block gathers its 7 (+x/+y/+z/...) neighbor blocks once
     and builds an extended (9,9,9) halo; every cube corner read is then a
     static slice -- no gathers in the inner loop, missing neighbors read
     the null block (weight 0) so boundary cubes mask out cleanly.
  2. **Classify**: per-cube config bits + triangle counts from the lookup
     table (tables derived + validated in tools/gen_mc_tables.py).
  3. **Compact**: exclusive cumsum of counts -> global output offsets
     (replaces the CUDA prefix-scan + atomic emit).
  4. **Emit**: for each triangle slot (static MAX_TRIS loop), interpolate
     edge vertices + colors and scatter into a fixed-capacity triangle
     buffer; overflow is counted, never silent.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..utils.pytree import pytree_dataclass
from . import blocks as B
from . import mc_tables as T


@pytree_dataclass
class Mesh:
    """Triangle soup with per-vertex colors (fixed capacity + count)."""

    positions: jax.Array   # (capacity, 3, 3) world-space triangle vertices
    colors: jax.Array      # (capacity, 3, 3) rgb in [0,1]
    count: jax.Array       # () int32 valid triangles
    overflow: jax.Array    # () int32 triangles dropped by capacity


def _neighbor_face_slices(volume: B.VolumeState, config: Config):
    """Build (NB, 9, 9, 9) halo arrays for tsdf, weight and color."""
    nb = volume.tsdf.shape[0]
    coords = volume.block_coords

    def neighbor_idx(offset):
        idx = B.lookup_blocks(
            volume, coords + jnp.asarray(offset, jnp.int32), config
        )
        # Null block for unallocated rows (their own data is null anyway).
        return jnp.where(B.allocated_mask(volume, config), idx, 0)

    nx = neighbor_idx((1, 0, 0))
    ny = neighbor_idx((0, 1, 0))
    nz = neighbor_idx((0, 0, 1))
    nxy = neighbor_idx((1, 1, 0))
    nxz = neighbor_idx((1, 0, 1))
    nyz = neighbor_idx((0, 1, 1))
    nxyz = neighbor_idx((1, 1, 1))

    def extend(flat_arr):
        """(NB,512[,C]) -> (NB,9,9,9[,C]) using neighbor faces."""
        tail = flat_arr.shape[2:]
        arr = flat_arr.reshape((nb, 8, 8, 8) + tail)
        ext = jnp.zeros((nb, 9, 9, 9) + tail, arr.dtype)
        ext = ext.at[:, :8, :8, :8].set(arr)

        def rows(idx):
            return flat_arr[idx].reshape((-1, 8, 8, 8) + tail)

        ext = ext.at[:, 8, :8, :8].set(rows(nx)[:, 0, :, :])
        ext = ext.at[:, :8, 8, :8].set(rows(ny)[:, :, 0, :])
        ext = ext.at[:, :8, :8, 8].set(rows(nz)[:, :, :, 0])
        ext = ext.at[:, 8, 8, :8].set(rows(nxy)[:, 0, 0, :])
        ext = ext.at[:, 8, :8, 8].set(rows(nxz)[:, 0, :, 0])
        ext = ext.at[:, :8, 8, 8].set(rows(nyz)[:, :, 0, 0])
        ext = ext.at[:, 8, 8, 8].set(rows(nxyz)[:, 0, 0, 0])
        return ext

    return extend(volume.tsdf), extend(volume.weight), extend(volume.color)


def extract_mesh(volume: B.VolumeState, config: Config) -> Mesh:
    """Extract the zero isosurface of every allocated block."""
    nb = volume.tsdf.shape[0]
    bs = config.block_size
    vs = config.voxel_size
    cap = config.max_mesh_triangles

    ext_tsdf, ext_weight, ext_color = _neighbor_face_slices(volume, config)

    corner_off = jnp.asarray(T.CORNER_OFFSETS)          # (8, 3)
    tri_table = jnp.asarray(T.TRI_TABLE)                # (256, 15)
    num_tris = jnp.asarray(T.NUM_TRIS)                  # (256,)
    edge_ends = jnp.asarray(T.EDGE_ENDPOINTS)           # (12, 2)

    # --- classify: per-cube config over (NB, 8, 8, 8) cubes ---
    corner_vals = []
    corner_obs = []
    for ci in range(8):
        ox, oy, oz = (int(v) for v in T.CORNER_OFFSETS[ci])
        v = ext_tsdf[:, ox : ox + bs, oy : oy + bs, oz : oz + bs]
        w = ext_weight[:, ox : ox + bs, oy : oy + bs, oz : oz + bs]
        corner_vals.append(v)
        corner_obs.append(w > 0.0)
    observed = corner_obs[0]
    cfg_bits = jnp.zeros_like(corner_vals[0], dtype=jnp.int32)
    for ci in range(8):
        observed = observed & corner_obs[ci]
        cfg_bits = cfg_bits | (
            (corner_vals[ci] < 0.0).astype(jnp.int32) << ci
        )
    allocated = B.allocated_mask(volume, config)[:, None, None, None]
    active = observed & allocated
    counts = jnp.where(active, num_tris[cfg_bits], 0)   # (NB,8,8,8)

    flat_counts = counts.reshape(-1)
    offsets = jnp.cumsum(flat_counts) - flat_counts     # exclusive
    total = jnp.sum(flat_counts)
    offsets = offsets.reshape(counts.shape)

    # World position of each cube's base corner.
    local = jnp.stack(
        jnp.meshgrid(
            jnp.arange(bs), jnp.arange(bs), jnp.arange(bs), indexing="ij"
        ),
        axis=-1,
    )                                                   # (8,8,8,3)
    base_voxel = (
        volume.block_coords[:, None, None, None, :] * bs + local
    ).astype(jnp.float32)                               # (NB,8,8,8,3)

    positions = jnp.zeros((cap, 3, 3), jnp.float32)
    colors = jnp.zeros((cap, 3, 3), jnp.float32)

    def corner_value(arr, ci):
        ox, oy, oz = (int(v) for v in T.CORNER_OFFSETS[ci])
        return arr[:, ox : ox + bs, oy : oy + bs, oz : oz + bs]

    # Precompute per-corner color slices once.
    col_slices = [corner_value(ext_color, ci) for ci in range(8)]

    def edge_vertex(edge_ids):
        """Interpolate vertex pos+color on edges (NB,8,8,8) -> (...,3)."""
        a = edge_ends[edge_ids][..., 0]
        b = edge_ends[edge_ids][..., 1]
        va = jnp.zeros_like(corner_vals[0])
        vb = jnp.zeros_like(corner_vals[0])
        ca = jnp.zeros(corner_vals[0].shape + (3,), jnp.float32)
        cb = jnp.zeros_like(ca)
        pa = jnp.zeros_like(ca)
        pb = jnp.zeros_like(ca)
        for ci in range(8):
            sel_a = (a == ci)[..., None]
            sel_b = (b == ci)[..., None]
            va = jnp.where(sel_a[..., 0], corner_vals[ci], va)
            vb = jnp.where(sel_b[..., 0], corner_vals[ci], vb)
            ca = jnp.where(sel_a, col_slices[ci], ca)
            cb = jnp.where(sel_b, col_slices[ci], cb)
            off = corner_off[ci].astype(jnp.float32)
            pa = jnp.where(sel_a, base_voxel + off, pa)
            pb = jnp.where(sel_b, base_voxel + off, pb)
        t = va / jnp.where(jnp.abs(va - vb) > 1e-12, va - vb, 1.0)
        t = jnp.clip(t, 0.0, 1.0)[..., None]
        pos = (pa + t * (pb - pa)) * vs
        col = ca + t * (cb - ca)
        return pos, col

    overflow = jnp.maximum(total - cap, 0)
    for slot in range(T.MAX_TRIS):
        tri_edges = tri_table[cfg_bits, 3 * slot : 3 * slot + 3]  # (...,3)
        has_tri = active & (slot < counts)
        out_idx = offsets + slot
        ok = has_tri & (out_idx < cap)
        tgt = jnp.where(ok, out_idx, cap).reshape(-1)
        pos_tri = []
        col_tri = []
        for k in range(3):
            p, c = edge_vertex(tri_edges[..., k])
            pos_tri.append(p)
            col_tri.append(c)
        pos_tri = jnp.stack(pos_tri, axis=-2).reshape(-1, 3, 3)
        col_tri = jnp.stack(col_tri, axis=-2).reshape(-1, 3, 3)
        positions = positions.at[tgt].set(pos_tri, mode="drop")
        colors = colors.at[tgt].set(col_tri, mode="drop")

    return Mesh(
        positions=positions,
        colors=jnp.clip(colors, 0.0, 1.0),
        count=jnp.minimum(total, cap).astype(jnp.int32),
        overflow=overflow.astype(jnp.int32),
    )
