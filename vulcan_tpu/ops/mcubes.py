"""Colored marching-cubes mesh extraction from the sparse TSDF volume.

TPU-native rebuild of the reference ``Extractor`` (SURVEY.md component #18,
``extractor.cu`` [M]; per-voxel-cube classify + prefix-scan compaction +
emit kernels [B]).  TPU-first structure:

  1. **Chunked halo construction**: instead of per-corner hash lookups (the
     CUDA pattern), each block gathers its 7 (+x/+y/+z/...) neighbor blocks
     once and builds an extended (9,9,9) halo; every cube corner read is
     then a static slice -- no gathers in the inner loop, missing neighbors
     read the null block (weight 0) so boundary cubes mask out cleanly.
     Blocks are processed ``mesh_chunk`` at a time in a while_loop whose
     trip count follows the ALLOCATED count (allocated slots are the
     contiguous rows [1, free_count) of the free-list prefix), so halo
     temporaries stay ~15 MB regardless of capacity -- full-capacity halos
     at num_blocks=65536 would be multiple GB (round-1 VERDICT item 5).
  2. **Classify**: per-cube config bits + triangle counts from the lookup
     table (tables derived + validated in tools/gen_mc_tables.py).
  3. **Compact**: exclusive cumsum of counts + a running total carried
     across chunks -> global output offsets (replaces the CUDA prefix-scan
     + atomic emit).
  4. **Emit**: for each triangle slot (static MAX_TRIS loop), interpolate
     edge vertices + colors and scatter into a fixed-capacity triangle
     buffer; overflow is counted, never silent.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

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


def _chunk_halos(volume: B.VolumeState, start, CB: int, config: Config):
    """Build (CB, 9, 9, 9[,3]) halo arrays for one chunk of block rows.

    Own-block data comes from contiguous row slices; the 7 face/edge/corner
    neighbors resolve through the hash once per block.  Unallocated rows
    carry weight 0 everywhere (row 0 is the null sentinel, rows beyond
    free_count were never integrated), so no explicit row masking is needed
    in the voxel data -- the observed mask covers it.
    """
    ids = start + jnp.arange(CB, dtype=jnp.int32)
    row_valid = (ids >= 1) & (ids < volume.free_count)
    coords = jax.lax.dynamic_slice_in_dim(volume.block_coords, start, CB)

    def neighbor_idx(offset):
        idx = B.lookup_blocks(
            volume, coords + jnp.asarray(offset, jnp.int32), config
        )
        return jnp.where(row_valid, idx, 0)

    neighbors = {
        off: neighbor_idx(off)
        for off in (
            (1, 0, 0), (0, 1, 0), (0, 0, 1),
            (1, 1, 0), (1, 0, 1), (0, 1, 1), (1, 1, 1),
        )
    }

    def extend(flat_arr):
        """(NB,512[,C]) -> (CB,9,9,9[,C]) using neighbor faces."""
        tail = flat_arr.shape[2:]
        own = jax.lax.dynamic_slice_in_dim(flat_arr, start, CB)
        arr = own.reshape((CB, 8, 8, 8) + tail)
        ext = jnp.zeros((CB, 9, 9, 9) + tail, arr.dtype)
        ext = ext.at[:, :8, :8, :8].set(arr)

        def rows(off):
            return flat_arr[neighbors[off]].reshape((-1, 8, 8, 8) + tail)

        ext = ext.at[:, 8, :8, :8].set(rows((1, 0, 0))[:, 0, :, :])
        ext = ext.at[:, :8, 8, :8].set(rows((0, 1, 0))[:, :, 0, :])
        ext = ext.at[:, :8, :8, 8].set(rows((0, 0, 1))[:, :, :, 0])
        ext = ext.at[:, 8, 8, :8].set(rows((1, 1, 0))[:, 0, 0, :])
        ext = ext.at[:, 8, :8, 8].set(rows((1, 0, 1))[:, 0, :, 0])
        ext = ext.at[:, :8, 8, 8].set(rows((0, 1, 1))[:, :, 0, 0])
        ext = ext.at[:, 8, 8, 8].set(rows((1, 1, 1))[:, 0, 0, 0])
        return ext

    # Halos are gathered in the packed int32 color form (one lane per
    # voxel instead of 3) and unpacked once at the end.
    return (
        extend(volume.tsdf),
        extend(volume.weight),
        B.unpack_voxel_color(extend(volume.colorpack))[0],
        coords,
        row_valid,
    )


def extract_mesh(volume: B.VolumeState, config: Config) -> Mesh:
    """Extract the zero isosurface of every allocated block."""
    nb = volume.tsdf.shape[0]
    bs = config.block_size
    vs = config.voxel_size
    cap = config.max_mesh_triangles
    CB = min(config.mesh_chunk, nb)
    # Rows [0, free_count) cover the null sentinel + every allocated block.
    n_chunks = (volume.free_count + CB - 1) // CB

    corner_off = jnp.asarray(T.CORNER_OFFSETS)          # (8, 3)
    tri_table = jnp.asarray(T.TRI_TABLE)                # (256, 15)
    num_tris = jnp.asarray(T.NUM_TRIS)                  # (256,)
    edge_ends = jnp.asarray(T.EDGE_ENDPOINTS)           # (12, 2)

    positions0 = jnp.zeros((cap, 3, 3), jnp.float32)
    colors0 = jnp.zeros((cap, 3, 3), jnp.float32)

    def chunk_body(carry):
        i, total, dropped, positions, colors = carry
        start = i * CB
        ext_tsdf, ext_weight, ext_color, coords, row_valid = _chunk_halos(
            volume, start, CB, config
        )

        # --- classify: per-cube config over (CB, 8, 8, 8) cubes ---
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
        active = observed & row_valid[:, None, None, None]
        counts = jnp.where(active, num_tris[cfg_bits], 0)   # (CB,8,8,8)

        # --- compact ACTIVE cubes before the emit phase ---------------
        # Only a few percent of cubes carry triangles, but the original
        # emit interpolated edge vertices for EVERY cube: ~120 dense
        # select/blend passes over (CB,8,8,8,3) minor-dim-3 tensors,
        # measured ~3.5-4.5 s for a full production extraction.  One
        # cumsum compaction shrinks every emit tensor by >= 4x (ACT =
        # 1/4 of the chunk covers a two-layer axis-aligned plane through
        # every block -- the densest realistic surface); actives beyond
        # the capacity have their triangles COUNTED into ``dropped``
        # (never silently lost) and excluded from the offsets so the
        # output buffer stays dense.
        N = CB * bs ** 3
        ACT = max(4096, N // 4)
        flat_counts = counts.reshape(-1)
        keep = flat_counts > 0
        order = jnp.cumsum(keep.astype(jnp.int32)) - 1
        kept = keep & (order < ACT)
        elig = jnp.where(kept, flat_counts, 0)
        dropped_tris = jnp.sum(flat_counts) - jnp.sum(elig)
        offsets = total + jnp.cumsum(elig) - elig            # exclusive
        chunk_total = jnp.sum(elig)

        cube_ids = jnp.full((ACT,), N, jnp.int32)
        cube_ids = cube_ids.at[
            jnp.where(kept, order, ACT)
        ].set(jnp.arange(N, dtype=jnp.int32), mode="drop")
        live = cube_ids < N
        safe = jnp.minimum(cube_ids, N - 1)

        def g(x):
            """Dense (flattens to (N,)) -> compacted (ACT,)."""
            return x.reshape(N)[safe]

        cfg_c = g(cfg_bits)
        counts_c = jnp.where(live, g(counts), 0)
        off_c = g(offsets)
        vals_c = [g(v) for v in corner_vals]                 # 8 x (ACT,)
        # Colors gather PACKED (one lane per corner) and unpack at ACT
        # size; ext_color is already unpacked f32 (CB,9,9,9,3) from
        # _chunk_halos, so slice the corner windows and gather per
        # channel -- still (ACT,) gathers, 3 per corner.
        cols_c = []
        for ox, oy, oz in (
            (int(a), int(b), int(c)) for a, b, c in T.CORNER_OFFSETS
        ):
            win = ext_color[:, ox : ox + bs, oy : oy + bs, oz : oz + bs]
            cols_c.append(
                jnp.stack(
                    [g(win[..., ch]) for ch in range(3)], axis=-1
                )
            )                                                # (ACT, 3)

        # World position of each compacted cube's base corner.
        block_of = safe // (bs ** 3)
        lflat = safe % (bs ** 3)
        lx = lflat // (bs * bs)
        ly = (lflat // bs) % bs
        lz = lflat % bs
        base_c = (
            coords[block_of] * bs
            + jnp.stack([lx, ly, lz], axis=-1)
        ).astype(jnp.float32)                                # (ACT, 3)

        def edge_vertex(edge_ids):
            """Interpolate vertex pos+color on edges, (ACT,) -> (ACT,3)."""
            a = edge_ends[edge_ids][..., 0]
            b = edge_ends[edge_ids][..., 1]
            va = jnp.zeros_like(vals_c[0])
            vb = jnp.zeros_like(vals_c[0])
            ca = jnp.zeros((ACT, 3), jnp.float32)
            cb = jnp.zeros_like(ca)
            pa = jnp.zeros_like(ca)
            pb = jnp.zeros_like(ca)
            for ci in range(8):
                sel_a = (a == ci)[..., None]
                sel_b = (b == ci)[..., None]
                va = jnp.where(sel_a[..., 0], vals_c[ci], va)
                vb = jnp.where(sel_b[..., 0], vals_c[ci], vb)
                ca = jnp.where(sel_a, cols_c[ci], ca)
                cb = jnp.where(sel_b, cols_c[ci], cb)
                off = corner_off[ci].astype(jnp.float32)
                pa = jnp.where(sel_a, base_c + off, pa)
                pb = jnp.where(sel_b, base_c + off, pb)
            t = va / jnp.where(jnp.abs(va - vb) > 1e-12, va - vb, 1.0)
            t = jnp.clip(t, 0.0, 1.0)[..., None]
            pos = (pa + t * (pb - pa)) * vs
            col = ca + t * (cb - ca)
            return pos, col

        for slot in range(T.MAX_TRIS):
            tri_edges = tri_table[cfg_c, 3 * slot : 3 * slot + 3]
            has_tri = live & (slot < counts_c)
            out_idx = off_c + slot
            ok = has_tri & (out_idx < cap)
            tgt = jnp.where(ok, out_idx, cap)
            pos_tri = []
            col_tri = []
            for k in range(3):
                p, c = edge_vertex(tri_edges[..., k])
                pos_tri.append(p)
                col_tri.append(c)
            pos_tri = jnp.stack(pos_tri, axis=-2)            # (ACT,3,3)
            col_tri = jnp.stack(col_tri, axis=-2)
            positions = positions.at[tgt].set(pos_tri, mode="drop")
            colors = colors.at[tgt].set(col_tri, mode="drop")

        return i + 1, total + chunk_total, dropped + dropped_tris, \
            positions, colors

    def cond(carry):
        return carry[0] < n_chunks

    _, total, dropped, positions, colors = jax.lax.while_loop(
        cond,
        chunk_body,
        (jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32),
         jnp.asarray(0, jnp.int32), positions0, colors0),
    )

    return Mesh(
        positions=positions,
        colors=jnp.clip(colors, 0.0, 1.0),
        count=jnp.minimum(total, cap).astype(jnp.int32),
        # Dropped work is never silent: triangle-capacity overflow plus
        # triangles of active cubes beyond the per-chunk compaction
        # capacity (ACT; cannot trigger below ~25% surface density).
        overflow=(
            jnp.maximum(total - cap, 0) + dropped
        ).astype(jnp.int32),
    )
