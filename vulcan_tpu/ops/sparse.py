"""Visible-block sparse TSDF integration.

TPU-native rebuild of the reference's ``Integrator`` on the hashed volume
(SURVEY.md component #15, ``integrator.cu`` [M]; one CUDA thread per voxel of
each visible block [P:1410.0925] [B]).  Here: one vectorized XLA pass over
the fixed-capacity visible-block batch, shaped (chunk, 512) --
gather block rows, update, scatter back (rows are contiguous 2KB DMAs,
not per-element scatters).

The pass is chunked (``integrate_chunk`` blocks per while_loop round) and
the loop trip count follows the ACTUAL ``num_visible``: with a static
(max_visible, 512) batch, scenes using a fraction of the capacity would
pay full-capacity depth-image sampling every frame (the per-element image
gathers run at ~130M/s on this TPU -- see render_cache.py).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..config import Config
from ..core.frame import Frame
from . import blocks as B
from .dense import _sample_nearest, voxel_update


def _pack_color(color: jax.Array) -> jax.Array:
    """(H, W, 3) f32 rgb in [0,1] -> (H, W) int32 0xRRGGBB.

    Integration gathers one packed int32 per voxel instead of a
    minor-dim-3 f32 gather: 3-channel gathers force T(4,128)-layout
    relayouts and run at roughly a third the flat-1D rate (PERFORMANCE.md
    cost model)."""
    c8 = jnp.clip(jnp.round(color * 255.0), 0, 255).astype(jnp.int32)
    return (c8[..., 0] << 16) | (c8[..., 1] << 8) | c8[..., 2]


def _unpack_color(packed: jax.Array) -> jax.Array:
    r = (packed >> 16) & 0xFF
    g = (packed >> 8) & 0xFF
    b = packed & 0xFF
    return jnp.stack([r, g, b], axis=-1).astype(jnp.float32) * (1.0 / 255.0)


def _integrate_batch(volume, frame, packed_color, ids, row_valid, config):
    """Fuse one chunk of blocks; returns updated voxel arrays (C, 512)."""
    bs = config.block_size
    vs = config.voxel_size
    coords = volume.block_coords[ids]                     # (C, 3)
    local = jnp.stack(
        jnp.meshgrid(
            jnp.arange(bs), jnp.arange(bs), jnp.arange(bs), indexing="ij"
        ),
        axis=-1,
    ).reshape(-1, 3)                                      # (512, 3)
    g = coords[:, None, :] * bs + local                   # (C, 512, 3)
    world = g.astype(jnp.float32) * vs

    cam_pts = frame.pose.inverse().apply(world)
    z = cam_pts[..., 2]
    uv = frame.camera.project(cam_pts)
    depth, in_bounds = _sample_nearest(frame.depth, uv)
    packed, _ = _sample_nearest(packed_color, uv)
    color = _unpack_color(packed)
    valid = (
        row_valid[:, None]
        & in_bounds
        & (depth > config.depth_min)
        & (depth < config.depth_max)
        & (z > 0.0)
    )
    sdf = depth - z

    tsdf = volume.tsdf[ids]
    weight = volume.weight[ids]
    col = volume.color[ids]
    cweight = volume.color_weight[ids]
    return voxel_update(
        tsdf, weight, col, cweight, sdf, color, valid, config
    )


def integrate_sparse(
    volume: B.VolumeState,
    frame: Frame,
    config: Config,
    ids: jax.Array | None = None,
    count: jax.Array | None = None,
) -> B.VolumeState:
    """Fuse one frame into the listed blocks.

    Default work list: ``volume.visible_ids`` (the reference semantics:
    integrate every frustum-visible block).  The online pipeline passes the
    frame's truncation-BAND list from allocation instead: only those blocks
    can change, and the visible set accumulates the whole in-view history,
    so band integration does ~3-5x less per-voxel depth-image sampling.
    The one semantic difference -- free-space carving of previously-fused
    blocks now only happens inside the band -- matches what the truncation
    update rule can change anyway (voxels at sdf > mu clamp to +1, their
    init value, unless they once held surface).
    """
    work_ids = volume.visible_ids if ids is None else ids
    work_count = volume.num_visible if count is None else count
    V = work_ids.shape[0]
    C = min(getattr(config, "integrate_chunk", 1024), V)
    n_chunks_needed = (work_count + C - 1) // C
    nb = volume.tsdf.shape[0]
    packed_color = _pack_color(frame.color)

    def cond(carry):
        i, _ = carry
        return i < n_chunks_needed

    def body(carry):
        i, vol = carry
        start = i * C
        ids = jax.lax.dynamic_slice_in_dim(work_ids, start, C)
        row_valid = (
            (start + jnp.arange(C, dtype=jnp.int32)) < work_count
        ) & (ids > 0)
        tsdf, weight, col, cweight = _integrate_batch(
            vol, frame, packed_color, ids, row_valid, config
        )
        tgt = jnp.where(row_valid, ids, nb)               # drop masked rows
        vol = dataclasses.replace(
            vol,
            tsdf=vol.tsdf.at[tgt].set(tsdf, mode="drop"),
            weight=vol.weight.at[tgt].set(weight, mode="drop"),
            color=vol.color.at[tgt].set(col, mode="drop"),
            color_weight=vol.color_weight.at[tgt].set(cweight, mode="drop"),
        )
        return i + 1, vol

    _, volume = jax.lax.while_loop(
        cond, body, (jnp.asarray(0, jnp.int32), volume)
    )
    return volume
