"""Visible-block sparse TSDF integration.

TPU-native rebuild of the reference's ``Integrator`` on the hashed volume
(SURVEY.md component #15, ``integrator.cu`` [M]; one CUDA thread per voxel of
each visible block [P:1410.0925] [B]).  Here: one vectorized XLA pass over
the fixed-capacity visible-block batch, shaped (max_visible, 8, 8, 8) --
gather blocks, update, scatter back.  Rows past ``num_visible`` are masked
and scattered to a dropped dummy index, so the pass is branch-free.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..config import Config
from ..core.frame import Frame
from . import blocks as B
from .dense import _sample_nearest, voxel_update


def integrate_sparse(
    volume: B.VolumeState, frame: Frame, config: Config
) -> B.VolumeState:
    """Fuse one frame into the blocks listed in ``volume.visible_ids``."""
    bs = config.block_size
    vs = config.voxel_size
    ids = volume.visible_ids                              # (V,)
    V = ids.shape[0]
    row_valid = (jnp.arange(V, dtype=jnp.int32) < volume.num_visible) & (
        ids > 0
    )

    # World position of every voxel of every visible block.
    coords = volume.block_coords[ids]                     # (V, 3)
    local = jnp.stack(
        jnp.meshgrid(
            jnp.arange(bs), jnp.arange(bs), jnp.arange(bs), indexing="ij"
        ),
        axis=-1,
    )                                                     # (8,8,8,3)
    g = coords[:, None, None, None, :] * bs + local       # (V,8,8,8,3)
    world = g.astype(jnp.float32) * vs

    cam_pts = frame.pose.inverse().apply(world)
    z = cam_pts[..., 2]
    uv = frame.camera.project(cam_pts)
    depth, in_bounds = _sample_nearest(frame.depth, uv)
    color, _ = _sample_nearest(frame.color, uv)
    valid = (
        row_valid[:, None, None, None]
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
    tsdf, weight, col, cweight = voxel_update(
        tsdf, weight, col, cweight, sdf, color, valid, config
    )

    nb = volume.tsdf.shape[0]
    tgt = jnp.where(row_valid, ids, nb)                   # drop masked rows
    return dataclasses.replace(
        volume,
        tsdf=volume.tsdf.at[tgt].set(tsdf, mode="drop"),
        weight=volume.weight.at[tgt].set(weight, mode="drop"),
        color=volume.color.at[tgt].set(col, mode="drop"),
        color_weight=volume.color_weight.at[tgt].set(cweight, mode="drop"),
    )
