"""Capacity / extent stress regressions (VERDICT round-3 item 7).

BASELINE.json config 5 at scale: when a run exhausts the block storage,
the per-frame allocation batch, the visible list, or the packed block-
coordinate extent, the pipeline must degrade GRACEFULLY -- overflow
counters surface the dropped work (SURVEY.md §6 observability), nothing
NaNs, and subsequent frames keep processing.  The reference's CUDA
atomics drop work silently in the same situations; counting is the
deliberate improvement (ops/allocate.py module docstring).
"""
import dataclasses

import jax.numpy as jnp
import numpy as np

from vulcan_tpu.config import TINY
from vulcan_tpu.core.camera import PinholeCamera
from vulcan_tpu.core.se3 import SE3
from vulcan_tpu.io.synthetic import look_at, orbit_poses, render_scene_depth
from vulcan_tpu.pipeline import fusion

CAM = PinholeCamera.create(160.0, 160.0, 99.5, 74.5)
H, W = 150, 200
SPHERES = (
    ((0.0, 0.0, 0.0), 0.5),
    ((0.6, 0.3, 0.2), 0.25),
    ((-0.5, 0.4, -0.1), 0.3),
)


def _finite_state(state) -> bool:
    return all(
        bool(jnp.all(jnp.isfinite(x)))
        for x in (
            state.volume.tsdf,
            state.volume.weight,
            state.model.depth,
            state.pose.translation,
        )
    )


def _run_known_poses(config, n=5, span=0.6 * np.pi):
    poses = orbit_poses(n, radius=1.6, height=0.35, span=span)
    state = fusion.init_state(config, CAM, H, W, init_pose=poses[0])
    for pose in poses:
        depth, color = render_scene_depth(CAM, pose, H, W, SPHERES, -0.6)
        state = fusion.step_known_pose(
            state, jnp.asarray(depth), jnp.asarray(color), pose, config
        )
    return state


def test_block_capacity_overflow_graceful():
    """Drive allocation past num_blocks: the free list must stop at
    capacity, the overflow counter must expose the dropped blocks, and
    fused data must stay finite and renderable."""
    cfg = dataclasses.replace(
        TINY,
        num_blocks=256,        # the orbit scene wants thousands
        hash_size=2048,
        max_visible=256,
        alloc_capacity=1024,
    )
    state = _run_known_poses(cfg)
    allocated = int(state.volume.free_count) - 1
    assert allocated <= cfg.num_blocks - 1
    assert allocated >= cfg.num_blocks // 2  # it did fill up
    assert int(state.volume.alloc_overflow) > 0  # dropped work is counted
    assert _finite_state(state)
    # The volume still renders the geometry it DID fuse.
    assert int(jnp.sum(state.model.valid)) > 100


def test_alloc_batch_overflow_counted():
    """A per-frame candidate batch larger than alloc_capacity surfaces in
    alloc_overflow even when block storage itself has room."""
    cfg = dataclasses.replace(
        TINY,
        alloc_capacity=64,     # far below the scene's per-frame band
        num_blocks=4096,
        hash_size=16384,
        max_visible=1024,
    )
    state = _run_known_poses(cfg, n=2, span=0.1)
    assert int(state.volume.alloc_overflow) > 0
    # Capacity gating, not corruption: allocated rows stay in range.
    assert int(state.volume.free_count) <= cfg.num_blocks
    assert _finite_state(state)


def test_visible_list_overflow_counted():
    cfg = dataclasses.replace(
        TINY,
        max_visible=64,
        num_blocks=4096,
        hash_size=16384,
    )
    state = _run_known_poses(cfg, n=3, span=0.3)
    assert int(state.volume.visible_overflow) > 0
    assert int(state.volume.num_visible) <= 64
    assert _finite_state(state)


def test_pose_beyond_coord_bound_graceful():
    """Geometry beyond the +-512-block packed-coordinate extent
    (blocks.COORD_BOUND: +-32.7 m at the 6.4 cm default block) must fuse
    NOTHING -- candidates fail coords_in_bounds -- rather than wrap the
    packed code into an aliased in-bounds block.  The pipeline keeps
    running and later in-bounds frames fuse normally."""
    cfg = TINY
    # Sphere surface (and its whole truncation band) past the bound:
    # min surface coord = (540 - 0.5/be) blocks ~ 532 > 512.
    far = cfg.block_extent * 540.0
    pose_far = look_at((far + 1.6, 0.0, 0.35), (far, 0.0, 0.0))
    state = fusion.init_state(cfg, CAM, H, W, init_pose=pose_far)
    depth, color = render_scene_depth(
        CAM, pose_far, H, W, (((far, 0.0, 0.0), 0.5),), None
    )
    state = fusion.step_known_pose(
        state, jnp.asarray(depth), jnp.asarray(color), pose_far, cfg
    )
    assert int(state.volume.free_count) == 1  # nothing allocated
    assert _finite_state(state)

    # The same pipeline state recovers on an in-bounds frame.
    pose_ok = look_at((1.6, 0.0, 0.35), (0.0, 0.0, 0.0))
    depth, color = render_scene_depth(CAM, pose_ok, H, W, SPHERES, -0.6)
    state = fusion.step_known_pose(
        state, jnp.asarray(depth), jnp.asarray(color), pose_ok, cfg
    )
    assert int(state.volume.free_count) > 50
    assert _finite_state(state)
    assert int(jnp.sum(state.model.valid)) > 100
