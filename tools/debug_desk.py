"""Replay the cached desk-bench frames up to a failing frame and dump
model-render / association diagnostics (back-face-cull bisect, round 3).

Usage: python tools/debug_desk.py [upto_abs_frame=49]
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from vulcan_tpu.core.camera import PinholeCamera
from vulcan_tpu.config import Config
from vulcan_tpu.pipeline import fusion
from vulcan_tpu.io.synthetic import orbit_poses
from vulcan_tpu.ops import icp
from vulcan_tpu.ops.preprocess import build_pyramid

upto = int(sys.argv[1]) if len(sys.argv) > 1 else 49

h, w = 480, 640
config = Config()
camera = PinholeCamera.tum_default()
n_total = 125
poses = orbit_poses(
    n_total, center=(0.0, 0.0, -0.25), radius=1.5, height=0.55,
    span=2.0 * np.pi,
)
data = np.load(f"/tmp/vulcan_bench_frames_desk_0_{n_total}_{h}x{w}.npz")
frames = [(data[f"d{i}"], data[f"c{i}"]) for i in range(n_total)]

state = fusion.init_state(config, camera, h, w, init_pose=poses[0])
for i in range(upto):
    d, c = frames[i]
    state = fusion.step(state, jnp.asarray(d), jnp.asarray(c), config)
    print(
        f"frame {i}: inl={int(state.track_inliers)} "
        f"err={float(state.track_error):.4f} "
        f"fail={int(state.track_failures)}",
        file=sys.stderr, flush=True,
    )

# state.model is the render used to track frame `upto`.
m = state.model
md = np.asarray(m.depth)
mv = np.asarray(m.valid)
print(f"model render after frame {upto-1}:")
print(f"  valid px: {mv.sum()}  depth finite: {np.isfinite(md).sum()}")
dv = md[mv]
print(
    f"  depth over valid: min={dv.min():.3f} max={dv.max():.3f} "
    f"mean={dv.mean():.3f} nan={np.isnan(dv).sum()}"
)
nx = np.asarray(m.nx); ny = np.asarray(m.ny); nz = np.asarray(m.nz)
nn = np.sqrt(nx**2 + ny**2 + nz**2)
print(f"  normal |n|>0.5 px: {(nn > 0.5).sum()}  nan: {np.isnan(nn).sum()}")

# Live frame `upto` stats vs ground truth.
d_raw = frames[upto][0].astype(np.float32) / config.depth_raw_scale
print(f"live frame {upto}: valid={np.count_nonzero(d_raw)} "
      f"range=[{d_raw[d_raw>0].min():.3f},{d_raw.max():.3f}]")

pred = fusion.predict_pose(state, config)
print(f"pred pose t={np.asarray(pred.translation)}")
print(f"gt   pose t={np.asarray(poses[upto].translation)}")
print(f"prev pose t={np.asarray(state.pose.translation)}")

# Run the track that fails and inspect per-level numbers.
frame_live = fusion._to_metric(
    jnp.asarray(frames[upto][0]), jnp.asarray(frames[upto][1]), config
)
from vulcan_tpu.core.frame import Frame

live_pyr = build_pyramid(
    Frame(frame_live[0], frame_live[1], camera, state.pose), config,
    with_intensity=False,
)
model_pyr = icp.model_pyramid(m, config.pyramid_levels, with_intensity=False)
res = icp.track(live_pyr, model_pyr, pred, config, "depth")
print(f"track: inl={int(res.inliers)} err={float(res.error):.5f} "
      f"valid={bool(res.valid)}")
print(f"  level_err={np.asarray(res.level_error)}")
print(f"  level_inl={np.asarray(res.level_inliers)}")
print(f"  result pose t={np.asarray(res.pose.translation)}")

# Dump the raw pose chain for offline NaN forensics.
np.savez(
    "/tmp/desk_pose_dump.npz",
    pose_R=np.asarray(state.pose.rotation),
    pose_t=np.asarray(state.pose.translation),
    prev_R=np.asarray(state.prev_pose.rotation),
    prev_t=np.asarray(state.prev_pose.translation),
)
from vulcan_tpu.core.se3 import SE3 as _SE3

delta = state.pose @ state.prev_pose.inverse()
print("delta R:", np.asarray(delta.rotation))
print("delta t:", np.asarray(delta.translation))
lg = delta.log()
print("log:", np.asarray(lg))
print("exp(0.5*log) t:", np.asarray(_SE3.exp(0.5 * lg).translation))
