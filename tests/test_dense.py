"""M1/M2 golden + property tests (BASELINE.json configs 1-2):
single- and multi-frame TSDF fusion into a dense grid, then raycast.
"""
import jax
import jax.numpy as jnp
import numpy as np

from vulcan_tpu.config import Config
from vulcan_tpu.core.camera import PinholeCamera
from vulcan_tpu.core.frame import make_frame
from vulcan_tpu.io.synthetic import (
    orbit_poses,
    render_sphere_depth,
    sphere_sdf,
)
from vulcan_tpu.ops import dense

CFG = Config(voxel_size=0.02, trunc_dist=0.08)
CAM = PinholeCamera.create(120.0, 120.0, 79.5, 59.5)  # 160x120 test camera
H, W = 120, 160
CENTER = (0.0, 0.0, 0.0)
RADIUS = 0.5


def make_volume(n=96):
    # Grid centered on the sphere.
    origin = -np.array([n, n, n]) / 2 * CFG.voxel_size
    return dense.create_dense_volume((n, n, n), origin)


def sphere_frame(pose):
    depth, color = render_sphere_depth(CAM, pose, H, W, CENTER, RADIUS)
    return make_frame(depth, color, CAM, pose)


def test_single_frame_integration_matches_analytic_sdf():
    """Config 1: one synthetic frame into a dense grid; TSDF near the
    observed surface must approximate the analytic sphere SDF."""
    vol = make_volume()
    pose = orbit_poses(1, CENTER, radius=1.6, height=0.0)[0]
    vol = jax.jit(dense.integrate_dense, static_argnums=2)(
        vol, sphere_frame(pose), CFG
    )

    w = np.asarray(vol.weight)
    f = np.asarray(vol.tsdf)
    assert (w > 0).sum() > 1000, "nothing was integrated"

    n = vol.shape[0]
    idx = np.stack(
        np.meshgrid(np.arange(n), np.arange(n), np.arange(n), indexing="ij"),
        axis=-1,
    )
    world = idx * CFG.voxel_size + np.asarray(vol.origin)
    true_sdf = np.asarray(sphere_sdf(jnp.asarray(world), CENTER, RADIUS))
    # Compare where observed and well inside the truncation band.
    band = (w > 0) & (np.abs(true_sdf) < 0.5 * CFG.trunc_dist)
    assert band.sum() > 300
    err = np.abs(f[band] * CFG.trunc_dist - true_sdf[band])
    # Projective TSDF differs from true SDF by a cos factor; tolerance is a
    # fraction of the voxel size + slack for grazing angles.
    assert np.median(err) < CFG.voxel_size
    assert np.mean(err) < 2 * CFG.voxel_size


def test_integration_is_idempotent_up_to_weight():
    """Fusing the same frame twice only increases weight (SURVEY §5 property)."""
    vol = make_volume(64)
    pose = orbit_poses(1, CENTER, radius=1.6)[0]
    frame = sphere_frame(pose)
    v1 = dense.integrate_dense(vol, frame, CFG)
    v2 = dense.integrate_dense(v1, frame, CFG)
    np.testing.assert_allclose(v2.tsdf, v1.tsdf, atol=1e-5)
    touched = np.asarray(v1.weight) > 0
    np.testing.assert_allclose(
        np.asarray(v2.weight)[touched], 2 * np.asarray(v1.weight)[touched]
    )


def test_multiframe_fusion_and_raycast_roundtrip():
    """Config 2: fuse an orbit of frames with known poses, then raycast from a
    held-out pose; rendered depth must match the analytic depth within mu."""
    vol = make_volume()
    poses = orbit_poses(8, CENTER, radius=1.6, height=0.3)
    integrate = jax.jit(dense.integrate_dense, static_argnums=2)
    for pose in poses:
        vol = integrate(vol, sphere_frame(pose), CFG)

    test_pose = orbit_poses(16, CENTER, radius=1.6, height=0.3)[1]
    true_depth, _ = render_sphere_depth(CAM, test_pose, H, W, CENTER, RADIUS)
    out = jax.jit(dense.raycast_dense, static_argnums=(3, 4, 5))(
        vol, CAM, test_pose, H, W, CFG
    )
    got = np.asarray(out["depth"])
    valid = np.asarray(out["valid"]) & (np.asarray(true_depth) > 0)
    assert valid.mean() > 0.1, "raycast found almost no surface"
    err = np.abs(got[valid] - np.asarray(true_depth)[valid])
    assert np.median(err) < 0.5 * CFG.voxel_size
    assert np.mean(err) < CFG.trunc_dist

    # Normals: compare to analytic sphere normals in world space.
    p = np.asarray(out["vertex_world"])[valid]
    n_got = np.asarray(out["normal_world"])[valid]
    n_true = p - np.asarray(CENTER)
    n_true /= np.maximum(np.linalg.norm(n_true, axis=-1, keepdims=True), 1e-9)
    cos = np.sum(n_got * n_true, axis=-1)
    assert np.mean(cos) > 0.95

    # Color: fused color at the surface approximates the procedural texture.
    from vulcan_tpu.io.synthetic import procedural_color

    c_got = np.asarray(out["color"])[valid]
    c_true = np.asarray(procedural_color(jnp.asarray(p)))
    assert np.mean(np.abs(c_got - c_true)) < 0.1


def test_raycast_misses_empty_volume():
    vol = make_volume(32)
    pose = orbit_poses(1)[0]
    out = dense.raycast_dense(vol, CAM, pose, 24, 32, CFG)
    assert not np.any(np.asarray(out["valid"]))
