"""Unit tests: trajectory evaluation, timing, volume debug validation."""
import numpy as np

from vulcan_tpu.utils.evaluate import associate_timestamps, ate_rmse, horn_align


def test_horn_align_recovers_rigid_transform():
    rng = np.random.default_rng(0)
    pts = rng.uniform(-1, 1, (50, 3))
    # Ground-truth transform.
    angle = 0.7
    R = np.array(
        [
            [np.cos(angle), -np.sin(angle), 0],
            [np.sin(angle), np.cos(angle), 0],
            [0, 0, 1],
        ]
    )
    t = np.array([0.3, -0.2, 1.1])
    moved = pts @ R.T + t
    R2, t2 = horn_align(pts, moved)
    np.testing.assert_allclose(R2, R, atol=1e-9)
    np.testing.assert_allclose(t2, t, atol=1e-9)


def test_ate_rmse_zero_for_aligned_and_positive_for_noise():
    rng = np.random.default_rng(1)
    gt = rng.uniform(-1, 1, (30, 3))
    est = gt @ np.eye(3) + 0.5  # pure offset: Horn removes it
    assert ate_rmse(est, gt) < 1e-9
    noisy = gt + rng.normal(0, 0.01, gt.shape)
    r = ate_rmse(noisy, gt)
    assert 0.003 < r < 0.03


def test_associate_timestamps_greedy_nearest():
    a = np.array([1.0, 2.0, 3.0, 10.0])
    b = np.array([1.01, 2.05, 2.96, 5.0])
    pairs = associate_timestamps(a, b, max_dt=0.1)
    assert pairs == [(0, 0), (1, 1), (2, 2)]
    # each index used at most once
    pairs = associate_timestamps(
        np.array([1.0, 1.02]), np.array([1.01]), max_dt=0.1
    )
    assert len(pairs) == 1


def test_stage_timer():
    import time

    from vulcan_tpu.utils.timing import StageTimer

    t = StageTimer()
    with t.stage("a"):
        time.sleep(0.01)
    with t.stage("a"):
        time.sleep(0.01)
    s = t.summary()
    # Upper bound is deliberately loose: the 1-core CI box can stall a
    # sleeping process for hundreds of ms under load.
    assert 5 < s["a"] < 5000
    assert t.last_ms["a"] > 5


def test_volume_validate_healthy():
    import dataclasses

    import jax.numpy as jnp

    from vulcan_tpu import Integrator, PinholeCamera, Volume, make_frame
    from vulcan_tpu.config import TINY
    from vulcan_tpu.io.synthetic import orbit_poses, render_sphere_depth

    cfg = dataclasses.replace(TINY, voxel_size=0.02)
    cam = PinholeCamera.create(80.0, 80.0, 39.5, 29.5)
    vol = Volume(cfg)
    integ = Integrator(vol)
    pose = orbit_poses(1, radius=1.6)[0]
    d, c = render_sphere_depth(cam, pose, 60, 80, (0, 0, 0), 0.5)
    integ.integrate(make_frame(d, c, cam, pose))

    rep = vol.validate()
    assert rep["allocated_blocks"] > 10
    assert rep["bad_values"] == 0
    assert rep["duplicate_values"] == 0
    assert rep["count_mismatch"] == 0
    assert rep["alloc_overflow"] == 0
    assert rep["surfel_mismatch"] == 0
    assert rep["surfel_count_mismatch"] == 0

    ids, coords = vol.visible_blocks()
    assert len(ids) == vol.num_visible
    assert coords.shape == (len(ids), 3)
    assert np.all(ids >= 1)


def test_rotmat_quat_roundtrip():
    from vulcan_tpu.io.tum import quat_to_rotmat
    from vulcan_tpu.utils.evaluate import rotmat_to_quat

    rng = np.random.default_rng(0)
    for _ in range(20):
        axis = rng.normal(size=3)
        axis /= np.linalg.norm(axis)
        th = rng.uniform(-np.pi + 1e-3, np.pi - 1e-3)
        K = np.array([[0, -axis[2], axis[1]],
                      [axis[2], 0, -axis[0]],
                      [-axis[1], axis[0], 0]])
        R = np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * K @ K
        q = rotmat_to_quat(R)
        R2 = quat_to_rotmat(q)
        assert np.allclose(R, R2, atol=1e-9), (R, R2)
