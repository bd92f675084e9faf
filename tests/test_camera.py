import jax.numpy as jnp
import numpy as np

from vulcan_tpu.core.camera import PinholeCamera


def test_project_unproject_roundtrip():
    cam = PinholeCamera.create(525.0, 525.0, 319.5, 239.5)
    rng = np.random.default_rng(0)
    pts = jnp.asarray(
        np.stack(
            [
                rng.uniform(-1, 1, 100),
                rng.uniform(-1, 1, 100),
                rng.uniform(0.5, 4.0, 100),
            ],
            axis=-1,
        ),
        jnp.float32,
    )
    uv = cam.project(pts)
    back = cam.unproject(uv, pts[..., 2])
    np.testing.assert_allclose(back, pts, atol=1e-4)


def test_project_behind_camera_is_invalid():
    cam = PinholeCamera.tum_default()
    uv = cam.project(jnp.asarray([[0.0, 0.0, -1.0], [0.0, 0.0, 0.0]]))
    assert np.all(np.asarray(uv) < -1e8)


def test_rays_center_pixel():
    cam = PinholeCamera.create(500.0, 500.0, 320.0, 240.0)
    rays = cam.rays(480, 640)
    # Pixel exactly at the principal point looks straight down +z.
    np.testing.assert_allclose(rays[240, 320], [0.0, 0.0, 1.0], atol=1e-6)
    assert rays.shape == (480, 640, 3)


def test_scaled_consistency():
    cam = PinholeCamera.tum_default()
    half = cam.scaled(0.5)
    pt = jnp.asarray([0.3, -0.2, 2.0])
    uv_full = cam.project(pt)
    uv_half = half.project(pt)
    # Downsampled pixel (u',v') covers full-res pixels 2u'..2u'+1.
    np.testing.assert_allclose(
        (np.asarray(uv_full) + 0.5) / 2 - 0.5, uv_half, atol=1e-4
    )
