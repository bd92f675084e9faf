"""Analytic synthetic scenes for tests and offline benchmarks.

There is no network in this environment (SURVEY.md §5), so TUM sequences are
replaced by analytic scenes: exact ray-sphere/plane intersections give
ground-truth depth images, and an orbiting camera gives ground-truth poses.
These drive the golden tests and the staged configs of BASELINE.json.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.camera import PinholeCamera
from ..core.se3 import SE3


def look_at(eye, target, up=(0.0, 0.0, 1.0)) -> SE3:
    """Camera-to-world pose with +z looking from eye toward target.

    Camera convention: x right, y down, z forward (OpenCV / TUM).
    """
    eye = np.asarray(eye, np.float64)
    target = np.asarray(target, np.float64)
    up = np.asarray(up, np.float64)
    z = target - eye
    z = z / np.linalg.norm(z)
    x = np.cross(z, up)
    if np.linalg.norm(x) < 1e-9:
        x = np.cross(z, np.array([0.0, 1.0, 0.0]))
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    R = np.stack([x, y, z], axis=1)  # columns = camera axes in world
    return SE3(jnp.asarray(R, jnp.float32), jnp.asarray(eye, jnp.float32))


def orbit_poses(
    n: int, center=(0.0, 0.0, 0.0), radius: float = 1.5, height: float = 0.4,
    span: float = 2.0 * np.pi,
) -> list[SE3]:
    """n camera poses on a circle around ``center``, looking inward."""
    poses = []
    center = np.asarray(center, np.float64)
    for i in range(n):
        a = span * i / max(n, 1)
        eye = center + np.array(
            [radius * np.cos(a), radius * np.sin(a), height]
        )
        poses.append(look_at(eye, center))
    return poses


def sphere_sdf(points: jax.Array, center, radius: float) -> jax.Array:
    c = jnp.asarray(center, points.dtype)
    return jnp.linalg.norm(points - c, axis=-1) - radius


def procedural_color(points: jax.Array) -> jax.Array:
    """Smooth position-based RGB in [0,1] for colored-fusion tests."""
    return 0.5 + 0.5 * jnp.sin(
        points * jnp.asarray([3.0, 5.0, 7.0], points.dtype)
    )


def render_sphere_depth(
    camera: PinholeCamera,
    pose: SE3,
    height: int,
    width: int,
    center=(0.0, 0.0, 0.0),
    radius: float = 0.5,
):
    """Exact analytic depth + color of a sphere. Returns (depth, color).

    Depth is z-depth (camera-space z), 0 where the ray misses.
    """
    rays_cam = camera.rays(height, width)                 # z = 1
    d_world = pose.rotate(rays_cam)
    o = pose.translation
    c = jnp.asarray(center, jnp.float32)
    oc = o - c
    # Solve |o + t*d - c|^2 = r^2 for t (d not normalized; t is z-depth).
    a = jnp.sum(d_world * d_world, axis=-1)
    b = 2.0 * jnp.sum(d_world * oc, axis=-1)
    cc = jnp.sum(oc * oc) - radius * radius
    disc = b * b - 4.0 * a * cc
    hit = disc >= 0.0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t = (-b - sq) / (2.0 * a)
    hit = hit & (t > 0.0)
    depth = jnp.where(hit, t, 0.0)
    p = o + t[..., None] * d_world
    color = jnp.where(hit[..., None], procedural_color(p), 0.0)
    return depth, color


def add_depth_noise(
    depth,
    rng: np.random.Generator,
    sigma_base: float = 1.2e-3,
    sigma_quad: float = 1.9e-3,
    dropout: float = 0.02,
    hole_count: int = 4,
    hole_radius: int = 6,
    quantize: float = 1.0 / 5000.0,
):
    """Kinect-class sensor noise on an exact synthetic depth image.

    Models the three dominant Kinect/Primesense artifacts (Khoshelham &
    Elberink 2012): axial noise growing quadratically with range
    (sigma(z) = sigma_base + sigma_quad * (z - 0.4)^2), random pixel
    dropout plus a few blob-shaped holes (occlusion shadows / IR
    absorption), and disparity quantization (TUM uint16 = 0.2 mm steps).
    Returns a float32 numpy array; invalid stays 0.
    """
    d = np.asarray(depth, np.float32).copy()
    valid = d > 0.0
    z = np.where(valid, d, 1.0)
    sigma = sigma_base + sigma_quad * np.square(np.maximum(z - 0.4, 0.0))
    d = d + np.where(valid, rng.normal(0.0, 1.0, d.shape) * sigma, 0.0)
    # Random pixel dropout.
    drop = rng.uniform(size=d.shape) < dropout
    # Blob holes: a few disks of invalid depth.
    h, w = d.shape
    yy, xx = np.mgrid[0:h, 0:w]
    for _ in range(hole_count):
        cy, cx = rng.integers(0, h), rng.integers(0, w)
        r = rng.integers(hole_radius // 2, hole_radius + 1)
        drop |= (yy - cy) ** 2 + (xx - cx) ** 2 < r * r
    d = np.where(valid & ~drop, d, 0.0)
    if quantize > 0:
        d = np.round(d / quantize) * quantize
    return d.astype(np.float32)


# Desk-class benchmark scene (VERDICT round-2 item 2): a cluttered
# tabletop with ~18 primitives at varied depths -- much higher depth
# complexity than the 4-sphere orbit scene, mirroring TUM fr1_desk's
# workload (many small objects on a desk, full orbit).  Axis-aligned
# boxes: ((lo_x, lo_y, lo_z), (hi_x, hi_y, hi_z)).
DESK_BOXES = (
    ((-0.70, -0.50, -0.32), (0.70, 0.50, -0.28)),   # table top
    ((-0.65, -0.45, -0.70), (-0.57, -0.37, -0.32)), # 4 legs
    ((0.57, -0.45, -0.70), (0.65, -0.37, -0.32)),
    ((-0.65, 0.37, -0.70), (-0.57, 0.45, -0.32)),
    ((0.57, 0.37, -0.70), (0.65, 0.45, -0.32)),
    ((-0.30, -0.05, -0.28), (0.10, 0.02, 0.02)),    # monitor panel
    ((-0.14, -0.02, -0.28), (-0.06, 0.06, -0.24)),  # monitor base
    ((0.25, -0.35, -0.28), (0.50, -0.10, -0.22)),   # keyboard
    ((-0.55, -0.40, -0.28), (-0.35, -0.18, -0.12)), # book stack
    ((-0.52, -0.37, -0.12), (-0.38, -0.21, -0.06)),
    ((0.30, 0.18, -0.28), (0.44, 0.32, -0.02)),     # box on desk
)
DESK_SPHERES = (
    ((0.18, 0.28, -0.22), 0.06),                    # mug
    ((-0.18, 0.30, -0.20), 0.08),                   # bowl
    ((0.52, 0.05, -0.23), 0.05),                    # apple
    ((-0.05, -0.38, -0.21), 0.07),                  # ball
    ((0.05, 0.40, -0.16), 0.12),                    # vase
    ((-0.40, 0.12, -0.18), 0.10),                   # globe
    ((0.55, 0.35, -0.19), 0.09),
)
DESK_FLOOR = -0.70


def _ray_box_t(o, d_world, lo, hi):
    """Ray-AABB slab intersection; returns (t_entry, hit) with t in
    z-depth units (rays have unit camera-space z, like the spheres)."""
    eps = 1e-9
    inv = 1.0 / jnp.where(jnp.abs(d_world) > eps, d_world, eps)
    t0 = (lo - o) * inv
    t1 = (hi - o) * inv
    t_near = jnp.max(jnp.minimum(t0, t1), axis=-1)
    t_far = jnp.min(jnp.maximum(t0, t1), axis=-1)
    hit = (t_near <= t_far) & (t_far > 0.0) & (t_near > 0.0)
    return t_near, hit


def render_desk_depth(
    camera: PinholeCamera, pose: SE3, height: int, width: int
):
    """Exact depth + color of the cluttered desk scene."""
    rays_cam = camera.rays(height, width)
    d_world = pose.rotate(rays_cam)
    o = pose.translation
    best_t = jnp.full((height, width), jnp.inf)

    for center, radius in DESK_SPHERES:
        c = jnp.asarray(center, jnp.float32)
        oc = o - c
        a = jnp.sum(d_world * d_world, axis=-1)
        b = 2.0 * jnp.sum(d_world * oc, axis=-1)
        cc = jnp.sum(oc * oc) - radius * radius
        disc = b * b - 4.0 * a * cc
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t = (-b - sq) / (2.0 * a)
        ok = (disc >= 0.0) & (t > 0.0)
        best_t = jnp.where(ok & (t < best_t), t, best_t)

    for lo, hi in DESK_BOXES:
        t, ok = _ray_box_t(
            o, d_world, jnp.asarray(lo, jnp.float32),
            jnp.asarray(hi, jnp.float32),
        )
        best_t = jnp.where(ok & (t < best_t), t, best_t)

    dz = d_world[..., 2]
    t = (DESK_FLOOR - o[2]) / jnp.where(jnp.abs(dz) > 1e-9, dz, 1e-9)
    ok = (jnp.abs(dz) > 1e-9) & (t > 0.0)
    best_t = jnp.where(ok & (t < best_t), t, best_t)

    hit = jnp.isfinite(best_t)
    depth = jnp.where(hit, best_t, 0.0)
    p = o + jnp.where(hit, best_t, 0.0)[..., None] * d_world
    # Desk-class texture: the smooth meter-scale procedural_color alone
    # is far blander than a real desk (fr1_desk has posters/keyboards/
    # books -- texture everywhere), which starves photometric tracking
    # exactly where the scene's dominant planes make geometric ICP
    # degenerate.  Modulate with an ~8 cm-scale pattern (10 voxels at
    # the default 8 mm -- coarse enough to fuse cleanly into per-voxel
    # rgb888 color, sharp enough to carry intensity gradient).
    tex = 0.80 + 0.20 * (
        jnp.sin(p[..., 0] * 80.0)
        * jnp.sin(p[..., 1] * 74.0)
        * jnp.sin(p[..., 2] * 68.0)
    )
    color = jnp.where(
        hit[..., None], procedural_color(p) * tex[..., None], 0.0
    )
    return depth, color


def render_scene_depth(
    camera: PinholeCamera,
    pose: SE3,
    height: int,
    width: int,
    spheres=(((0.0, 0.0, 0.0), 0.5),),
    floor_z: float | None = None,
):
    """Depth of a union of spheres (+ optional z=floor_z plane), exact."""
    rays_cam = camera.rays(height, width)
    d_world = pose.rotate(rays_cam)
    o = pose.translation
    best_t = jnp.full((height, width), jnp.inf)
    for center, radius in spheres:
        c = jnp.asarray(center, jnp.float32)
        oc = o - c
        a = jnp.sum(d_world * d_world, axis=-1)
        b = 2.0 * jnp.sum(d_world * oc, axis=-1)
        cc = jnp.sum(oc * oc) - radius * radius
        disc = b * b - 4.0 * a * cc
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t = (-b - sq) / (2.0 * a)
        ok = (disc >= 0.0) & (t > 0.0)
        best_t = jnp.where(ok & (t < best_t), t, best_t)
    if floor_z is not None:
        dz = d_world[..., 2]
        t = (floor_z - o[2]) / jnp.where(jnp.abs(dz) > 1e-9, dz, 1e-9)
        ok = (jnp.abs(dz) > 1e-9) & (t > 0.0)
        best_t = jnp.where(ok & (t < best_t), t, best_t)
    hit = jnp.isfinite(best_t)
    depth = jnp.where(hit, best_t, 0.0)
    p = o + jnp.where(hit, best_t, 0.0)[..., None] * d_world
    color = jnp.where(hit[..., None], procedural_color(p), 0.0)
    return depth, color
