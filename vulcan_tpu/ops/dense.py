"""Dense-grid TSDF volume: integration and raycast.

This is the M1/M2 backend (BASELINE.json configs 1-2): a plain (X, Y, Z)
voxel grid with no hashing.  The voxel-block-hashed production backend lives
in ``ops/blocks.py`` / ``ops/sparse.py``; both share the same per-voxel TSDF
update rule (SURVEY.md §4.3, InfiniTAM eq. of running weighted average
[P:1410.0925]):

    sdf      = depth(project(voxel)) - z_voxel        (projective signed dist)
    if sdf > -mu:  F <- (W*F + w*clamp(sdf/mu)) / (W + w);  W <- min(W+w, Wmax)

TSDF is stored in [-1, 1] (1 = free space), weight 0 = never observed.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import Config
from ..core.camera import PinholeCamera
from ..core.frame import Frame
from ..core.se3 import SE3
from ..utils.pytree import pytree_dataclass


@pytree_dataclass(meta_fields=("shape",))
class DenseVolumeState:
    """Dense TSDF grid. ``origin`` = world position of voxel (0,0,0) center."""

    shape: tuple[int, int, int]
    tsdf: jax.Array          # (X, Y, Z) float32 in [-1, 1]
    weight: jax.Array        # (X, Y, Z) float32
    color: jax.Array         # (X, Y, Z, 3) float32
    color_weight: jax.Array  # (X, Y, Z) float32
    origin: jax.Array        # (3,) float32 world coords


def create_dense_volume(
    shape: tuple[int, int, int], origin, dtype=jnp.float32
) -> DenseVolumeState:
    return DenseVolumeState(
        shape=tuple(shape),
        tsdf=jnp.ones(shape, dtype),
        weight=jnp.zeros(shape, dtype),
        color=jnp.zeros(shape + (3,), dtype),
        color_weight=jnp.zeros(shape, dtype),
        origin=jnp.asarray(origin, dtype),
    )


def _sample_nearest(img: jax.Array, uv: jax.Array):
    """Nearest-neighbor image sample. Returns (values, valid_mask)."""
    h, w = img.shape[0], img.shape[1]
    u = jnp.round(uv[..., 0]).astype(jnp.int32)
    v = jnp.round(uv[..., 1]).astype(jnp.int32)
    ok = (u >= 0) & (u < w) & (v >= 0) & (v < h)
    uc = jnp.clip(u, 0, w - 1)
    vc = jnp.clip(v, 0, h - 1)
    return img[vc, uc], ok


def voxel_update(
    tsdf, weight, color, color_weight, sdf, sample_color, valid, config: Config
):
    """Shared per-voxel TSDF + color running-average update.

    ``sdf`` is metric signed distance; ``valid`` marks voxels with a usable
    depth sample.  Only voxels with sdf > -mu are touched; color is updated
    inside the truncation band |sdf| < mu [P:1410.0925].
    """
    mu = config.trunc_dist
    update = valid & (sdf > -mu)
    tsdf_obs = jnp.clip(sdf / mu, -1.0, 1.0)
    w_obs = jnp.where(update, 1.0, 0.0)

    new_weight = weight + w_obs
    new_tsdf = jnp.where(
        update,
        (weight * tsdf + w_obs * tsdf_obs) / jnp.maximum(new_weight, 1e-12),
        tsdf,
    )
    new_weight = jnp.minimum(new_weight, config.max_weight)

    cupdate = update & (jnp.abs(sdf) < mu)
    cw_obs = jnp.where(cupdate, 1.0, 0.0)
    new_cweight = color_weight + cw_obs
    new_color = jnp.where(
        cupdate[..., None],
        (color_weight[..., None] * color + cw_obs[..., None] * sample_color)
        / jnp.maximum(new_cweight[..., None], 1e-12),
        color,
    )
    new_cweight = jnp.minimum(new_cweight, config.max_weight)
    return new_tsdf, new_weight, new_color, new_cweight


def integrate_dense(
    volume: DenseVolumeState, frame: Frame, config: Config
) -> DenseVolumeState:
    """Fuse one frame into a dense grid (reference Integrator, component #15).

    One "CUDA thread per voxel" becomes one fully vectorized XLA pass over
    the (X, Y, Z) grid: world coords -> camera -> projective sdf -> update.
    """
    X, Y, Z = volume.shape
    vs = config.voxel_size
    ii, jj, kk = jnp.meshgrid(
        jnp.arange(X, dtype=jnp.float32),
        jnp.arange(Y, dtype=jnp.float32),
        jnp.arange(Z, dtype=jnp.float32),
        indexing="ij",
    )
    world = jnp.stack([ii, jj, kk], axis=-1) * vs + volume.origin
    cam_pts = frame.pose.inverse().apply(world)
    z = cam_pts[..., 2]
    uv = frame.camera.project(cam_pts)
    depth, in_bounds = _sample_nearest(frame.depth, uv)
    color, _ = _sample_nearest(frame.color, uv)
    valid = (
        in_bounds
        & (depth > config.depth_min)
        & (depth < config.depth_max)
        & (z > 0.0)
    )
    sdf = depth - z
    tsdf, weight, col, cweight = voxel_update(
        volume.tsdf,
        volume.weight,
        volume.color,
        volume.color_weight,
        sdf,
        color,
        valid,
        config,
    )
    return DenseVolumeState(
        volume.shape, tsdf, weight, col, cweight, volume.origin
    )


# ---------------------------------------------------------------------------
# Dense raycast (reference Tracer, component #16, on the dense backend)
# ---------------------------------------------------------------------------


def _trilinear(grid: jax.Array, weight: jax.Array, pts: jax.Array):
    """Trilinear sample of a dense grid at voxel-space points (...,3).

    Returns (value, ok) where ok requires all 8 corners observed (weight>0)
    and in bounds.  ``grid`` may be (X,Y,Z) or (X,Y,Z,C).
    """
    X, Y, Z = weight.shape
    p0 = jnp.floor(pts)
    frac = pts - p0
    p0 = p0.astype(jnp.int32)
    val = jnp.zeros(pts.shape[:-1] + grid.shape[3:], grid.dtype)
    ok = jnp.ones(pts.shape[:-1], bool)
    wsum = jnp.zeros(pts.shape[:-1], grid.dtype)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                xi = p0[..., 0] + dx
                yi = p0[..., 1] + dy
                zi = p0[..., 2] + dz
                inb = (
                    (xi >= 0) & (xi < X) & (yi >= 0) & (yi < Y) & (zi >= 0) & (zi < Z)
                )
                xc = jnp.clip(xi, 0, X - 1)
                yc = jnp.clip(yi, 0, Y - 1)
                zc = jnp.clip(zi, 0, Z - 1)
                w = (
                    (frac[..., 0] if dx else 1.0 - frac[..., 0])
                    * (frac[..., 1] if dy else 1.0 - frac[..., 1])
                    * (frac[..., 2] if dz else 1.0 - frac[..., 2])
                )
                g = grid[xc, yc, zc]
                observed = weight[xc, yc, zc] > 0.0
                ok = ok & inb & observed
                if grid.ndim == 4:
                    val = val + w[..., None] * g
                else:
                    val = val + w * g
                wsum = wsum + w
    return val, ok


def raycast_dense(
    volume: DenseVolumeState,
    camera: PinholeCamera,
    pose: SE3,
    height: int,
    width: int,
    config: Config,
):
    """Per-pixel ray march through the dense TSDF -> rendered model maps.

    Fixed-trip-count coarse march (step ~= 0.75 * mu) with sign-change
    detection, then ``refine_steps`` secant iterations on trilinear samples
    (SURVEY.md §4.4).  Returns dict with world-space depth/vertex/normal/
    color maps and a validity mask; invalid pixels are zero.
    """
    vs = config.voxel_size
    rays_cam = camera.rays(height, width)
    rays_world = pose.rotate(rays_cam)                    # (H, W, 3), z-depth 1
    origin = pose.translation                             # (3,)

    def to_voxel(p_world):
        return (p_world - volume.origin) / vs

    step = 0.75 * config.trunc_dist
    n_steps = config.raycast_steps

    def sample_tsdf(t):
        p = origin + t[..., None] * rays_world
        return _trilinear(volume.tsdf, volume.weight, to_voxel(p))

    def body(i, carry):
        t_hit, prev_t, prev_f, done = carry
        t = config.ray_near + i * step
        f, ok = sample_tsdf(jnp.full((height, width), t))
        crossing = ok & (prev_f > 0.0) & (f <= 0.0) & ~done
        t_hit = jnp.where(crossing, t, t_hit)
        done = done | crossing
        prev_t = jnp.where(done, prev_t, t)
        prev_f = jnp.where(ok, f, prev_f)
        return t_hit, prev_t, prev_f, done

    t0 = jnp.full((height, width), config.ray_near)
    f0 = jnp.ones((height, width))
    init = (jnp.zeros((height, width)), t0, f0, jnp.zeros((height, width), bool))
    t_hit, _, _, hit = jax.lax.fori_loop(0, n_steps, body, init)

    # Secant refinement between t_hit - step (F>0) and t_hit (F<=0).
    t_lo = t_hit - step
    t_hi = t_hit

    def refine(_, carry):
        t_lo, t_hi = carry
        f_lo, _ = sample_tsdf(t_lo)
        f_hi, _ = sample_tsdf(t_hi)
        denom = f_lo - f_hi
        alpha = jnp.where(jnp.abs(denom) > 1e-12, f_lo / denom, 0.5)
        t_mid = t_lo + jnp.clip(alpha, 0.0, 1.0) * (t_hi - t_lo)
        f_mid, _ = sample_tsdf(t_mid)
        new_lo = jnp.where(f_mid > 0.0, t_mid, t_lo)
        new_hi = jnp.where(f_mid > 0.0, t_hi, t_mid)
        return new_lo, new_hi

    t_lo, t_hi = jax.lax.fori_loop(0, config.refine_steps, refine, (t_lo, t_hi))
    t_surf = 0.5 * (t_lo + t_hi)

    p_surf = origin + t_surf[..., None] * rays_world
    vox = to_voxel(p_surf)

    # Normal = normalized TSDF gradient (central differences of trilinear).
    def grad_axis(axis):
        e = jnp.zeros((3,)).at[axis].set(0.5)
        fp, okp = _trilinear(volume.tsdf, volume.weight, vox + e)
        fm, okm = _trilinear(volume.tsdf, volume.weight, vox - e)
        return fp - fm, okp & okm

    gx, okx = grad_axis(0)
    gy, oky = grad_axis(1)
    gz, okz = grad_axis(2)
    g = jnp.stack([gx, gy, gz], axis=-1)
    gn = jnp.linalg.norm(g, axis=-1, keepdims=True)
    normal = g / jnp.maximum(gn, 1e-12)
    n_ok = okx & oky & okz & (gn[..., 0] > 1e-12)

    color, _ = _trilinear(volume.color, volume.weight, vox)

    valid = hit & n_ok
    m = valid[..., None]
    return {
        "t": jnp.where(valid, t_surf, 0.0),
        "depth": jnp.where(valid, t_surf, 0.0),  # rays have z=1 => t == z-depth
        "vertex_world": jnp.where(m, p_surf, 0.0),
        "normal_world": jnp.where(m, normal, 0.0),
        "color": jnp.where(m, color, 0.0),
        "valid": valid,
    }
