"""Frame-to-model projective ICP tracking.

TPU-native rebuild of the reference ``Tracker`` hierarchy (SURVEY.md
component #17: ``depth_tracker`` geometric ICP, ``color_tracker``
photometric [M]; coarse-to-fine point-to-plane Gauss-Newton with the 6x6
normal equations built and reduced on device [B] [P:1410.0925]).

TPU-first differences from the CUDA reference (SURVEY.md §4.2):
  * per-pixel residual/Jacobian rows are one vectorized XLA pass; the 6x6
    ``J^T W J`` build fuses into 27 planar elementwise+reduce sums
    (``_pp_normal_eqs``) with no (N, 6) Jacobian materialized, instead of
    a hand-written shared-memory tree reduction;
  * the 6x6 solve happens **on device** (Cholesky) inside the same jit, so a
    whole coarse-to-fine track has zero host syncs -- the reference pays a
    device->host readback per GN iteration (SURVEY.md §4.2 "⚠ per-iter
    sync");
  * robust Huber weights instead of hard residual clipping.

Update convention: left-multiplicative, ``T <- exp(xi) @ T`` with twist
``xi = (omega, v)``; for point-to-plane rows the Jacobian is
``J = [v x n, n]``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.lax import Precision

from ..config import Config
from ..core.camera import PinholeCamera
from ..core.frame import FrameMaps
from ..core.se3 import SE3
from ..utils.pytree import pytree_dataclass
from .raycast import Render


@pytree_dataclass
class ModelMaps:
    """Model-side maps for one pyramid level (world space).

    Vertex channels are stored PLANAR ((H, W) each, split once per
    frame): association gathers run per channel, and slicing a channel
    out of an (H, W, 3) T(4,128)-layout array costs a ~0.8 ms strided
    DMA on this TPU -- doing that inside every association round
    dominated ICP's cost (xplane trace, PERFORMANCE.md).

    Association is gather-rate-bound (~130M random elem/s), so the maps
    are bit-packed to minimize gathers per associated pixel:
      * vertex -> TWO int32s (x16|y16, z16|spare), 16-bit fixed point at
        ``_VERTEX_SCALE`` steps/m over +-16 m: ~0.5 mm quantization,
        below the surfel renderer's own output noise;
      * normal + validity -> ONE int32 (10 bits/axis + a valid bit,
        ~0.06 degree quantization).
    Three gathers per pixel instead of the seven of the naive planar
    layout."""

    vpack1: jax.Array         # (H, W) int32: qx<<16 | qy (16-bit fixed)
    vpack2: jax.Array         # (H, W) int32: qz<<16
    npack: jax.Array          # (H, W) int32: valid<<30 | 3x 10-bit normal
    intensity: jax.Array      # (H, W)
    valid: jax.Array          # (H, W) bool (photometric path; associate
                              # reads the packed bit instead)
    camera: PinholeCamera
    world_to_cam: SE3


@pytree_dataclass
class TrackResult:
    pose: SE3                 # live camera-to-world
    error: jax.Array          # () mean robust point-to-plane error (m)
    inliers: jax.Array        # () int32 associated pixels at finest level
    valid: jax.Array          # () bool: enough inliers to trust the pose


_VERTEX_SCALE = 65536.0  # 21-bit fixed-point steps/m: +-16 m at 15 um
                         # (16-bit / 0.24 mm was tried and REVERTED: the
                         # deterministic quantization staircase biases the
                         # normal equations enough to diverge the
                         # 12 deg/frame large-motion canary)


def _pack_vertices(vx, vy, vz):
    """Planar world-vertex channels -> two int32 images holding three
    21-bit signed fixed-point values: p1 = qx<<11 | qy[20:10],
    p2 = qy[9:0]<<22 | qz<<1."""

    def q(v):
        return jnp.clip(
            jnp.round(v * _VERTEX_SCALE), -(1 << 20), (1 << 20) - 1
        ).astype(jnp.int32)

    qx, qy, qz = q(vx), q(vy), q(vz)
    p1 = (qx << 11) | ((qy >> 10) & 0x7FF)
    p2 = ((qy & 0x3FF) << 22) | ((qz & 0x1FFFFF) << 1)
    return p1, p2


def _unpack_vertices(p1, p2):
    s = 1.0 / _VERTEX_SCALE
    qx = p1 >> 11                                   # arithmetic: top 21 bits
    qy = ((p1 & 0x7FF) << 10) | ((p2 >> 22) & 0x3FF)
    qy = (qy << 11) >> 11                           # sign-extend 21 bits
    qz = ((p2 >> 1) & 0x1FFFFF)
    qz = (qz << 11) >> 11
    return (
        qx.astype(jnp.float32) * s,
        qy.astype(jnp.float32) * s,
        qz.astype(jnp.float32) * s,
    )


def _pack_normals(nx, ny, nz, valid) -> jax.Array:
    """Planar unit-normal channels + valid -> one int32 per pixel
    (10 bits per axis + a valid bit; quantization ~0.06 degrees)."""

    def q(n):
        return jnp.clip(jnp.round((n + 1.0) * 511.5), 0, 1023).astype(
            jnp.int32
        )

    return (
        (valid.astype(jnp.int32) << 30)
        | (q(nx) << 20)
        | (q(ny) << 10)
        | q(nz)
    )


def _unpack_normals(p: jax.Array):
    def d(v):
        return v.astype(jnp.float32) * (1.0 / 511.5) - 1.0

    return (
        d((p >> 20) & 0x3FF),
        d((p >> 10) & 0x3FF),
        d(p & 0x3FF),
        (p >> 30) > 0,
    )


def model_pyramid(
    render: Render, levels: int, with_intensity: bool = True
) -> tuple[ModelMaps, ...]:
    """Build model map pyramid from a raycast by nearest subsampling.

    The model Render already stores its vertex/normal channels planar
    ((H, W) each), so no (H, W, 3) channel splits happen anywhere on the
    hot path; normals+validity pack to one int32 image here, and every
    coarser level subsamples the planar views.  ``with_intensity=False``
    (geometric-only tracking) skips the intensity image entirely."""
    from .preprocess import intensity_from_color

    vp1, vp2 = _pack_vertices(render.vx, render.vy, render.vz)
    npack = _pack_normals(render.nx, render.ny, render.nz, render.valid)
    c = intensity_from_color(render.color) if with_intensity else None
    ok = render.valid
    cam = render.camera
    w2c = render.pose.inverse()
    maps = []
    for level in range(levels):
        if level > 0:
            vp1, vp2 = vp1[::2, ::2], vp2[::2, ::2]
            npack, ok = npack[::2, ::2], ok[::2, ::2]
            c = c[::2, ::2] if c is not None else None
            cam = cam.subsampled(2)
        maps.append(ModelMaps(vp1, vp2, npack, c, ok, cam, w2c))
    return tuple(maps)


def model_from_frame_maps(maps: FrameMaps, pose: SE3) -> ModelMaps:
    """Lift camera-space FrameMaps to world-space ModelMaps (used to
    bootstrap tracking before the first raycast, and in tests)."""
    ok = maps.depth > 0.0
    v = jnp.where(ok[..., None], pose.apply(maps.vertices), 0.0)
    n = jnp.where(ok[..., None], pose.rotate(maps.normals), 0.0)
    vp1, vp2 = _pack_vertices(v[..., 0], v[..., 1], v[..., 2])
    return ModelMaps(
        vp1, vp2,
        _pack_normals(n[..., 0], n[..., 1], n[..., 2], ok),
        intensity=maps.intensity,
        valid=ok,
        camera=maps.camera,
        world_to_cam=pose.inverse(),
    )


def _sample_nearest_masked(img, valid, uv):
    h, w = img.shape[0], img.shape[1]
    u = jnp.round(uv[..., 0]).astype(jnp.int32)
    vv = jnp.round(uv[..., 1]).astype(jnp.int32)
    inb = (u >= 0) & (u < w) & (vv >= 0) & (vv < h)
    uc = jnp.clip(u, 0, w - 1)
    vc = jnp.clip(vv, 0, h - 1)
    return img[vc, uc], inb & valid[vc, uc]


def _sample_bilinear(img, uv):
    """Bilinear sample of (H, W) image; returns (value, in_bounds)."""
    h, w = img.shape
    u = uv[..., 0]
    v = uv[..., 1]
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    fu = u - u0
    fv = v - v0
    u0 = u0.astype(jnp.int32)
    v0 = v0.astype(jnp.int32)
    inb = (u0 >= 0) & (u0 + 1 < w) & (v0 >= 0) & (v0 + 1 < h)
    u0c = jnp.clip(u0, 0, w - 2)
    v0c = jnp.clip(v0, 0, h - 2)
    i00 = img[v0c, u0c]
    i01 = img[v0c, u0c + 1]
    i10 = img[v0c + 1, u0c]
    i11 = img[v0c + 1, u0c + 1]
    val = (
        i00 * (1 - fu) * (1 - fv)
        + i01 * fu * (1 - fv)
        + i10 * (1 - fu) * fv
        + i11 * fu * fv
    )
    return val, inb


def _huber_weight(r, delta):
    a = jnp.abs(r)
    return jnp.where(a <= delta, 1.0, delta / jnp.maximum(a, 1e-12))


def associate_depth(
    live: FrameMaps, model: ModelMaps, pose: SE3, config: Config
):
    """Projective association: the GATHER half of point-to-plane ICP.

    For each live pixel, warp into the model frame at ``pose`` and sample
    the model vertex/normal maps (nearest).  Returns (v_m, n_m, ok) --
    fixed correspondences for the dense GN re-linearizations that follow
    (warp-once: on TPU the random-access sampling here dominates ICP cost,
    so it runs ``icp_assoc[level]`` times per level, not once per GN
    iteration like the reference's per-pixel kernel).

    Sampling is per-CHANNEL from the planar (H, W) model arrays:
    gathers from (H, W, 3) arrays carry a minor-dim-3 T(4,128) layout
    and run at about half the flat rate (PERFORMANCE.md cost model).
    """
    v_w = pose.apply(live.vertices)
    p_m = model.world_to_cam.apply(v_w)
    uv = model.camera.project(p_m)

    h, w = model.valid.shape
    u = jnp.round(uv[..., 0]).astype(jnp.int32)
    vv = jnp.round(uv[..., 1]).astype(jnp.int32)
    inb = (u >= 0) & (u < w) & (vv >= 0) & (vv < h)
    uc = jnp.clip(u, 0, w - 1)
    vc = jnp.clip(vv, 0, h - 1)
    mvx, mvy, mvz = _unpack_vertices(
        model.vpack1[vc, uc], model.vpack2[vc, uc]
    )
    v_m = jnp.stack([mvx, mvy, mvz], axis=-1)
    nx, ny, nz, okn = _unpack_normals(model.npack[vc, uc])
    n_m = jnp.stack([nx, ny, nz], axis=-1)
    ok_v = inb & okn
    # Sensor-range gate: correspondences beyond depth_max (possible in
    # synthetic scenes; a real sensor cannot produce them) are dropped on
    # the live side, which also keeps every packable model vertex within
    # the +-16 m fixed-point range (model renders are bounded by ray_far).
    ok = (
        (live.depth > config.depth_min)
        & (live.depth < config.depth_max)
        & ok_v
        & (p_m[..., 2] > 0.0)
    )
    return v_m, n_m, ok


def depth_rows_fixed(
    live: FrameMaps, v_m, n_m, assoc_ok, pose: SE3, config: Config
):
    """Point-to-plane rows from FIXED correspondences: pure dense math.

    Returns (J (N,6), r (N,), w (N,)) with w=0 for gated-out pixels.  The
    distance/normal gates re-evaluate against the CURRENT pose so stale
    pairs drop out as the estimate moves.
    """
    v_w = pose.apply(live.vertices)               # live vertices in world
    n_w = pose.rotate(live.normals)

    diff = v_w - v_m
    dist = jnp.linalg.norm(diff, axis=-1)
    n_dot = jnp.sum(n_w * n_m, axis=-1)
    gate = (
        assoc_ok
        & (dist < config.icp_dist_thresh)
        & (n_dot > config.icp_normal_thresh)
    )
    r = jnp.sum(n_m * diff, axis=-1)
    J = jnp.concatenate([jnp.cross(v_w, n_m), n_m], axis=-1)  # (H,W,6)
    w = jnp.where(gate, _huber_weight(r, config.icp_huber_delta), 0.0)
    return (
        J.reshape(-1, 6),
        r.reshape(-1),
        w.reshape(-1),
    )


def depth_rows(
    live: FrameMaps, model: ModelMaps, pose: SE3, config: Config
):
    """Associate + rows in one call (reference-style per-iteration path)."""
    v_m, n_m, ok = associate_depth(live, model, pose, config)
    return depth_rows_fixed(live, v_m, n_m, ok, pose, config)


def _pp_normal_eqs(live: FrameMaps, v_m, n_m, assoc_ok, pose: SE3,
                   config: Config):
    """Point-to-plane 6x6 normal equations as 27 FUSED planar reductions.

    Equivalent to depth_rows_fixed + normal_equations, but never
    materializes the (N, 6) Jacobian: building J as an array forces a
    minor-dim-6 relayout EVERY GN iteration (xplane trace), while 21
    upper-triangle sums of w*j_a*j_b + 6 of w*j_a*r + error/count fuse
    into one elementwise+reduce pass with no intermediate at all.
    Returns (H (6,6), b (6,), err, cnt).
    """
    v_w = pose.apply(live.vertices)
    n_w = pose.rotate(live.normals)
    dx = v_w[..., 0] - v_m[..., 0]
    dy = v_w[..., 1] - v_m[..., 1]
    dz = v_w[..., 2] - v_m[..., 2]
    nx, ny, nz = n_m[..., 0], n_m[..., 1], n_m[..., 2]
    dist2 = dx * dx + dy * dy + dz * dz
    n_dot = (
        n_w[..., 0] * nx + n_w[..., 1] * ny + n_w[..., 2] * nz
    )
    gate = (
        assoc_ok
        & (dist2 < config.icp_dist_thresh**2)
        & (n_dot > config.icp_normal_thresh)
    )
    r = nx * dx + ny * dy + nz * dz
    w = jnp.where(gate, _huber_weight(r, config.icp_huber_delta), 0.0)

    vx, vy, vz = v_w[..., 0], v_w[..., 1], v_w[..., 2]
    j = (
        vy * nz - vz * ny,          # [v x n]
        vz * nx - vx * nz,
        vx * ny - vy * nx,
        nx, ny, nz,                 # [n]
    )
    H = jnp.zeros((6, 6))
    b = jnp.zeros((6,))
    for a in range(6):
        wj = w * j[a]
        for c in range(a, 6):
            s = jnp.sum(wj * j[c])
            H = H.at[a, c].set(s)
            if c != a:
                H = H.at[c, a].set(s)
        b = b.at[a].set(jnp.sum(wj * r))
    err = jnp.sum(w * r * r)
    cnt = jnp.sum((w > 0.0).astype(jnp.float32))
    return H, b, err, cnt


def color_rows(
    live: FrameMaps, model: ModelMaps, pose: SE3, config: Config
):
    """Photometric rows: r = I_model(pi(T v_live)) - I_live(u).

    The reference's ``ColorTracker`` [M].  Model intensity and its image
    gradient are sampled bilinearly; the chain rule goes through the model
    projection.
    """
    v_live = live.vertices
    live_ok = (live.depth > config.depth_min) & (live.depth < config.depth_max)
    i_live = live.intensity

    v_w = pose.apply(v_live)
    p_m = model.world_to_cam.apply(v_w)
    uv = model.camera.project(p_m)

    i_m, inb = _sample_bilinear(model.intensity, uv)
    _, ok_m = _sample_nearest_masked(
        model.intensity, model.valid, uv
    )

    # Image gradients of model intensity (central differences, bilinear).
    gx, _ = _sample_bilinear(model.intensity, uv + jnp.asarray([0.5, 0.0]))
    gx2, _ = _sample_bilinear(model.intensity, uv - jnp.asarray([0.5, 0.0]))
    gy, _ = _sample_bilinear(model.intensity, uv + jnp.asarray([0.0, 0.5]))
    gy2, _ = _sample_bilinear(model.intensity, uv - jnp.asarray([0.0, 0.5]))
    grad = jnp.stack([gx - gx2, gy - gy2], axis=-1)           # dI/d(uv)

    x, y, z = p_m[..., 0], p_m[..., 1], p_m[..., 2]
    zc = jnp.maximum(z, 1e-6)
    fx, fy = model.camera.fx, model.camera.fy
    # d(uv)/d(p_m): standard pinhole Jacobian.
    du = jnp.stack([fx / zc, jnp.zeros_like(zc), -fx * x / (zc * zc)], -1)
    dv = jnp.stack([jnp.zeros_like(zc), fy / zc, -fy * y / (zc * zc)], -1)
    g_p = grad[..., 0:1] * du + grad[..., 1:2] * dv           # dI/dp_m (3,)
    # dp_m/dxi = R_m^{-1} [ -[v_w]x | I ].
    g_w = model.world_to_cam.inverse().rotate(g_p)            # back to world
    J = jnp.concatenate([jnp.cross(v_w, g_w), g_w], axis=-1)
    r = i_m - i_live
    gate = live_ok & inb & ok_m & (z > 0.0)
    w = jnp.where(gate, _huber_weight(r, config.rgb_huber_delta), 0.0)
    s = config.rgb_weight
    return (
        (s * J).reshape(-1, 6),
        (s * r).reshape(-1),
        w.reshape(-1),
    )


def normal_equations(J, r, w):
    """H = J^T W J (6x6), b = J^T W r (6,) -- one MXU matmul each."""
    Jw = J * w[:, None]
    H = jnp.matmul(Jw.T, J, precision=Precision.HIGHEST)
    b = jnp.matmul(Jw.T, r, precision=Precision.HIGHEST)
    return H, b


def solve_gn(H, b, damping):
    """Damped Gauss-Newton step, solved on device via Cholesky."""
    d = jnp.diagonal(H)
    Hd = H + damping * jnp.diag(jnp.maximum(d, 1e-12)) + 1e-12 * jnp.eye(6)
    L = jnp.linalg.cholesky(Hd)
    delta = jax.scipy.linalg.cho_solve((L, True), -b)
    finite = jnp.all(jnp.isfinite(delta))
    return jnp.where(finite, delta, 0.0)


def track(
    live_pyramid: tuple[FrameMaps, ...],
    model_pyr: tuple[ModelMaps, ...],
    init_pose: SE3,
    config: Config,
    mode: str = "depth",
) -> TrackResult:
    """Coarse-to-fine GN over the pyramid; fully on device, zero syncs.

    ``mode``: "depth" (geometric point-to-plane), "color" (photometric), or
    "combined" (sum of both normal equations).
    """
    pose = init_pose

    def level_rows(live, model, pose):
        Hs = jnp.zeros((6, 6))
        bs = jnp.zeros((6,))
        err = jnp.zeros(())
        cnt = jnp.zeros(())
        if mode in ("depth", "combined"):
            J, r, w = depth_rows(live, model, pose, config)
            H, b = normal_equations(J, r, w)
            Hs, bs = Hs + H, bs + b
            err = err + jnp.sum(w * r * r)
            cnt = cnt + jnp.sum(w > 0.0)
        if mode in ("color", "combined"):
            J, r, w = color_rows(live, model, pose, config)
            H, b = normal_equations(J, r, w)
            Hs, bs = Hs + H, bs + b
            if mode == "color":
                err = err + jnp.sum(w * r * r)
                cnt = cnt + jnp.sum(w > 0.0)
        return Hs, bs, err, cnt

    err = jnp.zeros(())
    inl = jnp.zeros(())
    for level in range(config.pyramid_levels - 1, -1, -1):
        live = live_pyramid[level]
        model = model_pyr[level]
        iters = config.icp_iters[level]
        strides = config.icp_stride
        if isinstance(strides, int):  # scalar legacy form: finest only
            strides = (strides,) + (1,) * (config.pyramid_levels - 1)
        if strides[level] > 1:
            # Subsample the live side: association gathers dominate ICP's
            # cost on TPU; point-to-plane accuracy is retained by the
            # full-res model side and the statistics of ~19k pairs.
            st = strides[level]
            live = FrameMaps(
                depth=live.depth[::st, ::st],
                vertices=live.vertices[::st, ::st],
                normals=live.normals[::st, ::st],
                intensity=(
                    live.intensity[::st, ::st]
                    if live.intensity is not None
                    else None
                ),
                camera=live.camera,
            )

        if mode == "depth":
            # Warp-once: ``icp_assoc[level]`` association (gather) rounds,
            # each followed by dense GN re-linearizations on the fixed
            # correspondences -- the reference re-associates every
            # iteration, which on TPU pays the full random-access rate
            # per iteration for associations that barely move.
            rounds = max(1, min(config.icp_assoc[level], iters))
            inner = -(-iters // rounds)  # ceil

            for _round in range(rounds):
                v_m, n_m, ok = associate_depth(live, model, pose, config)

                def body_fixed(_, carry, v_m=v_m, n_m=n_m, ok=ok):
                    pose, err, inl = carry
                    H, b, e, c = _pp_normal_eqs(
                        live, v_m, n_m, ok, pose, config
                    )
                    delta = solve_gn(H, b, config.icp_damping)
                    enough = c >= 6.0
                    delta = jnp.where(enough, delta, jnp.zeros((6,)))
                    new_pose = SE3.exp(delta) @ pose
                    return new_pose, e / jnp.maximum(c, 1.0), c

                pose, err, inl = jax.lax.fori_loop(
                    0, inner, body_fixed, (pose, err, inl)
                )
            continue

        def body(_, carry):
            pose, err, inl = carry
            H, b, e, c = level_rows(live, model, pose)
            delta = solve_gn(H, b, config.icp_damping)
            # Reject steps with too few constraints.
            enough = c >= 6.0
            delta = jnp.where(enough, delta, jnp.zeros((6,)))
            new_pose = SE3.exp(delta) @ pose
            return new_pose, e / jnp.maximum(c, 1.0), c

        pose, err, inl = jax.lax.fori_loop(
            0, iters, body, (pose, err, inl)
        )

    return TrackResult(
        pose=pose,
        error=jnp.sqrt(err),
        inliers=inl.astype(jnp.int32),
        valid=inl >= float(config.icp_min_inliers),
    )
