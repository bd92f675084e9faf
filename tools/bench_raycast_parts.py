"""Bisect the remaining raycast cost: cache build / range / march / refine."""
import sys
import time

sys.path.insert(0, ".")
from vulcan_tpu.utils.runtime import setup_cache

setup_cache()

import jax
import jax.numpy as jnp
import numpy as np

from vulcan_tpu.config import TINY
from vulcan_tpu.core.camera import PinholeCamera
from vulcan_tpu.io.synthetic import orbit_poses, render_scene_depth
from vulcan_tpu.ops import allocate, render_cache as RC, raycast, sparse
from vulcan_tpu.core.frame import make_frame

config = TINY
H, W = (int(x) for x in (sys.argv[1] if len(sys.argv) > 1 else "120x160").split("x"))


def timeit(name, fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:40s} {(time.perf_counter()-t0)/n*1e3:8.2f} ms")
    return out


def main():
    print("devices:", jax.devices(), f"{H}x{W}")
    camera = PinholeCamera.create(0.8 * W, 0.8 * W, W / 2 - 0.5, H / 2 - 0.5)
    spheres = (((0.0, 0.0, 0.0), 0.5), ((0.6, 0.3, 0.2), 0.25))
    from vulcan_tpu.ops import blocks as B

    vol = B.create_volume(config)
    pose = orbit_poses(1, radius=1.6, height=0.3)[0]
    depth, color = render_scene_depth(camera, pose, H, W, spheres, -0.6)
    frame = make_frame(depth, color, camera, pose)
    vol, _, _ = allocate.allocate_for_frame(vol, frame.depth, camera, pose, config)
    vol = allocate.update_visibility(vol, camera, pose, H, W, config)
    vol = sparse.integrate_sparse(vol, frame, config)
    jax.block_until_ready(vol.tsdf)

    build_j = jax.jit(lambda v: RC.build(v, config))
    cache = timeit("RC.build", build_j, vol)

    range_j = jax.jit(
        lambda v: raycast.compute_range_image(v, camera, pose, H, W, config)
    )
    t_min, t_max = timeit("range image", range_j, vol)

    # march only
    rays_world = pose.rotate(camera.rays(H, W))
    inv_dir = 1.0 / jnp.linalg.norm(rays_world, axis=-1)
    origin = pose.translation
    S = config.raycast_chunk
    step_t = config.raycast_step_scale * config.trunc_dist * inv_dir
    offs = jnp.arange(S, dtype=jnp.float32)

    def march(cache, t_min, t_max):
        inv_vs = 1.0 / config.voxel_size
        has_range = t_min <= t_max
        t0 = jnp.where(has_range, t_min, config.ray_far)
        n_rounds = -(-config.raycast_steps // S)

        def sample_chunk(t_start):
            ts = t_start[..., None] + step_t[..., None] * offs
            gx = jnp.round((origin[0] + ts * rays_world[..., 0:1]) * inv_vs).astype(jnp.int32)
            gy = jnp.round((origin[1] + ts * rays_world[..., 1:2]) * inv_vs).astype(jnp.int32)
            gz = jnp.round((origin[2] + ts * rays_world[..., 2:3]) * inv_vs).astype(jnp.int32)
            return RC.sample_march_texture(cache, gx, gy, gz, config)

        def cond(c):
            i, *_, done = c
            return (i < n_rounds) & ~jnp.all(done)

        def body(c):
            i, t_cur, last_m, t_hit, t_before, done = c
            m = sample_chunk(t_cur)
            prev = jnp.concatenate([last_m[..., None], m[..., :-1]], -1)
            crossing = (prev > 0) & (m <= 0) & (m != RC.MARCH_UNSEEN) & (prev != RC.MARCH_UNSEEN)
            found = jnp.any(crossing, -1) & ~done
            first = jnp.argmax(crossing, -1).astype(jnp.float32)
            th = t_cur + step_t * first
            t_hit = jnp.where(found, th, t_hit)
            t_before = jnp.where(found, th - step_t, t_before)
            done = done | found
            t_cur = t_cur + step_t * S
            done = done | (t_cur > t_max)
            return i + 1, t_cur, m[..., -1], t_hit, t_before, done

        init = (jnp.asarray(0, jnp.int32), t0, jnp.full((H, W), 127, jnp.int8),
                jnp.zeros((H, W)), jnp.zeros((H, W)), ~has_range)
        out = jax.lax.while_loop(cond, body, init)
        return out[3], out[4]

    march_j = jax.jit(march)
    t_hit, t_before = timeit("march (batched)", march_j, cache, t_min, t_max)

    # single chunk sample
    def one_chunk(cache, t0):
        inv_vs = 1.0 / config.voxel_size
        ts = t0[..., None] + step_t[..., None] * offs
        gx = jnp.round((origin[0] + ts * rays_world[..., 0:1]) * inv_vs).astype(jnp.int32)
        gy = jnp.round((origin[1] + ts * rays_world[..., 1:2]) * inv_vs).astype(jnp.int32)
        gz = jnp.round((origin[2] + ts * rays_world[..., 2:3]) * inv_vs).astype(jnp.int32)
        return RC.sample_march_texture(cache, gx, gy, gz, config)

    timeit("  one chunk sample (S gathers)", jax.jit(one_chunk), cache, t_min)

    def refine(cache, t_before, t_hit):
        def sample_tri(t):
            p = origin + t[..., None] * rays_world
            return RC.sample_trilinear(cache, p, config)

        t_lo, t_hi = t_before, t_hit
        f_both, _ = sample_tri(jnp.stack([t_lo, t_hi], 0))
        f_lo, f_hi = f_both[0], f_both[1]

        def step(_, c):
            t_lo, f_lo, t_hi, f_hi = c
            denom = f_lo - f_hi
            alpha = jnp.where(jnp.abs(denom) > 1e-12, f_lo / denom, 0.5)
            t_mid = t_lo + jnp.clip(alpha, 0.0, 1.0) * (t_hi - t_lo)
            f_mid, _ = sample_tri(t_mid)
            pos = f_mid > 0.0
            return (jnp.where(pos, t_mid, t_lo), jnp.where(pos, f_mid, f_lo),
                    jnp.where(pos, t_hi, t_mid), jnp.where(pos, f_hi, f_mid))

        return jax.lax.fori_loop(0, config.refine_steps, step,
                                 (t_lo, f_lo, t_hi, f_hi))[0]

    timeit("refine (secant trilinear)", jax.jit(refine), cache, t_before, t_hit)

    def colorize(cache, t):
        p = origin + t[..., None] * rays_world
        return RC.sample_color(cache, p, config)

    timeit("color sample", jax.jit(colorize), cache, t_hit)

    full_j = jax.jit(
        lambda v: raycast.raycast(v, camera, pose, H, W, config)
    )
    timeit("FULL raycast", full_j, vol)


if __name__ == "__main__":
    main()
