"""Headline benchmark: track+fuse+raycast FPS at 640x480 (BASELINE.json).

Runs the full online pipeline (the same jitted ``fusion.step`` the CLI
uses) on a synthetic 640x480 orbit sequence -- TUM fr1_desk itself is not
downloadable in this environment (SURVEY.md §0), so the workload mirrors
its geometry: production config (8 mm voxels, 4 cm truncation band,
65536-block hash volume), full ICP tracking, per-frame allocation,
integration and raycast.

Prints ONE JSON line:
  {"metric": ..., "value": fps, "unit": "fps", "vs_baseline": fps/30}
vs_baseline is against the 30 FPS north-star target (no published CUDA
numbers were retrievable; BASELINE.md).
"""
from __future__ import annotations

import json
import sys
import time


def main():
    from vulcan_tpu.utils.runtime import setup_cache

    setup_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vulcan_tpu.config import Config
    from vulcan_tpu.core.camera import PinholeCamera
    from vulcan_tpu.io.synthetic import orbit_poses, render_scene_depth
    from vulcan_tpu.pipeline import fusion

    ablate = ""
    for a in sys.argv[1:]:
        if a.startswith("--ablate="):
            ablate = a.split("=", 1)[1]

    h, w = 480, 640
    config = Config(ablate=ablate)
    camera = PinholeCamera.tum_default()
    spheres = (
        ((0.0, 0.0, 0.0), 0.5),
        ((0.6, 0.3, 0.2), 0.25),
        ((-0.5, 0.4, -0.1), 0.3),
        ((0.2, -0.5, 0.3), 0.2),
    )

    noisy = "--noise" in sys.argv
    rng = np.random.default_rng(7)

    n_warm, n_bench = 5, 30
    n_total = n_warm + n_bench
    poses = orbit_poses(
        n_total, radius=1.6, height=0.35, span=min(6.28, n_total * 0.05)
    )
    print("rendering input frames...", file=sys.stderr)
    frames = []
    for pose in poses:
        depth, color = render_scene_depth(camera, pose, h, w, spheres, -0.6)
        if noisy:
            from vulcan_tpu.io.synthetic import add_depth_noise

            depth = add_depth_noise(np.asarray(depth), rng)
        # Raw sensor dtypes (uint16 depth @ TUM scale, uint8 color): what a
        # real camera feed uploads; converted to metric on device.
        d16 = np.clip(
            np.asarray(depth) * config.depth_raw_scale, 0, 65535
        ).astype(np.uint16)
        c8 = np.clip(np.asarray(color) * 255.0, 0, 255).astype(np.uint8)
        frames.append((d16, c8))

    state = fusion.init_state(config, camera, h, w, init_pose=poses[0])

    # Double-buffered feed: device_put of frame i+1 (async H2D) overlaps
    # the device compute of frame i -- a real camera pipeline DMAs the
    # next frame while the current one is processed.
    from vulcan_tpu.utils.runtime import prefetch_to_device

    print("compiling + warmup...", file=sys.stderr)
    for d, c in prefetch_to_device(frames[:n_warm]):
        state = fusion.step(state, d, c, config)
    jax.block_until_ready(state.model.depth)

    print("benchmarking...", file=sys.stderr)
    est = []  # device arrays; kept lazy so collection never forces a sync
    t0 = time.perf_counter()
    for d, c in prefetch_to_device(frames[n_warm : n_warm + n_bench]):
        state = fusion.step(state, d, c, config)
        if noisy:
            # Explicit device copy: the raw buffer is donated (and thus
            # deleted) by the next step.
            est.append(jnp.array(state.pose.translation))
    jax.block_until_ready(state.model.depth)
    dt = time.perf_counter() - t0
    fps = n_bench / dt

    # Sanity: the tracked pipeline must actually have fused + tracked.
    if not ablate:
        assert int(state.volume.free_count) > 100
        assert int(state.track_inliers) > 1000, int(state.track_inliers)

    result = {
        "metric": "track+fuse+raycast FPS @ 640x480 (synthetic orbit, full ICP)",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / 30.0, 3),
    }
    if noisy:
        from vulcan_tpu.utils.evaluate import ate_rmse

        gt = np.stack(
            [np.asarray(p.translation) for p in poses[n_warm:]]
        )
        result["metric"] += " [Kinect-noise depth]"
        result["ate_rmse_m"] = round(
            float(ate_rmse(np.stack([np.asarray(e) for e in est]), gt)), 5
        )
        assert int(state.track_failures) == 0, int(state.track_failures)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
