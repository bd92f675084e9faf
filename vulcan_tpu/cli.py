"""Command-line app: the rebuild of the reference's ``apps/vulcan`` main
loop (SURVEY.md component #21): dataset in, per-frame track+fuse+raycast,
timing, mesh out.

Usage examples:
  vulcan-tpu run --synthetic 100 --mesh-out scene.ply --verbose
  vulcan-tpu run --dataset /data/rgbd_dataset_freiburg1_desk \\
      --mesh-out desk.ply --eval-ate --profile
  vulcan-tpu run --dataset ... --known-poses   # fusion-only (configs 2-3)
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(prog="vulcan-tpu")
    sub = p.add_subparsers(dest="cmd", required=True)
    r = sub.add_parser("run", help="run the online reconstruction pipeline")
    r.add_argument("--dataset", help="TUM RGB-D sequence directory")
    r.add_argument(
        "--synthetic",
        type=int,
        default=0,
        metavar="N",
        help="run N synthetic orbit frames instead of a dataset",
    )
    r.add_argument("--width", type=int, default=640)
    r.add_argument("--height", type=int, default=480)
    r.add_argument("--frames", type=int, default=0, help="frame limit (0=all)")
    r.add_argument("--preset", default="default",
                   choices=["default", "tiny"],
                   help="tiny = small capacities for CPU smoke runs")
    r.add_argument("--voxel-size", type=float, default=None)
    r.add_argument("--trunc", type=float, default=None)
    r.add_argument("--mode", default="combined",
                   choices=["depth", "color", "combined", "light"],
                   help="tracking mode (default: combined -- geometric + "
                        "photometric, the robust production choice: the "
                        "round-5 replays measured depth-only ICP sliding "
                        "into a wrong basin on the cluttered-desk scene at "
                        "HEALTHY conditioning scores, a failure no online "
                        "statistic flags, while combined mode holds 0.022 m "
                        "ATE at >=30 FPS device-bound.  'depth' is the "
                        "max-throughput option for well-conditioned "
                        "geometry (52+ FPS at 640x480)")
    r.add_argument("--known-poses", action="store_true",
                   help="fusion-only with ground-truth poses")
    r.add_argument("--mesh-out", help="write final mesh PLY here")
    r.add_argument("--mesh-every", type=int, default=0, metavar="N",
                   help="extract a colored mesh every N frames during the "
                        "online run (BASELINE.json config 5; the periodic "
                        "extraction cost is part of the reported FPS). "
                        "The latest mesh replaces the previous one; with "
                        "--mesh-out the final mesh is written as usual. "
                        "Uses the INCREMENTAL per-block triangle cache "
                        "(only re-integrated blocks re-mesh).")
    r.add_argument("--mesh-full", action="store_true",
                   help="with --mesh-every: re-extract the FULL volume "
                        "each time instead of the incremental cache "
                        "(slower; for comparison/verification)")
    r.add_argument("--snapshot-out", help="write volume .npz snapshot here")
    r.add_argument("--resume", help="resume from a volume snapshot")
    r.add_argument("--eval-ate", action="store_true",
                   help="report ATE RMSE against ground truth")
    r.add_argument("--verbose", action="store_true")
    r.add_argument("--log-every", type=int, default=10)
    r.add_argument("--profile", action="store_true",
                   help="per-stage timing via blocked sub-steps")
    r.add_argument("--trace-dir", help="write a jax.profiler trace here")
    r.add_argument("--traj-out",
                   help="write the estimated trajectory here "
                        "(TUM format: ts tx ty tz qx qy qz qw)")

    m = sub.add_parser(
        "mesh", help="extract a mesh from a saved volume snapshot"
    )
    m.add_argument("snapshot", help="volume .npz written by --snapshot-out")
    m.add_argument("--out", required=True, help="output PLY path")
    m.add_argument("--preset", default="default",
                   choices=["default", "tiny"])
    m.add_argument("--voxel-size", type=float, default=None)
    m.add_argument("--trunc", type=float, default=None)
    return p


def _make_config(args):
    from .config import TINY, Config

    cfg = TINY if args.preset == "tiny" else Config()
    updates = {}
    if args.voxel_size:
        updates["voxel_size"] = args.voxel_size
    if args.trunc:
        updates["trunc_dist"] = args.trunc
    return dataclasses.replace(cfg, **updates) if updates else cfg


def _synthetic_frames(args):
    """Orbit around a cluster of spheres + floor; ground-truth poses."""
    from .core.camera import PinholeCamera
    from .io.synthetic import orbit_poses, render_scene_depth

    h, w = args.height, args.width
    camera = PinholeCamera.create(
        0.8 * w, 0.8 * w, w / 2 - 0.5, h / 2 - 0.5
    )
    spheres = (
        ((0.0, 0.0, 0.0), 0.5),
        ((0.6, 0.3, 0.2), 0.25),
        ((-0.5, 0.4, -0.1), 0.3),
    )
    # ~3 deg/frame: realistic handheld-camera motion (a full-2pi orbit over
    # few frames would exceed any ICP convergence basin).
    span = min(2 * np.pi, args.synthetic * 0.05)
    poses = orbit_poses(args.synthetic, radius=1.6, height=0.35, span=span)
    for pose in poses:
        depth, color = render_scene_depth(camera, pose, h, w, spheres, -0.6)
        yield np.asarray(depth), np.asarray(color), pose
    return


def cmd_run(args):
    from .utils.runtime import setup_cache

    setup_cache()

    from .pipeline.api import Pipeline
    from .utils.timing import StageTimer

    config = _make_config(args)

    if args.synthetic:
        import itertools

        # Stream, don't materialize: long runs must not hold every frame.
        frame_iter = _synthetic_frames(args)
        first = next(frame_iter)
        frames = itertools.chain([first], frame_iter)
        from .core.camera import PinholeCamera

        h, w = args.height, args.width
        camera = PinholeCamera.create(0.8 * w, 0.8 * w, w / 2 - 0.5, h / 2 - 0.5)
    elif args.dataset:
        from .io.tum import TumDataset

        try:
            ds = TumDataset(args.dataset)
        except FileNotFoundError as e:
            print(
                f"error: not a TUM sequence directory "
                f"(missing {e.filename})",
                file=sys.stderr,
            )
            return 1
        camera = ds.camera
        frames = ds
        d0, _, _ = ds.load(0)
        h, w = d0.shape
    else:
        print("need --dataset or --synthetic N", file=sys.stderr)
        return 2

    if not args.synthetic:
        first = frames.load(0)
    init_pose = first[2]
    pipe = Pipeline(config, camera, h, w, init_pose=init_pose, mode=args.mode)
    if args.resume:
        from .pipeline.api import Volume

        vol = Volume(config)
        vol.load(args.resume)
        pipe.state = dataclasses.replace(pipe.state, volume=vol.state)

    timer = StageTimer()
    est_traj, gt_traj = [], []
    traj_rows = []  # (ts, R, t) when --traj-out
    # Real sensor timestamps when available: TUM evaluation tools associate
    # estimate vs groundtruth.txt by timestamp, so exporting frame indices
    # for a dataset run would make the trajectory unevaluable.
    frame_ts = (
        [f.timestamp for f in frames.frames]
        if args.dataset and hasattr(frames, "frames")
        else None
    )
    n_done = 0
    t_loop = None
    trace_ctx = None
    mesh_fn = None
    last_mesh = None
    n_meshed = 0
    if args.mesh_every:
        import jax as _jax

        from .ops import mcubes as _mcubes

        if args.mesh_full:
            _extract = _jax.jit(
                _mcubes.extract_mesh, static_argnames=("config",)
            )

            def mesh_fn(state):
                return state, _extract(state.volume, config)
        else:
            # Incremental: per-block triangle cache, re-meshing only the
            # blocks integration dirtied since the last extraction.
            # Donation matters: without it every update would copy the
            # whole voxel volume just to clear the dirty flags.
            _cache = _mcubes.create_mesh_cache(config)
            _update = _jax.jit(
                _mcubes.update_mesh_cache,
                static_argnums=2, donate_argnums=(0, 1),
            )
            _decode = _jax.jit(
                _mcubes.cache_to_mesh, static_argnums=2
            )

            def mesh_fn(state):
                nonlocal _cache
                vol, _cache = _update(state.volume, _cache, config)
                state = dataclasses.replace(state, volume=vol)
                return state, _decode(vol, _cache, config)
    from .utils.runtime import prefetch_to_device

    for i, (depth, color, gt_pose) in enumerate(
        prefetch_to_device(frames)
    ):
        if args.frames and i >= args.frames:
            break
        if args.trace_dir and i == 2:  # skip compile frames, then trace
            import jax

            trace_ctx = jax.profiler.trace(args.trace_dir)
            trace_ctx.__enter__()
        pose = gt_pose if (args.known_poses and gt_pose is not None) else None
        with timer.stage("step"):
            pipe.process(depth, color, pose=pose)
        if i == 0:
            import jax
            import jax.numpy as jnp

            # Sum-barrier: readiness of the donated output buffer can
            # report early on some platforms (see bench.py barrier()).
            jax.block_until_ready(jnp.sum(pipe.state.model.depth))
            if mesh_fn is not None:
                # Compile the extraction before the timer starts.
                pipe.state, warm_mesh = mesh_fn(pipe.state)
                jax.block_until_ready(warm_mesh.count)
            t_loop = time.perf_counter()  # exclude compile from FPS
        n_done += 1
        if mesh_fn is not None and n_done % args.mesh_every == 0:
            # Dispatched before the next step (in-order device stream:
            # the extraction reads the volume before donation reuses it);
            # stays lazy -- no host sync in the loop.
            pipe.state, last_mesh = mesh_fn(pipe.state)
            n_meshed += 1
        if gt_pose is not None:
            est_traj.append(np.asarray(pipe.pose.translation))
            gt_traj.append(np.asarray(gt_pose.translation))
        if args.traj_out:
            ts = frame_ts[i] if frame_ts is not None else float(i)
            traj_rows.append(
                (ts, np.asarray(pipe.pose.rotation),
                 np.asarray(pipe.pose.translation))
            )
        if args.verbose and i % args.log_every == 0:
            d = pipe.diagnostics()
            d["stage_ms"] = timer.last_ms
            print(json.dumps(d))

    import jax
    import jax.numpy as jnp

    jax.block_until_ready(jnp.sum(pipe.state.model.depth))
    if trace_ctx is not None:
        trace_ctx.__exit__(None, None, None)
    elapsed = time.perf_counter() - (t_loop or time.perf_counter())
    fps = (n_done - 1) / elapsed if n_done > 1 and elapsed > 0 else 0.0

    report = {"frames": n_done, "fps": round(fps, 2)}
    report.update(pipe.diagnostics())
    if mesh_fn is not None:
        report["mesh_extractions"] = n_meshed
        if last_mesh is not None:
            report["mesh_triangles_online"] = int(last_mesh.count)
    if args.eval_ate and len(est_traj) > 2:
        from .utils.evaluate import ate_rmse

        report["ate_rmse_m"] = round(
            ate_rmse(np.stack(est_traj), np.stack(gt_traj)), 5
        )
    if args.mesh_out:
        report["mesh_triangles"] = pipe.export_ply(args.mesh_out)
    if args.snapshot_out:
        from .pipeline.api import Volume

        vol = Volume(config)
        vol.state = pipe.state.volume
        vol.save(args.snapshot_out)
        report["snapshot"] = args.snapshot_out
    if args.traj_out:
        from .utils.evaluate import write_tum_trajectory

        write_tum_trajectory(
            args.traj_out,
            [r[0] for r in traj_rows],
            [r[1] for r in traj_rows],
            [r[2] for r in traj_rows],
        )
        report["trajectory"] = args.traj_out
    if args.profile:
        report["stage_ms"] = timer.summary()
    print(json.dumps(report))
    return 0


def cmd_mesh(args):
    from .utils.runtime import setup_cache

    setup_cache()

    from .pipeline.api import Extractor, Volume

    config = _make_config(args)
    vol = Volume(config)
    try:
        vol.load(args.snapshot)
    except (FileNotFoundError, ValueError) as e:
        print(f"error: cannot load snapshot: {e}", file=sys.stderr)
        return 1
    n = Extractor(vol).export_ply(args.out)
    print(json.dumps({
        "snapshot": args.snapshot,
        "allocated_blocks": vol.num_allocated,
        "mesh_triangles": n,
        "mesh": args.out,
    }))
    return 0


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.cmd == "run":
        return cmd_run(args)
    if args.cmd == "mesh":
        return cmd_mesh(args)
    return 2


if __name__ == "__main__":
    sys.exit(main())
