"""Capture a device trace of the fused step and print top ops by self time.

Usage: python tools/trace_step.py [HxW] [preset] [outdir]
Parses the xplane protobuf directly (tensorboard-plugin-profile installed).
"""
import glob
import os
import sys
from collections import defaultdict

sys.path.insert(0, ".")
from vulcan_tpu.utils.runtime import setup_cache

setup_cache()

import jax
import jax.numpy as jnp

from vulcan_tpu.config import TINY, Config
from vulcan_tpu.core.camera import PinholeCamera
from vulcan_tpu.io.synthetic import orbit_poses, render_scene_depth
from vulcan_tpu.pipeline import fusion


def main():
    shape = sys.argv[1] if len(sys.argv) > 1 else "120x160"
    preset = sys.argv[2] if len(sys.argv) > 2 else "tiny"
    outdir = sys.argv[3] if len(sys.argv) > 3 else "/tmp/jax_trace"
    mode = sys.argv[4] if len(sys.argv) > 4 else "depth"
    h, w = (int(x) for x in shape.split("x"))
    config = TINY if preset == "tiny" else Config()

    camera = PinholeCamera.create(0.8 * w, 0.8 * w, w / 2 - 0.5, h / 2 - 0.5)
    spheres = (((0.0, 0.0, 0.0), 0.5), ((0.6, 0.3, 0.2), 0.25))
    poses = orbit_poses(10, radius=1.6, height=0.3, span=0.3)
    frames = []
    for p in poses:
        d, c = render_scene_depth(camera, p, h, w, spheres, -0.6)
        frames.append((jnp.asarray(d), jnp.asarray(c)))

    state = fusion.init_state(config, camera, h, w, init_pose=poses[0])
    for d, c in frames[:5]:
        state = fusion.step(state, d, c, config, mode)
    jax.block_until_ready(state.model.depth)

    with jax.profiler.trace(outdir):
        for d, c in frames[5:]:
            state = fusion.step(state, d, c, config, mode)
        jax.block_until_ready(state.model.depth)

    # Parse xplane: sum self-durations per op on device planes.
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "_proto"))
    import xplane_pb2

    paths = glob.glob(
        os.path.join(outdir, "**", "*.xplane.pb"), recursive=True
    )
    paths.sort(key=os.path.getmtime)
    with open(paths[-1], "rb") as f:
        xspace = xplane_pb2.XSpace.FromString(f.read())

    for plane in xspace.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        totals = defaultdict(float)
        counts = defaultdict(int)
        total_all = 0.0
        for line in plane.lines:
            if "XLA Ops" not in line.name and "xla" not in line.name.lower():
                continue
            for ev in line.events:
                name = plane.event_metadata[ev.metadata_id].name
                dur = ev.duration_ps / 1e9  # -> ms
                totals[name] += dur
                counts[name] += 1
                total_all += dur
        if not totals:
            continue
        print(f"=== plane: {plane.name}  total {total_all:.2f} ms (5 steps)")
        top = sorted(totals.items(), key=lambda kv: -kv[1])[:40]
        for name, ms in top:
            print(f"{ms:9.3f} ms  x{counts[name]:5d}  {name[:90]}")


if __name__ == "__main__":
    main()
