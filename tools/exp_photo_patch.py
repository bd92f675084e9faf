"""A/B the fused photometric patch samples against the flat bilinear
path on desk-scene pose recovery (CPU, assoc_patch forced).

History (single-pair t_err, flat path = 1.282 mm; desk-orbit ATE in
parens, flat = 0.047 m): nearest samples 1.787 mm (0.16 m); bilinear
intensity + nearest grads 1.414 mm (0.15 m); + perpendicular-axis grad
interpolation 1.467 mm; exact bilinear of (I, gx, gy) from gathered
3x3 neighborhoods = the shipped variant, expected == flat up to 16-bit
quantization.  The lesson: per-frame sample-estimator bias of ~10% is
enough to triple the desk ATE -- the photometric term is the only
brake on the dominant-plane slide, so the error compounds.

Run: JAX_PLATFORMS=cpu python tools/exp_photo_patch.py
"""
import dataclasses
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from vulcan_tpu.config import Config
from vulcan_tpu.core.camera import PinholeCamera
from vulcan_tpu.core.frame import make_frame
from vulcan_tpu.core.se3 import SE3
from vulcan_tpu.io.synthetic import orbit_poses, render_desk_depth
from vulcan_tpu.ops import icp
from vulcan_tpu.ops.preprocess import build_pyramid


def main():
    h, w = 240, 320
    camera = PinholeCamera.tum_default().scaled(0.5)
    cfg = dataclasses.replace(
        Config(), icp_stride=(1, 1, 1),
    )
    # Two consecutive poses at the 240-frame desk-orbit spacing.
    poses = orbit_poses(
        240, center=(0.0, 0.0, -0.25), radius=1.5, height=0.55,
        span=2.0 * np.pi,
    )
    p_model, p_live = poses[40], poses[41]

    dm, cm = render_desk_depth(camera, p_model, h, w)
    dl, cl = render_desk_depth(camera, p_live, h, w)
    f_model = make_frame(dm, cm, camera, p_model)
    f_live = make_frame(dl, cl, camera, p_live)
    pyr_m = build_pyramid(f_model, cfg)
    pyr_l = build_pyramid(f_live, cfg)
    model_pyr = tuple(
        icp.model_from_frame_maps(m, p_model) for m in pyr_m
    )

    def err(pose):
        d = pose.inverse() @ p_live
        xi = np.asarray(d.log())
        return (
            float(np.linalg.norm(xi[:3]) * 180 / np.pi),
            float(np.linalg.norm(
                np.asarray(pose.translation)
                - np.asarray(p_live.translation)
            )),
        )

    # Init from the model pose (one-frame motion, like online tracking).
    for mode in ("depth", "combined"):
        for patch in ("off", "on"):
            c = dataclasses.replace(cfg, assoc_patch=patch)
            res = icp.track(pyr_l, model_pyr, p_model, c, mode)
            rot, tr = err(res.pose)
            print(
                f"mode={mode:9s} patch={patch:3s} "
                f"rot_err={rot:8.4f} deg  t_err={tr * 1000:8.3f} mm  "
                f"inl={int(res.inliers)}"
            )


if __name__ == "__main__":
    main()
