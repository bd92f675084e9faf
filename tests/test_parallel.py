"""Multi-chip sharding tests on the 8-virtual-CPU-device mesh (mirrors the
driver's dryrun_multichip validation)."""
import jax
import numpy as np

from vulcan_tpu.config import TINY


def test_eight_device_mesh_available():
    assert len(jax.devices()) == 8


def test_dryrun_multichip_8():
    from vulcan_tpu.parallel.sharding import dryrun

    dryrun(8, height=64, width=128)


def test_dryrun_multichip_2():
    from vulcan_tpu.parallel.sharding import dryrun

    dryrun(2, height=64, width=128)


def test_sharded_matches_single_device():
    """The sharded step must produce the same reconstruction as 1 device."""
    import jax.numpy as jnp

    from vulcan_tpu.config import TINY
    from vulcan_tpu.core.camera import PinholeCamera
    from vulcan_tpu.core.se3 import SE3
    from vulcan_tpu.io.synthetic import render_scene_depth
    from vulcan_tpu.parallel.sharding import (
        make_mesh,
        make_sharded_step,
        state_sharding,
    )
    from vulcan_tpu.pipeline import fusion

    h, w = 64, 128
    config = TINY
    camera = PinholeCamera.create(80.0, 80.0, w / 2 - 0.5, h / 2 - 0.5)
    # A single centered sphere is rotationally degenerate for ICP (poses
    # can slide); two spheres + a back wall constrain all 6 DoF.
    depth, color = render_scene_depth(
        camera, SE3.identity(), h, w,
        (((0.0, 0.0, 1.5), 0.5), ((0.45, 0.25, 1.1), 0.2)),
        floor_z=2.5,
    )

    # Single device.
    s1 = fusion.init_state(config, camera, h, w)
    s1 = fusion.step(s1, depth, color, config)
    s1 = fusion.step(s1, depth, color, config)

    # 8-device mesh.
    mesh = make_mesh(8)
    s8 = fusion.init_state(config, camera, h, w)
    s8 = jax.device_put(s8, state_sharding(mesh, s8))
    step = make_sharded_step(config, mesh, h, w)
    from jax.sharding import NamedSharding, PartitionSpec as P

    rows = NamedSharding(mesh, P("pix"))
    for _ in range(2):
        d = jax.device_put(depth, rows)
        c = jax.device_put(color, rows)
        s8 = step(s8, d, c)

    # The pipeline is chaotic at the margins: mesh reduction order perturbs
    # the ICP pose by ~1e-5, which flips which *marginal* blocks get
    # allocated and which silhouette pixels render.  Bitwise equality is
    # the wrong spec; instead check the sharded run reconstructs the same
    # scene to physical tolerances.
    nf1 = int(s1.volume.free_count)
    nf8 = int(s8.volume.free_count)
    assert abs(nf1 - nf8) <= 0.05 * max(nf1, nf8)
    # Tracked poses agree to sub-millimeter.
    assert (
        np.abs(
            np.asarray(s1.pose.translation) - np.asarray(s8.pose.translation)
        ).max()
        < 1e-3
    )
    # Rendered depth agrees where both runs see the surface.
    d1 = np.asarray(s1.model.depth)
    d8 = np.asarray(s8.model.depth)
    v1 = np.asarray(s1.model.valid)
    v8 = np.asarray(s8.model.valid)
    assert (v1 != v8).mean() < 0.05
    both = v1 & v8
    assert both.sum() > 1000
    diff = np.abs(d1[both] - d8[both])
    assert np.quantile(diff, 0.99) < TINY.voxel_size
    # The bulk of the fused volume is identical.
    t1 = np.asarray(s1.volume.tsdf)
    t8 = np.asarray(s8.volume.tsdf)
    assert (np.abs(t1 - t8) > 1e-3).mean() < 0.1
