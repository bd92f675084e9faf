"""Drive the CLI app (``vulcan_tpu.cli.main``) end to end in-process:
error paths, the synthetic online pipeline with every output flag, resume,
and a mini TUM sequence through the dataset path (VERDICT round-1 item 8).
"""
import json

import numpy as np
import pytest

from vulcan_tpu.cli import main

ARGS_COMMON = [
    "--preset", "tiny", "--width", "160", "--height", "120",
    "--voxel-size", "0.02",
]


def _run_cli(argv, capsys):
    rc = main(["run"] + argv)
    out = capsys.readouterr().out.strip().splitlines()
    report = json.loads(out[-1]) if out else {}
    return rc, report


def test_cli_requires_a_source(capsys):
    assert main(["run"]) == 2


def test_cli_rejects_bad_dataset_dir(capsys):
    assert main(["run", "--dataset", "/nonexistent-seq"]) == 1


def test_cli_rejects_bad_subcommand():
    with pytest.raises(SystemExit) as e:
        main(["frobnicate"])
    assert e.value.code == 2


def test_cli_synthetic_end_to_end(tmp_path, capsys):
    mesh = tmp_path / "m.ply"
    snap = tmp_path / "s.npz"
    rc, report = _run_cli(
        ARGS_COMMON
        + [
            "--synthetic", "6",
            "--mesh-out", str(mesh),
            "--snapshot-out", str(snap),
            "--eval-ate", "--profile", "--verbose", "--log-every", "2",
        ],
        capsys,
    )
    assert rc == 0
    assert report["frames"] == 6
    assert report["track_inliers"] > 1000
    assert report["alloc_overflow"] == 0
    assert report["ate_rmse_m"] < 0.01
    assert report["mesh_triangles"] > 500
    assert "step" in report["stage_ms"]
    assert mesh.exists() and mesh.read_bytes()[:3] == b"ply"
    assert snap.exists()

    # Resume from the snapshot: allocation starts from the saved count.
    rc2, report2 = _run_cli(
        ARGS_COMMON + ["--synthetic", "3", "--resume", str(snap)],
        capsys,
    )
    assert rc2 == 0
    assert report2["allocated_blocks"] >= report["allocated_blocks"]


def _make_mini_tum(root, camera, n=4):
    import cv2

    from vulcan_tpu.io.synthetic import orbit_poses, render_sphere_depth

    (root / "depth").mkdir(parents=True)
    (root / "rgb").mkdir()
    poses = orbit_poses(n, radius=1.6, height=0.3, span=0.12)
    h, w = 120, 160
    with open(root / "depth.txt", "w") as fd, open(
        root / "rgb.txt", "w"
    ) as fr, open(root / "groundtruth.txt", "w") as fg:
        fd.write("# ts file\n")
        fg.write("# ts tx ty tz qx qy qz qw\n")
        for i, pose in enumerate(poses):
            depth, color = render_sphere_depth(
                camera, pose, h, w, (0.0, 0.0, 0.0), 0.5
            )
            d16 = (np.asarray(depth) * 5000).astype(np.uint16)
            c8 = (np.clip(np.asarray(color), 0, 1) * 255).astype(np.uint8)
            t = 1.0 + 0.05 * i
            cv2.imwrite(str(root / "depth" / f"{i}.png"), d16)
            cv2.imwrite(str(root / "rgb" / f"{i}.png"), c8[..., ::-1])
            fd.write(f"{t} depth/{i}.png\n")
            fr.write(f"{t} rgb/{i}.png\n")
            # TUM gt: translation + quaternion (identity-free rotation).
            R = np.asarray(pose.rotation, np.float64)
            tr = np.asarray(pose.translation, np.float64)
            qw = np.sqrt(max(0.0, 1.0 + R[0, 0] + R[1, 1] + R[2, 2])) / 2
            qx = (R[2, 1] - R[1, 2]) / (4 * qw)
            qy = (R[0, 2] - R[2, 0]) / (4 * qw)
            qz = (R[1, 0] - R[0, 1]) / (4 * qw)
            fg.write(
                f"{t} {tr[0]} {tr[1]} {tr[2]} {qx} {qy} {qz} {qw}\n"
            )
    return root


def test_cli_tum_dataset_known_poses(tmp_path, capsys):
    """Mini TUM sequence through the CLI dataset path, fusion-only."""
    from vulcan_tpu.core.camera import PinholeCamera

    # The reader scales fr1 intrinsics to the probed image size; bake the
    # frames with the identical derivation so geometry is consistent.
    sx, sy = 160 / 640, 120 / 480
    camera = PinholeCamera.create(
        517.3 * sx, 516.5 * sy,
        (318.6 + 0.5) * sx - 0.5, (255.3 + 0.5) * sy - 0.5,
    )
    root = _make_mini_tum(tmp_path / "seq", camera)
    rc, report = _run_cli(
        ["--preset", "tiny", "--voxel-size", "0.02",
         "--dataset", str(root), "--known-poses", "--eval-ate"],
        capsys,
    )
    assert rc == 0
    assert report["frames"] == 4
    assert report["allocated_blocks"] > 20
    assert report["ate_rmse_m"] < 1e-4  # known poses: est == gt


def test_cli_traj_out_and_mesh_subcommand(tmp_path, capsys):
    """--traj-out writes a TUM-format trajectory; the `mesh` subcommand
    re-extracts a PLY from the snapshot offline."""
    snap = tmp_path / "s.npz"
    traj = tmp_path / "traj.txt"
    rc, report = _run_cli(
        ARGS_COMMON
        + [
            "--synthetic", "4",
            "--snapshot-out", str(snap),
            "--traj-out", str(traj),
        ],
        capsys,
    )
    assert rc == 0 and report["trajectory"] == str(traj)
    lines = [
        ln for ln in traj.read_text().splitlines() if not ln.startswith("#")
    ]
    assert len(lines) == 4
    row = np.array([float(x) for x in lines[-1].split()])
    assert row.shape == (8,)
    assert abs(np.linalg.norm(row[4:8]) - 1.0) < 1e-6  # unit quaternion

    mesh = tmp_path / "m2.ply"
    rc = main(["mesh", str(snap), "--out", str(mesh)] + ARGS_COMMON[:2] +
              ["--voxel-size", "0.02"])
    out = capsys.readouterr().out.strip().splitlines()
    report = json.loads(out[-1])
    assert rc == 0
    assert report["mesh_triangles"] > 500
    assert mesh.read_bytes()[:3] == b"ply"


def test_cli_mesh_subcommand_bad_snapshot(tmp_path, capsys):
    assert main(["mesh", str(tmp_path / "no.npz"), "--out",
                 str(tmp_path / "m.ply")]) == 1


def test_cli_mesh_every_online(capsys):
    """--mesh-every folds periodic colored-mesh extraction into the
    online loop (BASELINE.json config 5) and reports the extraction
    count + latest triangle count."""
    rc, report = _run_cli(
        ARGS_COMMON + ["--synthetic", "5", "--mesh-every", "2"], capsys
    )
    assert rc == 0
    assert report["mesh_extractions"] == 2  # frames 2 and 4
    assert report["mesh_triangles_online"] > 0
