"""Native runtime tests: PNG decode, prefetch loader, PLY export."""
import numpy as np
import pytest

from vulcan_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


def _write_test_pngs(tmp_path, n=3, h=32, w=48):
    import cv2

    rng = np.random.default_rng(0)
    depth_paths, rgb_paths, depths, colors = [], [], [], []
    for i in range(n):
        d = rng.uniform(0.5, 4.0, (h, w)).astype(np.float32)
        d[rng.uniform(size=d.shape) < 0.05] = 0.0
        d16 = np.round(d * 5000).astype(np.uint16)
        c = rng.uniform(0, 1, (h, w, 3)).astype(np.float32)
        c8 = np.round(c * 255).astype(np.uint8)
        dp = str(tmp_path / f"d{i}.png")
        cp = str(tmp_path / f"c{i}.png")
        cv2.imwrite(dp, d16)
        cv2.imwrite(cp, c8[..., ::-1])  # cv2 writes BGR
        depth_paths.append(dp)
        rgb_paths.append(cp)
        depths.append(d16.astype(np.float32) / 5000.0)
        colors.append(c8.astype(np.float32) / 255.0)
    return depth_paths, rgb_paths, depths, colors


def test_png_decode_matches_cv2(tmp_path):
    dp, cp, depths, colors = _write_test_pngs(tmp_path, n=1)
    w, h = native.png_probe(dp[0])
    assert (w, h) == (48, 32)
    d = native.decode_depth(dp[0], w, h)
    np.testing.assert_allclose(d, depths[0], atol=1e-6)
    c = native.decode_rgb(cp[0], w, h)
    np.testing.assert_allclose(c, colors[0], atol=1e-6)


def test_prefetch_loader_yields_all_frames_in_order(tmp_path):
    dp, cp, depths, colors = _write_test_pngs(tmp_path, n=6)
    loader = native.PrefetchLoader(dp, cp, 48, 32, capacity=2, n_threads=2)
    got = list(loader)
    assert len(got) == 6
    for (d, c), d_ref, c_ref in zip(got, depths, colors):
        np.testing.assert_allclose(d, d_ref, atol=1e-6)
        np.testing.assert_allclose(c, c_ref, atol=1e-6)
    loader.close()


def test_native_ply_roundtrip(tmp_path):
    from vulcan_tpu.io.ply import read_ply

    rng = np.random.default_rng(1)
    # Two triangles sharing an edge: welding should merge to 4 vertices.
    quad = np.array(
        [
            [[0, 0, 0], [1, 0, 0], [0, 1, 0]],
            [[1, 0, 0], [1, 1, 0], [0, 1, 0]],
        ],
        np.float32,
    )
    cols = rng.uniform(0, 1, quad.shape).astype(np.float32)
    path = str(tmp_path / "quad.ply")
    nv = native.ply_write(path, quad, cols)
    assert nv == 4
    verts, vcols, faces = read_ply(path)
    assert len(verts) == 4
    assert len(faces) == 2
    # Triangle geometry preserved through the index remap.
    np.testing.assert_allclose(
        np.sort(verts[faces].reshape(-1), axis=0),
        np.sort(quad.reshape(-1), axis=0),
        atol=1e-6,
    )
