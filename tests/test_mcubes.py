"""Config-5 mesh tests: colored marching cubes on the hashed volume.

SURVEY.md §5: MC on canonical cube configurations (table invariants over all
256 cases) + geometric golden tests on an analytic sphere.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from vulcan_tpu.config import TINY
from vulcan_tpu.core.camera import PinholeCamera
from vulcan_tpu.core.frame import make_frame
from vulcan_tpu.io.synthetic import orbit_poses, render_sphere_depth
from vulcan_tpu.ops import allocate, blocks, mcubes, sparse
from vulcan_tpu.ops import mc_tables as T

CFG = dataclasses.replace(TINY, voxel_size=0.02, trunc_dist=0.08)
CAM = PinholeCamera.create(120.0, 120.0, 79.5, 59.5)
H, W = 120, 160
CENTER = (0.0, 0.0, 0.0)
RADIUS = 0.5


def test_table_invariants_all_256():
    """Every emitted edge must straddle inside/outside; counts consistent."""
    for config in range(256):
        inside = [(config >> i) & 1 for i in range(8)]
        row = T.TRI_TABLE[config]
        n = T.NUM_TRIS[config]
        assert np.all(row[3 * n :] == -1)
        used = row[: 3 * n]
        assert np.all(used >= 0)
        for e in used:
            a, b = T.EDGE_ENDPOINTS[e]
            assert inside[a] != inside[b], (config, e)
        # NOTE: complement parity (NUM_TRIS[c] == NUM_TRIS[~c]) does NOT
        # hold: the ambiguous-face rule intentionally separates *inside*
        # corners, which is asymmetric under complement -- that asymmetry is
        # what makes adjacent cubes agree (watertightness is tested below).
    assert T.NUM_TRIS[0] == 0 and T.NUM_TRIS[255] == 0
    assert T.NUM_TRIS[1] == 1  # single corner -> single triangle


def full_coverage_poses(n_ring=8):
    """Rings at three latitudes + both poles: covers the whole sphere."""
    from vulcan_tpu.io.synthetic import look_at

    poses = []
    for height in (-1.0, 0.0, 1.0):
        poses += orbit_poses(n_ring, CENTER, radius=1.3, height=height)
    poses.append(look_at((0.01, 0.0, 1.7), CENTER))
    poses.append(look_at((0.01, 0.0, -1.7), CENTER))
    return poses


def fused_sphere_volume_full(n_ring=8):
    vol = blocks.create_volume(CFG)
    for pose in full_coverage_poses(n_ring):
        depth, color = render_sphere_depth(CAM, pose, H, W, CENTER, RADIUS)
        frame = make_frame(depth, color, CAM, pose)
        vol, _, _ = allocate.allocate_for_frame(vol, frame.depth, CAM, pose, CFG)
        vol = allocate.update_visibility(vol, CAM, pose, H, W, CFG)
        vol = sparse.integrate_sparse(vol, frame, CFG)
    return vol


def fused_sphere_volume(n_views=10):
    vol = blocks.create_volume(CFG)
    for pose in orbit_poses(n_views, CENTER, radius=1.6, height=0.2):
        depth, color = render_sphere_depth(CAM, pose, H, W, CENTER, RADIUS)
        frame = make_frame(depth, color, CAM, pose)
        vol, _, _ = allocate.allocate_for_frame(vol, frame.depth, CAM, pose, CFG)
        vol = allocate.update_visibility(vol, CAM, pose, H, W, CFG)
        vol = sparse.integrate_sparse(vol, frame, CFG)
    return vol


def test_sphere_mesh_geometry_and_color():
    vol = fused_sphere_volume_full()
    mesh = jax.jit(mcubes.extract_mesh, static_argnums=1)(vol, CFG)
    count = int(mesh.count)
    assert count > 500
    assert int(mesh.overflow) == 0
    tris = np.asarray(mesh.positions[:count])
    cols = np.asarray(mesh.colors[:count])

    # Vertices lie on the sphere within ~a voxel.
    verts = tris.reshape(-1, 3)
    r = np.linalg.norm(verts - np.asarray(CENTER), axis=-1)
    err = np.abs(r - RADIUS)
    assert np.median(err) < 0.5 * CFG.voxel_size
    assert np.mean(err) < CFG.voxel_size

    # Signed volume close to analytic (orientation + topology check).
    v = tris
    vol6 = np.einsum("ij,ij->i", v[:, 0], np.cross(v[:, 1], v[:, 2]))
    signed = vol6.sum() / 6.0
    true = 4 / 3 * np.pi * RADIUS**3
    assert abs(signed - true) / true < 0.05, (signed, true)

    # Colors approximate the procedural texture at vertex positions.
    from vulcan_tpu.io.synthetic import procedural_color

    c_true = np.asarray(procedural_color(jnp.asarray(verts)))
    assert np.mean(np.abs(cols.reshape(-1, 3) - c_true)) < 0.15


def test_mesh_watertight_on_closed_surface():
    from collections import Counter

    from vulcan_tpu.io.ply import weld_vertices

    vol = fused_sphere_volume_full()
    mesh = mcubes.extract_mesh(vol, CFG)
    count = int(mesh.count)
    verts, _, faces = weld_vertices(
        np.asarray(mesh.positions[:count]), np.asarray(mesh.colors[:count])
    )
    cnt = Counter()
    for f in faces:
        for i in range(3):
            a, b = f[i], f[(i + 1) % 3]
            cnt[(min(a, b), max(a, b))] += 1
    shared = np.asarray(list(cnt.values()))
    # Full coverage -> closed surface: every edge shared by exactly 2 tris.
    assert (shared == 2).mean() > 0.995


def test_ply_roundtrip(tmp_path):
    from vulcan_tpu.io.ply import read_ply, write_ply

    vol = fused_sphere_volume(4)
    mesh = mcubes.extract_mesh(vol, CFG)
    count = int(mesh.count)
    path = str(tmp_path / "mesh.ply")
    write_ply(path, np.asarray(mesh.positions[:count]), np.asarray(mesh.colors[:count]))
    verts, cols, faces = read_ply(path)
    assert len(faces) == count
    assert len(verts) < 3 * count  # welding actually deduplicates
    # Welded geometry is preserved.
    orig = np.asarray(mesh.positions[:count]).reshape(-1, 3)
    assert np.allclose(
        np.sort(np.unique(np.round(verts, 5), axis=0), axis=0).mean(),
        np.sort(np.unique(np.round(orig, 5), axis=0), axis=0).mean(),
        atol=1e-4,
    )


def test_overflow_is_reported():
    cfg_small = dataclasses.replace(CFG, max_mesh_triangles=100)
    vol = fused_sphere_volume(4)
    mesh = mcubes.extract_mesh(vol, cfg_small)
    assert int(mesh.count) == 100
    assert int(mesh.overflow) > 0


def test_mesh_capacity_16384_blocks():
    """Capacity-scaling regression for the chunked-halo extraction
    (VERDICT round-2 item 6): a mid-size 16384-block-capacity volume
    with thousands of allocated blocks must mesh with zero overflow and
    correct geometry.  The volume is built analytically (direct hash
    insertion + analytic TSDF fill) so the test exercises extraction
    capacity, not frame fusion.
    """
    from vulcan_tpu.ops import hashing

    cfg = dataclasses.replace(
        TINY,
        num_blocks=16384,
        hash_size=65536,
        max_visible=16384,
        voxel_size=0.008,
        trunc_dist=0.04,
        max_mesh_triangles=1_000_000,
    )
    r = 1.0
    be = cfg.block_extent

    # Shell block coords: blocks whose center is within trunc + half
    # diagonal of the sphere surface.
    n = int(np.ceil((r + 0.1) / be))
    ax = np.arange(-n, n + 1, dtype=np.int32)
    gx, gy, gz = np.meshgrid(ax, ax, ax, indexing="ij")
    coords = np.stack([gx, gy, gz], axis=-1).reshape(-1, 3)
    centers = (coords.astype(np.float32) + 0.5) * be
    dist = np.abs(np.linalg.norm(centers, axis=-1) - r)
    shell = coords[dist < cfg.trunc_dist + 0.87 * be]
    assert 4000 < len(shell) < 12000, len(shell)

    vol = blocks.create_volume(cfg)
    hash_codes, hash_values, free = (
        vol.hash_codes, vol.hash_values, vol.free_count
    )
    chunk = 4096
    for i in range(0, len(shell), chunk):
        part = np.zeros((chunk, 3), np.int32)
        got = shell[i : i + chunk]
        part[: len(got)] = got
        want = jnp.arange(chunk) < len(got)
        hash_codes, hash_values, free, assigned, ok = hashing.insert_unique(
            hash_codes, hash_values, free, jnp.asarray(part), want, cfg
        )
        assert bool(jnp.all(ok))
        tgt = jnp.where(want, assigned, cfg.num_blocks)
        vol = dataclasses.replace(
            vol,
            block_coords=vol.block_coords.at[tgt].set(
                jnp.asarray(part), mode="drop"
            ),
        )
    vol = dataclasses.replace(
        vol, hash_codes=hash_codes, hash_values=hash_values, free_count=free
    )
    nb_alloc = int(free) - 1
    assert nb_alloc == len(shell)

    # Analytic TSDF fill for every allocated block.
    bs = cfg.block_size
    local = np.stack(
        np.meshgrid(np.arange(bs), np.arange(bs), np.arange(bs),
                    indexing="ij"),
        axis=-1,
    ).reshape(-1, 3)
    g = (
        np.asarray(vol.block_coords)[:, None, :] * bs + local[None, :, :]
    ).astype(np.float32)
    sdf = np.linalg.norm(g * cfg.voxel_size, axis=-1) - r
    tsdf = np.clip(sdf / cfg.trunc_dist, -1.0, 1.0).astype(np.float32)
    ids = np.arange(cfg.num_blocks)
    allocated = (ids >= 1) & (ids <= nb_alloc)
    tsdf[~allocated] = 1.0
    weight = np.broadcast_to(
        np.where(allocated[:, None], 1.0, 0.0), tsdf.shape
    ).astype(np.float32)
    vol = dataclasses.replace(
        vol, tsdf=jnp.asarray(tsdf), weight=jnp.asarray(weight)
    )

    mesh = mcubes.extract_mesh(vol, cfg)
    count = int(mesh.count)
    assert int(mesh.overflow) == 0
    # ~4*pi*r^2 / voxel^2 crossed cells, ~2 triangles each.
    area_cells = 4 * np.pi * r * r / cfg.voxel_size**2
    assert 1.2 * area_cells < count < 3.0 * area_cells, (
        count, area_cells
    )
    verts = np.asarray(mesh.positions[:count]).reshape(-1, 3)
    err = np.abs(np.linalg.norm(verts, axis=-1) - r)
    assert np.median(err) < 0.5 * cfg.voxel_size
    assert err.max() < 2.0 * cfg.voxel_size


def _assert_mesh_equal(inc, full, vs):
    """Incremental (quantized t16/rgb888 cache) vs direct extraction:
    identical triangle set/order; positions within quantization."""
    n = int(full.count)
    assert int(inc.count) == n
    assert n > 100
    assert int(inc.overflow) == int(full.overflow) == 0
    pi = np.asarray(inc.positions[:n])
    pf = np.asarray(full.positions[:n])
    assert np.allclose(pi, pf, atol=2e-4), np.abs(pi - pf).max()
    ci = np.asarray(inc.colors[:n])
    cf = np.asarray(full.colors[:n])
    assert np.allclose(ci, cf, atol=1 / 128), np.abs(ci - cf).max()


def test_incremental_matches_full_extraction():
    """Per-block triangle caches updated only for (re-)integrated blocks
    must reproduce a full re-extraction exactly -- mid-sequence, after
    further mutation, and after a no-op update (BASELINE config 5;
    VERDICT round-4 item 3).  mesh_dirty_eps=0 pins the EXACT contract
    (blanket dirty marking); the default eps gate's bounded staleness
    has its own test below."""
    cfg0 = dataclasses.replace(CFG, mesh_dirty_eps=0.0)
    vol = blocks.create_volume(cfg0)
    cache = mcubes.create_mesh_cache(cfg0)
    update = jax.jit(mcubes.update_mesh_cache, static_argnums=2)
    decode = jax.jit(mcubes.cache_to_mesh, static_argnums=2)
    full = jax.jit(mcubes.extract_mesh, static_argnums=1)

    poses = full_coverage_poses(8)
    for k, pose in enumerate(poses):
        depth, color = render_sphere_depth(CAM, pose, H, W, CENTER, RADIUS)
        frame = make_frame(depth, color, CAM, pose)
        vol, _, _ = allocate.allocate_for_frame(
            vol, frame.depth, CAM, pose, cfg0
        )
        vol = allocate.update_visibility(vol, CAM, pose, H, W, cfg0)
        vol = sparse.integrate_sparse(vol, frame, cfg0)
        if k == 3:
            # Mid-sequence: cache covers the partial reconstruction.
            vol, cache = update(vol, cache, cfg0)
            assert not bool(jnp.any(vol.mesh_dirty))
            _assert_mesh_equal(
                decode(vol, cache, cfg0), full(vol, cfg0), cfg0.voxel_size
            )

    # After mutation by further fusion: only re-integrated blocks (and
    # their halo dependents) are re-meshed, yet the result matches a
    # full re-extraction of the mutated volume.
    vol, cache = update(vol, cache, cfg0)
    _assert_mesh_equal(
        decode(vol, cache, cfg0), full(vol, cfg0), cfg0.voxel_size
    )

    # No-op update: nothing dirty, cache unchanged.
    vol2, cache2 = update(vol, cache, cfg0)
    assert int(jnp.sum(cache2.counts)) == int(jnp.sum(cache.counts))
    assert bool(jnp.all(cache2.va == cache.va))


def test_incremental_clears_vanished_surface():
    """A block whose surface disappears (e.g. carved free) re-meshes to
    zero triangles instead of retaining stale cache entries."""
    vol = fused_sphere_volume(6)
    cache = mcubes.create_mesh_cache(CFG)
    vol, cache = mcubes.update_mesh_cache(vol, cache, CFG)
    n0 = int(mcubes.cache_to_mesh(vol, cache, CFG).count)
    assert n0 > 100

    # Carve: blank one block that currently carries triangles, flag it.
    bid = int(jnp.argmax(cache.counts))
    assert int(cache.counts[bid]) > 0
    vol = dataclasses.replace(
        vol,
        tsdf=vol.tsdf.at[bid].set(1.0),
        mesh_dirty=vol.mesh_dirty.at[bid].set(True),
    )
    before = int(cache.counts[bid])
    vol, cache = mcubes.update_mesh_cache(vol, cache, CFG)
    # Interior triangles are gone; boundary cubes whose other corners
    # read still-negative NEIGHBOR voxels legitimately keep a surface,
    # so the exact invariant is agreement with a full re-extraction.
    assert int(cache.counts[bid]) < before
    mesh = mcubes.cache_to_mesh(vol, cache, CFG)
    full = mcubes.extract_mesh(vol, CFG)
    assert int(mesh.count) == int(full.count) < n0


def test_incremental_default_eps_gate_stays_close():
    """With the default mesh_dirty_eps gate, saturated re-integrations
    skip re-meshing; the cached mesh may lag the volume by sub-eps value
    drift but must stay metrically indistinguishable from a full
    re-extraction (count within 2%, geometry on the analytic sphere)."""
    vol = blocks.create_volume(CFG)
    cache = mcubes.create_mesh_cache(CFG)
    for pose in full_coverage_poses(8):
        depth, color = render_sphere_depth(CAM, pose, H, W, CENTER, RADIUS)
        frame = make_frame(depth, color, CAM, pose)
        vol, _, _ = allocate.allocate_for_frame(
            vol, frame.depth, CAM, pose, CFG
        )
        vol = allocate.update_visibility(vol, CAM, pose, H, W, CFG)
        vol = sparse.integrate_sparse(vol, frame, CFG)
    vol, cache = mcubes.update_mesh_cache(vol, cache, CFG)
    inc = mcubes.cache_to_mesh(vol, cache, CFG)
    full = mcubes.extract_mesh(vol, CFG)
    ni, nf = int(inc.count), int(full.count)
    assert nf > 500
    assert abs(ni - nf) <= max(10, 0.02 * nf), (ni, nf)
    verts = np.asarray(inc.positions[:ni]).reshape(-1, 3)
    err = np.abs(np.linalg.norm(verts - np.asarray(CENTER), axis=-1) - RADIUS)
    assert np.median(err) < 0.5 * CFG.voxel_size
