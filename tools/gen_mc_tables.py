"""Generate marching-cubes lookup tables from first principles.

Rather than transcribing the classic 256x16 triangle table (risking silent
typos), we *derive* it: for every corner-occupancy configuration, the
isocontour segments on each cube face are connected by walking maximal arcs
of inside corners (ambiguous faces resolve by always separating the inside
corners -- a globally consistent rule, so neighboring cubes agree and the
surface is watertight).  The directed per-face segments chain into closed
loops, each fan-triangulated.

Winding is fixed empirically: the emitted table is checked by meshing an
analytic sphere and requiring positive enclosed volume + watertightness;
see tests/test_mcubes.py for the same checks against the shipped table.

Run:  python tools/gen_mc_tables.py   (rewrites vulcan_tpu/ops/mc_tables.py)
"""
from __future__ import annotations

import os

import numpy as np

# Corner layout (standard MC numbering).
CORNERS = np.array(
    [
        [0, 0, 0],
        [1, 0, 0],
        [1, 1, 0],
        [0, 1, 0],
        [0, 0, 1],
        [1, 0, 1],
        [1, 1, 1],
        [0, 1, 1],
    ]
)
EDGES = [
    (0, 1), (1, 2), (2, 3), (3, 0),
    (4, 5), (5, 6), (6, 7), (7, 4),
    (0, 4), (1, 5), (2, 6), (3, 7),
]
EDGE_OF = {frozenset(e): i for i, e in enumerate(EDGES)}

# Six faces: (fixed axis, fixed value, outward normal).
FACES = [
    (2, 0, np.array([0, 0, -1])),
    (2, 1, np.array([0, 0, 1])),
    (1, 0, np.array([0, -1, 0])),
    (1, 1, np.array([0, 1, 0])),
    (0, 0, np.array([-1, 0, 0])),
    (0, 1, np.array([1, 0, 0])),
]


def face_cycles():
    """Corner cycles per face, CCW as seen from outside the cube."""
    cycles = []
    for axis, val, normal in FACES:
        ids = [i for i, c in enumerate(CORNERS) if c[axis] == val]
        center = CORNERS[ids].mean(axis=0)
        # 2D basis (e1, e2) with e1 x e2 = outward normal.
        e1 = np.zeros(3)
        e1[(axis + 1) % 3] = 1.0
        e2 = np.cross(normal, e1)
        ang = []
        for i in ids:
            d = CORNERS[i] - center
            ang.append(np.arctan2(d @ e2, d @ e1))
        order = [ids[k] for k in np.argsort(ang)]
        cycles.append(order)
    return cycles


FACE_CYCLES = face_cycles()


def loops_for_config(config: int):
    """Closed, consistently oriented contour loops (lists of edge ids)."""
    inside = [(config >> i) & 1 for i in range(8)]
    successor = {}
    for cyc in FACE_CYCLES:
        ins = [inside[c] for c in cyc]
        if sum(ins) in (0, 4):
            continue
        # Maximal arcs of consecutive inside corners (cyclic).
        n = 4
        starts = [
            i for i in range(n) if ins[i] and not ins[(i - 1) % n]
        ]
        for s in starts:
            e = s
            while ins[(e + 1) % n]:
                e = (e + 1) % n
            entry = EDGE_OF[frozenset((cyc[(s - 1) % n], cyc[s]))]
            exit_ = EDGE_OF[frozenset((cyc[e], cyc[(e + 1) % n]))]
            # Directed segment exit -> entry keeps inside on the left as
            # seen from outside the cube (derivation in ops/mcubes.py).
            assert exit_ not in successor
            successor[exit_] = entry
    # Chain into loops.
    loops = []
    remaining = set(successor)
    while remaining:
        start = min(remaining)
        loop = [start]
        remaining.discard(start)
        nxt = successor[start]
        while nxt != start:
            loop.append(nxt)
            remaining.discard(nxt)
            nxt = successor[nxt]
        assert len(loop) >= 3
        loops.append(loop)
    return loops


def build_tables():
    tri_lists = []
    max_tris = 0
    for config in range(256):
        tris = []
        for loop in loops_for_config(config):
            for i in range(1, len(loop) - 1):
                tris.append((loop[0], loop[i], loop[i + 1]))
        tri_lists.append(tris)
        max_tris = max(max_tris, len(tris))
    return tri_lists, max_tris


def mesh_grid_cpu(values, tri_lists):
    """Reference numpy marching cubes over a dense grid (golden impl)."""
    X, Y, Z = values.shape
    verts = []
    faces = []
    vid = {}

    def vertex_on_edge(base, e):
        a, b = EDGES[e]
        pa = tuple(base + CORNERS[a])
        pb = tuple(base + CORNERS[b])
        key = (min(pa, pb), max(pa, pb))
        if key in vid:
            return vid[key]
        va = values[pa]
        vb = values[pb]
        t = va / (va - vb)
        p = np.array(pa) + t * (np.array(pb) - np.array(pa))
        vid[key] = len(verts)
        verts.append(p)
        return vid[key]

    for x in range(X - 1):
        for y in range(Y - 1):
            for z in range(Z - 1):
                base = np.array([x, y, z])
                config = 0
                for i, c in enumerate(CORNERS):
                    if values[tuple(base + c)] < 0:
                        config |= 1 << i
                for tri in tri_lists[config]:
                    faces.append([vertex_on_edge(base, e) for e in tri])
    return np.array(verts), np.array(faces)


def signed_volume(verts, faces):
    v = verts[faces]
    return np.sum(np.einsum("ij,ij->i", v[:, 0], np.cross(v[:, 1], v[:, 2]))) / 6.0


def check_watertight(faces):
    from collections import Counter

    cnt = Counter()
    for f in faces:
        for i in range(3):
            a, b = f[i], f[(i + 1) % 3]
            cnt[(min(a, b), max(a, b))] += 1
    return all(c == 2 for c in cnt.values())


def main():
    tri_lists, max_tris = build_tables()
    print(f"max triangles per cube: {max_tris}")

    # Orientation + watertightness check on a sphere.
    n = 24
    g = np.stack(
        np.meshgrid(*([np.arange(n)] * 3), indexing="ij"), -1
    ).astype(float)
    sdf = np.linalg.norm(g - (n - 1) / 2, axis=-1) - n / 3.5
    verts, faces = mesh_grid_cpu(sdf, tri_lists)
    assert len(faces) > 100
    assert check_watertight(faces), "surface not watertight"
    vol = signed_volume(verts, faces)
    r = n / 3.5
    true_vol = 4 / 3 * np.pi * r**3
    if vol < 0:
        print("flipping winding")
        tri_lists = [[(a, c, b) for a, b, c in tl] for tl in tri_lists]
        verts, faces = mesh_grid_cpu(sdf, tri_lists)
        vol = signed_volume(verts, faces)
    assert vol > 0, vol
    assert abs(vol - true_vol) / true_vol < 0.02, (vol, true_vol)
    print(f"sphere volume ok: {vol:.1f} vs analytic {true_vol:.1f}")

    # Emit the table module.
    width = max_tris * 3
    rows = []
    counts = []
    for tl in tri_lists:
        flat = [e for tri in tl for e in tri]
        counts.append(len(tl))
        rows.append(flat + [-1] * (width - len(flat)))

    out = os.path.join(
        os.path.dirname(__file__), "..", "vulcan_tpu", "ops", "mc_tables.py"
    )
    with open(out, "w") as f:
        f.write(
            '"""Marching-cubes lookup tables.\n\n'
            "AUTO-GENERATED by tools/gen_mc_tables.py (derived from first\n"
            "principles via face-walk contour chaining; validated for\n"
            "watertightness and signed volume).  Do not edit by hand.\n"
            '"""\n'
            "import numpy as np\n\n"
            f"MAX_TRIS = {max_tris}\n\n"
            f"CORNER_OFFSETS = np.array({CORNERS.tolist()}, dtype=np.int32)\n\n"
            f"EDGE_ENDPOINTS = np.array({[list(e) for e in EDGES]}, dtype=np.int32)\n\n"
            f"NUM_TRIS = np.array({counts}, dtype=np.int32)\n\n"
            f"TRI_TABLE = np.array({rows}, dtype=np.int32).reshape(256, {width})\n"
        )
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
