"""Regenerate the procedural collision meshes shipped in assets/.

First-party equivalent of the reference's asset build scripts
(`softmac/assets/door/build_door_mesh.py:1-21` — four axis-aligned boxes
concatenated into the door + handle, and
`softmac/assets/gripper/build_gripper_mesh.py:1-8` — a 32-section cylinder
finger re-axed from z to y). The reference builds these with trimesh;
trimesh is not in this environment, so the primitives are generated
directly (same counts: door 32 verts / 48 tris, finger 66 verts /
128 tris).

Default mode VERIFIES the generated geometry against the shipped .obj
files (vertex point-set match + triangle area sum). Pass --write to
overwrite the shipped assets (note: the SDF caches are keyed by mesh
content hash, so a rewrite with different float formatting triggers a
re-bake on next load).
"""
import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from softmac_tpu.engine.meshgen import save_obj
from softmac_tpu.engine.meshio import load_obj

ROOT = Path(__file__).resolve().parents[1]


def box(scale, offset=(0.0, 0.0, 0.0)):
    """Unit box on [0,1]^3 scaled per-axis then offset — the reference's
    `box.vertices += 0.5; vertices * scale + offset` construction."""
    corners = np.array([[x, y, z] for x in (0, 1) for y in (0, 1)
                        for z in (0, 1)], dtype=np.float64)
    verts = corners * np.asarray(scale) + np.asarray(offset)
    # 12 triangles, outward-facing (two per axis-aligned face)
    faces = np.array([
        [0, 1, 3], [0, 3, 2],      # x = 0 (normal -x)
        [4, 6, 7], [4, 7, 5],      # x = 1 (+x)
        [0, 4, 5], [0, 5, 1],      # y = 0 (-y)
        [2, 3, 7], [2, 7, 6],      # y = 1 (+y)
        [0, 2, 6], [0, 6, 4],      # z = 0 (-z)
        [1, 5, 7], [1, 7, 3],      # z = 1 (+z)
    ], dtype=np.int64)
    return verts, faces


def concat(parts):
    verts, faces, off = [], [], 0
    for v, f in parts:
        verts.append(v)
        faces.append(f + off)
        off += len(v)
    return np.concatenate(verts), np.concatenate(faces)


def build_door():
    """Door leaf + two handle posts + handle bar (reference
    build_door_mesh.py box table, verbatim scales/offsets)."""
    return concat([
        box([0.5, 0.3, 0.025]),
        box([0.03, 0.025, 0.04], [0.42, 0.225, 0.025]),
        box([0.03, 0.025, 0.04], [0.42, 0.05, 0.025]),
        box([0.03, 0.2, 0.025], [0.42, 0.05, 0.065]),
    ])


def build_finger(radius=0.05, height=0.2, sections=32):
    """Capped cylinder along +y (the reference builds a z-axis trimesh
    cylinder then permutes axes [0, 2, 1] * [1, 1, -1]; generating along y
    directly lands on the same point set)."""
    ang = 2 * np.pi * np.arange(sections) / sections
    ring = np.stack([radius * np.cos(ang),
                     np.zeros(sections),
                     radius * np.sin(ang)], axis=1)
    bottom = ring + np.array([0.0, -height / 2, 0.0])
    top = ring + np.array([0.0, height / 2, 0.0])
    centers = np.array([[0.0, -height / 2, 0.0], [0.0, height / 2, 0.0]])
    verts = np.concatenate([bottom, top, centers])
    n, cb, ct = sections, 2 * sections, 2 * sections + 1
    faces = []
    for i in range(n):
        j = (i + 1) % n
        faces += [[i, i + n, j], [j, i + n, j + n]]      # side quad
        faces += [[cb, j, i], [ct, i + n, j + n]]        # caps (fans)
    return verts, np.asarray(faces, dtype=np.int64)


def _area(verts, faces):
    e1 = verts[faces[:, 1]] - verts[faces[:, 0]]
    e2 = verts[faces[:, 2]] - verts[faces[:, 0]]
    return float(np.linalg.norm(np.cross(e1, e2), axis=1).sum() / 2)


def _point_set_match(a, b, tol=1e-6):
    """Every vertex of a has a match in b and vice versa (orderings differ
    between the generators)."""
    d = np.linalg.norm(a[:, None, :] - b[None, :, :], axis=-1)
    return bool((d.min(1) < tol).all() and (d.min(0) < tol).all())


def verify(name, built, shipped_path):
    v, f = built
    sv, sf = load_obj(shipped_path)
    ok_pts = _point_set_match(v, np.asarray(sv, np.float64))
    a_new, a_old = _area(v, f), _area(np.asarray(sv, np.float64),
                                      np.asarray(sf))
    ok_area = abs(a_new - a_old) < 1e-6 * max(a_old, 1.0)
    status = "OK" if (ok_pts and ok_area) else "MISMATCH"
    print(f"{name}: {len(v)} verts {len(f)} tris | point-set "
          f"{'match' if ok_pts else 'MISMATCH'} | area {a_new:.6f} vs "
          f"shipped {a_old:.6f} -> {status}")
    return ok_pts and ok_area


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--write", action="store_true",
                    help="overwrite assets/ .obj files (default: verify only)")
    args = ap.parse_args()

    targets = [
        ("door", build_door(), ROOT / "assets/door/door.obj"),
        ("finger", build_finger(), ROOT / "assets/gripper/finger.obj"),
    ]
    ok = True
    for name, built, path in targets:
        if args.write:
            save_obj(path, *built)
            print(f"wrote {path}")
        else:
            ok &= verify(name, built, path)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
