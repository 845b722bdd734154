"""The procedural collision meshes shipped in assets/ must match their
first-party generators (scripts/build_assets.py — the equivalent of the
reference's trimesh build scripts, `softmac/assets/door/build_door_mesh.py`
and `gripper/build_gripper_mesh.py`)."""
import sys
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "scripts"))


def test_shipped_meshes_match_generators():
    from build_assets import build_door, build_finger, verify

    assert verify("door", build_door(), ROOT / "assets/door/door.obj")
    assert verify("finger", build_finger(),
                  ROOT / "assets/gripper/finger.obj")


def test_box_faces_outward():
    from build_assets import box

    verts, faces = box([1.0, 1.0, 1.0])
    c = verts.mean(0)
    a, b, d = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    n = np.cross(b - a, d - a)
    centers = (a + b + d) / 3
    assert (np.einsum("ij,ij->i", n, centers - c) > 0).all()
