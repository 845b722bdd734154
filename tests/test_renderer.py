"""Software-rasterizer smoke tests (engine/renderer.py).

The reference renders through pyrender/EGL (softmac/engine/renderer/
renderer.py); this suite pins the first-party z-buffer rasterizer's
contracts on a synthetic scene: floor coverage, particle splats, flat-shaded
rigid meshes, Gouraud-shaded cloth, target overlays, and alpha blending."""
import math

import numpy as np

from softmac_tpu.config.node import CN
from softmac_tpu.engine.meshgen import generate_disk
from softmac_tpu.engine.renderer import PointRenderer


def _renderer(res=192, ssaa=1, shadows=False):
    # legacy contract tests pin the raw rasterizer (ssaa=1, no shadows);
    # the AA/shadow contracts are tested separately below
    cfg = CN()
    cfg.mode = "rgb_array"
    cfg.light_rot = (-math.pi / 4, 0.0)
    cfg.camera_pos = (0.5, 0.6, 1.5)
    cfg.camera_rot = (-0.25, 0.0)
    cfg.image_res = (res, res)
    cfg.ssaa = ssaa
    cfg.shadows = shadows
    return PointRenderer(cfg, None)


def _box(center, half=0.05):
    c = np.asarray(center, float)
    lo, hi = -half, half
    verts = np.array([[x, y, z] for x in (lo, hi) for y in (lo, hi)
                      for z in (lo, hi)]) + c
    faces = np.array([[0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
                      [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
                      [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]])
    return verts, faces


def test_floor_and_background():
    img = _renderer().render(np.zeros((0, 3)), None, None)
    assert img.shape == (192, 192, 3) and img.dtype == np.uint8
    # checkerboard: two distinct gray populations below the horizon
    floor = img[150:, :, 0].astype(float)
    assert floor.std() > 5.0


def test_particle_splats_colored():
    r = _renderer()
    pts = np.array([[0.5, 0.3, 0.5], [0.55, 0.3, 0.5]])
    cols = np.array([[1.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
    img = r.render(pts, cols, None)
    red = (img[..., 0] > 200) & (img[..., 1] < 80)
    assert red.sum() >= 2


def test_rigid_mesh_flat_vs_cloth_gouraud():
    r = _renderer()
    verts, faces = _box([0.5, 0.35, 0.5])

    class B:  # minimal BodyState stand-in
        pos = np.array([[0.0, 0.0, 0.0]])
        quat = np.array([[1.0, 0.0, 0.0, 0.0]])

    r.prim_meshes = [(verts, faces)]
    r.prim_colors = [np.array([0.2, 0.4, 0.9, 1.0])]
    img = r.render(np.zeros((0, 3)), None, B())
    blue = (img[..., 2] > 120) & (img[..., 0] < 120)
    assert blue.sum() > 50
    # flat shading: at most 3 cube faces visible -> at most 3 shade levels
    assert len(np.unique(img[..., 2][blue])) <= 3

    # cloth: bent disk must show a smooth (non-constant) shade gradient
    dv, df = generate_disk(10, 0.22)
    dv = np.asarray(dv, float).copy()
    dv[:, 1] = 0.38 + 0.08 * np.sin(10 * dv[:, 0]) * np.cos(10 * dv[:, 2])
    dv[:, 0] += 0.5
    dv[:, 2] += 0.5
    img = _renderer().render(np.zeros((0, 3)), None, None,
                             cloth=(dv, np.asarray(df)))
    gold = (img[..., 0].astype(int) - img[..., 2].astype(int)) > 60
    assert gold.sum() > 200
    assert img[..., 0][gold].std() > 8.0   # Gouraud gradient, not flat


def test_target_overlay():
    r = _renderer()
    r.set_target(np.array([[0.5, 0.4, 0.5]]))
    img = r.render(np.zeros((0, 3)), None, None)
    greenish = (img[..., 1] > 150) & (img[..., 0] < 120)
    assert greenish.sum() >= 1


class _B:  # minimal BodyState stand-in
    pos = np.array([[0.0, 0.0, 0.0]])
    quat = np.array([[1.0, 0.0, 0.0, 0.0]])


def test_ssaa_smooths_edges():
    """2x supersampling: output res unchanged, and mesh silhouette edges
    gain intermediate values (more unique blues than the flat raster)."""
    verts, faces = _box([0.5, 0.35, 0.5])
    imgs = {}
    for ssaa in (1, 2):
        r = _renderer(ssaa=ssaa)
        r.prim_meshes = [(verts, faces)]
        r.prim_colors = [np.array([0.2, 0.4, 0.9, 1.0])]
        imgs[ssaa] = r.render(np.zeros((0, 3)), None, _B())
    assert imgs[2].shape == imgs[1].shape == (192, 192, 3)
    blue1 = (imgs[1][..., 2] > 120) & (imgs[1][..., 0] < 120)
    blue2 = (imgs[2][..., 2] > 120) & (imgs[2][..., 0] < 120)
    # similar coverage, but anti-aliased edges add intermediate shades
    assert abs(int(blue2.sum()) - int(blue1.sum())) < 0.2 * blue1.sum()
    assert len(np.unique(imgs[2][..., 2][blue2])) \
        > len(np.unique(imgs[1][..., 2][blue1]))


def test_floor_shadows():
    """A box above the floor darkens a patch of floor pixels on its
    light-projected silhouette; the scene without shadows does not."""
    verts, faces = _box([0.5, 0.25, 0.5], half=0.08)
    imgs = {}
    for shadows in (False, True):
        r = _renderer(shadows=shadows)
        r.prim_meshes = [(verts, faces)]
        r.prim_colors = [np.array([0.2, 0.4, 0.9, 1.0])]
        imgs[shadows] = r.render(np.zeros((0, 3)), None, _B())
    a = imgs[False].astype(int)
    b = imgs[True].astype(int)
    darker = (a[..., 0] - b[..., 0]) > 20
    assert darker.sum() > 30          # a visible shadow patch
    # the shadow must fall on floor pixels only (gray checker, not sky blue)
    assert (a[..., 2][darker] - a[..., 0][darker]).mean() < 10


def test_shadow_skipped_for_horizontal_light():
    verts, faces = _box([0.5, 0.25, 0.5])
    cfg = CN()
    cfg.mode = "rgb_array"
    cfg.light_rot = (0.0, 0.0)        # light along -z: no floor projection
    cfg.camera_pos = (0.5, 0.6, 1.5)
    cfg.camera_rot = (-0.25, 0.0)
    cfg.image_res = (192, 192)
    cfg.ssaa = 1
    cfg.shadows = True
    r = PointRenderer(cfg, None)
    assert r._shadow_light() is None
    r.prim_meshes = [(verts, faces)]
    r.prim_colors = [np.array([0.2, 0.4, 0.9, 1.0])]
    img = r.render(np.zeros((0, 3)), None, _B())   # must not raise
    assert img.shape == (192, 192, 3)
