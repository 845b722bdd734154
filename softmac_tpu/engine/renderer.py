"""Offscreen scene renderer.

The reference renders with pyrender/EGL (``softmac/engine/renderer/renderer.py``,
512x512 offscreen — 1024x1024 for the cloth scenes, soft_cloth renderer — with
a checkerboard floor, particle spheres, rigid meshes). pyrender is not
available in this environment, so this is a first-party software rasterizer:
numpy z-buffer, point splats for particles, diffuse-shaded triangles
(shade = 0.35 + 0.65|n.l| against the configured light) — flat per face for
sharp-edged rigid meshes, Gouraud-interpolated from area-weighted vertex
normals for cloth (pyrender-style smooth look) — checkerboard floor, and
target-geometry overlays. Resolution comes from RENDERER.image_res
(default 512x512; the cloth demo configs set 1024).
"""
from __future__ import annotations

import math

import numpy as np

from softmac_tpu.engine import quat as Q


def _rot_xy(pitch, yaw):
    cp, sp = math.cos(pitch), math.sin(pitch)
    cy, sy = math.cos(yaw), math.sin(yaw)
    rx = np.array([[1, 0, 0], [0, cp, -sp], [0, sp, cp]])
    ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    return ry @ rx


def int_color_to_rgb(c: np.ndarray) -> np.ndarray:
    c = np.asarray(c).astype(np.int64)
    return np.stack([(c >> 16) & 255, (c >> 8) & 255, c & 255], axis=-1) / 255.0


class PointRenderer:
    def __init__(self, cfg, env, res=(512, 512)):
        self.cfg = cfg
        self.env = env
        self.res = tuple(cfg.get("image_res", res))
        self.camera_pos = np.asarray(cfg.camera_pos, np.float64)
        pitch, yaw = cfg.camera_rot
        self.R = _rot_xy(pitch, yaw)        # camera-to-world
        self.fov = math.pi / 3
        self.light_dir = _rot_xy(*cfg.light_rot) @ np.array([0.0, 0.0, -1.0])
        self.floor_y = 0.0

        # rest-frame primitive meshes (world = R p_local + pos per frame)
        self.prim_meshes = getattr(env, "prim_meshes", [])
        self.prim_colors = getattr(env, "prim_colors", [])
        self._target = None          # (points (M,3), kind) overlay

    def set_target(self, points, kind="points"):
        """Overlay target geometry (reference soft_cloth renderer:79-97)."""
        self._target = (np.asarray(points), kind)

    # ------------------------------------------------------------------
    def _project(self, pts):
        """world (M,3) -> (screen x, y, depth, valid)."""
        h, w = self.res[1], self.res[0]
        cam = (pts - self.camera_pos) @ self.R  # world->camera (R orthonormal)
        z = -cam[:, 2]
        valid = z > 1e-4
        f = 0.5 * h / math.tan(self.fov / 2)
        zs = np.where(valid, z, 1.0)
        sx = w / 2 + f * cam[:, 0] / zs
        sy = h / 2 - f * cam[:, 1] / zs
        return sx, sy, z, valid

    def _splat_points(self, img, depth, pts, colors, size=1):
        h, w = self.res[1], self.res[0]
        sx, sy, z, valid = self._project(pts)
        order = np.argsort(-z)  # far to near
        sx, sy, z, valid = sx[order], sy[order], z[order], valid[order]
        colors = colors[order]
        xi, yi = sx.astype(int), sy.astype(int)
        ok = valid & (xi >= 0) & (xi < w - size) & (yi >= 0) & (yi < h - size)
        xi, yi, z, colors = xi[ok], yi[ok], z[ok], colors[ok]
        for dy in range(size + 1):
            for dx in range(size + 1):
                sel = z < depth[yi + dy, xi + dx]
                depth[yi[sel] + dy, xi[sel] + dx] = z[sel]
                img[yi[sel] + dy, xi[sel] + dx] = colors[sel]

    def _raster_mesh(self, img, depth, verts, faces, color, alpha=1.0,
                     smooth=False):
        h, w = self.res[1], self.res[0]
        sx, sy, z, valid = self._project(verts)
        tri = faces
        # backface-agnostic shading by world normal; with smooth=True the
        # shade is Gouraud-interpolated from area-weighted vertex normals
        # (pyrender-style smooth look for cloth), else flat per face
        # (right for the sharp-edged rigid boxes)
        v0, v1, v2 = verts[tri[:, 0]], verts[tri[:, 1]], verts[tri[:, 2]]
        n_raw = np.cross(v1 - v0, v2 - v0)   # area-weighted
        n = n_raw / np.maximum(np.linalg.norm(n_raw, axis=1, keepdims=True),
                               1e-12)
        shade = 0.35 + 0.65 * np.abs(n @ self.light_dir)
        if smooth:
            vn = np.zeros_like(verts)
            for k in range(3):
                np.add.at(vn, tri[:, k], n_raw)
            vn /= np.maximum(np.linalg.norm(vn, axis=1, keepdims=True), 1e-12)
            vshade = 0.35 + 0.65 * np.abs(vn @ self.light_dir)
        base = np.asarray(color[:3], np.float64)

        for t in np.argsort(-(z[tri].mean(axis=1))):  # far to near
            i0, i1, i2 = tri[t]
            if not (valid[i0] and valid[i1] and valid[i2]):
                continue
            xs = np.array([sx[i0], sx[i1], sx[i2]])
            ys = np.array([sy[i0], sy[i1], sy[i2]])
            zs = np.array([z[i0], z[i1], z[i2]])
            x0, x1 = int(max(xs.min(), 0)), int(min(xs.max(), w - 1)) + 1
            y0, y1 = int(max(ys.min(), 0)), int(min(ys.max(), h - 1)) + 1
            if x0 >= x1 or y0 >= y1:
                continue
            gx, gy = np.meshgrid(np.arange(x0, x1), np.arange(y0, y1))
            d = (ys[1] - ys[2]) * (xs[0] - xs[2]) + (xs[2] - xs[1]) * (ys[0] - ys[2])
            if abs(d) < 1e-12:
                continue
            w0 = ((ys[1] - ys[2]) * (gx - xs[2]) + (xs[2] - xs[1]) * (gy - ys[2])) / d
            w1 = ((ys[2] - ys[0]) * (gx - xs[2]) + (xs[0] - xs[2]) * (gy - ys[2])) / d
            w2 = 1 - w0 - w1
            inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
            zp = w0 * zs[0] + w1 * zs[1] + w2 * zs[2]
            sel = inside & (zp < depth[gy, gx])
            if smooth:
                sh = (w0 * vshade[i0] + w1 * vshade[i1]
                      + w2 * vshade[i2])[sel][:, None]
            else:
                sh = shade[t]
            if alpha >= 0.999:
                depth[gy[sel], gx[sel]] = zp[sel]
                img[gy[sel], gx[sel]] = base * sh
            else:
                img[gy[sel], gx[sel]] = (
                    alpha * base * sh + (1 - alpha) * img[gy[sel], gx[sel]])

    def _draw_floor(self, img, depth):
        """Checkerboard ground plane via per-pixel ray casting."""
        h, w = self.res[1], self.res[0]
        f = 0.5 * h / math.tan(self.fov / 2)
        gx, gy = np.meshgrid(np.arange(w), np.arange(h))
        dirs_cam = np.stack([(gx - w / 2) / f, -(gy - h / 2) / f,
                             -np.ones_like(gx, dtype=np.float64)], axis=-1)
        dirs = dirs_cam @ self.R.T
        oy = self.camera_pos[1] - self.floor_y
        t = np.where(dirs[..., 1] < -1e-9, oy / -np.minimum(dirs[..., 1], -1e-9), np.inf)
        hit = np.isfinite(t)
        ts = np.where(hit, t, 0.0)
        px = self.camera_pos[0] + ts * dirs[..., 0]
        pz = self.camera_pos[2] + ts * dirs[..., 2]
        checker = ((np.floor(px / 0.125).astype(np.int64)
                    + np.floor(pz / 0.125).astype(np.int64)) % 2).astype(np.float64)
        col = 0.62 + 0.18 * checker
        zdist = t
        sel = hit & (zdist < depth[..., ])
        for c in range(3):
            img[..., c] = np.where(sel, col, img[..., c])
        depth[sel] = zdist[sel]

    # ------------------------------------------------------------------
    def render(self, particles_x, particle_colors, bodies=None,
               cloth=None, extra_points=None):
        h, w = self.res[1], self.res[0]
        img = np.full((h, w, 3), np.array([0.86, 0.9, 0.96]), np.float64)
        depth = np.full((h, w), np.inf)

        self._draw_floor(img, depth)

        # opaque meshes first, then particles, then transparent meshes
        # blended on top (so liquid shows through e.g. the glass, which the
        # reference renders at alpha 0.8)
        transparent = []
        if bodies is not None and len(self.prim_meshes) > 0:
            import jax.numpy as jnp
            pos = np.asarray(bodies.pos)
            quat = np.asarray(bodies.quat)
            for i, (verts, faces) in enumerate(self.prim_meshes):
                R = np.asarray(Q.quat2mat(jnp.asarray(quat[i])))
                world = verts @ R.T + pos[i]
                color = np.asarray(self.prim_colors[i]) if i < len(self.prim_colors) \
                    else np.array([0.6, 0.6, 0.65, 1.0])
                alpha = float(color[3]) if len(color) > 3 else 1.0
                if alpha >= 0.999:
                    self._raster_mesh(img, depth, world, faces, color)
                else:
                    transparent.append((world, faces, color, alpha))

        if cloth is not None:
            verts, faces = cloth
            self._raster_mesh(img, depth, np.asarray(verts), np.asarray(faces),
                              np.array([0.85, 0.7, 0.3]), smooth=True)

        if self._target is not None:
            tpts, _ = self._target
            tcols = np.tile([[0.35, 0.75, 0.35]], (len(tpts), 1))
            self._splat_points(img, depth, tpts, tcols, size=0)

        if particles_x is not None and len(particles_x) > 0:
            cols = particle_colors
            if cols is not None and np.issubdtype(np.asarray(cols).dtype, np.integer):
                cols = int_color_to_rgb(cols)
            elif cols is None:
                cols = np.tile([[0.2, 0.3, 0.8]], (len(particles_x), 1))
            self._splat_points(img, depth, np.asarray(particles_x), np.asarray(cols))

        for world, faces, color, alpha in transparent:
            self._raster_mesh(img, depth, world, faces, color, alpha=alpha)

        return (np.clip(img, 0, 1) * 255).astype(np.uint8)

    def initialize(self):
        pass

    def reset(self):
        pass
