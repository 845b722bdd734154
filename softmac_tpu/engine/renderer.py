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

Visual parity extras over the bare rasterizer (the reference's pyrender
output is lit by a directional light with raytraced-looking contact
shadows from the EGL shadow map):
- soft floor shadows: every opaque caster (rigid meshes, cloth, particles)
  is projected along the light direction onto the floor plane and
  accumulated into a boolean mask; masked floor pixels are darkened once
  (no double-darkening where casters overlap). Gate: RENDERER.shadows
  (default on; off automatically when the light is near-horizontal).
- 2x supersampling AA: the frame is rasterized at 2x resolution and
  box-downsampled. Gate: RENDERER.ssaa (default 2; set 1 to disable —
  the 1024^2 cloth configs may prefer 1 for render speed).
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
        self.out_res = tuple(cfg.get("image_res", res))
        self.ssaa = max(int(cfg.get("ssaa", 2)), 1)
        self.res = tuple(r * self.ssaa for r in self.out_res)
        self.shadows = bool(cfg.get("shadows", True))
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

    @staticmethod
    def _tri_cover(sx, sy, idxs, w, h):
        """Shared triangle scan-coverage: bbox-clipped pixel grid +
        barycentric weights for one screen-projected triangle, or None when
        degenerate / fully clipped. Used by the shaded rasterizer and the
        shadow-mask rasterizer so the coverage rule lives in one place."""
        i0, i1, i2 = idxs
        xs = np.array([sx[i0], sx[i1], sx[i2]])
        ys = np.array([sy[i0], sy[i1], sy[i2]])
        x0, x1 = int(max(xs.min(), 0)), int(min(xs.max(), w - 1)) + 1
        y0, y1 = int(max(ys.min(), 0)), int(min(ys.max(), h - 1)) + 1
        if x0 >= x1 or y0 >= y1:
            return None
        gx, gy = np.meshgrid(np.arange(x0, x1), np.arange(y0, y1))
        d = (ys[1] - ys[2]) * (xs[0] - xs[2]) \
            + (xs[2] - xs[1]) * (ys[0] - ys[2])
        if abs(d) < 1e-12:
            return None
        w0 = ((ys[1] - ys[2]) * (gx - xs[2])
              + (xs[2] - xs[1]) * (gy - ys[2])) / d
        w1 = ((ys[2] - ys[0]) * (gx - xs[2])
              + (xs[0] - xs[2]) * (gy - ys[2])) / d
        w2 = 1 - w0 - w1
        return gx, gy, w0, w1, w2, (w0 >= 0) & (w1 >= 0) & (w2 >= 0)

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
            cov = self._tri_cover(sx, sy, (i0, i1, i2), w, h)
            if cov is None:
                continue
            gx, gy, w0, w1, w2, inside = cov
            zp = w0 * z[i0] + w1 * z[i1] + w2 * z[i2]
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

    # ------------------------------------------------------------------
    # floor shadows
    # ------------------------------------------------------------------
    def _shadow_light(self):
        """Downward light direction for shadow projection, or None when the
        light is too close to horizontal for a sane floor projection."""
        L = self.light_dir
        if abs(L[1]) < 0.2:
            return None
        return L if L[1] < 0 else -L

    def _flatten_to_floor(self, pts, L):
        """Project world points along L onto the floor plane. Returns the
        flattened points and a mask of points that actually cast (above the
        floor, so the projection runs along +L)."""
        t = (self.floor_y - pts[:, 1]) / L[1]
        out = pts + t[:, None] * L
        out[:, 1] = self.floor_y
        return out, t > 0

    def _mask_triangles(self, mask, verts, faces):
        """Rasterize screen-projected triangles into a boolean mask (no
        depth, no shading — shadow silhouettes)."""
        h, w = self.res[1], self.res[0]
        sx, sy, _, valid = self._project(verts)
        for t in range(len(faces)):
            i0, i1, i2 = faces[t]
            if not (valid[i0] and valid[i1] and valid[i2]):
                continue
            cov = self._tri_cover(sx, sy, (i0, i1, i2), w, h)
            if cov is None:
                continue
            gx, gy, _, _, _, inside = cov
            mask[gy, gx] |= inside

    def _mask_points(self, mask, pts, size=1):
        h, w = self.res[1], self.res[0]
        sx, sy, _, valid = self._project(pts)
        xi, yi = sx.astype(int), sy.astype(int)
        ok = valid & (xi >= 0) & (xi < w - size) & (yi >= 0) & (yi < h - size)
        xi, yi = xi[ok], yi[ok]
        for dy in range(size + 1):
            for dx in range(size + 1):
                mask[yi + dy, xi + dx] = True

    def _apply_shadows(self, img, mesh_casters, point_casters, psize):
        """Darken floor pixels covered by the light-projected silhouettes of
        the casters. Applied once through a boolean mask, so overlapping
        casters do not double-darken. Runs right after the floor draw (only
        floor/background pixels exist yet; geometry overdraws later)."""
        L = self._shadow_light()
        if L is None:
            return
        h, w = self.res[1], self.res[0]
        mask = np.zeros((h, w), bool)
        for verts, faces in mesh_casters:
            flat, cast = self._flatten_to_floor(verts, L)
            keep = cast[faces].all(axis=1)
            if keep.any():
                self._mask_triangles(mask, flat, faces[keep])
        for pts in point_casters:
            flat, cast = self._flatten_to_floor(np.asarray(pts, np.float64), L)
            if cast.any():
                self._mask_points(mask, flat[cast], size=psize)
        img[mask] *= 0.62

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
        s = self.ssaa
        img = np.full((h, w, 3), np.array([0.86, 0.9, 0.96]), np.float64)
        depth = np.full((h, w), np.inf)

        self._draw_floor(img, depth)

        # opaque meshes first, then particles, then transparent meshes
        # blended on top (so liquid shows through e.g. the glass, which the
        # reference renders at alpha 0.8)
        opaque, transparent = [], []
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
                    opaque.append((world, faces, color))
                else:
                    transparent.append((world, faces, color, alpha))

        if self.shadows:
            casters = [(wld, fcs) for wld, fcs, _ in opaque]
            if cloth is not None:
                casters.append((np.asarray(cloth[0]),
                                np.asarray(cloth[1])))
            pts = ([np.asarray(particles_x)]
                   if particles_x is not None and len(particles_x) > 0 else [])
            self._apply_shadows(img, casters, pts, psize=s)

        for world, faces, color in opaque:
            self._raster_mesh(img, depth, world, faces, color)

        if cloth is not None:
            verts, faces = cloth
            self._raster_mesh(img, depth, np.asarray(verts), np.asarray(faces),
                              np.array([0.85, 0.7, 0.3]), smooth=True)

        if self._target is not None:
            tpts, _ = self._target
            tcols = np.tile([[0.35, 0.75, 0.35]], (len(tpts), 1))
            self._splat_points(img, depth, tpts, tcols, size=s - 1)

        if particles_x is not None and len(particles_x) > 0:
            cols = particle_colors
            if cols is not None and np.issubdtype(np.asarray(cols).dtype, np.integer):
                cols = int_color_to_rgb(cols)
            elif cols is None:
                cols = np.tile([[0.2, 0.3, 0.8]], (len(particles_x), 1))
            self._splat_points(img, depth, np.asarray(particles_x),
                               np.asarray(cols), size=2 * s - 1)

        for world, faces, color, alpha in transparent:
            self._raster_mesh(img, depth, world, faces, color, alpha=alpha)

        if s > 1:
            img = img.reshape(h // s, s, w // s, s, 3).mean(axis=(1, 3))
        return (np.clip(img, 0, 1) * 255).astype(np.uint8)

    def initialize(self):
        pass

    def reset(self):
        pass
