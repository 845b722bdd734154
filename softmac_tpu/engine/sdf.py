"""Signed-distance-field sampling (device) and baking (host).

Device side: trilinear SDF/normal lookups with the same out-of-box semantics
as the reference's Taichi sampler (``softmac/engine/primitive/mesh.py:45-113``):
BIG outside the table's bounding box, normal (0,1,0) outside.

Host side: mesh -> SDF grid baking. The reference delegates to
``trimesh.proximity.ProximityQuery`` (mesh.py:178-240); here the bake is a
first-party, fully vectorized point-triangle distance + sign-by-winding-number
computation that runs as a batched JAX program (so the bake itself uses the
accelerator), cached as an .npz keyed by a content hash.
"""
from __future__ import annotations

import hashlib
import os
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from softmac_tpu.engine.types import SDFParams
from softmac_tpu.ops import m33

BIG = 1e10


# ======================================================================
# Device-side sampling (struct-of-arrays: points are vec tuples of (N,))
# ======================================================================
def _stencil(prim: SDFParams, p):
    """Shared trilinear stencil: in_box mask, 8 flat indices + weights."""
    res = prim.res
    in_box = ((p[0] >= prim.lower[0]) & (p[0] < prim.upper[0])
              & (p[1] >= prim.lower[1]) & (p[1] < prim.upper[1])
              & (p[2] >= prim.lower[2]) & (p[2] < prim.upper[2]))

    base, fx = [], []
    for d in range(3):
        pos = (p[d] - prim.lower[d]) * prim.inv_dx
        b = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, res[d] - 2)
        base.append(b)
        fx.append(jnp.clip(pos - b.astype(pos.dtype), 0.0, 1.0))

    cells = []
    for i in (0, 1):
        wi = fx[0] if i else (1.0 - fx[0])
        for j in (0, 1):
            wj = fx[1] if j else (1.0 - fx[1])
            for k in (0, 1):
                wk = fx[2] if k else (1.0 - fx[2])
                idx = ((base[0] + i) * res[1] + (base[1] + j)) * res[2] + (base[2] + k)
                cells.append((idx, wi * wj * wk))
    return in_box, cells


def sample_sdf_local(prim: SDFParams, p) -> jnp.ndarray:
    """Trilinear SDF sample at local vec-tuple points. BIG outside the box."""
    in_box, cells = _stencil(prim, p)
    out = 0.0
    for idx, w in cells:
        out = out + w * prim.table[idx]
    return jnp.where(in_box, out, BIG)


def sample_normal_local(prim: SDFParams, p):
    """Trilinear normal sample (vec tuple), normalized; (0,1,0) outside the
    box (mesh.py:112)."""
    in_box, cells = _stencil(prim, p)
    out = [0.0, 0.0, 0.0]
    for idx, w in cells:
        for d in range(3):
            out[d] = out[d] + w * prim.normals[d][idx]
    norm = jnp.sqrt(out[0] ** 2 + out[1] ** 2 + out[2] ** 2 + 1e-14)
    n = tuple(o / norm for o in out)
    zero = jnp.zeros_like(norm)
    return m33.vwhere(in_box, n, (zero, jnp.ones_like(norm), zero))


def _in_box(prim: SDFParams, p):
    return ((p[0] >= prim.lower[0]) & (p[0] < prim.upper[0])
            & (p[1] >= prim.lower[1]) & (p[1] < prim.upper[1])
            & (p[2] >= prim.lower[2]) & (p[2] < prim.upper[2]))


def gather_rows(prim: SDFParams, p):
    """ONE row gather of the 2x2x2 x 4-channel stencil at base(p):
    prim.neighborhood packs each base cell's stencil into a 32-wide row, so
    the only random access is a single (N,)-indexed gather — per-index cost
    dominates gathers on TPU. Returns (rows (..., 32), base 3 x f32, fx)."""
    res = prim.res
    base, basef, fx = [], [], []
    for d in range(3):
        pos = (p[d] - prim.lower[d]) * prim.inv_dx
        b = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, res[d] - 2)
        base.append(b)
        basef.append(b.astype(pos.dtype))
        fx.append(jnp.clip(pos - basef[d], 0.0, 1.0))
    rows = prim.neighborhood[
        (base[0] * res[1] + base[1]) * res[2] + base[2]]   # (..., 32)
    return rows, tuple(basef), tuple(fx)


def interp_rows(rows, fx, in_box):
    """Trilinear (sdf, unit normal) from the stencil rows. fx may lie
    outside [0, 1] (forecast points interpolated against another point's
    stencil: linear extrapolation of that cell's trilinear patch)."""
    sdf = 0.0
    nx = ny = nz = 0.0
    c = 0
    for i in (0, 1):
        wi = fx[0] if i else (1.0 - fx[0])
        for j in (0, 1):
            wj = fx[1] if j else (1.0 - fx[1])
            for k in (0, 1):
                wk = fx[2] if k else (1.0 - fx[2])
                w = wi * wj * wk
                sdf = sdf + w * rows[..., 4 * c + 0]
                nx = nx + w * rows[..., 4 * c + 1]
                ny = ny + w * rows[..., 4 * c + 2]
                nz = nz + w * rows[..., 4 * c + 3]
                c += 1
    norm = jnp.sqrt(nx * nx + ny * ny + nz * nz + 1e-14)
    n = (nx / norm, ny / norm, nz / norm)
    zero = jnp.zeros_like(norm)
    n = m33.vwhere(in_box, n, (zero, jnp.ones_like(norm), zero))
    return jnp.where(in_box, sdf, BIG), n


def sample_sdf_normal_local(prim: SDFParams, p):
    """Fused trilinear sample of (sdf, normal) with ONE row gather per
    point (see gather_rows)."""
    rows, _, fx = gather_rows(prim, p)
    return interp_rows(rows, fx, _in_box(prim, p))


def forecast_fx(prim: SDFParams, base, p2):
    """Trilinear fractions of forecast point p2 RELATIVE to another point's
    stencil base — unclamped, so interp_rows linearly extrapolates that
    cell's patch when p2 crossed a cell face. Exact whenever
    base(p2) == base; at CFL-bounded forecast distances (|p2-p| <= 0.5 dx)
    only a few % of points cross, with O(h^2) patch-extrapolation error.
    This trades the reference's second table query
    (primitive_base.py:167-170) for zero gather cost."""
    return tuple((p2[d] - prim.lower[d]) * prim.inv_dx - base[d]
                 for d in range(3))


def _inv_trans(p, bp, bq):
    qinv = m33.qnorm(m33.qconj(bq))
    return m33.qrot(qinv, m33.vsub(p, bp))


def sample_sdf_normal_world(prim: SDFParams, bp, bq, x):
    """World-frame fused (sdf, normal) query."""
    sdf, n = sample_sdf_normal_local(prim, _inv_trans(x, bp, bq))
    return sdf, m33.qrot(bq, n)


def sample_sdf_world(prim: SDFParams, bp, bq, x) -> jnp.ndarray:
    """World-frame SDF query (primitive_base.py:53-56). bp/bq/x: tuples."""
    return sample_sdf_local(prim, _inv_trans(x, bp, bq))


def sample_normal_world(prim: SDFParams, bp, bq, x):
    """World-frame normal query (primitive_base.py:58-61)."""
    return m33.qrot(bq, sample_normal_local(prim, _inv_trans(x, bp, bq)))


# ======================================================================
# Host-side baking: mesh -> SDF grid
# ======================================================================
def ray_aabb_intersection(box_min, box_max, o, d):
    """Slab-method ray/AABB test, vectorized over rays (vec tuples).
    Returns (intersect bool, t_near, t_far) — parity with the reference's
    ``primitive_utils.ray_aabb_intersection`` (:49-72) incl. the
    d == 0 outside-slab rejection."""
    near = jnp.full_like(o[0], -BIG)
    far = jnp.full_like(o[0], BIG)
    hit = jnp.ones_like(o[0], dtype=bool)
    for i in range(3):
        para = d[i] == 0
        hit = hit & jnp.where(
            para, (o[i] >= box_min[i]) & (o[i] <= box_max[i]), True)
        dsafe = jnp.where(para, 1.0, d[i])
        i1 = (box_min[i] - o[i]) / dsafe
        i2 = (box_max[i] - o[i]) / dsafe
        lo, hi = jnp.minimum(i1, i2), jnp.maximum(i1, i2)
        near = jnp.where(para, near, jnp.maximum(near, lo))
        far = jnp.where(para, far, jnp.minimum(far, hi))
    hit = hit & (near <= far)
    return hit, near, far


def sdf_ray_local(prim: SDFParams, o, d):
    """Conservative sphere-tracing distance along ray (o, d) in the prim's
    local frame (reference ``mesh.py:120-134``): BIG/200 on an AABB miss or
    when the box is entirely behind, t_near + 8e-3 when the origin is
    outside the box, else the table SDF at o."""
    hit, tnear, tfar = ray_aabb_intersection(prim.lower, prim.upper, o, d)
    miss = (~hit) | (tfar <= 0)
    outside = tnear >= 0
    inside_sdf = sample_sdf_local(prim, o)
    val = jnp.where(outside, tnear + 8e-3, inside_sdf)
    return jnp.where(miss, BIG / 200, val)


def sdf_ray_world(prim: SDFParams, bp, bq, o, d):
    """World-frame ray query: transform origin into the local frame and
    rotate the direction (reference ``mesh.py:121-123``)."""
    qinv = m33.qnorm(m33.qconj(bq))
    o_l = m33.qrot(qinv, m33.vsub(o, bp))
    d_l = m33.qrot(qinv, d)
    return sdf_ray_local(prim, o_l, d_l)


def _point_triangle_distance(points, tri_a, tri_b, tri_c):
    """Unsigned distance + closest point from points (P,3) to triangles (T,3).

    Fully vectorized (P, T) pairwise computation (Ericson, Real-Time Collision
    Detection, ch. 5.1.5), evaluated in chunks by the caller.
    """
    ab = tri_b - tri_a  # (T,3)
    ac = tri_c - tri_a
    p = points[:, None, :]  # (P,1,3)
    ap = p - tri_a[None]

    d1 = jnp.einsum("tk,ptk->pt", ab, ap)
    d2 = jnp.einsum("tk,ptk->pt", ac, ap)

    bp = p - tri_b[None]
    d3 = jnp.einsum("tk,ptk->pt", ab, bp)
    d4 = jnp.einsum("tk,ptk->pt", ac, bp)

    cp = p - tri_c[None]
    d5 = jnp.einsum("tk,ptk->pt", ab, cp)
    d6 = jnp.einsum("tk,ptk->pt", ac, cp)

    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2

    eps = 1e-30
    # region tests
    denom_ab = jnp.maximum(d1 - d3, eps)
    v_ab = jnp.clip(d1 / denom_ab, 0.0, 1.0)
    denom_ac = jnp.maximum(d2 - d6, eps)
    w_ac = jnp.clip(d2 / denom_ac, 0.0, 1.0)
    denom_bc = jnp.maximum((d4 - d3) + (d5 - d6), eps)
    w_bc = jnp.clip((d4 - d3) / denom_bc, 0.0, 1.0)

    denom_in = jnp.maximum(va + vb + vc, eps)
    v_in = vb / denom_in
    w_in = vc / denom_in

    # pick closest point by region
    c_vert_a = jnp.broadcast_to(tri_a[None], ap.shape)
    c_vert_b = jnp.broadcast_to(tri_b[None], ap.shape)
    c_vert_c = jnp.broadcast_to(tri_c[None], ap.shape)
    c_ab = tri_a[None] + v_ab[..., None] * ab[None]
    c_ac = tri_a[None] + w_ac[..., None] * ac[None]
    c_bc = tri_b[None] + w_bc[..., None] * (tri_c - tri_b)[None]
    c_in = tri_a[None] + v_in[..., None] * ab[None] + w_in[..., None] * ac[None]

    in_a = (d1 <= 0) & (d2 <= 0)
    in_b = (d3 >= 0) & (d4 <= d3)
    in_c = (d6 >= 0) & (d5 <= d6)
    on_ab = (vc <= 0) & (d1 >= 0) & (d3 <= 0)
    on_ac = (vb <= 0) & (d2 >= 0) & (d6 <= 0)
    on_bc = (va <= 0) & (d4 - d3 >= 0) & (d5 - d6 >= 0)

    closest = c_in
    closest = jnp.where(on_bc[..., None], c_bc, closest)
    closest = jnp.where(on_ac[..., None], c_ac, closest)
    closest = jnp.where(on_ab[..., None], c_ab, closest)
    closest = jnp.where(in_c[..., None], c_vert_c, closest)
    closest = jnp.where(in_b[..., None], c_vert_b, closest)
    closest = jnp.where(in_a[..., None], c_vert_a, closest)

    diff = p - closest
    dist2 = jnp.sum(diff * diff, axis=-1)
    return dist2, closest


def _winding_number(points, tri_a, tri_b, tri_c):
    """Generalized winding number of points w.r.t. the mesh (P,).

    Solid-angle sum (van Oosterom & Strackee); robust sign even for meshes
    that are only approximately watertight.
    """
    a = tri_a[None] - points[:, None, :]
    b = tri_b[None] - points[:, None, :]
    c = tri_c[None] - points[:, None, :]
    la = jnp.linalg.norm(a, axis=-1)
    lb = jnp.linalg.norm(b, axis=-1)
    lc = jnp.linalg.norm(c, axis=-1)
    num = jnp.einsum("ptk,ptk->pt", a, jnp.cross(b, c))
    den = (la * lb * lc + jnp.einsum("ptk,ptk->pt", a, b) * lc
           + jnp.einsum("ptk,ptk->pt", b, c) * la
           + jnp.einsum("ptk,ptk->pt", a, c) * lb)
    omega = 2.0 * jnp.arctan2(num, den)
    return jnp.sum(omega, axis=-1) / (4.0 * np.pi)


def _bake_chunk(points, verts, faces, face_normals):
    tri_a = verts[faces[:, 0]]
    tri_b = verts[faces[:, 1]]
    tri_c = verts[faces[:, 2]]
    dist2, closest = _point_triangle_distance(points, tri_a, tri_b, tri_c)
    nearest = jnp.argmin(dist2, axis=1)
    d = jnp.sqrt(jnp.take_along_axis(dist2, nearest[:, None], axis=1)[:, 0])
    cp = jnp.take_along_axis(closest, nearest[:, None, None], axis=1)[:, 0]
    wn = _winding_number(points, tri_a, tri_b, tri_c)
    inside = wn > 0.5
    sdf = jnp.where(inside, -d, d)
    # normal table = nearest triangle's outward face normal. This matches the
    # reference bake exactly (mesh.py:210-215: its point-to-surface direction
    # is dead code — the `length < 1e6` mask always selects face_normal), and
    # face normals are smooth near the surface where closest-point directions
    # are noisy — noise there destabilizes the contact friction.
    normal = face_normals[nearest]
    del cp
    return sdf, normal


def weld_vertices(verts: np.ndarray, faces: np.ndarray, tol: float = 1e-8):
    """Merge duplicate vertices so winding numbers see a crack-free surface
    (OBJ exports often store unwelded per-face corners)."""
    keys = np.round(verts / tol).astype(np.int64)
    _, first, inverse = np.unique(keys, axis=0, return_index=True, return_inverse=True)
    return verts[first], inverse[faces].astype(np.int32)


def bake_mesh_sdf(verts: np.ndarray, faces: np.ndarray, margin: float, dx: float):
    """Bake an SDF grid around the mesh (layout parity with the reference's
    trimesh2sdf, mesh.py:178-240: cell-centered start, lower at first point)."""
    verts, faces = weld_vertices(verts, faces)
    bbox = np.stack([verts.min(0), verts.max(0)])
    center = (bbox[0] + bbox[1]) / 2
    res = np.ceil((bbox[1] - bbox[0] + margin * 2) / dx).astype(int)
    lower = center - res * dx / 2.0

    xs = np.arange(0.5, res[0]) * dx + lower[0]
    ys = np.arange(0.5, res[1]) * dx + lower[1]
    zs = np.arange(0.5, res[2]) * dx + lower[2]
    pts = np.stack(np.meshgrid(xs, ys, zs, indexing="ij"), axis=-1).reshape(-1, 3)

    fa, fb, fc = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    fn = np.cross(fb - fa, fc - fa)
    fn = fn / np.maximum(np.linalg.norm(fn, axis=-1, keepdims=True), 1e-30)

    bake = jax.jit(_bake_chunk)
    v_j = jnp.asarray(verts, jnp.float32)
    f_j = jnp.asarray(faces, jnp.int32)
    fn_j = jnp.asarray(fn, jnp.float32)

    chunk = max(1, int(4e7 // max(len(faces), 1)))
    sdfs, normals = [], []
    for s in range(0, len(pts), chunk):
        p = jnp.asarray(pts[s:s + chunk], jnp.float32)
        d, n = bake(p, v_j, f_j, fn_j)
        sdfs.append(np.asarray(d))
        normals.append(np.asarray(n))
    sdf = np.concatenate(sdfs).reshape(res)
    normal = np.concatenate(normals).reshape(tuple(res) + (3,))

    lower = lower + dx / 2.0
    upper = lower + (res - 1) * dx
    return {
        "sdf": sdf,
        "normal": normal,
        "position": (lower, upper),
        "dx": np.ones(3) * dx,
        "res": res,
    }


def preprocess_sdf(verts: np.ndarray, faces: np.ndarray, cache_dir: str | Path):
    """Bake (or load cached) SDF for a mesh; npz cache keyed by content hash
    (same caching idea as mesh.py:136-165, first-party format)."""
    h = hashlib.sha256()
    h.update(b"softmac-tpu-sdf-v2")
    h.update(np.ascontiguousarray(verts).tobytes())
    h.update(np.ascontiguousarray(faces).tobytes())
    key = h.hexdigest()[:32]

    cache_dir = Path(cache_dir)
    cache_file = cache_dir / f"sdf_{key}.npz"
    if cache_file.exists():
        data = np.load(cache_file)
        return {
            "sdf": data["sdf"],
            "normal": data["normal"],
            "position": (data["lower"], data["upper"]),
            "dx": data["dx"],
            "res": data["res"],
        }

    length = float(np.max(verts.max(0) - verts.min(0)))
    dx = min(0.01, length / 80)  # resolution rule from mesh.py:172
    margin = max(dx * 3, 0.01)
    out = bake_mesh_sdf(verts, faces, margin, dx)

    os.makedirs(cache_dir, exist_ok=True)
    np.savez_compressed(
        cache_file,
        sdf=out["sdf"], normal=out["normal"],
        lower=out["position"][0], upper=out["position"][1],
        dx=out["dx"], res=out["res"],
    )
    return out


def sdf_params_from_bake(bake: dict, dtype=jnp.float32) -> SDFParams:
    res = tuple(int(r) for r in bake["res"])
    sdf_flat = np.asarray(bake["sdf"], np.float64).reshape(-1)
    n_flat = np.asarray(bake["normal"], np.float64).reshape(-1, 3)
    combined = np.concatenate([sdf_flat[:, None], n_flat], axis=1)

    # per-base-cell 2x2x2 neighborhood rows (see sample_sdf_normal_local)
    comb3 = combined.reshape(res + (4,))
    neigh = np.zeros(res + (32,))
    c = 0
    for i in (0, 1):
        for j in (0, 1):
            for k in (0, 1):
                neigh[:res[0] - 1, :res[1] - 1, :res[2] - 1, 4 * c:4 * c + 4] = \
                    comb3[i:res[0] - 1 + i, j:res[1] - 1 + j, k:res[2] - 1 + k]
                c += 1
    return SDFParams(
        table=jnp.asarray(sdf_flat, dtype),
        normals=jnp.asarray(n_flat.T, dtype),
        combined=jnp.asarray(combined, dtype),
        neighborhood=jnp.asarray(neigh.reshape(-1, 32), dtype),
        lower=jnp.asarray(bake["position"][0], dtype),
        upper=jnp.asarray(bake["position"][1], dtype),
        inv_dx=jnp.asarray(1.0 / bake["dx"][0], dtype),
        res=res,
    )
