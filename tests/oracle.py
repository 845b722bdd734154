"""Independent NumPy implementation of the MLS-MPM substep math.

Written directly from the MLS-MPM update equations (stress -> P2G -> grid
normalize/gravity/boundary -> G2P) as a float64 oracle for the JAX engine.
Deliberately structured differently from the engine (dense 3-D grid arrays,
np.add.at scatter) so agreement is meaningful.
"""
import numpy as np


def svd_rot(F):
    """SVD with U, V in SO(3) and the sign carried by the last sigma."""
    U, s, Vt = np.linalg.svd(F)
    V = Vt.T
    if np.linalg.det(U) < 0:
        U[:, 2] *= -1
        s[2] *= -1
    if np.linalg.det(V) < 0:
        V[:, 2] *= -1
        s[2] *= -1
    return U, s, V


def oracle_substep(x, v, C, F, *, dt, n_grid, mu, lam, gravity,
                   material_model=1, ptype=1, ground_friction=1.5,
                   impulse=None):
    """One substep; mutates nothing, returns (x, v, C, F) new arrays."""
    n = x.shape[0]
    dx = 1.0 / n_grid
    inv_dx = float(n_grid)
    p_vol = (dx * 0.5) ** 2
    p_mass = p_vol * 1.0

    grid_v = np.zeros((n_grid, n_grid, n_grid, 3))
    grid_m = np.zeros((n_grid, n_grid, n_grid))

    F_tmp = (np.eye(3)[None] + dt * C) @ F
    new_F = np.empty_like(F)
    stress = np.empty_like(F)
    for p in range(n):
        J = np.linalg.det(F_tmp[p])
        if material_model == 0:  # corotated
            U, s, V = svd_rot(F_tmp[p])
            if ptype == 0:      # plastic: clip singular values
                s_new = np.clip(s, 1 - 2e-3, 1 + 3e-3)
                new_F[p] = U @ np.diag(s_new) @ V.T
            elif ptype == 1:
                new_F[p] = F_tmp[p]
            else:               # liquid
                new_F[p] = np.eye(3) * np.cbrt(J)
            R = U @ V.T
            stress[p] = 2 * mu * (new_F[p] - R) @ new_F[p].T + np.eye(3) * lam * J * (J - 1)
        else:                    # neo-hookean
            if ptype == 1:
                new_F[p] = F_tmp[p]
            else:
                sq = np.sqrt(J)
                new_F[p] = np.diag([sq, sq, 1.0])
            stress[p] = mu * (new_F[p] @ new_F[p].T) + np.eye(3) * (lam * np.log(J) - mu)

    stress_s = (-dt * p_vol * 4 * inv_dx * inv_dx) * stress
    affine = stress_s + p_mass * C

    base = np.floor(x * inv_dx - 0.5).astype(int)
    fx = x * inv_dx - base
    w = np.stack([0.5 * (1.5 - fx) ** 2, 0.75 - (fx - 1) ** 2, 0.5 * (fx - 0.5) ** 2])

    imp = np.zeros((n, 3)) if impulse is None else impulse
    for i in range(3):
        for j in range(3):
            for k in range(3):
                weight = w[i, :, 0] * w[j, :, 1] * w[k, :, 2]
                dpos = (np.array([i, j, k]) - fx) * dx
                mom = p_mass * v + np.einsum("nab,nb->na", affine, dpos) + imp
                idx = (base[:, 0] + i, base[:, 1] + j, base[:, 2] + k)
                np.add.at(grid_v, idx, weight[:, None] * mom)
                np.add.at(grid_m, idx, weight * p_mass)

    # grid ops
    mask = grid_m > 1e-10
    gv = np.zeros_like(grid_v)
    gv[mask] = grid_v[mask] / grid_m[mask][:, None] + dt * np.asarray(gravity)
    I = np.stack(np.meshgrid(*[np.arange(n_grid)] * 3, indexing="ij"), axis=-1)
    bound = 3
    for d in range(3):
        low = I[..., d] < bound
        high = I[..., d] > n_grid - bound
        gv[..., d] = np.where(low & (gv[..., d] < 0), 0.0, gv[..., d])
        gv[..., d] = np.where(high & (gv[..., d] > 0), 0.0, gv[..., d])
    if ground_friction >= 10:
        gv = np.where((I[..., 1] < bound)[..., None], 0.0, gv)

    # G2P
    new_v = np.zeros_like(v)
    new_C = np.zeros_like(C)
    for i in range(3):
        for j in range(3):
            for k in range(3):
                weight = w[i, :, 0] * w[j, :, 1] * w[k, :, 2]
                dpos = np.array([i, j, k]) - fx
                g = gv[base[:, 0] + i, base[:, 1] + j, base[:, 2] + k]
                new_v += weight[:, None] * g
                new_C += 4 * inv_dx * weight[:, None, None] * np.einsum("na,nb->nab", g, dpos)

    new_x = x + dt * new_v
    return new_x, new_v, new_C, new_F


# ======================================================================
# Coupled-scene oracle: SDF query, mixed contact, rigid floating step.
# NumPy f64 re-derivations of the contact/rigid math (reference semantics:
# softmac/engine/primitive/primitive_base.py:139-181 mixed contact,
# rigid_simulator.py free-body step) used to cross-check the JAX engine —
# including ON HARDWARE via bench.py's tpu_oracle_check.
# ======================================================================
BIG = 1e10
CONTACT_THRESHOLD = 5e-3


def _qnorm(q):
    return q / np.sqrt(np.sum(q * q, axis=-1, keepdims=True) + 1e-12)


def _qconj(q):
    return q * np.array([1.0, -1.0, -1.0, -1.0])


def _qrot(q, v):
    qvec = q[..., 1:]
    uv = np.cross(qvec, v)
    uuv = np.cross(qvec, uv)
    return v + 2.0 * (q[..., :1] * uv + uuv)


def _qmul(q, r):
    w1, x1, y1, z1 = q
    w2, x2, y2, z2 = r
    out = np.array([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ])
    return out / np.sqrt(np.sum(out * out))


def _w2quat(aa):
    theta = np.sqrt(np.sum(aa * aa) + 1e-12)
    return np.concatenate([[np.cos(theta / 2.0)],
                           (aa / theta) * np.sin(theta / 2.0)])


def _quat2w(q):
    q = q / np.sqrt(np.sum(q * q) + 1e-12)
    sin_half = np.sqrt(np.sum(q[1:] * q[1:]) + 1e-24)
    half = np.arctan2(sin_half, q[0])
    return q[1:] * (2.0 * half / sin_half)


def _quat2mat(q):
    w, x, y, z = q / np.sqrt(np.sum(q * q))
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


class OraclePrim:
    """NumPy view of one baked SDF table (same npz content SDFParams holds)."""

    def __init__(self, sdf, normal, lower, upper, inv_dx):
        self.sdf = np.asarray(sdf, np.float64)          # (rx, ry, rz)
        self.normal = np.asarray(normal, np.float64)    # (rx, ry, rz, 3)
        self.lower = np.asarray(lower, np.float64)
        self.upper = np.asarray(upper, np.float64)
        self.inv_dx = float(inv_dx)
        self.res = np.array(self.sdf.shape)


def _trilinear(prim, base, fx, in_box):
    """Trilinear (sdf, unit normal) at fractions fx relative to base cells;
    fx may lie outside [0,1] (forecast extrapolation)."""
    n = base.shape[0]
    sdf = np.zeros(n)
    nrm = np.zeros((n, 3))
    for i in (0, 1):
        wi = fx[:, 0] if i else (1.0 - fx[:, 0])
        for j in (0, 1):
            wj = fx[:, 1] if j else (1.0 - fx[:, 1])
            for k in (0, 1):
                wk = fx[:, 2] if k else (1.0 - fx[:, 2])
                w = wi * wj * wk
                idx = (base[:, 0] + i, base[:, 1] + j, base[:, 2] + k)
                sdf += w * prim.sdf[idx]
                nrm += w[:, None] * prim.normal[idx]
    norm = np.sqrt(np.sum(nrm * nrm, axis=-1) + 1e-14)
    nrm = nrm / norm[:, None]
    nrm[~in_box] = (0.0, 1.0, 0.0)
    sdf = np.where(in_box, sdf, BIG)
    return sdf, nrm


def oracle_sdf_query(prim, p):
    """(dist, normal, base, in_box) at local points p (n,3); BIG / (0,1,0)
    outside the table box (engine sdf.py:87-128 semantics)."""
    in_box = np.all((p >= prim.lower) & (p < prim.upper), axis=1)
    pos = (p - prim.lower) * prim.inv_dx
    base = np.clip(np.floor(pos).astype(int), 0, prim.res - 2)
    fx = np.clip(pos - base, 0.0, 1.0)
    sdf, nrm = _trilinear(prim, base, fx, in_box)
    return sdf, nrm, base


def oracle_collide_mixed(prim, bp, bq, bv, bw, friction, softness, x, v,
                         p_mass, dt, life, push_cap=np.inf):
    """Forecast-based mixed contact, f64 (engine contact.py:172-227).
    x, v: (n,3) world. bv/bw: BODY-frame COM spatial velocity.
    Returns (v_out (n,3), wrench (6,))."""
    qn = _qnorm(bq)
    qinv = _qnorm(_qconj(bq))
    p_loc = _qrot(qinv, x - bp)
    dist, D_loc, base = oracle_sdf_query(prim, p_loc)
    D = _qrot(bq, D_loc)
    mask = dist <= CONTACT_THRESHOLD
    dist_s = np.where(mask, dist, 0.0)

    r = x - bp
    r_local = _qrot(_qconj(qn), r)
    cv = _qrot(qn, bv + np.cross(bw, r_local))

    input_v = v - cv
    nc = np.sum(input_v * D, axis=-1)
    p_v_t = input_v - D * nc[:, None]
    vt_norm = np.sqrt(np.sum(p_v_t * p_v_t, axis=-1) + 1e-8)
    vt_fric = p_v_t * (np.maximum(0.0, vt_norm + nc * friction)
                       / vt_norm)[:, None]
    flag = (nc < 0) & (np.sum(p_v_t * p_v_t, axis=-1) > 1e-60)
    p_v_t = np.where(flag[:, None], vt_fric, p_v_t)

    v_contact = cv + p_v_t
    influence = np.exp(-np.maximum(dist_s, 0.0) * softness)
    v_soft = cv + (1.0 - influence[:, None]) * input_v \
        + influence[:, None] * p_v_t
    v_near = np.where((dist_s > 0)[:, None], v_soft, v_contact)
    p_v1 = np.where((mask & (nc < 0))[:, None], v_near, v)

    # forecast sample against the FIRST query's stencil (engine
    # sdf.forecast_fx: unclamped fractions -> linear patch extrapolation
    # for cell-crossing forecasts)
    x_new = x + dt * p_v1
    p_loc2 = _qrot(qinv, x_new - bp)
    in_box2 = np.all((p_loc2 >= prim.lower) & (p_loc2 < prim.upper), axis=1)
    fx2 = (p_loc2 - prim.lower) * prim.inv_dx - base
    sdf2, n2_loc = _trilinear(prim, base, fx2, in_box2)
    n2 = _qrot(bq, n2_loc)
    pen = mask & (sdf2 < 0)
    sdf2_s = np.where(pen, sdf2, 0.0)
    push = np.minimum(-(sdf2_s / dt) * life, push_cap)
    p_v2 = p_v1 + n2 * push[:, None]

    v_out = np.where(mask[:, None], p_v2, v)
    b_f = (v - v_out) * (p_mass / dt)
    b_f = np.where(mask[:, None], b_f, 0.0)
    wrench = np.concatenate([b_f.sum(0), np.cross(r, b_f).sum(0)])
    return v_out, wrench


def oracle_substep_mixed(x, v, C, F, *, dt, n_grid, mu, lam, gravity,
                         prims, bodies, frictions, softnesses, life,
                         material_model=0, ptype=2, ground_friction=0.0,
                         push_cap=np.inf, p_rho=1.0):
    """One CONTACT_MIXED substep (engine mpm.py:399-612 ordering: stress ->
    P2G -> normalize/gravity -> boundary -> gather -> per-prim collide ->
    alpha=2 correction splat -> G2P). bodies: list of (bp, bq, bv, bw).
    Returns (x, v, C, F, wrenches (n_prims, 6))."""
    n = x.shape[0]
    dx = 1.0 / n_grid
    inv_dx = float(n_grid)
    p_vol = (dx * 0.5) ** 2
    p_mass = p_vol * p_rho

    grid_v = np.zeros((n_grid, n_grid, n_grid, 3))
    grid_m = np.zeros((n_grid, n_grid, n_grid))

    F_tmp = (np.eye(3)[None] + dt * C) @ F
    new_F = np.empty_like(F)
    stress = np.empty_like(F)
    for p in range(n):
        J = np.linalg.det(F_tmp[p])
        if material_model == 0:
            U, s, V = svd_rot(F_tmp[p])
            if ptype == 0:
                s_new = np.clip(s, 1 - 2e-3, 1 + 3e-3)
                new_F[p] = U @ np.diag(s_new) @ V.T
            elif ptype == 1:
                new_F[p] = F_tmp[p]
            else:
                new_F[p] = np.eye(3) * np.cbrt(J)
            R = U @ V.T
            stress[p] = 2 * mu * (new_F[p] - R) @ new_F[p].T \
                + np.eye(3) * lam * J * (J - 1)
        else:
            if ptype == 1:
                new_F[p] = F_tmp[p]
            else:
                sq = np.sqrt(J)
                new_F[p] = np.diag([sq, sq, 1.0])
            stress[p] = mu * (new_F[p] @ new_F[p].T) \
                + np.eye(3) * (lam * np.log(J) - mu)

    stress_s = (-dt * p_vol * 4 * inv_dx * inv_dx) * stress
    affine = stress_s + p_mass * C

    base = np.floor(x * inv_dx - 0.5).astype(int)
    fx = x * inv_dx - base
    w = np.stack([0.5 * (1.5 - fx) ** 2, 0.75 - (fx - 1) ** 2,
                  0.5 * (fx - 0.5) ** 2])

    for i in range(3):
        for j in range(3):
            for k in range(3):
                weight = w[i, :, 0] * w[j, :, 1] * w[k, :, 2]
                dpos = (np.array([i, j, k]) - fx) * dx
                mom = p_mass * v + np.einsum("nab,nb->na", affine, dpos)
                idx = (base[:, 0] + i, base[:, 1] + j, base[:, 2] + k)
                np.add.at(grid_v, idx, weight[:, None] * mom)
                np.add.at(grid_m, idx, weight * p_mass)

    mask = grid_m > 1e-10
    gv = np.zeros_like(grid_v)
    gv[mask] = grid_v[mask] / grid_m[mask][:, None] + dt * np.asarray(gravity)
    I = np.stack(np.meshgrid(*[np.arange(n_grid)] * 3, indexing="ij"),
                 axis=-1)
    bound = 3
    for d in range(3):
        low = I[..., d] < bound
        high = I[..., d] > n_grid - bound
        gv[..., d] = np.where(low & (gv[..., d] < 0), 0.0, gv[..., d])
        gv[..., d] = np.where(high & (gv[..., d] > 0), 0.0, gv[..., d])
    if ground_friction >= 10:
        gv = np.where((I[..., 1] < bound)[..., None], 0.0, gv)

    # gather grid velocity at particles (v_tmp), chained per-prim contact,
    # then splat -alpha * dv back (grid_op_mixed1..4)
    v_tmp = np.zeros_like(v)
    for i in range(3):
        for j in range(3):
            for k in range(3):
                weight = w[i, :, 0] * w[j, :, 1] * w[k, :, 2]
                g = gv[base[:, 0] + i, base[:, 1] + j, base[:, 2] + k]
                v_tmp += weight[:, None] * g

    v_tgt = v_tmp
    wrenches = []
    for prim, (bp, bq, bv, bw), fric, soft in zip(prims, bodies, frictions,
                                                  softnesses):
        v_tgt, wr = oracle_collide_mixed(
            prim, bp, bq, bv, bw, fric, soft, x, v_tgt, p_mass, dt, life,
            push_cap=push_cap)
        wrenches.append(wr)

    alpha = 2.0
    corr_val = -alpha * (v_tmp - v_tgt)
    corr = np.zeros_like(grid_v)
    for i in range(3):
        for j in range(3):
            for k in range(3):
                weight = w[i, :, 0] * w[j, :, 1] * w[k, :, 2]
                idx = (base[:, 0] + i, base[:, 1] + j, base[:, 2] + k)
                np.add.at(corr, idx, weight[:, None] * corr_val)
    gv_out = np.where(mask[..., None], gv + corr, 0.0)

    new_v = np.zeros_like(v)
    new_C = np.zeros_like(C)
    for i in range(3):
        for j in range(3):
            for k in range(3):
                weight = w[i, :, 0] * w[j, :, 1] * w[k, :, 2]
                dpos = np.array([i, j, k]) - fx
                g = gv_out[base[:, 0] + i, base[:, 1] + j, base[:, 2] + k]
                new_v += weight[:, None] * g
                new_C += 4 * inv_dx * weight[:, None, None] \
                    * np.einsum("na,nb->nab", g, dpos)

    new_x = x + dt * new_v
    return new_x, new_v, new_C, new_F, np.stack(wrenches)


def oracle_body_state_floating(q6, qd6, com):
    """RigidState slice -> (pos, quat, body-frame COM v, body-frame w)
    (engine rigid.py:354-375)."""
    bq = _w2quat(np.asarray(q6[:3], np.float64))
    pos = np.asarray(q6[3:6], np.float64)
    w_b = _qrot(_qconj(bq), np.asarray(qd6[:3], np.float64))
    v_b = _qrot(_qconj(bq), np.asarray(qd6[3:6], np.float64))
    return pos, bq, v_b + np.cross(w_b, com), w_b


def oracle_floor_wrench(pos, bq, v_w, w_w, support_points, floor_height,
                        floor_stiffness, floor_damping):
    """Spring-damper floor penalty (engine rigid.py:617-633). v_w/w_w:
    WORLD-frame velocity at the body origin / angular velocity."""
    pts = np.asarray(support_points, np.float64)
    p_w = _qrot(np.broadcast_to(bq, (pts.shape[0], 4)), pts) + pos
    r = p_w - pos
    v_pt = v_w + np.cross(np.broadcast_to(w_w, r.shape), r)
    pen = floor_height - p_w[:, 1]
    active = pen > 0.0
    pen = np.where(active, pen, 0.0)
    fn = floor_stiffness * pen - floor_damping * v_pt[:, 1] * active
    fn = np.maximum(fn, 0.0)
    ft = -np.stack([v_pt[:, 0], np.zeros_like(fn), v_pt[:, 2]], axis=-1)
    f = np.zeros_like(ft)
    f[:, 1] = fn
    f = f + 2.0 * fn[:, None] * ft
    f = np.where(active[:, None], f, 0.0)
    return f.sum(0), np.cross(r, f).sum(0)


def oracle_floating_step(q6, qd6, *, mass, inertia, com, gravity, action6,
                         ext_f6, dt, gravity_on=True, floor=None):
    """Semi-implicit Euler free-body step (engine rigid.py:489-524).
    action6/ext_f6: [torque(3), force(3)] about/at the body origin, world
    frame. floor: optional (support_points, height, stiffness, damping).
    Returns (q6', qd6')."""
    exp, pos = np.asarray(q6[:3], np.float64), np.asarray(q6[3:6], np.float64)
    w, v = np.asarray(qd6[:3], np.float64), np.asarray(qd6[3:6], np.float64)
    com = np.asarray(com, np.float64)
    g = np.asarray(gravity, np.float64)
    bq = _w2quat(exp)
    R = _quat2mat(bq)
    r_c = R @ com

    tau_o = np.asarray(action6[:3], np.float64) + ext_f6[3:]
    force = np.asarray(action6[3:], np.float64) + ext_f6[:3]
    if floor is not None:
        f_fl, t_fl = oracle_floor_wrench(pos, bq, v, w, floor[0], floor[1],
                                         floor[2], floor[3])
        force = force + f_fl
        tau_o = tau_o + t_fl

    tau_c = tau_o - np.cross(r_c, force)
    if gravity_on:
        force = force + mass * g

    I_w = R @ np.asarray(inertia, np.float64) @ R.T
    w_dot = np.linalg.solve(I_w, tau_c - np.cross(w, I_w @ w))
    w_new = w + dt * w_dot
    v_c = v + np.cross(w, r_c)
    v_c_new = v_c + dt * force / mass
    bq_new = _qmul(_w2quat(w_new * dt), bq)
    r_c_new = _qrot(bq_new, com)
    pos_new = (pos + r_c) + dt * v_c_new - r_c_new
    v_new = v_c_new - np.cross(w_new, r_c_new)
    exp_new = _quat2w(bq_new)
    return np.concatenate([exp_new, pos_new]), np.concatenate([w_new, v_new])


# ======================================================================
# Cloth-coupled oracle: point-triangle contact, the sticky forecast model,
# and the penetration-tracing state machine — NumPy f64 re-derivations of
# the soft_cloth semantics (reference: primitive_cloth.py:84-280 and
# mpm_simulator.py:444-561) used to cross-check the JAX engine's
# substep_cloth (including the chunked-kernel path ON HARDWARE via
# bench.py's cloth gate). The cloth itself is held FIXED here: the PD
# solve is pinned separately (tests/test_cloth.py); this oracle covers
# the MPM side of the coupling, which is what the transfer kernels touch.
# ======================================================================

def _oc_closest_on_edge(p, a, b):
    """(n,3) points to segment [a, b] (each (n,3))."""
    v = b - a
    w = p - a
    t = np.clip(np.sum(w * v, -1) / np.maximum(np.sum(v * v, -1), 1e-30),
                0.0, 1.0)
    return a + v * t[..., None]


def _oc_barycentric(p, x0, x1, x2):
    """Reference barycentric projection (primitive_cloth.py:99-113):
    xy-plane determinant, falling back to xz when degenerate."""
    A, B, Cc = x1 - x0, x2 - x0, p - x0
    den_xy = A[..., 0] * B[..., 1] - A[..., 1] * B[..., 0]
    den_xz = A[..., 0] * B[..., 2] - A[..., 2] * B[..., 0]
    use_xz = np.abs(den_xy) < 1e-10
    den1 = np.where(use_xz, den_xz, den_xy)
    den1 = np.where(np.abs(den1) < 1e-30, 1e-30, den1)
    w1 = np.where(use_xz,
                  Cc[..., 0] * B[..., 2] - Cc[..., 2] * B[..., 0],
                  Cc[..., 0] * B[..., 1] - Cc[..., 1] * B[..., 0]) / den1
    den2_xy = B[..., 0] * A[..., 1] - B[..., 1] * A[..., 0]
    den2_xz = B[..., 0] * A[..., 2] - B[..., 2] * A[..., 0]
    den2 = np.where(use_xz, den2_xz, den2_xy)
    den2 = np.where(np.abs(den2) < 1e-30, 1e-30, den2)
    w2 = np.where(use_xz,
                  Cc[..., 0] * A[..., 2] - Cc[..., 2] * A[..., 0],
                  Cc[..., 0] * A[..., 1] - Cc[..., 1] * A[..., 0]) / den2
    return w1, w2, 1.0 - w1 - w2


def oracle_point_triangle(p, x0, x1, x2):
    """(unsigned dist, plane-signed dist, normal, inside) — plane distance
    when the projection lies inside the triangle, else nearest-edge
    distance with the point-to-edge direction as normal."""
    nrm = np.cross(x1 - x0, x2 - x0)
    nrm = nrm / np.sqrt(np.sum(nrm * nrm, -1) + 1e-14)[..., None]
    d_plane = np.sum(nrm * (p - x0), -1)
    contact = p - nrm * d_plane[..., None]
    w1, w2, w3 = _oc_barycentric(contact, x0, x1, x2)
    inside = (w1 >= 0) & (w2 >= 0) & (w3 >= 0)

    best_d = np.full(d_plane.shape, 1e6)
    best_pt = np.zeros(p.shape) if p.ndim else np.zeros(3)
    best_pt = np.broadcast_to(best_pt, np.broadcast(p, x0).shape).copy()
    for a, b in ((x0, x1), (x1, x2), (x2, x0)):
        pt = _oc_closest_on_edge(p, a, b)
        dd = np.sqrt(np.sum((p - pt) ** 2, -1) + 1e-14)
        take = dd < best_d
        best_pt = np.where(take[..., None], pt, best_pt)
        best_d = np.where(take, dd, best_d)
    n_edge = p - best_pt
    n_edge = n_edge / np.sqrt(np.sum(n_edge * n_edge, -1) + 1e-14)[..., None]

    dist_u = np.where(inside, np.abs(d_plane), best_d)
    d_signed = np.where(inside, d_plane, best_d)
    normal = np.where(inside[..., None], nrm, n_edge)
    return dist_u, d_signed, normal, inside


def oracle_cloth_pair(faces, cloth_x, x, pen_prev, mpm_scale=1.0):
    """Nearest candidate face per particle (mpm_simulator.py:448-461);
    -1 when none within the bbox threshold and not already penetrated."""
    threshold = 1e-2 * mpm_scale
    tri = cloth_x[faces]                              # (F, 3, 3)
    tmin = tri.min(1) - threshold
    tmax = tri.max(1) + threshold
    in_bbox = np.all((x[:, None, :] > tmin[None]) & (x[:, None, :] < tmax[None]),
                     axis=-1)
    dist, _, _, _ = oracle_point_triangle(
        x[:, None, :], tri[None, :, 0], tri[None, :, 1], tri[None, :, 2])
    masked = np.where(in_bbox | (pen_prev != 0)[:, None], dist, BIG)
    best = masked.argmin(1).astype(np.int32)
    return np.where(masked.min(1) < BIG, best, -1).astype(np.int32)


def _oc_check_side(faces, cloth_x, p, fid):
    f = faces[np.clip(fid, 0, faces.shape[0] - 1)]
    x0, x1, x2 = cloth_x[f[:, 0]], cloth_x[f[:, 1]], cloth_x[f[:, 2]]
    n = np.cross(x1 - x0, x2 - x0)
    return np.sum(n * (p - x0), -1) > 0


def oracle_cloth_trace_after_mpm(faces, neighbors, dirs, cloth_x,
                                 x_new, x_prev, cid_prev, pen_prev, cid_new):
    """Penetration bit flip after the MPM substep (mpm_simulator:485-518)."""
    valid = (cid_new >= 0) & (cid_prev >= 0)
    rows = neighbors[np.clip(cid_new, 0, faces.shape[0] - 1)]
    dd = dirs[np.clip(cid_new, 0, faces.shape[0] - 1)]
    hit = rows == cid_prev[:, None]
    neighboring = hit.any(1) | (cid_new == cid_prev)
    inverse = (hit & (dd != 0)).any(1) & (cid_new != cid_prev)
    side_cur = _oc_check_side(faces, cloth_x, x_new, cid_new)
    side_prev = _oc_check_side(faces, cloth_x, x_prev, cid_prev)
    crossed = (side_cur == side_prev) == inverse
    new_pen = np.where(valid & neighboring & crossed, 1 - pen_prev, pen_prev)
    return np.where(valid, new_pen, 0).astype(np.int8)


def oracle_cloth_collide_mixed(faces, cloth_x, cloth_v, x, v, p_mass, dt,
                               life, cid, pen, *, friction, softness, sticky,
                               mpm_scale=1.0, push_cap=5.0,
                               cloth_force_scale=1.0, n_vertices=None):
    """Forecast cloth contact, mixed mode (primitive_cloth.py:234-280 with
    the engine's push-cap and trust-radius guards). Returns
    (v_out (n,3), vertex forces (V,3))."""
    n_vertices = cloth_x.shape[0] if n_vertices is None else n_vertices
    fid = np.clip(cid, 0, faces.shape[0] - 1)
    f = faces[fid]
    x0, x1, x2 = cloth_x[f[:, 0]], cloth_x[f[:, 1]], cloth_x[f[:, 2]]
    _, d, D, _ = oracle_point_triangle(x, x0, x1, x2)
    penb = pen != 0
    flip = (~penb) == (d < 0)
    d = np.where(flip, -d, d)
    D = np.where(flip[:, None], -D, D)

    contact_pt = x - D * d[:, None]
    w1, w2, w3 = _oc_barycentric(contact_pt, x0, x1, x2)
    cv = (w1[:, None] * cloth_v[f[:, 0]] + w2[:, None] * cloth_v[f[:, 1]]
          + w3[:, None] * cloth_v[f[:, 2]])

    threshold = 5e-3 * mpm_scale
    active = cid >= 0
    mistrust = penb & (np.abs(d) > 3.0 * threshold)
    active = active & ~mistrust
    mask = active & (d <= threshold)
    d_s = np.where(mask, d, 0.0)

    input_v = v - cv
    nc = np.sum(input_v * D, -1)
    influence = np.minimum(np.exp(-d_s * softness), 1.0)
    if sticky:
        v_soft = cv + input_v * (1.0 - influence)[:, None]
        p_v1 = np.where((d_s > 0)[:, None], v_soft, cv)
        p_v1 = np.where(mask[:, None], p_v1, v)
    else:
        v_t = input_v - D * np.minimum(nc, 0.0)[:, None]
        vt_norm = np.sqrt(np.sum(v_t * v_t, -1) + 1e-8)
        vt_fric = v_t * (np.maximum(0.0, vt_norm + nc * friction)
                         / vt_norm)[:, None]
        flag = (nc < 0) & (np.sum(v_t * v_t, -1) > 1e-60)
        v_t = np.where(flag[:, None], vt_fric, v_t)
        v_contact = cv + v_t
        v_soft = cv + input_v * (1.0 - influence)[:, None] \
            + v_t * influence[:, None]
        v_near = np.where((d_s > 0)[:, None], v_soft, v_contact)
        p_v1 = np.where((mask & (nc < 0))[:, None], v_near, v)

    pushed = mask & (d < 0)
    mag = np.clip(-(d_s / dt) * life, 0.0, push_cap)
    p_v1 = np.where(pushed[:, None], D * mag[:, None], p_v1)
    v_out = np.where(mask[:, None], p_v1, v)

    c_f = (v - v_out) * (p_mass / dt * cloth_force_scale)
    ext = np.zeros((n_vertices, 3))
    for c, w in enumerate((w1, w2, w3)):
        np.add.at(ext, f[:, c],
                  np.where(mask, w, 0.0)[:, None]
                  * np.where(mask[:, None], c_f, 0.0))
    return v_out, ext


def oracle_substep_cloth_mixed(x, v, C, F, *, dt, n_grid, mpm_scale, mu, lam,
                               gravity, faces, cloth_x, cloth_v, cid, pen,
                               life, friction, softness, sticky,
                               push_cap=5.0, cloth_force_scale=1.0,
                               material_model=0, ptype=0,
                               ground_friction=1.5):
    """One cloth-coupled CONTACT_MIXED substep (engine mpm.substep_cloth
    ordering: stress -> P2G -> normalize/gravity -> boundary -> gather ->
    collide_cloth -> alpha=2 correction splat -> G2P), on a domain of
    [0, mpm_scale]^3. Returns (x, v, C, F, vertex forces)."""
    n = x.shape[0]
    dx = mpm_scale / n_grid
    inv_dx = n_grid / mpm_scale
    p_vol = (dx * 0.5) ** 2
    p_mass = p_vol * 1.0

    grid_v = np.zeros((n_grid, n_grid, n_grid, 3))
    grid_m = np.zeros((n_grid, n_grid, n_grid))

    F_tmp = (np.eye(3)[None] + dt * C) @ F
    new_F = np.empty_like(F)
    stress = np.empty_like(F)
    for p in range(n):
        J = np.linalg.det(F_tmp[p])
        if material_model == 0:
            U, s, V = svd_rot(F_tmp[p])
            if ptype == 0:
                s_new = np.clip(s, 1 - 2e-3, 1 + 3e-3)
                new_F[p] = U @ np.diag(s_new) @ V.T
            elif ptype == 1:
                new_F[p] = F_tmp[p]
            else:
                new_F[p] = np.eye(3) * np.cbrt(J)
            R = U @ V.T
            stress[p] = 2 * mu * (new_F[p] - R) @ new_F[p].T \
                + np.eye(3) * lam * J * (J - 1)
        else:
            new_F[p] = F_tmp[p]
            stress[p] = mu * (new_F[p] @ new_F[p].T) \
                + np.eye(3) * (lam * np.log(J) - mu)

    stress_s = (-dt * p_vol * 4 * inv_dx * inv_dx) * stress
    affine = stress_s + p_mass * C

    base = np.floor(x * inv_dx - 0.5).astype(int)
    fx = x * inv_dx - base
    w = np.stack([0.5 * (1.5 - fx) ** 2, 0.75 - (fx - 1) ** 2,
                  0.5 * (fx - 0.5) ** 2])

    for i in range(3):
        for j in range(3):
            for k in range(3):
                weight = w[i, :, 0] * w[j, :, 1] * w[k, :, 2]
                dpos = (np.array([i, j, k]) - fx) * dx
                mom = p_mass * v + np.einsum("nab,nb->na", affine, dpos)
                idx = (base[:, 0] + i, base[:, 1] + j, base[:, 2] + k)
                np.add.at(grid_v, idx, weight[:, None] * mom)
                np.add.at(grid_m, idx, weight * p_mass)

    gmask = grid_m > 1e-10
    gv = np.zeros_like(grid_v)
    gv[gmask] = grid_v[gmask] / grid_m[gmask][:, None] + dt * np.asarray(gravity)
    I = np.stack(np.meshgrid(*[np.arange(n_grid)] * 3, indexing="ij"),
                 axis=-1)
    bound = 3
    for d in range(3):
        low = I[..., d] < bound
        high = I[..., d] > n_grid - bound
        gv[..., d] = np.where(low & (gv[..., d] < 0), 0.0, gv[..., d])
        gv[..., d] = np.where(high & (gv[..., d] > 0), 0.0, gv[..., d])
    if ground_friction >= 10:
        gv = np.where((I[..., 1] < bound)[..., None], 0.0, gv)

    v_tmp = np.zeros_like(v)
    for i in range(3):
        for j in range(3):
            for k in range(3):
                weight = w[i, :, 0] * w[j, :, 1] * w[k, :, 2]
                g = gv[base[:, 0] + i, base[:, 1] + j, base[:, 2] + k]
                v_tmp += weight[:, None] * g

    v_tgt, ext = oracle_cloth_collide_mixed(
        faces, cloth_x, cloth_v, x, v_tmp, p_mass, dt, life, cid, pen,
        friction=friction, softness=softness, sticky=sticky,
        mpm_scale=mpm_scale, push_cap=push_cap,
        cloth_force_scale=cloth_force_scale)

    alpha = 2.0
    corr_val = -alpha * (v_tmp - v_tgt)
    corr = np.zeros_like(grid_v)
    for i in range(3):
        for j in range(3):
            for k in range(3):
                weight = w[i, :, 0] * w[j, :, 1] * w[k, :, 2]
                idx = (base[:, 0] + i, base[:, 1] + j, base[:, 2] + k)
                np.add.at(corr, idx, weight[:, None] * corr_val)
    gv_out = np.where(gmask[..., None], gv + corr, 0.0)

    new_v = np.zeros_like(v)
    new_C = np.zeros_like(C)
    for i in range(3):
        for j in range(3):
            for k in range(3):
                weight = w[i, :, 0] * w[j, :, 1] * w[k, :, 2]
                dpos = np.array([i, j, k]) - fx
                g = gv_out[base[:, 0] + i, base[:, 1] + j, base[:, 2] + k]
                new_v += weight[:, None] * g
                new_C += 4 * inv_dx * weight[:, None, None] \
                    * np.einsum("na,nb->nab", g, dpos)

    new_x = x + dt * new_v
    return new_x, new_v, new_C, new_F, ext
