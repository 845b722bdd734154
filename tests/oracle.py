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
