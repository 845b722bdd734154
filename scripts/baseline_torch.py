"""Measured reference-style CPU baseline for bench.py's vs_baseline.

The reference (Taichi-CUDA) cannot run here (no CUDA, no taichi wheel, and
installs are disallowed), so this measures the strongest baseline this
machine can host: the demo_pour hot loop (corotated-liquid MLS-MPM,
64^3 grid, f64 — mpm_simulator.py:126-318) implemented with vectorized
torch CPU ops (multithreaded OpenMP scatter/gather, batched SVD) and torch
autograd for the backward — the same engine the reference uses for its
controllers. SDF contact is omitted, which only FLATTERS the baseline
(less work per substep), so the resulting vs_baseline for the TPU engine is
conservative.

Prints one JSON line:
  {"fwd_substeps_per_s": ..., "fwdbwd_substeps_per_s": ..., "n": 100000}

bench.py embeds the measured fwd+bwd number as its denominator (see
BASELINE.md "Measured" table).
"""
import json
import sys
import time
from pathlib import Path

import numpy as np
import torch

torch.set_default_dtype(torch.float64)


def substep(x, v, C, F, *, dt, n_grid, mu, lam, gravity):
    n = x.shape[0]
    dx = 1.0 / n_grid
    inv_dx = float(n_grid)
    p_vol = (dx * 0.5) ** 2
    p_mass = p_vol * 1.0

    # F update + corotated-liquid stress (batched SVD, as mpm_simulator's
    # compute_F_tmp + svd + p2g stress term)
    F_tmp = (torch.eye(3)[None] + dt * C) @ F
    J = torch.det(F_tmp)
    U, S, Vh = torch.linalg.svd(F_tmp)
    R = U @ Vh
    newF = torch.eye(3)[None] * J.clamp_min(1e-6).pow(1.0 / 3.0)[:, None, None]
    stress = 2 * mu * (newF - R) @ newF.transpose(1, 2) \
        + torch.eye(3)[None] * (lam * J * (J - 1))[:, None, None]
    stress = (-dt * p_vol * 4 * inv_dx * inv_dx) * stress
    affine = stress + p_mass * C

    base = torch.floor(x * inv_dx - 0.5).long()
    fx = x * inv_dx - base
    w = torch.stack([0.5 * (1.5 - fx) ** 2, 0.75 - (fx - 1) ** 2,
                     0.5 * (fx - 0.5) ** 2])  # (3, n, 3)

    grid_v = torch.zeros(n_grid * n_grid * n_grid, 3)
    grid_m = torch.zeros(n_grid * n_grid * n_grid)
    for i in range(3):
        for j in range(3):
            for k in range(3):
                weight = w[i, :, 0] * w[j, :, 1] * w[k, :, 2]
                dpos = (torch.tensor([i, j, k]) - fx) * dx
                mom = p_mass * v + torch.einsum("nab,nb->na", affine, dpos)
                idx = ((base[:, 0] + i) * n_grid + base[:, 1] + j) * n_grid \
                    + base[:, 2] + k
                grid_v = grid_v.index_add(0, idx, weight[:, None] * mom)
                grid_m = grid_m.index_add(0, idx, weight * p_mass)

    mask = grid_m > 1e-10
    gv = torch.where(mask[:, None],
                     grid_v / grid_m.clamp_min(1e-10)[:, None]
                     + dt * torch.tensor(gravity), torch.zeros(1))
    # box boundary
    gg = gv.view(n_grid, n_grid, n_grid, 3)
    idx1 = torch.arange(n_grid)
    bound = 3
    for d in range(3):
        sel = [slice(None)] * 3
        lo = idx1 < bound
        hi = idx1 > n_grid - bound
        shape = [1, 1, 1]
        shape[d] = n_grid
        lo = lo.view(shape)
        hi = hi.view(shape)
        vd = gg[..., d]
        vd = torch.where(lo & (vd < 0), torch.zeros(1), vd)
        vd = torch.where(hi & (vd > 0), torch.zeros(1), vd)
        gg = torch.cat([gg[..., :d], vd[..., None], gg[..., d + 1:]], dim=-1)
    gv = gg.reshape(-1, 3)

    new_v = torch.zeros_like(v)
    new_C = torch.zeros_like(C)
    for i in range(3):
        for j in range(3):
            for k in range(3):
                weight = w[i, :, 0] * w[j, :, 1] * w[k, :, 2]
                dpos = torch.tensor([i, j, k]) - fx
                idx = ((base[:, 0] + i) * n_grid + base[:, 1] + j) * n_grid \
                    + base[:, 2] + k
                g = gv[idx]
                new_v = new_v + weight[:, None] * g
                new_C = new_C + 4 * inv_dx * weight[:, None, None] \
                    * torch.einsum("na,nb->nab", g, dpos)

    return x + dt * new_v, new_v, new_C, newF


def main():
    n = 100_000
    n_grid = 64
    dt = 1e-3  # demo_pour_config
    rng = np.random.RandomState(0)
    x0 = torch.tensor(0.35 + 0.3 * rng.rand(n, 3))
    E, nu = 100.0, 0.2  # pour liquid
    mu, lam = E / (2 * (1 + nu)), E * nu / ((1 + nu) * (1 - 2 * nu))
    mu = 0.0  # liquid: mu_0 * 0 (mpm_simulator liquid branch)

    def rollout(x, steps, with_grad):
        v = torch.zeros_like(x)
        C = torch.zeros(n, 3, 3)
        F = torch.eye(3)[None].repeat(n, 1, 1)
        if with_grad:
            x = x.clone().requires_grad_(True)
        xi = x
        for _ in range(steps):
            xi, v, C, F = substep(xi, v, C, F, dt=dt, n_grid=n_grid,
                                  mu=mu, lam=lam, gravity=(0, -9.8, 0))
        loss = (xi * xi).sum()
        if with_grad:
            loss.backward()
        return float(loss)

    steps = 5
    rollout(x0, 1, False)  # warm caches
    t0 = time.time(); rollout(x0, steps, False); t_fwd = time.time() - t0
    t0 = time.time(); rollout(x0, steps, True); t_both = time.time() - t0
    out = {
        "fwd_substeps_per_s": round(steps / t_fwd, 3),
        "fwdbwd_substeps_per_s": round(steps / t_both, 3),
        "n": n, "grid": n_grid, "threads": torch.get_num_threads(),
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
