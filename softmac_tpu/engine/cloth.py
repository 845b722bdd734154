"""JAX-native differentiable cloth (replaces DiffClothAI / diffcloth_py).

The reference drives a C++ projective-dynamics cloth through
``soft_cloth/engine/cloth_simulator.py`` (stepCouple forward / stepBackwardNN
adjoint, 16 OpenMP threads). Here the cloth is a projective-dynamics solver
written directly in jnp so the coupled rollout stays one differentiable
program:

- constraints: stretch springs on unique mesh edges + bending springs across
  each interior edge (opposite-vertex pairs), plus stiff attachment springs
  at the scene's ``customAttachmentVertexIdx`` (the control handles);
- the PD global matrix (M/dt^2 + L) is CONSTANT, so its dense inverse is
  precomputed at build time and each of the K fixed local/global iterations
  is one (V,V)@(V,3) matmul — ideal MXU work at cloth sizes (V ~ 100-1000);
- scene parameters come from the reference's string-keyed sceneConfig
  (``demo_taco_config.py:58-76``): k_stiff_stretching, k_stiff_bending,
  density, timeStep, gravity, attachment indices.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class ClothState:
    x: jnp.ndarray  # (V, 3)
    v: jnp.ndarray  # (V, 3)


def build_springs(verts: np.ndarray, faces: np.ndarray):
    """Unique-edge stretch springs + cross-edge bending springs."""
    edges = {}
    for f in faces:
        for a, b in ((f[0], f[1]), (f[1], f[2]), (f[2], f[0])):
            key = (min(a, b), max(a, b))
            edges.setdefault(key, []).append([v for v in f if v != a and v != b][0])

    stretch = np.array(sorted(edges.keys()), np.int32)
    bend = []
    for (a, b), opp in edges.items():
        if len(opp) == 2:
            bend.append((min(opp), max(opp)))
    bend = np.array(sorted(set(bend)), np.int32).reshape(-1, 2)
    return stretch, bend


class ClothModel:
    """Projective-dynamics cloth with precomputed dense global solve."""

    def __init__(self, verts: np.ndarray, faces: np.ndarray, *,
                 k_stretch: float, k_bend: float, density: float, dt: float,
                 attachment_idx: Sequence[int], gravity: float = -9.8,
                 n_iterations: int = 20, attachment_stiffness: float = 1e5,
                 velocity_damping: float = 0.02, convergence_tol=None,
                 dtype=jnp.float32):
        self.dtype = dtype
        self.dt = float(dt)
        self.n_iterations = int(n_iterations)
        # DiffCloth iterates its forward solve to forwardConvergenceThresh
        # (demo_taco_config.py:67). When the sceneConfig carries it, the PD
        # scan freezes iterates once the fixed-point residual drops below
        # the threshold (masked early-stop: bounded cost, differentiable,
        # and identical to the fixed-count solve when never reached —
        # e.g. 1e-8 is below f32 resolution at O(1) positions).
        self.convergence_tol = (None if convergence_tol is None
                                else float(convergence_tol))
        # per-step velocity damping: the reference's DiffCloth solves implicit
        # Euler, which is numerically dissipative; an undamped PD cloth keeps
        # flapping at m/s speeds and (in the hit scene) sweeps through the
        # particle block after the impact, cascading penetration flags
        self.velocity_damping = float(velocity_damping)
        self.n_vertices = V = verts.shape[0]
        self.faces = np.asarray(faces, np.int32)
        self.rest_verts = np.asarray(verts, np.float64)
        self.attachment_idx = np.asarray(attachment_idx, np.int32)
        self.gravity = np.array([0.0, gravity, 0.0])

        stretch, bend = build_springs(verts, faces)
        springs = [(stretch, k_stretch)]
        if len(bend) > 0:
            springs.append((bend, k_bend))
        self._springs = springs

        # lumped vertex masses: density * adjacent triangle area / 3
        tri = verts[faces]
        area = 0.5 * np.linalg.norm(
            np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]), axis=1)
        mass = np.zeros(V)
        for k in range(3):
            np.add.at(mass, faces[:, k], density * area / 3.0)
        mass = np.maximum(mass, 1e-12)
        self.mass = mass

        # PD global matrix A = M/dt^2 + L(springs) + W(attachments); constant
        A = np.diag(mass / dt ** 2)
        for edges, k in springs:
            for (i, j) in edges:
                A[i, i] += k
                A[j, j] += k
                A[i, j] -= k
                A[j, i] -= k
        for i in self.attachment_idx:
            A[i, i] += attachment_stiffness
        self.attachment_stiffness = attachment_stiffness

        self._Ainv = jnp.asarray(np.linalg.inv(A), dtype)
        self._mass_j = jnp.asarray(mass, dtype)

        # dense incidence operators so the PD local/global loop is pure
        # matmuls: d = D y (edge vectors), rhs += J p (weighted transpose)
        self._edge_ops = []
        for e, k in springs:
            E = len(e)
            D = np.zeros((E, V))
            D[np.arange(E), e[:, 0]] = 1.0
            D[np.arange(E), e[:, 1]] = -1.0
            rest = np.linalg.norm(verts[e[:, 0]] - verts[e[:, 1]], axis=1)
            self._edge_ops.append((
                jnp.asarray(D, dtype),
                jnp.asarray(k * D.T, dtype),
                jnp.asarray(rest, dtype)[:, None],
            ))
        self._att = jnp.asarray(self.attachment_idx)

    # ------------------------------------------------------------------
    def init_state(self) -> ClothState:
        return ClothState(
            x=jnp.asarray(self.rest_verts, self.dtype),
            v=jnp.zeros((self.n_vertices, 3), self.dtype))

    def attachment_rest_positions(self) -> np.ndarray:
        """a_init: the control signal's rest value (cloth_simulator.py:33)."""
        return self.rest_verts[self.attachment_idx].reshape(-1).copy()

    # ------------------------------------------------------------------
    def _base_rhs_and_pred(self, state: ClothState, attach_pos, ext_f):
        dt = self.dt
        m = self._mass_j[:, None]
        if attach_pos is None:
            attach_pos = jnp.asarray(
                self.rest_verts[self.attachment_idx], self.dtype)
        attach_pos = attach_pos.reshape(-1, 3).astype(self.dtype)
        g = jnp.asarray(self.gravity, self.dtype)
        x_pred = state.x + dt * state.v + (dt * dt) * (ext_f / m + g)
        base_rhs = (m / dt ** 2) * x_pred
        base_rhs = base_rhs.at[self._att].add(
            self.attachment_stiffness * attach_pos)
        return base_rhs, x_pred

    def _pd_iteration(self, base_rhs, y):
        """One PD local/global iteration (the fixed-point map y -> T(y))."""
        # positions are O(1) while PD displacements are O(1e-4): bf16 matmul
        # noise alone injects ~1e-2 position jitter, so force full precision
        prec = jax.lax.Precision.HIGHEST
        rhs = base_rhs
        for (D, Jk, rest) in self._edge_ops:
            d = jnp.matmul(D, y, precision=prec)
            dn = d / jnp.sqrt(jnp.sum(d * d, axis=1, keepdims=True) + 1e-18)
            rhs = rhs + jnp.matmul(Jk, rest * dn, precision=prec)
        return jnp.matmul(self._Ainv, rhs, precision=prec)

    def _solve(self, base_rhs, x_pred):
        if self.convergence_tol is None:
            def iteration(y, _):
                return self._pd_iteration(base_rhs, y), None
            y, _ = jax.lax.scan(iteration, x_pred, None,
                                length=self.n_iterations)
            return y

        tol = jnp.asarray(self.convergence_tol, self.dtype)

        def iteration(carry, _):
            y, done = carry
            y_next = self._pd_iteration(base_rhs, y)
            res = jnp.max(jnp.abs(y_next - y))
            y_out = jnp.where(done, y, y_next)
            return (y_out, done | (res < tol)), None

        (y, _), _ = jax.lax.scan(
            iteration, (x_pred, jnp.zeros((), bool)), None,
            length=self.n_iterations)
        return y

    def step(self, state: ClothState, attach_pos: Optional[jnp.ndarray],
             ext_f: jnp.ndarray) -> ClothState:
        """One env-dt projective-dynamics step.

        attach_pos: (n_att*3,) or (n_att,3) target handle positions (the
        action; None = hold at rest). ext_f: (V, 3) external force from MPM.
        """
        base_rhs, x_pred = self._base_rhs_and_pred(state, attach_pos, ext_f)
        y = self._solve(base_rhs, x_pred)
        v_new = (1.0 - self.velocity_damping) * (y - state.x) / self.dt
        return ClothState(x=y, v=v_new)

    def pd_residual(self, state: ClothState, attach_pos=None,
                    ext_f=None) -> jnp.ndarray:
        """Fixed-point residual max|T(y_K) - y_K| of the PD solve after the
        configured iteration count for this step's inputs — the quantity
        DiffCloth drives below ``forwardConvergenceThresh``
        (demo_taco_config.py:67). Used by the convergence-parity
        measurement (tests/test_cloth.py, PARITY.md)."""
        if ext_f is None:
            ext_f = jnp.zeros((self.n_vertices, 3), self.dtype)
        base_rhs, x_pred = self._base_rhs_and_pred(state, attach_pos, ext_f)
        y = self._solve(base_rhs, x_pred)
        return jnp.max(jnp.abs(self._pd_iteration(base_rhs, y) - y))


def parse_scene_config(scene: dict):
    """Extract solver parameters from a DiffCloth-style string-keyed scene
    config (``demo_taco_config.py:58-76``)."""
    att = [int(s) for s in str(scene["customAttachmentVertexIdx"]).split(",") if s]
    gravity = -9.8
    if "gravity" in scene:
        gravity = -abs(float(scene["gravity"]))
    out = {
        "k_stretch": float(scene["fabric:k_stiff_stretching"]),
        "k_bend": float(scene["fabric:k_stiff_bending"]),
        "density": float(scene["fabric:density"]),
        "dt": float(scene["timeStep"]),
        "attachment_idx": att,
        "gravity": gravity,
    }
    # DiffCloth's forward solve threshold (demo_taco_config.py:67) -> the
    # PD scan's masked early-stop; solverIterations (our key — DiffCloth
    # has no direct equivalent, its loop is unbounded) -> iteration count
    if "forwardConvergenceThresh" in scene:
        out["convergence_tol"] = float(scene["forwardConvergenceThresh"])
    if "solverIterations" in scene:
        out["n_iterations"] = int(scene["solverIterations"])
    return out


def transform_mesh(verts: np.ndarray, config: dict) -> np.ndarray:
    """Scene-config mesh transform (cloth_simulator.py:41-56)."""
    v = verts.copy()
    if "scale" in config:
        s = config["scale"]
        if not isinstance(s, (tuple, list)):
            s = (s, s, s)
        v = v * np.asarray(s)
    if "translation" in config:
        v = v + np.asarray(config["translation"])
    if "rotation" in config:
        angle = config["rotation"]["angle"]
        direction = np.asarray(config["rotation"]["direction"], np.float64)
        direction = direction / max(np.linalg.norm(direction), 1e-12)
        center = v.min(0)
        c, s_ = np.cos(angle), np.sin(angle)
        K = np.array([[0, -direction[2], direction[1]],
                      [direction[2], 0, -direction[0]],
                      [-direction[1], direction[0], 0]])
        R = np.eye(3) + s_ * K + (1 - c) * (K @ K)
        v = (v - center) @ R.T + center
    return v
