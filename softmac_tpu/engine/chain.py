"""Articulated-tree rigid dynamics via automatic differentiation.

The reference's rigid engine (Jade/nimblephysics, DART-based;
``softmac/engine/rigid_simulator.py:17-45``) is a full reduced-coordinate
articulated solver. The reference *scenes* only ever attach one moving link
per joint to a world-fixed base (engine/rigid.py handles those with closed
forms), but the engine contract includes multi-link structures — a door
panel with a moving handle, serial gripper fingers, n-link pendulums,
branching trees.

This module is the JAX-native articulated solver for fixed-base trees of
1-DoF joints (revolute / prismatic); serial chains are the special case of
a linear parent list. Instead of transcribing Featherstone's ABA, the
dynamics come from the Lagrangian via AD — the formulation a tracing
autodiff system makes natural and exactly consistent with its own
gradients (topology enters ONLY through forward kinematics):

    KE(q, qd) and PE(q) are defined through forward kinematics only
      (link velocities via jax.jvp of FK — no hand velocity recursions),
    M(q)        = d2 KE / d qd2                      (jax.hessian)
    bias        = (d p/d q) qd - d KE/d q + d PE/d q (p = d KE/d qd)
    tau_ext     = d/d qd [ sum_i w_i . V_i(q, qd) ]  (wrench power -> J^T w)
    (M + dt D) qd' = M qd + dt (tau - bias)          (implicit joint damping,
                                                      same scheme as the
                                                      1-DoF fast path)

Everything is n_dof-sized (tiny: <= 6), so the AD-built matrices cost
nothing next to the MPM; and because dynamics are *derived* from the same
traced energies, jax.grad through the rollout differentiates them with no
hand-maintained Jacobians (the reference hand-chains DART's,
rigid_simulator.py:134-173).
"""
from __future__ import annotations

import dataclasses
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from softmac_tpu.engine import quat as Q


@dataclasses.dataclass
class ChainJoint:
    """One joint in an articulated tree, with its child link's inertia.

    ``origin_pos``/``origin_rot``: the joint frame's fixed transform relative
    to the PARENT joint frame (URDF <origin> accumulated through any
    interleaved fixed joints). ``axis``: motion axis in the joint frame
    (1-DoF types). ``com``/``inertia``: child link inertial properties in
    the joint frame (URDF <inertial>, inertia about the COM).

    ``floating`` joints carry 6 dofs [w(3) exp-coords, p(3) translation]
    interpreted as the child's WORLD pose (URDF <origin>/parent frame
    ignored — a free joint is unconstrained; same state layout as the fast
    path's floating branch). The chart is re-centered to the principal
    rotation vector after every step, so |w| stays ≤ π and never reaches
    the exp-coordinate singularity at 2π. NOTE the velocity coords are
    CHART RATES, not world angular velocity: they coincide exactly when the
    current orientation is identity (so init_state qd is a world rate iff
    the initial orientation is), and differ by the exp-map Jacobian
    otherwise — the trade for deriving the dynamics from the Lagrangian.
    """
    jtype: str                    # 'revolute' | 'prismatic' | 'floating'
    origin_pos: np.ndarray        # (3,)
    origin_rot: np.ndarray        # (3,3)
    axis: np.ndarray              # (3,) unit (ignored for floating)
    mass: float
    inertia: np.ndarray           # (3,3) about COM, link frame
    com: np.ndarray               # (3,)
    damping: float = 0.0
    limit_lower: float = -np.inf
    limit_upper: float = np.inf
    limit_velocity: float = np.inf
    gravity_on: bool = True       # RigidModel ext-force flag: masks gravity
                                  # exactly like the 1-DoF fast paths do

    @property
    def ndof(self) -> int:
        return 6 if self.jtype == "floating" else 1


class ArticulatedTree:
    """Fixed-base tree of revolute/prismatic/floating joints; all methods
    are pure functions of (q, qd) suitable for tracing inside the jitted
    rollout. q concatenates each joint's dofs in joint order.

    ``parents[i]`` is the index of joint i's parent joint (-1 = the fixed
    base); joints must be listed in topological order (parent before
    child). Omitting ``parents`` gives a serial chain. A ``floating`` root
    makes the whole assembly free-flying (DART FreeJoint-carried skeleton);
    the Lagrangian-via-AD dynamics are chart-agnostic, so nothing but fk
    changes."""

    def __init__(self, joints: List[ChainJoint], base_pos, base_rot,
                 gravity, dt: float, dtype=jnp.float64, parents=None):
        self.joints = joints
        self.n = len(joints)
        self.parents = (list(range(-1, self.n - 1)) if parents is None
                        else list(parents))
        assert len(self.parents) == self.n
        assert all(p < i for i, p in enumerate(self.parents)), \
            "joints must be topologically ordered (parent before child)"
        self.dof_off = np.concatenate(
            [[0], np.cumsum([j.ndof for j in joints])]).astype(int)
        self.n_dof = int(self.dof_off[-1])
        self.base_pos = np.asarray(base_pos, np.float64)
        self.base_rot = np.asarray(base_rot, np.float64)
        self.gravity = np.asarray(gravity, np.float64)
        self.dt = float(dt)
        self.dtype = dtype

    # -- forward kinematics -------------------------------------------------
    def fk(self, q):
        """World pose of every joint frame: ([n,3] pos, [n,3,3] rot)."""
        base_p = jnp.asarray(self.base_pos, q.dtype)
        base_r = jnp.asarray(self.base_rot, q.dtype)
        out_p, out_r = [], []
        for i, j in enumerate(self.joints):
            par = self.parents[i]
            pp = base_p if par < 0 else out_p[par]
            pr = base_r if par < 0 else out_r[par]
            o = self.dof_off[i]
            pos = pp + pr @ jnp.asarray(j.origin_pos, q.dtype)
            rot = pr @ jnp.asarray(j.origin_rot, q.dtype)
            if j.jtype == "floating":
                # world-pose chart matching the fast path's free-joint state
                # layout (engine/rigid.py floating branch / Jade FreeJoint):
                # q[o:o+3] = exp-coords of the WORLD rotation, q[o+3:o+6] =
                # WORLD origin position; the URDF <origin> and parent frame
                # are ignored — a free joint is unconstrained
                pos = q[o + 3:o + 6]
                rot = Q.quat2mat(Q.w2quat(q[o:o + 3]))
            elif j.jtype == "revolute":
                a = jnp.asarray(j.axis, q.dtype)
                rot = rot @ Q.quat2mat(Q.w2quat(a * q[o]))
            else:  # prismatic
                a = jnp.asarray(j.axis, q.dtype)
                pos = pos + rot @ (a * q[o])
            out_p.append(pos)
            out_r.append(rot)
        return jnp.stack(out_p), jnp.stack(out_r)

    def link_velocities(self, q, qd):
        """World (w, v-at-joint-origin) per link via jax.jvp of fk —
        velocities ARE the time derivative of kinematics, so derive them
        instead of hand-writing the spatial recursion."""
        (p, R), (pd, Rd) = jax.jvp(self.fk, (q,), (qd,))
        # w^ = Rdot R^T  (skew); extract components
        W = jnp.einsum("nij,nkj->nik", Rd, R)
        w = jnp.stack([W[:, 2, 1], W[:, 0, 2], W[:, 1, 0]], axis=-1)
        return w, pd

    # -- energies ------------------------------------------------------------
    def kinetic(self, q, qd):
        p, R = self.fk(q)
        w, v = self.link_velocities(q, qd)
        ke = 0.0
        for i, j in enumerate(self.joints):
            com_w = R[i] @ jnp.asarray(j.com, q.dtype)
            v_com = v[i] + jnp.cross(w[i], com_w)
            I_w = R[i] @ jnp.asarray(j.inertia, q.dtype) @ R[i].T
            ke = ke + 0.5 * j.mass * jnp.dot(v_com, v_com) \
                + 0.5 * jnp.dot(w[i], I_w @ w[i])
        return ke

    def potential(self, q):
        p, R = self.fk(q)
        g = jnp.asarray(self.gravity, q.dtype)
        pe = jnp.zeros((), q.dtype)   # stays traced even if all links masked
        for i, j in enumerate(self.joints):
            if not j.gravity_on:
                continue
            com_w = p[i] + R[i] @ jnp.asarray(j.com, q.dtype)
            pe = pe - j.mass * jnp.dot(g, com_w)
        return pe

    # -- dynamics ------------------------------------------------------------
    def generalized_ext(self, q, qd, wrenches):
        """Map per-link world wrenches (n, 6) [force, torque-about-joint-
        origin] to generalized forces: tau = d/d qd of the wrench power."""
        def power(qd_):
            w, v = self.link_velocities(q, qd_)
            return jnp.sum(wrenches[:, :3] * v) + jnp.sum(wrenches[:, 3:] * w)
        return jax.grad(power)(qd)

    def step(self, q, qd, tau_act, wrenches):
        """Semi-implicit Euler with implicit viscous joint damping and URDF
        joint limits. tau_act: (n,) actuation; wrenches: (n, 6) external
        world wrenches about each link's joint origin (MPM contact)."""
        dt = self.dt
        M = jax.hessian(self.kinetic, argnums=1)(q, qd)
        p_fn = jax.grad(self.kinetic, argnums=1)
        dpdq = jax.jacobian(lambda q_: p_fn(q_, qd))(q)
        dke_dq = jax.grad(self.kinetic, argnums=0)(q, qd)
        dpe_dq = jax.grad(self.potential)(q)
        tau = tau_act + self.generalized_ext(q, qd, wrenches)
        rhs = tau - (dpdq @ qd - dke_dq + dpe_dq)

        # per-dof viscous damping / URDF limits (floating dofs get none)
        def per_dof(f, fill):
            out = []
            for j in self.joints:
                out += [fill] * 6 if j.jtype == "floating" else [f(j)]
            return np.asarray(out)

        D = jnp.diag(jnp.asarray(per_dof(lambda j: j.damping, 0.0), q.dtype))
        qd_new = jnp.linalg.solve(M + dt * D, M @ qd + dt * rhs)

        vel_cap = per_dof(lambda j: j.limit_velocity, np.inf)
        if np.isfinite(vel_cap).any():
            qd_new = jnp.clip(qd_new, -jnp.asarray(vel_cap, q.dtype),
                              jnp.asarray(vel_cap, q.dtype))
        q_new = q + dt * qd_new
        lo = per_dof(lambda j: j.limit_lower, -np.inf)
        hi = per_dof(lambda j: j.limit_upper, np.inf)
        if np.isfinite(lo).any() or np.isfinite(hi).any():
            q_c = jnp.clip(q_new, jnp.asarray(lo, q.dtype),
                           jnp.asarray(hi, q.dtype))
            qd_new = jnp.where(q_c != q_new, 0.0, qd_new)
            q_new = q_c

        # re-center floating charts to the principal rotation vector so a
        # tumbling base never approaches the exp-coordinate singularity;
        # the velocity coords transform through the chart map's Jacobian
        # (identity whenever |w| < pi, i.e. almost always a no-op)
        for i, j in enumerate(self.joints):
            if j.jtype != "floating":
                continue
            o = self.dof_off[i]

            def princ(wv):
                return Q.quat2w(Q.w2quat(wv))

            w_c, wd_c = jax.jvp(princ, (q_new[o:o + 3],),
                                (qd_new[o:o + 3],))
            q_new = q_new.at[o:o + 3].set(w_c)
            qd_new = qd_new.at[o:o + 3].set(wd_c)
        return q_new, qd_new

    # -- contact interface ----------------------------------------------------
    def body_states(self, q, qd):
        """Per-link (pos, quat, BODY-frame COM spatial velocity) in the same
        convention as RigidModel.body_states: contact's collider rotates
        body->world (primitive_base.py:63-70)."""
        p, R = self.fk(q)
        w, v = self.link_velocities(q, qd)
        pos, quat, vb, wb = [], [], [], []
        for i, j in enumerate(self.joints):
            bq = Q.mat2quat(R[i])
            com = jnp.asarray(j.com, q.dtype)
            w_b = Q.qrot(Q.qconj(bq), w[i])
            v_b = Q.qrot(Q.qconj(bq), v[i])
            pos.append(p[i])
            quat.append(bq)
            wb.append(w_b)
            vb.append(v_b + jnp.cross(w_b, com))
        return (jnp.stack(pos), jnp.stack(quat),
                jnp.stack(vb), jnp.stack(wb))


SerialChain = ArticulatedTree  # serial chains are the parents=None default
