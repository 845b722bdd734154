"""JAX-native articulated rigid-body dynamics (replaces Jade/nimblephysics).

The reference steps rigid bodies through the C++ Jade engine and hand-chains
Jacobians for the backward pass (``softmac/engine/rigid_simulator.py``). Here
the dynamics are a pure jnp function inside the same jitted rollout as the
MPM, so coupling crosses no device/host boundary and ``jax.grad``
differentiates end-to-end — no Jacobian bookkeeping.

Supported structure (covers every reference scene): a world-rooted tree where
each moving link attaches through a single floating / revolute / prismatic
joint to a link that is fixed with respect to the world (glass/bowl/bottle:
floating; door: revolute; gripper: fixed palm + two prismatic fingers).

State layout parity with Jade's world state (``rigid_simulator.py:55-58``):
``q`` = per-skeleton generalized positions concatenated (floating = [exp(3),
pos(3)], revolute/prismatic = [theta]), ``qd`` likewise (floating =
[w(3), v(3)] world-frame). Floor contact is a differentiable penalty
(replacing Jade's LCP floor, ``rigid_simulator.py:79-83``).
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from softmac_tpu.engine import quat as Q
from softmac_tpu.engine.meshio import UrdfModel, load_obj, load_urdf
from softmac_tpu.engine.quat import rpy2mat
from softmac_tpu.engine.types import BodyState


@struct.dataclass
class RigidState:
    q: jnp.ndarray   # (D,)
    qd: jnp.ndarray  # (D,)


@dataclasses.dataclass
class _BodyDef:
    """One moving (or fixed) collision body = one contact primitive."""
    jtype: str                  # floating | revolute | prismatic | fixed
                                # | chain | weld (fixed to a MOVING link)
    q_offset: int               # dof offset into the global q vector (-1 if fixed)
    ndof: int
    mass: float
    inertia: np.ndarray         # (3,3) about the COM, inertial frame
    com: np.ndarray             # (3,) link-frame COM (URDF <inertial><origin>)
    joint_pos: np.ndarray       # (3,) world joint origin (non-floating;
    joint_rot: np.ndarray       # for chain members: relative to the parent
    axis: np.ndarray            # moving link's joint frame)
    gravity_on: bool
    support_points: np.ndarray  # (K,3) body-frame points for floor penalty
    contact_points: np.ndarray  # (K,3) body-frame surface samples
    skeleton: int
    limit_lower: float = -np.inf
    limit_upper: float = np.inf
    limit_velocity: float = np.inf
    chain_id: int = -1          # index into RigidModel._chains (jtype chain)
    weld_parent: int = -1       # body slot the weld rides (jtype weld)


@jax.custom_vjp
def grad_scale(x, s: float):
    """Identity whose cotangent is scaled by s — implements the reference's
    ``ext_grad_scale`` gradient damping on the mpm->rigid path
    (rigid_simulator.py:150, demo_door.py:116)."""
    return x


def _grad_scale_fwd(x, s):
    return x, s


def _grad_scale_bwd(s, g):
    return (jax.tree.map(lambda t: t * s, g), None)


grad_scale.defvjp(_grad_scale_fwd, _grad_scale_bwd)


class RigidModel:
    """Force-controlled rigid simulator built from URDFs.

    Pure-function API: ``step(state, action, ext_f) -> state`` and
    ``body_states(state) -> BodyState``; all structure is closed over as
    trace-time constants.
    """

    def __init__(self, urdf_models: Sequence[UrdfModel], cfg, env_dt: float,
                 dtype=jnp.float32, ext_force_flags: Optional[Sequence[bool]] = None):
        self.dt = float(env_dt)
        self.dtype = dtype
        self.gravity = np.asarray(cfg.gravity, np.float64)
        self.enable_floor = bool(cfg.enable_floor)
        self.floor_height = float(cfg.get("floor_height", -0.08))
        self.floor_stiffness = float(cfg.get("floor_stiffness", 1e4))
        self.floor_damping = float(cfg.get("floor_damping", 10.0))
        self.ext_grad_scale = float(cfg.get("ext_grad_scale", 1.0))
        # viscous joint damping for 1-DoF joints (URDF <dynamics damping>;
        # DART applies it when declared). Without it a gram-scale hinge like
        # the door spins to its velocity limit and slams bang-bang.
        self.joint_damping = float(cfg.get("joint_damping", 0.0))
        # rigid-rigid (body-body) penalty contact — differentiable stand-in
        # for the LCP skeleton-vs-skeleton contact the reference inherits
        # from the Jade/DART world (rigid_simulator.py:17-45, resolved
        # inside nimble.timestep at :134). Off by default (no shipped scene
        # exercises body-body contact); when on, step() needs the env's SDF
        # tables (prims) to evaluate surface-point-vs-SDF penetration.
        self.body_contact = bool(cfg.get("body_contact", False))
        self.body_contact_stiffness = float(
            cfg.get("body_contact_stiffness", 1e4))
        self.body_contact_damping = float(cfg.get("body_contact_damping", 10.0))
        self.body_contact_friction = float(
            cfg.get("body_contact_friction", 0.5))
        self.body_contact_points = int(cfg.get("body_contact_points", 256))
        # Static-friction (stick) branch for body-body contact. 0 = off
        # (legacy Coulomb-clamped VISCOUS friction, which admits steady
        # creep at any driving force — PARITY.md's documented delta vs the
        # reference's LCP, whose complementarity solve can stick). When
        # > 0, the tangential force is the Coulomb-clamped force that
        # cancels the pair's relative tangential momentum within one step:
        #   ft = min(0.5 * stick * m_red/n_active * |vt|/dt, mu*fn)
        # (m_red = reduced translational mass of the pair, fixed bodies
        # infinite; split over the active sample points; 0.5 because each
        # pair is sampled from both sides). Inside the
        # friction cone a body then STOPS in one step instead of creeping;
        # outside it this is exact kinetic Coulomb friction mu*fn. stick
        # <= 1 bounds the total impulse by the relative tangential
        # momentum, so the translational approximation cannot reverse the
        # sliding direction; 0.9 leaves margin for the rotational coupling
        # the point-mass model ignores.
        self.body_contact_stick = float(cfg.get("body_contact_stick", 0.0))

        self.bodies: List[_BodyDef] = []
        self.skeleton_ndof: List[int] = []
        self._chains: List[dict] = []
        offset = 0
        per_prim_flags = list(ext_force_flags) if ext_force_flags else None

        for skel_id, model in enumerate(urdf_models):
            links = {l.name: l for l in model.links}
            by_child = {j.child: j for j in model.joints}

            def _anchor(parent_name):
                """Nearest MOVING ancestor link (None = world) + the fixed
                transform from its joint frame (or world) to parent_name."""
                segs = []
                name = parent_name
                while name in by_child and by_child[name].jtype == "fixed":
                    segs.append(by_child[name])
                    name = by_child[name].parent
                ancestor = name if name in by_child else None
                pos, rot = np.zeros(3), np.eye(3)
                for jj in reversed(segs):
                    pos = pos + rot @ jj.origin_xyz
                    rot = rot @ np.asarray(rpy2mat(tuple(jj.origin_rpy)))
                return ancestor, pos, rot

            info = {}   # child link -> (joint, moving ancestor, jpos, jrot)
            for j in model.joints:
                anc, apos, arot = _anchor(j.parent)
                jpos = apos + arot @ j.origin_xyz
                jrot = arot @ np.asarray(rpy2mat(tuple(j.origin_rpy)))
                info[j.child] = (j, anc, jpos, jrot)

            # articulated-tree detection: moving joints whose parent link
            # itself moves form fixed-base trees (engine/chain.py dynamics,
            # BFS member order so parents precede children); world-anchored
            # lone movers keep the closed-form fast paths
            movers = [j for j in model.joints if j.jtype != "fixed"]
            moving_children = {}
            for j in movers:
                anc = info[j.child][1]
                if anc is not None:
                    moving_children.setdefault(anc, []).append(j.child)
            in_chain, chain_paths = set(), []
            for j in movers:
                if info[j.child][1] is None and j.child in moving_children:
                    path, parents = [j.child], [-1]
                    frontier = [(j.child, 0)]
                    while frontier:
                        cur, pi = frontier.pop(0)
                        for kid in moving_children.get(cur, ()):
                            path.append(kid)
                            parents.append(pi)
                            frontier.append((kid, len(path) - 1))
                    chain_paths.append((path, parents))
                    in_chain.update(path)
            for j in movers:
                if info[j.child][1] is not None and j.child not in in_chain:
                    raise NotImplementedError(
                        f"link {j.child} attaches to moving link "
                        f"{info[j.child][1]} in an unsupported topology "
                        "(floating parents cannot carry child joints)")

            ndof_skel = 0
            slot_of, qoff_of = {}, {}
            welds = []   # (slot, moving-ancestor link name)
            for j in model.joints:
                link = links[j.child]
                if link.mesh_path is None:
                    if j.child in in_chain:
                        raise NotImplementedError(
                            "meshless articulated-chain links not supported")
                    continue
                jj, anc, jpos, jrot = info[j.child]
                ndof = {"floating": 6, "revolute": 1, "prismatic": 1,
                        "continuous": 1, "fixed": 0}[j.jtype]
                verts, vfaces = load_obj(link.mesh_path)
                support = _support_points(verts)
                csamples = _surface_points(verts, vfaces,
                                           self.body_contact_points)
                if j.jtype == "fixed" and anc is not None:
                    # mesh link welded onto a moving link: a kinematic
                    # primitive riding the ancestor (jpos/jrot are its fixed
                    # offset in the ancestor's body frame); its inertia is
                    # folded into the ancestor below (composite rigid body)
                    jt = "weld"
                elif j.child in in_chain:
                    jt = "chain"
                else:
                    jt = "revolute" if j.jtype == "continuous" else j.jtype
                self.bodies.append(_BodyDef(
                    jtype=jt,
                    q_offset=offset + ndof_skel if ndof > 0 else -1,
                    ndof=ndof,
                    mass=link.mass,
                    inertia=link.inertia,
                    com=np.asarray(link.inertial_origin, np.float64),
                    joint_pos=jpos,
                    joint_rot=jrot,
                    axis=(np.asarray(j.axis, np.float64)
                          / np.linalg.norm(j.axis)),
                    gravity_on=True,
                    support_points=support,
                    contact_points=csamples,
                    skeleton=skel_id,
                    limit_lower=getattr(j, "limit_lower", -np.inf),
                    limit_upper=getattr(j, "limit_upper", np.inf),
                    limit_velocity=getattr(j, "limit_velocity", np.inf),
                ))
                slot_of[j.child] = len(self.bodies) - 1
                qoff_of[j.child] = offset + ndof_skel if ndof > 0 else -1
                if jt == "weld":
                    welds.append((len(self.bodies) - 1, anc))
                ndof_skel += ndof
            offset += ndof_skel
            self.skeleton_ndof.append(ndof_skel)

            # composite rigid bodies: fold each weld's inertial properties
            # into its moving ancestor (mass-weighted com, parallel-axis
            # inertia); the ancestor's dynamics then carry the welded mass,
            # while the weld primitive itself is purely kinematic
            for s, anc in welds:
                if anc not in slot_of:
                    raise NotImplementedError(
                        f"weld ancestor {anc} has no collision mesh")
                p = slot_of[anc]
                self.bodies[s].weld_parent = p
                pb = self.bodies[p]
                d = self.bodies[s].joint_pos
                Rd = self.bodies[s].joint_rot
                m_w = self.bodies[s].mass
                c_w = d + Rd @ self.bodies[s].com
                I_w = Rd @ self.bodies[s].inertia @ Rd.T
                m_t = pb.mass + m_w
                c_t = (pb.mass * pb.com + m_w * c_w) / m_t

                def _shift(r):
                    return (r @ r) * np.eye(3) - np.outer(r, r)

                I_t = (pb.inertia + pb.mass * _shift(pb.com - c_t)
                       + I_w + m_w * _shift(c_w - c_t))
                pb.mass, pb.inertia, pb.com = m_t, I_t, c_t

            from softmac_tpu.engine.chain import ArticulatedTree, ChainJoint
            for path, tree_parents in chain_paths:
                members, qidx = [], []
                for name in path:
                    jj, anc, jpos, jrot = info[name]
                    if jj.jtype not in ("revolute", "prismatic",
                                        "continuous", "floating"):
                        raise NotImplementedError(
                            "articulated trees support revolute/prismatic/"
                            f"floating joints only (got {jj.jtype} at "
                            f"{name})")
                    bb = self.bodies[slot_of[name]]   # composite if welded-on
                    jt = ("revolute" if jj.jtype == "continuous"
                          else jj.jtype)
                    axis = np.asarray(jj.axis, np.float64)
                    if jt != "floating":
                        axis = axis / np.linalg.norm(axis)
                    members.append(ChainJoint(
                        jtype=jt,
                        origin_pos=jpos, origin_rot=jrot,
                        axis=axis,
                        mass=bb.mass, inertia=bb.inertia,
                        com=np.asarray(bb.com, np.float64),
                        damping=self.joint_damping,
                        limit_lower=getattr(jj, "limit_lower", -np.inf),
                        limit_upper=getattr(jj, "limit_upper", np.inf),
                        limit_velocity=getattr(jj, "limit_velocity", np.inf),
                    ))
                    qidx.append(qoff_of[name]
                                + np.arange(members[-1].ndof))
                cid = len(self._chains)
                self._chains.append({
                    "chain": ArticulatedTree(members, np.zeros(3), np.eye(3),
                                             self.gravity, self.dt, dtype,
                                             parents=tree_parents),
                    "slots": [slot_of[n] for n in path],
                    "qidx": np.concatenate(qidx),
                })
                for s in self._chains[-1]["slots"]:
                    self.bodies[s].chain_id = cid

        if per_prim_flags is not None:
            for b, flag in zip(self.bodies, per_prim_flags):
                b.gravity_on = bool(flag)
            for spec in self._chains:  # keep chain PE masks in sync
                for m, s in enumerate(spec["slots"]):
                    spec["chain"].joints[m].gravity_on = \
                        self.bodies[s].gravity_on

        self.state_dim_half = offset
        self.state_dim = 2 * offset
        self.action_dim = offset
        self.n_primitives = len(self.bodies)
        self.transform_action = False  # API parity; actions are world-frame

        # body-body collision pairs: cross-skeleton only (DART's world
        # collision detector; within-skeleton self-collision is off by
        # default in DART and in every reference scene), and at least one
        # side must be dynamic
        dyn = [b.jtype != "fixed" for b in self.bodies]
        self._contact_pairs = [
            (i, j)
            for i in range(self.n_primitives)
            for j in range(i + 1, self.n_primitives)
            if (self.bodies[i].skeleton != self.bodies[j].skeleton
                and (dyn[i] or dyn[j]))]

        # initial state
        if len(cfg.init_state) > 0:
            init = np.asarray(cfg.init_state, np.float64)
            assert init.shape[0] == self.state_dim, (
                f"init_state has {init.shape[0]} entries, expected {self.state_dim}")
            self._q0 = init[: self.state_dim_half]
            self._qd0 = init[self.state_dim_half:]
        else:
            self._q0 = np.zeros(self.state_dim_half)
            self._qd0 = np.zeros(self.state_dim_half)

    def set_transform_action(self, flag: bool = False):
        """API parity with the reference (rigid_simulator.py:237-244): Jade
        free-joint actions are body-frame, and the reference optionally
        rotates world actions into the body frame. This engine applies
        free-joint actions in the world frame natively, so the world-frame
        behavior (flag=True in the reference) is always in effect."""
        self.transform_action = flag

    # ------------------------------------------------------------------
    def init_state(self) -> RigidState:
        return RigidState(q=jnp.asarray(self._q0, self.dtype),
                          qd=jnp.asarray(self._qd0, self.dtype))

    def compensation_mass(self, slot: int):
        """Gravity-affected mass held by the free joint at body ``slot``
        (used by ``adjust_action_with_ext_force``): the body's own composite
        mass for fast-path floating bodies; for chain members with a
        floating joint, the mass of the joint's whole SUBTREE — member
        masses already include welded-on links via the composite fold, and
        gravity-masked members are excluded to match the chain's potential
        energy. None when the slot has no free joint."""
        b = self.bodies[slot]
        if b.jtype == "floating":
            return b.mass
        if b.jtype != "chain":
            return None
        spec = self._chains[b.chain_id]
        m = spec["slots"].index(slot)
        ch = spec["chain"]
        if ch.joints[m].jtype != "floating":
            return None

        def in_subtree(j):
            while j >= 0:
                if j == m:
                    return True
                j = ch.parents[j]
            return False

        return sum(ch.joints[j].mass for j in range(len(ch.joints))
                   if in_subtree(j) and ch.joints[j].gravity_on)

    def body_states(self, state: RigidState) -> BodyState:
        """Per-primitive world pose + BODY-frame COM spatial velocity.

        The analogue of set_ext_state (rigid_simulator.py:176-201): the
        reference exports DART's ``getCOMSpatialVelocity()``, which is the
        COM velocity **in body coordinates**; the contact collider then
        rotates body->world (primitive_base.py:63-70). Exporting world-frame
        velocities here would double-rotate them inside contact.
        """
        pos, quat, v, w = [], [], [], []
        for b in self.bodies:
            o = b.q_offset
            com = jnp.asarray(b.com, self.dtype)
            if b.jtype == "floating":
                bq = Q.w2quat(state.q[o:o + 3])
                pos.append(state.q[o + 3:o + 6])
                quat.append(bq)
                # world (w, v at origin) -> body-frame COM spatial velocity
                w_b = Q.qrot(Q.qconj(bq), state.qd[o:o + 3])
                v_b = Q.qrot(Q.qconj(bq), state.qd[o + 3:o + 6])
                w.append(w_b)
                v.append(v_b + jnp.cross(w_b, com))
            elif b.jtype == "revolute":
                # link frame = joint_rot ∘ R(axis·q); exporting
                # R(axis_w·q) alone would be off by a joint_rot similarity
                # for URDFs with <origin rpy> != 0 (latent in the reference
                # scenes, which all use rpy = 0)
                a = jnp.asarray(b.axis, self.dtype)   # unit at load
                jq = Q.mat2quat(jnp.asarray(b.joint_rot, self.dtype))
                bq = Q.qmul(jq, Q.w2quat(a * state.q[o]))
                pos.append(jnp.asarray(b.joint_pos, self.dtype))
                quat.append(bq)
                # the axis is invariant under its own rotation: body-frame
                # w = axis * qd in the LINK frame
                w_b = a * state.qd[o]
                w.append(w_b)
                v.append(jnp.cross(w_b, com))
            elif b.jtype == "prismatic":
                axis_w = jnp.asarray(b.joint_rot @ b.axis, self.dtype)
                pos.append(jnp.asarray(b.joint_pos, self.dtype) + axis_w * state.q[o])
                quat.append(Q.mat2quat(jnp.asarray(b.joint_rot, self.dtype)))
                w.append(jnp.zeros(3, self.dtype))
                # body frame = joint frame: R^T (axis_w qd) = axis qd
                v.append(jnp.asarray(b.axis, self.dtype) * state.qd[o])
            elif b.jtype in ("chain", "weld"):
                # placeholder; overwritten by the chain FK / weld
                # composition below
                pos.append(jnp.zeros(3, self.dtype))
                quat.append(jnp.asarray([1.0, 0, 0, 0], self.dtype))
                w.append(jnp.zeros(3, self.dtype))
                v.append(jnp.zeros(3, self.dtype))
            else:  # fixed
                pos.append(jnp.asarray(b.joint_pos, self.dtype))
                quat.append(Q.mat2quat(jnp.asarray(b.joint_rot, self.dtype)))
                w.append(jnp.zeros(3, self.dtype))
                v.append(jnp.zeros(3, self.dtype))
        for spec in self._chains:
            qi = jnp.asarray(spec["qidx"])
            p_c, q_c, v_c, w_c = spec["chain"].body_states(
                state.q[qi], state.qd[qi])
            for m, s in enumerate(spec["slots"]):
                pos[s], quat[s] = p_c[m], q_c[m]
                v[s], w[s] = v_c[m], w_c[m]
        for s, b in enumerate(self.bodies):
            if b.jtype != "weld":
                continue
            # compose the fixed offset onto the (already resolved) parent;
            # reconstruct the parent's body-frame ORIGIN velocity from its
            # stored COM spatial velocity, transport to the weld origin,
            # then re-express as the weld's COM spatial velocity
            p = b.weld_parent
            d = jnp.asarray(b.joint_pos, self.dtype)
            Rd = jnp.asarray(b.joint_rot, self.dtype)
            com_p = jnp.asarray(self.bodies[p].com, self.dtype)
            v_orig_p = v[p] - jnp.cross(w[p], com_p)
            w_b = Rd.T @ w[p]
            v_orig = Rd.T @ (v_orig_p + jnp.cross(w[p], d))
            pos[s] = pos[p] + Q.qrot(quat[p], d)
            quat[s] = Q.qmul(quat[p], Q.mat2quat(Rd))
            w[s] = w_b
            v[s] = v_orig + jnp.cross(w_b, jnp.asarray(b.com, self.dtype))
        return BodyState(pos=jnp.stack(pos), quat=jnp.stack(quat),
                         v=jnp.stack(v), w=jnp.stack(w))

    # ------------------------------------------------------------------
    def step(self, state: RigidState, action: Optional[jnp.ndarray],
             ext_f: jnp.ndarray, prims=None) -> RigidState:
        """Semi-implicit Euler step. ext_f: (B, 6) window-averaged wrench
        [force, torque-about-body-origin] per primitive. ``prims`` (per-body
        SDF tables, same order as bodies) is required when
        ``RIGID.body_contact`` is on."""
        if action is None:
            action = jnp.zeros((self.action_dim,), self.dtype)
        action = action.reshape(-1)[: self.action_dim]

        q, qd = state.q, state.qd
        new_q, new_qd = q, qd
        g = jnp.asarray(self.gravity, self.dtype)
        dt = self.dt

        # every primitive's MEASURED wrench is gated by its own ext-force
        # flag exactly once, up front; nothing below re-masks (floor-penalty
        # wrenches added later are intentionally not gated — matching the
        # fast path, where the floor acts regardless of the flag)
        if any(not b.gravity_on for b in self.bodies):
            mask = jnp.asarray([1.0 if b.gravity_on else 0.0
                                for b in self.bodies], self.dtype)
            ext_f = ext_f * mask[:, None]

        weld_slots = [s for s, b in enumerate(self.bodies)
                      if b.jtype == "weld"]
        do_body_contact = self.body_contact and bool(self._contact_pairs)
        need_states = (bool(weld_slots) or do_body_contact
                       or (self.enable_floor and bool(self._chains)))
        bs = self.body_states(state) if need_states else None
        if do_body_contact:
            if prims is None:
                raise ValueError(
                    "RIGID.body_contact is on but no SDF tables were passed "
                    "to RigidModel.step(prims=...)")
            # added AFTER the ext-force-flag mask (like the floor penalty,
            # body contact acts regardless of enable_external_force) and
            # BEFORE the weld fold (contact on a welded primitive must act
            # on its composite carrier)
            ext_f = ext_f + self.body_contact_wrenches(bs, prims)
        if weld_slots:
            # contact (and floor) wrenches on welded primitives act on the
            # composite body: shift each to the parent's origin
            # ([f, t + r x f]) and zero the weld row (welds have no
            # dynamics of their own)
            for s in weld_slots:
                p = self.bodies[s].weld_parent
                f, t = ext_f[s, :3], ext_f[s, 3:]
                if self.enable_floor:
                    f_fl, t_fl = self._floor_wrench(
                        self.bodies[s], *self._world_state_of(bs, s))
                    f = f + f_fl
                    t = t + t_fl
                r = bs.pos[s] - bs.pos[p]
                ext_f = (ext_f.at[p, :3].add(f)
                         .at[p, 3:].add(t + jnp.cross(r, f))
                         .at[s].set(0.0))

        for i, b in enumerate(self.bodies):
            o = b.q_offset
            f_ext = ext_f[i, :3]
            t_ext = ext_f[i, 3:]

            if b.jtype == "floating":
                exp, pos = q[o:o + 3], q[o + 3:o + 6]
                w, v = qd[o:o + 3], qd[o + 3:o + 6]
                bq = Q.w2quat(exp)
                R = Q.quat2mat(bq)
                r_c = R @ jnp.asarray(b.com, self.dtype)  # world COM offset

                # action layout [torque(3), force(3)] per free joint, world
                # frame, applied at the body origin (Jade free-joint forces)
                tau_o = action[o:o + 3] + t_ext           # torque about origin
                force = action[o + 3:o + 6] + f_ext       # excludes gravity

                if self.enable_floor:
                    f_fl, t_fl = self._floor_wrench(b, pos, bq, v, w)
                    force = force + f_fl
                    tau_o = tau_o + t_fl

                # Newton-Euler about the COM: gravity contributes no torque
                # there, all origin-referenced wrenches shift by -r_c x F.
                tau_c = tau_o - jnp.cross(r_c, force)
                if b.gravity_on:
                    force = force + b.mass * g

                I_w = R @ jnp.asarray(b.inertia, self.dtype) @ R.T
                w_dot = jnp.linalg.solve(I_w, tau_c - jnp.cross(w, I_w @ w))
                w_new = w + dt * w_dot
                v_c = v + jnp.cross(w, r_c)
                v_c_new = v_c + dt * force / b.mass
                bq_new = Q.qmul(Q.w2quat(w_new * dt), bq)
                r_c_new = Q.qrot(bq_new, jnp.asarray(b.com, self.dtype))
                pos_new = (pos + r_c) + dt * v_c_new - r_c_new
                v_new = v_c_new - jnp.cross(w_new, r_c_new)
                exp_new = Q.quat2w(bq_new)

                new_q = new_q.at[o:o + 3].set(exp_new).at[o + 3:o + 6].set(pos_new)
                new_qd = new_qd.at[o:o + 3].set(w_new).at[o + 3:o + 6].set(v_new)

            elif b.jtype == "revolute":
                axis_w = jnp.asarray(b.joint_rot @ b.axis, self.dtype)
                # torque about the joint axis from the body-origin wrench
                # (body origin == joint origin for the reference's URDFs)
                tau = action[o] + jnp.dot(axis_w, t_ext)
                if b.gravity_on:
                    a = jnp.asarray(b.axis, self.dtype)   # unit at load
                    bq = Q.qmul(Q.mat2quat(jnp.asarray(b.joint_rot,
                                                       self.dtype)),
                                Q.w2quat(a * q[o]))
                    com_w = Q.qrot(bq, jnp.asarray(b.com, self.dtype))
                    tau = tau + jnp.dot(axis_w, jnp.cross(com_w, b.mass * g))
                # parallel axis: URDF inertia is about the COM; the joint
                # axis passes through the body origin at distance
                # d = |c - (c.a)a| from the COM
                c, a = b.com, b.axis                      # unit at load
                I_a = float(a @ b.inertia @ a
                            + b.mass * (c @ c - (c @ a) ** 2))
                # implicit viscous damping (explicit -c*qd is unstable once
                # dt*c/I > 2, which a gram-scale hinge hits immediately)
                qd_new = (qd[o] + dt * tau / I_a) / (1.0 + dt * self.joint_damping / I_a)
                qd_new, q_new = self._apply_joint_limits(b, q[o], qd_new)
                new_qd = new_qd.at[o].set(qd_new)
                new_q = new_q.at[o].set(q_new)

            elif b.jtype == "prismatic":
                axis_w = jnp.asarray(b.joint_rot @ b.axis, self.dtype)
                f_axis = action[o] + jnp.dot(axis_w, f_ext)
                if b.gravity_on:
                    f_axis = f_axis + jnp.dot(axis_w, b.mass * g)
                qd_new = (qd[o] + dt * f_axis / b.mass) / (
                    1.0 + dt * self.joint_damping / b.mass)
                qd_new, q_new = self._apply_joint_limits(b, q[o], qd_new)
                new_qd = new_qd.at[o].set(qd_new)
                new_q = new_q.at[o].set(q_new)
            # fixed: nothing; chain members handled jointly below

        for spec in self._chains:
            qi = jnp.asarray(spec["qidx"])
            ch = spec["chain"]
            tau = action[qi]
            rows = []
            for m, s in enumerate(spec["slots"]):
                b = self.bodies[s]
                fe = ext_f[s, :3]
                te = ext_f[s, 3:]
                if self.enable_floor:
                    f_fl, t_fl = self._floor_wrench(
                        b, *self._world_state_of(bs, s))
                    fe = fe + f_fl
                    te = te + t_fl
                if ch.joints[m].jtype == "floating":
                    # free-joint actions are world wrenches at the body
                    # origin ([torque(3), force(3)], matching the fast
                    # path); route them through the wrench row so the
                    # chart's J^T maps them to generalized forces exactly
                    o = int(ch.dof_off[m])
                    te = te + tau[o:o + 3]
                    fe = fe + tau[o + 3:o + 6]
                    tau = tau.at[o:o + 6].set(0.0)
                rows.append(jnp.concatenate([fe, te]))
            q_n, qd_n = ch.step(q[qi], qd[qi], tau, jnp.stack(rows))
            new_q = new_q.at[qi].set(q_n)
            new_qd = new_qd.at[qi].set(qd_n)

        return RigidState(q=new_q, qd=new_qd)

    def _apply_joint_limits(self, b: _BodyDef, q_old, qd_new):
        """URDF joint limits (the reference's Jade/DART enforces the declared
        <limit> tags, e.g. door.urdf velocity 6.545, position +-3.14):
        velocity clamp + position clamp with qd zeroed at the stops."""
        dt = self.dt
        if np.isfinite(b.limit_velocity):
            qd_new = jnp.clip(qd_new, -b.limit_velocity, b.limit_velocity)
        q_new = q_old + dt * qd_new
        if np.isfinite(b.limit_lower) or np.isfinite(b.limit_upper):
            q_clamped = jnp.clip(q_new, b.limit_lower, b.limit_upper)
            at_stop = q_clamped != q_new
            qd_new = jnp.where(at_stop, 0.0, qd_new)
            q_new = q_clamped
        return qd_new, q_new

    # ------------------------------------------------------------------
    def _world_state_of(self, bs: BodyState, s: int):
        """(pos, quat, world v-at-origin, world w) of body slot s, recovered
        from body_states' stored body-frame COM spatial velocity."""
        com = jnp.asarray(self.bodies[s].com, self.dtype)
        w_w = Q.qrot(bs.quat[s], bs.w[s])
        v_w = Q.qrot(bs.quat[s], bs.v[s] - jnp.cross(bs.w[s], com))
        return bs.pos[s], bs.quat[s], v_w, w_w

    def _floor_wrench(self, b: _BodyDef, pos, bq, v, w):
        """Spring-damper floor penalty at precomputed support points."""
        pts = jnp.asarray(b.support_points, self.dtype)  # (K,3)
        p_w = Q.qrot(jnp.broadcast_to(bq, (pts.shape[0], 4)), pts) + pos
        r = p_w - pos
        v_pt = v + jnp.cross(jnp.broadcast_to(w, r.shape), r)
        pen = self.floor_height - p_w[:, 1]
        active = pen > 0.0
        pen = jnp.where(active, pen, 0.0)
        fn = self.floor_stiffness * pen - self.floor_damping * v_pt[:, 1] * active
        fn = jnp.maximum(fn, 0.0)
        # tangential: viscous friction proportional to normal force
        ft = -jnp.stack([v_pt[:, 0], jnp.zeros_like(fn), v_pt[:, 2]], axis=-1)
        f = jnp.zeros_like(ft).at[:, 1].set(fn) + 2.0 * fn[:, None] * ft
        f = jnp.where(active[:, None], f, 0.0)
        tau = jnp.sum(jnp.cross(r, f), axis=0)
        return jnp.sum(f, axis=0), tau

    # ------------------------------------------------------------------
    # rigid-rigid (body-body) penalty contact
    # ------------------------------------------------------------------
    def body_contact_wrenches(self, bs: BodyState, prims) -> jnp.ndarray:
        """(B, 6) world wrenches [force, torque-about-body-origin] from
        body-body penalty contact over all cross-skeleton pairs.

        Differentiable replacement for the Jade/DART world's LCP
        skeleton-skeleton contact (reference rigid_simulator.py:17-45).
        Two-sided sampling: each pair is evaluated as A-points-vs-B-SDF plus
        B-points-vs-A-SDF, so face-face and edge-face configurations are
        caught from either side. Forces are equal-and-opposite at the same
        world points, so total linear momentum is conserved exactly under
        the shared semi-implicit step and angular momentum to O(dt)."""
        slots = sorted({s for p in self._contact_pairs for s in p})
        world = {s: self._world_state_of(bs, s) for s in slots}
        wr = jnp.zeros((self.n_primitives, 6), self.dtype)
        for i, j in self._contact_pairs:
            for a, b in ((i, j), (j, i)):
                wr = self._points_vs_sdf_wrench(wr, a, b, world, prims)
        return wr

    def _pair_reduced_mass(self, a: int, b: int) -> float:
        """Reduced translational mass of a contact pair; fixed bodies count
        as infinite (their velocity is not changed by the contact)."""
        inv = 0.0
        for s in (a, b):
            if self.bodies[s].jtype != "fixed":
                inv += 1.0 / max(self.bodies[s].mass, 1e-12)
        return 1.0 / max(inv, 1e-12)

    def _points_vs_sdf_wrench(self, wr, a: int, b: int, world, prims):
        """Penalty wrench from body a's surface samples against body b's
        SDF, accumulated into both rows of ``wr``."""
        from softmac_tpu.engine import sdf as sdf_mod

        pts = jnp.asarray(self.bodies[a].contact_points, self.dtype)  # (K,3)
        pos_a, q_a, v_a, w_a = world[a]
        pos_b, q_b, v_b, w_b = world[b]
        p_w = Q.qrot(jnp.broadcast_to(q_a, (pts.shape[0], 4)), pts) + pos_a
        sdf, n_t = sdf_mod.sample_sdf_normal_world(
            prims[b],
            (pos_b[0], pos_b[1], pos_b[2]),
            (q_b[0], q_b[1], q_b[2], q_b[3]),
            (p_w[:, 0], p_w[:, 1], p_w[:, 2]))
        n = jnp.stack(n_t, axis=-1)                       # (K,3) world, unit
        act = (sdf < 0.0).astype(self.dtype)              # BIG outside box

        r_a = p_w - pos_a
        r_b = p_w - pos_b
        v_pa = v_a + jnp.cross(jnp.broadcast_to(w_a, r_a.shape), r_a)
        v_pb = v_b + jnp.cross(jnp.broadcast_to(w_b, r_b.shape), r_b)
        v_rel = v_pa - v_pb
        vn = jnp.sum(v_rel * n, axis=-1)

        pen = jnp.maximum(-sdf, 0.0) * act
        fn = jnp.maximum(
            self.body_contact_stiffness * pen
            - self.body_contact_damping * vn * act, 0.0)

        # Coulomb-clamped viscous friction (same stabilization as the
        # MPM-side contact: an unclamped viscous term is a stiffness in
        # disguise). With body_contact_stick > 0 the tangential force is
        # instead the Coulomb-clamped force cancelling the pair's MEAN
        # relative tangential momentum within one step (see __init__),
        # distributed over the samples proportionally to their normal
        # force so every per-point friction cone still holds. Mean (not
        # per-point) velocity: cancelling each point's own vt at near-
        # momentum scale over-cancels the ROTATIONAL subspace (the
        # point-level effective mass I/r^2 is far below m) and pumps an
        # oscillating slide; the mean couples only to the translational
        # momentum the reduced mass actually models. Residual slide under
        # a sub-cone driving force F is O(F*dt/m) per velocity level —
        # the stick analogue of an LCP's exact per-step v_t = 0 — and
        # torsional creep about the contact normal is NOT resisted
        # (mean vt = 0 for pure spin; documented in PARITY.md).
        vt = v_rel - vn[:, None] * n
        vt_norm = jnp.sqrt(jnp.sum(vt * vt, axis=-1) + 1e-24)
        mu = self.body_contact_friction
        if self.body_contact_stick > 0.0:
            # 0.5: every unordered pair is sampled from BOTH sides (a-vs-b
            # and b-vs-a), and either directed pass alone would cancel the
            # full mean momentum — without the halving the pair applies up
            # to 2x the cancelling impulse and can reverse the slide.
            n_act = jnp.maximum(jnp.sum(act), 1.0)
            fn_sum = jnp.maximum(jnp.sum(fn), 1e-24)
            vt_mean = jnp.sum(act[:, None] * vt, axis=0) / n_act
            vtm = jnp.sqrt(jnp.sum(vt_mean * vt_mean) + 1e-24)
            f_tot = jnp.minimum(
                0.5 * self.body_contact_stick
                * self._pair_reduced_mass(a, b) * vtm / self.dt,
                mu * fn_sum)
            f_t = -(f_tot / fn_sum) * fn[:, None] * (vt_mean / vtm)
        else:
            ft_mag = jnp.minimum(self.body_contact_damping * vt_norm,
                                 mu * fn)
            f_t = -ft_mag[:, None] * vt / vt_norm[:, None]
        f = (fn[:, None] * n + f_t) * act[:, None]

        F = jnp.sum(f, axis=0)
        tau_a = jnp.sum(jnp.cross(r_a, f), axis=0)
        tau_b = jnp.sum(jnp.cross(r_b, -f), axis=0)
        return (wr.at[a, :3].add(F).at[a, 3:].add(tau_a)
                  .at[b, :3].add(-F).at[b, 3:].add(tau_b))


def _support_points(verts: np.ndarray, k: int = 8) -> np.ndarray:
    """Bounding-box corners of the collision mesh (floor-penalty contacts)."""
    lo, hi = verts.min(0), verts.max(0)
    corners = np.array([[x, y, z] for x in (lo[0], hi[0])
                        for y in (lo[1], hi[1]) for z in (lo[2], hi[2])])
    return corners


def _surface_points(verts: np.ndarray, faces: np.ndarray, k: int) -> np.ndarray:
    """Deterministic k-point surface sample for body-body contact.

    Welded mesh vertices (dedup first — OBJ exports store per-face corners,
    which would weight shared corners 4-6x), evenly strided down when the
    mesh has more than k. Coarse meshes are filled UP to k with seeded
    area-weighted samples on the triangle interiors: vertex-only sampling
    has a coverage hole on large flat faces (two axis-aligned boxes slide
    their corners along each other's surface planes and never register
    penetration)."""
    from softmac_tpu.engine.sdf import weld_vertices
    v, f = weld_vertices(np.asarray(verts, np.float64),
                         np.asarray(faces, np.int64))
    if len(v) >= k:
        return v[np.linspace(0, len(v) - 1, k).astype(int)]
    a, b, c = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
    area = 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=-1)
    if area.sum() <= 0.0:
        return v
    rng = np.random.RandomState(0)
    n_extra = k - len(v)
    fi = rng.choice(len(f), n_extra, p=area / area.sum())
    r1, r2 = rng.rand(n_extra), rng.rand(n_extra)
    su = np.sqrt(r1)
    extra = (a[fi] * (1 - su)[:, None]
             + b[fi] * (su * (1 - r2))[:, None]
             + c[fi] * (su * r2)[:, None])
    return np.concatenate([v, extra])


class RigidVelocityModel:
    """Velocity-controlled rigid bodies (replaces
    ``softmac/engine/rigid_simulator_vel.py``): no dynamics — actions set each
    body's (w, v) for the next window, poses integrate kinematically."""

    def __init__(self, n_primitives: int, cfg, substeps: int, env_dt: float,
                 dtype=jnp.float32):
        self.n_primitives = n_primitives
        self.substeps = substeps
        self.dtype = dtype
        init = np.asarray(cfg.init_state, np.float64)
        assert init.shape[0] == 12 * n_primitives
        self._init = init

    def init_bodies(self) -> BodyState:
        n = self.n_primitives
        pos, quat, v, w = [], [], [], []
        for i in range(n):
            pose = self._init[i * 6: i * 6 + 6]
            vel = self._init[n * 6 + i * 6: n * 6 + i * 6 + 6]
            pos.append(pose[3:])
            quat.append(np.asarray(Q.w2quat(jnp.asarray(pose[:3]))))
            w.append(vel[:3])
            v.append(vel[3:])
        return BodyState(
            pos=jnp.asarray(np.stack(pos), self.dtype),
            quat=jnp.asarray(np.stack(quat), self.dtype),
            v=jnp.asarray(np.stack(v), self.dtype),
            w=jnp.asarray(np.stack(w), self.dtype),
        )

    @staticmethod
    def forward_kinematics(bodies: BodyState, dt: float) -> BodyState:
        """One-substep pose integration (primitive_base.py:280-283)."""
        pos = bodies.pos + bodies.v * dt
        quat = Q.qmul(Q.w2quat(bodies.w * dt), bodies.quat)
        return bodies.replace(pos=pos, quat=quat)

    def apply_action(self, bodies: BodyState, action: jnp.ndarray) -> BodyState:
        """Set (w, v) from the action for the coming window
        (primitive_base.py:299-313: action = [w(3), v(3)] per primitive)."""
        a = action.reshape(self.n_primitives, 6).astype(self.dtype)
        return bodies.replace(w=a[:, :3], v=a[:, 3:])
