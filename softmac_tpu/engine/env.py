"""Scene building and the environment facade.

``SoftMacEnv`` (aliased ``TaichiEnv`` for reference parity,
``softmac/engine/taichi_env.py``) keeps the reference's imperative API —
``reset / step / compute_loss / backward / render`` — but the compute path is
one jitted, differentiable rollout:

    rollout = scan over sample blocks
                of scan over env steps           (remat)
                  of scan over MPM substeps
              + loss on sampled block boundaries

The coupling bus of the reference (GPU->CPU wrench readback, Jade C++ step,
CPU->GPU pose upload, hand-chained Jacobians; ``rigid_simulator.py:85-173``)
is pure dataflow inside the jitted program, and ``env.backward()`` is
``jax.grad`` of the whole rollout.
"""
from __future__ import annotations

import functools
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from softmac_tpu.engine import mpm as mpm_mod
from softmac_tpu.engine.losses import LOSS_REGISTRY, FrameSample
from softmac_tpu.engine.materials import lame_parameters
from softmac_tpu.engine.meshio import load_obj, load_urdf
from softmac_tpu.engine.rigid import (
    RigidModel, RigidState, RigidVelocityModel, grad_scale,
)
from softmac_tpu.engine.sdf import preprocess_sdf, sdf_params_from_bake
from softmac_tpu.engine.shapes import Shapes
from softmac_tpu.engine.types import (
    BodyState, MPMConfig, MPMParams,
    mpm_state_from_packed, mpm_state_zero,
)

REPO_ROOT = Path(__file__).resolve().parents[2]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def clip_cotangent(x, cap: float):
    """Identity whose backward pass (a) zeroes non-finite cotangent entries
    and (b) rescales the cotangent pytree to global L2 norm <= cap.

    Applied to the rollout carry at block boundaries this is adaptive
    gradient-clipping-through-time: long chaotic MPM horizons grow their
    adjoint exponentially (BASELINE.md: ~1e3x by 1000 substeps in ANY
    precision — the reference fights it with f64 + a fixed ext_grad_scale =
    1/40, demo_door.py:116); clipping keeps the direction and bounds the
    magnitude only when it actually explodes."""
    return x


def _clip_cot_fwd(x, cap):
    return x, None


def _clip_cot_bwd(cap, _, g):
    g = jax.tree.map(
        lambda t: jnp.where(jnp.isfinite(t), t, 0.0).astype(t.dtype)
        if jnp.issubdtype(t.dtype, jnp.floating) else t, g)
    sq = sum(jnp.sum(t * t) for t in jax.tree.leaves(g)
             if jnp.issubdtype(t.dtype, jnp.floating))
    norm = jnp.sqrt(sq + 1e-30)
    scale = jnp.minimum(1.0, cap / norm)
    g = jax.tree.map(
        lambda t: (t * scale).astype(t.dtype)
        if jnp.issubdtype(t.dtype, jnp.floating) else t, g)
    return (g,)


clip_cotangent.defvjp(_clip_cot_fwd, _clip_cot_bwd)


def _resolve_dtype(cfg) -> jnp.dtype:
    """f32 on accelerators, f64 on CPU when x64 is enabled ("auto")."""
    choice = cfg.TPU.compute_dtype if "TPU" in cfg else "auto"
    if choice in ("float32", "f32"):
        return jnp.float32
    if choice in ("float64", "f64"):
        return jnp.float64
    if jax.config.jax_enable_x64 and jax.default_backend() == "cpu":
        return jnp.float64
    return jnp.float32


class SoftMacEnv:
    def __init__(self, cfg, loss: bool = True, search_dirs=None,
                 init_particles=None):
        self.cfg_full = cfg
        self.cfg = cfg.ENV
        self.env_dt = cfg.env_dt
        self.mpm_scale = cfg.get("mpm_scale", 1.0)
        self.control_mode = cfg.control_mode
        self.rigid_velocity_control = cfg.rigid_velocity_control
        self.search_dirs = [str(p) for p in (search_dirs or [])] + [
            ".", str(REPO_ROOT)]
        self.dtype = _resolve_dtype(cfg)

        # ---------------- particles ----------------------------------------
        # init_particles overrides SHAPES with an explicit (N, 3) position
        # array (or (N, >=6) packed state whose first 3 columns are x) — the
        # constructor path for scaled/bench scenes and procedurally generated
        # states (no SHAPES sampling).
        if init_particles is not None:
            init_particles = np.asarray(init_particles, np.float64)
            self.shapes = None
            self.init_particles = init_particles[:, :3]
            self.particle_colors = np.zeros(len(init_particles), np.int64)
        else:
            self.shapes = Shapes(cfg.SHAPES, search_dirs=self.search_dirs)
            self.init_particles, self.particle_colors = self.shapes.get()
        self.n_particles = len(self.init_particles)

        # ---------------- primitives (URDF -> SDF tables) -------------------
        self.urdf_models = []
        self.prims = []
        self.prim_colors = []
        self.prim_meshes = []           # (verts, faces) per primitive, rest frame
        prim_friction = []
        prim_contact_enabled = []
        prim_ext_force = []
        self.has_cloth = bool(cfg.get("CLOTH") and cfg.CLOTH.get("sceneConfig"))
        prim_cfgs = cfg.PRIMITIVES if isinstance(cfg.PRIMITIVES, (list, tuple)) else []
        for pc in prim_cfgs:
            urdf_path = self._resolve(pc.urdf_path)
            model = load_urdf(str(urdf_path))
            self.urdf_models.append(model)
            for link, joint in model.moving_links():
                verts, faces = load_obj(link.mesh_path)
                bake = preprocess_sdf(verts, faces, Path(link.mesh_path).parent)
                self.prims.append(sdf_params_from_bake(bake, self.dtype))
                self.prim_colors.append(link.color)
                self.prim_meshes.append((verts, faces))
                prim_friction.append(pc.friction)
                prim_contact_enabled.append(True)
                prim_ext_force.append(bool(pc.get("enable_external_force", True)))
        self.prims = tuple(self.prims)
        self.n_primitives = len(self.prims)

        # ---------------- MPM config/params ---------------------------------
        sim = cfg.SIMULATOR
        quality = sim.quality * (0.5 if sim.dim == 3 else 1.0)
        substeps = int(round(cfg.env_dt / sim.dt))
        self.substeps = substeps
        active_window = None
        if "TPU" in cfg and cfg.TPU.get("active_window"):
            active_window = tuple(cfg.TPU.active_window)
        # construction-time window sanity: the window tracks the particle
        # centroid per substep, so it must at least cover the INITIAL
        # blob's stencil extent (travel beyond that is what the runtime
        # window_overflow flag watches). Failing this means the FIRST
        # substep already drops particle mass silently.
        if active_window is not None:
            cells = np.floor(self.init_particles
                             * (128 * quality / self.mpm_scale) - 0.5)
            ext = cells.max(0) - cells.min(0) + 3   # stencil rows base..+2
            for d, w in enumerate(active_window):
                if ext[d] > w:
                    import warnings
                    warnings.warn(
                        f"TPU.active_window[{d}]={w} cannot cover the "
                        f"initial particle extent ({int(ext[d])} stencil "
                        "rows): mass will be dropped from the transfers "
                        "on the FIRST substep. Enlarge the window.")
        # chunked-kernel tile (VERDICT r3 #5): env var (sweep tooling) >
        # explicit cfg.TPU.tile_c > per-scene auto rule
        import os as _os
        chunk_tile = 0
        if active_window:
            t_env = _os.environ.get("SOFTMAC_TPU_TILE_C")
            t_cfg = cfg.TPU.get("tile_c", "auto") if "TPU" in cfg else "auto"
            if t_env:
                chunk_tile = int(t_env)
            elif t_cfg not in ("auto", None, 0, ""):
                chunk_tile = int(t_cfg)
            else:
                chunk_tile = mpm_mod.auto_chunk_tile(self.n_particles)
        self.mpm_cfg = MPMConfig(
            n_particles=self.n_particles,
            n_grid=int(128 * quality),
            dt=sim.dt,
            substeps=substeps,
            active_window=active_window,
            material_model=sim.material_model,
            ptype=sim.ptype,
            collision_type=sim.collision_type,
            ground_friction=sim.ground_friction,
            n_primitives=self.n_primitives,
            n_controllers=sim.n_controllers,
            primitives_contact=tuple(prim_contact_enabled),
            enable_external_force=tuple(prim_ext_force),
            rigid_velocity_control=self.rigid_velocity_control,
            mpm_scale=self.mpm_scale,
            contact_push_velocity_cap=float(
                sim.get("contact_push_velocity_cap", np.inf)),
            cfl_velocity_clamp=float(sim.get("cfl_velocity_clamp", np.inf)),
            chunk_tile=chunk_tile,
            dtype=self.dtype,
        )
        mu, lam = lame_parameters(sim.E, sim.nu, sim.ptype)
        n = self.n_particles
        self.mpm_params = MPMParams(
            mu=jnp.full((n,), mu, self.dtype),
            lam=jnp.full((n,), lam, self.dtype),
            yield_stress=jnp.full((n,), sim.yield_stress, self.dtype),
            gravity=jnp.asarray(sim.gravity, self.dtype),
            control_idx=jnp.full((n,), -1, jnp.int32),
            friction=jnp.asarray(prim_friction or [0.0], self.dtype),
            softness=jnp.full((max(self.n_primitives, 1),), 666.0, self.dtype),
        )

        # ---------------- cloth simulator -----------------------------------
        self.cloth_model = None
        self.cloth_params = None
        if self.has_cloth:
            from softmac_tpu.engine.cloth import (
                ClothModel, parse_scene_config, transform_mesh)
            from softmac_tpu.engine.cloth_contact import (
                ClothContactParams, process_faces)

            scene = dict(cfg.CLOTH.sceneConfig[0])
            mesh_name = Path(str(scene["fabric:name"])).name
            mesh_path = self._resolve(Path("envs/assets") /
                                      mesh_name.split(".")[0].split("_")[0] / mesh_name)
            cverts, cfaces = load_obj(mesh_path)
            if len(cfg.CLOTH.get("transform", [])) > 0:
                cverts = transform_mesh(cverts, dict(cfg.CLOTH.transform[0]))
            sp = parse_scene_config(scene)
            sp["dt"] = cfg.env_dt
            sp["velocity_damping"] = float(cfg.CLOTH.get("velocity_damping", 0.02))
            if cfg.CLOTH.get("n_iterations"):
                # CLOTH.n_iterations overrides the sceneConfig's
                # solverIterations (and the default 20 PD iterations)
                sp["n_iterations"] = int(cfg.CLOTH.n_iterations)
            self.cloth_model = ClothModel(cverts, cfaces, dtype=self.dtype, **sp)

            pcfg = cfg.PRIMITIVES  # cloth scenes: a single contact-param node
            nb_cache = Path(mesh_path).parent / f"adjacency_{mesh_name}.npz"
            if nb_cache.exists():
                data = np.load(nb_cache)
                nb, nd = data["neighbors"], data["dirs"]
            else:
                nb, nd = process_faces(cfaces, n_neighbors=200)
                np.savez_compressed(nb_cache, neighbors=nb, dirs=nd)
            self.cloth_params = ClothContactParams(
                faces=jnp.asarray(cfaces, jnp.int32),
                neighbor_faces=jnp.asarray(nb, jnp.int32),
                neighbor_dirs=jnp.asarray(nd, jnp.int8),
                friction=jnp.asarray(pcfg.friction, self.dtype),
                softness=jnp.asarray(pcfg.get("softness", 666.0), self.dtype),
                cloth_force_scale=jnp.asarray(
                    pcfg.get("cloth_force_scale", 1.0), self.dtype),
                mpm_force_scale=jnp.asarray(
                    pcfg.get("mpm_force_scale", 1.0), self.dtype),
                sticky=bool(pcfg.get("sticky", False)),
                mpm_scale=float(self.mpm_scale),
                push_velocity_cap=float(pcfg.get("push_velocity_cap", 5.0)),
                contact_geom_grad_scale=float(
                    pcfg.get("contact_geom_grad_scale", 1.0)),
                contact_cv_grad_scale=float(
                    pcfg.get("contact_cv_grad_scale", 1.0)),
            )

        # ---------------- rigid simulator ----------------------------------
        self.rigid_model: Optional[RigidModel] = None
        self.rigid_vel_model: Optional[RigidVelocityModel] = None
        if self.n_primitives > 0:
            if self.rigid_velocity_control:
                self.rigid_vel_model = RigidVelocityModel(
                    self.n_primitives, cfg.RIGID, substeps, cfg.env_dt, self.dtype)
            else:
                self.rigid_model = RigidModel(
                    self.urdf_models, cfg.RIGID, cfg.env_dt, self.dtype,
                    ext_force_flags=prim_ext_force)
                assert self.rigid_model.n_primitives == self.n_primitives
        self.ext_grad_scale = float(cfg.RIGID.get("ext_grad_scale", 1.0))

        # ---------------- loss ----------------------------------------------
        self.use_loss = loss and cfg.ENV.loss_type != ""
        self.loss = None
        if self.use_loss:
            self.loss = LOSS_REGISTRY[cfg.ENV.loss_type](cfg.ENV.loss, self)

        # ---------------- action dims ----------------------------------------
        if self.control_mode == "mpm":
            self.action_dim = self.mpm_cfg.n_controllers * 3
        elif self.control_mode == "cloth":
            self.action_dim = 3 * len(self.cloth_model.attachment_idx)
        elif self.rigid_velocity_control:
            self.action_dim = 6 * self.n_primitives
        else:
            self.action_dim = self.rigid_model.action_dim if self.rigid_model else 0

        # ---------------- multi-chip -----------------------------------------
        # When set (by parallel/sharding.py inside a shard_map trace), every
        # substep combines particle-sharded partials over this mesh axis.
        self.particle_axis_name = None

        # ---------------- runtime state (facade) ------------------------------
        self._is_copy = False
        self._renderer = None
        self._overflow_warned = False
        self.keep_history = True
        self._jit_cache = {}
        self._step_jit = self._make_step_jit()
        self.reset()

    def _make_step_jit(self):
        # prims/params ride as traced jit ARGUMENTS (not closure constants):
        # the SDF tables are tens of MB per primitive and would otherwise be
        # embedded in every compiled step/rollout executable
        return jax.jit(lambda c, a, prims, params, cparams: self._env_step_fn(
            c, a, params=params, prims=prims, cloth_params=cparams))

    # ==================================================================
    # scene helpers
    # ==================================================================
    def _resolve(self, path) -> Path:
        p = Path(path)
        if p.exists():
            return p
        for d in self.search_dirs:
            cand = Path(d) / p
            if cand.exists():
                return cand
        raise FileNotFoundError(f"{path} not found in {self.search_dirs}")

    def set_copy(self, is_copy: bool):
        self._is_copy = is_copy
        self.keep_history = not is_copy

    def set_control_idx(self, idx: np.ndarray):
        # control_idx rides inside the traced params argument: no compiled
        # program depends on its VALUES, so nothing needs rebuilding
        self.mpm_params = self.mpm_params.replace(
            control_idx=jnp.asarray(idx, jnp.int32))

    # ==================================================================
    # initial state
    # ==================================================================
    def _initial_carry(self):
        x0 = np.asarray(self.init_particles, np.float64)
        if x0.shape[1] == 3:
            mpm0 = mpm_state_zero(self.mpm_cfg, jnp.asarray(x0))
        else:
            mpm0 = mpm_state_from_packed(self.mpm_cfg, jnp.asarray(x0))

        if self.has_cloth:
            from softmac_tpu.engine.cloth_contact import (
                PenetrationState, get_contact_pair)
            cloth0 = self.cloth_model.init_state()
            x0v = (mpm0.x[0], mpm0.x[1], mpm0.x[2])
            pen0 = jnp.zeros((self.n_particles,), jnp.int8)
            cid0 = get_contact_pair(self.cloth_params, cloth0.x, x0v, pen0)
            pen_state = PenetrationState(contact_id=cid0, penetration=pen0)
            return (mpm0, cloth0, pen_state)

        if self.rigid_vel_model is not None:
            bodies0 = self.rigid_vel_model.init_bodies()
            rigid0 = RigidState(q=jnp.zeros((0,), self.dtype),
                                qd=jnp.zeros((0,), self.dtype))
        elif self.rigid_model is not None:
            rigid0 = self.rigid_model.init_state()
            bodies0 = self.rigid_model.body_states(rigid0)
        else:
            bodies0 = BodyState.identity(0, self.dtype)
            rigid0 = RigidState(q=jnp.zeros((0,), self.dtype),
                                qd=jnp.zeros((0,), self.dtype))
        return (mpm0, bodies0, rigid0)

    def reset(self):
        self._carry = self._initial_carry()
        self.cur = 0
        self.action_list = []
        self._history = [self._snapshot()]

    def _snapshot(self):
        """(x (N,3), bodies | None, cloth_x | None, cloth_v | None)."""
        if self.has_cloth:
            mpm, cloth, _ = self._carry
            return (np.asarray(mpm.x).T, None,
                    np.asarray(cloth.x), np.asarray(cloth.v))
        mpm, bodies, _ = self._carry
        return (np.asarray(mpm.x).T, jax.tree.map(np.asarray, bodies), None, None)

    # ==================================================================
    # one env step (used by both the facade and the rollout)
    # ==================================================================
    def _cloth_params_arg(self):
        """cloth_params as a traced-argument value (None for rigid envs —
        a static pytree-empty placeholder under jit)."""
        return self.cloth_params if self.has_cloth else None

    def use_sorted_carry(self) -> bool:
        """Whether rollouts ride the sorted-carry path (TPU chunked
        kernels). Both families: cloth carries permute the per-particle
        penetration side-state (contact_id/penetration — one gather each)
        together with MPMState (_resort/_sort_out in _build_rollout).
        Single source of truth for this predicate (also used by
        parallel/sharding.py)."""
        return mpm_mod.sorted_transfers_wanted(self.mpm_cfg, self.dtype)

    @staticmethod
    def _permute_pen(pen, q):
        """Apply a particle permutation to the penetration side-state."""
        return pen.replace(contact_id=pen.contact_id[q],
                           penetration=pen.penetration[q])

    def _substep_loss_terms(self, mpm_s, weight, bodies=None, cloth=None,
                            unsort_perm=None):
        """Weighted loss terms at a MID-WINDOW substep state (the general
        loss-stride path: the reference samples loss at ANY frame f via its
        store-all tape, ``demo_pour.py:172-173``). Bodies/cloth hold the
        window's forecast state, matching the reference's per-frame
        primitive buffers."""
        x_nd = mpm_s.x_nd
        if unsort_perm is not None:
            # losses may index particles (TransportLoss halves): restore
            # original row order, same idiom as the block-boundary sample
            x_nd = jnp.zeros_like(x_nd).at[unsort_perm].set(x_nd)
        if cloth is not None:
            sample = FrameSample(x=x_nd, bodies=None,
                                 cloth_x=cloth[0], cloth_v=cloth[1])
        else:
            sample = FrameSample(x=x_nd, bodies=bodies)
        return {k: weight * v for k, v in self.loss.terms(sample).items()}

    def _env_step_fn(self, carry, action, params=None, assume_sorted=False,
                     prims=None, cloth_params=None, loss_weights=None,
                     unsort_perm=None):
        """(carry, action) -> (carry, (overflow, ext_f[, loss_terms])).

        ``params``/``prims``/``cloth_params`` default to the env's own
        (concrete) arrays; jitted callers pass them as TRACED arguments
        instead so the SDF tables (tens of MB per primitive) and the cloth
        adjacency tables are not baked into every compiled program as
        constants (compile-time, executable-size, and persistent-cache
        bloat).

        ``loss_weights`` ((substeps,), optional) engages the general
        loss-stride path: each substep k contributes weight[k] * loss
        terms evaluated at its post-substep state, returned as an extra
        aux dict (summed over the window)."""
        params = self.mpm_params if params is None else params
        prims = self.prims if prims is None else prims
        if self.has_cloth:
            return self._env_step_cloth(carry, action, params=params,
                                        cloth_params=cloth_params,
                                        loss_weights=loss_weights,
                                        assume_sorted=assume_sorted,
                                        unsort_perm=unsort_perm)
        mpm, bodies, rigid = carry
        cfg = self.mpm_cfg

        mpm_action = None
        if self.control_mode == "mpm" and self.action_dim > 0:
            mpm_action = action.reshape(cfg.n_controllers, 3).astype(self.dtype)

        bodies_c = grad_scale(bodies, self.ext_grad_scale) \
            if (self.rigid_model is not None) else bodies

        # params/assume_sorted come from the rollout's sorted-carry path
        # (_build_rollout): particle arrays are then pre-sorted by y-cell and
        # the chunked Pallas kernels engage. Standalone callers (step(),
        # sharding, policy) use the default original-order path.
        def sub(c, kw):
            k = kw if loss_weights is None else kw[0]
            mpm_s, bod = c
            mpm_s, extf, aux = mpm_mod.substep(
                cfg, params, prims, mpm_s, bod, k, mpm_action,
                axis_name=self.particle_axis_name,
                assume_sorted=assume_sorted)
            if self.rigid_vel_model is not None:
                bod = RigidVelocityModel.forward_kinematics(bod, cfg.dt)
            outs = (extf, aux["window_overflow"])
            if loss_weights is not None:
                outs = outs + (self._substep_loss_terms(
                    mpm_s, kw[1], bodies=bod, unsort_perm=unsort_perm),)
            return (mpm_s, bod), outs

        xs = jnp.arange(cfg.substeps) if loss_weights is None else (
            jnp.arange(cfg.substeps), loss_weights)
        (mpm, bodies_c), subouts = jax.lax.scan(sub, (mpm, bodies_c), xs)
        extf, ovf = subouts[0], subouts[1]
        ext_f = jnp.sum(extf, axis=0) / cfg.substeps  # window-averaged wrench
        overflow = jnp.any(ovf)

        if self.rigid_vel_model is not None:
            bodies = self.rigid_vel_model.apply_action(
                bodies_c, action.astype(self.dtype))
        elif self.rigid_model is not None:
            rigid_action = action if self.control_mode == "rigid" else None
            rigid = self.rigid_model.step(rigid, rigid_action, ext_f,
                                          prims=prims)
            bodies = self.rigid_model.body_states(rigid)
        else:
            bodies = bodies_c

        if loss_weights is not None:
            terms = jax.tree.map(lambda t: jnp.sum(t, axis=0), subouts[2])
            return (mpm, bodies, rigid), (overflow, ext_f, terms)
        return (mpm, bodies, rigid), (overflow, ext_f)

    def _env_step_cloth(self, carry, action, params=None, cloth_params=None,
                        loss_weights=None, assume_sorted=False,
                        unsort_perm=None):
        """One coupled MPM+cloth window (soft_cloth taichi_env.py:74-96):
        N substeps with contact-pair/penetration updates against the forecast
        cloth state, then one cloth PD step consuming the averaged vertex
        forces, then contact re-resolution against the moved cloth.

        ``params`` (the per-particle MPMParams — MUST be the shard-local
        arrays under particle-sharded execution, parallel/sharding.py) and
        ``cloth_params`` (faces + MB-scale adjacency tables) ride as traced
        arguments for jitted callers."""
        from softmac_tpu.engine.cloth_contact import (
            get_contact_pair, trace_penetration_after_cloth,
            trace_penetration_after_mpm)

        mpm, cloth, pen = carry
        cfg = self.mpm_cfg
        params = self.mpm_params if params is None else params
        cparams = self.cloth_params if cloth_params is None else cloth_params

        mpm_action = None
        cloth_action = None
        if self.control_mode == "mpm" and self.action_dim > 0:
            mpm_action = action.reshape(cfg.n_controllers, 3).astype(self.dtype)
        elif self.control_mode == "cloth":
            cloth_action = action

        cloth_c = grad_scale(cloth, self.ext_grad_scale)
        cloth_xf, cloth_vf = cloth_c.x, cloth_c.v  # forecast for the window

        def sub(c, kw):
            k = kw if loss_weights is None else kw[0]
            mpm_s, pen_s = c
            x_prev = (mpm_s.x[0], mpm_s.x[1], mpm_s.x[2])
            mpm_s, extv, aux = mpm_mod.substep_cloth(
                cfg, params, cparams, mpm_s,
                cloth_xf, cloth_vf, pen_s, k, mpm_action,
                axis_name=self.particle_axis_name,
                assume_sorted=assume_sorted)
            x_new = (mpm_s.x[0], mpm_s.x[1], mpm_s.x[2])
            cid = get_contact_pair(cparams, cloth_xf, x_new,
                                   pen_s.penetration)
            pen_s = trace_penetration_after_mpm(
                cparams, cloth_xf, x_new, x_prev, pen_s, cid)
            pen_s = jax.lax.stop_gradient(pen_s)
            outs = (extv, aux["window_overflow"])
            if loss_weights is not None:
                outs = outs + (self._substep_loss_terms(
                    mpm_s, kw[1], cloth=(cloth_xf, cloth_vf),
                    unsort_perm=unsort_perm),)
            return (mpm_s, pen_s), outs

        xs = jnp.arange(cfg.substeps) if loss_weights is None else (
            jnp.arange(cfg.substeps), loss_weights)
        (mpm, pen), subouts = jax.lax.scan(sub, (mpm, pen), xs)
        extv, ovf = subouts[0], subouts[1]
        ext_vertex_f = jnp.sum(extv, axis=0) / cfg.substeps
        overflow = jnp.any(ovf)

        cloth = self.cloth_model.step(cloth, cloth_action, ext_vertex_f)

        # re-resolve contact pairs against the moved cloth (taichi_env:88-90)
        x_now = (mpm.x[0], mpm.x[1], mpm.x[2])
        cid2 = get_contact_pair(cparams, cloth.x, x_now,
                                pen.penetration)
        pen = trace_penetration_after_cloth(
            cparams, cloth.x, cloth_xf, x_now, pen, cid2)
        pen = jax.lax.stop_gradient(pen)

        if loss_weights is not None:
            terms = jax.tree.map(lambda t: jnp.sum(t, axis=0), subouts[2])
            return (mpm, cloth, pen), (overflow, ext_vertex_f, terms)
        return (mpm, cloth, pen), (overflow, ext_vertex_f)

    # ==================================================================
    # imperative facade (reference API parity)
    # ==================================================================
    def set_control_mode(self, mode):
        """Switch between 'mpm' / 'cloth' / 'rigid' control (the reference's
        soft_cloth taichi_env.py:133-135)."""
        assert mode in ("mpm", "rigid", "cloth")
        self.control_mode = mode
        if mode == "mpm":
            self.action_dim = self.mpm_cfg.n_controllers * 3
        elif mode == "cloth":
            self.action_dim = 3 * len(self.cloth_model.attachment_idx)
        self._jit_cache.clear()
        self._step_jit = self._make_step_jit()

    def set_primitives_contact(self, flags):
        """Enable/disable contact per primitive (the reference's
        ``simulator.primitives_contact``, used by demo_grip.py:117)."""
        import dataclasses
        self.mpm_cfg = dataclasses.replace(
            self.mpm_cfg, primitives_contact=tuple(bool(f) for f in flags))
        self._jit_cache.clear()
        self._step_jit = self._make_step_jit()

    def step(self, action=None):
        if action is None:
            action = np.zeros((max(self.action_dim, 1),))
        action = jnp.asarray(np.asarray(action, np.float64), self.dtype)
        self.action_list.append(np.asarray(action))
        self._carry, (_, ext_f) = self._step_jit(
            self._carry, action, self.prims, self.mpm_params,
            self._cloth_params_arg())
        self.last_ext_f = ext_f
        self.cur += self.substeps
        if self.keep_history:
            self._history.append(self._snapshot())
        else:
            self._history = [self._snapshot()]

    def get_x(self, f=None):
        if f is None:
            f = self.cur
        return self._history[min(f // self.substeps, len(self._history) - 1)][0]

    def get_state_frame(self, f):
        """(x, bodies, cloth_x, cloth_v) snapshot at frame f (window
        boundaries only)."""
        return self._history[min(f // self.substeps, len(self._history) - 1)]

    def compute_loss(self, f=None):
        assert self.loss is not None
        if f is None:
            f = 0 if self._is_copy else self.cur
        x, bodies, cx, cv = self.get_state_frame(f)
        sample = FrameSample(
            x=jnp.asarray(x, self.dtype), bodies=bodies,
            cloth_x=None if cx is None else jnp.asarray(cx, self.dtype),
            cloth_v=None if cv is None else jnp.asarray(cv, self.dtype))
        terms = {k: float(v) for k, v in self.loss.terms(sample).items()}
        terms["loss"] = sum(terms.values())
        return terms

    def get_observation(self, f=None):
        """Flat observation vector: subsampled particle x/v (+ cloth or body
        state), parity with soft_cloth taichi_env.get_observation (:148-156)."""
        from softmac_tpu.engine import policy as policy_mod
        if self.has_cloth:
            mpm, cloth, _ = self._carry
            return np.concatenate([
                np.asarray(policy_mod.mpm_observation(
                    mpm, self.cfg.get("n_observed_particles", 200))),
                np.asarray(policy_mod.cloth_observation(cloth))])
        mpm, bodies, _ = self._carry
        parts = [np.asarray(policy_mod.mpm_observation(
            mpm, self.cfg.get("n_observed_particles", 200)))]
        if bodies.pos.shape[0] > 0:
            parts.append(np.asarray(policy_mod.body_observation(bodies)))
        return np.concatenate(parts)

    def get_state(self, f=None):
        """Packed particle state — the reference's checkpoint layout:
        (N, 24) ``[x v F C]`` (softmac mpm_simulator.py:481-492); cloth envs
        append contact_id and penetration columns for (N, 26)
        (soft_cloth mpm_simulator.py:604-615)."""
        from softmac_tpu.engine.types import mpm_state_to_packed
        packed = np.asarray(mpm_state_to_packed(self._carry[0]))
        if self.has_cloth:
            pen = self._carry[2]
            packed = np.hstack([
                packed,
                np.asarray(pen.contact_id, np.float64)[:, None],
                np.asarray(pen.penetration, np.float64)[:, None]])
        return packed

    def set_state(self, packed):
        """Load a packed (N, 24) or (N, 26) particle state into the carry
        (the reference's setframe restores only [x v F C],
        soft_cloth mpm_simulator.py:617-618; the extra cloth columns, when
        present, also restore the contact/penetration side-state)."""
        packed = np.asarray(packed)
        from softmac_tpu.engine.types import mpm_state_from_packed
        mpm = mpm_state_from_packed(self.mpm_cfg, jnp.asarray(packed[:, :24]))
        rest = tuple(self._carry[1:])
        if self.has_cloth and packed.shape[1] >= 26:
            pen = self._carry[2].replace(
                contact_id=jnp.asarray(packed[:, 24], jnp.int32),
                penetration=jnp.asarray(packed[:, 25], jnp.int8))
            rest = (rest[0], pen) + rest[2:]
        self._carry = (mpm,) + rest
        self._history = [self._snapshot()]

    def check_penetration(self) -> int:
        """Number of particles currently flagged as penetrating the cloth
        (soft_cloth mpm_simulator.py:555-561)."""
        if not self.has_cloth:
            return 0
        return int(np.asarray(self._carry[2].penetration).astype(np.int32).sum())

    def backward(self, loss_start_frame=None, loss_stride=20):
        """Gradient of the sampled-frame loss w.r.t. the recorded actions.

        Re-runs the rollout under jax.grad (recompute-from-checkpoint, the
        same policy as the reference's substep_grad replay)."""
        actions = jnp.asarray(np.stack(self.action_list), self.dtype)
        out = self.rollout_and_grad(actions, loss_start_frame=loss_start_frame,
                                    loss_stride=loss_stride)
        return np.asarray(out["action_grad"])

    def adjust_action_with_ext_force(self, actions):
        """Compensate an action trajectory for gravity + measured contact
        wrench so the free bodies hold their intended motion (reference
        ``softmac/utils.py:76-119``). Force-control free joints only."""
        assert self.control_mode == "rigid" and self.rigid_model is not None
        model = self.rigid_model
        g = jnp.asarray(model.gravity, self.dtype)
        cfg = self.mpm_cfg

        def env_step(prims, params, carry, action):
            mpm, bodies, rigid = carry
            bodies_c = grad_scale(bodies, self.ext_grad_scale)

            def sub(c, k):
                mpm_s, extf, aux = mpm_mod.substep(
                    cfg, params, prims, c, bodies_c, k, None)
                return mpm_s, extf

            mpm, extf = jax.lax.scan(sub, mpm, jnp.arange(cfg.substeps))
            ext_f = jnp.sum(extf, axis=0) / cfg.substeps

            # compensation view: weld-primitive wrenches folded onto their
            # carriers so the compensation sees the full wrench the composite
            # body feels. A SEPARATE array from ext_f — model.step performs
            # its own weld fold, so passing the folded array would double-
            # count the weld wrenches.
            ext_c = ext_f
            bs = None
            for i, b in enumerate(model.bodies):
                if b.jtype != "weld" or not b.gravity_on:
                    continue
                if bs is None:
                    bs = model.body_states(rigid)
                p = b.weld_parent
                f, t = ext_c[i, :3], ext_c[i, 3:]
                r = bs.pos[i] - bs.pos[p]
                ext_c = (ext_c.at[p, :3].add(f)
                         .at[p, 3:].add(t + jnp.cross(r, f))
                         .at[i].set(0.0))

            def _free_compensate(adj, o, i, mass):
                adj = adj.at[o:o + 3].add(-ext_c[i, 3:])
                return adj.at[o + 3:o + 6].add(-(ext_c[i, :3] + mass * g))

            adj = action.astype(self.dtype)
            for i, b in enumerate(model.bodies):
                if not b.gravity_on:
                    continue
                mass = model.compensation_mass(i)
                if mass is not None:
                    adj = _free_compensate(adj, b.q_offset, i, mass)
            rigid = model.step(rigid, adj, ext_f, prims=prims)
            bodies = model.body_states(rigid)
            return (mpm, bodies, rigid), adj

        fn = jax.jit(lambda c0, a, prims, params: jax.lax.scan(
            functools.partial(env_step, prims, params), c0, a)[1])
        adjusted = fn(self._initial_carry(), jnp.asarray(actions, self.dtype),
                      self.prims, self.mpm_params)
        return np.asarray(adjusted)

    # ==================================================================
    # functional rollout (the fast path used by demos / bench)
    # ==================================================================
    def _sample_mask(self, n_steps, loss_start_frame, loss_stride):
        """Loss-frame sampling replicating ``range(start, T+1, stride)``
        over substep-indexed frames (reference ``demo_pour.py:172-173``).

        Fast path (all demo configs): every sampled frame >= 1 lands on a
        loss-block boundary -> per-block 0/1 mask, loss evaluated only at
        block-boundary samples (sub_weights None). General path (ANY
        start/stride — e.g. stride 7 on a 5-substep env): block degenerates
        to 1 and sub_weights (n_steps, substeps) selects the sampled
        substeps; the loss is then accumulated INSIDE the substep scan
        (_substep_loss_terms), replicating the reference's ability to
        sample its store-all tape at any frame."""
        start = 0 if loss_start_frame is None else int(loss_start_frame)
        total = n_steps * self.substeps
        wanted = set(range(start, total + 1, int(loss_stride)))
        include_f0 = 0 in wanted
        block = max(int(loss_stride) // self.substeps, 1)
        if n_steps % block == 0:
            n_blocks = n_steps // block
            frames = np.arange(1, n_blocks + 1) * block * self.substeps
            mask = np.isin(frames, sorted(wanted))
            if set(frames[mask].tolist()) == (wanted - {0}):
                return (block, n_blocks, mask.astype(np.float64),
                        include_f0, None)
        # general path: block = 1. Frames landing on a WINDOW boundary are
        # sampled at the post-step block sample (post-rigid/cloth-step
        # bodies — what the reference's per-frame primitive buffers hold
        # there); true mid-window frames are weighted inside the substep
        # scan against the window's forecast body state.
        w = np.zeros((n_steps, self.substeps))
        bmask = np.zeros((n_steps,))
        for f in sorted(wanted - {0}):
            t, k = divmod(f - 1, self.substeps)
            if k == self.substeps - 1:
                bmask[t] = 1.0
            else:
                w[t, k] = 1.0
        return 1, n_steps, bmask, include_f0, w

    def _build_rollout(self, n_steps, loss_start_frame, loss_stride, with_grad,
                       bptt_window=None, grad_clip=None, batched=False,
                       remat="step"):
        block, n_blocks, mask_np, include_f0, sub_w = self._sample_mask(
            n_steps, loss_start_frame, loss_stride)
        assert n_blocks * block == n_steps
        mask = jnp.asarray(mask_np, self.dtype)
        # general (per-substep) loss sampling path: see _sample_mask
        use_general = sub_w is not None and self.loss is not None
        w_all = (jnp.asarray(sub_w, self.dtype) if use_general else None)

        # Sorted-carry (TPU chunked-kernel path): the rigid-path carry is
        # extended to (core, params_sorted, perm) where perm maps current
        # position -> original particle index. Sorted once at rollout entry,
        # re-keyed at every block boundary (drift between re-sorts is covered
        # by the chunked kernels' 16-row tile slack + overflow flag), and
        # unsorted once at rollout exit. Permuting per env step instead costs
        # ~45 ms/step at 1e5 particles (see mpm.sorted_transfers_wanted).
        use_sort = self.use_sorted_carry()

        # prims/params enter as traced arguments of the jitted rollout (not
        # closure constants — see _env_step_fn); the scan bodies bind them
        # via functools.partial so lax.scan hoists them as loop invariants.
        # remat policy. "step" (default): jax.checkpoint every env step —
        # O(1)-in-T residual memory, backward replays each step's forward
        # (required at the demos' 2000-3000-step horizons). "none": store
        # each step's custom_vjp residuals in the scan tape instead — the
        # reference's own store-all design (mpm_simulator.py caches every
        # substep state) — skipping the replay for a faster backward when
        # T x N residuals fit HBM (e.g. the 50-step bench at 1e5 particles).
        # "window:K": the middle point — checkpoint every K env steps and
        # store-all within a window, so the tape is O(T/K) checkpoints +
        # O(K) residuals and the backward replays each step once at most.
        window_k = None
        if isinstance(remat, str) and remat.startswith("window:"):
            window_k = int(remat.split(":", 1)[1])
            if window_k < 1:
                raise ValueError(f"remat window must be >= 1, got {remat!r}")
        elif remat not in ("step", "none"):
            raise ValueError(
                f"remat must be 'step', 'none' or 'window:K', got {remat!r}")
        wrap = jax.checkpoint if remat == "step" else (lambda f: f)
        if use_sort:
            def env_step_s(prims, params, cparams, c, a):
                core, params_s, perm = c
                kw = ({"loss_weights": a[1], "unsort_perm": perm}
                      if use_general else {})
                core, out = self._env_step_fn(
                    core, a[0] if use_general else a, params=params_s,
                    assume_sorted=True, prims=prims, cloth_params=cparams,
                    **kw)
                return (core, params_s, perm), out
            env_step = wrap(env_step_s)
        else:
            def env_step_d(prims, params, cparams, c, a):
                kw = {"loss_weights": a[1]} if use_general else {}
                return self._env_step_fn(
                    c, a[0] if use_general else a, params=params,
                    prims=prims, cloth_params=cparams, **kw)
            env_step = wrap(env_step_d)

        def _resort(carry):
            core, params_s, perm = carry
            mpm = core[0]
            q, _ = mpm_mod.sort_perm(
                self.mpm_cfg, (mpm.x[0], mpm.x[1], mpm.x[2]))
            mpm_q = mpm_mod.permute_state(mpm, q)
            if self.has_cloth:
                # cloth core = (mpm, cloth, pen): the per-particle
                # penetration side-state rides the same permutation;
                # cloth vertex state is particle-order-independent
                _, cloth, pen = core
                core_q = (mpm_q, cloth, self._permute_pen(pen, q))
            else:
                core_q = (mpm_q,) + tuple(core[1:])
            return (core_q, mpm_mod.permute_params(params_s, q), perm[q])

        # "window:K" scanning: group the block's steps into windows of k
        # (largest divisor of the loss block <= K so shapes stay static),
        # checkpoint each window, and let the inner scan store its steps'
        # residuals. The checkpointed callable binds prims/params/cparams
        # as ordinary traced arguments so they are saved once, not
        # recomputed per window.
        if window_k is not None:
            k = min(window_k, block)
            while block % k != 0:
                k -= 1

            def window_fn(prims, params, cparams, c, a_win):
                return jax.lax.scan(
                    functools.partial(env_step, prims, params, cparams),
                    c, a_win)
            window_ck = jax.checkpoint(window_fn)

            def scan_steps(prims, params, cparams, carry, action_block):
                xs = jax.tree.map(
                    lambda s: s.reshape((block // k, k) + s.shape[1:]),
                    action_block)
                carry, outs = jax.lax.scan(
                    functools.partial(window_ck, prims, params, cparams),
                    carry, xs)
                return carry, jax.tree.map(
                    lambda s: s.reshape((block,) + s.shape[2:]), outs)
        else:
            def scan_steps(prims, params, cparams, carry, action_block):
                return jax.lax.scan(
                    functools.partial(env_step, prims, params, cparams),
                    carry, action_block)

        def block_fn(prims, params, cparams, carry, action_block):
            if grad_clip is not None:
                if use_sort:
                    core, params_s, perm = carry
                    carry = (clip_cotangent(core, float(grad_clip)),
                             params_s, perm)
                else:
                    carry = clip_cotangent(carry, float(grad_clip))
            if use_sort:
                carry = _resort(carry)
            carry, outs = scan_steps(prims, params, cparams, carry,
                                     action_block)
            ovf = outs[0]
            terms_blk = None
            if use_general:
                terms_blk = jax.tree.map(lambda t: jnp.sum(t, axis=0),
                                         outs[2])
            n_pen = jnp.zeros((), jnp.int32)
            if self.has_cloth:
                mpm, cloth, pen = carry[0] if use_sort else carry
                x_nd = mpm.x_nd
                if use_sort:
                    # restore original particle row order for the sample
                    # (losses may index particles), same idiom as below
                    x_nd = jnp.zeros_like(x_nd).at[carry[2]].set(x_nd)
                sample = FrameSample(x=x_nd, bodies=None,
                                     cloth_x=cloth.x, cloth_v=cloth.v)
                # reference check_penetration parity (soft_cloth
                # mpm_simulator.py:556-561), surfaced per sample block
                n_pen = jnp.sum((pen.penetration != 0).astype(jnp.int32))
            elif use_sort:
                (mpm, bodies, _), _, perm = carry
                # losses may index particles (TransportLoss halves): restore
                # the original row order (row scatter on the major axis)
                x_nd = mpm.x_nd
                x_nd = jnp.zeros_like(x_nd).at[perm].set(x_nd)
                sample = FrameSample(x=x_nd, bodies=bodies)
            else:
                mpm, bodies, _ = carry
                sample = FrameSample(x=mpm.x_nd, bodies=bodies)
            if use_general:
                return carry, (sample, jnp.any(ovf), n_pen, terms_blk)
            return carry, (sample, jnp.any(ovf), n_pen)

        def _sort_in(carry0, params):
            """Original-order carry -> extended carry (identity perm; the
            first block_fn's _resort establishes the sorted order)."""
            n = carry0[0].x.shape[-1]
            return (carry0, params, jnp.arange(n, dtype=jnp.int32))

        def _sort_out(carry):
            """Extended sorted carry -> original-order carry (rollout exit)."""
            core, _, perm = carry
            inv = jnp.zeros_like(perm).at[perm].set(
                jnp.arange(perm.shape[0], dtype=perm.dtype))
            mpm_f = mpm_mod.permute_state(core[0], inv)
            if self.has_cloth:
                _, cloth_f, pen_f = core
                return (mpm_f, cloth_f, self._permute_pen(pen_f, inv))
            return (mpm_f,) + tuple(core[1:])

        # truncated BPTT for long chaotic horizons: gradients flow at most
        # ~bptt_window env steps back through the carry (segment boundaries
        # stop_gradient it). The reference needs f64 + hand damping
        # (ext_grad_scale = 1/40) for the same reason (SURVEY hard part #3).
        seg_blocks = n_blocks
        if bptt_window is not None:
            seg_blocks = max(int(bptt_window) // block, 1)
            while n_blocks % seg_blocks != 0:
                seg_blocks -= 1
        n_segments = n_blocks // seg_blocks

        def segment_fn(prims, params, cparams, carry, action_seg):
            carry, ys = jax.lax.scan(
                functools.partial(block_fn, prims, params, cparams),
                carry, action_seg)
            return jax.lax.stop_gradient(carry), ys

        def _f0_sample(carry0):
            if self.has_cloth:
                mpm0, cloth0, _ = carry0
                return FrameSample(x=mpm0.x_nd, bodies=None,
                                   cloth_x=cloth0.x, cloth_v=cloth0.v)
            mpm0, bodies0, _ = carry0
            return FrameSample(x=mpm0.x_nd, bodies=bodies0)

        def _accumulate(carry0, samples, ovf, npen, terms_blocks):
            loss_total = jnp.zeros((), self.dtype)
            terms_acc = {"window_overflow": jnp.any(ovf)}
            if self.has_cloth:
                terms_acc["n_penetration"] = npen[-1]
            if self.loss is not None:
                if use_general:
                    # mid-window terms were weighted+summed inside the
                    # substep scans; boundary-frame terms ride the block
                    # mask like the fast path
                    per_block = jax.lax.map(self.loss.terms, samples)
                    for k, v in terms_blocks.items():
                        terms_acc[k] = jnp.sum(v) + jnp.sum(
                            per_block[k] * mask)
                        loss_total = loss_total + terms_acc[k]
                        terms_acc[f"final_{k}"] = per_block[k][-1]
                else:
                    per_block = jax.lax.map(self.loss.terms, samples)
                    for k, v in per_block.items():
                        terms_acc[k] = jnp.sum(v * mask)
                        loss_total = loss_total + terms_acc[k]
                        terms_acc[f"final_{k}"] = v[-1]
                if include_f0:
                    for k, v in self.loss.terms(_f0_sample(carry0)).items():
                        terms_acc[k] = terms_acc[k] + v
                        loss_total = loss_total + v
            return loss_total, terms_acc

        def rollout(actions, carry0, prims, params, cparams):
            bf = functools.partial(block_fn, prims, params, cparams)
            carry_run = _sort_in(carry0, params) if use_sort else carry0
            xs = actions.reshape(n_blocks, block, -1)
            if use_general:
                xs = (xs, w_all.reshape(n_blocks, block, self.substeps))
            if n_segments > 1:
                xs = jax.tree.map(
                    lambda s: s.reshape((n_segments, seg_blocks)
                                        + s.shape[1:]), xs)
                carry, ys = jax.lax.scan(
                    functools.partial(segment_fn, prims, params, cparams),
                    carry_run, xs)
                ys = jax.tree.map(
                    lambda s: s.reshape((n_blocks,) + s.shape[2:]), ys)
            else:
                carry, ys = jax.lax.scan(bf, carry_run, xs)
            if use_general:
                samples, ovf, npen, terms_blocks = ys
            else:
                (samples, ovf, npen), terms_blocks = ys, None
            loss_total, terms_acc = _accumulate(carry0, samples, ovf, npen,
                                                terms_blocks)
            if use_sort:
                carry = _sort_out(carry)
            return loss_total, (terms_acc, carry)

        if not with_grad:
            return jax.jit(jax.vmap(rollout, in_axes=(0, 0, None, None, None))
                           if batched else rollout)

        def rollout_grad(actions, carry0, prims, params, cparams):
            (loss, (terms, carry)), g = jax.value_and_grad(
                rollout, has_aux=True)(actions, carry0, prims, params,
                                       cparams)
            return {"loss": loss, "terms": terms, "carry": carry,
                    "action_grad": g}

        return jax.jit(jax.vmap(rollout_grad,
                                in_axes=(0, 0, None, None, None))
                       if batched else rollout_grad)

    def _get_rollout(self, n_steps, loss_start_frame, loss_stride, with_grad,
                     bptt_window=None, grad_clip=None, batched=False,
                     remat="step"):
        key = (n_steps, loss_start_frame, loss_stride, with_grad, bptt_window,
               grad_clip, batched, remat)
        if key not in self._jit_cache:
            self._jit_cache[key] = self._build_rollout(*key)
        return self._jit_cache[key]

    def _check_overflow(self, terms):
        """Fail loudly (once per env) when the active window missed a
        particle: its mass silently vanishes from the transfers, corrupting
        physics between epochs if unnoticed."""
        ovf = terms.get("window_overflow")
        if ovf is not None and not self._overflow_warned and bool(ovf):
            import warnings
            warnings.warn(
                "active-window overflow: some particle's B-spline stencil "
                "fell outside TPU.active_window this rollout — its mass is "
                "dropped from the grid transfers. Enlarge the window or "
                "expect corrupted physics. (Reported once per env.)",
                RuntimeWarning, stacklevel=3)
            self._overflow_warned = True

    @staticmethod
    def _maybe_profile():
        """Device-trace hook: set SOFTMAC_TPU_PROFILE_DIR to capture an XLA
        profiler trace (viewable in TensorBoard/xprof) around the next
        rollout calls. The reference's tracing is per-phase wall timers
        (EpochTimer reproduces those); this adds the device-level view."""
        import contextlib
        import os as _os
        d = _os.environ.get("SOFTMAC_TPU_PROFILE_DIR")
        if d:
            return jax.profiler.trace(d)
        return contextlib.nullcontext()

    def rollout(self, actions, loss_start_frame=None, loss_stride=20,
                bptt_window=None, grad_clip=None, remat="step"):
        actions = jnp.asarray(actions, self.dtype)
        fn = self._get_rollout(actions.shape[0], loss_start_frame, loss_stride,
                               False, bptt_window, grad_clip, remat=remat)
        ctx = self._maybe_profile()
        with ctx:
            loss, (terms, carry) = fn(actions, self._initial_carry(),
                                      self.prims, self.mpm_params,
                                      self._cloth_params_arg())
            if type(ctx).__name__ != "nullcontext":
                jax.block_until_ready(loss)  # trace must span the device work
        self._check_overflow(terms)
        return {"loss": loss, "terms": terms, "carry": carry}

    def rollout_and_grad(self, actions, loss_start_frame=None, loss_stride=20,
                         bptt_window=None, grad_clip=None, remat="step"):
        actions = jnp.asarray(actions, self.dtype)
        fn = self._get_rollout(actions.shape[0], loss_start_frame, loss_stride,
                               True, bptt_window, grad_clip, remat=remat)
        ctx = self._maybe_profile()
        with ctx:
            out = fn(actions, self._initial_carry(), self.prims,
                     self.mpm_params, self._cloth_params_arg())
            if type(ctx).__name__ != "nullcontext":
                jax.block_until_ready(out["loss"])
        self._check_overflow(out["terms"])
        return out

    # ------------------------------------------------------------------
    # batched multi-trajectory API (vmap over the functional rollout;
    # composes with the dp mesh axis in parallel/sharding.py)
    # ------------------------------------------------------------------
    def _batched_carry(self, actions, carry0):
        if carry0 is None:
            B = actions.shape[0]
            c = self._initial_carry()
            carry0 = jax.tree.map(
                lambda s: jnp.broadcast_to(s[None], (B,) + s.shape), c)
        return carry0

    def jittered_carry(self, n_replicas, sigma=3e-4, seed=0):
        """Batched initial carry whose particle positions are independently
        jittered per replica (replica 0 stays exact). Robustification
        harness for knife-edge chaotic scenes (door/taco, BASELINE.md):
        optimizing the MEAN loss over replicas via batched_rollout yields
        solutions that are not artifacts of one f32 reduction-order
        trajectory. Compose with batched_rollout(_and_grad) by tiling the
        action trajectory n_replicas ways."""
        c = self._initial_carry()
        B = int(n_replicas)
        carry = jax.tree.map(
            lambda s: jnp.broadcast_to(s[None], (B,) + s.shape), c)
        rng = np.random.RandomState(seed)
        noise = rng.randn(B, *c[0].x.shape) * float(sigma)
        noise[0] = 0.0
        mpm0 = carry[0].replace(x=carry[0].x + jnp.asarray(noise, self.dtype))
        return (mpm0,) + tuple(carry[1:])

    def batched_rollout(self, actions, carry0=None, loss_start_frame=None,
                        loss_stride=20, bptt_window=None, grad_clip=None,
                        remat="step"):
        """Roll out B independent trajectories in ONE jitted program.

        actions: (B, T, action_dim); carry0: optional batched carry pytree
        (leading B axis), default = the scene's initial state broadcast B
        ways. Returns {"loss": (B,), "terms": {... (B,)}, "carry": batched}.
        """
        actions = jnp.asarray(actions, self.dtype)
        fn = self._get_rollout(actions.shape[1], loss_start_frame, loss_stride,
                               False, bptt_window, grad_clip, batched=True,
                               remat=remat)
        loss, (terms, carry) = fn(actions, self._batched_carry(actions, carry0),
                                  self.prims, self.mpm_params,
                                  self._cloth_params_arg())
        return {"loss": loss, "terms": terms, "carry": carry}

    def batched_rollout_and_grad(self, actions, carry0=None,
                                 loss_start_frame=None, loss_stride=20,
                                 bptt_window=None, grad_clip=None,
                                 remat="step"):
        """Like batched_rollout, plus per-trajectory "action_grad" (B, T, A)."""
        actions = jnp.asarray(actions, self.dtype)
        fn = self._get_rollout(actions.shape[1], loss_start_frame, loss_stride,
                               True, bptt_window, grad_clip, batched=True,
                               remat=remat)
        return fn(actions, self._batched_carry(actions, carry0),
                  self.prims, self.mpm_params, self._cloth_params_arg())

    # ==================================================================
    # rendering
    # ==================================================================
    def set_render_target(self, points):
        """Show target geometry in renders (reference renderer set_target)."""
        from softmac_tpu.engine.renderer import PointRenderer
        if self._renderer is None:
            self._renderer = PointRenderer(self.cfg_full.RENDERER, self)
        self._renderer.set_target(points)

    def render(self, f=None):
        from softmac_tpu.engine.renderer import PointRenderer
        if self._renderer is None:
            self._renderer = PointRenderer(self.cfg_full.RENDERER, self)
        if f is None:
            f = self.cur
        x, bodies, cx, cv = self.get_state_frame(f)
        cloth = None
        if cx is not None:
            cloth = (cx, np.asarray(self.cloth_model.faces))
        return self._renderer.render(x, self.particle_colors, bodies, cloth=cloth)

    def initialize(self):
        self.reset()


TaichiEnv = SoftMacEnv
