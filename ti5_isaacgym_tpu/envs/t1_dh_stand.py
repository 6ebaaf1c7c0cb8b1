"""T1 "DH stand" task environment — TPU-native, fully jitted.

Behavioral re-implementation of the reference task (reference
``humanoid/envs/t1/t1_dh_stand_env.py`` on top of
``humanoid/envs/base/legged_robot.py``): omnidirectional walking + standing
with gait-phase reference motion, actuator/sensor lag, heavy domain
randomization, terrain & command curricula, and the 47-dim observation
stacked 66 deep / 73-dim privileged observation stacked 3 deep.

Design (SURVEY.md §7): one pure ``step`` over an :class:`EnvState` pytree —
the 10-substep physics decimation is a ``lax.scan``, resets are ``where``
masking, and every per-env random draw comes from one split PRNG key.  Call
order inside a step mirrors the reference exactly (``legged_robot.py:387-506``):

  substeps -> counters -> callback (phase/commands/events) -> termination ->
  rewards -> masked reset -> observations -> last_* rollover

so stale-by-one-step quantities (e.g. ``ref_dof_pos`` consumed by rewards,
reference ``t1_dh_stand_env.py:371`` vs ``:583``) stay stale by exactly one
step here too.
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..configs.t1_dh_stand import T1EnvCfg
from ..physics import dynamics as dyn
from ..physics import spatial as sp
from ..physics.contact import ContactOpts, HeightField, flat_terrain, sample_height_min3
from ..physics.engine import PhysicsState, SolverOpts, probe_contact_masses, substep
from ..physics.model import RobotModel, load_t1
from ..terrain.terrain import Terrain
from . import legged
from .types import EnvParams, EnvState


class StepCtx(NamedTuple):
    """Derived quantities shared by termination/rewards/observations."""

    base_lin_vel: jnp.ndarray      # [N,3] base frame
    base_ang_vel: jnp.ndarray      # [N,3] base frame
    base_euler: jnp.ndarray        # [N,3]
    projected_gravity: jnp.ndarray # [N,3]
    root_vel_world: jnp.ndarray    # [N,6] lin+ang world
    feet_pos: jnp.ndarray          # [N,2,3]
    feet_euler: jnp.ndarray        # [N,2,3]
    feet_angvel_xy: jnp.ndarray    # [N,2,2] (reference foot_slip reads
                                   # rigid_state[...,10:12] = ang vel xy)
    knee_xy: jnp.ndarray           # [N,2,2]
    contact: jnp.ndarray           # [N,2] bool, fz > 5 N
    stand_command: jnp.ndarray     # [N] bool


class T1DHStandEnv:
    """Vectorized T1 walking/standing task.

    All methods are pure (state in, state out) and jit-safe; the instance
    holds only trace-time constants.
    """

    def __init__(self, cfg: T1EnvCfg, model: Optional[RobotModel] = None,
                 terrain: Optional[Terrain] = None, seed: int = 0):
        # set by the parallel trainer when envs are sharded across a mesh
        self.axis_name = None
        self.cfg = cfg
        if model is not None:
            self.model = model
        else:
            # load the robot named by the config (asset pipeline:
            # tools/extract_model.py URDF -> resources/<model_spec>)
            import os as _os

            from ..physics.model import load as _load_model

            spec = getattr(cfg.asset, "model_spec", "t1_model.json")
            self.model = _load_model(_os.path.abspath(_os.path.join(
                _os.path.dirname(__file__), "..", "resources", spec)))
        # Pallas runs compiled on TPU; on the CPU backend (unit tests,
        # multi-chip dry runs) it must use interpret mode.  Decided at env
        # construction from the effective default device.
        _dev = jax.config.jax_default_device
        _plat = (_dev.platform if _dev is not None
                 else jax.local_devices()[0].platform)
        self._mega_interpret = (_plat == "cpu")
        self.num_envs = cfg.env.num_envs
        self.num_actions = cfg.env.num_actions
        self.dt = cfg.control.decimation * cfg.sim.dt          # policy dt
        self.max_episode_length_s = cfg.env.episode_length_s
        self.max_episode_length = int(np.ceil(self.max_episode_length_s / self.dt))

        # terrain
        if cfg.terrain.mesh_type in ("heightfield", "trimesh"):
            self.terrain = terrain if terrain is not None else Terrain(cfg.terrain, seed=seed)
            self.heightfield = self.terrain.heightfield()
            self.terrain_origins = self.terrain.origins_device()
            self.custom_origins = True
            # supercell patch table for the frozen-cell contact gather: one
            # fragment per env instead of one per contact point (contact.
            # SuperTable).  Margin = max kinematic reach of any collision
            # point from the base, so every point always hits its patch.
            from ..physics.contact import build_supertable
            self.supertable = build_supertable(
                np.asarray(self.heightfield.height),
                self.heightfield.hscale, self.heightfield.offset,
                supercell=16, margin_m=self._max_cp_reach() + 0.1)
        else:
            self.terrain = None
            self.heightfield = flat_terrain()
            self.terrain_origins = None
            self.custom_origins = False
            self.supertable = None

        # statics
        self.default_dof_pos = jnp.asarray(cfg.init_state.default_joint_angles, jnp.float32)
        self.p_gains_nom = jnp.asarray(cfg.control.stiffness, jnp.float32)
        self.d_gains_nom = jnp.asarray(cfg.control.damping, jnp.float32)
        self.torque_limits = self.model.dof_effort * cfg.safety.torque_limit
        self.dof_vel_limits = self.model.dof_velocity * cfg.safety.vel_limit
        self.commands_scale = jnp.asarray(
            [cfg.normalization.obs_scales.lin_vel,
             cfg.normalization.obs_scales.lin_vel,
             cfg.normalization.obs_scales.ang_vel], jnp.float32)
        self.copts = ContactOpts(
            kp=cfg.sim.contact_kp, kd=cfg.sim.contact_kd,
            kt=cfg.sim.contact_kt, kdt=cfg.sim.contact_kdt,
            max_depth=cfg.sim.max_depenetration_depth, dt=cfg.sim.dt)
        self.sopts = SolverOpts(dt=cfg.sim.dt, gravity=cfg.sim.gravity,
                                limit_kp=cfg.sim.joint_limit_kp,
                                limit_kd=cfg.sim.joint_limit_kd)
        # contact-point apparent masses probed at the nominal standing pose
        nominal = dyn.nominal_params(self.model).replace(
            armature=jnp.asarray([(a + b) / 2 for a, b in cfg.domain_rand.joint_armature_ranges],
                                 jnp.float32))
        # host-numpy probe state: multi-process-safe closure constants (a
        # jnp.zeros output is a global array under multi-process SPMD)
        probe_state = PhysicsState(
            base_pos=np.asarray([0.0, 0.0, 0.95], np.float32),
            base_quat=np.asarray([1.0, 0, 0, 0], np.float32),
            base_vel=np.zeros(6, np.float32),
            qpos=np.asarray(self.default_dof_pos),
            qvel=np.zeros(self.num_actions, np.float32),
            cp_anchor=np.zeros((self.model.cp_pos.shape[0], 3), np.float32))
        # host copy: under multi-process SPMD a jit output is a GLOBAL array
        # spanning non-addressable devices, which cannot be closed over by
        # the later step traces; as host numpy it embeds as a plain constant
        cp_meff = np.asarray(
            probe_contact_masses(self.model, nominal, probe_state))
        # The implicit-rate contact solve treats each point against its OWN
        # apparent mass, but all points of one body push that body
        # simultaneously: a flat foot landing on P points feels P times the
        # per-point impulse, overshoots, and reverses the velocity — measured
        # as ~9 kN landing spikes and a persistent pogo bounce (z oscillating
        # 0.35-1.1 m under pure default-pose PD).  Dividing each point's
        # apparent mass by its body's point count makes the collective
        # implicit solve conservative: a flat landing is dead-beat (PhysX
        # TGS-like), a toe strike merely decelerates over a few substeps.
        # Accepted error bound: the divisor is the STATIC per-body point
        # count, so a 1-of-P contact (toe/heel strike) sees ~P x too little
        # apparent mass and is proportionally under-stiff — it decelerates
        # over ~P substeps (P=8 per foot -> <=8 ms at the 1 kHz substep rate,
        # under one 100 Hz policy step) instead of dead-beat, with
        # correspondingly deeper transient penetration (sub-mm at walking
        # impact speeds, bounded by the depenetration cap).  An active-count
        # divisor would need the contact mask inside the solve (a
        # stop_gradient dataflow cycle in the implicit step) for a transient
        # the policy cannot observe at 100 Hz; measured zero-action stands
        # and landings match the MuJoCo oracle within tolerance as is.
        counts = np.bincount(np.asarray(self.model.cp_body),
                             minlength=self.model.nb).astype(np.float32)
        self.cp_meff = cp_meff / counts[np.asarray(self.model.cp_body)][:, None]

        # reward bank: active terms in config order (scale != 0), x dt
        # (reference _prepare_reward_function, legged_robot.py:352-384)
        self.reward_names = tuple(n for n, s in cfg.rewards.scales if s != 0)
        self.reward_scales_dt = {n: s * self.dt for n, s in cfg.rewards.scales if s != 0}
        self.n_rewards = len(self.reward_names)

        # noise vector (reference t1_dh_stand_env.py:326-357)
        ns, os_ = cfg.noise.noise_scales, cfg.normalization.obs_scales
        nv = np.zeros(cfg.env.num_single_obs, np.float32)
        nc, na = cfg.env.num_commands, self.num_actions
        nv[nc:nc + na] = ns.dof_pos * os_.dof_pos
        nv[nc + na:nc + 2 * na] = ns.dof_vel * os_.dof_vel
        nv[nc + 3 * na:nc + 3 * na + 3] = ns.ang_vel * os_.ang_vel
        nv[nc + 3 * na + 3:nc + 3 * na + 6] = ns.quat * os_.quat
        self.noise_scale_vec = jnp.asarray(nv)

        # event scheduling constants
        self.push_interval = int(np.ceil(cfg.domain_rand.push_interval_s / self.dt))
        self.ext_force_interval = int(np.ceil(cfg.domain_rand.ext_force_interval_s / self.dt))

        # privileged frame width: +num_height_points with measure_heights
        self.priv_frame_dim = (cfg.env.single_num_privileged_obs
                               + (cfg.terrain.num_height_points
                                  if cfg.terrain.measure_heights else 0))
        # height-scan grid (reference _init_height_points, surface parity)
        gx, gy = np.meshgrid(np.asarray(cfg.terrain.measured_points_x),
                             np.asarray(cfg.terrain.measured_points_y), indexing="ij")
        self.height_points = jnp.asarray(
            np.stack([gx.ravel(), gy.ravel(), np.zeros_like(gx).ravel()], -1), jnp.float32)

    def _max_cp_reach(self) -> float:
        """Upper bound on |collision point - base| over all joint configs:
        per body, the sum of |joint offset| down the chain plus the point's
        local norm (rotation-invariant triangle bound)."""
        m = self.model
        parent = np.asarray(m.parent)
        jpos = np.asarray(m.joint_pos)
        depth = np.zeros(m.nb, np.float64)
        for i in range(1, m.nb):
            depth[i] = depth[parent[i]] + float(np.linalg.norm(jpos[i]))
        cp_body = np.asarray(m.cp_body)
        cp_norm = np.linalg.norm(np.asarray(m.cp_pos), axis=-1)
        return float(np.max(depth[cp_body] + cp_norm))

    # ------------------------------------------------------------------
    # initialization
    # ------------------------------------------------------------------

    def init_state(self, key: jnp.ndarray) -> EnvState:
        cfg, n, na = self.cfg, self.num_envs, self.num_actions
        nb, ncp = self.model.nb, self.model.cp_pos.shape[0]
        ks = jax.random.split(key, 8)

        dparams, friction, body_mass, restitution = legged.sample_rigid_body_params(
            cfg, self.model, ks[0], n)
        p, d, offs, coul, visc, arm = legged.sample_dof_params(
            cfg, ks[1], n, self.p_gains_nom, self.d_gains_nom)
        lag, dof_lag, imu_lag, dp_lag, dv_lag = legged.sample_lag_steps(cfg, ks[2], n)
        params = EnvParams(
            dynamics=dparams.replace(armature=arm), friction=friction,
            restitution=restitution, body_mass=body_mass,
            p_gains=p, d_gains=d, motor_offsets=offs, joint_coulomb=coul,
            joint_viscous=visc, lag_steps=lag, dof_lag_steps=dof_lag,
            imu_lag_steps=imu_lag, dof_pos_lag_steps=dp_lag, dof_vel_lag_steps=dv_lag)

        # terrain level/type assignment (reference _get_env_origins :1477-1494)
        if self.custom_origins:
            max_init = cfg.terrain.max_init_terrain_level if cfg.terrain.curriculum \
                else cfg.terrain.num_rows - 1
            level = jax.random.randint(ks[3], (n,), 0, max_init + 1)
            ttype = (jnp.arange(n) // max(n / cfg.terrain.num_cols, 1)).astype(jnp.int32)
            ttype = jnp.clip(ttype, 0, cfg.terrain.num_cols - 1)
            origin = self.terrain_origins[level, ttype]
        else:
            level = jnp.zeros((n,), jnp.int32)
            ttype = jnp.zeros((n,), jnp.int32)
            ncols = int(np.floor(np.sqrt(n)))
            xx, yy = jnp.meshgrid(jnp.arange((n + ncols - 1) // ncols), jnp.arange(ncols),
                                  indexing="ij")
            origin = jnp.stack([
                cfg.env.env_spacing * xx.ravel()[:n],
                cfg.env.env_spacing * yy.ravel()[:n],
                jnp.zeros(n)], -1).astype(jnp.float32)

        qpos = jnp.broadcast_to(self.default_dof_pos, (n, na))
        base_pos = jnp.asarray(cfg.init_state.pos) + origin
        phys = PhysicsState(
            base_pos=base_pos,
            base_quat=jnp.broadcast_to(jnp.asarray([1.0, 0, 0, 0]), (n, 4)),
            base_vel=jnp.zeros((n, 6)), qpos=qpos, qvel=jnp.zeros((n, na)),
            cp_anchor=jnp.zeros((n, ncp, 3)))

        L = cfg.domain_rand.lag_timesteps_range[1] + 1
        # the dof ring serves both the shared (add_dof_lag) and the split
        # pos/vel (add_dof_pos_vel_lag) sensor-lag modes — size it for the
        # largest enabled read index
        Ld = cfg.domain_rand.dof_lag_timesteps_range[1] + 1
        if cfg.domain_rand.add_dof_pos_vel_lag:
            Ld = max(Ld, cfg.domain_rand.dof_pos_lag_timesteps_range[1] + 1,
                     cfg.domain_rand.dof_vel_lag_timesteps_range[1] + 1)
        Li = cfg.domain_rand.imu_lag_timesteps_range[1] + 1
        state = EnvState(
            phys=phys, params=params, rng=ks[4],
            terrain_height=self.heightfield.height,
            episode_length=jnp.zeros((n,), jnp.int32),
            phase_length=jnp.zeros((n,), jnp.int32),
            gait_start=jax.random.randint(ks[5], (n,), 0, 2).astype(jnp.float32) * 0.5,
            gait_time=jnp.zeros((n, len(cfg.commands.gait)), jnp.int32),
            commands=jnp.zeros((n, 4)),
            common_step=jnp.zeros((), jnp.int32),
            terrain_level=level, terrain_type=ttype, env_origin=origin,
            cmd_vx_range=jnp.asarray(cfg.commands.ranges.lin_vel_x, jnp.float32),
            actions=jnp.zeros((n, na)), last_actions=jnp.zeros((n, na)),
            last_last_actions=jnp.zeros((n, na)), torques=jnp.zeros((n, na)),
            last_dof_vel=jnp.zeros((n, na)), last_root_vel=jnp.zeros((n, 6)),
            lag_buffer=jnp.zeros((n, na, L)),
            dof_lag_buffer=jnp.zeros((n, 2 * na, Ld)),
            imu_lag_buffer=jnp.zeros((n, 6, Li)),
            contact_forces=jnp.zeros((n, nb, 3)),
            feet_air_time=jnp.zeros((n, 2)),
            last_contacts=jnp.zeros((n, 2), bool),
            feet_height=jnp.zeros((n, 2)), last_feet_z=jnp.zeros((n, 2)),
            ref_dof_pos=jnp.broadcast_to(self.default_dof_pos, (n, na)),
            ref_action=jnp.zeros((n, na)),
            push_force=jnp.zeros((n, 3)), push_torque=jnp.zeros((n, 3)),
            ext_force=jnp.zeros((n, 3)), ext_torque=jnp.zeros((n, 3)),
            ext_force_apply=jnp.zeros((n, 3)), ext_torque_apply=jnp.zeros((n, 3)),
            is_first_push=jnp.asarray(True), is_first_add_force=jnp.asarray(True),
            obs_hist=jnp.zeros((n, cfg.env.frame_stack * cfg.env.num_single_obs),
                               jnp.bfloat16),
            critic_hist=jnp.zeros((n, cfg.env.c_frame_stack * self.priv_frame_dim),
                                  jnp.bfloat16),
            episode_sums=jnp.zeros((n, self.n_rewards)),
            reset_buf=jnp.zeros((n,), bool), time_out_buf=jnp.zeros((n,), bool),
        )
        # gait schedule + initial commands
        state = self._generate_gait_time(state, ks[6], jnp.ones((n,), bool))
        state = self._resample_gait_commands(state, ks[7])
        return state

    def reset(self, state: EnvState):
        """Reference contract: reset all envs, then one zero-action step
        produces the first observations (``legged_robot.py:450-455``)."""
        key, sub = jax.random.split(state.rng)
        state = state.replace(rng=key)
        state = self._reset_idx(state, jnp.ones((self.num_envs,), bool), sub, force_all=True)
        state, obs, priv, _, _, _ = self.step(state, jnp.zeros((self.num_envs, self.num_actions)))
        return state, obs, priv

    # ------------------------------------------------------------------
    # gait phase machinery (reference t1_dh_stand_env.py:80-124, 250-274)
    # ------------------------------------------------------------------

    def _stand_command(self, commands):
        return jnp.linalg.norm(commands[:, :3], axis=-1) <= self.cfg.commands.stand_com_threshold

    def _phase(self, state: EnvState, phase_length):
        cyc = self.cfg.rewards.cycle_time
        if self.cfg.commands.sw_switch:
            stand = self._stand_command(state.commands)
            phase = (jnp.mod(phase_length * self.dt / cyc, 1.0) + state.gait_start) * (~stand)
        else:
            phase = jnp.mod(state.episode_length * self.dt / cyc, 1.0) + state.gait_start
        return phase

    def _gait_stance_mask(self, phase):
        sin_pos = jnp.sin(2 * jnp.pi * phase)
        left = (sin_pos >= 0).astype(jnp.float32)
        stance = jnp.stack([left, 1.0 - left], -1)
        return jnp.where((jnp.abs(sin_pos) < 0.1)[:, None], 1.0, stance)

    def _compute_ref_state(self, state: EnvState, phase):
        scale_1 = self.cfg.rewards.target_joint_pos_scale
        scale_2 = 2 * scale_1
        sin_pos = jnp.sin(2 * jnp.pi * phase)
        sin_l = jnp.minimum(sin_pos, 0.0)   # left swings when sin < 0
        sin_r = jnp.maximum(sin_pos, 0.0)
        n = sin_pos.shape[0]
        ref = jnp.zeros((n, self.num_actions))
        ref = ref.at[:, 2].set(sin_l * scale_1)
        ref = ref.at[:, 3].set(-sin_l * scale_2)
        ref = ref.at[:, 4].set(sin_l * scale_1)
        ref = ref.at[:, 8].set(-sin_r * scale_1)
        ref = ref.at[:, 9].set(sin_r * scale_2)
        ref = ref.at[:, 10].set(-sin_r * scale_1)
        ref = jnp.where((jnp.abs(sin_pos) < 0.1)[:, None], 0.0, ref)
        ref_action = 2.0 * ref
        ref_dof_pos = ref + self.default_dof_pos
        return ref_dof_pos, ref_action

    def _generate_gait_time(self, state: EnvState, key, mask):
        """Random segmentation of the episode into gait phases
        (reference ``generate_gait_time``: durations scaled to the episode,
        shifted, cumsum -> boundary step indices)."""
        cfg = self.cfg.commands
        n = state.gait_time.shape[0]
        ngait = len(cfg.gait)
        ranges = jnp.asarray(cfg.gait_time_range, jnp.float32)   # (ngait, 2)
        r = jax.random.uniform(key, (n, ngait),
                               minval=ranges[:, 0], maxval=ranges[:, 1])
        scaled = r * (self.max_episode_length / jnp.sum(r, axis=1, keepdims=True))
        shifted = jnp.concatenate([jnp.zeros((n, 1)), scaled[:, :-1]], axis=1)
        gait_time = jnp.cumsum(shifted, axis=1).astype(jnp.int32)
        return state.replace(gait_time=jnp.where(mask[:, None], gait_time, state.gait_time))

    def _resample_gait_commands(self, state: EnvState, key) -> EnvState:
        """At each segment boundary (episode_length == gait_time[:, i]),
        resample per the segment's gait type (reference ``_resample_commands``
        + the per-gait ``_resample_*_command`` family)."""
        cfg = self.cfg.commands
        n = state.commands.shape[0]
        cmds = state.commands
        keys = jax.random.split(key, len(cfg.gait))
        for i, name in enumerate(cfg.gait):
            mask = state.episode_length == state.gait_time[:, i]
            k1, k2, k3, k4 = jax.random.split(keys[i], 4)
            if name == "stand":
                new = jnp.zeros((n, 3))
            elif name == "walk_sagittal":
                vx = jax.random.uniform(k1, (n,), minval=state.cmd_vx_range[0],
                                        maxval=state.cmd_vx_range[1])
                new = jnp.stack([vx, jnp.zeros(n), jnp.zeros(n)], -1)
            elif name == "walk_lateral":
                vy = jax.random.uniform(k2, (n,), minval=cfg.ranges.lin_vel_y[0],
                                        maxval=cfg.ranges.lin_vel_y[1])
                new = jnp.stack([jnp.zeros(n), vy, jnp.zeros(n)], -1)
            elif name == "rotate":
                wz = jax.random.uniform(k3, (n,), minval=cfg.ranges.ang_vel_yaw[0],
                                        maxval=cfg.ranges.ang_vel_yaw[1])
                new = jnp.stack([jnp.zeros(n), jnp.zeros(n), wz], -1)
            else:  # walk_omnidirectional
                vx = jax.random.uniform(k1, (n,), minval=state.cmd_vx_range[0],
                                        maxval=state.cmd_vx_range[1])
                vy = jax.random.uniform(k2, (n,),
                                        minval=cfg.ranges.lin_vel_y[0],
                                        maxval=cfg.ranges.lin_vel_y[1])
                wz = jax.random.uniform(k3, (n,),
                                        minval=cfg.ranges.ang_vel_yaw[0],
                                        maxval=cfg.ranges.ang_vel_yaw[1])
                new = jnp.stack([vx, vy, wz], -1)
            if cfg.heading_command and name != "stand":
                # heading mode (reference legged_robot.py:1009-1010): sample a
                # world-frame heading TARGET into commands[:, 3]; the yaw-rate
                # command is recomputed from the heading error every step in
                # _post_physics_step (:951-954), so the sampled wz is dropped.
                h = jax.random.uniform(k4, (n,), minval=cfg.ranges.heading[0],
                                       maxval=cfg.ranges.heading[1])
                new4 = jnp.concatenate(
                    [new[:, :2], jnp.zeros((n, 1)), h[:, None]], -1)
                cmds = jnp.where(mask[:, None], new4, cmds)
            else:
                cmds = jnp.where(mask[:, None], cmds.at[:, :3].set(new), cmds)
        return state.replace(commands=cmds)

    # ------------------------------------------------------------------
    # perturbation events (reference t1_dh_stand_env.py:179-247)
    # ------------------------------------------------------------------

    def _events(self, state: EnvState, key) -> EnvState:
        dr = self.cfg.domain_rand
        k_push1, k_push2, kf1, kf2, kf3, kt = jax.random.split(key, 6)
        n = state.commands.shape[0]
        if dr.push_robots:
            i = jnp.minimum(state.common_step // dr.update_step, len(dr.push_duration) - 1)
            duration = jnp.asarray(dr.push_duration)[i] / self.dt
            window = (state.common_step % self.push_interval) <= duration
            force = jax.random.uniform(k_push1, (n, 2), minval=-dr.max_push_vel_xy,
                                       maxval=dr.max_push_vel_xy)
            torque = jax.random.uniform(k_push2, (n, 3), minval=-dr.max_push_ang_vel,
                                        maxval=dr.max_push_ang_vel)
            # T1 variant never clears is_first_push inside the window, so the
            # velocity targets are resampled and applied on every window step
            push_force = jnp.where(window, state.push_force.at[:, :2].set(force), 0.0)
            push_torque = jnp.where(window, torque, 0.0)
            # velocity *set* (not impulse): overwrite world lin xy + ang vel
            from ..physics.engine import root_world_vel, set_root_world_vel
            linv, angv = root_world_vel(state.phys)
            linv = jnp.where(window, linv.at[:, :2].set(push_force[:, :2]), linv)
            angv = jnp.where(window, push_torque, angv)
            phys = set_root_world_vel(state.phys, linv, angv)
            state = state.replace(phys=phys, push_force=push_force, push_torque=push_torque,
                                  is_first_push=~window)
        if dr.add_ext_force:
            i = jnp.minimum(state.common_step // dr.add_update_step, len(dr.add_duration) - 1)
            duration = jnp.asarray(dr.add_duration)[i] / self.dt
            window = (state.common_step % self.ext_force_interval) <= duration
            fx = jax.random.uniform(kf1, (n, 1), minval=-dr.ext_force_max_x / 2,
                                    maxval=dr.ext_force_max_x)
            fy = jax.random.uniform(kf2, (n, 1), minval=-dr.ext_force_max_y,
                                    maxval=dr.ext_force_max_y)
            fz = jax.random.uniform(kf3, (n, 1), minval=-dr.ext_force_max_z,
                                    maxval=dr.ext_force_max_z)
            new_force = jnp.concatenate([fx, fy, fz], -1)
            new_torque = jax.random.uniform(kt, (n, 3), minval=-dr.ext_torque_max,
                                            maxval=dr.ext_torque_max)
            sample_now = window & state.is_first_add_force
            ext_force = jnp.where(window, jnp.where(sample_now, new_force, state.ext_force), 0.0)
            ext_torque = jnp.where(window, jnp.where(sample_now, new_torque, state.ext_torque), 0.0)
            # applied only from the second window step on, only to standing
            # envs — and (Isaac Gym applied-force semantics) only for ONE
            # simulation substep, the first of the next policy step
            stand = self._stand_command(state.commands)[:, None]
            apply_f = jnp.where(window & ~state.is_first_add_force, ext_force * stand, 0.0)
            apply_t = jnp.where(window & ~state.is_first_add_force, ext_torque * stand, 0.0)
            state = state.replace(ext_force=ext_force, ext_torque=ext_torque,
                                  ext_force_apply=apply_f, ext_torque_apply=apply_t,
                                  is_first_add_force=~window)
        return state

    # ------------------------------------------------------------------
    # the step pipeline (reference legged_robot.py:387-506 + T1 overrides)
    # ------------------------------------------------------------------

    def step(self, state: EnvState, actions: jnp.ndarray):
        cfg = self.cfg
        clip_a = cfg.normalization.clip_actions
        if cfg.env.use_ref_actions:
            actions = actions + state.ref_action
        actions = jnp.clip(actions, -clip_a, clip_a)
        state = state.replace(actions=actions)

        key, k_sub, k_post = jax.random.split(state.rng, 3)
        state = state.replace(rng=key)

        # --- decimation loop: 10 physics substeps @ 1 kHz under lax.scan;
        # the scalarized engine core batches natively (no vmap) ---
        from ..physics.contact import flat_cell_cache, gather_cells_supercell
        from ..physics.engine_core import contact_point_xy, substep_batched

        hf = self.heightfield.replace(height=state.terrain_height)

        # 2-D (8, N/8) env-axis layout for the whole physics phase: 1-D [N]
        # arrays occupy a single sublane row on TPU (1/8 of the VPU), so the
        # elementwise physics runs ~3x faster with the env axis folded to
        # (8, N/8) (tools/microbench_layout.py).  Reshape at the policy-step
        # boundary; the engine core is written over leading `...` batch dims
        # and doesn't care.
        n = actions.shape[0]
        rows = 8 if n % 8 == 0 else 1

        def to2(x):
            return x.reshape((rows, n // rows) + x.shape[1:])

        def to1(x):
            return x.reshape((n,) + x.shape[2:])

        phys2 = jax.tree.map(to2, state.phys)
        params2 = jax.tree.map(to2, state.params)
        actions2 = to2(actions)
        ext_f2 = to2(state.ext_force_apply)
        ext_t2 = to2(state.ext_torque_apply)

        # frozen-cell contact: ONE gather per policy step picks every contact
        # point's bilinear cell; the 10 substeps then run gather-free (see
        # contact.CellCache — per-substep gathers are ~100x the rest of the
        # physics on TPU).  The supercell table turns that into one gather
        # fragment per ENV (not per point) + MXU one-hot extraction.
        px0, py0 = contact_point_xy(self.model, phys2)
        if self.terrain is None:
            cells2 = flat_cell_cache(px0, py0)
        else:
            cells2 = gather_cells_supercell(
                self.supertable, phys2.base_pos[..., 0],
                phys2.base_pos[..., 1], px0, py0)

        dr = cfg.domain_rand
        # per-substep action-lag re-randomization mutates the lag index inside
        # the decimation loop — only the scan path implements it (the
        # megakernel resolves the action lag outside the kernel); the
        # reference keeps this flag always-False for t1
        use_mk = (getattr(cfg.sim, "megakernel", True) and rows == 8
                  and not (dr.add_lag and dr.randomize_lag_timesteps_perstep)
                  # CPU = interpret-mode Pallas only: slower than scan and
                  # trips the jax-0.9 interpret+vma scan-carry bug, so the
                  # scan path is the CPU default (tests force the kernel
                  # via sim.megakernel_interpret to check equivalence)
                  and (not self._mega_interpret
                       or getattr(cfg.sim, "megakernel_interpret", False)))
        if use_mk:
            (phys2, lagb, dof_lagb, imu_lagb, torques, cforces2, cx) = \
                self._decimation_megakernel(state, phys2, params2, actions2,
                                            cells2, ext_f2, ext_t2, k_sub)
            state = state.replace(
                phys=jax.tree.map(to1, phys2),
                lag_buffer=to1(lagb), dof_lag_buffer=to1(dof_lagb),
                imu_lag_buffer=to1(imu_lagb), torques=to1(torques),
                contact_forces=to1(cforces2))
            # kernel-emitted post-step FK rows ([24, 8, M] -> [24, N])
            kin_rows = cx.reshape(cx.shape[0], n)
            state, obs, priv_obs, rew, extras = self._post_physics_step(
                state, k_post, kin_rows=kin_rows)
            # obs clipping happens per frame inside _compute_observations
            return state, obs, priv_obs, rew, state.reset_buf, extras

        def vsub(ph, pr, tau, fr, bf, bt):
            return substep_batched(self.model, pr, hf, self.copts,
                                   self.sopts, ph, tau, fr, self.cp_meff, bf, bt,
                                   cell_cache=cells2,
                                   restitution=params2.restitution)

        def sub_fn(carry, inp):
            phys, lagb, dof_lagb, imu_lagb, torques, lag_steps = carry
            idx, k = inp
            torques, lagb, lag_steps = legged.compute_torques(
                cfg, params2.replace(lag_steps=lag_steps), self.torque_limits,
                self.default_dof_pos, lagb, actions2, phys.qpos, phys.qvel, k)
            # external wrench applies to the first substep only (Isaac Gym
            # per-step applied-force semantics)
            on = (idx == 0).astype(jnp.float32)
            bf = ext_f2 * on
            bt = ext_t2 * on
            phys, cforces = vsub(phys, params2.dynamics, torques,
                                 params2.friction, bf, bt)
            if dr.add_dof_lag or dr.add_dof_pos_vel_lag:
                dof_lagb = legged.push_ring(
                    dof_lagb, jnp.concatenate([phys.qpos, phys.qvel], -1))
            if dr.add_imu_lag:
                euler = sp.quat_to_euler_xyz(phys.base_quat)
                imu_lagb = legged.push_ring(
                    imu_lagb, jnp.concatenate([phys.base_vel[..., :3], euler], -1))
            return (phys, lagb, dof_lagb, imu_lagb, torques, lag_steps), cforces

        sub_keys = jax.random.split(k_sub, cfg.control.decimation)
        carry0 = (phys2,) + jax.tree.map(
            to2, (state.lag_buffer, state.dof_lag_buffer,
                  state.imu_lag_buffer, state.torques)) + (
            to2(state.params.lag_steps),)
        (phys, lagb, dof_lagb, imu_lagb, torques, lag_steps2), cf_all = jax.lax.scan(
            sub_fn, carry0,
            (jnp.arange(cfg.control.decimation), sub_keys))
        phys, lagb, dof_lagb, imu_lagb, torques = jax.tree.map(
            to1, (phys, lagb, dof_lagb, imu_lagb, torques))
        state = state.replace(
            phys=phys, lag_buffer=lagb, dof_lag_buffer=dof_lagb,
            imu_lag_buffer=imu_lagb, torques=torques,
            params=state.params.replace(lag_steps=to1(lag_steps2)),
            contact_forces=to1(cf_all[-1]))

        # --- post-physics ---
        state, obs, priv_obs, rew, extras = self._post_physics_step(state, k_post)
        # obs clipping happens per frame inside _compute_observations
        return state, obs, priv_obs, rew, state.reset_buf, extras

    def _decimation_megakernel(self, state: EnvState, phys2, params2, actions2,
                               cells2, ext_f2, ext_t2, k_sub):
        """Pack state into row layout, run the one-launch Pallas decimation
        kernel (physics/megakernel.py), unpack, and rebuild the shift-ring
        lag buffers from the kernel's per-substep snapshots (one concatenate
        per policy step instead of one per substep)."""
        cfg = self.cfg
        dr = cfg.domain_rand
        from ..physics.engine_core import model_consts
        from ..physics.megakernel import run_decimation

        mc = model_consts(self.model)
        nd, nb, ncp = mc.nd, mc.nb, mc.ncp
        dec = cfg.control.decimation
        rows8, m = actions2.shape[0], actions2.shape[1]

        def r2(x):  # [N, ...] -> [8, M, ...]
            return x.reshape((rows8, m) + x.shape[1:])

        def lead(x):  # [8, M, C] -> [C, 8, M]
            return jnp.moveaxis(x, -1, 0)

        # one concatenate in [8, M, C] then ONE transpose per row group — the
        # per-field lead() form lowered to ~36 separate copy ops per policy
        # step (round-5 op census: copies are the top rollout cost)
        dyn = params2.dynamics
        state_rows = lead(jnp.concatenate([
            phys2.base_pos, phys2.base_quat, phys2.base_vel,
            phys2.qpos, phys2.qvel], axis=-1))
        anchor_rows = jnp.transpose(
            phys2.cp_anchor, (3, 2, 0, 1)).reshape(3 * ncp, rows8, m)
        cell_rows = jnp.concatenate(
            [cells2.x0, cells2.y0, cells2.h00, cells2.h10, cells2.h01,
             cells2.h11], axis=0)
        # dyn rows: mass[nb] | com[nb*3] | inertia[nb*9] | armature[nd] |
        # friction | restitution
        com = dyn.com                                   # [8,M,nb,3]
        inert = dyn.inertia                             # [8,M,nb,3,3]
        dyn_rows = lead(jnp.concatenate([
            dyn.mass,
            com.reshape(com.shape[:-2] + (3 * nb,)),
            inert.reshape(inert.shape[:-3] + (9 * nb,)),
            dyn.armature,
            params2.friction[..., None],
            params2.restitution[..., None],
        ], axis=-1))
        ctrl_rows = lead(jnp.concatenate([
            params2.p_gains, params2.d_gains,
            params2.motor_offsets, params2.joint_coulomb,
            params2.joint_viscous], axis=-1))

        # --- action lag resolved outside: within one policy step the pushed
        # action is constant (reference pushes a_t then reads, 1 kHz) ---
        a_scaled = actions2 * cfg.control.action_scale          # [8,M,nd]
        lagb2 = r2(state.lag_buffer)                            # [8,M,nd,L]
        L = lagb2.shape[-1]
        if dr.add_lag:
            lag2 = r2(state.params.lag_steps)                   # [8,M] int
            # one-hot ring reads for all `dec` substeps in one fused
            # multiply-sum (a take_along_axis per substep scalarizes on TPU —
            # same pathology as legged.read_ring, see its docstring)
            ar = jnp.arange(L, dtype=lag2.dtype)
            idx = jnp.clip(lag2[..., None] - (jnp.arange(dec, dtype=lag2.dtype)
                                              [None, None] + 1), 0, L - 1)
            sel = (idx[..., None] == ar).astype(lagb2.dtype)    # [8,M,dec,L]
            prev = jnp.sum(lagb2[..., None, :, :] * sel[..., None, :],
                           axis=-1)                             # [8,M,dec,nd]
            lag_ks = [
                jnp.where((lag2 <= k)[..., None], a_scaled, prev[..., k, :])
                for k in range(dec)]
            lagged_rows = lead(jnp.concatenate(lag_ks, axis=-1))
            new_lagb = jnp.concatenate([
                jnp.repeat(a_scaled[..., None], min(dec, L), axis=-1),
                lagb2[..., :max(L - dec, 0)]], axis=-1)
        else:
            lagged_rows = lead(jnp.concatenate([a_scaled] * dec, axis=-1))
            new_lagb = lagb2

        if dr.randomize_torque:
            lo, hi = dr.torque_multiplier_range
            noise_rows = jax.random.uniform(
                k_sub, (dec * nd, rows8, m), minval=lo, maxval=hi)
        else:
            noise_rows = jnp.ones((dec * nd, rows8, m), jnp.float32)
        extw_rows = lead(jnp.concatenate([ext_f2, ext_t2], axis=-1))

        st, an, fo, tq, ds, iss, cx = run_decimation(
            mc, self.heightfield.hscale, self.copts, self.sopts, dec,
            np.asarray(self.default_dof_pos), np.asarray(self.torque_limits),
            np.asarray(self.cp_meff), dr.randomize_coulomb_friction,
            dr.randomize_torque, state_rows, anchor_rows, cell_rows, dyn_rows,
            ctrl_rows, lagged_rows, noise_rows, extw_rows,
            interpret=self._mega_interpret,
            feet_bodies=list(self.model.feet_bodies),
            knee_bodies=list(self.model.knee_bodies),
            vma=getattr(self, "vma_axis", self.axis_name))

        def unlead(x):  # [C, 8, M] -> [8, M, C]
            return jnp.moveaxis(x, 0, -1)

        # ONE transpose of the packed state, then minor-axis slices (the
        # per-field unlead() form was 5 separate copies)
        stT = unlead(st)                                # [8, M, 13+2nd]
        phys_out = phys2.replace(
            base_pos=stT[..., 0:3], base_quat=stT[..., 3:7],
            base_vel=stT[..., 7:13], qpos=stT[..., 13:13 + nd],
            qvel=stT[..., 13 + nd:13 + 2 * nd],
            cp_anchor=jnp.transpose(
                an.reshape(3, ncp, rows8, m), (2, 3, 1, 0)))
        cforces = unlead(fo).reshape(fo.shape[1:] + (nb, 3))
        torques = unlead(tq)

        # lag rings: snapshots are newest-LAST; ring index 0 = newest
        dof_lagb = r2(state.dof_lag_buffer)
        if dr.add_dof_lag or dr.add_dof_pos_vel_lag:
            Ld = dof_lagb.shape[-1]
            snaps = unlead(ds).reshape(ds.shape[1:] + (dec, 2 * nd))  # [8,M,dec,24]
            snaps = jnp.moveaxis(snaps[..., ::-1, :], -2, -1)         # [8,M,24,dec]
            dof_lagb = jnp.concatenate(
                [snaps[..., :min(dec, Ld)], dof_lagb[..., :max(Ld - dec, 0)]],
                axis=-1)
        imu_lagb = r2(state.imu_lag_buffer)
        if dr.add_imu_lag:
            Li = imu_lagb.shape[-1]
            snaps = unlead(iss).reshape(iss.shape[1:] + (dec, 7))
            euler = sp.quat_to_euler_xyz(snaps[..., 3:7])    # [8,M,dec,3]
            snaps = jnp.concatenate([snaps[..., :3], euler], axis=-1)
            snaps = jnp.moveaxis(snaps[..., ::-1, :], -2, -1)
            imu_lagb = jnp.concatenate(
                [snaps[..., :min(dec, Li)], imu_lagb[..., :max(Li - dec, 0)]],
                axis=-1)
        return phys_out, new_lagb, dof_lagb, imu_lagb, torques, cforces, cx

    def _make_ctx(self, state: EnvState, kin_rows=None,
                  phys_for_kin=None) -> StepCtx:
        from ..physics.engine_core import ctx_kinematics

        model = self.model
        feet = list(model.feet_bodies)
        n = state.phys.base_pos.shape[0]
        if phys_for_kin is None:
            phys_for_kin = state.phys
        if kin_rows is not None:
            # feet/knee kinematics emitted by the decimation megakernel
            # (engine_core.ctx_stack_rows layout) — i.e. FK of the PRE-event
            # post-step state.  This matches the reference, where pushes
            # overwrite the root-state tensor but the rigid-body state tensor
            # (feet pose/velocity) is not refreshed again before rewards
            # (legged_robot.py:465-471, t1_dh_stand_env.py:217-231).  Root
            # world velocity is recomputed from the live (post-push) state
            # below, matching the reference's root_states read.
            from ..physics.engine_core import ctx_row_layout

            k2 = kin_rows
            nf, nk = len(feet), len(model.knee_bodies)
            lo = ctx_row_layout(nf, nk)   # the producer/consumer row contract
            o_pos, o_rot = lo["pos"], lo["rot"]
            o_av, o_knee = lo["angvel"], lo["knee"]
            feet_pos = jnp.stack(
                [jnp.stack([k2[o_pos + 3 * f + c] for c in range(3)], axis=-1)
                 for f in range(nf)], axis=-2)                      # [N,nf,3]
            eulers = []
            for f in range(nf):
                r00, r10, r20, r21, r22 = (k2[o_rot + 5 * f + i] for i in range(5))
                roll = jnp.arctan2(r21, r22)
                pitch = jnp.arcsin(jnp.clip(-r20, -1.0, 1.0))
                yaw = jnp.arctan2(r10, r00)
                eulers.append(jnp.stack([roll, pitch, yaw], axis=-1))
            feet_euler = jnp.stack(eulers, axis=-2)                 # [N,nf,3]
            feet_angvel_xy = jnp.stack(
                [jnp.stack([k2[o_av + 2 * f], k2[o_av + 2 * f + 1]], axis=-1)
                 for f in range(nf)], axis=-2)                      # [N,nf,2]
            knee_xy = jnp.stack(
                [jnp.stack([k2[o_knee + 2 * kk], k2[o_knee + 2 * kk + 1]], axis=-1)
                 for kk in range(nk)], axis=-2)                     # [N,nk,2]
            root_vel_world = self._root_vel_world(state)
        else:
            # component-form FK in the (8, N/8) layout (see step()) — the
            # array-of-structures vmapped dyn.fk costs ~2 ms at 4096 envs,
            # this path ~0.3 ms
            rows = 8 if n % 8 == 0 else 1
            phys2 = jax.tree.map(
                lambda x: x.reshape((rows, n // rows) + x.shape[1:]), phys_for_kin)
            k = ctx_kinematics(model, phys2)
            k = jax.tree.map(lambda x: x.reshape((n,) + x.shape[2:]), k)
            feet_pos = k["feet_pos"]
            feet_euler = k["feet_euler"]
            feet_angvel_xy = k["feet_angvel_xy"]
            knee_xy = k["knee_xy"]
            # root vel from the LIVE (post-event) state, like the reference's
            # root_states read — only the feet/knee rigid-body context is
            # pre-push (see _post_physics_step)
            root_vel_world = self._root_vel_world(state)
        base_euler = sp.quat_to_euler_xyz(state.phys.base_quat)
        grav = jnp.asarray([0.0, 0.0, -1.0])
        proj_grav = sp.quat_rotate_inverse(state.phys.base_quat,
                                           jnp.broadcast_to(grav, (n, 3)))
        return StepCtx(
            base_lin_vel=state.phys.base_vel[:, 3:],
            base_ang_vel=state.phys.base_vel[:, :3],
            base_euler=base_euler, projected_gravity=proj_grav,
            root_vel_world=root_vel_world,
            feet_pos=feet_pos,
            feet_euler=feet_euler,
            feet_angvel_xy=feet_angvel_xy,
            knee_xy=knee_xy,
            contact=state.contact_forces[:, feet, 2] > 5.0,
            stand_command=self._stand_command(state.commands),
        )

    def _post_physics_step(self, state: EnvState, key, kin_rows=None):
        cfg = self.cfg
        k_ev, k_reset, k_obs, k_cmd = jax.random.split(key, 4)

        state = state.replace(
            episode_length=state.episode_length + 1,
            common_step=state.common_step + 1,
        )

        # T1 callback: phase counter, gait-time command resampling, events
        # (reference t1_dh_stand_env.py:179-215).  The stand-freeze of the
        # phase counter uses the *post-resample* commands, matching the
        # reference where _get_phase zeroes it on first use after the callback.
        state = state.replace(phase_length=state.phase_length + 1)
        state = self._resample_gait_commands(state, k_cmd)
        if cfg.commands.heading_command:
            # recompute the yaw-rate command from the heading error (reference
            # legged_robot.py:951-954): wz = clip(0.5*wrap(target - heading))
            n = state.commands.shape[0]
            fwd = sp.quat_rotate(state.phys.base_quat,
                                 jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), (n, 3)))
            heading = jnp.arctan2(fwd[:, 1], fwd[:, 0])
            wz = jnp.clip(0.5 * sp.wrap_to_pi(state.commands[:, 3] - heading),
                          -1.0, 1.0)
            state = state.replace(commands=state.commands.at[:, 2].set(wz))
        if cfg.commands.sw_switch:
            stand = self._stand_command(state.commands)
            state = state.replace(
                phase_length=jnp.where(stand, 0, state.phase_length))
        # snapshot the PRE-event physics: pushes overwrite the root-state
        # velocities, but the reference's rigid-body tensor (feet pose/vel
        # reward context) is not refreshed again before rewards
        # (legged_robot.py:465-471) — both the megakernel ctx (emitted before
        # _events runs) and the fallback FK below must see pre-push state.
        pre_event_phys = state.phys
        state = self._events(state, k_ev)

        ctx = self._make_ctx(state, kin_rows=kin_rows, phys_for_kin=pre_event_phys)

        # termination (reference legged_robot.py:509-517)
        term = list(self.model.termination_bodies)
        contact_term = jnp.any(
            jnp.linalg.norm(state.contact_forces[:, term], axis=-1) > 1.0, axis=-1)
        time_out = state.episode_length > self.max_episode_length
        reset_buf = contact_term | time_out
        state = state.replace(reset_buf=reset_buf, time_out_buf=time_out)

        # rewards on the pre-reset state
        state, rew = self._compute_rewards(state, ctx)

        # extras (episode logging) BEFORE sums are zeroed by the reset
        extras = self._build_extras(state, reset_buf)

        # masked reset
        state = self._reset_idx(state, reset_buf, k_reset)

        # observations on the post-reset state
        state, obs, priv_obs = self._compute_observations(state, k_obs)

        # last_* rollover (reference legged_robot.py:496-502)
        ctx_post = None  # ctx recomputation folded into _compute_observations
        state = state.replace(
            last_last_actions=state.last_actions,
            last_actions=state.actions,
            last_dof_vel=jnp.where(reset_buf[:, None], 0.0, state.phys.qvel),
            last_root_vel=self._root_vel_world(state),
        )
        return state, obs, priv_obs, rew, extras

    def _root_vel_world(self, state: EnvState):
        from ..physics.engine import root_world_vel
        lin, ang = root_world_vel(state.phys)
        return jnp.concatenate([lin, ang], -1)

    # ------------------------------------------------------------------
    # rewards (reference t1_dh_stand_env.py:572-946); each _rw_* returns the
    # raw term; stateful trackers update alongside.
    # ------------------------------------------------------------------

    def _compute_rewards(self, state: EnvState, ctx: StepCtx):
        cfg = self.cfg
        R = cfg.rewards
        n = state.phys.qpos.shape[0]
        q = state.phys.qpos
        dq = state.phys.qvel
        cmds = state.commands
        stand = ctx.stand_command
        phase = self._phase(state, state.phase_length)
        stance_mask = self._gait_stance_mask(phase)

        values: Dict[str, jnp.ndarray] = {}

        # --- joint_pos (:576) --- uses last step's ref_dof_pos
        target = jnp.where(stand[:, None], self.default_dof_pos, state.ref_dof_pos)
        diff_n = jnp.linalg.norm(q - target, axis=-1)
        r = jnp.exp(-2.0 * diff_n) - 0.2 * jnp.clip(diff_n, 0.0, 0.5)
        values["joint_pos"] = jnp.where(stand, 1.0, r)

        # --- feet/knee distance (:599/:615) ---
        def dist_band(xy, dmin, dmax):
            d = jnp.linalg.norm(xy[:, 0] - xy[:, 1], axis=-1)
            d_min = jnp.clip(d - dmin, -0.5, 0.0)
            d_max = jnp.clip(d - dmax, 0.0, 0.5)
            return (jnp.exp(-jnp.abs(d_min) * 100) + jnp.exp(-jnp.abs(d_max) * 100)) / 2.0

        values["feet_distance"] = dist_band(ctx.feet_pos[..., :2], R.foot_min_dist, R.foot_max_dist)
        values["knee_distance"] = dist_band(ctx.knee_xy, R.knee_min_dist, R.knee_max_dist)

        # --- foot_slip (:630) — reference reads rigid_state[...,10:12],
        # i.e. the feet ANGULAR velocity xy; reproduced bit-for-bit.
        slip = jnp.sqrt(jnp.linalg.norm(ctx.feet_angvel_xy, axis=-1))
        values["foot_slip"] = jnp.sum(slip * ctx.contact, axis=-1)

        # --- feet_air_time (:642) ---
        stance_or = jnp.where(
            (jnp.linalg.norm(cmds[:, :3], axis=-1) < 0.05)[:, None], 1.0, stance_mask)
        contact_filt = ctx.contact | (stance_or > 0.5) | state.last_contacts
        first_contact = (state.feet_air_time > 0.0) * contact_filt
        feet_air_time = state.feet_air_time + self.dt
        values["feet_air_time"] = jnp.sum(
            jnp.clip(feet_air_time, 0.0, 0.5) * first_contact, axis=-1)
        feet_air_time = feet_air_time * (~contact_filt)
        state = state.replace(feet_air_time=feet_air_time, last_contacts=ctx.contact)

        # --- feet_contact_number (:659) ---
        stance_eq = jnp.where(stand[:, None], 1.0, stance_mask)
        agree = jnp.where(ctx.contact == (stance_eq > 0.5), 1.0, -0.3)
        values["feet_contact_number"] = jnp.mean(agree, axis=-1)

        # --- orientation (:670) ---
        quat_mismatch = jnp.exp(-jnp.sum(jnp.abs(ctx.base_euler[:, :2]), axis=-1) * 10)
        orient = jnp.exp(-jnp.linalg.norm(ctx.projected_gravity[:, :2], axis=-1) * 20)
        values["orientation"] = (quat_mismatch + orient) / 2.0

        # --- feet_contact_forces (:679) ---
        feet = list(self.model.feet_bodies)
        fnorm = jnp.linalg.norm(state.contact_forces[:, feet], axis=-1)
        values["feet_contact_forces"] = jnp.sum(
            jnp.clip(fnorm - R.max_contact_force, 0.0, 400.0), axis=-1)

        # --- default_joint_pos (:686) ---
        joint_diff = q - self.default_dof_pos
        left = joint_diff[:, jnp.asarray([0, 1, 5])]
        right = joint_diff[:, jnp.asarray([6, 7, 11])]
        yaw_roll = jnp.linalg.norm(left, axis=-1) + jnp.linalg.norm(right, axis=-1)
        yaw_roll = jnp.clip(yaw_roll - 0.1, 0.0, 50.0)
        values["default_joint_pos"] = (jnp.exp(-yaw_roll * 100)
                                       - 0.01 * jnp.linalg.norm(joint_diff, axis=-1))

        # --- base_height (:706) ---
        stance_sum = jnp.sum(stance_mask, axis=-1)
        measured = jnp.sum(ctx.feet_pos[..., 2] * stance_mask, axis=-1) / jnp.maximum(stance_sum, 1e-6)
        base_h = state.phys.base_pos[:, 2] - (measured - 0.05)
        values["base_height"] = jnp.exp(-jnp.abs(base_h - R.base_height_target) * 100)

        # --- base_acc (:717) ---
        root_acc = state.last_root_vel - ctx.root_vel_world
        values["base_acc"] = jnp.exp(-jnp.linalg.norm(root_acc, axis=-1) * 3)

        # --- vel_mismatch_exp (:726) ---
        lin_mismatch = jnp.exp(-jnp.square(ctx.base_lin_vel[:, 2]) * 10)
        ang_mismatch = jnp.exp(-jnp.linalg.norm(ctx.base_ang_vel[:, :2], axis=-1) * 5.0)
        values["vel_mismatch_exp"] = (lin_mismatch + ang_mismatch) / 2.0

        # --- track_vel_hard (:738) ---
        lin_err = jnp.linalg.norm(cmds[:, :2] - ctx.base_lin_vel[:, :2], axis=-1)
        ang_err = jnp.abs(cmds[:, 2] - ctx.base_ang_vel[:, 2])
        values["track_vel_hard"] = ((jnp.exp(-lin_err * 10) + jnp.exp(-ang_err * 10)) / 2.0
                                    - 0.2 * (lin_err + ang_err))

        # --- tracking_lin_vel / tracking_ang_vel (:760/:776) ---
        sig = R.tracking_sigma
        lin_sq = jnp.sum(jnp.square(cmds[:, :2] - ctx.base_lin_vel[:, :2]), axis=-1)
        lin_abs = jnp.sum(jnp.abs(cmds[:, :2] - ctx.base_lin_vel[:, :2]), axis=-1)
        values["tracking_lin_vel"] = jnp.where(
            stand, jnp.exp(-lin_abs * sig * 2), jnp.exp(-lin_sq * sig))
        ang_sq = jnp.square(cmds[:, 2] - ctx.base_ang_vel[:, 2])
        ang_abs = jnp.abs(cmds[:, 2] - ctx.base_ang_vel[:, 2])
        values["tracking_ang_vel"] = jnp.where(
            stand, jnp.exp(-ang_abs * sig * 2), jnp.exp(-ang_sq * sig))

        # --- feet_clearance (:793) ---
        feet_z = ctx.feet_pos[..., 2]
        delta_z = feet_z - state.last_feet_z
        feet_height = state.feet_height + delta_z
        swing_mask = 1.0 - stance_mask
        rew_pos = ((feet_height > R.target_feet_height)
                   & (feet_height < R.target_feet_height_max)).astype(jnp.float32)
        values["feet_clearance"] = jnp.sum(rew_pos * swing_mask, axis=-1)
        feet_height = feet_height * (~ctx.contact)
        state = state.replace(feet_height=feet_height, last_feet_z=feet_z)

        # --- low_speed (:816) ---
        abs_speed = jnp.abs(ctx.base_lin_vel[:, 0])
        abs_cmd = jnp.abs(cmds[:, 0])
        too_low = abs_speed < 0.5 * abs_cmd
        too_high = abs_speed > 1.2 * abs_cmd
        desired = ~(too_low | too_high)
        mismatch = jnp.sign(ctx.base_lin_vel[:, 0]) != jnp.sign(cmds[:, 0])
        r = jnp.where(too_low, -1.0, jnp.where(too_high, 0.0, 0.0))
        r = jnp.where(desired, 1.2, r)
        r = jnp.where(mismatch, -2.0, r)
        values["low_speed"] = r * (abs_cmd > 0.05)

        # --- energy terms (:849-:868) ---
        values["torques"] = jnp.sum(jnp.square(state.torques), axis=-1)
        values["dof_vel"] = jnp.sum(jnp.square(dq), axis=-1)
        values["dof_acc"] = jnp.sum(jnp.square((state.last_dof_vel - dq) / self.dt), axis=-1)

        # --- collision (:870) ---
        pen = list(self.model.penalized_bodies)
        values["collision"] = jnp.sum(
            (jnp.linalg.norm(state.contact_forces[:, pen], axis=-1) > 0.1).astype(jnp.float32),
            axis=-1)

        # --- action_smoothness (:877) ---
        d1 = state.last_actions - state.actions
        d2 = state.actions + state.last_last_actions - 2 * state.last_actions
        values["action_smoothness"] = (jnp.sum(jnp.square(d1), axis=-1)
                                       + jnp.sum(jnp.square(d2), axis=-1)
                                       + 0.05 * jnp.sum(jnp.abs(state.actions), axis=-1))

        # --- stand_still (:899) ---
        dof_idx = jnp.asarray([0, 1, 2, 3, 5, 6, 7, 8])
        w = jnp.asarray([2.0, 2.0, 1.0, 1.0, 1.0, 2.0, 2.0, 1.0, 1.0, 1.0])
        err = jnp.concatenate([(q - self.default_dof_pos)[:, dof_idx],
                               ctx.feet_euler[:, :, 1]], axis=-1) * w
        r = jnp.exp(-jnp.sum(jnp.square(err), axis=-1))
        values["stand_still"] = jnp.where(stand, r, 0.0)

        # --- stand_sysmetry (:917, defined but unscaled by default) ---
        sym_err = q[:, jnp.asarray([0, 1, 2, 3])] - q[:, jnp.asarray([5, 6, 7, 8])]
        values["stand_sysmetry"] = jnp.where(
            stand, jnp.exp(-jnp.sum(jnp.square(sym_err), axis=-1)), 0.0)

        # --- feet_rotation (:926) ---
        rot = jnp.sum(jnp.square(ctx.feet_euler[:, :, 1]), axis=-1)
        values["feet_rotation"] = jnp.exp(-jnp.square(rot))

        # --- termination (:894) ---
        values["termination"] = (state.reset_buf & ~state.time_out_buf).astype(jnp.float32)

        # --- feet_stumble (:937) ---
        values["feet_stumble"] = jnp.any(
            jnp.linalg.norm(state.contact_forces[:, feet, :2], axis=-1)
            > 5 * jnp.abs(state.contact_forces[:, feet, 2]), axis=-1).astype(jnp.float32)

        # --- dof_vel_limits (:942) — reference hard-codes knee limit 10 ---
        lim = self.dof_vel_limits.at[jnp.asarray([4, 9])].set(10.0)
        values["dof_vel_limits"] = jnp.sum(
            jnp.clip(jnp.abs(dq) - lim * R.soft_dof_vel_limit, 0.0, 1.0), axis=-1)

        # total = sum of scaled active terms; only_positive clips at 0.
        # One stacked [N, T] term matrix instead of T per-term scatter-adds:
        # the .at[:, i].add loop lowered to ~T dynamic-update-slice kernels.
        terms = jnp.stack([values[name] for name in self.reward_names], axis=-1)
        scales = jnp.asarray([self.reward_scales_dt[name]
                              for name in self.reward_names])
        terms = terms * scales
        rew = jnp.sum(terms, axis=-1)
        if cfg.rewards.only_positive_rewards:
            rew = jnp.maximum(rew, 0.0)
        if "termination" in self.reward_scales_dt:
            t = values["termination"] * self.reward_scales_dt["termination"]
            rew = rew + t
        state = state.replace(episode_sums=state.episode_sums + terms)
        return state, rew

    # ------------------------------------------------------------------
    # observations (reference t1_dh_stand_env.py:368-481)
    # ------------------------------------------------------------------

    def _compute_observations(self, state: EnvState, key):
        cfg = self.cfg
        dr = cfg.domain_rand
        os_ = cfg.normalization.obs_scales
        n = state.phys.qpos.shape[0]
        q, dq = state.phys.qpos, state.phys.qvel

        phase = self._phase(state, state.phase_length)
        ref_dof_pos, ref_action = self._compute_ref_state(state, phase)
        state = state.replace(ref_dof_pos=ref_dof_pos, ref_action=ref_action)

        sin_pos = jnp.sin(2 * jnp.pi * phase)[:, None]
        cos_pos = jnp.cos(2 * jnp.pi * phase)[:, None]
        stance_mask = self._gait_stance_mask(phase)
        feet = list(self.model.feet_bodies)
        contact_mask = (state.contact_forces[:, feet, 2] > 5.0).astype(jnp.float32)
        command_input = jnp.concatenate(
            [sin_pos, cos_pos, state.commands[:, :3] * self.commands_scale], -1)

        # privileged (critic) frame — no lag, no noise
        base_euler = sp.quat_to_euler_xyz(state.phys.base_quat)
        if dr.add_ext_force:
            pf = state.ext_force[:, :2] / (dr.ext_force_max_x + 0.1)
            pt = state.ext_torque / (dr.ext_torque_max + 0.1)
        else:
            pf = state.push_force[:, :2]
            pt = state.push_torque
        priv_frame = jnp.concatenate([
            command_input,                                    # 5
            (q - self.default_dof_pos) * os_.dof_pos,         # 12
            dq * os_.dof_vel,                                 # 12
            state.actions,                                    # 12
            q - ref_dof_pos,                                  # 12
            state.phys.base_vel[:, 3:] * os_.lin_vel,         # 3
            state.phys.base_vel[:, :3] * os_.ang_vel,         # 3
            base_euler * os_.quat,                            # 3
            pf,                                               # 2
            pt,                                               # 3
            state.params.friction[:, None],                   # 1
            state.params.body_mass[:, None] / 30.0,           # 1
            stance_mask,                                      # 2
            contact_mask,                                     # 2
        ], -1)
        if cfg.terrain.measure_heights:
            # reference t1_dh_stand_env.py:466-468
            heights = jnp.clip(
                state.phys.base_pos[:, 2:3] - 0.5 - self.measured_heights(state),
                -1.0, 1.0) * os_.height_measurements
            priv_frame = jnp.concatenate([priv_frame, heights], -1)

        # actor frame — lagged sensors + uniform noise.  Per-step lag
        # re-randomization (reference t1_dh_stand_env.py:408-443) re-draws the
        # read index each policy step with the +1 causality clamp; the updated
        # index is stored back into params (it doubles as ``last``).
        key, k_dof, k_imu, k_dp, k_dv = jax.random.split(key, 5)
        params = state.params
        if dr.add_dof_lag:
            steps = params.dof_lag_steps
            if dr.randomize_dof_lag_timesteps and dr.randomize_dof_lag_timesteps_perstep:
                steps = legged.perstep_lag_update(k_dof, steps, dr.dof_lag_timesteps_range)
                params = params.replace(dof_lag_steps=steps)
            lagged = legged.read_ring(state.dof_lag_buffer, steps)
            lag_q, lag_dq = lagged[:, :self.num_actions], lagged[:, self.num_actions:]
        elif dr.add_dof_pos_vel_lag:
            # split mode: pos and vel read the shared ring at INDEPENDENT lags
            # (reference add_dof_pos_vel_lag buffers, legged_robot.py:324-349)
            p_steps, v_steps = params.dof_pos_lag_steps, params.dof_vel_lag_steps
            if dr.randomize_dof_pos_lag_timesteps and dr.randomize_dof_pos_lag_timesteps_perstep:
                p_steps = legged.perstep_lag_update(k_dp, p_steps, dr.dof_pos_lag_timesteps_range)
                params = params.replace(dof_pos_lag_steps=p_steps)
            if dr.randomize_dof_vel_lag_timesteps and dr.randomize_dof_vel_lag_timesteps_perstep:
                v_steps = legged.perstep_lag_update(k_dv, v_steps, dr.dof_vel_lag_timesteps_range)
                params = params.replace(dof_vel_lag_steps=v_steps)
            lag_q = legged.read_ring(state.dof_lag_buffer[:, :self.num_actions], p_steps)
            lag_dq = legged.read_ring(state.dof_lag_buffer[:, self.num_actions:], v_steps)
        else:
            lag_q, lag_dq = q, dq
        if dr.add_imu_lag:
            steps = params.imu_lag_steps
            if dr.randomize_imu_lag_timesteps and dr.randomize_imu_lag_timesteps_perstep:
                steps = legged.perstep_lag_update(k_imu, steps, dr.imu_lag_timesteps_range)
                params = params.replace(imu_lag_steps=steps)
            imu = legged.read_ring(state.imu_lag_buffer, steps)
            lag_ang_vel, lag_euler = imu[:, :3], imu[:, 3:]
        else:
            lag_ang_vel, lag_euler = state.phys.base_vel[:, :3], base_euler
        state = state.replace(params=params)

        obs_frame = jnp.concatenate([
            command_input,                                    # 5
            (lag_q - self.default_dof_pos) * os_.dof_pos,     # 12
            lag_dq * os_.dof_vel,                             # 12
            state.actions,                                    # 12
            lag_ang_vel * os_.ang_vel,                        # 3
            lag_euler * os_.quat,                             # 3
        ], -1)

        if cfg.noise.add_noise:
            noise = (2.0 * jax.random.uniform(key, obs_frame.shape) - 1.0)
            obs_frame = obs_frame + noise * self.noise_scale_vec * cfg.noise.noise_level

        # clip per frame (== clipping the stacked obs, clip is elementwise;
        # reference legged_robot.py clips the returned obs_buf +-100), then
        # quantize to the bf16 storage dtype so the frame stored in the
        # history — and later reconstructed by the PPO minibatcher — is
        # bit-identical to what the rollout policy consumed.
        clip_o = cfg.normalization.clip_observations
        obs_frame = jnp.clip(obs_frame, -clip_o, clip_o).astype(jnp.bfloat16)
        priv_frame = jnp.clip(priv_frame, -clip_o, clip_o).astype(jnp.bfloat16)

        k_o = cfg.env.num_single_obs
        k_p = self.priv_frame_dim
        obs_hist = jnp.concatenate([state.obs_hist[:, k_o:], obs_frame], axis=1)
        critic_hist = jnp.concatenate([state.critic_hist[:, k_p:], priv_frame], axis=1)
        state = state.replace(obs_hist=obs_hist, critic_hist=critic_hist)

        # the flat history IS the stacked observation (oldest first)
        return state, obs_hist, critic_hist

    def measured_heights(self, state: EnvState) -> jnp.ndarray:
        """Yaw-rotated 187-point height scan around the base (reference
        ``_get_heights``, legged_robot.py:1551-1587; off for t1 but part of
        the framework surface)."""
        pts = sp.quat_apply_yaw(
            state.phys.base_quat[:, None, :], self.height_points[None, :, :])
        pts = pts + state.phys.base_pos[:, None, :]
        hf = self.heightfield.replace(height=state.terrain_height)
        return sample_height_min3(hf, pts[..., :2])

    # ------------------------------------------------------------------
    # masked reset (reference t1_dh_stand_env.py:483-559)
    # ------------------------------------------------------------------

    def _reset_idx(self, state: EnvState, done: jnp.ndarray, key, force_all: bool = False) -> EnvState:
        cfg = self.cfg
        n, na = done.shape[0], self.num_actions
        m1 = done[:, None]
        ks = jax.random.split(key, 10)

        # terrain curriculum (uses pre-reset positions)
        if cfg.terrain.curriculum and self.custom_origins and not force_all:
            level, origin = legged.terrain_curriculum_update(
                cfg, ks[0], done, state.phys.base_pos[:, :2], state.env_origin,
                state.commands, state.terrain_level, state.terrain_type,
                self.terrain_origins)
            state = state.replace(terrain_level=level, env_origin=origin)

        # command curriculum (gated on the shared step counter)
        if cfg.commands.curriculum and not force_all:
            try:
                t_idx = self.reward_names.index("tracking_lin_vel")
                new_range = legged.command_curriculum_update(
                    cfg, done, state.common_step, state.episode_sums[:, t_idx],
                    state.cmd_vx_range, float(self.max_episode_length),
                    self.reward_scales_dt["tracking_lin_vel"],
                    axis_name=self.axis_name)
                state = state.replace(cmd_vx_range=new_range)
            except ValueError:
                pass

        # fresh dof / root states
        new_q, new_dq = legged.sample_reset_dofs(cfg, ks[1], n, self.default_dof_pos)
        new_pos = legged.sample_reset_root(cfg, ks[2], n, state.env_origin, self.custom_origins)
        phys = state.phys
        phys = phys.replace(
            base_pos=jnp.where(m1, new_pos, phys.base_pos),
            base_quat=jnp.where(m1, jnp.asarray([1.0, 0, 0, 0]), phys.base_quat),
            base_vel=jnp.where(m1, 0.0, phys.base_vel),
            qpos=jnp.where(m1, new_q, phys.qpos),
            qvel=jnp.where(m1, new_dq, phys.qvel),
            cp_anchor=jnp.where(done[:, None, None], 0.0, phys.cp_anchor),
        )

        # re-randomize dof props + lag props (reference reset_idx:507-510)
        p, d, offs, coul, visc, arm = legged.sample_dof_params(
            cfg, ks[3], n, self.p_gains_nom, self.d_gains_nom)
        lag, dof_lag, imu_lag, dp_lag, dv_lag = legged.sample_lag_steps(cfg, ks[4], n)
        params = state.params
        params = params.replace(
            p_gains=jnp.where(m1, p, params.p_gains),
            d_gains=jnp.where(m1, d, params.d_gains),
            motor_offsets=jnp.where(m1, offs, params.motor_offsets),
            joint_coulomb=jnp.where(m1, coul, params.joint_coulomb),
            joint_viscous=jnp.where(m1, visc, params.joint_viscous),
            lag_steps=jnp.where(done, lag, params.lag_steps),
            dof_lag_steps=jnp.where(done, dof_lag, params.dof_lag_steps),
            imu_lag_steps=jnp.where(done, imu_lag, params.imu_lag_steps),
            dof_pos_lag_steps=jnp.where(done, dp_lag, params.dof_pos_lag_steps),
            dof_vel_lag_steps=jnp.where(done, dv_lag, params.dof_vel_lag_steps),
            dynamics=params.dynamics.replace(
                armature=jnp.where(m1, arm, params.dynamics.armature)),
        )

        zero12 = jnp.zeros((n, na))
        state = state.replace(
            phys=phys, params=params,
            actions=jnp.where(m1, 0.0, state.actions),
            last_actions=jnp.where(m1, 0.0, state.last_actions),
            last_last_actions=jnp.where(m1, 0.0, state.last_last_actions),
            last_dof_vel=jnp.where(m1, 0.0, state.last_dof_vel),
            last_root_vel=jnp.where(m1, 0.0, state.last_root_vel),
            feet_air_time=jnp.where(m1, 0.0, state.feet_air_time),
            episode_length=jnp.where(done, 0, state.episode_length),
            phase_length=jnp.where(done, 0, state.phase_length),
            gait_start=jnp.where(
                done,
                jax.random.randint(ks[5], (n,), 0, 2).astype(jnp.float32) * 0.5,
                state.gait_start),
            lag_buffer=jnp.where(done[:, None, None], 0.0, state.lag_buffer),
            dof_lag_buffer=jnp.where(done[:, None, None], 0.0, state.dof_lag_buffer),
            imu_lag_buffer=jnp.where(done[:, None, None], 0.0, state.imu_lag_buffer),
            obs_hist=jnp.where(done[:, None], 0.0, state.obs_hist).astype(jnp.bfloat16),
            critic_hist=jnp.where(done[:, None], 0.0, state.critic_hist).astype(jnp.bfloat16),
            episode_sums=jnp.where(m1, 0.0, state.episode_sums),
        )

        # new gait schedule + boundary resample (episode_length==0 matches
        # gait_time[:,0]==0, so freshly reset envs get walking commands)
        state = self._generate_gait_time(state, ks[6], done)
        state = self._resample_gait_commands(state, ks[7])
        return state

    def _build_extras(self, state: EnvState, done) -> Dict[str, jnp.ndarray]:
        n_done = jnp.sum(done)
        sums_done = jnp.sum(jnp.where(done[:, None], state.episode_sums, 0.0), axis=0)
        # net displacement from the episode origin at termination — direct
        # evidence of walking competence (the terrain curriculum's promote
        # rule reads the same quantity, legged_robot.py:1144)
        walked = jnp.linalg.norm(
            state.phys.base_pos[:, :2] - state.env_origin[:, :2], axis=-1)
        extras = {
            "time_outs": state.time_out_buf,
            "done_count": n_done,
            # per-term mean episode reward over done envs, per second
            "episode_sums_done": sums_done / self.max_episode_length_s,
            "episode_length_sum": jnp.sum(jnp.where(done, state.episode_length, 0)),
            "walked_distance_sum": jnp.sum(jnp.where(done, walked, 0.0)),
            "max_command_x": state.cmd_vx_range[1],
        }
        if self.custom_origins:
            extras["terrain_level_mean"] = jnp.mean(state.terrain_level.astype(jnp.float32))
        return extras
