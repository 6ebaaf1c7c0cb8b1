"""Generic legged-robot environment machinery (the reference's L2 layer).

Pure batched functions reimplementing the behavioral contract of the
reference's ``LeggedRobot`` (``humanoid/envs/base/legged_robot.py``): domain
randomization sampling, PD torque law with actuator lag, terrain/command
curricula, termination, and reset-state sampling — all expressed over
``[num_envs, ...]`` arrays so the task layer can compose them under ``jit``.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..configs.t1_dh_stand import T1EnvCfg
from ..physics import dynamics as dyn
from ..physics.model import RobotModel
from .types import EnvParams


def _u(key, shape, lo, hi):
    return jax.random.uniform(key, shape, minval=lo, maxval=hi)


# ---------------------------------------------------------------------------
# Domain randomization (reference legged_robot.py:692-783, 852-885)
# ---------------------------------------------------------------------------


def sample_rigid_body_params(cfg: T1EnvCfg, model: RobotModel, key, n: int) -> Tuple[dyn.DynamicsParams, jnp.ndarray, jnp.ndarray]:
    """Creation-time randomization: friction buckets, base payload/CoM, link
    mass scales.  Returns (dynamics params w/o armature set, friction, body_mass)."""
    dr = cfg.domain_rand
    ks = jax.random.split(key, 6)
    nb = model.nb

    mass = jnp.broadcast_to(model.mass, (n, nb))
    com = jnp.broadcast_to(model.com, (n, nb, 3))
    inertia = jnp.broadcast_to(model.inertia, (n, nb, 3, 3))

    if dr.randomize_base_mass:
        payload = _u(ks[0], (n,), *dr.added_mass_range)
        mass = mass.at[:, 0].add(payload)
    if dr.randomize_link_mass:
        scale = _u(ks[1], (n, nb - 1), *dr.added_link_mass_range)
        mass = mass.at[:, 1:].multiply(scale)
        inertia = inertia.at[:, 1:].multiply(scale[..., None, None])
    if dr.randomize_com:
        r = jnp.asarray(dr.com_displacement_range)
        disp = _u(ks[2], (n, 3), r[:, 0], r[:, 1])
        com = com.at[:, 0, :].add(disp)

    if dr.randomize_friction:
        # friction + restitution buckets (reference :797-824): 256 quantized
        # value pairs, both drawn through the SAME per-env bucket id exactly
        # like the reference's `bucket_ids` indexing both bucket tables
        num_buckets = 256
        buckets = _u(ks[3], (num_buckets,), *dr.friction_range)
        rest_buckets = _u(ks[5], (num_buckets,), *dr.restitution_range)
        bucket_ids = jax.random.randint(ks[4], (n,), 0, num_buckets)
        friction = buckets[bucket_ids]
        restitution = rest_buckets[bucket_ids]
    else:
        friction = jnp.full((n,), cfg.terrain.static_friction)
        restitution = jnp.full((n,), cfg.terrain.restitution)

    body_mass = mass[:, 0]
    params = dyn.DynamicsParams(
        mass=mass, com=com, inertia=inertia,
        armature=jnp.zeros((n, model.num_dof), jnp.float32),
    )
    return params, friction, body_mass, restitution


def sample_dof_params(cfg: T1EnvCfg, key, n: int, p_gains_nom, d_gains_nom):
    """Per-reset randomization (reference ``randomize_dof_props``,
    ``legged_robot.py:732-783``): gains, motor offsets, coulomb/viscous,
    per-joint armature."""
    dr = cfg.domain_rand
    na = len(p_gains_nom)
    ks = jax.random.split(key, 6)
    if dr.randomize_gains:
        p = _u(ks[0], (n, na), *dr.stiffness_multiplier_range) * p_gains_nom
        d = _u(ks[1], (n, na), *dr.damping_multiplier_range) * d_gains_nom
    else:
        p = jnp.broadcast_to(p_gains_nom, (n, na))
        d = jnp.broadcast_to(d_gains_nom, (n, na))
    offs = (_u(ks[2], (n, na), *dr.motor_offset_range)
            if dr.randomize_motor_offset else jnp.zeros((n, na)))
    if dr.randomize_coulomb_friction:
        coulomb = _u(ks[3], (n, na), *dr.joint_coulomb_range)
        viscous = _u(ks[4], (n, na), *dr.joint_viscous_range)
    else:
        coulomb = jnp.zeros((n, na))
        viscous = jnp.zeros((n, na))
    if dr.randomize_joint_armature:
        if dr.randomize_joint_armature_each_joint:
            r = jnp.asarray(dr.joint_armature_ranges)        # (na, 2)
            arm = _u(ks[5], (n, na), r[:, 0], r[:, 1])
        else:
            arm = _u(ks[5], (n, 1), *dr.joint_armature_range) * jnp.ones((n, na))
    else:
        arm = jnp.zeros((n, na))
    return p, d, offs, coulomb, viscous, arm


def sample_lag_steps(cfg: T1EnvCfg, key, n: int):
    """(Re)sample every lag index (reference ``randomize_lag_props``,
    ``legged_robot.py:604-652``).  Where per-step re-randomization is on, the
    reset value is the range maximum — the reference resets
    ``last_X_lag_timestep`` to ``range[1]`` and the per-step resample
    (:func:`perstep_lag_update`) immediately replaces the index anyway."""
    dr = cfg.domain_rand
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)

    def pick(k, enabled, randomized, rng_range, perstep=False):
        if not enabled:
            return jnp.zeros((n,), jnp.int32)
        if perstep or not randomized:
            return jnp.full((n,), rng_range[1], jnp.int32)
        return jax.random.randint(k, (n,), rng_range[0], rng_range[1] + 1)

    lag = pick(k1, dr.add_lag, dr.randomize_lag_timesteps,
               dr.lag_timesteps_range, dr.randomize_lag_timesteps_perstep)
    dof_lag = pick(k2, dr.add_dof_lag, dr.randomize_dof_lag_timesteps,
                   dr.dof_lag_timesteps_range, dr.randomize_dof_lag_timesteps_perstep)
    imu_lag = pick(k3, dr.add_imu_lag, dr.randomize_imu_lag_timesteps,
                   dr.imu_lag_timesteps_range, dr.randomize_imu_lag_timesteps_perstep)
    dof_pos_lag = pick(k4, dr.add_dof_pos_vel_lag, dr.randomize_dof_pos_lag_timesteps,
                       dr.dof_pos_lag_timesteps_range,
                       dr.randomize_dof_pos_lag_timesteps_perstep)
    dof_vel_lag = pick(k5, dr.add_dof_pos_vel_lag, dr.randomize_dof_vel_lag_timesteps,
                       dr.dof_vel_lag_timesteps_range,
                       dr.randomize_dof_vel_lag_timesteps_perstep)
    return lag, dof_lag, imu_lag, dof_pos_lag, dof_vel_lag


def perstep_lag_update(key, last, rng_range):
    """Per-step lag re-randomization with the reference's causality clamp:
    a fresh uniform draw, but the index may grow by at most +1 from the
    previous step (a sensor cannot skip backwards in time), then becomes the
    new ``last`` (reference ``legged_robot.py:1038-1045`` /
    ``t1_dh_stand_env.py:408-443``)."""
    new = jax.random.randint(key, last.shape, rng_range[0], rng_range[1] + 1)
    return jnp.minimum(new, last + 1)


# ---------------------------------------------------------------------------
# Actuation (reference _compute_torques, legged_robot.py:1019-1074)
# ---------------------------------------------------------------------------


def push_ring(buf: jnp.ndarray, new: jnp.ndarray) -> jnp.ndarray:
    """Shift the lag ring buffer: index 0 = newest (reference buffer layout
    ``lag_buffer[:,:,0] = newest``, ``legged_robot.py:1034-1036``)."""
    return jnp.concatenate([new[..., None], buf[..., :-1]], axis=-1)


def read_ring(buf: jnp.ndarray, steps: jnp.ndarray) -> jnp.ndarray:
    """Per-env lagged read: buf [..., C, L], steps [...] -> [..., C].

    One-hot select-sum instead of ``take_along_axis``: a per-env dynamic
    index makes XLA:TPU scalarize the gather (one fragment per (env, channel)
    element — the same pathology as the update's 1-D gathers, BASELINE.md
    round-4), while the contraction is ONE fused VPU pass over the ring.
    Bit-exact for any ring contents: ``where`` keeps non-selected slots
    inert, so a NaN/Inf in a stale slot cannot poison the read the way a
    multiply-sum would (0*NaN=NaN — ADVICE r4)."""
    L = buf.shape[-1]
    sel = (steps[..., None] == jnp.arange(L, dtype=steps.dtype))
    return jnp.sum(jnp.where(sel[..., None, :], buf, jnp.zeros((), buf.dtype)),
                   axis=-1)


def compute_torques(cfg: T1EnvCfg, params: EnvParams, torque_limits, default_dof_pos,
                    lag_buffer, actions, qpos, qvel, key):
    """PD torque law with action lag, coulomb/viscous friction, and fresh
    per-substep torque-multiplier noise (the reference resamples
    ``torque_multi`` inside ``_compute_torques`` on every 1 kHz call,
    ``legged_robot.py:1069-1072`` — an intentional white-noise actuator gain).

    Returns ``(torques, lag_buffer, lag_steps)`` — ``lag_steps`` differs from
    ``params.lag_steps`` only under ``randomize_lag_timesteps_perstep``, where
    the action-lag index is re-drawn on every 1 kHz call with the causality
    clamp (reference ``legged_robot.py:1038-1045``)."""
    dr = cfg.domain_rand
    k_lag, k_noise = jax.random.split(key)
    actions_scaled = actions * cfg.control.action_scale
    lag_steps = params.lag_steps
    if dr.add_lag:
        lag_buffer = push_ring(lag_buffer, actions_scaled)
        if dr.randomize_lag_timesteps and dr.randomize_lag_timesteps_perstep:
            lag_steps = perstep_lag_update(k_lag, lag_steps, dr.lag_timesteps_range)
        lagged = read_ring(lag_buffer, lag_steps)
    else:
        lagged = actions_scaled
    torques = (params.p_gains * (lagged + default_dof_pos - qpos + params.motor_offsets)
               - params.d_gains * qvel)
    if dr.randomize_coulomb_friction:
        torques = torques - params.joint_viscous * qvel - params.joint_coulomb * jnp.sign(qvel)
    if dr.randomize_torque:
        mult = _u(k_noise, actions.shape, *dr.torque_multiplier_range)
        torques = torques * mult
    return jnp.clip(torques, -torque_limits, torque_limits), lag_buffer, lag_steps


# ---------------------------------------------------------------------------
# Curricula (reference legged_robot.py:1138-1169)
# ---------------------------------------------------------------------------


def terrain_curriculum_update(cfg: T1EnvCfg, key, done, base_xy, env_origin,
                              commands, terrain_level, terrain_type, terrain_origins):
    """Game-inspired terrain curriculum, applied to done envs (masked)."""
    max_level = cfg.terrain.num_rows
    distance = jnp.linalg.norm(base_xy - env_origin[:, :2], axis=-1)
    move_up = distance > cfg.terrain.terrain_length / 2.0
    cmd_dist = jnp.linalg.norm(commands[:, :2], axis=-1) * cfg.env.episode_length_s * 0.5
    move_down = (distance < cmd_dist) & (~move_up)
    new_level = terrain_level + move_up.astype(jnp.int32) - move_down.astype(jnp.int32)
    rand_level = jax.random.randint(key, terrain_level.shape, 0, max_level)
    new_level = jnp.where(new_level >= max_level, rand_level, jnp.maximum(new_level, 0))
    new_level = jnp.where(done, new_level, terrain_level)
    new_origin = terrain_origins[new_level, terrain_type]
    new_origin = jnp.where(done[:, None], new_origin, env_origin)
    return new_level, new_origin


def command_curriculum_update(cfg: T1EnvCfg, done, common_step, episode_sums_tracking,
                              cmd_vx_range, max_episode_length: float,
                              tracking_scale_dt: float, axis_name=None):
    """Widen lin_vel_x when tracking reward > 80% of max — evaluated only when
    ``common_step % max_episode_length == 0`` (reference ``legged_robot.py:537,
    1160-1169``)."""
    if not cfg.commands.curriculum:
        return cmd_vx_range
    n_done = jnp.sum(done)
    track_sum = jnp.sum(jnp.where(done, episode_sums_tracking, 0.0))
    if axis_name is not None:
        n_done = jax.lax.psum(n_done, axis_name)
        track_sum = jax.lax.psum(track_sum, axis_name)
    mean_track = track_sum / jnp.maximum(n_done, 1)
    trigger = ((common_step % jnp.int32(max_episode_length)) == 0) & (n_done > 0)
    improve = (mean_track / max_episode_length) > (0.8 * tracking_scale_dt)
    mc = cfg.commands.max_curriculum
    widened = jnp.stack([
        jnp.clip(cmd_vx_range[0] - 0.25, -mc / 2.0, 0.0),
        jnp.clip(cmd_vx_range[1] + 0.5, 0.0, mc),
    ])
    return jnp.where(trigger & improve, widened, cmd_vx_range)


# ---------------------------------------------------------------------------
# Reset sampling (reference _reset_dofs / _reset_root_states,
# legged_robot.py:1076-1120)
# ---------------------------------------------------------------------------


def sample_reset_dofs(cfg: T1EnvCfg, key, n: int, default_dof_pos):
    q = default_dof_pos + _u(key, (n, default_dof_pos.shape[-1]), -0.1, 0.1)
    return q, jnp.zeros_like(q)


def sample_reset_root(cfg: T1EnvCfg, key, n: int, env_origin, custom_origins: bool):
    pos = jnp.asarray(cfg.init_state.pos) + env_origin
    if custom_origins:
        if cfg.terrain.curriculum:
            jitter = _u(key, (n, 2), -cfg.terrain.platform / 3.0, cfg.terrain.platform / 3.0)
        else:
            jitter = _u(key, (n, 2), -cfg.terrain.terrain_length / 2.0,
                        cfg.terrain.terrain_length / 2.0)
        pos = pos.at[:, :2].add(jitter)
    return pos
