"""The simulation engine: one 1 kHz physics substep, single env, pure function.

Replaces the reference's per-substep native round trip
(``gym.set_dof_actuation_force_tensor`` -> ``gym.simulate`` -> ``refresh``,
reference ``legged_robot.py:399-434``) with a fused, jit-compiled pipeline:
FK -> contact -> joint-limit penalties -> ABA -> semi-implicit Euler.  The env
layer vmaps this over environments and `lax.scan`s it over the decimation
loop, so a full 10-substep policy step is one XLA program with zero host
involvement.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from . import contact as ct
from . import dynamics as dyn
from .model import RobotModel


@struct.dataclass
class PhysicsState:
    """Generalized state of one robot (leading batch dims allowed via vmap).

    ``cp_anchor`` is the friction stick-anchor memory (see
    :class:`~ti5_isaacgym_tpu.physics.contact.ContactOpts`); it is part of the
    dynamical state and must be reset together with the pose.
    """

    base_pos: jnp.ndarray   # (3,)
    base_quat: jnp.ndarray  # (4,) wxyz
    base_vel: jnp.ndarray   # (6,) spatial [w, v] in base frame
    qpos: jnp.ndarray       # (num_dof,)
    qvel: jnp.ndarray       # (num_dof,)
    cp_anchor: jnp.ndarray  # (ncp, 3) friction anchors (world)


def init_state(model: RobotModel, base_pos, base_quat, qpos,
               base_vel=None, qvel=None) -> PhysicsState:
    ncp = model.cp_pos.shape[0]
    return PhysicsState(
        base_pos=jnp.asarray(base_pos, jnp.float32),
        base_quat=jnp.asarray(base_quat, jnp.float32),
        base_vel=jnp.zeros(6, jnp.float32) if base_vel is None else jnp.asarray(base_vel, jnp.float32),
        qpos=jnp.asarray(qpos, jnp.float32),
        qvel=jnp.zeros(model.num_dof, jnp.float32) if qvel is None else jnp.asarray(qvel, jnp.float32),
        cp_anchor=jnp.zeros((ncp, 3), jnp.float32),
    )


@struct.dataclass
class SolverOpts:
    dt: float = struct.field(pytree_node=False, default=0.001)
    gravity: float = struct.field(pytree_node=False, default=-9.81)
    limit_kp: float = struct.field(pytree_node=False, default=500.0)
    limit_kd: float = struct.field(pytree_node=False, default=10.0)
    max_qvel: float = struct.field(pytree_node=False, default=50.0)


def root_world_vel(state: PhysicsState) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """World-frame (linvel, angvel) of the base — the reference's
    ``root_states[:, 7:13]`` view."""
    from . import spatial as sp

    v = sp.quat_rotate(state.base_quat, state.base_vel[..., 3:])
    w = sp.quat_rotate(state.base_quat, state.base_vel[..., :3])
    return v, w


def set_root_world_vel(state: PhysicsState, linvel_w, angvel_w) -> PhysicsState:
    """Inverse of :func:`root_world_vel` (used by the push-robots event which
    *sets* base velocities, reference ``t1_dh_stand_env.py:217-231``)."""
    from . import spatial as sp

    v = sp.quat_rotate_inverse(state.base_quat, linvel_w)
    w = sp.quat_rotate_inverse(state.base_quat, angvel_w)
    return state.replace(base_vel=jnp.concatenate([w, v], axis=-1))


def _limit_torque(model: RobotModel, opts: SolverOpts, qpos, qvel):
    over = jnp.maximum(qpos - model.dof_upper, 0.0)
    under = jnp.maximum(model.dof_lower - qpos, 0.0)
    tau = -opts.limit_kp * over + opts.limit_kp * under
    in_violation = (over > 0) | (under > 0)
    return tau - jnp.where(in_violation, opts.limit_kd * qvel, 0.0)


def substep(
    model: RobotModel,
    params: dyn.DynamicsParams,
    terrain: ct.HeightField,
    copts: ct.ContactOpts,
    sopts: SolverOpts,
    state: PhysicsState,
    tau: jnp.ndarray,
    friction: jnp.ndarray,
    cp_meff: Optional[jnp.ndarray] = None,
    base_force_w: Optional[jnp.ndarray] = None,
    base_torque_w: Optional[jnp.ndarray] = None,
    restitution: Optional[jnp.ndarray] = None,
) -> Tuple[PhysicsState, jnp.ndarray]:
    """Advance one env by one physics substep.

    Args:
      tau: (num_dof,) actuation torques.
      friction: scalar per-env ground friction coefficient.
      cp_meff: (ncp, 2) apparent normal/tangential mass per contact point
        (see :func:`probe_contact_masses`); falls back to the body's mass.
      base_force_w / base_torque_w: optional (3,) external wrench on the base
        in world coordinates (the ``apply_rigid_body_force_tensors`` analogue,
        reference ``t1_dh_stand_env.py:233-247``).

    Returns:
      (next state, per-body net contact force (nb, 3) in world coordinates —
      the ``net_contact_force_tensor`` analogue).
    """
    frames = dyn.fk(model, state.base_pos, state.base_quat, state.base_vel,
                    state.qpos, state.qvel)
    # contact
    if cp_meff is None:
        cp_meff = jnp.stack([model.mass[model.cp_body]] * 2, axis=-1)
    p_w, v_w = dyn.point_world(frames, model.cp_body, model.cp_pos)
    f_pts, _, new_anchor = ct.point_contact_forces(
        terrain, copts, p_w, v_w, state.cp_anchor, friction, cp_meff,
        restitution=restitution)
    nb = model.nb
    body_f = jax.ops.segment_sum(f_pts, model.cp_body, num_segments=nb)
    arm = p_w - frames.pos[model.cp_body]
    body_tq = jax.ops.segment_sum(jnp.cross(arm, f_pts), model.cp_body, num_segments=nb)
    f_ext = jnp.concatenate([body_tq, body_f], axis=-1)  # (nb, 6) world
    if base_force_w is not None:
        wrench = jnp.concatenate([base_torque_w, base_force_w])
        f_ext = f_ext.at[0].add(wrench)

    # actuator torques can never exceed the URDF effort limits (the PhysX
    # actuation pipeline enforces the same bound); keeps the integrator sane
    # under adversarial inputs.
    tau = jnp.clip(tau, -model.dof_effort, model.dof_effort)
    tau_total = tau + _limit_torque(model, sopts, state.qpos, state.qvel)
    a0, qdd = dyn.aba(model, params, frames, state.qvel, tau_total, f_ext,
                      gravity=sopts.gravity)
    bp, bq, bv, qp, qv = dyn.integrate(
        state.base_pos, state.base_quat, state.base_vel, state.qpos, state.qvel,
        a0, qdd, sopts.dt,
    )
    qv = jnp.clip(qv, -sopts.max_qvel, sopts.max_qvel)
    # PhysX-style base velocity caps (mirrors engine_core.substep_stacked)
    bv = jnp.clip(bv, -sopts.max_qvel, sopts.max_qvel)
    # hard joint stops (mirrors engine_core.substep_stacked): PhysX holds the
    # URDF limits as rigid constraints; project and kill limit-ward velocity
    hit_up = qp > model.dof_upper
    hit_lo = qp < model.dof_lower
    qv = jnp.where(hit_up, jnp.minimum(qv, 0.0),
                   jnp.where(hit_lo, jnp.maximum(qv, 0.0), qv))
    qp = jnp.clip(qp, model.dof_lower, model.dof_upper)
    return PhysicsState(base_pos=bp, base_quat=bq, base_vel=bv, qpos=qp, qvel=qv,
                        cp_anchor=new_anchor), body_f


def probe_contact_masses(
    model: RobotModel,
    params: dyn.DynamicsParams,
    state: PhysicsState,
    directions=((1.0, 0.0, 0.0), (0.0, 1.0, 0.0), (0.0, 0.0, 1.0)),
) -> jnp.ndarray:
    """Apparent (articulated) mass of each collision point, (ncp, 2).

    For each point, applies a unit test force along each probe direction,
    runs the exact articulated-body dynamics, and measures the point's
    resulting acceleration; the apparent mass is the reciprocal.  Column 0 is
    the mass along the last probe direction (the contact normal, +z); column
    1 the minimum over the other (tangential) directions — conservative, so
    the implicit-rate contact stays stable for the softest direction.
    Called once at env construction — not in the hot path.
    """
    import numpy as np

    ncp = model.cp_pos.shape[0]
    ndir = len(directions)
    # host constants: under multi-process SPMD a jnp creation op yields a
    # GLOBAL array that cannot be closed over by this jit
    dirs = np.asarray(directions, np.float32)                        # (ndir, 3)
    zero_tau = np.zeros((model.num_dof,), np.float32)

    @jax.jit
    def _probe() -> jnp.ndarray:
        frames = dyn.fk(model, state.base_pos, state.base_quat, state.base_vel,
                        state.qpos, state.qvel)
        p_w, pv0 = dyn.point_world(frames, model.cp_body, model.cp_pos)
        arm = p_w - frames.pos[model.cp_body]                        # (ncp, 3)
        a0_0, qdd_0 = dyn.aba(model, params, frames, state.qvel, zero_tau,
                              None, gravity=0.0)

        cp_body_j = jnp.asarray(model.cp_body)

        def one(p_idx, d):
            torque = jnp.cross(arm[p_idx], d)
            f_ext = jnp.zeros((model.nb, 6), jnp.float32).at[cp_body_j[p_idx]].set(
                jnp.concatenate([torque, d]))
            a0_f, qdd_f = dyn.aba(model, params, frames, state.qvel, zero_tau,
                                  f_ext, gravity=0.0)
            # finite-difference the point velocity under the velocity update
            fr2 = dyn.fk(model, state.base_pos, state.base_quat,
                         state.base_vel + (a0_f - a0_0), state.qpos,
                         state.qvel + (qdd_f - qdd_0))
            pv2 = dyn.point_world(fr2, model.cp_body, model.cp_pos)[1][p_idx]
            return jnp.dot(pv2 - pv0[p_idx], d)

        idx = jnp.arange(ncp)
        inv_m = jax.vmap(lambda p: jax.vmap(lambda d: one(p, d))(dirs))(idx)
        inv_m = jnp.maximum(inv_m, 1e-6)                             # (ncp, ndir)
        m_all = 1.0 / inv_m
        m = jnp.stack([m_all[:, ndir - 1], jnp.min(m_all[:, : ndir - 1], axis=1)], axis=-1)
        # points sharing a body also share its apparent mass: divide so the
        # combined same-body impulse stays within the stable budget
        counts = jnp.bincount(jnp.asarray(model.cp_body), length=model.nb)
        return m / counts[model.cp_body].astype(m.dtype)[:, None]

    return _probe()
