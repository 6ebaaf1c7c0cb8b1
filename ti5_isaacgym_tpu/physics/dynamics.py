"""Articulated rigid-body dynamics (Featherstone ABA) in pure JAX.

This module is the TPU-native replacement for the PhysX articulation solver
behind the reference's ``gym.simulate`` (reference
``humanoid/envs/base/legged_robot.py:399-408``): generalized-coordinate
dynamics of a floating-base kinematic tree with single-axis revolute joints.

Design notes (TPU-first):
  * fixed topology -> the per-body recursions unroll at trace time (13 bodies
    for T1); every op is batched over envs by ``vmap``, so each unrolled step
    is a ``[num_envs, 6, 6]``-shaped fused VPU op — no dynamic control flow,
    no host round-trips, scan-compatible.
  * the floating base is handled natively by the ABA inward pass ending in a
    single 6x6 solve; revolute joints need only scalar divisions.
  * gravity enters as an explicit per-body spatial force (exact), so no
    fictitious base-acceleration bookkeeping is needed.
  * per-env physical parameters (mass/CoM/inertia/armature) are *data*
    (:class:`DynamicsParams`), so domain randomization is a PRNG sample, not
    a recompile (the reference randomizes them through actor property setters,
    ``legged_robot.py:852-939``).

State convention: base orientation quaternion ``(w,x,y,z)``; base spatial
velocity ``[omega_body(3), v_origin_body(3)]`` expressed in the base frame
(Plücker, Featherstone ordering).  World-frame root velocities (the
reference's ``root_states[:, 7:13]`` view) are derived quantities.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp
from flax import struct

from . import spatial as sp
from .model import RobotModel


@struct.dataclass
class DynamicsParams:
    """Per-environment physical parameters (leading batch dims allowed)."""

    mass: jnp.ndarray      # (..., nb)
    com: jnp.ndarray       # (..., nb, 3)
    inertia: jnp.ndarray   # (..., nb, 3, 3) about CoM
    armature: jnp.ndarray  # (..., num_dof)

    def spatial_inertia(self) -> jnp.ndarray:
        """(..., nb, 6, 6) spatial inertia of each body about its frame origin."""
        return sp.spatial_inertia(self.mass, self.com, self.inertia)


def nominal_params(model: RobotModel) -> DynamicsParams:
    return DynamicsParams(
        mass=model.mass,
        com=model.com,
        inertia=model.inertia,
        armature=jnp.zeros((model.num_dof,), jnp.float32),
    )


class BodyFrames(NamedTuple):
    """World pose & body-frame spatial velocity of every body (single env)."""

    pos: jnp.ndarray    # (nb, 3) world position of body-frame origin
    rot: jnp.ndarray    # (nb, 3, 3) world_from_body rotation
    vel: jnp.ndarray    # (nb, 6) spatial velocity in body frame [w, v]


def _rel_transforms(model: RobotModel, qpos: jnp.ndarray):
    """Pose of body i's frame in its parent's frame: (R_pc (nb,3,3), p_pc (nb,3))."""
    ang = jnp.concatenate([jnp.zeros((1,), qpos.dtype), qpos])  # (nb,)
    Rj = sp.quat_to_mat(sp.quat_from_axis_angle(model.joint_axis, ang))
    return sp.mm(model.joint_rot, Rj), model.joint_pos


def fk(model: RobotModel, base_pos: jnp.ndarray, base_quat: jnp.ndarray,
       base_vel: jnp.ndarray, qpos: jnp.ndarray, qvel: jnp.ndarray) -> BodyFrames:
    """Forward kinematics + velocity propagation for one environment."""
    R_pc, p_pc = _rel_transforms(model, qpos)
    nb = model.nb
    pos = [base_pos]
    rot = [sp.quat_to_mat(base_quat)]
    vel = [base_vel]
    for i in range(1, nb):
        p = int(model.parent[i])
        rot.append(sp.mm(rot[p], R_pc[i]))
        pos.append(pos[p] + sp.mv(rot[p], p_pc[i]))
        w_p, v_p = vel[p][..., :3], vel[p][..., 3:]
        w_c = sp.mtv(R_pc[i], w_p) + model.joint_axis[i] * qvel[i - 1]
        v_c = sp.mtv(R_pc[i], v_p + jnp.cross(w_p, p_pc[i]))
        vel.append(jnp.concatenate([w_c, v_c], axis=-1))
    return BodyFrames(pos=jnp.stack(pos), rot=jnp.stack(rot), vel=jnp.stack(vel))


def body_world_vel(frames: BodyFrames) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """World-frame (linvel, angvel) of each body-frame origin: (nb,3), (nb,3)."""
    v = sp.mv(frames.rot, frames.vel[..., 3:])
    w = sp.mv(frames.rot, frames.vel[..., :3])
    return v, w


def point_world(frames: BodyFrames, body: jnp.ndarray, p_local: jnp.ndarray):
    """World position & velocity of body-fixed points.

    body: (np,) int32 body ids; p_local: (np, 3).  Returns (np,3), (np,3).
    """
    R = frames.rot[body]
    x = frames.pos[body]
    pw = x + sp.mv(R, p_local)
    wv = frames.vel[body]
    v_local = wv[..., 3:] + jnp.cross(wv[..., :3], p_local)
    vw = sp.mv(R, v_local)
    return pw, vw


def aba(
    model: RobotModel,
    params: DynamicsParams,
    frames: BodyFrames,
    qvel: jnp.ndarray,
    tau: jnp.ndarray,
    f_ext_world: Optional[jnp.ndarray] = None,
    gravity: float = -9.81,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Articulated-body forward dynamics for one environment.

    Args:
      frames: output of :func:`fk` at the current state.
      qvel: (num_dof,) joint velocities.
      tau: (num_dof,) joint torques.
      f_ext_world: optional (nb, 6) external spatial force per body about the
        body-frame origin, expressed in world coordinates ([torque, force]).
      gravity: world z gravity.

    Returns:
      (a_base, qdd): base spatial acceleration (6,) in base frame (coordinate
      time-derivative of the base spatial velocity), joint accels (num_dof,).
    """
    nb = model.nb
    dtype = frames.pos.dtype
    I_sp = params.spatial_inertia()
    g = jnp.array([0.0, 0.0, gravity], dtype=dtype)

    # Relative transforms from the already-computed world frames.
    R_pc, p_pc, X = [None] * nb, [None] * nb, [None] * nb
    for i in range(1, nb):
        p = int(model.parent[i])
        R_pc[i] = sp.mm(sp.transpose(frames.rot[p]), frames.rot[i])
        p_pc[i] = sp.mtv(frames.rot[p], frames.pos[i] - frames.pos[p])
        # motion transform parent->child coords: v_c = X v_p
        X[i] = sp.xform(sp.transpose(R_pc[i]), p_pc[i])

    # Pass 1 (outward): bias terms.  Gravity is handled by computing all
    # accelerations relative to free fall (exactly equivalent for a uniform
    # field) instead of as per-body forces — this keeps the large mg terms
    # out of the pA/IA accumulations, which would otherwise lose ~3 decimal
    # digits to cancellation in float32 (TPUs have no f64).
    c_bias, pA, IA = [None] * nb, [None] * nb, [None] * nb
    for i in range(nb):
        v = frames.vel[i]
        if i == 0:
            c_bias[i] = jnp.zeros((6,), dtype)
        else:
            vJ = jnp.concatenate([model.joint_axis[i] * qvel[i - 1], jnp.zeros((3,), dtype)])
            c_bias[i] = sp.mv(sp.crm(v), vJ)
        pA[i] = sp.mv(sp.crf(v), sp.mv(I_sp[i], v))
        if f_ext_world is not None:
            pA[i] = pA[i] - jnp.concatenate([
                sp.mtv(frames.rot[i], f_ext_world[i, :3]),
                sp.mtv(frames.rot[i], f_ext_world[i, 3:]),
            ], axis=-1)
        IA[i] = I_sp[i]

    # Pass 2 (inward): articulated inertias.
    U, d, u = [None] * nb, [None] * nb, [None] * nb
    S = model.joint_axis  # angular part of the motion subspace; linear part 0
    for i in range(nb - 1, 0, -1):
        p = int(model.parent[i])
        Si = jnp.concatenate([S[i], jnp.zeros((3,), dtype)])
        U[i] = sp.mv(IA[i], Si)
        d[i] = jnp.sum(Si * U[i], axis=-1) + params.armature[i - 1]
        u[i] = tau[i - 1] - jnp.sum(Si * pA[i], axis=-1)
        Ia = IA[i] - U[i][..., :, None] * U[i][..., None, :] / d[i]
        pa = pA[i] + sp.mv(Ia, c_bias[i]) + U[i] * (u[i] / d[i])
        IA[p] = IA[p] + sp.mm(sp.transpose(X[i]), sp.mm(Ia, X[i]))
        pA[p] = pA[p] + sp.mtv(X[i], pa)

    # Base 6x6 solve (accelerations relative to free fall).
    a = [None] * nb
    a[0] = sp.cho_solve_psd(IA[0] + 1e-9 * jnp.eye(6, dtype=dtype), -pA[0])

    # Pass 3 (outward): joint accelerations (frame-invariant, so the
    # free-fall-relative propagation yields the true qdd directly).
    qdd = [None] * (nb - 1)
    for i in range(1, nb):
        p = int(model.parent[i])
        Si = jnp.concatenate([S[i], jnp.zeros((3,), dtype)])
        ai = sp.mv(X[i], a[p]) + c_bias[i]
        qdd[i - 1] = (u[i] - jnp.sum(U[i] * ai, axis=-1)) / d[i]
        a[i] = ai + Si * qdd[i - 1]

    # Convert the base acceleration back to the true (gravity-included) frame.
    a0 = a[0] + jnp.concatenate([jnp.zeros((3,), dtype), sp.mtv(frames.rot[0], g)], axis=-1)
    return a0, jnp.stack(qdd, axis=-1)


def integrate(
    base_pos: jnp.ndarray,
    base_quat: jnp.ndarray,
    base_vel: jnp.ndarray,
    qpos: jnp.ndarray,
    qvel: jnp.ndarray,
    a_base: jnp.ndarray,
    qdd: jnp.ndarray,
    dt: float,
):
    """Semi-implicit Euler: update velocities first, then configuration.

    The base configuration update uses the body-frame exponential map for the
    orientation (exact for constant omega over the step, keeps unit norm at
    the 1 kHz physics rate; reference runs PhysX at the same rate,
    ``t1_dh_stand_config.py:160``).
    """
    base_vel_n = base_vel + dt * a_base
    qvel_n = qvel + dt * qdd
    # body-frame angular velocity -> right-multiplied increment
    w_b = base_vel_n[:3]
    ang = jnp.linalg.norm(w_b) + 1e-12
    dq = sp.quat_from_axis_angle(w_b / ang, ang * dt)
    base_quat_n = sp.quat_normalize(sp.quat_mul(base_quat, dq))
    # origin velocity is the linear part of the body-frame spatial velocity
    base_pos_n = base_pos + dt * sp.quat_rotate(base_quat_n, base_vel_n[3:])
    qpos_n = qpos + dt * qvel_n
    return base_pos_n, base_quat_n, base_vel_n, qpos_n, qvel_n
