"""Environment state pytrees.

The whole environment is a pure function over these states (SURVEY.md §7
design stance): every field is a ``[num_envs, ...]`` array; resets are
``jnp.where`` masking, never in-place indexed writes.  The fields mirror the
reference's buffer inventory (reference ``legged_robot.py:116-349`` and
``t1_dh_stand_env.py:562-569``) so that reset semantics can be checked
one-to-one.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from ..physics.dynamics import DynamicsParams
from ..physics.engine import PhysicsState


@struct.dataclass
class EnvParams:
    """Per-env randomized physical/actuation parameters (resampled per the
    reference's schedule: rigid-body props at creation, dof props at reset)."""

    dynamics: DynamicsParams          # mass/com/inertia [N,nb,...], armature [N,12]
    friction: jnp.ndarray             # [N] ground friction coefficient
    restitution: jnp.ndarray          # [N] contact restitution (bucketed w/ friction)
    body_mass: jnp.ndarray            # [N] base mass incl. payload (priv obs)
    p_gains: jnp.ndarray              # [N,12] randomized Kp
    d_gains: jnp.ndarray              # [N,12] randomized Kd
    motor_offsets: jnp.ndarray        # [N,12]
    joint_coulomb: jnp.ndarray        # [N,12]
    joint_viscous: jnp.ndarray        # [N,12]
    lag_steps: jnp.ndarray            # [N] action lag (1 kHz substeps)
    dof_lag_steps: jnp.ndarray        # [N] dof sensor lag (pos+vel shared)
    imu_lag_steps: jnp.ndarray        # [N] imu lag
    dof_pos_lag_steps: jnp.ndarray    # [N] separate dof-pos sensor lag
    dof_vel_lag_steps: jnp.ndarray    # [N] separate dof-vel sensor lag


@struct.dataclass
class EnvState:
    """Full environment state for the vectorized task."""

    phys: PhysicsState                # batched physics state
    params: EnvParams
    rng: jnp.ndarray                  # PRNG key (single, split deterministically)
    # terrain height map as a runtime argument rather than a trace-time
    # closure constant: embedding the multi-MB array as an HLO constant
    # inflates compile time enormously
    terrain_height: jnp.ndarray       # [rows, cols] meters

    # episode machinery
    episode_length: jnp.ndarray       # [N] int32
    phase_length: jnp.ndarray         # [N] int32
    gait_start: jnp.ndarray           # [N] float (0 or 0.5)
    gait_time: jnp.ndarray            # [N, n_gaits] int32 segment boundaries
    commands: jnp.ndarray             # [N, 4] vx, vy, wyaw, heading
    common_step: jnp.ndarray          # scalar int32 (shared step counter)

    # curricula
    terrain_level: jnp.ndarray        # [N] int32
    terrain_type: jnp.ndarray         # [N] int32
    env_origin: jnp.ndarray           # [N, 3]
    cmd_vx_range: jnp.ndarray         # [2] curriculum-widened lin_vel_x range

    # control / history buffers
    actions: jnp.ndarray              # [N,12]
    last_actions: jnp.ndarray         # [N,12]
    last_last_actions: jnp.ndarray    # [N,12]
    torques: jnp.ndarray              # [N,12] (last substep)
    last_dof_vel: jnp.ndarray         # [N,12]
    last_root_vel: jnp.ndarray        # [N,6] world lin+ang
    lag_buffer: jnp.ndarray           # [N,12,L+1] action lag ring
    dof_lag_buffer: jnp.ndarray       # [N,24,L+1] dof pos+vel lag ring
    imu_lag_buffer: jnp.ndarray       # [N,6,L+1] angvel+euler lag ring

    # contact / gait trackers
    contact_forces: jnp.ndarray       # [N,nb,3] world (net, last substep)
    feet_air_time: jnp.ndarray        # [N,2]
    last_contacts: jnp.ndarray        # [N,2] bool
    feet_height: jnp.ndarray          # [N,2] swing-height accumulator
    last_feet_z: jnp.ndarray          # [N,2]

    # reference motion (computed during obs, consumed by next step's rewards —
    # matching the reference's call order, see t1 env module)
    ref_dof_pos: jnp.ndarray          # [N,12]
    ref_action: jnp.ndarray           # [N,12]

    # perturbation events
    push_force: jnp.ndarray           # [N,3] velocity-push values
    push_torque: jnp.ndarray          # [N,3]
    ext_force: jnp.ndarray            # [N,3] sampled external base force (obs)
    ext_torque: jnp.ndarray           # [N,3]
    ext_force_apply: jnp.ndarray      # [N,3] wrench actually applied next step
    ext_torque_apply: jnp.ndarray     # [N,3]
    is_first_push: jnp.ndarray        # scalar bool
    is_first_add_force: jnp.ndarray   # scalar bool

    # observation history — stored FLAT [N, stack*frame] in bfloat16: a
    # [N,66,47] layout would pad the 47-lane minor dim to 128 on TPU (3x the
    # HBM traffic of the per-step roll), and bf16 halves it again.  The flat
    # buffer IS the policy observation (oldest frame first); noise is already
    # injected per frame, so bf16 rounding is far below the obs noise floor.
    obs_hist: jnp.ndarray             # [N, 66*47] oldest first, bf16
    critic_hist: jnp.ndarray          # [N, 3*73] oldest first, bf16

    # logging
    episode_sums: jnp.ndarray         # [N, n_reward_terms]
    reset_buf: jnp.ndarray            # [N] bool
    time_out_buf: jnp.ndarray         # [N] bool
