"""Robot model description for the TPU-native articulated-body engine.

A :class:`RobotModel` is a pytree of static arrays describing a fixed-topology
kinematic tree: one floating base (body 0) plus single-DoF revolute joints.
It is produced from a JSON model spec (itself extracted from a URDF by
``tools/extract_model.py`` — the TPU-native replacement for the reference's
``gym.load_asset`` / asset-property API surface, reference
``humanoid/envs/base/legged_robot.py:1304-1320``).

Fixed joints are collapsed at extraction time (the reference relies on Isaac
Gym's ``collapse_fixed_joints=True`` for the same effect; see reference
``humanoid/envs/base/legged_robot_config.py`` asset options), so the T1 model
is 13 bodies / 12 revolute joints.

Everything that domain randomization touches (masses, CoMs, inertias,
armature, friction) is carried *per environment* in
:class:`~ti5_isaacgym_tpu.physics.engine.DynamicsParams`, not here.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, List

import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class RobotModel:
    """Static (trace-time constant) robot description.

    All arrays are indexed by body ``i`` in topological order; body 0 is the
    floating base.  Joint ``i`` (i >= 1) connects ``parent[i]`` to body ``i``.
    """

    # tree
    parent: jnp.ndarray = struct.field(pytree_node=False)      # (nb,) int, parent[0] = -1
    joint_pos: jnp.ndarray                                      # (nb, 3) joint origin in parent frame
    joint_rot: jnp.ndarray                                      # (nb, 3, 3) joint frame rot in parent frame
    joint_axis: jnp.ndarray                                     # (nb, 3) revolute axis in child frame
    # inertial (nominal; DR overrides live in DynamicsParams)
    mass: jnp.ndarray                                           # (nb,)
    com: jnp.ndarray                                            # (nb, 3)
    inertia: jnp.ndarray                                        # (nb, 3, 3) about CoM
    # actuation / limits (joint i >= 1 maps to dof i-1)
    dof_lower: jnp.ndarray                                      # (nv_j,)
    dof_upper: jnp.ndarray                                      # (nv_j,)
    dof_effort: jnp.ndarray                                     # (nv_j,)
    dof_velocity: jnp.ndarray                                   # (nv_j,)
    # collision points
    cp_body: jnp.ndarray = struct.field(pytree_node=False)      # (ncp,) int body index
    cp_pos: jnp.ndarray                                         # (ncp, 3) point in body frame
    # named index sets (static python metadata)
    nb: int = struct.field(pytree_node=False)
    num_dof: int = struct.field(pytree_node=False)
    body_names: tuple = struct.field(pytree_node=False)
    dof_names: tuple = struct.field(pytree_node=False)
    base_body: int = struct.field(pytree_node=False)
    feet_bodies: tuple = struct.field(pytree_node=False)        # (left, right)
    knee_bodies: tuple = struct.field(pytree_node=False)
    termination_bodies: tuple = struct.field(pytree_node=False)
    penalized_bodies: tuple = struct.field(pytree_node=False)


def _f32(x) -> jnp.ndarray:
    return jnp.asarray(np.asarray(x, dtype=np.float32))


def from_spec(spec: Dict[str, Any]) -> RobotModel:
    bodies: List[Dict[str, Any]] = spec["bodies"]
    nb = len(bodies)
    parent = np.array([b["parent"] for b in bodies], dtype=np.int32)
    joint_pos = np.zeros((nb, 3), np.float32)
    joint_rot = np.tile(np.eye(3, dtype=np.float32), (nb, 1, 1))
    joint_axis = np.zeros((nb, 3), np.float32)
    mass = np.zeros((nb,), np.float32)
    com = np.zeros((nb, 3), np.float32)
    inertia = np.zeros((nb, 3, 3), np.float32)
    dof_lower, dof_upper, dof_effort, dof_velocity, dof_names = [], [], [], [], []
    body_names = []
    for i, b in enumerate(bodies):
        body_names.append(b["name"])
        mass[i] = b["mass"]
        com[i] = b["com"]
        inertia[i] = b["inertia"]
        j = b.get("joint")
        if j is not None:
            joint_pos[i] = j["origin_pos"]
            joint_rot[i] = j["origin_rot"]
            joint_axis[i] = j["axis"]
            dof_lower.append(j["lower"])
            dof_upper.append(j["upper"])
            dof_effort.append(j["effort"])
            dof_velocity.append(j["velocity"])
            dof_names.append(j["name"])
    cps = spec.get("collision_points", [])
    cp_body = np.array([c["body"] for c in cps], dtype=np.int32)
    cp_pos = np.array([c["pos"] for c in cps], dtype=np.float32).reshape(-1, 3)

    def _idx_of(names, match):
        return tuple(i for i, n in enumerate(names) if match in n)

    feet = tuple(spec.get("feet_bodies", _idx_of(body_names, "6_link")))
    knees = tuple(spec.get("knee_bodies", _idx_of(body_names, "4_link")))
    term = tuple(spec.get("termination_bodies", (0,)))
    pen = tuple(spec.get("penalized_bodies", (0,)))
    return RobotModel(
        parent=parent,
        joint_pos=_f32(joint_pos),
        joint_rot=_f32(joint_rot),
        joint_axis=_f32(joint_axis),
        mass=_f32(mass),
        com=_f32(com),
        inertia=_f32(inertia),
        dof_lower=_f32(dof_lower),
        dof_upper=_f32(dof_upper),
        dof_effort=_f32(dof_effort),
        dof_velocity=_f32(dof_velocity),
        cp_body=cp_body,
        cp_pos=_f32(cp_pos),
        nb=nb,
        num_dof=nb - 1,
        body_names=tuple(body_names),
        dof_names=tuple(dof_names),
        base_body=int(spec.get("base_body", 0)),
        feet_bodies=feet,
        knee_bodies=knees,
        termination_bodies=term,
        penalized_bodies=pen,
    )


def load(path: str) -> RobotModel:
    with open(path) as f:
        return from_spec(json.load(f))


_DEFAULT_SPEC = os.path.join(os.path.dirname(__file__), "..", "resources", "t1_model.json")


def load_t1() -> RobotModel:
    """Load the T1 humanoid model shipped with this repo (12-DoF biped,
    arms/waist collapsed into the base; parity with reference §2.10)."""
    return load(os.path.abspath(_DEFAULT_SPEC))
