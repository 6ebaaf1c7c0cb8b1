"""MJCF generator regression tests.

Round-3 finding: the generated MJCF omitted ``<compiler angle="radian"/>``,
so MuJoCo read the radian joint limits as DEGREES — every joint was clamped
to ~±0.5°, turning the sim2sim robot into a frozen statue (an airborne knee
saw -120 N*m of phantom limit torque against its PD).  Every sim2sim result
produced before the fix was invalid.  These tests pin the semantics.
"""
import json
import os

import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")

from ti5_isaacgym_tpu.export.mjcf import spec_to_mjcf

SPEC = os.path.join(os.path.dirname(__file__), "..", "ti5_isaacgym_tpu",
                    "resources", "t1_model.json")


def _model():
    spec = json.load(open(SPEC))
    return mujoco.MjModel.from_xml_string(
        spec_to_mjcf(spec, with_geoms=True, limited=True))


def test_joint_ranges_are_radians():
    m = _model()
    knee = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_JOINT, "leg_l4_joint")
    np.testing.assert_allclose(m.jnt_range[knee], [0.0, 2.09], atol=1e-6)
    hip_yaw = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_JOINT, "leg_l1_joint")
    assert m.jnt_range[hip_yaw][1] > 0.5   # 0.523 rad, NOT 0.009 (=0.523 deg)


def test_airborne_pd_reaches_target_pose():
    """With correct (radian) limits and no self-collision, a PD on an
    airborne robot must settle at its target pose; the degree bug pinned the
    knee at ~0.36 against a 0.6 target."""
    m = _model()
    d = mujoco.MjData(m)
    default_q = np.array([0.0, 0.0, -0.3, 0.6, -0.3, 0.0] * 2)
    kp = np.array([50, 70, 90, 120, 50, 30] * 2, float)
    kd = np.array([5, 7, 9, 12, 5, 3] * 2, float)
    d.qpos[:3] = [0, 0, 2.0]
    d.qpos[3:7] = [1, 0, 0, 0]
    d.qpos[7:] = default_q
    for _ in range(300):   # 0.3 s: settles the PD but stays airborne
        tau = np.clip(kp * (default_q - d.qpos[7:]) - kd * d.qvel[6:], -200, 200)
        d.ctrl[:] = tau
        mujoco.mj_step(m, d)
    assert d.qpos[2] > 1.0, "fell to the floor; shorten the horizon"
    np.testing.assert_allclose(d.qpos[7:], default_q, atol=0.02)


def test_no_self_collision_contacts():
    m = _model()
    d = mujoco.MjData(m)
    d.qpos[:3] = [0, 0, 2.0]      # airborne: floor contact impossible
    d.qpos[3:7] = [1, 0, 0, 0]
    d.qpos[7:] = np.array([0.0, 0.0, -0.9, 2.0, -0.9, 0.0] * 2)  # legs folded
    mujoco.mj_forward(m, d)
    assert d.ncon == 0
