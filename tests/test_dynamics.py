"""Analytic + MuJoCo-oracle validation of the ABA dynamics core.

The reference has no tests; its de-facto integration check was MuJoCo
sim-to-sim transfer (SURVEY.md §4).  Here MuJoCo is used directly as a
numerical oracle for FK and forward dynamics on random states.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ti5_isaacgym_tpu.physics import dynamics as dyn
from ti5_isaacgym_tpu.physics import spatial as sp
from ti5_isaacgym_tpu.physics.model import load_t1

MODEL = load_t1()
PARAMS = dyn.nominal_params(MODEL)


def _rand_state(key):
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    base_pos = jax.random.normal(k1, (3,)) * 0.5 + jnp.array([0, 0, 1.0])
    base_quat = sp.quat_normalize(jax.random.normal(k2, (4,)))
    base_vel = jax.random.normal(k3, (6,)) * 0.5
    qpos = jax.random.uniform(k4, (MODEL.num_dof,), minval=-0.5, maxval=0.5)
    qvel = jax.random.normal(k5, (MODEL.num_dof,)) * 0.5
    return base_pos, base_quat, base_vel, qpos, qvel


def test_free_fall():
    """Zero torque, zero velocity, identity orientation -> a_lin = g, qdd from gravity only."""
    base_pos = jnp.array([0.0, 0.0, 2.0])
    base_quat = sp.quat_identity()
    base_vel = jnp.zeros(6)
    qpos = jnp.zeros(MODEL.num_dof)
    qvel = jnp.zeros(MODEL.num_dof)
    frames = dyn.fk(MODEL, base_pos, base_quat, base_vel, qpos, qvel)
    a0, qdd = dyn.aba(MODEL, PARAMS, frames, qvel, jnp.zeros(MODEL.num_dof))
    # a floating articulated chain in free fall: CoM accelerates at g and no
    # internal motion appears => spatial accel of base = [0, g] and qdd = 0.
    np.testing.assert_allclose(a0[:3], 0.0, atol=1e-4)
    np.testing.assert_allclose(a0[3:], [0, 0, -9.81], atol=1e-4)
    np.testing.assert_allclose(qdd, 0.0, atol=1e-4)


@pytest.fixture(scope="module")
def mj():
    mujoco = pytest.importorskip("mujoco")
    import json
    import os

    from ti5_isaacgym_tpu.export.mjcf import spec_to_mjcf

    spec_path = os.path.join(os.path.dirname(__file__), "..", "ti5_isaacgym_tpu", "resources", "t1_model.json")
    xml = spec_to_mjcf(json.load(open(spec_path)), with_geoms=False, limited=False)
    m = mujoco.MjModel.from_xml_string(xml)
    return mujoco, m


def _set_mj_state(mujoco, m, d, base_pos, base_quat, base_vel, qpos, qvel):
    d.qpos[:3] = np.asarray(base_pos)
    d.qpos[3:7] = np.asarray(base_quat)  # mujoco is wxyz too
    d.qpos[7:] = np.asarray(qpos)
    # mujoco free joint qvel: linear world, angular BODY frame
    R = np.asarray(sp.quat_to_mat(base_quat))
    d.qvel[:3] = R @ np.asarray(base_vel[3:])
    d.qvel[3:6] = np.asarray(base_vel[:3])
    d.qvel[6:] = np.asarray(qvel)


def test_fk_matches_mujoco(mj):
    mujoco, m = mj
    d = mujoco.MjData(m)
    for seed in range(3):
        st = _rand_state(jax.random.PRNGKey(seed))
        frames = dyn.fk(MODEL, *st)
        _set_mj_state(mujoco, m, d, *st)
        mujoco.mj_forward(m, d)
        for i, name in enumerate(MODEL.body_names):
            bid = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_BODY, name)
            np.testing.assert_allclose(
                np.asarray(frames.pos[i]), d.xpos[bid], atol=1e-5,
                err_msg=f"body {name} position (seed {seed})",
            )
            np.testing.assert_allclose(
                np.asarray(frames.rot[i]), d.xmat[bid].reshape(3, 3), atol=1e-5,
                err_msg=f"body {name} rotation",
            )


def test_aba_matches_mujoco(mj):
    mujoco, m = mj
    d = mujoco.MjData(m)
    for seed in range(5):
        key = jax.random.PRNGKey(100 + seed)
        st = _rand_state(key)
        tau = jax.random.normal(jax.random.fold_in(key, 1), (MODEL.num_dof,)) * 20.0
        frames = dyn.fk(MODEL, *st)
        a0, qdd = dyn.aba(MODEL, PARAMS, frames, st[4], tau)
        _set_mj_state(mujoco, m, d, *st)
        d.ctrl[:] = 0.0
        d.qfrc_applied[:] = 0.0
        d.qfrc_applied[6:] = np.asarray(tau)
        mujoco.mj_forward(m, d)
        np.testing.assert_allclose(np.asarray(qdd), d.qacc[6:], rtol=2e-3, atol=2e-3,
                                   err_msg=f"joint accels (seed {seed})")
        # base: mujoco qacc[:3] is linear acc (world, at the free-joint frame),
        # qacc[3:6] angular in body frame.
        base_quat, base_vel = st[1], st[2]
        R = np.asarray(sp.quat_to_mat(base_quat))
        w_b, v_b = np.asarray(base_vel[:3]), np.asarray(base_vel[3:])
        # world linear acc of body origin from our body-frame spatial accel:
        # d/dt (R v_b) = R (a_lin + w_b x v_b)
        lin_acc_world = R @ (np.asarray(a0[3:]) + np.cross(w_b, v_b))
        np.testing.assert_allclose(lin_acc_world, d.qacc[:3], rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(np.asarray(a0[:3]), d.qacc[3:6], rtol=2e-3, atol=2e-3)


def test_armature_slows_acceleration():
    st = _rand_state(jax.random.PRNGKey(7))
    frames = dyn.fk(MODEL, *st)
    tau = jnp.ones(MODEL.num_dof) * 10.0
    _, qdd0 = dyn.aba(MODEL, PARAMS, frames, st[4], tau)
    params_arm = PARAMS.replace(armature=jnp.ones(MODEL.num_dof) * 3.6)
    _, qdd1 = dyn.aba(MODEL, params_arm, frames, st[4], tau)
    assert float(jnp.mean(jnp.abs(qdd1))) < float(jnp.mean(jnp.abs(qdd0)))


def test_energy_conservation_no_contact():
    """Zero-gravity, zero-torque free floating chain conserves energy."""
    from ti5_isaacgym_tpu.physics.engine import SolverOpts, init_state, substep
    from ti5_isaacgym_tpu.physics.contact import ContactOpts, flat_terrain

    st = _rand_state(jax.random.PRNGKey(11))
    state = init_state(
        MODEL, st[0] + jnp.array([0.0, 0.0, 100.0]), st[1], st[3] * 0.3,
        base_vel=st[2] * 0.3, qvel=st[4] * 0.3,
    )
    sopts = SolverOpts(gravity=0.0)
    terrain = flat_terrain()

    def energy(s):
        frames = dyn.fk(MODEL, s.base_pos, s.base_quat, s.base_vel, s.qpos, s.qvel)
        I_sp = PARAMS.spatial_inertia()
        return 0.5 * jnp.sum(jnp.einsum("ni,nij,nj->n", frames.vel, I_sp, frames.vel))

    e0 = float(energy(state))

    @jax.jit
    def run(s):
        def body(_, s):
            return substep(MODEL, PARAMS, terrain, ContactOpts(), sopts, s,
                           jnp.zeros(MODEL.num_dof), jnp.array(0.8))[0]
        return jax.lax.fori_loop(0, 1000, body, s)

    state = run(state)
    e1 = float(energy(state))
    assert abs(e1 - e0) / (abs(e0) + 1e-9) < 0.02, (e0, e1)
