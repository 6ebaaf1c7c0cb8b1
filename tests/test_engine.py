"""Engine-level integration tests: contact stability, statics, determinism.

Note on expectations: a plain PD controller at the task's real gains cannot
balance the T1 from a cold drop — the trained policy is what balances it (in
any engine).  What the engine must guarantee is: statics are exact (ground
reaction equals weight), stiff-gain standing is stable (no contact chatter /
energy pumping), friction holds (no skating), and everything is finite and
deterministic.
"""
import jax
import jax.numpy as jnp
import numpy as np

from ti5_isaacgym_tpu.physics import dynamics as dyn
from ti5_isaacgym_tpu.physics import spatial as sp
from ti5_isaacgym_tpu.physics.contact import ContactOpts, flat_terrain
from ti5_isaacgym_tpu.physics.engine import (
    SolverOpts,
    init_state,
    probe_contact_masses,
    substep,
)
from ti5_isaacgym_tpu.physics.model import load_t1

MODEL = load_t1()
# nominal armature: midpoints of the reference's per-joint randomization
# ranges (t1_dh_stand_config.py:273-285)
ARMATURE = jnp.array([0.15, 0.15, 2.7, 2.7, 0.08, 0.021] * 2, jnp.float32)
PARAMS = dyn.nominal_params(MODEL).replace(armature=ARMATURE)

# T1 default pose (reference t1_dh_stand_config.py:126-141) and PD gains (:147-150)
DEFAULT_QPOS = jnp.array([0, 0, -0.3, 0.6, -0.3, 0, 0, 0, -0.3, 0.6, -0.3, 0], jnp.float32)
KP = jnp.array([50, 70, 90, 120, 50, 30] * 2, jnp.float32)
KD = jnp.array([5, 7, 9, 12, 5, 3] * 2, jnp.float32)

STATE0 = init_state(MODEL, [0.0, 0.0, 0.945], [1.0, 0.0, 0.0, 0.0], DEFAULT_QPOS)
MEFF = probe_contact_masses(MODEL, PARAMS, STATE0)


def _rollout(state, n_steps, gain_scale=1.0):
    terrain = flat_terrain()
    copts, sopts = ContactOpts(), SolverOpts()
    kp = KP * gain_scale
    kd = KD * np.sqrt(gain_scale)
    lim = MODEL.dof_effort * 0.85 * gain_scale

    @jax.jit
    def run(s):
        def body(_, carry):
            s, _ = carry
            tau = jnp.clip(kp * (DEFAULT_QPOS - s.qpos) - kd * s.qvel, -lim, lim)
            return substep(MODEL, PARAMS, terrain, copts, sopts, s, tau,
                           jnp.asarray(0.8), MEFF)
        return jax.lax.fori_loop(0, n_steps, body, (s, jnp.zeros((MODEL.nb, 3))))

    return run(state)


def test_statue_stands():
    """With stiff joints the statue must stand indefinitely: the contact
    model may not chatter, skate, or sink."""
    state, cf = _rollout(STATE0, 3000, gain_scale=50.0)
    e = sp.quat_to_euler_xyz(state.base_quat)
    assert abs(float(e[0])) < 0.05 and abs(float(e[1])) < 0.05, np.asarray(e)
    assert 0.9 < float(state.base_pos[2]) < 0.96
    assert float(jnp.linalg.norm(state.base_pos[:2])) < 0.05  # no skating
    total_up = float(cf[MODEL.feet_bodies[0], 2] + cf[MODEL.feet_bodies[1], 2])
    weight = float(jnp.sum(PARAMS.mass)) * 9.81
    assert abs(total_up - weight) / weight < 0.05, (total_up, weight)


def test_drop_settles_finite():
    """Task-gain PD from a drop: whatever the final posture, the sim must
    stay finite, on the ground, and statically supported."""
    state, cf = _rollout(STATE0, 3000, gain_scale=1.0)
    chex_all_finite = jnp.all(jnp.isfinite(state.base_pos)) & jnp.all(jnp.isfinite(state.qpos))
    assert bool(chex_all_finite)
    assert -0.1 < float(state.base_pos[2]) < 1.05
    total_up = float(jnp.sum(cf[:, 2]))
    weight = float(jnp.sum(PARAMS.mass)) * 9.81
    assert abs(total_up - weight) / weight < 0.2, (total_up, weight)
    # at rest
    assert float(jnp.linalg.norm(state.base_vel)) < 0.1


def test_penetration_is_small():
    state, _ = _rollout(STATE0, 2000, gain_scale=50.0)
    frames = dyn.fk(MODEL, state.base_pos, state.base_quat, state.base_vel,
                    state.qpos, state.qvel)
    p_w, _ = dyn.point_world(frames, MODEL.cp_body, MODEL.cp_pos)
    max_pen = float(jnp.max(-p_w[:, 2]))
    assert max_pen < 0.02, max_pen


def test_determinism():
    s1, _ = _rollout(STATE0, 200)
    s2, _ = _rollout(STATE0, 200)
    np.testing.assert_array_equal(np.asarray(s1.base_pos), np.asarray(s2.base_pos))
    np.testing.assert_array_equal(np.asarray(s1.qpos), np.asarray(s2.qpos))


def test_ragdoll_collapses():
    """Sanity: without actuation the robot falls (base drops) but survives."""
    state, _ = _rollout(STATE0, 1500, gain_scale=0.0)
    assert float(state.base_pos[2]) < 0.8
    assert bool(jnp.all(jnp.isfinite(state.qpos)))


def test_vmap_batch():
    terrain = flat_terrain()
    copts, sopts = ContactOpts(), SolverOpts()
    n = 8
    states = jax.tree.map(lambda x: jnp.broadcast_to(x, (n,) + x.shape), STATE0)
    params = jax.tree.map(lambda x: jnp.broadcast_to(x, (n,) + x.shape), PARAMS)
    tau = jnp.zeros((n, 12))
    fric = jnp.full((n,), 0.8)

    step = jax.jit(jax.vmap(
        lambda s, p, t, f: substep(MODEL, p, terrain, copts, sopts, s, t, f, MEFF)
    ))
    s2, cf = step(states, params, tau, fric)
    assert s2.base_pos.shape == (n, 3)
    assert cf.shape == (n, MODEL.nb, 3)
    assert bool(jnp.all(jnp.isfinite(s2.base_pos)))
