"""Equivalence: scalarized production substep vs the array-form oracle path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ti5_isaacgym_tpu.physics import dynamics as dyn
from ti5_isaacgym_tpu.physics.contact import ContactOpts, flat_terrain
from ti5_isaacgym_tpu.physics.engine import SolverOpts, init_state, probe_contact_masses, substep
from ti5_isaacgym_tpu.physics.engine_core import substep_batched
from ti5_isaacgym_tpu.physics.model import load_t1

MODEL = load_t1()
N = 4


def _setup():
    arm = jnp.array([0.15, 0.15, 2.7, 2.7, 0.08, 0.021] * 2, jnp.float32)
    params = dyn.nominal_params(MODEL).replace(armature=arm)
    dq = jnp.array([0, 0, -0.3, 0.6, -0.3, 0, 0, 0, -0.3, 0.6, -0.3, 0], jnp.float32)
    s0 = init_state(MODEL, [0.0, 0.0, 0.945], [1.0, 0, 0, 0], dq)
    meff = probe_contact_masses(MODEL, params, s0)
    key = jax.random.PRNGKey(3)
    ks = jax.random.split(key, 6)
    batch = lambda x, k, sc: jnp.broadcast_to(x, (N,) + x.shape) + \
        sc * jax.random.normal(k, (N,) + x.shape)
    states = jax.tree.map(lambda x: jnp.broadcast_to(x, (N,) + x.shape), s0)
    states = states.replace(
        base_pos=batch(s0.base_pos, ks[0], 0.02),
        base_vel=batch(s0.base_vel, ks[1], 0.1),
        qpos=batch(s0.qpos, ks[2], 0.05),
        qvel=batch(s0.qvel, ks[3], 0.2),
    )
    bparams = jax.tree.map(lambda x: jnp.broadcast_to(x, (N,) + x.shape), params)
    tau = jax.random.normal(ks[4], (N, 12)) * 30.0
    fric = jnp.full((N,), 0.8)
    bf = jax.random.normal(ks[5], (N, 3)) * 50.0
    return states, bparams, tau, fric, bf, meff


@pytest.mark.slow
def test_scalarized_matches_vmapped_oracle():
    states, bparams, tau, fric, bf, meff = _setup()
    terrain = flat_terrain()
    co, so = ContactOpts(), SolverOpts()
    bt = jnp.zeros((N, 3))

    ref_fn = jax.jit(jax.vmap(
        lambda s, p, t, f, bfi, bti: substep(MODEL, p, terrain, co, so, s, t, f,
                                             meff, bfi, bti)))
    fast_fn = jax.jit(lambda s, p, t, f, bfi, bti: substep_batched(
        MODEL, p, terrain, co, so, s, t, f, meff, bfi, bti))

    s_ref, cf_ref = ref_fn(states, bparams, tau, fric, bf, bt)
    s_fast, cf_fast = fast_fn(states, bparams, tau, fric, bf, bt)
    for name in ("base_pos", "base_quat", "base_vel", "qpos", "qvel", "cp_anchor"):
        np.testing.assert_allclose(
            np.asarray(getattr(s_fast, name)), np.asarray(getattr(s_ref, name)),
            atol=2e-4, err_msg=name)
    np.testing.assert_allclose(np.asarray(cf_fast), np.asarray(cf_ref),
                               atol=0.5, rtol=1e-3)


@pytest.mark.slow
def test_scalarized_multistep_stable():
    states, bparams, tau, fric, bf, meff = _setup()
    terrain = flat_terrain()
    co, so = ContactOpts(), SolverOpts()

    @jax.jit
    def run(s):
        def body(_, c):
            s, _ = c
            return substep_batched(MODEL, bparams, terrain, co, so, s,
                                   jnp.zeros((N, 12)), fric, meff)
        return jax.lax.fori_loop(0, 500, body,
                                 (s, jnp.zeros((N, MODEL.nb, 3))))

    s2, cf = run(states)
    assert bool(jnp.all(jnp.isfinite(s2.base_pos)))
    assert bool(jnp.all(s2.base_pos[:, 2] > -0.1))


def test_ctx_kinematics_matches_aos_fk():
    """Component-form ctx kinematics == vmapped array-of-structures FK."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ti5_isaacgym_tpu.physics import dynamics as dyn
    from ti5_isaacgym_tpu.physics import spatial as sp
    from ti5_isaacgym_tpu.physics.engine import PhysicsState
    from ti5_isaacgym_tpu.physics.engine_core import ctx_kinematics
    from ti5_isaacgym_tpu.physics.model import load_t1

    model = load_t1()
    rng = np.random.RandomState(1)
    n = 24
    quat = rng.normal(size=(n, 4)).astype(np.float32)
    quat /= np.linalg.norm(quat, axis=-1, keepdims=True)
    phys = PhysicsState(
        base_pos=jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32)),
        base_quat=jnp.asarray(quat),
        base_vel=jnp.asarray(rng.normal(size=(n, 6)).astype(np.float32)),
        qpos=jnp.asarray(rng.uniform(-1.5, 1.5, size=(n, 12)).astype(np.float32)),
        qvel=jnp.asarray(rng.normal(size=(n, 12)).astype(np.float32)),
        cp_anchor=jnp.zeros((n, model.cp_pos.shape[0], 3)))

    k = jax.jit(lambda s: ctx_kinematics(model, s))(phys)

    frames = jax.vmap(lambda i: dyn.fk(model, phys.base_pos[i], phys.base_quat[i],
                                       phys.base_vel[i], phys.qpos[i],
                                       phys.qvel[i]))(jnp.arange(n))
    lin_w, ang_w = jax.vmap(dyn.body_world_vel)(frames)
    feet = list(model.feet_bodies)
    knees = list(model.knee_bodies)

    np.testing.assert_allclose(np.asarray(k["feet_pos"]),
                               np.asarray(frames.pos[:, feet]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(k["knee_xy"]),
                               np.asarray(frames.pos[:, knees][..., :2]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(k["feet_angvel_xy"]),
                               np.asarray(ang_w[:, feet][..., :2]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(k["root_lin_w"]),
                               np.asarray(lin_w[:, 0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(k["root_ang_w"]),
                               np.asarray(ang_w[:, 0]), atol=1e-5)
    want_euler = sp.quat_to_euler_xyz(sp.mat_to_quat(frames.rot[:, feet]))
    np.testing.assert_allclose(np.asarray(k["feet_euler"]),
                               np.asarray(want_euler), atol=1e-4)

    # 2-D batch layout agrees
    phys2 = jax.tree.map(lambda x: x.reshape((4, 6) + x.shape[1:]), phys)
    k2 = jax.jit(lambda s: ctx_kinematics(model, s))(phys2)
    np.testing.assert_allclose(
        np.asarray(k2["feet_pos"]).reshape(n, 2, 3),
        np.asarray(k["feet_pos"]), atol=1e-6)
