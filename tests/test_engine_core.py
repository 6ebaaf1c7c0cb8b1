"""Equivalence: scalarized production substep vs the array-form oracle path."""
import jax
import jax.numpy as jnp
import numpy as np

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
