"""Numerical correctness of the data-parallel learner (VERDICT r1 weak #3).

The invariant that makes N-shard training equal 1-shard training is the
full-batch update: with 1 epoch x 1 minibatch there is no stochastic
minibatch partition, so the psum'd-gradient update on 8 shards must equal
the single-device update on the same trajectory to f32-reduction tolerance.
(With M>1 minibatches each shard legitimately partitions its LOCAL data —
same semantics as the reference's per-GPU minibatching would have.)
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from ti5_isaacgym_tpu.algo import networks as nets
from ti5_isaacgym_tpu.algo.ppo import PPO, PPOConfig, init_train_state
from ti5_isaacgym_tpu.algo.rollout import Transition, compute_gae

AXIS = "data"


def _mk_traj(key, T=2, N=16):
    ks = jax.random.split(key, 8)
    obs = (jax.random.normal(ks[0], (T, N, 3102)) * 0.3).astype(jnp.bfloat16)
    priv = (jax.random.normal(ks[1], (T, N, 219)) * 0.3).astype(jnp.bfloat16)
    actions = jax.random.normal(ks[2], (T, N, 12)) * 0.5
    mu = actions + jax.random.normal(ks[3], (T, N, 12)) * 0.05
    sigma = jnp.ones((T, N, 12))
    logp = nets.log_prob(mu, sigma, actions)
    return Transition(
        obs=obs, critic_obs=priv, actions=actions,
        rewards=jax.random.normal(ks[4], (T, N)) * 0.1,
        dones=jnp.zeros((T, N), bool),
        values=jax.random.normal(ks[5], (T, N)) * 0.2,
        log_probs=logp, mu=mu, sigma=sigma,
    ), jax.random.normal(ks[6], (N,)) * 0.2


@pytest.mark.skipif(len(jax.devices("cpu")) < 8, reason="needs 8 virtual devices")
def test_sharded_fullbatch_update_matches_single_device():
    cfg = PPOConfig(num_learning_epochs=1, num_mini_batches=1,
                    learning_rate=1e-3)
    net = nets.ActorCriticDH()
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 3102)),
                      jnp.zeros((1, 219)))
    traj, last_values = _mk_traj(jax.random.PRNGKey(1))
    up_key = jax.random.PRNGKey(2)

    # --- single device ---
    alg1 = PPO(cfg, net, dh=True, axis_name=None)
    ts0 = init_train_state(cfg, params)

    @jax.jit
    def single(ts, traj, last_values):
        ret, adv = compute_gae(traj, last_values, cfg.gamma, cfg.lam)
        return alg1.update(ts, traj, ret, adv, up_key)

    ts1, m1 = single(ts0, traj, last_values)

    # --- 8 shards ---
    algN = PPO(cfg, net, dh=True, axis_name=AXIS)
    mesh = Mesh(np.array(jax.devices("cpu")[:8]), (AXIS,))

    def sharded(ts, traj, last_values):
        ret, adv = compute_gae(traj, last_values, cfg.gamma, cfg.lam,
                               axis_name=AXIS)
        ts, m = algN.update(ts, traj, ret, adv, up_key)
        return ts, jax.tree.map(lambda x: jax.lax.pmean(x, AXIS), m)

    traj_specs = jax.tree.map(lambda _: P(None, AXIS), traj)
    fn = jax.jit(jax.shard_map(
        sharded, mesh=mesh,
        in_specs=(P(), traj_specs, P(AXIS)),
        out_specs=(P(), P())))
    ts8, m8 = fn(ts0, traj, last_values)

    # params must agree to f32 reduction-order tolerance
    for p1, p8 in zip(jax.tree.leaves(ts1.params), jax.tree.leaves(ts8.params)):
        # Adam's 1/sqrt(v) amplifies f32 reduction-order noise on near-zero
        # gradients; a wrong psum would be off by orders of magnitude
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p8),
                                   atol=1e-5, rtol=1e-3)
    for k in ("value_loss", "surrogate_loss", "estimator_loss", "kl"):
        np.testing.assert_allclose(float(m1[k]), float(m8[k]), rtol=2e-4,
                                   err_msg=k)
    np.testing.assert_allclose(float(ts1.lr), float(ts8.lr), rtol=1e-6)


@pytest.mark.skipif(len(jax.devices("cpu")) < 8, reason="needs 8 virtual devices")
def test_gae_advantage_normalization_shard_invariant():
    """The psum'd advantage moments must equal the global moments."""
    traj, last_values = _mk_traj(jax.random.PRNGKey(3))
    gamma, lam = 0.994, 0.9
    ret1, adv1 = jax.jit(lambda t, lv: compute_gae(t, lv, gamma, lam))(
        traj, last_values)

    mesh = Mesh(np.array(jax.devices("cpu")[:8]), (AXIS,))
    traj_specs = jax.tree.map(lambda _: P(None, AXIS), traj)
    fn = jax.jit(jax.shard_map(
        lambda t, lv: compute_gae(t, lv, gamma, lam, axis_name=AXIS),
        mesh=mesh, in_specs=(traj_specs, P(AXIS)),
        out_specs=(P(None, AXIS), P(None, AXIS))))
    ret8, adv8 = fn(traj, last_values)
    np.testing.assert_allclose(np.asarray(ret1), np.asarray(ret8), atol=1e-6)
    np.testing.assert_allclose(np.asarray(adv1), np.asarray(adv8),
                               atol=1e-5, rtol=1e-5)
