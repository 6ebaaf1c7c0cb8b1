"""Algorithm-layer tests: networks, GAE, PPO update mechanics."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ti5_isaacgym_tpu.algo import networks as nets
from ti5_isaacgym_tpu.algo.ppo import PPO, PPOConfig, init_train_state
from ti5_isaacgym_tpu.algo.rollout import Transition, compute_gae, flatten_batch, minibatch_indices


def test_gaussian_head():
    mean = jnp.zeros((4, 3))
    std = jnp.ones((4, 3))
    a = jnp.zeros((4, 3))
    lp = nets.log_prob(mean, std, a)
    np.testing.assert_allclose(np.asarray(lp), 3 * (-0.5 * np.log(2 * np.pi)), rtol=1e-5)
    ent = nets.entropy(std[0])
    np.testing.assert_allclose(float(ent), 3 * 0.5 * (1 + np.log(2 * np.pi)), rtol=1e-5)
    # KL of identical distributions is ~0 (up to the reference's 1e-5 epsilon)
    kl = nets.gaussian_kl(mean, std, mean, std)
    np.testing.assert_allclose(np.asarray(kl), 3e-5, atol=1e-4)


def test_gae_hand_case():
    # T=3, N=1; gamma=0.5, lam=1.0 => plain discounted MC minus value
    rewards = jnp.array([[1.0], [1.0], [1.0]])
    dones = jnp.zeros((3, 1), bool)
    values = jnp.zeros((3, 1))
    traj = Transition(obs=None, critic_obs=None, actions=None, rewards=rewards,
                      dones=dones, values=values, log_probs=None, mu=None, sigma=None)
    returns, adv = compute_gae(traj, jnp.zeros((1,)), gamma=0.5, lam=1.0)
    np.testing.assert_allclose(np.asarray(returns[:, 0]), [1.75, 1.5, 1.0], atol=1e-6)


def test_gae_respects_dones():
    rewards = jnp.array([[1.0], [1.0], [1.0]])
    dones = jnp.array([[False], [True], [False]])
    values = jnp.zeros((3, 1))
    traj = Transition(obs=None, critic_obs=None, actions=None, rewards=rewards,
                      dones=dones, values=values, log_probs=None, mu=None, sigma=None)
    returns, _ = compute_gae(traj, jnp.ones((1,)) * 10.0, gamma=0.9, lam=1.0)
    # step1 return must not bootstrap across the done at step 1
    np.testing.assert_allclose(float(returns[0, 0]), 1.0 + 0.9 * 1.0, atol=1e-6)
    # step2 bootstraps on last_values
    np.testing.assert_allclose(float(returns[2, 0]), 1.0 + 0.9 * 10.0, atol=1e-6)


def test_minibatch_indices_cover_all():
    idx = minibatch_indices(jax.random.PRNGKey(0), 64, 4)
    assert idx.shape == (4, 16)
    assert set(np.asarray(idx).ravel().tolist()) == set(range(64))


def test_dh_network_shapes():
    net = nets.ActorCriticDH()
    obs = jnp.zeros((5, 66 * 47))
    priv = jnp.zeros((5, 219))
    params = net.init(jax.random.PRNGKey(0), obs, priv)
    mean, std = net.apply(params, obs, method="distribution")
    assert mean.shape == (5, 12) and std.shape == (5, 12)
    v = net.apply(params, priv, method="evaluate")
    assert v.shape == (5,)
    est = net.apply(params, obs, method="estimate_velocity")
    assert est.shape == (5, 3)
    a, e = net.apply(params, obs, method="act_inference")
    assert a.shape == (5, 12) and e.shape == (5, 3)
    # actor input is 235 + 3 + 64 = 302
    actor_k = params["params"]["actor"]["Dense_0"]["kernel"]
    assert actor_k.shape[0] == 302
    # std initialised at 1.0
    np.testing.assert_allclose(np.asarray(params["params"]["std"]), 1.0)


def test_cnn_output_dims():
    cnn = nets.LongHistoryCNN()
    x = jnp.zeros((3, 66 * 47))
    p = cnn.init(jax.random.PRNGKey(0), x)
    y = cnn.apply(p, x)
    assert y.shape == (3, 64)
    # conv stack: 47 -(k6,s3)-> 14 -(k4,s2)-> 6; 6*16 = 96 into Dense(128)
    assert p["params"]["Dense_0"]["kernel"].shape[0] == 96


def _synthetic_batch(key, T=8, N=16):
    ks = jax.random.split(key, 6)
    obs = jax.random.normal(ks[0], (T, N, 66 * 47)) * 0.1
    priv = jax.random.normal(ks[1], (T, N, 219)) * 0.1
    actions = jax.random.normal(ks[2], (T, N, 12)) * 0.1
    rewards = jax.random.normal(ks[3], (T, N)) * 0.1
    dones = jnp.zeros((T, N), bool)
    return obs, priv, actions, rewards, dones


def test_ppo_update_moves_params_and_lr():
    cfg = PPOConfig(num_learning_epochs=2, num_mini_batches=4, learning_rate=1e-5)
    net = nets.ActorCriticDH()
    obs, priv, actions, rewards, dones = _synthetic_batch(jax.random.PRNGKey(1))
    params = net.init(jax.random.PRNGKey(2), obs[0], priv[0])
    alg = PPO(cfg, net)
    ts = init_train_state(cfg, params)
    mean, std = net.apply(params, obs.reshape(-1, obs.shape[-1]), method="distribution")
    T, N = rewards.shape
    traj = Transition(
        obs=obs, critic_obs=priv, actions=actions, rewards=rewards, dones=dones,
        values=jnp.zeros((T, N)),
        log_probs=nets.log_prob(mean, std, actions.reshape(-1, 12)).reshape(T, N),
        mu=mean.reshape(T, N, 12), sigma=std.reshape(T, N, 12))
    returns, adv = compute_gae(traj, jnp.zeros((N,)), cfg.gamma, cfg.lam)
    ts2, metrics = jax.jit(alg.update)(ts, traj, returns, adv, jax.random.PRNGKey(3))
    # parameters moved
    delta = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))), ts.params, ts2.params)
    assert max(jax.tree.leaves(delta)) > 0
    assert int(ts2.update_count) == 8
    assert float(metrics["estimator_loss"]) >= 0
    # with a tiny step size the policy barely moves => tiny KL => the
    # adaptive rule raises the lr
    assert float(metrics["lr"]) > cfg.learning_rate


def test_estimator_loss_targets_linvel_slice():
    """DH estimator regresses critic_obs[..., 199:202]."""
    cfg = PPOConfig()
    net = nets.ActorCriticDH()
    obs = jnp.zeros((4, 66 * 47))
    priv = jnp.zeros((4, 219)).at[:, 199:202].set(jnp.asarray([1.0, 2.0, 3.0]))
    params = net.init(jax.random.PRNGKey(0), obs, priv)
    alg = PPO(cfg, net)
    mb = Transition(obs=obs, critic_obs=priv, actions=jnp.zeros((4, 12)),
                    rewards=None, dones=None, values=jnp.zeros((4,)),
                    log_probs=jnp.zeros((4,)), mu=jnp.zeros((4, 12)),
                    sigma=jnp.ones((4, 12)))
    loss, (s, v, est_loss, *_ ) = alg._loss(params, mb, jnp.zeros((4,)), jnp.zeros((4,)))
    est = net.apply(params, obs, method="estimate_velocity")
    want = float(jnp.mean(jnp.square(est - jnp.asarray([1.0, 2.0, 3.0]))))
    np.testing.assert_allclose(float(est_loss), want, rtol=1e-5)


def test_update_dataflow_matches_reference_semantics():
    """The round-4 restructured update (python-unrolled loops, per-minibatch
    fused gathers, packed small-tensor gather — algo/ppo.py) must be
    numerically equivalent to a direct transcription of the reference
    generator semantics (one permutation, [M, B] chunks in order, reused
    across epochs; rollout_storage.py:129-173) — protecting the perf
    dataflow against silent semantic drift in future refactors."""
    import optax

    cfg = PPOConfig(num_learning_epochs=2, num_mini_batches=4, learning_rate=1e-5)
    net = nets.ActorCriticDH()
    obs, priv, actions, rewards, dones = _synthetic_batch(jax.random.PRNGKey(7))
    params = net.init(jax.random.PRNGKey(8), obs[0], priv[0])
    alg = PPO(cfg, net)
    ts = init_train_state(cfg, params)
    mean, std = net.apply(params, obs.reshape(-1, obs.shape[-1]), method="distribution")
    T, N = rewards.shape
    traj = Transition(
        obs=obs, critic_obs=priv, actions=actions, rewards=rewards, dones=dones,
        values=jnp.zeros((T, N)),
        log_probs=nets.log_prob(mean, std, actions.reshape(-1, 12)).reshape(T, N),
        mu=mean.reshape(T, N, 12), sigma=std.reshape(T, N, 12))
    returns, adv = compute_gae(traj, jnp.zeros((N,)), cfg.gamma, cfg.lam)
    key = jax.random.PRNGKey(9)

    # direct reference-semantics transcription
    def reference_update(ts, traj, returns, advantages, key):
        from ti5_isaacgym_tpu.algo.rollout import flatten_batch, minibatch_indices

        flat = flatten_batch(traj)._replace(rewards=None, dones=None)
        flat_ret = returns.reshape(-1)
        flat_adv = advantages.reshape(-1)
        idx = minibatch_indices(key, flat_ret.shape[0], cfg.num_mini_batches)
        for _ in range(cfg.num_learning_epochs):
            for b in range(cfg.num_mini_batches):
                bidx = idx[b]
                mb = jax.tree.map(lambda x: x[bidx], flat)
                (loss, aux), grads = jax.value_and_grad(alg._loss, has_aux=True)(
                    ts.params, mb, flat_ret[bidx], flat_adv[bidx])
                _, _, _, mu_new, sigma_new = aux
                kl = jnp.mean(nets.gaussian_kl(mb.mu, mb.sigma, mu_new, sigma_new))
                lr = ts.lr
                lr = jnp.where(kl > cfg.desired_kl * 2.0,
                               jnp.maximum(cfg.min_lr, lr / 1.5), lr)
                lr = jnp.where((kl < cfg.desired_kl / 2.0) & (kl > 0.0),
                               jnp.minimum(cfg.max_lr, lr * 1.5), lr)
                updates, opt_state = alg.optimizer.update(grads, ts.opt_state, ts.params)
                updates = jax.tree.map(lambda u: -lr * u, updates)
                ts = ts.replace(params=optax.apply_updates(ts.params, updates),
                                opt_state=opt_state, lr=lr,
                                update_count=ts.update_count + 1)
        return ts

    ts_ref = jax.jit(reference_update)(ts, traj, returns, adv, key)
    ts_new, _ = jax.jit(alg.update)(ts, traj, returns, adv, key)
    for a, b in zip(jax.tree.leaves(ts_ref.params), jax.tree.leaves(ts_new.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(float(ts_ref.lr), float(ts_new.lr), rtol=1e-6)


def test_feature_major_loss_forward_matches_flax():
    """networks.loss_forward_T (the measured-and-rejected perf variant kept
    for tools/exp_update_variants.py) must track the flax loss_forward —
    pinned so the transposed math cannot rot."""
    net = nets.ActorCriticDH()
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 3102)),
                      jnp.zeros((1, 219)))
    k1, k2 = jax.random.split(jax.random.PRNGKey(4))
    obs = (jax.random.normal(k1, (32, 3102)) * 0.3).astype(jnp.bfloat16)
    crit = (jax.random.normal(k2, (32, 219)) * 0.3).astype(jnp.bfloat16)
    m0, s0, v0, e0 = net.apply(params, obs, crit, method="loss_forward")
    m1, s1, v1, e1 = nets.loss_forward_T(net, params, obs.T, crit.T)
    for a, b in ((m0, m1), (s0, s1), (v0, v1), (e0, e1)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   atol=5e-6, rtol=1e-4)
