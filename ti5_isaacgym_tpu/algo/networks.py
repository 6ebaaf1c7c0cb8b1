"""Policy/value networks (flax.linen) for the vanilla and DH PPO variants.

Architecture parity with the reference (reference
``humanoid/algo/ppo/actor_critic.py`` and ``actor_critic_dh.py``):

* ``ActorCritic`` — plain MLP actor + critic with a learned per-action std.
* ``ActorCriticDH`` — actor consuming [short-history(235) | estimated
  lin-vel(3) | CNN embedding(64)], critic on the 219-dim privileged stack,
  a supervised state-estimator MLP (235 -> 3), and a Conv1d long-history
  encoder over the 66-frame stack (66 channels x 47 length -> k6s3 -> k4s2
  -> flatten 96 -> 128 -> 64, reference ``actor_critic_dh.py:75-96``).

The Gaussian head is implemented inline (sample / log-prob / entropy /
analytic KL) so the whole act-and-step path stays one fused XLA program.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

_HALF_LOG_2PI = 0.5 * jnp.log(2.0 * jnp.pi)


class MLP(nn.Module):
    hidden: Sequence[int]
    out: int

    @nn.compact
    def __call__(self, x):
        for h in self.hidden:
            x = nn.elu(nn.Dense(h)(x))
        return nn.Dense(self.out)(x)


class LongHistoryCNN(nn.Module):
    """Conv1d encoder over the 66-frame proprioceptive history."""

    filters: Sequence[int] = (32, 16)
    kernels: Sequence[int] = (6, 4)
    strides: Sequence[int] = (3, 2)
    out_dim: int = 64
    frame_stack: int = 66
    frame_dim: int = 47

    @nn.compact
    def __call__(self, obs_flat):
        # [N, 66*47] -> frames as channels, per-frame features as length
        x = obs_flat.reshape(obs_flat.shape[:-1] + (self.frame_stack, self.frame_dim))
        x = jnp.swapaxes(x, -1, -2)  # [N, 47(length), 66(channels)]
        for f, k, s in zip(self.filters, self.kernels, self.strides):
            x = nn.relu(nn.Conv(features=f, kernel_size=(k,), strides=(s,),
                                padding="VALID")(x))
        x = x.reshape(x.shape[:-2] + (-1,))  # [N, 96]
        x = nn.elu(nn.Dense(128)(x))
        return nn.Dense(self.out_dim)(x)


class ActorCritic(nn.Module):
    """Vanilla MLP actor-critic (reference ``actor_critic.py:5-98``)."""

    num_actions: int = 12
    actor_hidden: Sequence[int] = (512, 256, 128)
    critic_hidden: Sequence[int] = (768, 256, 128)
    init_noise_std: float = 1.0

    def setup(self):
        self.actor = MLP(self.actor_hidden, self.num_actions)
        self.critic = MLP(self.critic_hidden, 1)
        self.std = self.param("std", lambda k: jnp.full((self.num_actions,),
                                                        self.init_noise_std))

    def __call__(self, obs, critic_obs):  # for init
        return self.actor(obs), self.critic(critic_obs)

    def act_mean(self, obs):
        return self.actor(obs)

    def evaluate(self, critic_obs):
        return self.critic(critic_obs)[..., 0]

    def distribution(self, obs):
        mean = self.actor(obs)
        return mean, jnp.broadcast_to(self.std, mean.shape)

    def loss_forward(self, obs, critic_obs):
        """One fused forward for the PPO loss: (mean, std, value, est_vel)."""
        mean, std = self.distribution(obs)
        return mean, std, self.critic(critic_obs)[..., 0], jnp.zeros(
            mean.shape[:-1] + (3,), mean.dtype)


class ActorCriticDH(nn.Module):
    """DH asymmetric actor-critic (reference ``actor_critic_dh.py``)."""

    num_actions: int = 12
    num_short_obs: int = 235
    num_single_obs: int = 47
    frame_stack: int = 66
    actor_hidden: Sequence[int] = (512, 256, 128)
    critic_hidden: Sequence[int] = (768, 256, 128)
    estimator_hidden: Sequence[int] = (256, 128, 64)
    filters: Sequence[int] = (32, 16)
    kernels: Sequence[int] = (6, 4)
    strides: Sequence[int] = (3, 2)
    lh_output_dim: int = 64
    init_noise_std: float = 1.0

    def setup(self):
        self.actor = MLP(self.actor_hidden, self.num_actions)
        self.critic = MLP(self.critic_hidden, 1)
        self.state_estimator = MLP(self.estimator_hidden, 3)
        self.long_history = LongHistoryCNN(
            filters=self.filters, kernels=self.kernels, strides=self.strides,
            out_dim=self.lh_output_dim, frame_stack=self.frame_stack,
            frame_dim=self.num_single_obs)
        self.std = self.param("std", lambda k: jnp.full((self.num_actions,),
                                                        self.init_noise_std))

    def _actor_input(self, obs):
        short = obs[..., -self.num_short_obs:]
        est_vel = self.state_estimator(short)
        emb = self.long_history(obs)
        return jnp.concatenate([short, est_vel, emb], axis=-1), est_vel

    def __call__(self, obs, critic_obs):  # for init
        a_in, est = self._actor_input(obs)
        return self.actor(a_in), self.critic(critic_obs), est

    def distribution(self, obs):
        a_in, _ = self._actor_input(obs)
        mean = self.actor(a_in)
        return mean, jnp.broadcast_to(self.std, mean.shape)

    def act_mean(self, obs):
        a_in, _ = self._actor_input(obs)
        return self.actor(a_in)

    def act_inference(self, obs):
        """Deployment forward: (action mean, estimated lin vel) — the
        exported-policy contract (reference ``export_policy_dh.py:24-31``)."""
        a_in, est = self._actor_input(obs)
        return self.actor(a_in), est

    def estimate_velocity(self, obs):
        return self.state_estimator(obs[..., -self.num_short_obs:])

    def evaluate(self, critic_obs):
        return self.critic(critic_obs)[..., 0]

    def loss_forward(self, obs, critic_obs):
        """One fused forward for the PPO loss: (mean, std, value, est_vel) —
        the estimator runs once and feeds both the actor input and the
        supervised MSE term (reference runs these as separate module calls;
        one traced forward lets XLA share the activations)."""
        a_in, est = self._actor_input(obs)
        mean = self.actor(a_in)
        std = jnp.broadcast_to(self.std, mean.shape)
        return mean, std, self.critic(critic_obs)[..., 0], est


# --- Feature-major (transposed) loss forward --------------------------------
#
# The PPO update's op-level profile (round 4/5, tools/profile_update.py)
# shows ~10 ms/update of per-minibatch layout passes: the row-gathered
# [B, 3102] minibatch is re-tiled into the B-minor layouts the conv/matmul
# kernels want, and the backward pass transposes activations again for the
# dW = x^T dy contractions.  Running the whole loss forward on [F, B]
# activations (features on sublanes, batch on lanes) removes both: the
# gather emits straight into the consumed layout and the backward operands
# are already transposed.  These functions consume the SAME flax param
# pytree as the module methods above (shape-driven, no new parameters) and
# are numerically the flax forward up to dot accumulation order
# (tests/test_algo.py pins the equivalence).


def _mlp_T(p, xT, act=jax.nn.elu):
    """Transposed MLP: xT [F, B] -> [out, B] with `act` on hidden layers."""
    names = sorted((n for n in p if n.startswith("Dense_")),
                   key=lambda s: int(s.split("_")[1]))
    for i, name in enumerate(names):
        W, b = p[name]["kernel"], p[name]["bias"]
        xT = jax.lax.dot_general(W, xT, (((0,), (0,)), ((), ()))) + b[:, None]
        if i < len(names) - 1:
            xT = act(xT)
    return xT


def _cnn_T(p, obsT, frame_stack, frame_dim, strides):
    """Transposed LongHistoryCNN: obsT [stack*dim, B] -> [out_dim, B]."""
    x = obsT.reshape(frame_stack, frame_dim, -1)      # [C=66, L=47, B]
    for name, s in zip(("Conv_0", "Conv_1"), strides):
        W, b = p[name]["kernel"], p[name]["bias"]     # W [K, Cin, Cout]
        K = W.shape[0]
        L_out = (x.shape[1] - K) // s + 1
        cols = [
            # window [Cin, K, B] x W [K, Cin, Cout] -> [Cout, B]; the
            # python loop keeps each window a fused slice of x instead of
            # materializing an unfolded [L_out, Cin*K, B] copy
            jax.lax.dot_general(W, x[:, pos * s: pos * s + K, :],
                                (((0, 1), (1, 0)), ((), ())))
            for pos in range(L_out)
        ]
        x = jax.nn.relu(jnp.stack(cols, axis=1) + b[:, None, None])
    # flax flattens [N, L, C] position-major -> [L*C]; match that order
    x = jnp.swapaxes(x, 0, 1).reshape(-1, x.shape[-1])
    return _mlp_T(p, x)                               # Dense_0 -> Dense_1


def loss_forward_T(net: "ActorCriticDH", params, obsT, critT):
    """Feature-major equivalent of ``ActorCriticDH.loss_forward``:
    obsT [3102, B], critT [219, B] -> (mean [B, na], std, value [B],
    est_vel [B, 3])."""
    p = params["params"]
    shortT = obsT[-net.num_short_obs:, :]
    estT = _mlp_T(p["state_estimator"], shortT)
    embT = _cnn_T(p["long_history"], obsT, net.frame_stack,
                  net.num_single_obs, net.strides)
    a_inT = jnp.concatenate(
        [shortT.astype(estT.dtype), estT, embT], axis=0)
    meanT = _mlp_T(p["actor"], a_inT)
    valueT = _mlp_T(p["critic"], critT)
    mean = meanT.T
    std = jnp.broadcast_to(p["std"], mean.shape)
    return mean, std, valueT[0], estT.T


# --- Gaussian head utilities (shared by PPO variants) ---


def sample_action(mean, std, key):
    return mean + std * jax.random.normal(key, mean.shape)


def log_prob(mean, std, action):
    z = (action - mean) / std
    return jnp.sum(-0.5 * z * z - jnp.log(std) - _HALF_LOG_2PI, axis=-1)


def entropy(std):
    return jnp.sum(0.5 + _HALF_LOG_2PI + jnp.log(std), axis=-1)


def gaussian_kl(mu_old, sigma_old, mu_new, sigma_new):
    """Reference KL formula (``dh_ppo.py:141-143``), per sample."""
    return jnp.sum(
        jnp.log(sigma_new / sigma_old + 1e-5)
        + (jnp.square(sigma_old) + jnp.square(mu_old - mu_new))
        / (2.0 * jnp.square(sigma_new))
        - 0.5,
        axis=-1,
    )
