"""On-device rollout storage + GAE + minibatching.

TPU-native equivalent of the reference's ``RolloutStorage``
(``humanoid/algo/ppo/rollout_storage.py``): trajectories are collected by a
``lax.scan`` directly into ``[T, N, ...]`` device arrays (never leaving the
chip), returns/advantages come from a reverse scan, and minibatches are one
random permutation of the flattened ``T*N`` samples reused across learning
epochs — exactly the reference's generator semantics
(``rollout_storage.py:129-173``).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class Transition(NamedTuple):
    """One step of experience for all envs ([N, ...]); stacked by scan to
    [T, N, ...]."""

    obs: jnp.ndarray
    critic_obs: jnp.ndarray
    actions: jnp.ndarray
    rewards: jnp.ndarray
    dones: jnp.ndarray
    values: jnp.ndarray
    log_probs: jnp.ndarray
    mu: jnp.ndarray
    sigma: jnp.ndarray


def compute_gae(traj: Transition, last_values: jnp.ndarray, gamma: float,
                lam: float, axis_name=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Standard reverse-scan GAE (reference ``compute_returns``,
    ``rollout_storage.py:97-119``).  Returns (returns, normalized advantages)."""

    def scan_fn(carry, t):
        next_adv, next_val = carry
        reward, done, value = t
        not_done = 1.0 - done.astype(jnp.float32)
        delta = reward + gamma * next_val * not_done - value
        adv = delta + gamma * lam * not_done * next_adv
        return (adv, value), adv

    (_, _), advantages = jax.lax.scan(
        scan_fn, (jnp.zeros_like(last_values), last_values),
        (traj.rewards, traj.dones, traj.values), reverse=True)
    returns = advantages + traj.values
    mean = jnp.mean(advantages)
    sq = jnp.mean(jnp.square(advantages))
    if axis_name is not None:
        mean = jax.lax.pmean(mean, axis_name)
        sq = jax.lax.pmean(sq, axis_name)
    std = jnp.sqrt(jnp.maximum(sq - jnp.square(mean), 0.0))
    adv_norm = (advantages - mean) / (std + 1e-8)
    return returns, adv_norm


def flatten_batch(tree):
    """[T, N, ...] -> [T*N, ...] for minibatch SGD."""
    return jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), tree)


def minibatch_indices(key, total: int, num_minibatches: int) -> jnp.ndarray:
    """One permutation split into minibatches (shape [M, B]); the same split
    is reused across epochs, matching the reference generator."""
    batch = total // num_minibatches
    perm = jax.random.permutation(key, total)
    return perm[: batch * num_minibatches].reshape(num_minibatches, batch)


# NOTE (measured dead end): frame-based obs storage — keeping only the new
# 47-dim frame per step and reconstructing the 66-frame windows at update
# time — saves the scan-side obs writes but pays every byte back
# materializing the windows before minibatching, and the [N,66,47] reset-mask
# reshape pads the 47-lane minor dim to 128 on TPU (~3x traffic).  Direct
# bf16 storage of the flat stacked obs is strictly better; don't revisit.
