"""Stateful VecEnv facade (reference ``humanoid/algo/vec_env.py`` ABC).

The functional API (`T1DHStandEnv.step(state, actions)`) is the native
interface; this wrapper carries the state mutably and exposes the reference's
5-tuple contract for code written against legged-gym-style loops.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


class VecEnv:
    """``step(actions) -> (obs, privileged_obs, rewards, resets, extras)``."""

    def __init__(self, env, seed: int = 0):
        self.env = env
        self.num_envs = env.num_envs
        self.num_obs = env.cfg.env.num_observations
        self.num_privileged_obs = env.cfg.env.num_privileged_obs
        self.num_actions = env.cfg.env.num_actions
        self.max_episode_length = env.max_episode_length
        self._step = jax.jit(env.step)
        self._reset = jax.jit(env.reset)
        self.state = jax.jit(env.init_state)(jax.random.PRNGKey(seed))
        self._obs = None
        self._priv = None
        self.extras = {}

    def reset(self):
        self.state, self._obs, self._priv = self._reset(self.state)
        return self._obs, self._priv

    def step(self, actions: jnp.ndarray):
        self.state, self._obs, self._priv, rew, reset, extras = self._step(
            self.state, actions)
        self.extras = extras
        return self._obs, self._priv, rew, reset, extras

    def get_observations(self):
        return self._obs

    def get_privileged_observations(self):
        return self._priv
