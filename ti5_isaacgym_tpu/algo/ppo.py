"""PPO / DH-PPO update rules (reference ``humanoid/algo/ppo/ppo.py`` and
``dh_ppo.py``).

One implementation serves both variants: ``DHPPO`` adds the supervised
state-estimator MSE term (regressing the base linear velocity out of the
privileged observation at ``lin_vel_idx``) to the PPO loss
(reference ``dh_ppo.py:120-182``) — a single Adam step over the combined
loss, exactly as the reference does (its separate estimator optimizer is
created but its step is commented out, ``dh_ppo.py:184-189``).

TPU-first: the update is a PYTHON-UNROLLED epochs x minibatches dataflow over
one random permutation of the flattened ``[T*N]`` batch (see ``update()`` —
per-minibatch gathers fuse into the consumer layouts; the earlier nested
``lax.scan`` forced extra full-batch HBM passes); the adaptive-KL learning
rate is a carried scalar applied after ``scale_by_adam`` so no optimizer
rebuild is ever traced.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from . import networks as nets
from .rollout import Transition, flatten_batch, minibatch_indices


@struct.dataclass
class PPOConfig:
    clip_param: float = struct.field(pytree_node=False, default=0.2)
    num_learning_epochs: int = struct.field(pytree_node=False, default=2)
    num_mini_batches: int = struct.field(pytree_node=False, default=4)
    value_loss_coef: float = struct.field(pytree_node=False, default=1.0)
    entropy_coef: float = struct.field(pytree_node=False, default=0.001)
    gamma: float = struct.field(pytree_node=False, default=0.994)
    lam: float = struct.field(pytree_node=False, default=0.9)
    desired_kl: float = struct.field(pytree_node=False, default=0.01)
    max_grad_norm: float = struct.field(pytree_node=False, default=1.0)
    learning_rate: float = struct.field(pytree_node=False, default=1e-5)
    min_lr: float = struct.field(pytree_node=False, default=1e-5)
    max_lr: float = struct.field(pytree_node=False, default=1e-2)
    use_clipped_value_loss: bool = struct.field(pytree_node=False, default=True)
    schedule: str = struct.field(pytree_node=False, default="adaptive")
    # DH extras
    estimator_loss: bool = struct.field(pytree_node=False, default=True)
    lin_vel_idx: int = struct.field(pytree_node=False, default=199)


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    lr: jnp.ndarray          # adaptive-KL learning rate (scalar)
    update_count: jnp.ndarray


def make_optimizer(cfg: PPOConfig):
    """clip-then-adam, direction only; the carried ``lr`` scales updates."""
    return optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.scale_by_adam(),
    )


def init_train_state(cfg: PPOConfig, params) -> TrainState:
    opt = make_optimizer(cfg)
    return TrainState(
        params=params,
        opt_state=opt.init(params),
        lr=jnp.asarray(cfg.learning_rate, jnp.float32),
        update_count=jnp.zeros((), jnp.int32),
    )


class PPO:
    """Update rule bound to a network module (vanilla or DH)."""

    def __init__(self, cfg: PPOConfig, network, *, dh: bool = True,
                 axis_name=None):
        self.cfg = cfg
        self.network = network
        self.dh = dh and cfg.estimator_loss
        self.optimizer = make_optimizer(cfg)
        # when set (by the parallel trainer), gradients and the KL statistic
        # are pmean'd across the mesh inside the update
        self.axis_name = axis_name

    # --- acting -------------------------------------------------------

    def act(self, params, obs, critic_obs, key):
        mean, std = self.network.apply(params, obs, method="distribution")
        action = nets.sample_action(mean, std, key)
        logp = nets.log_prob(mean, std, action)
        value = self.network.apply(params, critic_obs, method="evaluate")
        return action, logp, mean, std, value

    def value(self, params, critic_obs):
        return self.network.apply(params, critic_obs, method="evaluate")

    # --- loss ---------------------------------------------------------

    def _loss(self, params, mb: Transition, mb_returns, mb_adv):
        cfg = self.cfg
        mean, std, value, est_vel = self.network.apply(
            params, mb.obs, mb.critic_obs, method="loss_forward")
        logp = nets.log_prob(mean, std, mb.actions)
        ent = nets.entropy(std)

        ratio = jnp.exp(logp - mb.log_probs)
        surr = -mb_adv * ratio
        surr_clipped = -mb_adv * jnp.clip(ratio, 1.0 - cfg.clip_param, 1.0 + cfg.clip_param)
        surrogate_loss = jnp.mean(jnp.maximum(surr, surr_clipped))

        if cfg.use_clipped_value_loss:
            v_clipped = mb.values + jnp.clip(value - mb.values, -cfg.clip_param, cfg.clip_param)
            v_loss = jnp.maximum(jnp.square(value - mb_returns),
                                 jnp.square(v_clipped - mb_returns)).mean()
        else:
            v_loss = jnp.square(mb_returns - value).mean()

        loss = surrogate_loss + cfg.value_loss_coef * v_loss - cfg.entropy_coef * ent.mean()
        est_loss = jnp.zeros(())
        if self.dh:
            ref_vel = jax.lax.dynamic_slice_in_dim(
                mb.critic_obs, cfg.lin_vel_idx, 3, axis=-1)
            est_loss = jnp.mean(jnp.square(est_vel - ref_vel))
            loss = loss + est_loss
        return loss, (surrogate_loss, v_loss, est_loss, mean, std)

    # --- update -------------------------------------------------------

    def update(self, ts: TrainState, traj: Transition, returns, advantages,
               key) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        """Epochs x minibatches over one permutation of the flattened batch.

        Dataflow is tuned from an op-level TPU profile (round 4,
        tools/profile_update.py + exp_update_variants.py at 8192 envs):

        * the epoch/minibatch loops are PYTHON-UNROLLED — the earlier nested
          ``lax.scan`` forced the shuffled [M, B, 3102] obs copy into a
          scan-xs layout (one extra 1.2 GB pass) and re-sliced a minibatch
          copy per step (another); 96 -> 80 ms;
        * obs/critic_obs are gathered PER MINIBATCH straight from the flat
          trajectory — the per-minibatch gather fuses into the transposed
          (B-minor) layouts the conv/matmul kernels want, which a shared
          gather-once copy could not, so 2x nominal gather traffic is net
          faster than materializing the shuffled copy (73 -> 67.5 ms);
        * the 7 small per-sample tensors are packed into ONE [T*N, 3*na+4]
          row-gather — separate 1-D gathers of returns/advantages/values/
          log_probs scalarize on TPU at ~1.7 ms EACH.

        Semantics are unchanged from the reference generator
        (rollout_storage.py:129-173): same permutation, same partition into
        minibatches, same order, reused across epochs.
        """
        cfg = self.cfg
        M = cfg.num_mini_batches
        flat = flatten_batch(traj)
        total = flat.values.shape[0]
        B = total // M
        fidx = minibatch_indices(key, total, M).reshape(-1)
        na = flat.actions.shape[-1]
        packed = jnp.concatenate([
            flat.actions, flat.mu, flat.sigma,
            flat.values[:, None], flat.log_probs[:, None],
            returns.reshape(-1, 1), advantages.reshape(-1, 1)], axis=1)
        g_small = packed[fidx]

        def mb_step(ts: TrainState, mb, mb_ret, mb_adv):
            params_in = ts.params
            if self.axis_name is not None:
                # Differentiate wrt a VARYING copy of the replicated params.
                # Under vma-typed shard_map (check_vma=True) ``jax.grad`` of
                # unvarying params auto-psums the cotangent (the transpose of
                # the unvarying->varying broadcast), which silently turns the
                # pmean below into a no-op and leaves gradients scaled by the
                # shard count (scale-invisible to Adam's direction, but wrong
                # — and inconsistent with the check_vma=False semantics).
                # Casting first keeps the cotangent local; the pmean then
                # really averages (verified by the 2-process gradient test,
                # tests/test_parallel.py::test_multihost_two_process_update).
                params_in = jax.lax.pcast(params_in, self.axis_name,
                                          to="varying")
            (loss, aux), grads = jax.value_and_grad(self._loss, has_aux=True)(
                params_in, mb, mb_ret, mb_adv)
            surrogate_loss, v_loss, est_loss, mu_new, sigma_new = aux

            # adaptive-KL LR (reference dh_ppo.py:139-151): measured with the
            # *current* params (== the loss forward's distribution — the
            # reference uses one forward for both) and applied to this step
            lr = ts.lr
            if cfg.desired_kl is not None and cfg.schedule == "adaptive":
                kl_mean = jnp.mean(nets.gaussian_kl(mb.mu, mb.sigma, mu_new, sigma_new))
                if self.axis_name is not None:
                    kl_mean = jax.lax.pmean(kl_mean, self.axis_name)
                lr = jnp.where(kl_mean > cfg.desired_kl * 2.0,
                               jnp.maximum(cfg.min_lr, lr / 1.5), lr)
                lr = jnp.where((kl_mean < cfg.desired_kl / 2.0) & (kl_mean > 0.0),
                               jnp.minimum(cfg.max_lr, lr * 1.5), lr)
            else:
                kl_mean = jnp.zeros(())

            if self.axis_name is not None:
                grads = jax.lax.pmean(grads, self.axis_name)
            updates, opt_state = self.optimizer.update(grads, ts.opt_state, ts.params)
            updates = jax.tree.map(lambda u: -lr * u, updates)
            params = optax.apply_updates(ts.params, updates)
            ts = TrainState(params=params, opt_state=opt_state, lr=lr,
                            update_count=ts.update_count + 1)
            return ts, jnp.stack([v_loss, surrogate_loss, est_loss, kl_mean, lr])

        stats = []
        for _ in range(cfg.num_learning_epochs):
            for b in range(M):
                sl = partial(jax.lax.slice_in_dim, start_index=b * B,
                             limit_index=(b + 1) * B, axis=0)
                sm = sl(g_small)
                bidx = sl(fidx)
                mb = Transition(
                    obs=flat.obs[bidx], critic_obs=flat.critic_obs[bidx],
                    actions=sm[:, :na], mu=sm[:, na:2 * na],
                    sigma=sm[:, 2 * na:3 * na], values=sm[:, 3 * na],
                    log_probs=sm[:, 3 * na + 1], rewards=None, dones=None)
                ts, st = mb_step(ts, mb, sm[:, 3 * na + 2], sm[:, 3 * na + 3])
                stats.append(st)
        m = jnp.stack(stats).mean(axis=0)
        return ts, {
            "value_loss": m[0], "surrogate_loss": m[1],
            "estimator_loss": m[2], "kl": m[3], "lr": m[4],
        }
