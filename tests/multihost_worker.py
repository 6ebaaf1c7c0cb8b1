"""Multi-process (multi-host stand-in) worker for the distributed backend test.

Executed as a subprocess by ``tests/test_parallel.py::
test_multihost_two_process_update``: two of these processes, each owning 4
virtual CPU devices, bring up ``jax.distributed`` through the SAME
:func:`ti5_isaacgym_tpu.parallel.trainer.distributed_init` entry the train CLI
uses, build one global 8-device mesh, and run one full-batch DH-PPO update
with gradients psum'd ACROSS the process boundary (gloo collectives — the
DCN stand-in; on a real pod the same program rides ICI/DCN).  The resulting
replicated params are written to ``--out`` for the parent to compare against
a single-process update (SURVEY §5.8; reference's dead ``--horovod``,
``humanoid/utils/helpers.py:179-182``).

Module top level stays import-light so the parent test can import
:func:`build_inputs` / :func:`reference_update` without touching its own JAX
backend configuration.
"""
from __future__ import annotations

import argparse
import os
import sys

# Standalone-subprocess bootstrap: sys.path[0] is tests/, not the repo root,
# so the package import fails unless it happens to be pip-installed.  Pin the
# repo root explicitly — the worker must run from any environment the parent
# test runs from.
_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)

AXIS = "data"


def build_inputs():
    """Deterministic tiny trajectory + params, identical on every process."""
    import jax
    import jax.numpy as jnp

    from ti5_isaacgym_tpu.algo import networks as nets
    from ti5_isaacgym_tpu.algo.rollout import Transition

    T, N = 2, 16
    ks = jax.random.split(jax.random.PRNGKey(7), 8)
    obs = (jax.random.normal(ks[0], (T, N, 3102)) * 0.3).astype(jnp.bfloat16)
    priv = (jax.random.normal(ks[1], (T, N, 219)) * 0.3).astype(jnp.bfloat16)
    actions = jax.random.normal(ks[2], (T, N, 12)) * 0.5
    mu = actions + jax.random.normal(ks[3], (T, N, 12)) * 0.05
    sigma = jnp.ones((T, N, 12))
    traj = Transition(
        obs=obs, critic_obs=priv, actions=actions,
        rewards=jax.random.normal(ks[4], (T, N)) * 0.1,
        dones=jnp.zeros((T, N), bool),
        values=jax.random.normal(ks[5], (T, N)) * 0.2,
        log_probs=nets.log_prob(mu, sigma, actions), mu=mu, sigma=sigma,
    )
    last_values = jax.random.normal(ks[6], (N,)) * 0.2
    params = nets.ActorCriticDH().init(
        jax.random.PRNGKey(0), jnp.zeros((1, 3102)), jnp.zeros((1, 219)))
    return params, traj, last_values


def _ppo_pieces():
    from ti5_isaacgym_tpu.algo import networks as nets
    from ti5_isaacgym_tpu.algo.ppo import PPO, PPOConfig, init_train_state

    cfg = PPOConfig(num_learning_epochs=1, num_mini_batches=1,
                    learning_rate=1e-3)
    return cfg, nets.ActorCriticDH(), PPO, init_train_state


def full_batch_grads(alg, cfg, params, traj, last_values, axis_name=None):
    """Gradient of the combined DH-PPO loss over the whole batch — the
    quantity whose cross-process psum the test verifies.  (Comparing params
    after ONE Adam step is uninformative: the first step is ~lr*sign(g), so
    any fp-reduction reordering of a near-zero gradient entry flips it by
    2*lr, while a *missing* psum shifts the gradient itself by O(1).)"""
    import jax

    from ti5_isaacgym_tpu.algo.rollout import compute_gae, flatten_batch

    ret, adv = compute_gae(traj, last_values, cfg.gamma, cfg.lam,
                           axis_name=axis_name)
    flat = flatten_batch(traj)
    if axis_name is not None:
        # cast OUTSIDE jax.grad so the cotangent stays shard-local (see the
        # matching comment in algo/ppo.py: grad wrt unvarying params under
        # vma-typed shard_map auto-psums, making the pmean a no-op)
        params = jax.lax.pcast(params, axis_name, to="varying")
    g = jax.grad(lambda p: alg._loss(p, flat, ret.reshape(-1),
                                     adv.reshape(-1))[0])(params)
    if axis_name is not None:
        g = jax.lax.pmean(g, axis_name)
    return g


def reference_update():
    """Single-process full-batch update + gradient (the ground truth the
    2-process psum'd run must reproduce)."""
    import jax

    from ti5_isaacgym_tpu.algo.rollout import compute_gae

    cfg, net, PPO, init_train_state = _ppo_pieces()
    params, traj, last_values = build_inputs()
    alg = PPO(cfg, net, dh=True, axis_name=None)
    ts0 = init_train_state(cfg, params)
    up_key = jax.random.PRNGKey(2)

    @jax.jit
    def single(ts, traj, lv):
        ret, adv = compute_gae(traj, lv, cfg.gamma, cfg.lam)
        ts, m = alg.update(ts, traj, ret, adv, up_key)
        return ts, m, full_batch_grads(alg, cfg, ts0.params, traj, lv)

    return single(ts0, traj, last_values)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num_processes", type=int, required=True)
    ap.add_argument("--process_id", type=int, required=True)
    ap.add_argument("--local_devices", type=int, default=4)
    ap.add_argument("--out", required=True)
    args = ap.parse_args(argv)

    # Backend setup must precede the first jax import in THIS process: pin to
    # CPU (never claim the single-client TPU tunnel), give this process its
    # own virtual devices, and select gloo so psum crosses process boundaries.
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["TI5_PLATFORM"] = "cpu"
    os.environ.pop("XLA_FLAGS", None)
    import jax

    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.config.update("jax_num_cpu_devices", args.local_devices)

    from ti5_isaacgym_tpu.parallel.trainer import distributed_init

    distributed_init(args.coordinator, args.num_processes, args.process_id)

    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from ti5_isaacgym_tpu.algo.rollout import compute_gae

    devices = jax.devices("cpu")
    n_global = args.num_processes * args.local_devices
    assert len(devices) == n_global, (len(devices), n_global)
    assert jax.process_count(backend="cpu") == args.num_processes
    mesh = Mesh(np.array(devices), (AXIS,))

    cfg, net, PPO, init_train_state = _ppo_pieces()
    params, traj, last_values = build_inputs()
    alg = PPO(cfg, net, dh=True, axis_name=AXIS)
    ts0 = init_train_state(cfg, params)
    up_key = jax.random.PRNGKey(2)

    def to_global(x, spec):
        x = np.asarray(jax.device_get(x))
        return jax.make_array_from_callback(
            x.shape, NamedSharding(mesh, spec), lambda idx: x[idx])

    traj_specs = jax.tree.map(lambda _: P(None, AXIS), traj)
    traj_g = jax.tree.map(to_global, traj, traj_specs)
    lv_g = to_global(last_values, P(AXIS))
    ts_g = jax.tree.map(lambda x: to_global(x, P()), ts0)

    def sharded(ts, traj, lv):
        ret, adv = compute_gae(traj, lv, cfg.gamma, cfg.lam, axis_name=AXIS)
        new_ts, m = alg.update(ts, traj, ret, adv, up_key)
        g = full_batch_grads(alg, cfg, ts.params, traj, lv, axis_name=AXIS)
        return new_ts, jax.tree.map(lambda x: jax.lax.pmean(x, AXIS), m), g

    fn = jax.jit(jax.shard_map(
        sharded, mesh=mesh,
        in_specs=(P(), traj_specs, P(AXIS)), out_specs=(P(), P(), P())))
    ts1, metrics, grads = fn(ts_g, traj_g, lv_g)
    jax.block_until_ready(ts1)

    out = {f"p{i}": np.asarray(l.addressable_data(0), dtype=np.float32)
           for i, l in enumerate(jax.tree.leaves(ts1.params))}
    out.update({f"g{i}": np.asarray(l.addressable_data(0), dtype=np.float32)
                for i, l in enumerate(jax.tree.leaves(grads))})
    for k in ("value_loss", "surrogate_loss", "estimator_loss", "kl"):
        out[k] = np.float32(np.asarray(metrics[k].addressable_data(0)))
    out["lr"] = np.float32(np.asarray(ts1.lr.addressable_data(0)))
    np.savez(args.out, **out)
    print(f"[worker {args.process_id}] wrote {args.out} "
          f"({len(out)} arrays, {len(devices)} global devices)", flush=True)


if __name__ == "__main__":
    main()
