"""Training entry point (reference ``humanoid/scripts/train.py``).

    python -m ti5_isaacgym_tpu.scripts.train --task t1_dh_stand --num_envs 4096
"""
from __future__ import annotations

from ..utils.helpers import get_args, set_seed


def train(args):
    import os
    import time

    os.environ.setdefault("TI5_VERBOSE", "1")  # bring-up prints on for the CLI
    # donated carry on the production training path (round-5: +2.4 % bench,
    # 1,490k live fps @4096; validated on a 60-iteration live run).  The
    # learn loop never reuses an input carry, and save() completes its orbax
    # write synchronously before the next iteration can alias the buffers.
    os.environ.setdefault("TI5_DONATE_CARRY", "1")
    if getattr(args, "coordinator", None) is not None:
        # Multi-host bring-up MUST precede anything that initializes the XLA
        # backend — which includes importing modules with jax computations at
        # module scope (the networks module's Gaussian constants), so the
        # registry import stays below this call.
        from ..parallel import distributed_init

        distributed_init(args.coordinator, args.num_processes, args.process_id)

    from ..utils.jax_setup import setup_jax
    from ..utils.registry import task_registry
    from .record_config import record_config

    setup_jax()
    t0 = time.time()
    print(f"[train] building env/runner (t=0.0s)", flush=True)
    env, env_cfg = task_registry.make_env(args.task, args)
    runner, train_cfg = task_registry.make_alg_runner(env, args.task, args,
                                                      log_root=args.log_root)
    set_seed(train_cfg.seed)
    if runner.log_dir:
        record_config(runner.log_dir, env_cfg, train_cfg)
    if getattr(args, "n_devices", None) and args.n_devices > 1:
        # multi-chip DP: envs sharded over the mesh, gradients psum'd
        # (SURVEY §2.3/§5.8 — the reference's dead --horovod, done properly)
        from ..parallel import ShardedRunner, make_mesh
        from ..parallel.trainer import coordination_barrier

        # align the processes after their (independently-cached, hence
        # skewed) env-build compiles before any collective work; no-op
        # when the job is single-process
        coordination_barrier("ti5_mesh_bringup")
        resume_path = getattr(runner, "_resume_path", None)
        runner = ShardedRunner(runner, make_mesh(args.n_devices))
    else:
        resume_path = getattr(runner, "_resume_path", None)
    print(f"[train] env/runner ready (t={time.time()-t0:.1f}s); "
          f"bring-up + first-iteration compile next", flush=True)
    carry = runner.load(resume_path) if resume_path else None
    n_iter = train_cfg.runner.max_iterations
    if getattr(args, "profile", None):
        # tracing/profiling subsystem (SURVEY §5.1): warm up past compiles,
        # then capture a device trace of 3 steady-state iterations
        import jax

        carry = runner.learn(2, carry=carry, log_every=1)
        with jax.profiler.trace(args.profile):
            carry = runner.learn(3, carry=carry, log_every=1)
        print(f"profiler trace written to {args.profile}")
        n_iter = max(n_iter - 5, 0)
    runner.learn(n_iter, carry=carry, log_every=args.log_every)


def main(argv=None):
    train(get_args(argv))


if __name__ == "__main__":
    main()
