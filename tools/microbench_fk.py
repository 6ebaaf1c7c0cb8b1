#!/usr/bin/env python3
"""Why does component-form FK cost ~1.8 ms @4096 when its op count says ~0.1?

Times contact_point_xy and ctx_kinematics at [N] vs [8, N/8] layouts, plus a
pure dependent-chain FK-like kernel for reference.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from ti5_isaacgym_tpu.utils.jax_setup import setup_jax

setup_jax()

N = int(sys.argv[1]) if len(sys.argv) > 1 else 4096


def timeit(fn, *args, iters=30, warmup=5):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    from ti5_isaacgym_tpu.physics.engine import PhysicsState
    from ti5_isaacgym_tpu.physics.engine_core import (contact_point_xy,
                                                      ctx_kinematics)
    from ti5_isaacgym_tpu.physics.model import load_t1

    model = load_t1()
    rng = np.random.RandomState(0)
    quat = rng.normal(size=(N, 4)).astype(np.float32)
    quat /= np.linalg.norm(quat, axis=-1, keepdims=True)
    phys = PhysicsState(
        base_pos=jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32)),
        base_quat=jnp.asarray(quat),
        base_vel=jnp.asarray(rng.normal(size=(N, 6)).astype(np.float32)),
        qpos=jnp.asarray(rng.uniform(-1, 1, size=(N, 12)).astype(np.float32)),
        qvel=jnp.asarray(rng.normal(size=(N, 12)).astype(np.float32)),
        cp_anchor=jnp.zeros((N, model.cp_pos.shape[0], 3)))
    phys2 = jax.tree.map(lambda x: x.reshape((8, N // 8) + x.shape[1:]), phys)

    print("devices:", jax.devices(), " N =", N)
    f = jax.jit(lambda s: contact_point_xy(model, s))
    print(f"contact_point_xy [N]     : {timeit(f, phys)*1e3:8.3f} ms")
    f2 = jax.jit(lambda s: contact_point_xy(model, s))
    print(f"contact_point_xy [8,N/8] : {timeit(f2, phys2)*1e3:8.3f} ms")
    g = jax.jit(lambda s: ctx_kinematics(model, s))
    print(f"ctx_kinematics [N]       : {timeit(g, phys)*1e3:8.3f} ms")
    g2 = jax.jit(lambda s: ctx_kinematics(model, s))
    print(f"ctx_kinematics [8,N/8]   : {timeit(g2, phys2)*1e3:8.3f} ms")

    # positions-only FK without the contact-point expansion
    def fk_pos_only(s):
        from ti5_isaacgym_tpu.physics import spatial3 as s3
        nb = model.nb
        parent = [int(p) for p in np.asarray(model.parent)]
        bp = s3.v3_unstack(s.base_pos)
        bq = s3.q_unstack(s.base_quat)
        qpos = [s.qpos[..., j] for j in range(model.num_dof)]
        axis_c = [tuple(float(v) for v in np.asarray(model.joint_axis)[i])
                  for i in range(nb)]
        jpos_c = [tuple(float(v) for v in np.asarray(model.joint_pos)[i])
                  for i in range(nb)]
        pos = [bp]
        rot = [s3.q_to_m33(bq)]
        for i in range(1, nb):
            p = parent[i]
            Rj = s3.q_to_m33(s3.q_from_axis_angle(axis_c[i], qpos[i - 1]))
            rot.append(s3.m33_mm(rot[p], Rj))
            pos.append(s3.v3_add(pos[p], s3.m33_mv(rot[p], jpos_c[i])))
        return sum(pos[-1], pos[1][0])

    h2 = jax.jit(fk_pos_only)
    print(f"fk positions only [8,N/8]: {timeit(h2, phys2)*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
