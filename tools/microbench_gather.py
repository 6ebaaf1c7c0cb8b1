#!/usr/bin/env python3
"""Compare XLA:TPU lowerings for the heightfield lookup.

The physics needs, per contact point (32/env), the 2x2 corner heights of the
cell under the point.  Today: 20 element-gathers per substep -> ~150-270 ms
per 10 substeps @4096 envs.  Candidates measured here (all per policy step):

  a) 4 element-gathers of [32*N] from the [2100,2100] table (baseline unit)
  b) 1 slice-gather with slice_sizes=(2,2)
  c) flattened-index jnp.take (4x)
  d) per-env window: N batched dynamic-slices of (64,64)
  e) per-env window via slice-gather slice_sizes=(64,64)
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

R = C = 2100
N = 4096
K = 32

table = jnp.asarray(np.random.rand(R, C).astype(np.float32))
key = jax.random.PRNGKey(0)
i0 = jax.random.randint(key, (K, N), 0, R - 2)
j0 = jax.random.randint(jax.random.PRNGKey(1), (K, N), 0, C - 2)
ei = jax.random.randint(jax.random.PRNGKey(2), (N,), 0, R - 66)
ej = jax.random.randint(jax.random.PRNGKey(3), (N,), 0, C - 66)


def timeit(fn, *args, iters=5, warmup=2):
    f = jax.jit(fn)
    for _ in range(warmup):
        out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def a_four_gathers(i0, j0):
    h00 = table[i0, j0]
    h10 = table[i0 + 1, j0]
    h01 = table[i0, j0 + 1]
    h11 = table[i0 + 1, j0 + 1]
    return h00 + h10 + h01 + h11


def b_slice_gather(i0, j0):
    idx = jnp.stack([i0.ravel(), j0.ravel()], axis=-1)       # [K*N, 2]
    out = jax.lax.gather(
        table, idx,
        jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2), collapsed_slice_dims=(),
            start_index_map=(0, 1)),
        slice_sizes=(2, 2), mode="clip")                      # [K*N, 2, 2]
    return out.sum((1, 2))


def c_flat_take(i0, j0):
    flat = table.ravel()
    idx = i0 * C + j0
    h00 = jnp.take(flat, idx, mode="clip")
    h10 = jnp.take(flat, idx + C, mode="clip")
    h01 = jnp.take(flat, idx + 1, mode="clip")
    h11 = jnp.take(flat, idx + C + 1, mode="clip")
    return h00 + h10 + h01 + h11


def d_batched_dynslice(ei, ej):
    def one(i, j):
        return jax.lax.dynamic_slice(table, (i, j), (64, 64))
    return jax.vmap(one)(ei, ej).sum((1, 2))


def e_window_slice_gather(ei, ej):
    idx = jnp.stack([ei, ej], axis=-1)                       # [N, 2]
    out = jax.lax.gather(
        table, idx,
        jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2), collapsed_slice_dims=(),
            start_index_map=(0, 1)),
        slice_sizes=(64, 64), mode="clip")                    # [N, 64, 64]
    return out.sum((1, 2))


print("devices:", jax.devices())
for name, fn, args in [
    ("a) 4x element-gather [32,N]", a_four_gathers, (i0, j0)),
    ("b) 1x slice-gather (2,2)", b_slice_gather, (i0, j0)),
    ("c) 4x flat take", c_flat_take, (i0, j0)),
    ("d) N x dynamic-slice 64x64", d_batched_dynslice, (ei, ej)),
    ("e) slice-gather (64,64)", e_window_slice_gather, (ei, ej)),
]:
    try:
        t = timeit(fn, *args)
        print(f"{name:30s}: {t*1e3:9.3f} ms", flush=True)
    except Exception as ex:
        print(f"{name:30s}: FAILED {type(ex).__name__}: {str(ex)[:120]}", flush=True)


# f) packed cell-corner table: one element-gather, trailing contiguous dim 4
table4 = jnp.stack([table, table, table, table], axis=-1).reshape(R * C, 4)


def f_packed_corner(i0, j0):
    idx = (i0 * C + j0).ravel()
    out = table4[idx]           # [K*N, 4] — 1 fragment per point
    return out.sum(-1)


def g_packed_take(i0, j0):
    idx = (i0 * C + j0).ravel()
    out = jnp.take(table4, idx, axis=0, mode="clip")
    return out.sum(-1)


for name, fn, args in [
    ("f) packed corners [R*C,4]", f_packed_corner, (i0, j0)),
    ("g) packed take axis0", g_packed_take, (i0, j0)),
]:
    try:
        t = timeit(fn, *args)
        print(f"{name:30s}: {t*1e3:9.3f} ms", flush=True)
    except Exception as ex:
        print(f"{name:30s}: FAILED {type(ex).__name__}: {str(ex)[:120]}", flush=True)
