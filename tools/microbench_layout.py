#!/usr/bin/env python3
"""Per-op cost of elementwise chains at different array layouts on TPU.

A long dependent chain of rsqrt/mul/add ops (defeats trivial folding) over:
  [N] 1-D, [N/128, 128] 2-D, [8, N/8] 2-D
If 1-D arrays waste sublanes, the 2-D variants will be up to 8x faster.
"""
import sys
import time

import jax
import jax.numpy as jnp

N = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
OPS = 2000


def chain(x):
    # dependent chain: OPS fused elementwise ops that can't be folded
    def body(i, v):
        v = v * 1.0000001 + 0.0000001
        return v
    return jax.lax.fori_loop(0, OPS // 2, body, x)


def chain_unrolled(x, y):
    # unrolled independent-ish chain closer to real physics op mix
    a, b = x, y
    for i in range(OPS // 4):
        a = a * b + 0.1
        b = b - a * 0.001
    return a, b


def timeit(fn, *args, iters=20):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


shapes = {
    "[N] 1-D": (N,),
    "[N/128,128]": (N // 128, 128),
    "[8,N/8]": (8, N // 8),
}
print("devices:", jax.devices())
for name, shp in shapes.items():
    x = jnp.ones(shp, jnp.float32)
    y = jnp.full(shp, 1.5, jnp.float32)
    t1 = timeit(chain, x)
    t2 = timeit(chain_unrolled, x, y)
    print(f"{name:14s} fori-chain {t1*1e6:9.1f} us ({t1/OPS*1e9*2:7.2f} ns/op)  "
          f"unrolled {t2*1e6:9.1f} us ({t2/OPS*1e9*2:7.2f} ns/op)", flush=True)
