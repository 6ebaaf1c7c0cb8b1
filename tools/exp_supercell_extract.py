#!/usr/bin/env python3
"""Supercell corner-extraction variants (round-5 perf lever).

In-program profile (tools/profile_update.py 8192 rollout): the extraction
chain costs ~1.27 ms/policy step — fusion.994 [8192,64,47] f32 one-hot row
contraction lowered to the VPU (1.16 GMAC compute-bound) + column mult-sums
reading the materialized f32 intermediate.  Variants aim the row stage at
the MXU and shrink the intermediate.

Run: python tools/exp_supercell_extract.py [N]
"""
import sys, time
import jax, jax.numpy as jnp, numpy as np
from ti5_isaacgym_tpu.utils.jax_setup import setup_jax
setup_jax()

N = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
K, PG = 32, 47
rng = np.random.default_rng(0)
patch = jnp.asarray(rng.standard_normal((N, PG, PG)), jnp.bfloat16)
iu = jnp.asarray(rng.integers(0, PG - 1, size=(N, K)), jnp.int32)
iv = jnp.asarray(rng.integers(0, PG - 1, size=(N, K)), jnp.int32)

def timeit(fn, *a, iters=20, warmup=3):
    f = jax.jit(fn)
    for _ in range(warmup): o = f(*a)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(iters): o = f(*a)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / iters, o

r = jnp.arange(PG, dtype=jnp.int32)

def va(patch, iu, iv):   # shipped: einsum f32 + col mult-sums
    sel_r = jnp.concatenate([(iu[..., None] == r), (iu[..., None] == (r - 1))],
                            axis=1).astype(jnp.bfloat16)
    rows = jnp.einsum("nkr,nrc->nkc", sel_r, patch,
                      preferred_element_type=jnp.float32)
    rows0, rows1 = rows[:, :K], rows[:, K:]
    c0 = (iv[..., None] == r).astype(jnp.float32)
    c1 = (iv[..., None] == (r - 1)).astype(jnp.float32)
    return (jnp.sum(rows0 * c0, -1), jnp.sum(rows0 * c1, -1),
            jnp.sum(rows1 * c0, -1), jnp.sum(rows1 * c1, -1))

def vb(patch, iu, iv):   # bf16 intermediate
    sel_r = jnp.concatenate([(iu[..., None] == r), (iu[..., None] == (r - 1))],
                            axis=1).astype(jnp.bfloat16)
    rows = jnp.einsum("nkr,nrc->nkc", sel_r, patch,
                      preferred_element_type=jnp.bfloat16)
    rows0, rows1 = rows[:, :K], rows[:, K:]
    c0 = (iv[..., None] == r).astype(jnp.bfloat16)
    c1 = (iv[..., None] == (r - 1)).astype(jnp.bfloat16)
    s = lambda a, b: jnp.sum((a * b).astype(jnp.float32), -1)
    return (s(rows0, c0), s(rows0, c1), s(rows1, c0), s(rows1, c1))

def vc(patch, iu, iv):   # both stages as batched dots (row then col on MXU)
    sel_r = jnp.concatenate([(iu[..., None] == r), (iu[..., None] == (r - 1))],
                            axis=1).astype(jnp.bfloat16)          # [N,2K,PG]
    rows = jax.lax.dot_general(sel_r, patch, (((2,), (1,)), ((0,), (0,))),
                               preferred_element_type=jnp.bfloat16)  # [N,2K,PG]
    sel_c = jnp.concatenate([(iv[..., None] == r), (iv[..., None] == (r - 1))],
                            axis=1).astype(jnp.bfloat16)          # [N,2K,PG]
    # h(row a, col b) = rows[a] . sel_c[b] -> need 4 combos: batch dot
    # [N,2K,PG] @ [N,PG,2K] -> [N,2K,2K], take the 4 K-blocks' diagonals?
    # too much work (2K x 2K); instead elementwise like va but bf16
    rows0, rows1 = rows[:, :K], rows[:, K:]
    c0, c1 = sel_c[:, :K], sel_c[:, K:]
    s = lambda a, b: jnp.sum((a * b).astype(jnp.float32), -1)
    return (s(rows0, c0), s(rows0, c1), s(rows1, c0), s(rows1, c1))

def vd(patch, iu, iv):   # single fused one-hot over flat PG*PG via dot
    # corner index base: iu*PG+iv ; 4 offsets 0,1,PG,PG+1 -> [N, 4K] one-hot
    flat = patch.reshape(N, PG * PG)
    base = iu * PG + iv
    idx = jnp.concatenate([base, base + 1, base + PG, base + PG + 1], axis=1)
    rr = jnp.arange(PG * PG, dtype=jnp.int32)
    sel = (idx[..., None] == rr).astype(jnp.bfloat16)             # [N,4K,PG^2]
    h = jax.lax.dot_general(sel, flat, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)   # [N,4K]
    return h[:, :K], h[:, K:2*K], h[:, 2*K:3*K], h[:, 3*K:]

outs = {}
for name in ("va", "vb", "vc", "vd"):
    try:
        t, o = timeit(globals()[name], patch, iu, iv)
        outs[name] = jax.tree.map(lambda x: np.asarray(x, np.float32), o)
        ref = outs.get("va", o)
        dev = max(float(np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32)).max())
                  for a, b in zip(outs[name], outs["va"]))
        print(f"{name}: {t*1e3:7.3f} ms   max|dh| vs va = {dev:.3e}")
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:150]}")

def vh(patch, iu, iv):   # bf16 + transposed intermediate [N, PG, 2K] (less pad waste)
    sel_r = jnp.concatenate([(iu[..., None] == r), (iu[..., None] == (r - 1))],
                            axis=1).astype(jnp.bfloat16)
    rows = jnp.einsum("nkr,nrc->nck", sel_r, patch,
                      preferred_element_type=jnp.bfloat16)        # [N, PG, 2K]
    c0 = (iv[:, None, :] == r[:, None]).astype(jnp.bfloat16)      # [N, PG, K]
    c1 = (iv[:, None, :] == (r[:, None] - 1)).astype(jnp.bfloat16)
    s = lambda a, b: jnp.sum((a * b).astype(jnp.float32), 1)
    return (s(rows[:, :, :K], c0), s(rows[:, :, :K], c1),
            s(rows[:, :, K:], c0), s(rows[:, :, K:], c1))

for name in ("vh",):
    try:
        t, o = timeit(globals()[name], patch, iu, iv)
        dev = max(float(np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32)).max())
                  for a, b in zip(o, outs["va"]))
        print(f"{name}: {t*1e3:7.3f} ms   max|dh| vs va = {dev:.3e}")
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:150]}")
