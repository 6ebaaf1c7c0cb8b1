#!/usr/bin/env python3
"""Supercell patch gather vs per-point packed-corner gather.

The frozen-cell contact cache needs, once per policy step, the 2x2 bilinear
cell corners of 32 contact points x N envs.  The packed-corner table costs
one gather FRAGMENT per point (32N fragments ~ 50 ns each -> ~6.8 ms @4096).

Supercell idea: all 32 points of an env lie within ~1.2 m of its base.  Tile
the terrain into SxS-cell supercells and precompute, for each, the full
surrounding (S + 2M +1)^2 corner patch as ONE contiguous row of a table.
Per env: 1 fragment (the patch), then extract every point's 4 cell corners
from the in-register patch with one-hot row/col contractions (MXU/VPU work,
no gather).  Fragments drop 32N -> N.

Run: python tools/microbench_supercell.py [N]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

R = C = 2100
N = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
K = 32          # contact points per env
HS = 0.1        # m/px
MARGIN_M = 1.2  # max |point - base| in xy


def timeit(fn, *args, iters=10, warmup=3):
    f = jax.jit(fn)
    for _ in range(warmup):
        out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


rng = np.random.default_rng(0)
H = rng.random((R, C), dtype=np.float32)

# base positions + point offsets (world px units)
base_u = jnp.asarray(rng.uniform(30, R - 30, size=N).astype(np.float32))
base_v = jnp.asarray(rng.uniform(30, C - 30, size=N).astype(np.float32))
off_u = jnp.asarray(rng.uniform(-MARGIN_M / HS, MARGIN_M / HS, size=(K, N)).astype(np.float32))
off_v = jnp.asarray(rng.uniform(-MARGIN_M / HS, MARGIN_M / HS, size=(K, N)).astype(np.float32))
pu = base_u[None] + off_u   # [K, N] point grid coords
pv = base_v[None] + off_v

# ---- baseline: packed corner table, per-point gather ----
h00 = H
h10 = np.concatenate([H[1:], H[-1:]], 0)
h01 = np.concatenate([H[:, 1:], H[:, -1:]], 1)
h11 = np.concatenate([h10[:, 1:], h10[:, -1:]], 1)
table4 = jnp.asarray(np.stack([h00, h10, h01, h11], -1).reshape(R * C, 4))


def baseline(pu, pv):
    i0 = jnp.clip(jnp.floor(pu).astype(jnp.int32), 0, R - 2)
    j0 = jnp.clip(jnp.floor(pv).astype(jnp.int32), 0, C - 2)
    corners = jnp.take(table4, i0 * C + j0, axis=0, mode="clip")
    return corners.sum(-1)


# ---- supercell variants ----
def build_supertable(S):
    M = int(np.ceil(MARGIN_M / HS))      # margin cells
    P = S + 2 * M + 1                    # corner-grid side
    nsi = (R + S - 1) // S
    nsj = (C + S - 1) // S
    Hp = np.pad(H, ((M, S + M + 1), (M, S + M + 1)), mode="edge")
    # supertable[si, sj] = Hp[si*S : si*S+P, sj*S : sj*S+P]  (origin si*S-M in H)
    sw = np.lib.stride_tricks.sliding_window_view(Hp, (P, P))[::S, ::S]
    st = np.ascontiguousarray(sw[:nsi, :nsj]).reshape(nsi * nsj, P * P)
    print(f"S={S}: patch {P}x{P}, table {st.nbytes/1e6:.0f} MB")
    return jnp.asarray(st), M, P, nsj


for S in (8, 16):
    st, M, P, nsj = build_supertable(S)

    def supercell(pu, pv, st=st, M=M, P=P, nsj=nsj, S=S):
        si = jnp.clip((base_u / S).astype(jnp.int32), 0, (R - 1) // S)
        sj = jnp.clip((base_v / S).astype(jnp.int32), 0, (C - 1) // S)
        patch = jnp.take(st, si * nsj + sj, axis=0).reshape(N, P, P)
        # per-point cell index within the patch
        iu = jnp.floor(pu).astype(jnp.int32) - (si[None] * S - M)   # [K, N]
        iv = jnp.floor(pv).astype(jnp.int32) - (sj[None] * S - M)
        iu = jnp.clip(iu, 0, P - 2)
        iv = jnp.clip(iv, 0, P - 2)
        r = jnp.arange(P, dtype=jnp.int32)
        # one-hot row selectors for iu and iu+1: [N, K, P]
        sel0 = (iu.T[..., None] == r).astype(jnp.float32)
        sel1 = (iu.T[..., None] == (r - 1)).astype(jnp.float32)
        t0 = jnp.einsum("nkr,nrc->nkc", sel0, patch)   # rows at iu
        t1 = jnp.einsum("nkr,nrc->nkc", sel1, patch)   # rows at iu+1
        c0 = (iv.T[..., None] == r).astype(jnp.float32)
        c1 = (iv.T[..., None] == (r - 1)).astype(jnp.float32)
        h00 = (t0 * c0).sum(-1)
        h01 = (t0 * c1).sum(-1)
        h10 = (t1 * c0).sum(-1)
        h11 = (t1 * c1).sum(-1)
        return (h00 + h01 + h10 + h11).T               # [K, N]

    # correctness vs baseline corner sum
    want = baseline(pu, pv)
    got = supercell(pu, pv)
    err = float(jnp.max(jnp.abs(want - got)))
    t = timeit(supercell, pu, pv)
    print(f"  supercell S={S}: {t*1e3:8.3f} ms   max|err|={err:.2e}")

t = timeit(baseline, pu, pv)
print(f"baseline packed-corner gather: {t*1e3:8.3f} ms")
