"""Blocked-DIA kernel bench (PERF.md round-2 numbers). Run: PYTHONPATH=. python exp/dia_bench.py"""
import sys, time, statistics
T0 = time.time()
def log(*a): print(f"[{time.time()-T0:7.1f}s]", *a, flush=True)
import jax, jax.numpy as jnp, numpy as np
from functools import partial
from hpccg_tpu.operators import DiaMatrix
from hpccg_tpu.ops.pallas.dia_kernel import spmv_dia_pallas
from hpccg_tpu.solver import make_cg

n = 1_000_000
rng = np.random.default_rng(0)
pos = np.sort(rng.choice(np.arange(1, 2000), size=128, replace=False))
offs = tuple(int(o) for o in np.r_[-pos[::-1], 0, pos])  # 257 symmetric offsets
noffs = len(offs)

@partial(jax.jit, static_argnums=(0, 1))
def build_data(offs, n):
    # symmetric by construction: A[r, r+off] = g(min(r, r+off), |off|)
    offv = jnp.asarray(offs, jnp.int32)[:, None]
    row = jnp.arange(n, dtype=jnp.int32)[None, :]
    valid = (row + offv >= 0) & (row + offv < n)
    rmin = jnp.minimum(row, row + offv).astype(jnp.float32)
    g = -0.55 + 0.4 * jnp.sin(rmin * 1e-3 + jnp.abs(offv).astype(jnp.float32))
    diag = (offv == 0)
    vals = jnp.where(diag, 0.62 * noffs, g)
    return jnp.where(valid, vals, 0.0).astype(jnp.float32)

data = jax.block_until_ready(build_data(offs, n))
A = DiaMatrix(data=data, offsets=offs, total_nrow=n)
nnz_slots = noffs * n
log("built on device; ndiag", noffs)

# standalone SpMV slope loop. The operator goes in PREPARED (layout pad
# done once) and as a jit ARGUMENT (a closure-captured GB matrix would be
# serialized into the HLO as a literal) — both pitfalls measured in PERF.md.
from hpccg_tpu.ops.pallas.dia_kernel import prepare_dia

G = prepare_dia(A)

@partial(jax.jit, static_argnums=(2,))
def loop(G_, x, k):
    return jax.lax.fori_loop(0, k, lambda i, c: G_.matvec(c) * (1.0/140.0), x)

x = build_data(offs, n)[0] + 1.0  # arbitrary device vector, no transfer
def fence(v): float(v[0] if v.ndim else v); return v
k1, k2 = 8, 64
fence(loop(G, x, k1)); fence(loop(G, x, k2))
log("spmv loops compiled")
sl = []
for _ in range(3):
    t0=time.perf_counter(); fence(loop(G, x, k1)); t1=time.perf_counter(); fence(loop(G, x, k2)); t2=time.perf_counter()
    sl.append(((t2-t1)-(t1-t0))/(k2-k1))
t = statistics.median(sl)
log("spmv us", round(t*1e6,1), " Gslots/s", round(nnz_slots/t/1e9,1), " GB/s(data)", round(nnz_slots*4/t/1e9,1))

# CG end-to-end (make_cg passes A as argument now)
xex = jnp.ones((n,), jnp.float32)
b = jax.block_until_ready(A.matvec(xex))
log("b built")
s1 = make_cg(A, max_iter=17, tolerance=0.0)
s2 = make_cg(A, max_iter=129, tolerance=0.0)
def fr(r): float(r.normr); return r
fr(s1(b, jnp.zeros_like(b))); r2 = fr(s2(b, jnp.zeros_like(b)))
log("cg compiled; niters", int(r2.niters), "normr", float(r2.normr), "init", float(r2.trace[0]))
sl=[]
for _ in range(3):
    t0=time.perf_counter(); fr(s1(b, jnp.zeros_like(b))); t1=time.perf_counter(); r2=fr(s2(b, jnp.zeros_like(b))); t2=time.perf_counter()
    sl.append(((t2-t1)-(t1-t0))/(int(r2.niters)-int(s1(b, jnp.zeros_like(b)).niters)))
per = statistics.median(sl)
err = float(jnp.max(jnp.abs(r2.x - 1.0)))
log("CG us/iter", round(per*1e6,1), " CG Gslots/s", round(nnz_slots/per/1e9,1), " max|x-1|", err)
