"""Windowed gather-ELL bench across bandwidths (PERF.md). Run: PYTHONPATH=. python exp/gell_bench.py"""
import sys, time, statistics
T0 = time.time()
def log(*a): print(f"[{time.time()-T0:7.1f}s]", *a, flush=True)
import jax, jax.numpy as jnp, numpy as np
from functools import partial
from hpccg_tpu.operators import EllMatrix
from hpccg_tpu.ops.pallas.gell_kernel import prepare_gell, spmv_gell, _spmv_gell, RT

n = 1_000_000
W = 9
rng = np.random.default_rng(0)

def bench_bw(bw):
    offs = rng.integers(-bw, bw + 1, size=(n, W))
    offs[:, 0] = 0
    rows = np.arange(n)[:, None]
    cols = np.clip(rows + offs, 0, n - 1).astype(np.int32)
    vals = rng.uniform(-1, 1, size=(n, W)).astype(np.float32)
    vals[:, 0] = 3.0 * W
    # host leaves on purpose (like io.py's reader): prepare_gell reads the
    # arrays with np.asarray, and a device EllMatrix would pay a full
    # tunnel round trip of the matrix before preprocessing (measured: the
    # first such readback through a cold tunnel took ~20 min at 1M rows)
    ell = EllMatrix(vals=vals, cols=cols,
                    valid=np.ones((n, W), bool), total_nrow=n)
    t0 = time.time()
    G = prepare_gell(ell)
    log(f"bw={bw}: prepared K={G.k_chunks} in {time.time()-t0:.1f}s")
    x = jnp.asarray(rng.standard_normal(n), jnp.float32)
    y = np.asarray(spmv_gell(G, x))
    # oracle on a slice
    xs = np.asarray(x, np.float64)
    i0 = 499_000
    seg = np.einsum("rw,rw->r", vals[i0:i0+1000].astype(np.float64),
                    xs[cols[i0:i0+1000]])
    err = np.max(np.abs(y[i0:i0+1000] - seg)) / np.max(np.abs(seg))
    log(f"  parity err {err:.2e}")
    assert err < 1e-4
    # slope-timed loop: prepared arrays as args
    @partial(jax.jit, static_argnums=(3,))
    def loop(v3, l3, x_, k, G=G):
        import dataclasses
        GG = dataclasses.replace(G, vals3=v3, li3=l3)
        return jax.lax.fori_loop(0, k, lambda i, c: spmv_gell(GG, c) * (1.0/(3.0*W)), x_)
    def fence(v): float(v[0]); return v
    fence(loop(G.vals3, G.li3, x, 8)); fence(loop(G.vals3, G.li3, x, 72))
    sl=[]
    for _ in range(3):
        t0=time.perf_counter(); fence(loop(G.vals3, G.li3, x, 8)); t1=time.perf_counter(); fence(loop(G.vals3, G.li3, x, 72)); t2=time.perf_counter()
        sl.append(((t2-t1)-(t1-t0))/64)
    t = statistics.median(sl)
    nnz = n * W
    log(f"  spmv {t*1e6:8.1f} us  {nnz/t/1e9:6.2f} Gnnz/s  stream {nnz*8/t/1e9:6.1f} GB/s  (K={G.k_chunks})")

for bw in (100, 300, 800, 1500):
    bench_bw(bw)
