"""Chip speed measurement for the two dd tiers that were interpret-verified
only during the round-3 tunnel outage (ROUND3.md chip-validation ledger):

  1. double-float gather-ELL (`spmv_gell_dd`) — the f64 scattered-narrow-band
     tier. PERF.md ships a 0.5x rate model (two lane gathers + ~2x VPU work
     per slot, 10 vs 6 B/slot stream) — this measures the real rate.
  2. double-float stencil (`spmv_padded_v2_dd`, backend='pallas_dd') — the
     f64 generated-problem tier make_cg auto-selects on TPU.

Run on TPU:  PYTHONPATH=. python exp/dd_tiers_bench.py [gell] [stencil]
(no args = both; each section is independent so a hung compile can be
re-run selectively). Slope-timed like every published number. The f64 XLA
vector ops around the kernels can take minutes to compile through the
tunnel on first contact (same caveat as exp/dd_bench.py).
"""

import os
import statistics
import sys
import time

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from functools import partial  # noqa: E402

T0 = time.time()


def log(*a):
    print(f"[{time.time()-T0:7.1f}s]", *a, flush=True)


def slope(run1, run2, k1, k2, reps=3):
    ss = []
    for _ in range(reps):
        t0 = time.perf_counter()
        run1()
        t1 = time.perf_counter()
        run2()
        t2 = time.perf_counter()
        ss.append(((t2 - t1) - (t1 - t0)) / (k2 - k1))
    return statistics.median(ss)


def bench_gell_dd():
    from hpccg_tpu.operators import EllMatrix
    from hpccg_tpu.ops.pallas.gell_kernel import prepare_gell, spmv_gell_dd

    n, W = int(os.environ.get("DD_BENCH_N", 500_000)), 9
    rng = np.random.default_rng(0)
    for bw in (100, 800) if n >= 10_000 else (50,):
        offs = rng.integers(-bw, bw + 1, size=(n, W))
        offs[:, 0] = 0
        rows = np.arange(n)[:, None]
        cols = np.clip(rows + offs, 0, n - 1).astype(np.int32)
        vals = rng.uniform(-1, 1, size=(n, W))
        vals[:, 0] = 3.0 * W
        # host leaves (io.py reader convention): prepare_gell reads with
        # np.asarray; device leaves would round-trip the matrix through
        # the tunnel before preprocessing
        ell = EllMatrix(
            vals=vals.astype(np.float64),
            cols=cols,
            valid=np.ones((n, W), bool),
            total_nrow=n,
        )
        t0 = time.time()
        G = prepare_gell(ell)
        assert G.vals3lo is not None
        log(f"gell-dd bw={bw}: prepared K={G.k_chunks} in {time.time()-t0:.1f}s")
        x = rng.standard_normal(n)
        xj = jnp.asarray(x, jnp.float64)
        y = np.asarray(spmv_gell_dd(G, xj))
        yref = np.einsum("rw,rw->r", vals, x[cols])
        rel = np.max(np.abs(y - yref)) / np.max(np.abs(yref))
        log(f"  matvec rel err {rel:.2e} (vs NumPy f64 oracle)")
        assert rel < 1e-12, rel

        @partial(jax.jit, static_argnums=(2,))
        def loop(g, x_, k):
            return jax.lax.fori_loop(
                0, k, lambda i, c: spmv_gell_dd(g, c) * (1.0 / (3.0 * W)), x_
            )

        def fence(v):
            float(v[0])
            return v

        k1, k2 = 8, 72
        fence(loop(G, xj, k1))
        fence(loop(G, xj, k2))
        t = slope(lambda: fence(loop(G, xj, k1)), lambda: fence(loop(G, xj, k2)), k1, k2)
        nnz = n * W
        log(
            f"  spmv {t*1e6:8.1f} us  {nnz/t/1e9:6.2f} Gnnz/s  "
            f"stream {nnz*10/t/1e9:6.1f} GB/s  (K={G.k_chunks})"
        )


def bench_stencil_dd():
    from hpccg_tpu.config import ProblemConfig
    from hpccg_tpu.models.stencil import generate_problem
    from hpccg_tpu.solver import make_cg, resolve_backend
    from hpccg_tpu.ops.pallas.stencil_v2 import (
        pad_plane3,
        spmv_padded_v2_dd,
        unpad_plane3,
    )
    from hpccg_tpu.utils.timing import fence

    s = int(os.environ.get("DD_BENCH_NX", 100))
    prob = generate_problem(ProblemConfig(s, s, s, dtype=jnp.float64))
    A = prob.A
    if jax.default_backend() == "tpu":
        assert resolve_backend(A, "auto") == "pallas_dd"
    rng = np.random.default_rng(1)
    interp = jax.default_backend() != "tpu"
    x = rng.standard_normal(A.local_nrow)
    u = pad_plane3(A, jnp.asarray(x, jnp.float64))

    # accuracy vs the XLA f64 stencil matvec (software double-double per op)
    t0 = time.time()
    y = np.asarray(unpad_plane3(A, spmv_padded_v2_dd(A, u, None, interp)))
    yref = np.asarray(A.matvec(jnp.asarray(x, jnp.float64)))
    rel = np.max(np.abs(y - yref)) / np.max(np.abs(yref))
    log(f"stencil-dd {s}^3: matvec rel err {rel:.2e} vs XLA f64 "
        f"(first call {time.time()-t0:.0f}s)")
    assert rel < 1e-12, rel

    @partial(jax.jit, static_argnums=(1,))
    def loop(u_, k):
        return jax.lax.fori_loop(
            0, k, lambda i, c: spmv_padded_v2_dd(A, c, None, interp) * (1.0 / 53.0), u_
        )

    def fence3(v):
        float(v[0, 0, 0])
        return v

    k1, k2 = 8, 72
    fence3(loop(u, k1))
    fence3(loop(u, k2))
    t = slope(lambda: fence3(loop(u, k1)), lambda: fence3(loop(u, k2)), k1, k2)
    nnz = 27 * A.local_nrow  # stencil*n nnz model (bench.py convention)
    log(f"  spmv {t*1e6:8.1f} us  {nnz/t/1e9:6.1f} Gnnz/s (model)")

    # end-to-end CG per-iteration through make_cg (auto -> pallas_dd)
    k1, k2 = 9, 65
    t0 = time.time()
    s1 = make_cg(A, max_iter=k1 + 1, tolerance=0.0)
    r = s1(prob.b, prob.x0)
    fence(r)
    log(f"  short CG leg compile+run {time.time()-t0:.0f}s; niters {int(r.niters)}")
    s2 = make_cg(A, max_iter=k2 + 1, tolerance=0.0)
    fence(s2(prob.b, prob.x0))
    per = slope(
        lambda: fence(s1(prob.b, prob.x0)),
        lambda: fence(s2(prob.b, prob.x0)),
        k1,
        k2,
    )
    log(f"  dd CG: {per*1e6:.1f} us/iter, {nnz/per/1e9:.1f} Gnnz/s (model)")


if __name__ == "__main__":
    which = set(sys.argv[1:]) or {"gell", "stencil"}
    if "gell" in which:
        bench_gell_dd()
    if "stencil" in which:
        bench_stencil_dd()
