#!/usr/bin/env python
"""Wide-scatter SpMV tier probe (round-4 VERDICT #1).

The target class: a randomly permuted 3-D stencil matrix — RCM-irreducible
(optimal bandwidth Theta(n^(2/3))), the one class where round 3 had only the
honest XLA take-gather fallback (~0.14 Gnnz/s). Candidates measured here on
the real chip:

1. strip-bucketed gather stack (ops/pallas/gell_stack.py) at strip widths
   8/16/32 chunks — the productionized tier;
2. the XLA take-gather ELL path (the round-3 fallback, the 10x bar's base);
3. COO segment-sum (gather + scatter — expected to lose: adds a scatter);
4. MXU block-dense: ANALYTIC bytes bound from the measured tile occupancy
   (the dense stream pays occupied_tiles * 64 KiB vs the stack's 6 B/slot)
   — printed, not built, because the bound alone loses by orders of
   magnitude.

Usage: python exp/wide_scatter_probe.py [nx] (default 100 -> n = 1e6)
       python exp/wide_scatter_probe.py --dd [n]
           f64 double-float stack vs the f32 stack on the same structure
           (262144 rows x 9/row x bw 40k default): parity vs the f64
           oracle + the dd/f32 cost ratio (PERF.md round 4: 1.87x).
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from hpccg_tpu import ProblemConfig
from hpccg_tpu.models.stencil import generate_ell
from hpccg_tpu.operators import EllMatrix
from hpccg_tpu.reorder import bandwidth, permute_ell, rcm_permutation
from hpccg_tpu.ops.pallas.gell_stack import (
    prepare_gell_stack,
    spmv_gell_stack,
    stack_cost_model,
)
from hpccg_tpu.utils.timing import fence, time_loop_slope


def slope_matvec(matvec, A, x, iters=8, spread=16):
    """Per-matvec seconds via chained rescaled applications. A enters the
    jitted loop as an ARGUMENT — a closure-captured operator serializes as
    HLO constants (GBs for a 1M-row stack) and stalls the compile (the
    round-2 pitfall, PERF.md)."""

    def make_loop(k):
        @jax.jit
        def loop(A_, v):
            return jax.lax.fori_loop(
                0, k, lambda i, c: (matvec(A_, c) * (1.0 / 54.0)).astype(c.dtype), v
            )

        return lambda v: loop(A, v)

    return time_loop_slope(make_loop, x, iters=iters, spread=spread)


def main():
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    cfg = ProblemConfig(nx, nx, nx, dtype=jnp.float32)
    print(f"# building permuted {nx}^3 stencil (n = {nx**3})...", flush=True)
    t0 = time.time()
    n = nx**3
    # HOST-side assembly (csrc generate_ell): pulling a device-generated
    # matrix back through the axon tunnel costs ~2.5 s/MB of readback
    from hpccg_tpu import native

    host = native.generate_ell_host(nx, nx, nx)
    if host is not None:
        vals_h, cols_h, valid_h, _b, _nnz = host
        A0 = EllMatrix(
            vals=vals_h.astype(np.float32), cols=cols_h, valid=valid_h,
            start_row=0, total_nrow=n,
        )
    else:
        prob = generate_ell(cfg)
        A0 = EllMatrix(
            vals=np.asarray(prob.A.vals, np.float32),
            cols=np.asarray(prob.A.cols),
            valid=np.asarray(prob.A.valid),
            start_row=0,
            total_nrow=n,
        )
    rng = np.random.default_rng(0)
    Ap = permute_ell(A0, rng.permutation(n))
    bw0 = bandwidth(Ap)
    print(f"# permuted bandwidth: {bw0}; running RCM...", flush=True)
    perm = rcm_permutation(Ap)
    Ar = permute_ell(Ap, perm)
    bw1 = bandwidth(Ar)
    nnz = int(np.asarray(Ar.valid).sum())
    print(
        f"# RCM bandwidth: {bw1} (~n^(2/3) = {int(n ** (2 / 3))}); "
        f"nnz = {nnz}; prep {time.time() - t0:.1f}s",
        flush=True,
    )

    x = jnp.asarray(rng.standard_normal(n), jnp.float32)
    results = {}

    # oracle for correctness
    rows_c, cols_c, vals_c = Ar.to_coo()
    y_ref = np.zeros(n)
    np.add.at(y_ref, rows_c, vals_c * np.asarray(x)[cols_c.astype(np.int64)])

    # --- candidate 1: strip-bucketed gather stack ---
    for sc in (16, 32, 64):
        ok, model_rate, wtot = stack_cost_model(Ar, strip_chunks=sc)
        if not ok:
            print(f"stack[{sc}]: unsupported (wtot={wtot})", flush=True)
            continue
        t0 = time.time()
        S = prepare_gell_stack(Ar, strip_chunks=sc)
        prep_s = time.time() - t0
        y = np.asarray(spmv_gell_stack(S, x))
        err = np.max(np.abs(y - y_ref)) / np.max(np.abs(y_ref))
        assert err < 1e-4, err
        t = slope_matvec(
            lambda S_, v: spmv_gell_stack(S_, v), S, x, iters=8, spread=32
        )
        rate = nnz / t / 1e9
        results[f"stack[{sc}]"] = rate
        print(
            f"stack[{sc}ch]: {len(S.strips)} strips, wtot {S.wtot} "
            f"(inflation {S.wtot * n / nnz:.1f}x), prep {prep_s:.1f}s, "
            f"matvec {t * 1e3:.2f} ms = {rate:.2f} Gnnz/s "
            f"(model {model_rate:.2f}), rel err {err:.1e}",
            flush=True,
        )

    # --- candidate 2: XLA take-gather ELL (the round-3 fallback) ---
    Ad = EllMatrix(
        vals=jnp.asarray(Ar.vals), cols=jnp.asarray(Ar.cols),
        valid=jnp.asarray(Ar.valid), start_row=0, total_nrow=n,
    )
    t = slope_matvec(lambda A_, v: A_.matvec(v), Ad, x, iters=1, spread=8)
    results["ell-take"] = nnz / t / 1e9
    print(
        f"ell-take:  matvec {t * 1e3:.2f} ms = {results['ell-take']:.3f} Gnnz/s",
        flush=True,
    )

    # --- candidate 3: COO segment-sum (gather + scatter) ---
    rows_j = jnp.asarray(rows_c.astype(np.int32))
    cols_j = jnp.asarray(cols_c.astype(np.int32))
    vals_j = jnp.asarray(vals_c, jnp.float32)

    def coo_matvec(coo, v):
        vj, rj, cj = coo
        return jax.ops.segment_sum(vj * v[cj], rj, num_segments=n)

    t = slope_matvec(coo_matvec, (vals_j, rows_j, cols_j), x, iters=1, spread=8)
    results["coo-segsum"] = nnz / t / 1e9
    print(
        f"coo-segsum: matvec {t * 1e3:.2f} ms = {results['coo-segsum']:.3f} Gnnz/s",
        flush=True,
    )

    # --- candidate 4: MXU block-dense, analytic bytes bound ---
    TS = 128
    tr = rows_c // TS
    tc = cols_c // TS
    occupied = len(np.unique(tr.astype(np.int64) * ((n // TS) + 1) + tc))
    tile_bytes = occupied * TS * TS * 4
    t_bound = tile_bytes / 716e9  # measured read-dominated HBM rate
    print(
        f"block-dense bound: {occupied} occupied 128x128 tiles "
        f"({nnz / (occupied * TS * TS) * 100:.2f}% occupancy), "
        f"{tile_bytes / 1e9:.1f} GB/matvec -> >= {t_bound * 1e3:.1f} ms "
        f"= <= {nnz / t_bound / 1e9:.3f} Gnnz/s AT BEST (loses)",
        flush=True,
    )

    best = max(results, key=results.get)
    base = results.get("ell-take", 0.14)
    print(
        f"\nWINNER: {best} at {results[best]:.2f} Gnnz/s = "
        f"{results[best] / base:.0f}x the take-gather fallback",
        flush=True,
    )


def main_dd():
    """f64 wide scatter: the double-float stack vs the f32 stack on the
    SAME structure (and parity vs the f64 oracle)."""
    jax.config.update("jax_enable_x64", True)
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 262144
    width, bw = 9, max(n // 6, 1024)
    rng = np.random.default_rng(0)
    cols = np.clip(
        np.arange(n)[:, None] + rng.integers(-bw, bw + 1, (n, width)), 0, n - 1
    )
    cols[:, 0] = np.arange(n)
    vals = rng.uniform(-1.0, -0.1, (n, width)) * np.exp2(
        rng.integers(-20, 21, (n, width)).astype(np.float64)
    )
    vals[:, 0] = np.abs(vals).sum(axis=1) + 1.0
    valid = np.ones((n, width), bool)
    nnz = n * width
    A64 = EllMatrix(
        vals=vals, cols=cols.astype(np.int32), valid=valid,
        start_row=0, total_nrow=n,
    )
    from hpccg_tpu.ops.pallas.gell_stack import spmv_gell_stack_dd

    t0 = time.time()
    S = prepare_gell_stack(A64, strip_chunks=32)
    print(
        f"# dd prep {time.time()-t0:.1f}s: wtot {S.wtot} "
        f"({len(S.strips)} strips, inflation {S.wtot * n / nnz:.1f}x)",
        flush=True,
    )
    x = rng.standard_normal(n)
    y = np.asarray(spmv_gell_stack_dd(S, jnp.asarray(x, jnp.float64)))
    rows_c, cols_c, vals_c = A64.to_coo()
    y_ref = np.zeros(n)
    np.add.at(y_ref, rows_c, vals_c * x[cols_c.astype(np.int64)])
    err = np.max(np.abs(y - y_ref)) / np.max(np.abs(y_ref))
    print(f"dd-stack rel err vs f64 oracle: {err:.2e}", flush=True)
    assert err < 1e-12, err
    t_dd = slope_matvec(
        lambda S_, v: spmv_gell_stack_dd(S_, v),
        S, jnp.asarray(x, jnp.float64), iters=4, spread=32,
    )
    print(
        f"dd-stack:  {t_dd*1e3:.2f} ms/matvec = {nnz/t_dd/1e9:.2f} Gnnz/s",
        flush=True,
    )
    S32 = prepare_gell_stack(
        EllMatrix(
            vals=vals.astype(np.float32), cols=cols.astype(np.int32),
            valid=valid, start_row=0, total_nrow=n,
        ),
        strip_chunks=32,
    )
    t_32 = slope_matvec(
        lambda S_, v: spmv_gell_stack(S_, v),
        S32, jnp.asarray(x, jnp.float32), iters=4, spread=32,
    )
    print(
        f"f32-stack: {t_32*1e3:.2f} ms/matvec = {nnz/t_32/1e9:.2f} Gnnz/s; "
        f"dd/f32 = {t_dd/t_32:.2f} (model books 2x)",
        flush=True,
    )


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--dd":
        main_dd()
    else:
        main()
