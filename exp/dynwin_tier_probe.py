#!/usr/bin/env python
"""Shipped dynwin tier on the wide-scatter target (round 5, real chip).

exp/dynwin_probe.py proved the per-(tile, slot) dynamic-window design with
a bump-cascade prep (73 s at 64^3); the productized tier
(ops/pallas/gell_dynwin.py) replaces it with the one-pass lockstep greedy.
This probe measures the SHIPPED module head-to-head with the shipped stack
on the permuted-stencil target (the class the round-3 VERDICT named):

  - greedy prep time + W/inflation at K = 16/24,
  - matvec Gnnz/s (slope-timed) vs the stack's,
  - what auto_structure actually books (model rates included).

Usage: python exp/dynwin_tier_probe.py [nx ...] (default 64 100)
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
from hpccg_tpu.ops.pallas.gell_dynwin import prepare_gell_dynwin, spmv_gell_dynwin
from hpccg_tpu.ops.pallas.gell_stack import prepare_gell_stack, spmv_gell_stack
from hpccg_tpu.reorder import auto_structure, bandwidth, permute_ell, rcm_permutation
from hpccg_tpu.utils.cache import enable_compilation_cache
from hpccg_tpu.utils.timing import time_loop_slope

enable_compilation_cache()


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def slope_matvec(fn, args, x, iters=8, spread=16):
    def make_loop(k):
        @jax.jit
        def loop(args_, v):
            return jax.lax.fori_loop(
                0, k, lambda i, c: (fn(args_, c) * (1.0 / 54.0)).astype(c.dtype), v
            )

        return lambda v: loop(args, v)

    return time_loop_slope(make_loop, x, iters=iters, spread=spread)


def build_case(nx):
    n = nx**3
    from hpccg_tpu import native

    host = native.generate_ell_host(nx, nx, nx)
    if host is not None:
        vals_h, cols_h, valid_h, _b, _nnz = host
        A0 = EllMatrix(
            vals=vals_h.astype(np.float32), cols=cols_h, valid=valid_h,
            start_row=0, total_nrow=n,
        )
    else:
        prob = generate_ell(ProblemConfig(nx, nx, nx, dtype=jnp.float32))
        A0 = EllMatrix(
            vals=np.asarray(prob.A.vals, np.float32),
            cols=np.asarray(prob.A.cols), valid=np.asarray(prob.A.valid),
            start_row=0, total_nrow=n,
        )
    rng = np.random.default_rng(0)
    Ap = permute_ell(A0, rng.permutation(n))
    perm = rcm_permutation(Ap)
    return permute_ell(Ap, perm), rng


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [64, 100]
    for nx in sizes:
        n = nx**3
        log(f"building permuted {nx}^3 stencil (n = {n})")
        Ar, rng = build_case(nx)
        nnz = int(np.asarray(Ar.valid).sum())
        log(f"RCM bandwidth {bandwidth(Ar)}, nnz {nnz}")
        x = jnp.asarray(rng.standard_normal(n), jnp.float32)
        rows_c, cols_c, vals_c = Ar.to_coo()
        y_ref = np.zeros(n)
        np.add.at(y_ref, rows_c, vals_c * np.asarray(x)[cols_c.astype(np.int64)])

        for K in (16, 24):
            t0 = time.time()
            try:
                D = prepare_gell_dynwin(Ar, K=K)
            except ValueError as e:
                log(f"dynwin[K={K}]: {e}")
                continue
            prep_s = time.time() - t0
            y = np.asarray(spmv_gell_dynwin(D, x))
            err = np.max(np.abs(y - y_ref)) / np.max(np.abs(y_ref))
            assert err < 1e-4, err
            t = slope_matvec(
                lambda a, v: spmv_gell_dynwin(a, v), D, x
            )
            log(
                f"dynwin[K={K}]: W={D.W} (inflation {D.W * n / nnz:.2f}x), "
                f"greedy prep {prep_s:.1f}s, matvec {t * 1e3:.2f} ms = "
                f"{nnz / t / 1e9:.2f} Gnnz/s, rel err {err:.1e}"
            )

        t0 = time.time()
        S = prepare_gell_stack(Ar, strip_chunks=32)
        prep_s = time.time() - t0
        t = slope_matvec(lambda S_, v: spmv_gell_stack(S_, v), S, x)
        log(
            f"stack[32ch]: wtot {S.wtot} (inflation {S.wtot * n / nnz:.1f}x), "
            f"prep {prep_s:.1f}s, matvec {t * 1e3:.2f} ms = "
            f"{nnz / t / 1e9:.2f} Gnnz/s"
        )

        t0 = time.time()
        op, perm2, report = auto_structure(Ar)
        log(
            f"auto_structure: {report.format} ({time.time() - t0:.1f}s) — "
            f"{report.reason}"
        )


if __name__ == "__main__":
    main()
