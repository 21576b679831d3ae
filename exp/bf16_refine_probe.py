#!/usr/bin/env python
"""bf16-inner iterative refinement probe — is the bf16 tier a usable LEVER?

PERF.md's 256^3 conclusion: the f32 HBM-resident floor is ~1.24 ms/iter and
"the bf16 tier (596 us) is the lever past it". This probe measures whether
that lever actually moves an f32-ACCURACY solve: inner CG runs entirely in
bf16 (vectors at 2 B -> ~0.48x the f32 per-iteration cost), the outer loop
computes the true residual in f32 (native speed, one matvec per round) and
accumulates x in f32 — classic iterative refinement, one precision tier down
from solver.cg_solve_refined's f64/f32 pairing.

The physics question: refinement contraction per round ~ the attainable
relative residual of the INNER solve. bf16 eps = 2^-8 = 3.9e-3 and
kappa(A) ~ (n/pi)^2, so the worst-case bound kappa*eps exceeds 1 already at
n=100 — by the book this should STALL. CG is usually far better than the
bound on smooth problems; this probe decides it empirically:

  a. plain f32 CG (auto backend): trace + slope-timed per-iteration cost;
     time-to-rel-1e-5 derived from both.
  b. refined bf16-inner: contraction factor per outer round at several
     inner budgets (20/40/80 iters), total inner iterations and wall time
     to the same rel-1e-5 target (or the stall point, stated).

Usage: python exp/bf16_refine_probe.py [n] (default 100)
"""

import dataclasses
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from hpccg_tpu import ProblemConfig, generate_problem
from hpccg_tpu.ops.spmv import spmv
from hpccg_tpu.solver import make_cg
from hpccg_tpu.utils.cache import enable_compilation_cache
from hpccg_tpu.utils.timing import fence

enable_compilation_cache()


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def time_solve(solve, b, x0, reps=3):
    fence(solve(b, x0))  # compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fence(solve(b, x0))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    rel_target = 1e-5
    cfg = ProblemConfig(n, n, n, dtype=jnp.float32)
    prob = generate_problem(cfg)
    A, b, x0 = prob.A, prob.b, prob.x0

    # ---- baseline: plain f32 CG ----
    max_iter = 400 if n >= 200 else 250
    s32 = make_cg(A, max_iter=max_iter, tolerance=0.0, backend="auto")
    log("compiling plain f32 CG")
    res = s32(b, x0)
    trace = np.asarray(res.trace)
    normr0 = float(trace[0])
    hits = np.nonzero(trace / normr0 <= rel_target)[0]
    k32 = int(hits[0]) if hits.size else -1
    t_full = time_solve(s32, b, x0)
    per_iter = t_full / max(int(res.niters), 1)
    if k32 >= 0:
        target_note = f"time-to-target ~{k32 * per_iter * 1e3:.1f} ms"
    else:
        target_note = f"target not reached in max_iter={max_iter}"
    print(f"# {n}^3 f32 plain CG: rel {rel_target:g} at iter "
          f"{k32 if k32 >= 0 else 'n/a'} "
          f"(floor rel {float(np.nanmin(trace))/normr0:.2e}); "
          f"{per_iter*1e6:.0f} us/iter -> {target_note}")

    # ---- refined: bf16 inner ----
    A16 = dataclasses.replace(A, dtype_name="bfloat16")
    for inner_budget in (20, 40, 80):
        log(f"compiling bf16 inner (budget {inner_budget})")
        inner = make_cg(A16, max_iter=inner_budget, tolerance=0.0, backend="auto")
        # timed per-inner-iteration cost (full fixed-work inner solve)
        zeros16 = jnp.zeros(b.shape, jnp.bfloat16)
        ones16 = (b / jnp.sqrt(jnp.vdot(b, b))).astype(jnp.bfloat16)
        t_inner = time_solve(inner, ones16, zeros16)
        inner_iter_us = t_inner / max(inner_budget - 1, 1) * 1e6

        x = x0
        r = b - spmv(A, x)
        nr = float(jnp.sqrt(jnp.vdot(r, r)))
        total_inner = 0
        contractions = []
        t0 = time.perf_counter()
        rounds = 0
        while nr / normr0 > rel_target and rounds < 12:
            scale = nr
            rhs16 = (r / scale).astype(jnp.bfloat16)
            ires = inner(rhs16, zeros16)
            total_inner += int(ires.niters)
            x = x + scale * ires.x.astype(jnp.float32)
            r = b - spmv(A, x)
            nr_new = float(jnp.sqrt(jnp.vdot(r, r)))
            contractions.append(nr_new / nr)
            if nr_new >= nr * 0.9:  # stalled
                nr = nr_new
                rounds += 1
                break
            nr = nr_new
            rounds += 1
        fence(x)
        t_ref = time.perf_counter() - t0
        ok = nr / normr0 <= rel_target
        print(f"  refined bf16 inner={inner_budget}: "
              f"{'REACHED' if ok else 'STALLED'} rel {nr/normr0:.2e} "
              f"in {rounds} rounds / {total_inner} inner iters, "
              f"wall {t_ref*1e3:.1f} ms (inner {inner_iter_us:.0f} us/iter); "
              f"contractions {['%.3f' % c for c in contractions]}")

    print("# verdict: refined-bf16 wins iff wall < plain time-to-target above")


if __name__ == "__main__":
    main()
