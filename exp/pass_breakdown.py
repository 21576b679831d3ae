#!/usr/bin/env python
"""HBM-resident CG pass breakdown at 256^3 f32 (round-4 VERDICT weak #1).

Decomposes the measured per-iteration cost of the pallas (v2 + fused pAp)
backend into its components against the ~330 GB/s mixed-traffic machine
floor, and measures the candidates:

  a. full CG iteration, pallas backend (round-3 baseline ~1259 us)
  b. full CG iteration, pallas backend + the round-4 rr-fusion (cg_solve now
     evaluates the loop-top r.r fused with the r-update and carries it)
  c. the SpMV(+pap) kernel alone
  d. the XLA vector chain alone (p-update, x-update, r-update, rr)
  e. full CG iteration, pallas_fused backend (the v1 two-pass fused kernel
     — expected to LOSE: pallas calls cannot pin arrays across calls, so
     its 10 nominal streams beat XLA's ~6.3 effective only on paper)
  f. full CG iteration, XLA stencil backend (reference point)

Usage: python exp/pass_breakdown.py [n] (default 256)
"""

import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from hpccg_tpu import ProblemConfig, generate_problem
from hpccg_tpu.solver import make_cg
from hpccg_tpu.utils.cache import enable_compilation_cache
from hpccg_tpu.utils.timing import time_loop_slope

enable_compilation_cache()


def time_cg_iter(prob, backend, iters=65, spread=64, **kw):
    """Per-iteration seconds by slope between two max_iter values."""
    import time

    from hpccg_tpu.utils.timing import fence

    k1, k2 = iters, iters * spread
    s1 = make_cg(prob.A, max_iter=k1, tolerance=0.0, backend=backend, **kw)
    s2 = make_cg(prob.A, max_iter=k2, tolerance=0.0, backend=backend, **kw)
    fence(s1(prob.b, prob.x0))
    fence(s2(prob.b, prob.x0))
    slopes = []
    for _ in range(3):
        t0 = time.perf_counter()
        r1 = s1(prob.b, prob.x0)
        fence(r1)
        t1 = time.perf_counter()
        r2 = s2(prob.b, prob.x0)
        fence(r2)
        t2 = time.perf_counter()
        slopes.append((t2 - t1) - (t1 - t0))
    assert int(r2.niters) == k2 - 1, "early exit poisons the slope"
    return max(np.median(slopes), 0.0) / (k2 - k1)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    cfg = ProblemConfig(n, n, n, dtype=jnp.float32)
    prob = generate_problem(cfg)
    vec_mb = prob.total_nrow * 4 / 1e6
    floor = 330e9  # measured mixed read+write HBM rate (PERF.md)
    print(f"# {n}^3 f32: {vec_mb:.0f} MB/vector; 1 pass ~ {vec_mb/330:.0f} us at the 330 GB/s floor")

    # (b) pallas backend WITH the rr-fusion (current cg_solve)
    t = time_cg_iter(prob, "pallas")
    print(f"CG iter, pallas (fused pAp + rr-fusion): {t*1e6:.0f} us "
          f"= {t*floor/ (vec_mb*1e6):.1f} effective passes")

    # (c) SpMV(+pap) kernel alone
    from hpccg_tpu.ops.pallas.stencil_v2 import (
        pad_plane3, spmv_padded_v2, spmv_padded_v2_pap, unpad_plane3,
    )

    def make_spmv_loop(k):
        def f(v):
            u = pad_plane3(prob.A, v)
            u = jax.lax.fori_loop(
                0, k, lambda i, c: spmv_padded_v2(prob.A, c) * (1.0 / 54.0), u
            )
            return unpad_plane3(prob.A, u)

        return jax.jit(f)

    t_spmv = time_loop_slope(make_spmv_loop, prob.x0, iters=16, spread=32)
    print(f"SpMV v2 kernel alone: {t_spmv*1e6:.0f} us "
          f"= {t_spmv*floor/(vec_mb*1e6):.1f} passes")

    def make_pap_loop(k):
        def f(v):
            u = pad_plane3(prob.A, v)

            def body(i, c):
                y, pap = spmv_padded_v2_pap(prob.A, c)
                return y * (1.0 / 54.0) + 0.0 * pap

            u = jax.lax.fori_loop(0, k, body, u)
            return unpad_plane3(prob.A, u)

        return jax.jit(f)

    t_pap = time_loop_slope(make_pap_loop, prob.x0, iters=16, spread=32)
    print(f"SpMV v2 + fused pAp kernel: {t_pap*1e6:.0f} us "
          f"= {t_pap*floor/(vec_mb*1e6):.1f} passes")

    # (d) the XLA vector chain alone (p-up, x-up, r-up, rr, fused rr carry)
    def make_chain_loop(k):
        def f(args):
            x, r, p, Ap = args

            def body(i, c):
                x, r, p, rr = c
                beta = rr * 1e-30 + 0.5
                p = r + beta * p
                alpha = rr * 1e-30 + 0.25
                x = x + alpha * p
                r = r - alpha * Ap
                rr = jnp.vdot(r, r) * 1e-30
                return (x, r, p, rr)

            x, r, p, rr = jax.lax.fori_loop(
                0, k, body, (x, r, p, jnp.float32(0))
            )
            return x + r + p + rr

        return jax.jit(f)

    args = (prob.x0, prob.b, prob.b * 0.5, prob.b * 0.25)
    t_chain = time_loop_slope(make_chain_loop, args, iters=16, spread=32)
    print(f"XLA vector chain alone: {t_chain*1e6:.0f} us "
          f"= {t_chain*floor/(vec_mb*1e6):.1f} passes "
          f"(nominal 10 streams without residency)")

    # (e) the v1 two-pass fused kernel backend
    try:
        t = time_cg_iter(prob, "pallas_fused", iters=16, spread=16)
        print(f"CG iter, pallas_fused (v1 two-pass): {t*1e6:.0f} us")
    except Exception as e:
        print(f"pallas_fused: {type(e).__name__}: {e}")

    # (f) XLA stencil reference
    t = time_cg_iter(prob, "stencil", iters=16, spread=16)
    print(f"CG iter, XLA stencil: {t*1e6:.0f} us")


if __name__ == "__main__":
    main()
