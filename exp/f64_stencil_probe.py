"""How much does the emulated-f64 XLA stencil path cost vs f32? (round 3)

The reference binary is all-f64 (HPC_sparsemv.cpp:68-87); our generated-
problem tiers are f32/bf16 Pallas with f64 riding the XLA stencil under
jax_enable_x64 (TPU emulates f64 in software). This probe pins the gap the
double-float stencil tier has to close.  Run: PYTHONPATH=. python exp/f64_stencil_probe.py
"""
import statistics
import sys
import time

T0 = time.time()


def log(*a):
    print(f"[{time.time()-T0:7.1f}s]", *a, flush=True)


import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from hpccg_tpu import ProblemConfig, generate_problem
from hpccg_tpu.solver import make_cg


def cg_per_iter(nx, dtype, backend="stencil", k1=65, k2=513):
    cfg = ProblemConfig(nx, nx, nx, dtype=dtype)
    prob = generate_problem(cfg)
    s1 = make_cg(prob.A, max_iter=k1, tolerance=0.0, backend=backend)
    s2 = make_cg(prob.A, max_iter=k2, tolerance=0.0, backend=backend)
    r1 = jax.block_until_ready(s1(prob.b, prob.x0))
    r2 = jax.block_until_ready(s2(prob.b, prob.x0))
    assert int(r2.niters) >= 2 * int(r1.niters), (int(r1.niters), int(r2.niters))
    sl = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(s1(prob.b, prob.x0))
        t1 = time.perf_counter()
        jax.block_until_ready(s2(prob.b, prob.x0))
        t2 = time.perf_counter()
        sl.append(((t2 - t1) - (t1 - t0)) / (int(r2.niters) - int(r1.niters)))
    t = statistics.median(sl)
    log(
        f"{nx}^3 {jnp.dtype(dtype).name:8s} {backend:12s} "
        f"{t*1e6:9.1f} us/iter  ({nx**3*27/t/1e9:7.1f} Gnnz/s)"
    )
    return t


def check_pap_accuracy(nx=64):
    """On-chip accuracy of the in-kernel compensated pAp (the interpret
    path swaps in an exact f64 dot, so only Mosaic runs the TwoSum-plane
    reduction — verify it against the f64 dot here)."""
    import numpy as np

    from hpccg_tpu.ops.pallas.stencil_v2 import (
        pad_plane3,
        spmv_padded_v2_dd_pap,
    )

    cfg = ProblemConfig(nx, nx, nx, dtype=jnp.float64)
    prob = generate_problem(cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.standard_normal(cfg.local_nrow)
        * (1 + 1e-9 * rng.standard_normal(cfg.local_nrow))
    )
    u = pad_plane3(prob.A, x)
    y, pap = spmv_padded_v2_dd_pap(prob.A, u)
    pap_ref = float(jnp.vdot(u.reshape(-1), y.reshape(-1)))
    rel = abs(float(pap) / pap_ref - 1)
    log(f"pap accuracy @ {nx}^3: rel {rel:.3e} (in-kernel vs f64 dot)")
    assert rel < 1e-12, rel


if __name__ == "__main__":
    log("backend", jax.default_backend())
    if jax.default_backend() == "tpu":
        check_pap_accuracy()
    sizes = [int(a) for a in sys.argv[1:]] or [100, 160, 208]
    for nx in sizes:
        cg_per_iter(nx, jnp.float32)
        cg_per_iter(nx, jnp.float64)
        cg_per_iter(nx, jnp.float64, backend="pallas_dd")
