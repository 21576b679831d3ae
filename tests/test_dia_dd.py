"""Double-float (two-f32) blocked-DIA kernel — the f64 wide-band path
(round-2 missing #4): >256-diagonal f64 matrices previously had no fast
path (no Mosaic f64; XLA unroll capped). The dd kernel carries every value
as an exact (hi, lo) f32 pair with error-free transforms, giving f64-class
accuracy from pure-f32 VPU arithmetic."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hpccg_tpu.operators import DiaMatrix
from hpccg_tpu.ops.pallas.dia_kernel import (
    PreparedDiaDD,
    dia_dd_supported,
    prepare_dia_dd,
    prepare_dia_dd_shards,
    spmv_dia_dd_prepared,
)


def _wide(n, span=300, ndiag_draw=400, seed=0):
    rng = np.random.default_rng(seed)
    offs = tuple(
        sorted(set([0] + [int(o) for o in rng.integers(-span, span + 1, ndiag_draw)]))
    )
    data = np.zeros((len(offs), n))
    for d, off in enumerate(offs):
        lo, hi = max(0, -off), min(n, n - off)
        data[d, lo:hi] = (
            2.0 * len(offs) if off == 0 else rng.uniform(-1, -0.1, hi - lo)
        )
    return DiaMatrix(data=jnp.asarray(data), offsets=offs, total_nrow=n)


def _oracle_matvec(A, x):
    data = np.asarray(A.data)
    n = A.local_nrow
    y = np.zeros(n)
    for d, off in enumerate(A.offsets):
        xs = np.zeros(n)
        s = slice(max(0, off), min(n, n + off))
        t = slice(max(0, -off), min(n, n - off))
        xs[t] = x[s]
        y += data[d] * xs
    return y


@pytest.mark.slow
def test_dd_matvec_f64_accuracy():
    n = 2048
    A = _wide(n)
    assert len(A.offsets) > 256 and dia_dd_supported(A.offsets, n)
    rng = np.random.default_rng(1)
    x = rng.standard_normal(n)
    y_ref = _oracle_matvec(A, x)
    P = prepare_dia_dd(A)
    assert isinstance(P, PreparedDiaDD)
    y = np.asarray(P.matvec(jnp.asarray(x)))
    rel = np.max(np.abs(y - y_ref)) / np.max(np.abs(y_ref))
    assert rel < 5e-14, rel  # f64-class; plain f32 is ~1e-7 here


@pytest.mark.slow
def test_dd_cg_matches_f64_unrolled():
    """Deep-convergence trajectory parity: the dd-kernel CG tracks the
    exact-f64 XLA solve to ~1e-12 relative on every residual."""
    from hpccg_tpu.solver import cg_solve

    n = 1024
    A = _wide(n, span=150, ndiag_draw=350, seed=2)
    xex = jnp.ones((n,), jnp.float64)
    b = A.matvec(xex)
    x0 = jnp.zeros_like(b)
    ref = cg_solve(lambda v: A.matvec(v), b, x0, max_iter=30, tolerance=0.0)
    P = prepare_dia_dd(A)
    dd = cg_solve(lambda v: P.matvec(v), b, x0, max_iter=30, tolerance=0.0)
    assert int(dd.niters) == int(ref.niters)
    tr, td = np.asarray(ref.trace), np.asarray(dd.trace)
    good = np.isfinite(tr) & (tr > 1e-11 * tr[0])
    np.testing.assert_allclose(td[good], tr[good], rtol=1e-11)
    np.testing.assert_allclose(
        np.asarray(dd.x), np.asarray(ref.x), rtol=1e-10, atol=1e-12
    )


@pytest.mark.slow
def test_dd_shard_halo_fill_matches_global():
    """Per-shard dd matvec with neighbor strips written into the bandwidth
    padding reassembles the global matvec (the distributed entry point)."""
    n, ndev = 2048, 4
    A = _wide(n, span=120, ndiag_draw=300, seed=3)
    L = n // ndev
    offs = tuple(int(o) for o in A.offsets)
    bw_lo = max(0, -min(offs))
    bw_hi = max(0, max(offs))
    assert bw_lo <= L and bw_hi <= L
    rng = np.random.default_rng(4)
    x = rng.standard_normal(n)
    y_ref = _oracle_matvec(A, x)
    hi4, lo4 = prepare_dia_dd_shards(A, ndev)
    xs = jnp.asarray(x)
    ys = []
    for r in range(ndev):
        lo = xs[r * L - bw_lo : r * L] if r > 0 else None
        hi = xs[(r + 1) * L : (r + 1) * L + bw_hi] if r < ndev - 1 else None
        ys.append(
            np.asarray(
                spmv_dia_dd_prepared(
                    offs, hi4[r], lo4[r], xs[r * L : (r + 1) * L], L, lo, hi
                )
            )
        )
    y = np.concatenate(ys)
    rel = np.max(np.abs(y - y_ref)) / np.max(np.abs(y_ref))
    assert rel < 5e-14, rel


@pytest.mark.slow
def test_dd_distributed_plan_and_solve(monkeypatch):
    """dia_halo_plan picks the dd tier for >256-diagonal f64 shards on TPU
    (mocked here; the kernel runs in interpret mode) and the distributed
    solve matches the single-device f64 solve."""
    import hpccg_tpu.parallel.cg as pcg
    from hpccg_tpu.parallel import make_distributed_dia_cg, make_mesh
    from hpccg_tpu.solver import cg_solve

    n, ndev = 1024, 2
    A = _wide(n, span=140, ndiag_draw=900, seed=5)
    assert len(A.offsets) > 256
    L = n // ndev

    ok, tier, _ = pcg.dia_halo_plan(A, L)
    assert not ok and tier == "unroll"  # off-chip: graceful fallback stays

    with monkeypatch.context() as m:
        # the plan picks dd on the chip; patch narrowly so the kernel's own
        # interpret decision still sees the CPU backend below
        m.setattr(pcg.jax, "default_backend", lambda: "tpu")
        ok, tier, _ = pcg.dia_halo_plan(A, L)
    assert ok and tier == "dd"

    # run the dd solve path itself (interpret kernel) by pinning the plan
    monkeypatch.setattr(
        pcg, "dia_halo_plan", lambda A_, L_: (True, "dd", "")
    )
    b = A.matvec(jnp.ones((n,), jnp.float64))
    x0 = jnp.zeros_like(b)
    ref = cg_solve(lambda v: A.matvec(v), b, x0, max_iter=12, tolerance=0.0)
    dist = make_distributed_dia_cg(make_mesh(ndev), max_iter=12)(A, b, x0)
    assert int(dist.niters) == int(ref.niters)
    tr, td = np.asarray(ref.trace), np.asarray(dist.trace)
    good = np.isfinite(tr) & (tr > 1e-11 * tr[0])
    np.testing.assert_allclose(td[good], tr[good], rtol=1e-10)


def test_dd_supported_budget():
    # huge n: three VMEM-resident x splits exceed the budget
    assert not dia_dd_supported((-300, 300), 50_000_000)
    assert dia_dd_supported((-300, 300), 1_000_000)
