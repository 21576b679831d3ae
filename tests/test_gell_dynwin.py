"""Dynamic-window gather tier (round 5) — the low-inflation wide-scatter
kernel.

Same matrix class as the strip stack (bands beyond the 32-chunk gell window
even after RCM) but per-(tile, slot) SMEM window bases instead of strip-
static offsets: inflation drops from the strip max to the greedy bump
overflow (64^3 permuted stencil: 2.06x vs 3.1x, 2.7x faster on chip —
exp/dynwin_probe.py). These tests pin the greedy prep's invariants, kernel
correctness vs the COO oracle (incl. the permuted-stencil target case and
the double-float variant), CG parity through make_cg, chooser routing, io
round trips, and the distributed (all-gathered x) path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hpccg_tpu import ProblemConfig
from hpccg_tpu.models.stencil import generate_ell
from hpccg_tpu.operators import EllMatrix
from hpccg_tpu.ops.pallas.gell_dynwin import (
    GellDynwinMatrix,
    dynwin_cost_model,
    dynwin_to_ell,
    prepare_gell_dynwin,
    spmv_gell_dynwin,
)
from hpccg_tpu.reorder import auto_structure, bandwidth, permute_ell
from hpccg_tpu.solver import make_cg

from tests.test_gell_stack import _wide_scatter, _wide_scatter_f64, _coo_matvec

pytestmark = pytest.mark.quick


@pytest.mark.parametrize("K", [8, 16, 24])
def test_dynwin_matvec_matches_oracle(K):
    A = _wide_scatter(20000, 9, 6000, seed=1)
    D = prepare_gell_dynwin(A, K=K)
    assert D.W >= 9  # at least the row width
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal(20000), jnp.float32)
    y = np.asarray(spmv_gell_dynwin(D, x))
    y_ref = _coo_matvec(A, x)
    err = np.max(np.abs(y - y_ref)) / np.max(np.abs(y_ref))
    assert err < 1e-5, err


def test_dynwin_rejects_out_of_range_K():
    """K < SUB cannot represent an entry at offset SUB-1 from its own
    SUB-aligned window base — the greedy would spin max_w useless rounds;
    prepare must fail FAST with the real reason (code-review round 5).
    K past the int16 window-local range is the other edge."""
    A = _wide_scatter(2048, 5, 600, seed=2)
    with pytest.raises(ValueError, match="representable window range"):
        prepare_gell_dynwin(A, K=4)
    with pytest.raises(ValueError, match="representable window range"):
        prepare_gell_dynwin(A, K=256)  # 256*128 > int16
    ok, rate, W = dynwin_cost_model(A, K=4)
    assert not ok and W == 0


def test_dynwin_prep_invariants():
    """Greedy assignment invariants: every stored index window-local in
    [0, K*LANE), bases SUB-aligned, stored nonzeros == the source's."""
    from hpccg_tpu.ops.pallas.gell_kernel import LANE, SUB

    A = _wide_scatter(8192, 7, 2500, seed=3)
    D = prepare_gell_dynwin(A, K=16)
    li = np.asarray(D.li4)
    assert li.min() >= 0 and li.max() < 16 * LANE
    woff = np.asarray(D.woff)
    assert (woff % SUB == 0).all()
    assert (woff >= 0).all() and (woff.max() + 16) <= D.xp_chunks
    assert int((np.asarray(D.vals4) != 0).sum()) == int(
        (np.asarray(A.vals) != 0).sum()
    )


def test_dynwin_permuted_stencil_target_case():
    """The wide-scatter target: a randomly permuted stencil (bandwidth ~ n,
    beyond the plain gell window) — dynwin must represent it exactly."""
    cfg = ProblemConfig(16, 16, 16, dtype=jnp.float32)  # 4096 rows
    prob = generate_ell(cfg)
    n = prob.A.local_nrow
    A0 = EllMatrix(
        vals=np.asarray(prob.A.vals, np.float32),
        cols=np.asarray(prob.A.cols),
        valid=np.asarray(prob.A.valid),
        start_row=0,
        total_nrow=n,
    )
    rng = np.random.default_rng(4)
    Ap = permute_ell(A0, rng.permutation(n))
    assert bandwidth(Ap) > 32 * 128 - 1024  # beyond the plain gell window
    D = prepare_gell_dynwin(Ap, K=16)
    x = jnp.asarray(rng.standard_normal(n), jnp.float32)
    y = np.asarray(spmv_gell_dynwin(D, x))
    y_ref = _coo_matvec(Ap, x)
    assert np.max(np.abs(y - y_ref)) / np.max(np.abs(y_ref)) < 1e-5


def test_chooser_wide_scatter_rides_a_wide_tier_and_models_agree():
    """auto_structure books whichever wide tier (stack/dynwin) its shared
    cost model prices faster — and the dynwin model's W must match the
    build (the model IS a dry run of the greedy prep)."""
    A = _wide_scatter(30000, 9, 9000, seed=5)
    ok, rate, W = dynwin_cost_model(A, K=16)
    assert ok and rate > 0
    D = prepare_gell_dynwin(A, K=16)
    assert D.W == W
    op, perm, report = auto_structure(A)
    assert report.format.startswith(("gstack", "gdynwin")), report


def test_dynwin_cg_solve_parity():
    """CG through make_cg on the dynwin operator matches the ELL oracle
    trajectory."""
    A = _wide_scatter(8192, 7, 2500, seed=6)
    D = prepare_gell_dynwin(A, K=16)
    n = A.local_nrow
    b = jnp.asarray(_coo_matvec(A, np.ones(n)), jnp.float32)
    x0 = jnp.zeros(n, jnp.float32)
    Ad = EllMatrix(
        vals=jnp.asarray(A.vals), cols=jnp.asarray(A.cols),
        valid=jnp.asarray(A.valid), start_row=0, total_nrow=n,
    )
    r_dyn = make_cg(D, max_iter=15, tolerance=0.0)(b, x0)
    r_ell = make_cg(Ad, max_iter=15, tolerance=0.0)(b, x0)
    td, te = np.asarray(r_dyn.trace), np.asarray(r_ell.trace)
    good = np.isfinite(te) & (te > 1e-5 * te[0])
    np.testing.assert_allclose(td[good], te[good], rtol=2e-4)


def test_dynwin_to_ell_round_trip():
    A = _wide_scatter(8192, 7, 2500, seed=7)
    D = prepare_gell_dynwin(A, K=8)
    back = dynwin_to_ell(D)
    r0, c0, v0 = A.to_coo()
    r1, c1, v1 = back.to_coo()
    o0 = np.lexsort((c0, r0))
    o1 = np.lexsort((np.asarray(c1), np.asarray(r1)))
    np.testing.assert_array_equal(np.asarray(r1)[o1], r0[o0])
    np.testing.assert_array_equal(np.asarray(c1)[o1], c0[o0])
    np.testing.assert_allclose(np.asarray(v1)[o1], v0[o0], rtol=1e-6)


def test_dynwin_save_load_round_trip(tmp_path):
    from hpccg_tpu.io import load_problem, save_problem
    from hpccg_tpu.models.stencil import Problem

    A = _wide_scatter(4096, 5, 1500, seed=8)
    D = prepare_gell_dynwin(A, K=8)
    n = A.local_nrow
    prob = Problem(
        A=D,
        b=jnp.ones(n, jnp.float32),
        x0=jnp.zeros(n, jnp.float32),
        xexact=jnp.ones(n, jnp.float32),
        total_nrow=n, total_nnz_model=D.nnz, total_nnz_exact=D.nnz,
    )
    path = str(tmp_path / "dynwin.npz")
    save_problem(path, prob)
    prob2, _state = load_problem(path)
    assert isinstance(prob2.A, GellDynwinMatrix)
    assert (prob2.A.W, prob2.A.K, prob2.A.pbl) == (D.W, D.K, D.pbl)
    np.testing.assert_array_equal(np.asarray(prob2.A.woff), np.asarray(D.woff))
    x = jnp.asarray(np.random.default_rng(9).standard_normal(n), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(prob2.A.matvec(x)), np.asarray(D.matvec(x)), rtol=1e-6
    )


def test_dynwin_dd_matvec_matches_f64_oracle():
    """The double-float dynamic-window kernel: ~1e-13 rel vs the f64 oracle
    where a plain f32 pass of the same matrix is ~1e-7."""
    from hpccg_tpu.ops.pallas.gell_dynwin import spmv_gell_dynwin_dd

    A64 = _wide_scatter_f64(8192, 5, 2500, seed=11)
    D = prepare_gell_dynwin(A64, K=8)
    assert D.vals4lo is not None and D.dtype == jnp.float64
    rng = np.random.default_rng(12)
    x = rng.standard_normal(8192)
    y = np.asarray(spmv_gell_dynwin_dd(D, jnp.asarray(x, jnp.float64)))
    y_ref = _coo_matvec(A64, x)
    scale = np.max(np.abs(y_ref))
    err_dd = np.max(np.abs(y - y_ref)) / scale
    assert err_dd < 1e-12, err_dd
    D32 = prepare_gell_dynwin(
        EllMatrix(
            vals=np.asarray(A64.vals, np.float32),
            cols=np.asarray(A64.cols), valid=np.asarray(A64.valid),
            start_row=0, total_nrow=A64.total_nrow,
        ),
        K=8,
    )
    y32 = np.asarray(spmv_gell_dynwin(D32, jnp.asarray(x, jnp.float32)))
    err_f32 = np.max(np.abs(y32 - y_ref)) / scale
    assert err_f32 > 100 * max(err_dd, 1e-16), (err_f32, err_dd)


def test_dynwin_dd_save_load_round_trip(tmp_path):
    from hpccg_tpu.io import load_problem, save_problem
    from hpccg_tpu.models.stencil import Problem

    A64 = _wide_scatter_f64(4096, 5, 1500, seed=14)
    D = prepare_gell_dynwin(A64, K=8)
    n = A64.local_nrow
    prob = Problem(
        A=D,
        b=jnp.ones(n, jnp.float64),
        x0=jnp.zeros(n, jnp.float64),
        xexact=jnp.ones(n, jnp.float64),
        total_nrow=n, total_nnz_model=D.nnz, total_nnz_exact=D.nnz,
    )
    path = str(tmp_path / "dynwin_dd.npz")
    save_problem(path, prob)
    prob2, _state = load_problem(path)
    assert isinstance(prob2.A, GellDynwinMatrix)
    assert prob2.A.vals4lo is not None and prob2.A.dtype == jnp.float64
    x = jnp.asarray(np.random.default_rng(15).standard_normal(n), jnp.float64)
    np.testing.assert_allclose(
        np.asarray(prob2.A.matvec(x)), np.asarray(D.matvec(x)), rtol=1e-12
    )


# ---- distributed dynwin tier (per-shard SMEM-window kernel, all-gathered x) --


@pytest.mark.parametrize("ndev", [2, 4, 8])
def test_distributed_dynwin_matches_single_device(ndev):
    """The sharded dynwin solve reproduces the single-device trajectory:
    same kernel per shard (local tiles, woff rebased onto the shard's tight
    window of the padded global x), psum ddots."""
    from hpccg_tpu.parallel import make_distributed_dynwin_cg, make_mesh

    n = 8192  # = 8 tiles: whole tiles per shard at 2/4/8 devices
    A = _wide_scatter(n, 7, 2500, seed=20)
    D = prepare_gell_dynwin(A, K=16)
    b = jnp.asarray(_coo_matvec(A, np.ones(n)), jnp.float32)
    x0 = jnp.zeros(n, jnp.float32)
    r_single = make_cg(D, max_iter=12, tolerance=0.0)(b, x0)
    mesh = make_mesh(ndev)
    solve = make_distributed_dynwin_cg(mesh, max_iter=12)
    r_dist = solve(D, b, x0)
    # per-shard partial ddots reduce in a different order than the
    # single-device dot — same tolerance convention as the stack tier
    np.testing.assert_allclose(
        np.asarray(r_dist.trace), np.asarray(r_single.trace), rtol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(r_dist.x), np.asarray(r_single.x), rtol=1e-3, atol=1e-5
    )


def test_distributed_dynwin_dd_matches_single_device():
    """f64 distributed dynwin: per-shard double-float kernel on the
    all-gathered x matches the single-device dd solve at f64 scale."""
    from hpccg_tpu.parallel import make_distributed_dynwin_cg, make_mesh

    n = 4096
    A64 = _wide_scatter_f64(n, 5, 1500, seed=21, spread=False)
    D = prepare_gell_dynwin(A64, K=8)
    assert D.vals4lo is not None
    b = jnp.asarray(_coo_matvec(A64, np.ones(n)), jnp.float64)
    x0 = jnp.zeros(n, jnp.float64)
    r_single = make_cg(D, max_iter=10, tolerance=0.0)(b, x0)
    mesh = make_mesh(4)
    r_dist = make_distributed_dynwin_cg(mesh, max_iter=10)(D, b, x0)
    np.testing.assert_allclose(
        np.asarray(r_dist.trace), np.asarray(r_single.trace), rtol=1e-12
    )


def test_distributed_dynwin_requires_whole_tiles():
    from hpccg_tpu.ops.pallas.gell_dynwin import dynwin_shard_geometry

    A = _wide_scatter(3072, 5, 900, seed=22)  # 3 tiles: not divisible by 2
    D = prepare_gell_dynwin(A, K=8)
    with pytest.raises(ValueError, match="whole-tile"):
        dynwin_shard_geometry(D, 2)


def test_distributed_dynwin_spmv_bench_tier():
    """The file-mode Time Summary rows can bench the dynwin tier: the bench
    loop's chained matvecs match the plain matvec chain."""
    from hpccg_tpu.parallel import make_mesh
    from hpccg_tpu.parallel.cg import make_distributed_spmv_bench

    n = 4096
    A = _wide_scatter(n, 5, 1200, seed=23)
    D = prepare_gell_dynwin(A, K=8)
    mesh = make_mesh(4)
    make_loop, tier = make_distributed_spmv_bench(mesh, D)
    assert tier == "dynwin-allgather"
    v = jnp.asarray(np.random.default_rng(24).standard_normal(n), jnp.float32)
    got = np.asarray(make_loop(2)(v))
    want = np.asarray(D.matvec(D.matvec(v) / 54.0)) / 54.0
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-6)


@pytest.mark.parametrize("case", ["f32", "f64"])
def test_native_greedy_equals_numpy_greedy(case):
    """The csrc greedy (hpccg_dynwin_greedy) must produce BITWISE the same
    operator as the NumPy lockstep loop — same slot assignment, bases
    (incl. the carried-forward bases of finished tiles), and planes."""
    from hpccg_tpu import native

    if not native.available():
        pytest.skip("native library unavailable")
    A = (
        _wide_scatter(8192, 7, 2500, seed=30)
        if case == "f32"
        else _wide_scatter_f64(8192, 7, 2500, seed=31)
    )
    for K in (8, 16):
        Dn = prepare_gell_dynwin(A, K=K, use_native=True)
        Dp = prepare_gell_dynwin(A, K=K, use_native=False)
        assert (Dn.W, Dn.pbl, Dn.xp_chunks) == (Dp.W, Dp.pbl, Dp.xp_chunks)
        np.testing.assert_array_equal(np.asarray(Dn.woff), np.asarray(Dp.woff))
        np.testing.assert_array_equal(np.asarray(Dn.vals4), np.asarray(Dp.vals4))
        np.testing.assert_array_equal(np.asarray(Dn.li4), np.asarray(Dp.li4))
        if case == "f64":
            np.testing.assert_array_equal(
                np.asarray(Dn.vals4lo), np.asarray(Dp.vals4lo)
            )
        else:
            assert Dn.vals4lo is None and Dp.vals4lo is None


def test_dynwin_pad_problem_rows_keeps_trajectory():
    """io.pad_problem_rows re-preps the dynwin operator at the padded row
    count with identity pad rows — the solve trajectory on the real rows is
    unchanged."""
    import dataclasses as _dc

    from hpccg_tpu.io import pad_problem_rows
    from hpccg_tpu.models.stencil import Problem

    n = 3000
    A = _wide_scatter(n, 5, 900, seed=25)
    D = prepare_gell_dynwin(A, K=8)
    b = jnp.asarray(_coo_matvec(A, np.ones(n)), jnp.float32)
    prob = Problem(
        A=D, b=b, x0=jnp.zeros(n, jnp.float32), xexact=jnp.ones(n, jnp.float32),
        total_nrow=n, total_nnz_model=D.nnz, total_nnz_exact=D.nnz,
    )
    padded = pad_problem_rows(prob, 2048)
    assert isinstance(padded.A, GellDynwinMatrix)
    assert padded.total_nrow == 4096 and padded.A.K == 8
    r0 = make_cg(D, max_iter=10, tolerance=0.0)(b, prob.x0)
    r1 = make_cg(padded.A, max_iter=10, tolerance=0.0)(padded.b, padded.x0)
    np.testing.assert_allclose(
        np.asarray(r1.trace), np.asarray(r0.trace), rtol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(r1.x)[:n], np.asarray(r0.x), rtol=1e-3, atol=1e-5
    )
