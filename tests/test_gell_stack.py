"""Strip-bucketed gather stack — the wide-scatter tier (round-4 VERDICT #1).

The class: matrices whose band exceeds the windowed gather kernel's 32-chunk
cap even after RCM (e.g. a randomly permuted 3-D stencil, optimal bandwidth
Theta(n^(2/3))). Round 3's only path was the XLA take gather; these tests pin
the stack kernel's correctness (vs the COO oracle and the permuted-stencil
target case), the chooser routing, CG solve parity, and the io round trips.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hpccg_tpu import ProblemConfig
from hpccg_tpu.models.stencil import generate_ell
from hpccg_tpu.operators import EllMatrix
from hpccg_tpu.ops.pallas.gell_stack import (
    GellStackMatrix,
    prepare_gell_stack,
    spmv_gell_stack,
    stack_cost_model,
    stack_to_ell,
)
from hpccg_tpu.reorder import auto_structure, bandwidth, permute_ell, rcm_permutation
from hpccg_tpu.solver import make_cg

pytestmark = pytest.mark.quick


def _wide_scatter(n, per_row, bw, seed=0, spd=True):
    """Random wide-band ELL (f32); spd=True makes it diagonally dominant
    symmetric-free but CG-friendly enough for trajectory checks."""
    rng = np.random.default_rng(seed)
    cols = np.clip(
        np.arange(n)[:, None] + rng.integers(-bw, bw + 1, (n, per_row)), 0, n - 1
    )
    cols[:, 0] = np.arange(n)  # diagonal slot
    vals = rng.uniform(-1.0, -0.1, (n, per_row)).astype(np.float32)
    vals[:, 0] = per_row + 1.0  # dominance
    valid = np.ones((n, per_row), bool)
    valid[rng.random((n, per_row)) < 0.15] = False
    valid[:, 0] = True
    return EllMatrix(
        vals=np.where(valid, vals, 0.0).astype(np.float32),
        cols=cols.astype(np.int32),
        valid=valid,
        start_row=0,
        total_nrow=n,
    )


def _coo_matvec(A, x):
    rows, cols, vals = A.to_coo()
    y = np.zeros(A.local_nrow)
    np.add.at(y, rows, vals * np.asarray(x)[cols.astype(np.int64)])
    return y


@pytest.mark.parametrize("strip_chunks", [8, 16, 32])
def test_stack_matvec_matches_oracle(strip_chunks):
    A = _wide_scatter(20000, 9, 6000, seed=1)
    S = prepare_gell_stack(A, strip_chunks=strip_chunks)
    assert len(S.strips) > 1  # genuinely multi-strip
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal(20000), jnp.float32)
    y = np.asarray(spmv_gell_stack(S, x))
    y_ref = _coo_matvec(A, x)
    err = np.max(np.abs(y - y_ref)) / np.max(np.abs(y_ref))
    assert err < 1e-5, err


def test_stack_permuted_stencil_target_case():
    """The VERDICT target: a randomly permuted stencil, RCM-irreducible —
    the stack must represent it exactly and auto_structure must route it
    off the ELL fallback."""
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
    rng = np.random.default_rng(3)
    Ap = permute_ell(A0, rng.permutation(n))
    # force the wide regime for this small n: skip RCM's reduction by
    # checking the raw permuted matrix (bandwidth ~ n)
    assert bandwidth(Ap) > 32 * 128 - 1024  # beyond the plain gell window
    S = prepare_gell_stack(Ap, strip_chunks=16)
    x = jnp.asarray(rng.standard_normal(n), jnp.float32)
    y = np.asarray(spmv_gell_stack(S, x))
    y_ref = _coo_matvec(Ap, x)
    assert np.max(np.abs(y - y_ref)) / np.max(np.abs(y_ref)) < 1e-5


def test_chooser_picks_stack_for_wide_scatter():
    A = _wide_scatter(30000, 9, 9000, seed=4)
    op, perm, report = auto_structure(A)
    assert report.format.startswith("gstack"), report
    assert isinstance(op, GellStackMatrix)


def test_chooser_keeps_gell_for_narrow_band():
    """Narrow scattered bands must still ride the plain windowed kernel
    (lower inflation than the stack)."""
    A = _wide_scatter(20000, 5, 300, seed=5)
    op, perm, report = auto_structure(A)
    assert report.format.startswith(("gell", "dia")), report


def test_stack_cg_solve_parity():
    """CG through make_cg on the stack operator matches the ELL oracle
    trajectory."""
    A = _wide_scatter(8192, 7, 2500, seed=6)
    S = prepare_gell_stack(A, strip_chunks=16)
    n = A.local_nrow
    ones = np.ones(n)
    b = jnp.asarray(_coo_matvec(A, ones), jnp.float32)
    x0 = jnp.zeros(n, jnp.float32)
    Ad = EllMatrix(
        vals=jnp.asarray(A.vals), cols=jnp.asarray(A.cols),
        valid=jnp.asarray(A.valid), start_row=0, total_nrow=n,
    )
    r_stack = make_cg(S, max_iter=15, tolerance=0.0)(b, x0)
    r_ell = make_cg(Ad, max_iter=15, tolerance=0.0)(b, x0)
    ts, te = np.asarray(r_stack.trace), np.asarray(r_ell.trace)
    good = np.isfinite(te) & (te > 1e-5 * te[0])
    np.testing.assert_allclose(ts[good], te[good], rtol=2e-4)


def test_stack_to_ell_round_trip():
    A = _wide_scatter(8192, 7, 2500, seed=7)
    S = prepare_gell_stack(A, strip_chunks=8)
    back = stack_to_ell(S)
    r0, c0, v0 = A.to_coo()
    r1, c1, v1 = back.to_coo()
    o0 = np.lexsort((c0, r0))
    o1 = np.lexsort((np.asarray(c1), np.asarray(r1)))
    np.testing.assert_array_equal(np.asarray(r1)[o1], r0[o0])
    np.testing.assert_array_equal(np.asarray(c1)[o1], c0[o0])
    np.testing.assert_allclose(np.asarray(v1)[o1], v0[o0], rtol=1e-6)


def test_stack_save_load_round_trip(tmp_path):
    from hpccg_tpu.io import load_problem, save_problem
    from hpccg_tpu.models.stencil import Problem

    A = _wide_scatter(4096, 5, 1500, seed=8)
    S = prepare_gell_stack(A, strip_chunks=8)
    n = A.local_nrow
    prob = Problem(
        A=S,
        b=jnp.ones(n, jnp.float32),
        x0=jnp.zeros(n, jnp.float32),
        xexact=jnp.ones(n, jnp.float32),
        total_nrow=n, total_nnz_model=S.nnz, total_nnz_exact=S.nnz,
    )
    path = str(tmp_path / "stack.npz")
    save_problem(path, prob)
    prob2, state = load_problem(path)
    assert isinstance(prob2.A, GellStackMatrix)
    assert prob2.A.strips == S.strips
    x = jnp.asarray(np.random.default_rng(9).standard_normal(n), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(prob2.A.matvec(x)), np.asarray(S.matvec(x)), rtol=1e-6
    )


def test_stack_cost_model_agrees_with_build():
    A = _wide_scatter(20000, 9, 6000, seed=10)
    ok, rate, wtot = stack_cost_model(A, strip_chunks=16)
    assert ok
    S = prepare_gell_stack(A, strip_chunks=16)
    assert S.wtot == wtot


def test_stack_rejects_f64():
    A = _wide_scatter(4096, 5, 1500, seed=11)
    import dataclasses

    A64 = dataclasses.replace(A, vals=np.asarray(A.vals, np.float64))
    with pytest.raises(ValueError, match="f32"):
        prepare_gell_stack(A64)
