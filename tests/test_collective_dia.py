"""Collective whole-solve kernel for banded explicit (DIA) matrices: the
loaded-matrix analog of backend='collective' — in-kernel RDMA band-strip
halo + in-kernel allreduce, one Pallas call per shard for the whole solve.
Runs on the virtual CPU mesh through the full TPU interpreter (cross-device
shared memory), including its data-race detector."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-TPU-interpreter collective kernels

import jax.numpy as jnp

from hpccg_tpu.operators import DiaMatrix
from hpccg_tpu.parallel import make_collective_dia_cg, make_mesh
from hpccg_tpu.solver import make_cg


def _banded(n, span=200, ndiag_draw=12, seed=0, dtype=np.float32):
    """SPD-ish diagonally dominant banded matrix with scattered offsets in
    a +-span band (span > 128 so the RDMA halo strips are multi-row)."""
    rng = np.random.default_rng(seed)
    offs = sorted(set([0] + [int(o) for o in rng.integers(-span, span + 1, ndiag_draw)]))
    data = np.zeros((len(offs), n), dtype)
    for d, off in enumerate(offs):
        lo, hi = max(0, -off), min(n, n - off)
        data[d, lo:hi] = (
            2.0 * len(offs) if off == 0 else rng.uniform(-1, -0.1, hi - lo)
        )
    return DiaMatrix(data=jnp.asarray(data), offsets=tuple(offs), total_nrow=n)


def _problem(A):
    ones = jnp.ones((A.local_nrow,), A.dtype)
    b = A.matvec(ones)
    return b, jnp.zeros_like(b), ones


@pytest.mark.parametrize("ndev", [2, 4])  # 4: recursive doubling; 2: broadcast
def test_collective_dia_matches_cg1(ndev):
    n = 2048
    A = _banded(n)
    b, x0, xexact = _problem(A)
    rc = make_collective_dia_cg(make_mesh(ndev), max_iter=20)(A, b, x0)
    r1 = make_cg(A, max_iter=20, tolerance=0.0, method="cg1")(b, x0)
    assert int(rc.niters) == int(r1.niters)
    tc, t1 = np.asarray(rc.trace), np.asarray(r1.trace)
    good = np.isfinite(t1) & (t1 > 1e-6 * t1[0])
    np.testing.assert_allclose(tc[good], t1[good], rtol=2e-4)
    assert float(jnp.max(jnp.abs(rc.x - xexact))) < 1e-3


@pytest.mark.parametrize("ndev", [2, 4])
def test_collective_dia_cg_matches_reference_recurrence(ndev):
    """method='cg' through the collective DIA kernel: two in-kernel
    allreduces per iteration, trace parity vs the single-device reference
    recurrence (round-3 VERDICT #3)."""
    n = 2048
    A = _banded(n)
    b, x0, xexact = _problem(A)
    rc = make_collective_dia_cg(make_mesh(ndev), max_iter=20, method="cg")(
        A, b, x0
    )
    r1 = make_cg(A, max_iter=20, tolerance=0.0, method="cg")(b, x0)
    assert int(rc.niters) == int(r1.niters)
    tc, t1 = np.asarray(rc.trace), np.asarray(r1.trace)
    good = np.isfinite(t1) & (t1 > 1e-6 * t1[0])
    np.testing.assert_allclose(tc[good], t1[good], rtol=2e-4)
    assert float(jnp.max(jnp.abs(rc.x - xexact))) < 1e-3


def test_collective_dia_cg_race_free(monkeypatch):
    from hpccg_tpu.ops.pallas import collective_kernel

    monkeypatch.setattr(collective_kernel, "DETECT_RACES", True)
    n = 2048
    A = _banded(n, span=150, ndiag_draw=8, seed=2)
    b, x0, _ = _problem(A)
    res = make_collective_dia_cg(make_mesh(4), max_iter=8, method="cg")(A, b, x0)
    assert float(res.normr) < float(res.trace[0])

    from jax._src.pallas.mosaic.interpret import interpret_pallas_call as _ipc

    assert getattr(_ipc, "races", None) is not None, (
        "jax race-detector internals moved; update this test"
    )
    assert not _ipc.races.races_found


def test_collective_dia_diag_only_no_exchange():
    """offsets=(0,): hbl=hbh=0 — the no-RDMA degenerate band still solves
    (pure elementwise system, converges in one iteration)."""
    n = 1024
    diag = jnp.asarray(
        np.random.default_rng(1).uniform(1.0, 2.0, (1, n)), jnp.float32
    )
    A = DiaMatrix(data=diag, offsets=(0,), total_nrow=n)
    b, x0, _ = _problem(A)
    rc = make_collective_dia_cg(make_mesh(2), max_iter=10, tolerance=1e-12)(A, b, x0)
    assert float(rc.normr) < 1e-3
    np.testing.assert_allclose(np.asarray(rc.x), 1.0, rtol=1e-5)


def test_collective_dia_race_free(monkeypatch):
    """The multi-device solve under the interpreter's data-race detector
    (same tier as the stencil collective kernels)."""
    from hpccg_tpu.ops.pallas import collective_kernel

    monkeypatch.setattr(collective_kernel, "DETECT_RACES", True)
    n = 1024
    A = _banded(n, span=150, ndiag_draw=8, seed=2)
    b, x0, _ = _problem(A)
    res = make_collective_dia_cg(make_mesh(4), max_iter=8)(A, b, x0)
    assert float(res.normr) < float(res.trace[0])


def test_collective_dia_rejects_unsupported():
    mesh = make_mesh(2)
    n = 2048
    A = _banded(n)
    b, x0, _ = _problem(A)
    solve = make_collective_dia_cg(mesh, max_iter=5)

    A64 = DiaMatrix(
        data=A.data.astype(jnp.float64), offsets=A.offsets, total_nrow=n
    )
    with pytest.raises(ValueError, match="f32-only"):
        solve(A64, b.astype(jnp.float64), x0.astype(jnp.float64))

    A_odd = _banded(n + 128)  # 2176 % (2*128) == 128 != 0
    b2, x02, _ = _problem(A_odd)
    with pytest.raises(ValueError, match="pad_problem_rows"):
        solve(A_odd, b2, x02)

    A_wide = _banded(n, span=1500, ndiag_draw=6, seed=3)  # band > 1024-row shard
    b3, x03, _ = _problem(A_wide)
    with pytest.raises(ValueError, match="bandwidth"):
        solve(A_wide, b3, x03)


@pytest.mark.slow
def test_cli_file_mode_collective(tmp_path, capsys):
    """--backend collective in distributed file mode: a banded f32 file with
    a non-(mesh*128)-divisible row count pads to the RDMA-strip unit and
    runs the whole-solve kernel (backend line + cg1-recurrence notice)."""
    import contextlib
    import io as _io
    import json

    from hpccg_tpu.cli import main
    from hpccg_tpu.io import write_hpc_row
    from hpccg_tpu.models.stencil import Problem

    n = 700  # pads to 768 = 2 shards x 3 rows x 128 lanes
    A = _banded(n, span=90, ndiag_draw=8, seed=4)
    ones = jnp.ones((n,), jnp.float32)
    b = A.matvec(ones)
    prob = Problem(
        A=A.to_ell(), b=b, x0=jnp.zeros_like(b), xexact=ones,
        total_nrow=n, total_nnz_model=int(A.nnz), total_nnz_exact=int(A.nnz),
    )
    path = str(tmp_path / "banded.dat")
    write_hpc_row(path, prob)

    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main([path, "--mesh", "2", "--backend", "collective",
                   "--dtype", "float32", "--max-iter", "25",
                   "--skip-kernel-bench", "--json", "--quiet"])
    assert rc == 0
    err = capsys.readouterr().err
    # default --method cg now genuinely runs the reference recurrence
    # in-kernel (round-4: the warn-and-substitute is gone)
    assert "reference cg recurrence" in err
    out = json.loads(buf.getvalue()[buf.getvalue().index("{"):])
    r0 = float(jnp.sqrt(jnp.vdot(b, b)))  # x0 = 0 -> initial residual = ||b||
    assert out["Final residual"] < 1e-2 * r0


@pytest.mark.slow
def test_collective_dia_2d_mesh_matches_1d():
    """The DIA collective kernel over the explicit 2-D ('host','z') mesh:
    partners/RDMA address by the FLATTENED logical index (axis tuple), so
    the solve matches the 1-D 4-device mesh bit-for-bit (mirrors
    test_mesh2d_collective_matches_1d for the stencil kernel)."""
    from hpccg_tpu.parallel import make_mesh2d, row_axis

    n = 2048
    A = _banded(n, span=150, ndiag_draw=8, seed=5)
    b, x0, _ = _problem(A)
    d1 = make_collective_dia_cg(make_mesh(4), max_iter=12)(A, b, x0)
    m2 = make_mesh2d(2, 2)
    d2 = make_collective_dia_cg(m2, max_iter=12, axis=row_axis(m2))(A, b, x0)
    assert int(d2.niters) == int(d1.niters)
    np.testing.assert_array_equal(np.asarray(d2.trace), np.asarray(d1.trace))
    np.testing.assert_array_equal(np.asarray(d2.x), np.asarray(d1.x))


@pytest.mark.slow
def test_solver_memoization_reuses_jit_but_not_data():
    """The factories memoize jitted solves on the static layout key (jax.jit
    caches per function object — round-3 review); a second matrix with the
    SAME layout but different values must still solve ITS system through the
    cached function (data flows as arguments, never closure captures): with
    A2 = 2*A1 and b1 = A1 @ 1, the second solve's answer is 0.5 — a stale
    capture of A1's data would return 1.0."""
    from hpccg_tpu.parallel import make_distributed_dia_cg

    n = 1024
    A1 = _banded(n, span=100, ndiag_draw=6, seed=7)
    A2 = DiaMatrix(data=A1.data * 2.0, offsets=A1.offsets, total_nrow=n)
    b1, x0, _ = _problem(A1)
    for solve in (
        make_collective_dia_cg(make_mesh(2), max_iter=12),
        make_distributed_dia_cg(make_mesh(2), max_iter=12),
    ):
        r1 = solve(A1, b1, x0)  # populates the (offsets, L) jit cache
        np.testing.assert_allclose(np.asarray(r1.x), 1.0, atol=0.05)
        r2 = solve(A2, b1, x0)  # same key, DIFFERENT data
        np.testing.assert_allclose(np.asarray(r2.x), 0.5, atol=0.05)
