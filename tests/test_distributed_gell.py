"""Distributed windowed gather-ELL (round-2 missing #1): scattered-narrow-
band matrices sharded row-wise, each shard running the gell Pallas kernel
with ppermuted bandwidth strips written into its window padding — the class
the reference runs distributed at memory speed (exchange_externals.cpp:51-131
+ HPC_sparsemv.cpp:68-87), previously forced onto the ~100x-slower all-gather
ELL path at --mesh > 1.
"""

import json

import numpy as np
import pytest

import jax.numpy as jnp

from hpccg_tpu.models.stencil import Problem
from hpccg_tpu.operators import EllMatrix
from hpccg_tpu.ops.pallas.gell_kernel import (
    GellMatrix,
    GellShards,
    gell_to_ell,
    prepare_gell,
    prepare_gell_shards,
)
from hpccg_tpu.parallel import make_distributed_gell_cg, make_mesh
from hpccg_tpu.solver import make_cg


def _scattered(n, bw=200, per_row=4, seed=0):
    """Symmetric diagonally-dominant f32 matrix with nonzeros scattered
    across ~2*bw distinct offsets within a +-bw band (the gather-ELL class:
    DIA storage would inflate ~ndiag/per_row, but every tile's window is
    narrow)."""
    rng = np.random.default_rng(seed)
    entries = {}
    for i in range(n):
        deltas = rng.choice(np.arange(1, bw + 1), size=per_row, replace=False)
        for d in deltas:
            j = i + int(d)
            if j < n:
                v = float(rng.uniform(-1.0, -0.1))
                entries[(i, j)] = entries[(j, i)] = v
    for i in range(n):
        entries[(i, i)] = 4.0 * per_row + 2.0
    rows_of = {}
    for (i, j), v in entries.items():
        rows_of.setdefault(i, []).append((j, v))
    width = max(len(v) for v in rows_of.values())
    vals = np.zeros((n, width), np.float32)
    cols = np.zeros((n, width), np.int32)
    valid = np.zeros((n, width), bool)
    for i, lst in rows_of.items():
        for s, (j, v) in enumerate(sorted(lst)):
            cols[i, s], vals[i, s], valid[i, s] = j, v, True
    return EllMatrix(
        vals=jnp.asarray(vals), cols=jnp.asarray(cols),
        valid=jnp.asarray(valid), start_row=0, total_nrow=n,
    )


def _problem(ell):
    b = ell.matvec(jnp.ones((ell.local_nrow,), jnp.float32))
    return Problem(
        A=ell, b=b, x0=jnp.zeros_like(b), xexact=jnp.ones_like(b),
        total_nrow=ell.local_nrow, total_nnz_model=int(ell.nnz),
        total_nnz_exact=int(ell.nnz),
    )


def _trace_parity(single, dist, rtol):
    assert int(dist.niters) == int(single.niters)
    ts, td = np.asarray(single.trace), np.asarray(dist.trace)
    good = np.isfinite(ts) & (ts > 1e-5 * ts[0])
    np.testing.assert_allclose(td[good], ts[good], rtol=rtol)


@pytest.mark.slow
@pytest.mark.parametrize("ndev", [2, 8])
def test_distributed_gell_matches_single(ndev):
    n = 2048  # 2 tiles of 1024 rows per shard at ndev=2... and 256-row L at 8
    ell = _scattered(n, bw=120, per_row=3, seed=1)
    prob = _problem(ell)
    single = make_cg(ell, max_iter=30, tolerance=0.0)(prob.b, prob.x0)
    mesh = make_mesh(ndev)
    dist = make_distributed_gell_cg(mesh, max_iter=30, tolerance=0.0)(
        ell, prob.b, prob.x0
    )
    _trace_parity(single, dist, rtol=2e-4)
    np.testing.assert_allclose(
        np.asarray(dist.x), np.asarray(single.x), rtol=1e-3, atol=1e-5
    )


@pytest.mark.slow
def test_distributed_gell_2d_mesh_matches_1d():
    """The gell tier over the explicit 2-D ('host','z') mesh (the CLI's
    --mesh HxZ) matches the 1-D 8-device solve bit-for-bit — same row
    sharding, only the device grouping differs (mirrors
    test_mesh2d.py's stencil check; the CLI threads axis=row_axis(mesh)
    into make_distributed_gell_cg at cli.py's build_mesh)."""
    from hpccg_tpu.parallel import make_mesh2d, row_axis

    n = 2048
    ell = _scattered(n, bw=120, per_row=3, seed=1)
    prob = _problem(ell)
    d1 = make_distributed_gell_cg(make_mesh(8), max_iter=25, tolerance=0.0)(
        ell, prob.b, prob.x0
    )
    m2 = make_mesh2d(2, 4)
    d2 = make_distributed_gell_cg(
        m2, max_iter=25, tolerance=0.0, axis=row_axis(m2)
    )(ell, prob.b, prob.x0)
    assert int(d2.niters) == int(d1.niters)
    np.testing.assert_array_equal(np.asarray(d2.trace), np.asarray(d1.trace))
    np.testing.assert_array_equal(np.asarray(d2.x), np.asarray(d1.x))


@pytest.mark.slow
def test_gell_shards_match_single_device_kernel():
    """The sharded kernels' assembled matvec equals the single-device gell
    kernel's (same windowed layout, halo strips replacing the padding)."""
    from hpccg_tpu.ops.pallas.gell_kernel import spmv_gell, spmv_gell_shard

    n, ndev = 4096, 4
    ell = _scattered(n, bw=200, per_row=4, seed=2)
    g = prepare_gell(ell)
    shards = prepare_gell_shards(ell, ndev)
    L = shards.L
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(n), jnp.float32)
    y_single = np.asarray(spmv_gell(g, x))
    ys = []
    for r in range(ndev):
        lo = x[r * L - shards.bw_lo : r * L] if r > 0 else None
        hi = x[(r + 1) * L : (r + 1) * L + shards.bw_hi] if r < ndev - 1 else None
        ys.append(
            np.asarray(
                spmv_gell_shard(
                    shards.vals4[r], shards.li4[r], x[r * L : (r + 1) * L],
                    lo, hi, L=L, width=shards.width,
                    k_chunks=shards.k_chunks, pbl=shards.pbl,
                    bw_lo=shards.bw_lo, slot_bounds=shards.slot_bounds,
                )
            )
        )
    np.testing.assert_allclose(np.concatenate(ys), y_single, rtol=1e-5, atol=1e-5)


def test_pad_problem_rows_gell():
    """round-2 weak #5: pad_problem_rows pads a GellMatrix (via the lossless
    ELL round trip) instead of raising TypeError."""
    from hpccg_tpu.io import pad_problem_rows

    n = 1000
    ell = _scattered(n, bw=60, per_row=3, seed=3)
    g = prepare_gell(ell)
    prob = _problem(ell)
    import dataclasses

    gprob = dataclasses.replace(prob, A=g)
    padded = pad_problem_rows(gprob, 8)
    assert padded.total_nrow == 1000 + (8 - 1000 % 8) % 8
    assert isinstance(padded.A, GellMatrix)
    # pad rows are decoupled identity rows: the matvec on [x_real | 0] must
    # reproduce the original on real rows and 0 on pads
    x = jnp.concatenate(
        [prob.b, jnp.zeros((padded.total_nrow - n,), jnp.float32)]
    )
    y = np.asarray(padded.A.matvec(x))
    np.testing.assert_allclose(y[:n], np.asarray(ell.matvec(prob.b)), rtol=1e-5)
    np.testing.assert_array_equal(y[n:], 0.0)


def test_gell_to_ell_roundtrip():
    ell = _scattered(512, bw=48, per_row=3, seed=4)
    g = prepare_gell(ell)
    back = gell_to_ell(g)
    r1, c1, v1 = (np.asarray(a) for a in ell.to_coo())
    r2, c2, v2 = (np.asarray(a) for a in back.to_coo())
    o1, o2 = np.lexsort((c1, r1)), np.lexsort((c2, r2))
    np.testing.assert_array_equal(r1[o1], r2[o2])
    np.testing.assert_array_equal(c1[o1], c2[o2])
    np.testing.assert_allclose(v1[o1], v2[o2], rtol=1e-6)


@pytest.mark.slow
def test_distributed_gell_remainder_padding():
    """Non-divisible rows: pad first, distributed trajectory matches the
    unpadded single-device solve exactly (pad residuals are 0 throughout)."""
    from hpccg_tpu.io import pad_problem_rows

    n = 2000  # 8 shards -> pad to 2048, L=256
    ell = _scattered(n, bw=100, per_row=3, seed=5)
    prob = _problem(ell)
    single = make_cg(ell, max_iter=25, tolerance=0.0)(prob.b, prob.x0)
    padded = pad_problem_rows(prob, 8)
    mesh = make_mesh(8)
    dist = make_distributed_gell_cg(mesh, max_iter=25, tolerance=0.0)(
        padded.A, padded.b, padded.x0
    )
    _trace_parity(single, dist, rtol=2e-4)
    x = np.asarray(dist.x)
    np.testing.assert_allclose(x[:n], np.asarray(single.x), rtol=1e-3, atol=1e-5)
    np.testing.assert_array_equal(x[n:], 0.0)


def test_prepare_gell_shards_rejects_wide_band():
    n = 512
    ell = _scattered(n, bw=100, per_row=2, seed=6)
    with pytest.raises(ValueError, match="bandwidth"):
        prepare_gell_shards(ell, 8)  # L = 64 < bw 100


@pytest.mark.slow
def test_cli_file_mesh_gell_halo(tmp_path, capsys):
    """End to end: an f32 scattered-narrow-band file under --mesh 8 rides
    the per-shard gell kernels (NOT the all-gather fallback) with parity vs
    the single-device solve."""
    import contextlib
    import io as _io

    from hpccg_tpu.cli import main
    from hpccg_tpu.io import write_hpc_row

    n = 2048
    ell64 = _scattered(n, bw=120, per_row=3, seed=7)
    # write as f64 text (the format is textual; --dtype float32 reloads it)
    ellp = _problem(ell64)
    path = str(tmp_path / "scat32.dat")
    write_hpc_row(path, ellp)

    base = ["--dtype", "float32", "--max-iter", "20",
            "--skip-kernel-bench", "--json", "--quiet"]

    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main([path] + base)
    assert rc == 0
    err1 = capsys.readouterr().err
    assert "gell" in err1  # the single-device chooser picked the gather tier
    r1 = json.loads(buf.getvalue()[buf.getvalue().index("{"):])

    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        # no --skip-kernel-bench on the mesh run: the Time Summary kernel
        # rows must come from the gell per-shard kernel (VERDICT r3 #6)
        rc = main([path, "--mesh", "8"] + base[:-3] + base[-2:])
    assert rc == 0
    err8 = capsys.readouterr().err
    assert "all-gather" not in err8
    r8 = json.loads(buf.getvalue()[buf.getvalue().index("{"):])
    assert "gell-halo" in json.dumps(r8)  # Time Summary names the path
    assert r8["Number of iterations"] == r1["Number of iterations"]
    np.testing.assert_allclose(
        r8["Final residual"], r1["Final residual"], rtol=5e-3, atol=1e-6
    )
    ts = r8["Time Summary"]
    assert np.isfinite(ts["SPARSEMV"]) and np.isfinite(ts["DDOT    "])
    note = [k for k in ts if "SPARSEMV row benches" in k]
    assert note and "gell" in note[0]


def test_gell_shards_is_pytree():
    ell = _scattered(512, bw=40, per_row=2, seed=8)
    shards = prepare_gell_shards(ell, 2)
    import jax

    leaves = jax.tree_util.tree_leaves(shards)
    assert len(leaves) == 6  # vals4, li4, and the 4 boundary-COO arrays
    assert isinstance(shards, GellShards)


@pytest.mark.slow
def test_distributed_gell_dd_f64_matches_xla_oracle():
    """f64 scattered-narrow-band at --mesh > 1: shards carry (hi, lo)
    planes and each runs the double-float gather kernel; trajectory parity
    vs the single-device XLA f64 ELL solve at dd-class accuracy (closing
    the last distributed f64 corner — previously a loud reject to the
    all-gather path)."""
    n, ndev = 2048, 4
    ell32 = _scattered(n, bw=100, per_row=3, seed=11)
    rng = np.random.default_rng(12)
    vals = np.asarray(ell32.vals, np.float64) * (
        1 + 1e-9 * rng.standard_normal(ell32.vals.shape)
    )
    ell = EllMatrix(
        vals=jnp.asarray(vals), cols=ell32.cols, valid=ell32.valid,
        start_row=0, total_nrow=n,
    )
    b = ell.matvec(jnp.ones((n,), jnp.float64))
    x0 = jnp.zeros_like(b)
    single = make_cg(ell, max_iter=25, tolerance=0.0, backend="ell")(b, x0)
    shards = prepare_gell_shards(ell, ndev)
    assert shards.dtype == jnp.float64 and shards.vals4lo is not None
    dist = make_distributed_gell_cg(make_mesh(ndev), max_iter=25, tolerance=0.0)(
        shards, b, x0
    )
    _trace_parity(single, dist, rtol=1e-9)
    np.testing.assert_allclose(
        np.asarray(dist.x), np.asarray(single.x), rtol=1e-9, atol=1e-12
    )


@pytest.mark.slow
def test_gell_halo_overlap_kernel_has_no_ppermute_dependency():
    """Like the DIA tier: the gather kernel runs on a zero halo and the
    ppermuted strips feed only the boundary scatter-add corrections."""
    import jax

    from tests.test_distributed_file import _kernel_ppermute_dep

    n, ndev = 2048, 4
    ell = _scattered(n, bw=120, per_row=3, seed=9)
    prob = _problem(ell)
    shards = prepare_gell_shards(ell, ndev)  # host prep outside the trace
    solve = make_distributed_gell_cg(make_mesh(ndev), max_iter=3)
    jaxpr = jax.make_jaxpr(lambda bb, xx: solve(shards, bb, xx))(
        prob.b, prob.x0
    )
    assert not _kernel_ppermute_dep(jaxpr)
