"""Pallas kernel tests (interpret mode on CPU; the same code compiles via
Mosaic on real TPUs — verified on hardware separately)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from hpccg_tpu import ProblemConfig, Stencil, generate_problem
from hpccg_tpu.ops.pallas.stencil_kernel import (
    pad_plane,
    plane_masks,
    spmv_padded,
    spmv_stencil_pallas,
    unpad_plane,
)
from hpccg_tpu.ops.vector import compute_residual
from hpccg_tpu.parallel import make_mesh
from hpccg_tpu.parallel.cg import generate_problem_sharded, make_distributed_cg
from hpccg_tpu.solver import make_cg


CASES = [
    ((16, 16, 16), Stencil.S27),
    ((20, 12, 8), Stencil.S27),  # nz not a multiple of 8 -> z-padding path
    ((8, 12, 20), Stencil.S7),
    ((5, 3, 9), Stencil.S27),  # tiny, very unaligned
    ((128, 2, 3), Stencil.S27),  # nx == lane width exactly: masked-roll path
    ((128, 3, 2), Stencil.S7),
]


@pytest.mark.slow
@pytest.mark.parametrize("dims,stencil", CASES)
def test_pallas_spmv_matches_xla(dims, stencil):
    nx, ny, nz = dims
    cfg = ProblemConfig(nx, ny, nz, stencil=stencil, dtype=jnp.float32)
    prob = generate_problem(cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(cfg.local_nrow), jnp.float32)
    got = np.asarray(spmv_stencil_pallas(prob.A, x))
    want = np.asarray(prob.A.matvec(x))
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-5)


def test_pallas_padding_stays_zero():
    cfg = ProblemConfig(5, 3, 9, dtype=jnp.float32)
    prob = generate_problem(cfg)
    op = prob.A
    masks = jnp.asarray(plane_masks(op, jnp.float32))
    u = pad_plane(op, prob.b)
    y = spmv_padded(op, u, masks)
    # all lanes/planes beyond the real domain must be exactly zero
    flat_valid = op.ny * op.nx
    assert float(jnp.abs(y[:, flat_valid:]).max()) == 0.0
    assert float(jnp.abs(y[op.nz :]).max()) == 0.0
    np.testing.assert_allclose(
        np.asarray(unpad_plane(op, y)), np.asarray(op.matvec(prob.b)), rtol=2e-6
    )


@pytest.mark.slow
@pytest.mark.parametrize("backend", ["pallas", "pallas_v1"])
def test_pallas_cg_backend_matches_stencil(backend):
    cfg = ProblemConfig(12, 10, 9, dtype=jnp.float64)
    prob = generate_problem(cfg)
    rp = make_cg(prob.A, max_iter=30, backend=backend)(prob.b, prob.x0)
    rs = make_cg(prob.A, max_iter=30, backend="stencil")(prob.b, prob.x0)
    assert float(compute_residual(rp.x, prob.xexact)) < 1e-10
    tp, ts = np.asarray(rp.trace), np.asarray(rs.trace)
    good = ts > 1e-11 * ts[0]
    np.testing.assert_allclose(tp[good], ts[good], rtol=1e-7)


@pytest.mark.parametrize("dims,stencil", CASES)
@pytest.mark.parametrize("tz", [None, 2])
def test_pallas_v2_spmv_matches_xla(dims, stencil, tz):
    from hpccg_tpu.ops.pallas.stencil_v2 import spmv_stencil_pallas_v2

    nx, ny, nz = dims
    cfg = ProblemConfig(nx, ny, nz, stencil=stencil, dtype=jnp.float32)
    prob = generate_problem(cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(cfg.local_nrow), jnp.float32)
    got = np.asarray(spmv_stencil_pallas_v2(prob.A, x, tz=tz))
    want = np.asarray(prob.A.matvec(x))
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-5)


def test_pallas_v2_padding_stays_zero():
    from hpccg_tpu.ops.pallas.stencil_v2 import pad_plane3, spmv_padded_v2, unpad_plane3

    cfg = ProblemConfig(5, 3, 9, dtype=jnp.float32)
    prob = generate_problem(cfg)
    op = prob.A
    u = pad_plane3(op, prob.b, 2)
    y = spmv_padded_v2(op, u, None, False, 2)
    assert float(jnp.abs(y[:, :, op.nx :]).max()) == 0.0
    assert float(jnp.abs(y[:, op.ny :, :]).max()) == 0.0
    assert float(jnp.abs(y[op.nz :]).max()) == 0.0
    np.testing.assert_allclose(
        np.asarray(unpad_plane3(op, y)), np.asarray(op.matvec(prob.b)), rtol=2e-6
    )


@pytest.mark.slow
def test_pallas_v2_external_halo():
    """v2 halo input reproduces an interior shard of a larger domain."""
    from hpccg_tpu.ops.pallas.stencil_v2 import (
        pad_plane3,
        padded_dims,
        spmv_padded_v2,
        unpad_plane3,
    )

    cfg = ProblemConfig(6, 5, 4, dtype=jnp.float32)
    gprob = generate_problem(ProblemConfig(6, 5, 12, dtype=jnp.float32))
    rng = np.random.default_rng(1)
    xg = jnp.asarray(rng.standard_normal(6 * 5 * 12), jnp.float32)
    want = np.asarray(gprob.A.matvec(xg)).reshape(12, -1)[4:8]

    op = generate_problem(cfg).A
    xs = xg.reshape(12, -1)[4:8].reshape(-1)
    u = pad_plane3(op, xs, 2)
    _, nyp, nxp = padded_dims(op, jnp.float32, 2)
    halo = jnp.zeros((2, nyp, nxp), jnp.float32)
    halo = halo.at[0, :5, :6].set(xg.reshape(12, 5, 6)[3])
    halo = halo.at[1, :5, :6].set(xg.reshape(12, 5, 6)[8])
    y = unpad_plane3(op, spmv_padded_v2(op, u, halo, False, 2)).reshape(4, -1)
    np.testing.assert_allclose(np.asarray(y), want, rtol=2e-6, atol=2e-5)


def test_pallas_external_halo():
    """Kernel halo input reproduces an interior shard of a larger domain."""
    cfg = ProblemConfig(6, 5, 4, dtype=jnp.float32)
    gprob = generate_problem(ProblemConfig(6, 5, 12, dtype=jnp.float32))
    rng = np.random.default_rng(1)
    xg = jnp.asarray(rng.standard_normal(6 * 5 * 12), jnp.float32)
    want = np.asarray(gprob.A.matvec(xg)).reshape(12, -1)[4:8]

    op = generate_problem(cfg).A
    masks = jnp.asarray(plane_masks(op, jnp.float32))
    xs = xg.reshape(12, -1)[4:8].reshape(-1)
    u = pad_plane(op, xs)
    m = u.shape[1]
    halo = jnp.zeros((2, m), jnp.float32)
    halo = halo.at[0, : 30].set(xg.reshape(12, -1)[3])
    halo = halo.at[1, : 30].set(xg.reshape(12, -1)[8])
    y = unpad_plane(op, spmv_padded(op, u, masks, halo)).reshape(4, -1)
    np.testing.assert_allclose(np.asarray(y), want, rtol=2e-6, atol=2e-5)


@pytest.mark.slow
@pytest.mark.parametrize("ndev", [2, 8])
@pytest.mark.parametrize("backend", ["pallas", "pallas_v1"])
def test_distributed_pallas_cg(ndev, backend):
    cfg = ProblemConfig(6, 5, 4, dtype=jnp.float64)
    mesh = make_mesh(ndev)
    prob = generate_problem_sharded(cfg, mesh)
    rp = make_distributed_cg(cfg, mesh, max_iter=30, backend=backend)(prob.b, prob.x0)
    rs = make_distributed_cg(cfg, mesh, max_iter=30)(prob.b, prob.x0)
    assert float(compute_residual(rp.x, prob.xexact)) < 1e-10
    tp, ts = np.asarray(rp.trace), np.asarray(rs.trace)
    good = ts > 1e-11 * ts[0]
    np.testing.assert_allclose(tp[good], ts[good], rtol=1e-7)


@pytest.mark.slow
def test_fused_cg_matches_reference_path():
    cfg = ProblemConfig(12, 10, 9, dtype=jnp.float64)
    prob = generate_problem(cfg)
    rf = make_cg(prob.A, max_iter=30, backend="pallas_fused")(prob.b, prob.x0)
    rs = make_cg(prob.A, max_iter=30, backend="stencil")(prob.b, prob.x0)
    assert float(compute_residual(rf.x, prob.xexact)) < 1e-10
    assert int(rf.niters) == int(rs.niters)
    tf, ts = np.asarray(rf.trace), np.asarray(rs.trace)
    good = ts > 1e-11 * ts[0]
    np.testing.assert_allclose(tf[good], ts[good], rtol=1e-7)


@pytest.mark.slow
@pytest.mark.parametrize("ndev", [2, 8])
def test_distributed_fused_cg(ndev):
    cfg = ProblemConfig(6, 5, 4, dtype=jnp.float64)
    mesh = make_mesh(ndev)
    prob = generate_problem_sharded(cfg, mesh)
    rf = make_distributed_cg(cfg, mesh, max_iter=30, backend="pallas_fused")(
        prob.b, prob.x0
    )
    rs = make_distributed_cg(cfg, mesh, max_iter=30)(prob.b, prob.x0)
    assert float(compute_residual(rf.x, prob.xexact)) < 1e-10
    tf, ts = np.asarray(rf.trace), np.asarray(rs.trace)
    good = ts > 1e-11 * ts[0]
    np.testing.assert_allclose(tf[good], ts[good], rtol=1e-7)


@pytest.mark.slow
def test_megakernel_matches_stencil():
    cfg = ProblemConfig(12, 10, 9, dtype=jnp.float64)
    prob = generate_problem(cfg)
    rm = make_cg(prob.A, max_iter=30, backend="megakernel")(prob.b, prob.x0)
    rs = make_cg(prob.A, max_iter=30, backend="stencil")(prob.b, prob.x0)
    assert int(rm.niters) == int(rs.niters)
    assert float(compute_residual(rm.x, prob.xexact)) < 1e-10
    tm, ts = np.asarray(rm.trace), np.asarray(rs.trace)
    good = ts > 1e-11 * ts[0]
    np.testing.assert_allclose(tm[good], ts[good], rtol=1e-7)


@pytest.mark.slow
@pytest.mark.parametrize("stencil", [Stencil.S27, Stencil.S7])
def test_megakernel_golden_run(stencil):
    """10^3 fixed-work run: trajectory must match the flat-path solver and,
    for the 27-pt case, the reference golden run out.txt:1-21."""
    cfg = ProblemConfig(10, 10, 10, stencil=stencil, dtype=jnp.float64)
    prob = generate_problem(cfg)
    rm = make_cg(prob.A, max_iter=150, backend="megakernel")(prob.b, prob.x0)
    tm = np.asarray(rm.trace)
    if stencil == Stencil.S27:
        assert abs(tm[0] - 258.24) < 5e-3
        np.testing.assert_allclose(tm[15], 2.15402e-06, rtol=1e-5)


@pytest.mark.slow
def test_megakernel_early_exit_tolerance():
    cfg = ProblemConfig(8, 8, 8, dtype=jnp.float64)
    prob = generate_problem(cfg)
    res = make_cg(prob.A, max_iter=500, tolerance=1e-10, backend="megakernel")(
        prob.b, prob.x0
    )
    rs = make_cg(prob.A, max_iter=500, tolerance=1e-10, backend="stencil")(
        prob.b, prob.x0
    )
    # exit semantics must match the reference loop exactly (same niters,
    # same one-update-stale normr at exit)
    assert int(res.niters) == int(rs.niters)
    np.testing.assert_allclose(float(res.normr), float(rs.normr), rtol=1e-6)
    assert int(res.niters) < 499


def test_fused_cg_early_exit_tolerance():
    cfg = ProblemConfig(8, 8, 8, dtype=jnp.float64)
    prob = generate_problem(cfg)
    res = make_cg(prob.A, max_iter=500, tolerance=1e-10, backend="pallas_fused")(
        prob.b, prob.x0
    )
    assert int(res.niters) < 499


@pytest.mark.slow
@pytest.mark.parametrize("dims,stencil", CASES)
def test_streamkernel_matches_stencil(dims, stencil):
    """Streaming whole-loop kernel (r/p pinned, x DMA-streamed): trajectory
    parity with the flat-path solver on CPU interpret mode."""
    from hpccg_tpu.ops.pallas.streamkernel import cg_solve_stream

    cfg = ProblemConfig(*dims, stencil=stencil, dtype=jnp.float64)
    prob = generate_problem(cfg)
    rm = cg_solve_stream(prob.A, prob.b, prob.x0, max_iter=25, tolerance=0.0)
    rs = make_cg(prob.A, max_iter=25, backend="stencil")(prob.b, prob.x0)
    assert int(rm.niters) == int(rs.niters)
    tm, ts = np.asarray(rm.trace), np.asarray(rs.trace)
    good = ts > 1e-11 * ts[0]
    np.testing.assert_allclose(tm[good], ts[good], rtol=1e-7)
    np.testing.assert_allclose(np.asarray(rm.x), np.asarray(rs.x), atol=1e-9)


@pytest.mark.slow
def test_streamkernel_tolerance_exit_matches():
    from hpccg_tpu.ops.pallas.streamkernel import cg_solve_stream

    cfg = ProblemConfig(8, 8, 8, dtype=jnp.float64)
    prob = generate_problem(cfg)
    rm = cg_solve_stream(prob.A, prob.b, prob.x0, max_iter=500, tolerance=1e-10)
    rs = make_cg(prob.A, max_iter=500, tolerance=1e-10, backend="stencil")(
        prob.b, prob.x0
    )
    assert int(rm.niters) == int(rs.niters)
    # different reduction tree -> few-ulp-scale drift on the tiny residual
    np.testing.assert_allclose(float(rm.normr), float(rs.normr), rtol=1e-6)


class TestBf16Streamkernel:
    """bf16 pinned r/p + bf16 streamed x, f32 reductions/recurrence (round 5
    — extends the streaming whole-solve reach to 256^3 and halves its HBM
    traffic; the megakernel slab recipe applied to the r/p-pinned kernel)."""

    @pytest.mark.slow
    def test_converges_and_dtypes(self):
        from hpccg_tpu.ops.pallas.streamkernel import cg_solve_stream

        cfg = ProblemConfig(12, 11, 10, dtype=jnp.bfloat16)
        prob = generate_problem(cfg)
        res = cg_solve_stream(prob.A, prob.b, prob.x0, max_iter=60, tolerance=0.0)
        assert res.x.dtype == jnp.bfloat16
        # control scalars/trace in f32: niters exact past bf16's 256 range
        assert res.trace.dtype == jnp.float32
        assert res.normr.dtype == jnp.float32
        x = np.asarray(res.x, np.float64)
        assert np.max(np.abs(x - 1.0)) < 0.1  # the bf16 storage floor

    def test_fit_reach(self):
        """bf16 halves the pinned 2-vector footprint: 256^3 fits (the f32
        boundary was ~200^3), 272^3's lane padding (nx -> 384) does not."""
        from hpccg_tpu.operators import StencilOperator
        from hpccg_tpu.ops.pallas.streamkernel import fits_stream_vmem

        op = lambda n, d: StencilOperator(nx=n, ny=n, nz=n, dtype_name=d)  # noqa: E731
        assert fits_stream_vmem(op(200, "float32"), jnp.float32)
        assert not fits_stream_vmem(op(256, "float32"), jnp.float32)
        assert fits_stream_vmem(op(256, "bfloat16"), jnp.bfloat16)
        assert not fits_stream_vmem(op(272, "bfloat16"), jnp.bfloat16)

    def test_auto_selects_bf16_streamkernel_on_tpu(self, monkeypatch):
        """On TPU, auto routes the (megakernel-reach, stream-reach] bf16
        band to the streaming kernel (208^3: 272 vs 285 us/iter stencil;
        256^3: 366 vs 609 pallas-v2 — exp/bf16_stream_probe.py)."""
        import jax as _jax

        from hpccg_tpu.operators import StencilOperator
        from hpccg_tpu.solver import resolve_backend

        monkeypatch.setattr(_jax, "default_backend", lambda: "tpu")
        op = lambda n, d: StencilOperator(nx=n, ny=n, nz=n, dtype_name=d)  # noqa: E731
        assert resolve_backend(op(256, "bfloat16"), "auto") == "streamkernel"
        assert resolve_backend(op(208, "bfloat16"), "auto") == "streamkernel"
        # past the stream reach: the stencil band, then pallas-v2
        assert resolve_backend(op(272, "bfloat16"), "auto") == "pallas"
        # f32 reach unchanged
        assert resolve_backend(op(200, "float32"), "auto") == "streamkernel"
        assert resolve_backend(op(256, "float32"), "auto") == "pallas"


@pytest.mark.slow
def test_streamkernel_dma_pipeline_race_free(monkeypatch):
    """Run the manual double-buffered DMA slab pipeline (multiple slabs, so
    loads/stores/drains actually interleave) under the full TPU interpreter's
    data-race detector."""
    from jax.experimental.pallas import tpu as pltpu

    from hpccg_tpu.ops.pallas import streamkernel as sk

    monkeypatch.setattr(sk, "_stream_tz", lambda op, dtype: 4)  # nzb = 3
    cfg = ProblemConfig(8, 6, 12, dtype=jnp.float64)
    prob = generate_problem(cfg)
    ip = pltpu.InterpretParams(dma_execution_mode="on_wait", detect_races=True)
    from hpccg_tpu.ops.pallas.stencil_v2 import pad_plane3

    x_pad, trace, stats = sk.cg_stream_padded(
        prob.A, pad_plane3(prob.A, prob.b, 4), pad_plane3(prob.A, prob.x0, 4),
        20, 0.0, ip,
    )
    rs = make_cg(prob.A, max_iter=20, backend="stencil")(prob.b, prob.x0)
    tm = np.asarray(trace[:, 0])
    ts = np.asarray(rs.trace)
    good = ts > 1e-10 * ts[0]
    np.testing.assert_allclose(tm[good], ts[good], rtol=1e-7)

    from jax._src.pallas.mosaic.interpret import interpret_pallas_call as _ipc

    assert getattr(_ipc, "races", None) is not None
    assert not _ipc.races.races_found


@pytest.mark.slow
def test_fused_k1_halo_parity_z_padding_edge():
    """Regression: with nz < nzp and the fused kernel's block depth dividing
    nz, the z == nz plane appears both as one block's hi concat row and the
    next block's mid row — the above-halo must substitute at ALL of them
    (a single (block, row) substitution dropped it at interior shards' top
    boundary planes)."""
    from hpccg_tpu.ops.pallas.fused_cg import fused_update_p_apply

    op = generate_problem(ProblemConfig(256, 256, 32, dtype=jnp.float32)).A
    rng = np.random.default_rng(0)
    r = jnp.asarray(rng.standard_normal(op.local_nrow), jnp.float32)
    p = jnp.asarray(rng.standard_normal(op.local_nrow), jnp.float32)
    masks = jnp.asarray(plane_masks(op, jnp.float32))
    rp, pp = pad_plane(op, r), pad_plane(op, p)
    m = rp.shape[1]
    halo2 = jnp.asarray(rng.standard_normal((2, m)), jnp.float32)
    beta = 0.5
    want = np.asarray(spmv_padded(op, rp + beta * pp, masks, (1 + beta) * halo2))
    _, apout, _ = fused_update_p_apply(
        op, rp, pp, beta, masks, jnp.concatenate([halo2, halo2])
    )
    np.testing.assert_allclose(np.asarray(apout), want, atol=1e-4)


@pytest.mark.parametrize(
    "dims",
    # seeded random shape sweep: odd/aligned/tiny mixes for the whole-solve
    # kernels' padding and slab-boundary logic
    [(7, 11, 3), (13, 8, 21), (3, 17, 5), (24, 6, 10), (9, 9, 16)],
)
@pytest.mark.slow
def test_wholesolve_kernels_random_shapes(dims):
    from hpccg_tpu.ops.pallas.streamkernel import cg_stream_padded, _stream_tz
    from hpccg_tpu.ops.pallas.stencil_v2 import pad_plane3

    cfg = ProblemConfig(*dims, dtype=jnp.float64)
    prob = generate_problem(cfg)
    rs = make_cg(prob.A, max_iter=20, backend="stencil")(prob.b, prob.x0)
    ts = np.asarray(rs.trace)
    good = ts > 1e-10 * ts[0]

    rm = make_cg(prob.A, max_iter=20, backend="megakernel")(prob.b, prob.x0)
    np.testing.assert_allclose(np.asarray(rm.trace)[good], ts[good], rtol=1e-7)

    tz = _stream_tz(prob.A, prob.b.dtype)
    _, trace, stats = cg_stream_padded(
        prob.A, pad_plane3(prob.A, prob.b, tz), pad_plane3(prob.A, prob.x0, tz),
        20, 0.0,
    )
    np.testing.assert_allclose(np.asarray(trace[:, 0])[good], ts[good], rtol=1e-7)


@pytest.mark.slow
def test_pallas_v2_bf16_parity():
    """round-3: 16-bit storage computes f32 in-kernel (the Mosaic bf16
    legalization workaround) — matvec and fused pAp match the XLA stencil
    at the bf16 storage floor."""
    from hpccg_tpu.ops.pallas.stencil_v2 import (
        pad_plane3,
        spmv_padded_v2_pap,
        spmv_stencil_pallas_v2,
    )
    from hpccg_tpu.ops.spmv import spmv

    for st in (27, 7):
        cfg = ProblemConfig(20, 12, 9, stencil=st, dtype=jnp.bfloat16)
        prob = generate_problem(cfg)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal(prob.total_nrow), jnp.bfloat16)
        y_ref = spmv(prob.A, x, backend="stencil").astype(jnp.float32)
        y_k = spmv_stencil_pallas_v2(prob.A, x).astype(jnp.float32)
        assert float(jnp.max(jnp.abs(y_ref - y_k))) < 0.6  # bf16 ulp at ~50
        u = pad_plane3(prob.A, x)
        y2, pap = spmv_padded_v2_pap(prob.A, u, None, True)
        assert pap.dtype == jnp.bfloat16  # scalar recurrence stays bf16
        pap_ref = float(jnp.vdot(x.astype(jnp.float32), y_ref))
        assert abs(float(pap) - pap_ref) < 0.05 * abs(pap_ref) + 1.0


@pytest.mark.slow
def test_cg_pallas_bf16_matches_stencil():
    cfg = ProblemConfig(12, 10, 9, dtype=jnp.bfloat16)
    prob = generate_problem(cfg)
    rp = make_cg(prob.A, max_iter=25, backend="pallas")(prob.b, prob.x0)
    rs = make_cg(prob.A, max_iter=25, backend="stencil")(prob.b, prob.x0)
    # both converge to the bf16 storage floor (max|x-1| ~ 0.04-0.05)
    assert float(compute_residual(rp.x, prob.xexact)) < 0.08
    assert float(compute_residual(rs.x, prob.xexact)) < 0.08
    tp, ts = np.asarray(rp.trace, np.float32), np.asarray(rs.trace, np.float32)
    good = np.isfinite(ts) & (ts > 0.05 * ts[0])
    np.testing.assert_allclose(tp[good], ts[good], rtol=0.15)


@pytest.mark.slow
def test_distributed_pallas_bf16(ndev=4):
    """bf16 shards ride the same v2 kernel + ppermute halo (round-2
    missing #2: make_distributed_cg now picks pallas for itemsize 2)."""
    cfg = ProblemConfig(6, 5, 4, dtype=jnp.bfloat16)
    mesh = make_mesh(ndev)
    prob = generate_problem_sharded(cfg, mesh)
    rp = make_distributed_cg(cfg, mesh, max_iter=20, backend="pallas")(
        prob.b, prob.x0
    )
    rs = make_distributed_cg(cfg, mesh, max_iter=20, backend="stencil")(
        prob.b, prob.x0
    )
    assert float(compute_residual(rp.x, prob.xexact)) < 0.1
    tp, ts = np.asarray(rp.trace, np.float32), np.asarray(rs.trace, np.float32)
    good = np.isfinite(ts) & (ts > 0.05 * ts[0])
    np.testing.assert_allclose(tp[good], ts[good], rtol=0.15)


@pytest.mark.slow
def test_pallas_v2_dd_matvec_f64_class():
    """round-3: the double-float (two-f32) stencil kernel reaches f64-class
    accuracy (~1e-14 rel) — TwoSum-chained hi channel, plain lo/error
    channels, exact 28*hi split products."""
    from hpccg_tpu.ops.pallas.stencil_v2 import (
        pad_plane3,
        spmv_padded_v2_dd,
        unpad_plane3,
    )
    from hpccg_tpu.ops.spmv import spmv

    for st, dims in ((27, (13, 10, 7)), (7, (13, 10, 7)),
                     (27, (128, 3, 2)), (7, (128, 2, 3))):
        # nx == 128 exercises the masked-roll boundary (wraparound is real
        # data there, unlike the zero-pad-lane fast path)
        cfg = ProblemConfig(*dims, stencil=st, dtype=jnp.float64)
        prob = generate_problem(cfg)
        rng = np.random.default_rng(0)
        # full f64-significand values (an f32-representable x would hide
        # every lo-channel term)
        x = jnp.asarray(
            rng.standard_normal(cfg.local_nrow)
            * (1 + 1e-9 * rng.standard_normal(cfg.local_nrow))
        )
        assert x.dtype == jnp.float64
        y_ref = spmv(prob.A, x)
        y_dd = unpad_plane3(prob.A, spmv_padded_v2_dd(prob.A, pad_plane3(prob.A, x)))
        rel = float(jnp.max(jnp.abs(y_dd - y_ref)) / jnp.max(jnp.abs(y_ref)))
        assert rel < 1e-13, (st, rel)


@pytest.mark.slow
def test_cg_pallas_dd_matches_stencil_f64():
    """backend='pallas_dd' CG trajectory tracks the XLA f64 path to ~1e-13
    above the convergence floor, and converges to the f64 solution."""
    cfg = ProblemConfig(16, 14, 10, dtype=jnp.float64)
    prob = generate_problem(cfg)
    r_ref = make_cg(prob.A, max_iter=60, tolerance=0.0, backend="stencil")(
        prob.b, prob.x0
    )
    r_dd = make_cg(prob.A, max_iter=60, tolerance=0.0, backend="pallas_dd")(
        prob.b, prob.x0
    )
    tr_ref = np.asarray(r_ref.trace)
    tr_dd = np.asarray(r_dd.trace)
    m = ~np.isnan(tr_ref) & (tr_ref > 1e-10 * tr_ref[0])
    assert m.sum() >= 20
    np.testing.assert_allclose(tr_dd[m], tr_ref[m], rtol=1e-9)
    assert float(jnp.max(jnp.abs(r_dd.x - 1.0))) < 1e-12


@pytest.mark.slow
def test_pallas_v2_dd_pap_f64_class():
    """The fused dd p.Ap (TwoProd main products + per-lane-position TwoSum
    accumulator planes) matches the f64 dot to ~1e-12."""
    from hpccg_tpu.ops.pallas.stencil_v2 import (
        pad_plane3,
        spmv_padded_v2_dd_pap,
        unpad_plane3,
    )
    from hpccg_tpu.ops.spmv import spmv

    for st, dims in ((27, (13, 10, 7)), (7, (13, 10, 7)), (27, (128, 3, 2))):
        cfg = ProblemConfig(*dims, stencil=st, dtype=jnp.float64)
        prob = generate_problem(cfg)
        rng = np.random.default_rng(1)
        x = jnp.asarray(
            rng.standard_normal(cfg.local_nrow)
            * (1 + 1e-9 * rng.standard_normal(cfg.local_nrow))
        )
        y_ref = spmv(prob.A, x)
        pap_ref = float(jnp.vdot(x, y_ref))
        y, pap = spmv_padded_v2_dd_pap(prob.A, pad_plane3(prob.A, x))
        rel_y = float(
            jnp.max(jnp.abs(unpad_plane3(prob.A, y) - y_ref))
            / jnp.max(jnp.abs(y_ref))
        )
        rel_p = abs(float(pap) / pap_ref - 1)
        assert rel_y < 1e-13 and rel_p < 1e-12, (st, rel_y, rel_p)


@pytest.mark.slow
def test_distributed_pallas_dd_f64(ndev=4):
    """f64 shards ride the dd kernel + halo overlap + fused pAp: trajectory
    tracks the distributed XLA f64 stencil to f64-class tolerance."""
    cfg = ProblemConfig(6, 5, 4, dtype=jnp.float64)
    mesh = make_mesh(ndev)
    prob = generate_problem_sharded(cfg, mesh)
    rp = make_distributed_cg(cfg, mesh, max_iter=25, backend="pallas_dd")(
        prob.b, prob.x0
    )
    rs = make_distributed_cg(cfg, mesh, max_iter=25, backend="stencil")(
        prob.b, prob.x0
    )
    assert float(compute_residual(rp.x, prob.xexact)) < 1e-10
    tp, ts = np.asarray(rp.trace), np.asarray(rs.trace)
    good = np.isfinite(ts) & (ts > 1e-10 * ts[0])
    assert good.sum() >= 10
    np.testing.assert_allclose(tp[good], ts[good], rtol=1e-9)


@pytest.mark.slow
def test_cg1_pallas_dd_runs_dd_kernel():
    """method='cg1'/'pipecg' with backend='pallas_dd' rides the dd kernel
    (it used to fall through to the XLA spmv dispatch silently)."""
    from hpccg_tpu.solver import make_cg

    cfg = ProblemConfig(12, 10, 8, dtype=jnp.float64)
    prob = generate_problem(cfg)
    # pipecg's pipelined recurrence amplifies ulp-level matvec differences
    # exponentially down the trajectory (two exact-f64 matvecs differing by
    # 1 ulp diverge the same way), so compare it only above 1e-6 rel
    for method, cut, rtol in (("cg1", 1e-10, 1e-9), ("pipecg", 1e-6, 1e-7)):
        r_dd = make_cg(
            prob.A, max_iter=30, tolerance=0.0, backend="pallas_dd", method=method
        )(prob.b, prob.x0)
        r_ref = make_cg(
            prob.A, max_iter=30, tolerance=0.0, backend="stencil", method=method
        )(prob.b, prob.x0)
        tr, td = np.asarray(r_ref.trace), np.asarray(r_dd.trace)
        m = ~np.isnan(tr) & (tr > cut * tr[0])
        assert m.sum() >= 15
        np.testing.assert_allclose(td[m], tr[m], rtol=rtol)


def test_pallas_dd_rejects_f32_with_guidance():
    """The dd tier names its dtype contract instead of a bare assert."""
    from hpccg_tpu.ops.pallas.stencil_v2 import pad_plane3, spmv_padded_v2_dd

    cfg = ProblemConfig(6, 5, 4, dtype=jnp.float32)
    prob = generate_problem(cfg)
    with pytest.raises(ValueError, match="pallas_dd"):
        spmv_padded_v2_dd(prob.A, pad_plane3(prob.A, prob.x0))
