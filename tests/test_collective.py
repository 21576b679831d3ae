"""Collective whole-solve kernel tests: in-kernel RDMA halo + allreduce,
run on the virtual CPU mesh through the full TPU interpreter (cross-device
shared memory), including its data-race detector."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-TPU-interpreter collective kernels

from hpccg_tpu import ProblemConfig
from hpccg_tpu.ops.vector import compute_residual
from hpccg_tpu.parallel import make_mesh
from hpccg_tpu.parallel.cg import generate_problem_sharded, make_distributed_cg


@pytest.mark.parametrize("ndev", [2, 4, 6, 8])  # 4/8: recursive doubling; 6: broadcast
def test_collective_matches_cg1(ndev):
    cfg = ProblemConfig(6, 5, 4)
    mesh = make_mesh(ndev)
    prob = generate_problem_sharded(cfg, mesh)
    rc = make_distributed_cg(cfg, mesh, max_iter=25, backend="collective", method="cg1")(
        prob.b, prob.x0
    )
    r1 = make_distributed_cg(cfg, mesh, max_iter=25, method="cg1")(prob.b, prob.x0)
    assert int(rc.niters) == int(r1.niters)
    tc, t1 = np.asarray(rc.trace), np.asarray(r1.trace)
    good = t1 > 1e-10 * t1[0]
    np.testing.assert_allclose(tc[good], t1[good], rtol=1e-9)
    assert float(compute_residual(rc.x, prob.xexact)) < 1e-10


def test_collective_tolerance_exit():
    cfg = ProblemConfig(5, 4, 3)
    mesh = make_mesh(4)
    prob = generate_problem_sharded(cfg, mesh)
    rc = make_distributed_cg(
        cfg, mesh, max_iter=200, tolerance=1e-10, backend="collective", method="cg1"
    )(prob.b, prob.x0)
    r1 = make_distributed_cg(cfg, mesh, max_iter=200, tolerance=1e-10, method="cg1")(
        prob.b, prob.x0
    )
    assert int(rc.niters) == int(r1.niters)
    np.testing.assert_allclose(float(rc.normr), float(r1.normr), rtol=1e-6)


def test_collective_race_free(monkeypatch):
    """Run the multi-device solve under the interpreter's data-race detector
    (the race-detection tier the reference lacks, SURVEY.md §5)."""
    from hpccg_tpu.ops.pallas import collective_kernel

    monkeypatch.setattr(collective_kernel, "DETECT_RACES", True)
    cfg = ProblemConfig(4, 3, 2)
    mesh = make_mesh(4)
    prob = generate_problem_sharded(cfg, mesh)
    res = make_distributed_cg(cfg, mesh, max_iter=10, backend="collective", method="cg1")(
        prob.b, prob.x0
    )
    assert float(res.normr) < float(res.trace[0])

    from jax._src.pallas.mosaic.interpret import interpret_pallas_call as _ipc

    # fail loudly if the (private) detector hook moved — a silent skip would
    # green-light the kernel's central race-freedom claim unchecked
    assert getattr(_ipc, "races", None) is not None, (
        "jax race-detector internals moved; update this test"
    )
    assert not _ipc.races.races_found


@pytest.mark.parametrize("ndev", [2, 4, 8])  # 4/8: recursive doubling
def test_collective_cg_matches_reference_recurrence(ndev):
    """method='cg' in the collective kernel runs the REFERENCE recurrence
    with TWO in-kernel allreduces per iteration (round-3 VERDICT #3: the
    warn-and-substitute is gone — --backend collective --method cg means
    what it says). Trace parity vs the shard_map cg solve."""
    cfg = ProblemConfig(6, 5, 4)
    mesh = make_mesh(ndev)
    prob = generate_problem_sharded(cfg, mesh)
    rc = make_distributed_cg(
        cfg, mesh, max_iter=25, backend="collective", method="cg"
    )(prob.b, prob.x0)
    r1 = make_distributed_cg(cfg, mesh, max_iter=25, method="cg")(
        prob.b, prob.x0
    )
    assert int(rc.niters) == int(r1.niters)
    tc, t1 = np.asarray(rc.trace), np.asarray(r1.trace)
    good = t1 > 1e-10 * t1[0]
    np.testing.assert_allclose(tc[good], t1[good], rtol=1e-9)
    assert float(compute_residual(rc.x, prob.xexact)) < 1e-10


def test_collective_cg_no_substitution_warning(recwarn):
    """Requesting the reference recurrence through the collective backend
    no longer emits the round-3 warn-and-substitute."""
    cfg = ProblemConfig(4, 3, 2)
    mesh = make_mesh(2)
    prob = generate_problem_sharded(cfg, mesh)
    make_distributed_cg(cfg, mesh, max_iter=5, backend="collective", method="cg")(
        prob.b, prob.x0
    )
    assert not [w for w in recwarn if "cg1" in str(w.message)]


def test_collective_cg_race_free(monkeypatch):
    """The two-allreduce recurrence under the interpreter's race detector:
    the slot-alternation proof (r.r at slot 1, p.Ap at slot 0) holds."""
    from hpccg_tpu.ops.pallas import collective_kernel

    monkeypatch.setattr(collective_kernel, "DETECT_RACES", True)
    cfg = ProblemConfig(4, 3, 2)
    mesh = make_mesh(4)
    prob = generate_problem_sharded(cfg, mesh)
    res = make_distributed_cg(
        cfg, mesh, max_iter=10, backend="collective", method="cg"
    )(prob.b, prob.x0)
    assert float(res.normr) < float(res.trace[0])

    from jax._src.pallas.mosaic.interpret import interpret_pallas_call as _ipc

    assert getattr(_ipc, "races", None) is not None, (
        "jax race-detector internals moved; update this test"
    )
    assert not _ipc.races.races_found


@pytest.mark.parametrize("ndev", [2, 4, 8])
def test_pipelined_collective_matches_pipecg(ndev):
    """Communication-hiding variant: in-kernel allreduce overlapped by the
    stencil apply; parity vs the shard_map pipecg path."""
    cfg = ProblemConfig(6, 5, 4)
    mesh = make_mesh(ndev)
    prob = generate_problem_sharded(cfg, mesh)
    rc = make_distributed_cg(
        cfg, mesh, max_iter=25, backend="collective", method="pipecg"
    )(prob.b, prob.x0)
    r1 = make_distributed_cg(cfg, mesh, max_iter=25, method="pipecg")(
        prob.b, prob.x0
    )
    assert int(rc.niters) == int(r1.niters)
    tc, t1 = np.asarray(rc.trace), np.asarray(r1.trace)
    good = t1 > 1e-8 * t1[0]
    np.testing.assert_allclose(tc[good], t1[good], rtol=1e-8)
    assert float(compute_residual(rc.x, prob.xexact)) < 1e-9


def test_pipelined_collective_race_free(monkeypatch):
    from hpccg_tpu.ops.pallas import collective_kernel

    monkeypatch.setattr(collective_kernel, "DETECT_RACES", True)
    cfg = ProblemConfig(4, 3, 2)
    mesh = make_mesh(4)
    prob = generate_problem_sharded(cfg, mesh)
    res = make_distributed_cg(
        cfg, mesh, max_iter=10, backend="collective", method="pipecg"
    )(prob.b, prob.x0)
    assert float(res.normr) < float(res.trace[0])

    from jax._src.pallas.mosaic.interpret import interpret_pallas_call as _ipc

    assert getattr(_ipc, "races", None) is not None, (
        "jax race-detector internals moved; update this test"
    )
    assert not _ipc.races.races_found
