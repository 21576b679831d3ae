"""Round-2 polish: warning contracts and bf16 whole-solve state.

Covers the behaviors adjudicated after round 1 (VERDICT.md weak items 1-3,
ADVICE.md findings): no solver path silently substitutes a different
recurrence or kernel, and 16-bit vector state keeps its control scalars
(niters, normr) exact in >= f32 slots.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hpccg_tpu import ProblemConfig, generate_problem
from hpccg_tpu.parallel import make_mesh
from hpccg_tpu.parallel.cg import generate_problem_sharded, make_distributed_cg
from hpccg_tpu.solver import make_cg, resolve_backend


@pytest.mark.slow
def test_collective_with_method_cg_honored():
    """backend='collective' + method='cg' runs the REFERENCE recurrence
    in-kernel (round-4: the round-3 warn-and-substitute is gone) — no
    warning, and the trace matches the shard_map cg solve."""
    import numpy as np
    import warnings

    cfg = ProblemConfig(4, 3, 2)
    mesh = make_mesh(2)
    prob = generate_problem_sharded(cfg, mesh)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        solve = make_distributed_cg(cfg, mesh, max_iter=10, backend="collective")
    res = solve(prob.b, prob.x0)
    r1 = make_distributed_cg(cfg, mesh, max_iter=10, method="cg")(
        prob.b, prob.x0
    )
    tc, t1 = np.asarray(res.trace), np.asarray(r1.trace)
    good = np.isfinite(t1) & (t1 > 1e-10 * t1[0])
    np.testing.assert_allclose(tc[good], t1[good], rtol=1e-9)


def test_whole_solve_backend_downgrade_warns():
    """make_cg(method='cg1', backend='megakernel') runs the per-iteration
    pallas path — it must say so (ADVICE.md finding 2)."""
    prob = generate_problem(ProblemConfig(6, 5, 4, dtype=jnp.float32))
    with pytest.warns(UserWarning, match="pallas-v2"):
        solve = make_cg(prob.A, max_iter=10, backend="megakernel", method="cg1")
    res = solve(prob.b, prob.x0)
    assert float(res.normr) < float(res.trace[0])


def test_ell_gather_scale_warning(monkeypatch):
    """Selecting the ELL gather path at TPU-realistic sizes warns loudly
    (VERDICT weak #2). default_backend is monkeypatched — no TPU in CI."""
    from hpccg_tpu.models.stencil import generate_ell
    import hpccg_tpu.solver as solver_mod

    prob = generate_ell(ProblemConfig(64, 64, 32, dtype=jnp.float32))
    assert prob.A.local_nrow >= 100_000
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    with pytest.warns(UserWarning, match="roofline"):
        assert resolve_backend(prob.A, "auto") == "auto"


def test_small_ell_does_not_warn(recwarn):
    from hpccg_tpu.models.stencil import generate_ell

    prob = generate_ell(ProblemConfig(4, 4, 4, dtype=jnp.float32))
    assert resolve_backend(prob.A, "auto") == "auto"
    assert not [w for w in recwarn if "roofline" in str(w.message)]


class TestBf16Megakernel:
    """bf16 vector state, f32 reductions/recurrence, exact control scalars."""

    def _solve(self, max_iter=40):
        cfg = ProblemConfig(8, 7, 6, dtype=jnp.bfloat16)
        prob = generate_problem(cfg)
        solve = make_cg(prob.A, max_iter=max_iter, backend="megakernel")
        return prob, solve(prob.b, prob.x0)

    def test_converges_and_dtypes(self):
        prob, res = self._solve()
        assert res.x.dtype == jnp.bfloat16
        # control scalars/trace promoted to f32 (ADVICE.md finding 3)
        assert res.trace.dtype == jnp.float32
        assert res.normr.dtype == jnp.float32
        trace = np.asarray(res.trace, np.float64)
        # bf16 storage floors around ~1e-2 relative; require two decades
        assert float(res.normr) < 1e-2 * trace[0] or float(res.normr) == 0.0
        x = np.asarray(res.x, np.float64)
        assert np.max(np.abs(x - 1.0)) < 0.1

    @pytest.mark.slow
    def test_niters_exact_past_bf16_integer_range(self):
        """bf16 represents integers exactly only to 256; the f32 stats slot
        must count past that (ADVICE.md finding 3). A 2-D-ish slab converges
        slowly enough in bf16 (residual floor, never exactly zero over this
        horizon) to keep the tolerance-0 loop running."""
        cfg = ProblemConfig(12, 11, 10, dtype=jnp.bfloat16)
        prob = generate_problem(cfg)
        solve = make_cg(prob.A, max_iter=300, backend="megakernel")
        res = solve(prob.b, prob.x0)
        n = int(res.niters)
        assert n == 299 or float(res.normr) == 0.0, (n, float(res.normr))
        if n > 256:
            # the regression this guards: bf16 slot would round 257 -> 256
            assert n != 256


def test_fits_vmem_bf16_reach():
    from hpccg_tpu.operators import StencilOperator
    from hpccg_tpu.ops.pallas.megakernel import _mega_mode, fits_vmem

    op = lambda n, d: StencilOperator(nx=n, ny=n, nz=n, dtype_name=d)
    assert _mega_mode(op(128, "float32"), jnp.float32) == "whole"
    assert _mega_mode(op(136, "float32"), jnp.float32) == "slab"
    assert not fits_vmem(op(160, "float32"), jnp.float32)
    # bf16 extends the whole-solve reach past 128^3 (VERDICT next-item 4)
    assert _mega_mode(op(160, "bfloat16"), jnp.bfloat16) == "slab"
    assert _mega_mode(op(200, "bfloat16"), jnp.bfloat16) == "slab"
    # 208^3 bf16 OOMs on hardware (exp/vmem_boundary_check.py) — the fit
    # model must exclude it
    assert not fits_vmem(op(208, "bfloat16"), jnp.bfloat16)


@pytest.mark.slow
def test_mega_slab_matches_whole_f32():
    """Forced slab mode reproduces the whole-grid trajectory (per-element
    stencil order is identical; only the p.Ap / r.r accumulation order
    differs, so scalars agree to rounding)."""
    from hpccg_tpu.ops.pallas.megakernel import MEGA_TZ, cg_mega_padded
    from hpccg_tpu.ops.pallas.stencil_v2 import pad_plane3, unpad_plane3

    cfg = ProblemConfig(9, 7, 11, dtype=jnp.float32)
    prob = generate_problem(cfg)
    op = prob.A
    xw, tw, sw = cg_mega_padded(
        op, pad_plane3(op, prob.b, 1), pad_plane3(op, prob.x0, 1),
        30, 0.0, slab=False,
    )
    xs, ts, ss = cg_mega_padded(
        op, pad_plane3(op, prob.b, MEGA_TZ), pad_plane3(op, prob.x0, MEGA_TZ),
        30, 0.0, slab=True,
    )
    assert int(sw[0, 2]) == int(ss[0, 2])
    w, s = np.asarray(tw[:, 0], np.float64), np.asarray(ts[:, 0], np.float64)
    good = np.isfinite(w) & (w > 1e-6 * w[0])
    np.testing.assert_allclose(s[good], w[good], rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(unpad_plane3(op, xs)), np.asarray(unpad_plane3(op, xw)),
        rtol=1e-4, atol=1e-6,
    )


def test_bf16_padded_dims_sublane():
    """bf16 min tile is (16, 128): the v2 layout must pad y to 16."""
    from hpccg_tpu.operators import StencilOperator
    from hpccg_tpu.ops.pallas.stencil_v2 import padded_dims

    op = StencilOperator(nx=5, ny=9, nz=4, dtype_name="bfloat16")
    _, ny_pad, nx_pad = padded_dims(op, jnp.bfloat16)
    assert ny_pad == 16 and nx_pad == 128
    _, ny_pad32, _ = padded_dims(op, jnp.float32)
    assert ny_pad32 == 16  # 9 -> 16 at sublane 8 too


def test_refine_plus_mesh_cli_warns(capsys):
    """--refine with --mesh > 1 is ignored with a note, and the output does
    not mislabel CG iterations as refinement rounds (ADVICE.md finding 1)."""
    from hpccg_tpu.cli import main

    rc = main(
        ["4", "4", "2", "--mesh", "2", "--refine", "2", "--dtype", "float64",
         "--max-iter", "8", "--skip-kernel-bench", "--json"]
    )
    assert rc == 0
    out, err = capsys.readouterr()
    assert "--refine is a single-device path" in err
    assert "Refinement round" not in out
    assert "Iteration" in out
