"""Problem / solve validation (the aux-subsystem tier of SURVEY.md §5).

The reference verifies by construction: the generator builds b = A·1 exactly
(generate_matrix.cpp:284-286) so correctness = CG converging to ones, and
errors fail fast with abort() (make_local_matrix.cpp:139-144). Here the same
checks are first-class utilities:

- validate_problem: structural invariants of a generated/loaded Problem
  (A·1 == b when xexact is ones, symmetry on a sample, finite data).
- check_finite: fail-fast NaN/Inf detection on a solve result.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


class ValidationError(AssertionError):
    pass


def _require(ok: bool, msg: str) -> None:
    if not ok:
        raise ValidationError(msg)


def validate_problem(prob, *, rtol: float = 1e-6) -> dict:
    """Check a Problem's construction invariants. Returns a findings dict;
    raises ValidationError on violation."""
    from hpccg_tpu.ops.spmv import spmv

    A, b, xexact = prob.A, prob.b, prob.xexact
    n = prob.total_nrow
    _require(b.shape == (n,), f"b shape {b.shape} != ({n},)")
    _require(np.isfinite(np.asarray(b)).all(), "b contains non-finite values")

    # b must equal A @ xexact (for the generated problem, A·1; ref
    # generate_matrix.cpp:284-286 / compute_residual's role, main.cpp:310-316)
    ax = np.asarray(spmv(A, jnp.asarray(xexact)))
    err = float(np.max(np.abs(ax - np.asarray(b))))
    scale = float(np.max(np.abs(np.asarray(b)))) or 1.0
    _require(err <= rtol * scale, f"A @ xexact != b (max err {err:.3g})")

    # symmetry on a random sample: u.(A v) == v.(A u). Scale by ||u||·||Av||
    # (the natural magnitude of the bilinear form) — u.(Av) itself is a
    # mean-zero statistic for random u,v and can land arbitrarily close to 0
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal(n), b.dtype)
    v = jnp.asarray(rng.standard_normal(n), b.dtype)
    av = spmv(A, v)
    uav = float(jnp.vdot(u, av))
    vau = float(jnp.vdot(v, spmv(A, u)))
    scale = float(jnp.linalg.norm(u) * jnp.linalg.norm(av)) or 1.0
    sym_err = abs(uav - vau) / scale
    # tolerance scales with the dtype's precision (bf16's eps is ~7.8e-3;
    # a fixed f32-ish bound would reject pristine bf16 problems)
    sym_rtol = max(rtol, 100 * float(jnp.finfo(b.dtype).eps))
    _require(sym_err <= sym_rtol, f"A not symmetric (rel err {sym_err:.3g})")

    return {"b_residual": err, "symmetry_rel_err": sym_err}


def check_finite(res) -> None:
    """Fail fast if a CGResult carries NaN/Inf (the divergence signature:
    exact convergence under tolerance=0 yields alpha = 0/0, faithful to the
    reference recurrence)."""
    if not np.isfinite(float(res.normr)):
        raise ValidationError(
            f"solve diverged or over-converged: normr = {float(res.normr)} "
            f"after {int(res.niters)} iterations"
        )
    if not np.isfinite(np.asarray(res.x)).all():
        raise ValidationError("solution vector contains non-finite values")
