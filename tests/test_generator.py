"""Generator tests: ELL/stencil operators vs the NumPy oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from hpccg_tpu import ProblemConfig, Stencil, generate_problem
from hpccg_tpu.models.stencil import generate_ell

from oracle import oracle_dense, oracle_matrix


DIMS = [(3, 3, 3), (4, 3, 5), (1, 1, 7), (2, 5, 1)]


@pytest.mark.parametrize("dims", DIMS)
@pytest.mark.parametrize("stencil", [Stencil.S27, Stencil.S7])
def test_ell_matches_oracle_coo(dims, stencil):
    nx, ny, nz = dims
    cfg = ProblemConfig(nx, ny, nz, stencil=stencil)
    prob = generate_ell(cfg)
    rows, cols, vals = prob.A.to_coo()
    orows, ocols, ovals, ob, _ = oracle_matrix(
        nx, ny, nz, seven_pt=(stencil == Stencil.S7)
    )
    np.testing.assert_array_equal(rows, orows)
    np.testing.assert_array_equal(cols, ocols)
    np.testing.assert_array_equal(vals, ovals)
    np.testing.assert_allclose(np.asarray(prob.b), ob, rtol=0)
    assert prob.total_nnz_exact == len(ovals)


@pytest.mark.parametrize("dims", DIMS)
@pytest.mark.parametrize("stencil", [Stencil.S27, Stencil.S7])
def test_stencil_operator_matches_dense(dims, stencil):
    nx, ny, nz = dims
    cfg = ProblemConfig(nx, ny, nz, stencil=stencil)
    prob = generate_problem(cfg)
    Ad, ob, oxexact = oracle_dense(nx, ny, nz, seven_pt=(stencil == Stencil.S7))
    rng = np.random.default_rng(0)
    x = rng.standard_normal(cfg.local_nrow)
    got = np.asarray(prob.A.matvec(jnp.asarray(x)))
    np.testing.assert_allclose(got, Ad @ x, rtol=1e-14, atol=1e-14)
    np.testing.assert_allclose(np.asarray(prob.b), ob, rtol=0)
    # A @ 1 == b by construction, and A is symmetric
    np.testing.assert_allclose(Ad, Ad.T, rtol=0)
    assert prob.total_nnz_exact == int(np.count_nonzero(Ad))
    np.testing.assert_array_equal(
        np.asarray(prob.A.nnz_per_row()), (Ad != 0).sum(axis=1)
    )


@pytest.mark.parametrize("stencil", [Stencil.S27, Stencil.S7])
def test_ell_and_stencil_matvec_agree(stencil):
    cfg = ProblemConfig(5, 4, 6, stencil=stencil)
    ell = generate_ell(cfg)
    st = generate_problem(cfg)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(cfg.local_nrow))
    np.testing.assert_allclose(
        np.asarray(ell.A.matvec(x)), np.asarray(st.A.matvec(x)), rtol=1e-14
    )


@pytest.mark.parametrize("size", [2, 4])
def test_ell_partitioned_matches_oracle(size):
    """z-stacked multi-rank partition reproduces the reference's global rows."""
    cfg = ProblemConfig(3, 4, 2)
    for rank in range(size):
        prob = generate_ell(cfg, rank=rank, size=size)
        rows, cols, vals = prob.A.to_coo()
        orows, ocols, ovals, ob, _ = oracle_matrix(3, 4, 2, size=size, rank=rank)
        np.testing.assert_array_equal(rows, orows)
        np.testing.assert_array_equal(cols, ocols)
        np.testing.assert_array_equal(vals, ovals)
        np.testing.assert_allclose(np.asarray(prob.b), ob, rtol=0)


@pytest.mark.slow
def test_partitioned_shards_assemble_to_global():
    """Stacking shard matvecs (with a global x) == unpartitioned matvec."""
    cfg = ProblemConfig(3, 3, 2)
    size = 4
    gcfg = ProblemConfig(3, 3, 2 * size)
    gprob = generate_problem(gcfg)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal(gcfg.local_nrow))
    ys = []
    for rank in range(size):
        shard = generate_ell(cfg, rank=rank, size=size)
        ys.append(np.asarray(shard.A.matvec(x)))  # global-column gather
    np.testing.assert_allclose(
        np.concatenate(ys), np.asarray(gprob.A.matvec(x)), rtol=1e-14
    )


def test_problem_config_validation():
    import pytest

    from hpccg_tpu import ProblemConfig

    with pytest.raises(ValueError, match="grid dims"):
        ProblemConfig(0, 4, 4)
    with pytest.raises(ValueError, match="grid dims"):
        ProblemConfig(4, 4, -1)
