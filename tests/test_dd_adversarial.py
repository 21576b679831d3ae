"""Adversarial-value tests for the double-float (two-f32) kernels.

The routine dd tests use unit-scale random data, where almost any
compensated scheme looks good. These pin the two regimes that expose a
defective error-free-transform chain:

- wide magnitude spread (values across ~24 decades): a broken split or a
  contracted product loses the small addends entirely;
- catastrophic cancellation (large equal-and-opposite partials): the true
  result is the tiny survivor, which only survives if every product is
  exact and the accumulation error-free. Plain f32 gets these completely
  wrong (relative error ~1), so the asserted bounds are meaningful.

Error is asserted against the backward-error scale sum_j |a_ij||x_j| (the
conditioning-free measure): a dd chain is ~2^-48 relative to the partial
magnitudes, regardless of how much the row cancels.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from hpccg_tpu.operators import DiaMatrix, EllMatrix
from hpccg_tpu.ops.pallas.dia_kernel import prepare_dia_dd, spmv_dia_dd_prepared
from hpccg_tpu.ops.pallas.gell_kernel import prepare_gell, spmv_gell_dd


def _dia_oracle(data, offsets, x):
    n = x.shape[0]
    y = np.zeros(n)
    mag = np.zeros(n)  # sum_j |a_ij||x_j| per row
    for d, off in enumerate(offsets):
        xs = np.zeros(n)
        t = slice(max(0, -off), min(n, n - off))
        s = slice(max(0, off), min(n, n + off))
        xs[t] = x[s]
        y += data[d] * xs
        mag += np.abs(data[d] * xs)
    return y, mag


def test_dd_dia_wide_magnitude_spread():
    """Diagonal values and x spanning ~24 decades: error stays ~2^-48 of
    the partial-magnitude scale (f32 would be ~2^-24)."""
    rng = np.random.default_rng(0)
    n = 1024
    offsets = tuple(sorted(set([0] + rng.integers(-40, 41, 30).tolist())))
    data = np.zeros((len(offsets), n))
    for d, _ in enumerate(offsets):
        data[d] = rng.choice([-1, 1], n) * 10.0 ** rng.uniform(-12, 12, n)
    x = rng.choice([-1, 1], n) * 10.0 ** rng.uniform(-12, 12, n)

    A = DiaMatrix(data=jnp.asarray(data), offsets=offsets, total_nrow=n)
    P = prepare_dia_dd(A)
    y = np.asarray(
        spmv_dia_dd_prepared(
            P.offsets, P.data2_hi, P.data2_lo, jnp.asarray(x), P.n, interpret=True
        )
    )
    y_ref, mag = _dia_oracle(data, offsets, x)
    err = np.max(np.abs(y - y_ref) / np.maximum(mag, 1e-300))
    assert err < 1e-13, err  # ~2^-48 * small constant; f32 fails at ~6e-8


def test_dd_dia_catastrophic_cancellation():
    """Rows of (+c, -c, 1) with c up to 1e8: the exact row sum is 1. dd
    must recover it to ~c * 2^-48 absolute; f32 loses it completely
    (error ~c * 2^-24 ~ 6, i.e. 600% relative)."""
    n = 512
    rng = np.random.default_rng(1)
    c = 10.0 ** rng.uniform(6, 8, n)
    offsets = (-1, 0, 1)
    data = np.zeros((3, n))
    data[0, :] = c  # sub-diagonal: a[i, i-1] = c_i
    data[1, :] = 1.0
    data[2, :] = -c  # super-diagonal: a[i, i+1] = -c_i
    x = np.ones(n)
    A = DiaMatrix(data=jnp.asarray(data), offsets=offsets, total_nrow=n)
    P = prepare_dia_dd(A)
    y = np.asarray(
        spmv_dia_dd_prepared(
            P.offsets, P.data2_hi, P.data2_lo, jnp.asarray(x), P.n, interpret=True
        )
    )
    y_ref, _ = _dia_oracle(data, offsets, x)
    # interior rows: exact value 1 + (c_i - c_i) = 1; allow 2^-45 * c slack
    interior = slice(1, n - 1)
    bound = np.maximum(c[interior] * 2.0**-45, 1e-12)
    assert np.all(np.abs(y[interior] - y_ref[interior]) <= bound), (
        np.max(np.abs(y[interior] - y_ref[interior]) / bound)
    )
    # sanity: plain f32 arithmetic genuinely fails this (guards against the
    # test accidentally being too easy)
    y32 = np.zeros(n, np.float32)
    for d, off in enumerate(offsets):
        xs = np.zeros(n, np.float32)
        t = slice(max(0, -off), min(n, n - off))
        s = slice(max(0, off), min(n, n + off))
        xs[t] = x.astype(np.float32)[s]
        y32 = y32 + data[d].astype(np.float32) * xs
    assert np.max(np.abs(y32[interior].astype(np.float64) - y_ref[interior])) > 0.5


def _ell_from_rows(cols, vals):
    n, w = cols.shape
    return EllMatrix(
        vals=jnp.asarray(vals, jnp.float64),
        cols=jnp.asarray(cols, jnp.int32),
        valid=jnp.ones((n, w), bool),
        start_row=0,
        total_nrow=n,
    )


def test_dd_gell_wide_magnitude_spread():
    rng = np.random.default_rng(2)
    n, w, bw = 2048, 7, 150
    cols = np.clip(np.arange(n)[:, None] + rng.integers(-bw, bw + 1, (n, w)), 0, n - 1)
    vals = rng.choice([-1, 1], (n, w)) * 10.0 ** rng.uniform(-12, 12, (n, w))
    x = rng.choice([-1, 1], n) * 10.0 ** rng.uniform(-12, 12, n)
    A = prepare_gell(_ell_from_rows(cols, vals))
    y = np.asarray(spmv_gell_dd(A, jnp.asarray(x), interpret=True))
    y_ref = np.zeros(n)
    mag = np.zeros(n)
    rows = np.repeat(np.arange(n), w)
    np.add.at(y_ref, rows, (vals * x[cols]).ravel())
    np.add.at(mag, rows, np.abs(vals * x[cols]).ravel())
    err = np.max(np.abs(y - y_ref) / np.maximum(mag, 1e-300))
    assert err < 1e-13, err


def test_dd_gell_catastrophic_cancellation():
    rng = np.random.default_rng(3)
    n, w = 1024, 3
    c = 10.0 ** rng.uniform(6, 8, n)
    cols = np.stack(
        [
            np.clip(np.arange(n) - 1, 0, n - 1),
            np.arange(n),
            np.clip(np.arange(n) + 1, 0, n - 1),
        ],
        axis=1,
    )
    vals = np.stack([c, np.ones(n), -c], axis=1)
    x = np.ones(n)
    A = prepare_gell(_ell_from_rows(cols, vals))
    y = np.asarray(spmv_gell_dd(A, jnp.asarray(x), interpret=True))
    y_ref = np.zeros(n)
    np.add.at(y_ref, np.repeat(np.arange(n), w), (vals * x[cols]).ravel())
    interior = slice(1, n - 1)
    bound = np.maximum(c[interior] * 2.0**-45, 1e-12)
    assert np.all(np.abs(y[interior] - y_ref[interior]) <= bound), (
        np.max(np.abs(y[interior] - y_ref[interior]) / bound)
    )
