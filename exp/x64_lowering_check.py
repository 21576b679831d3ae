"""Mosaic-under-x64 lowering check: compile + run every Pallas tier that can
execute inside a jax_enable_x64 process, on the REAL chip (interpret=False).

Under x64, Python int literals in kernel arithmetic or BlockSpec index maps
trace as (weak) i64 and Mosaic rejects the lowering (see ddmath.i0 and the
dia_kernel hazard note). The dd tiers ONLY run under x64, and the f32 tiers
run under x64 whenever the runtime enables it (--dtype float64 drivers,
iterative refinement), so interpret-mode tests never catch a regression here
— this script is the chip-CI leg (tests/test_x64_lowering.py wraps it).

Run on the chip:  PYTHONPATH=/root/repo python exp/x64_lowering_check.py
"""

import sys

import jax

jax.config.update("jax_enable_x64", True)

# --interpret: CPU smoke mode (API/shape checks only — proves nothing about
# Mosaic lowering, which is the point of this script; chip mode is the real leg)
INTERPRET = "--interpret" in sys.argv
if INTERPRET:
    # the axon sitecustomize force-selects the TPU regardless of env
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def check_gell():
    """f32 + dd gather-ELL kernels, real lowering, vs a NumPy oracle."""
    from hpccg_tpu.operators import EllMatrix
    from hpccg_tpu.ops.pallas.gell_kernel import (
        prepare_gell, spmv_gell, spmv_gell_dd,
    )

    rng = np.random.default_rng(7)
    n, w, bw = 4096, 9, 300
    cols = np.clip(
        np.arange(n)[:, None] + rng.integers(-bw, bw + 1, (n, w)), 0, n - 1
    )
    vals = rng.standard_normal((n, w)) * (1 + 1e-9 * rng.standard_normal((n, w)))
    x = rng.standard_normal(n)
    yref = np.zeros(n)
    np.add.at(yref, np.repeat(np.arange(n), w), (vals * x[cols]).ravel())
    scale = np.abs(yref).max()

    ell64 = EllMatrix(
        vals=jnp.asarray(vals, jnp.float64),
        cols=jnp.asarray(cols, jnp.int32),
        valid=jnp.ones((n, w), bool),
        start_row=0,
        total_nrow=n,
    )
    y = np.asarray(spmv_gell_dd(prepare_gell(ell64), jnp.asarray(x), interpret=INTERPRET))
    rel = np.abs(y - yref).max() / scale
    assert rel < 1e-12, f"dd gell rel err {rel}"
    print(f"gell dd (x64): rel err {rel:.2e}")

    ell32 = EllMatrix(
        vals=jnp.asarray(vals, jnp.float32),
        cols=jnp.asarray(cols, jnp.int32),
        valid=jnp.ones((n, w), bool),
        start_row=0,
        total_nrow=n,
    )
    y32 = np.asarray(
        spmv_gell(prepare_gell(ell32), jnp.asarray(x, jnp.float32), interpret=INTERPRET)
    )
    rel32 = np.abs(y32 - yref).max() / scale
    assert rel32 < 1e-5, f"f32 gell under x64 rel err {rel32}"
    print(f"gell f32 (x64): rel err {rel32:.2e}")


def check_stack():
    """f32 + dd strip-bucketed gather stacks, real lowering, incl. the
    sharded entry point (the dynamic_slice window path of
    make_distributed_stack_cg at one shard)."""
    from hpccg_tpu.operators import EllMatrix
    from hpccg_tpu.ops.pallas.gell_stack import (
        prepare_gell_stack,
        spmv_gell_stack,
        spmv_gell_stack_dd,
        spmv_gell_stack_shard,
        stack_shard_geometry,
    )

    rng = np.random.default_rng(9)
    n, w = 4096, 5
    cols = np.stack(
        [np.arange(n)] + [rng.integers(0, n, n) for _ in range(w - 1)], axis=1
    ).astype(np.int32)
    vals = rng.standard_normal((n, w)) * (1 + 1e-9 * rng.standard_normal((n, w)))
    x = rng.standard_normal(n)
    yref = np.zeros(n)
    np.add.at(yref, np.repeat(np.arange(n), w), (vals * x[cols]).ravel())
    scale = np.abs(yref).max()

    ell64 = EllMatrix(
        vals=jnp.asarray(vals, jnp.float64),
        cols=jnp.asarray(cols, jnp.int32),
        valid=jnp.ones((n, w), bool),
        start_row=0,
        total_nrow=n,
    )
    S64 = prepare_gell_stack(ell64, strip_chunks=8)
    y = np.asarray(
        spmv_gell_stack_dd(S64, jnp.asarray(x), interpret=INTERPRET)
    )
    rel = np.abs(y - yref).max() / scale
    assert rel < 1e-12, f"dd stack rel err {rel}"
    print(f"stack dd (x64): rel err {rel:.2e}")

    import dataclasses

    S32 = prepare_gell_stack(
        dataclasses.replace(ell64, vals=jnp.asarray(vals, jnp.float32)),
        strip_chunks=8,
    )
    y32 = np.asarray(
        spmv_gell_stack(S32, jnp.asarray(x, jnp.float32), interpret=INTERPRET)
    )
    rel32 = np.abs(y32 - yref).max() / scale
    assert rel32 < 1e-5, f"f32 stack under x64 rel err {rel32}"
    print(f"stack f32 (x64): rel err {rel32:.2e}")

    # sharded entry at one shard: pad the global x and slice at shard 0 —
    # the exact program make_distributed_stack_cg runs per device
    T_l, xw_chunks = stack_shard_geometry(S32, 1)
    ysh = np.asarray(
        spmv_gell_stack_shard(
            S32.vals3, S32.li3, jnp.asarray(x, jnp.float32),
            jnp.int32(0), strips=S32.strips, pbl=S32.pbl,
            xp_chunks=S32.xp_chunks, xw_chunks=xw_chunks,
            interpret=INTERPRET,
        )
    )[:n]
    relsh = np.abs(ysh - yref).max() / scale
    assert relsh < 1e-5, f"stack shard rel err {relsh}"
    print(f"stack shard f32 (x64): rel err {relsh:.2e}")


def check_dynwin():
    """f32 + dd dynamic-window gather kernels, real lowering — the SMEM
    offset table's scalar reads (``woff_ref[t, w]``) feeding a sublane
    ``pl.ds`` are exactly the construct a Mosaic/x64 regression would
    break; also covers the sharded entry (window dynamic_slice + rebased
    woff) at one shard."""
    from hpccg_tpu.operators import EllMatrix
    from hpccg_tpu.ops.pallas.gell_dynwin import (
        dynwin_shard_geometry,
        prepare_gell_dynwin,
        spmv_gell_dynwin,
        spmv_gell_dynwin_dd,
        spmv_gell_dynwin_shard,
    )

    rng = np.random.default_rng(11)
    n, w = 4096, 5
    cols = np.stack(
        [np.arange(n)] + [rng.integers(0, n, n) for _ in range(w - 1)], axis=1
    ).astype(np.int32)
    vals = rng.standard_normal((n, w)) * (1 + 1e-9 * rng.standard_normal((n, w)))
    x = rng.standard_normal(n)
    yref = np.zeros(n)
    np.add.at(yref, np.repeat(np.arange(n), w), (vals * x[cols]).ravel())
    scale = np.abs(yref).max()

    ell64 = EllMatrix(
        vals=jnp.asarray(vals, jnp.float64),
        cols=jnp.asarray(cols, jnp.int32),
        valid=jnp.ones((n, w), bool),
        start_row=0,
        total_nrow=n,
    )
    D64 = prepare_gell_dynwin(ell64, K=8)
    y = np.asarray(spmv_gell_dynwin_dd(D64, jnp.asarray(x), interpret=INTERPRET))
    rel = np.abs(y - yref).max() / scale
    assert rel < 1e-12, f"dd dynwin rel err {rel}"
    print(f"dynwin dd (x64): rel err {rel:.2e} (W={D64.W})")

    import dataclasses

    D32 = prepare_gell_dynwin(
        dataclasses.replace(ell64, vals=jnp.asarray(vals, jnp.float32)), K=8
    )
    y32 = np.asarray(
        spmv_gell_dynwin(D32, jnp.asarray(x, jnp.float32), interpret=INTERPRET)
    )
    rel32 = np.abs(y32 - yref).max() / scale
    assert rel32 < 1e-5, f"f32 dynwin under x64 rel err {rel32}"
    print(f"dynwin f32 (x64): rel err {rel32:.2e}")

    # sharded entry at one shard: the exact per-device program of
    # make_distributed_dynwin_cg (window slice + rebased woff)
    T_l, xw_chunks, lo, xp_pad = dynwin_shard_geometry(D32, 1)
    woff_l = jnp.asarray(
        np.maximum(np.asarray(D32.woff, np.int64) - int(lo[0]), 0), jnp.int32
    )
    ysh = np.asarray(
        spmv_gell_dynwin_shard(
            D32.vals4, D32.li4, woff_l, jnp.asarray(x, jnp.float32),
            jnp.int32(lo[0]), K=D32.K, pbl=D32.pbl, xp_chunks=xp_pad,
            xw_chunks=xw_chunks, interpret=INTERPRET,
        )
    )[:n]
    relsh = np.abs(ysh - yref).max() / scale
    assert relsh < 1e-5, f"dynwin shard rel err {relsh}"
    print(f"dynwin shard f32 (x64): rel err {relsh:.2e}")


def check_dia_dd():
    """dd blocked-DIA matvec (the chip-proven tier — cheap
    canary that the shared spec/roll pinning stays intact)."""
    from hpccg_tpu.operators import DiaMatrix
    from hpccg_tpu.ops.pallas.dia_kernel import prepare_dia_dd, spmv_dia_dd_prepared

    rng = np.random.default_rng(3)
    n = 4096
    offs = tuple(sorted(rng.choice(np.arange(-300, 301), 40, replace=False).tolist()))
    data = np.zeros((len(offs), n))
    for d, off in enumerate(offs):
        lo, hi = max(0, -off), min(n, n - off)
        data[d, lo:hi] = rng.standard_normal(hi - lo)
    A = DiaMatrix(data=jnp.asarray(data, jnp.float64), offsets=offs, total_nrow=n)
    x = rng.standard_normal(n)
    prep = prepare_dia_dd(A)
    y = np.asarray(
        spmv_dia_dd_prepared(
            prep.offsets, prep.data2_hi, prep.data2_lo, jnp.asarray(x), prep.n,
            interpret=INTERPRET,
        )
    )
    yref = np.zeros(n)
    for d, off in enumerate(offs):
        lo, hi = max(0, -off), min(n, n - off)
        yref[lo:hi] += data[d, lo:hi] * x[lo + off : hi + off]
    rel = np.abs(y - yref).max() / np.abs(yref).max()
    assert rel < 1e-12, f"dd dia rel err {rel}"
    print(f"dia dd (x64): rel err {rel:.2e}")


def check_stencil_dd():
    """dd stencil (backend='pallas_dd') matvec."""
    from hpccg_tpu.config import ProblemConfig
    from hpccg_tpu.models.stencil import generate_problem
    from hpccg_tpu.ops.pallas.stencil_v2 import (
        pad_plane3, spmv_padded_v2_dd, unpad_plane3,
    )

    prob = generate_problem(ProblemConfig(24, 24, 24, dtype=jnp.float64))
    op = prob.A
    x = jnp.asarray(
        np.random.default_rng(5).standard_normal(op.local_nrow), jnp.float64
    )
    u = pad_plane3(op, x)
    y = np.asarray(unpad_plane3(op, spmv_padded_v2_dd(op, u, None, INTERPRET)))
    yref = np.asarray(op.matvec(x))  # XLA f64 oracle
    rel = np.abs(y - yref).max() / np.abs(yref).max()
    assert rel < 1e-12, f"dd stencil rel err {rel}"
    print(f"stencil dd (x64): rel err {rel:.2e}")


def check_stencil_f32_under_x64():
    """f32 pallas-v2 stencil: the refinement inner-solve configuration."""
    import dataclasses

    from hpccg_tpu.config import ProblemConfig
    from hpccg_tpu.models.stencil import generate_problem
    from hpccg_tpu.ops.pallas.stencil_v2 import spmv_stencil_pallas_v2

    prob = generate_problem(ProblemConfig(24, 24, 24, dtype=jnp.float64))
    op32 = dataclasses.replace(prob.A, dtype_name="float32")
    x = jnp.asarray(
        np.random.default_rng(6).standard_normal(op32.local_nrow), jnp.float32
    )
    y = np.asarray(spmv_stencil_pallas_v2(op32, x, interpret=INTERPRET))
    yref = np.asarray(prob.A.matvec(x.astype(jnp.float64)))
    rel = np.abs(y - yref).max() / np.abs(yref).max()
    assert rel < 1e-5, f"f32 v2 under x64 rel err {rel}"
    print(f"stencil v2 f32 (x64): rel err {rel:.2e}")


def main():
    if not INTERPRET:
        assert jax.default_backend() == "tpu", (
            "x64 lowering is a Mosaic fact — run on the chip (or --interpret)"
        )
    check_dia_dd()
    check_gell()
    check_stack()
    check_dynwin()
    check_stencil_dd()
    check_stencil_f32_under_x64()
    print("X64 LOWERING CHECK OK" + (" (interpret smoke)" if INTERPRET else ""))


if __name__ == "__main__":
    main()
