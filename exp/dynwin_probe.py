#!/usr/bin/env python
"""Dynamic-window gather SpMV probe — VERDICT #1 candidate (b) proper.

The shipped wide-scatter tier (gell_stack) buckets entries into strips at
strip-STATIC window offsets; its cost is slot inflation (6.8x at the 100^3
permuted target: every strip's ELL width is the global max per-row count in
that strip). This probe measures the scalar-prefetched alternative: slots
stay POSITIONAL (slot j = j-th smallest column of its row, like the plain
gell kernel), and each (tile, slot) carries its own x-window base chunk in
SMEM — the kernel dynamic-slices `xp_ref[pl.ds(woff_ref[0, w], K)]`. Rows
of a tile whose slot-j entry falls outside the K-chunk window bump to later
slots at prep time (a vectorized cascade), so inflation is only the bump
overflow (~1.1-1.5x expected) instead of the strip max (6.8x).

Open questions this probe answers on the real chip:
  1. does Mosaic accept a dynamic `pl.ds` start (from SMEM) on the
     VMEM-resident x along the sublane dim (8-chunk-aligned bases)?
  2. final slot count W (= inflation) after the cascade at K = 16/24/32;
  3. measured Gnnz/s vs the shipped stack on the SAME permuted-stencil
     target (PERF.md round 4: stack 2.16-2.33 Gnnz/s at 100^3).

Usage: python exp/dynwin_probe.py [nx] (default 64; 100 = the VERDICT case)
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from functools import partial

sys.path.insert(0, ".")

from hpccg_tpu import ProblemConfig
from hpccg_tpu.models.stencil import generate_ell
from hpccg_tpu.operators import EllMatrix
from hpccg_tpu.reorder import bandwidth, permute_ell, rcm_permutation
from hpccg_tpu.ops.pallas.ddmath import i0 as _i0
from hpccg_tpu.ops.pallas.gell_kernel import (
    LANE, RT, SUB, _cdiv, _lane_take, _normalize_sorted,
)
from hpccg_tpu.ops.pallas.gell_stack import prepare_gell_stack, spmv_gell_stack
from hpccg_tpu.utils.timing import time_loop_slope

# Chunk math below shifts by log2(LANE) (element -> chunk index) and aligns
# window bases to SUB chunks; derive the shifts so a constant change can't
# silently corrupt the layout.
_LANE_SHIFT = LANE.bit_length() - 1
_SUB_SHIFT = SUB.bit_length() - 1
assert LANE == 1 << _LANE_SHIFT and SUB == 1 << _SUB_SHIFT


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def prep_dynwin(ell, *, K: int = 24, max_rounds: int = 64):
    """Per-(tile, slot) window prep. Returns (vals4, li4, woff, pbl,
    xp_chunks, W, rounds) or None if the cascade fails to converge."""
    n, dd, vdt, vals, cols, valid, width, bw_lo, bw_hi = _normalize_sorted(ell)
    assert not dd
    pbl = _cdiv(bw_lo, LANE) * LANE
    T = _cdiv(n, RT)

    sel = valid
    row_flat = np.nonzero(sel)[0]  # row-major: grouped by row, slot-ordered
    pos = (cols[sel] + pbl).astype(np.int64)  # element position in padded x
    ci = pos >> _LANE_SHIFT  # chunk index in padded x
    vals_flat = vals[sel]
    t_i = row_flat // RT

    # within-row entry index (entries of a row are contiguous in flat order)
    counts = sel.sum(axis=1)
    row_starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    idx_in_row = np.arange(len(row_flat)) - row_starts[row_flat]

    slot = idx_in_row.copy()
    rounds = 0
    for rounds in range(1, max_rounds + 1):
        W = int(slot.max()) + 1
        key = t_i * W + slot
        order = np.argsort(key, kind="stable")
        ks = key[order]
        cis = ci[order]
        starts = np.searchsorted(ks, np.arange(T * W))
        ends = np.searchsorted(ks, np.arange(T * W), side="right")
        base = np.zeros(T * W, np.int64)
        ne = ends > starts
        if ne.any():
            base[ne] = np.minimum.reduceat(cis, starts[ne])
        base = (base >> _SUB_SHIFT) << _SUB_SHIFT  # SUB-chunk-aligned sublane ds
        over = (ci - base[key]) >= K
        if not over.any():
            break
        # bump over-window entries right, keeping within-row slots strictly
        # increasing: s_i = i + cummax_j<=i (d_j - j), segmented per row
        d = slot + over
        g = d - idx_in_row  # >= 0
        BIG = int(g.max()) + 2
        h = np.maximum.accumulate(g + row_flat * BIG) - row_flat * BIG
        slot = idx_in_row + h
    else:
        return None

    W = int(slot.max()) + 1
    key = t_i * W + slot
    # recompute base for the final W (identical mins, re-keyed)
    order = np.argsort(key, kind="stable")
    ks, cis = key[order], ci[order]
    starts = np.searchsorted(ks, np.arange(T * W))
    ends = np.searchsorted(ks, np.arange(T * W), side="right")
    base = np.zeros(T * W, np.int64)
    ne = ends > starts
    base[ne] = np.minimum.reduceat(cis, starts[ne])
    base = (base >> _SUB_SHIFT) << _SUB_SHIFT
    li = pos - base[key] * LANE
    assert li.min() >= 0 and li.max() < K * LANE <= 32767

    vals4 = np.zeros((T, W, SUB, LANE), np.float32)
    li4 = np.zeros((T, W, SUB, LANE), np.int16)
    r = row_flat % RT
    vals4[t_i, slot, r // LANE, r % LANE] = vals_flat
    li4[t_i, slot, r // LANE, r % LANE] = li.astype(np.int16)
    woff = base.reshape(T, W).astype(np.int32)
    xp_chunks = int(base.max()) + K
    return (
        jnp.asarray(vals4), jnp.asarray(li4), jnp.asarray(woff),
        pbl, xp_chunks, W, rounds,
    )


def _kernel_dyn(woff_ref, xp_ref, vals_ref, li_ref, y_ref, *, W: int, K: int):
    acc = jnp.zeros((SUB, LANE), xp_ref.dtype)
    t = pl.program_id(0)
    for w in range(W):
        xw = xp_ref[pl.ds(woff_ref[t, w], K)]  # (K, 128) at a dynamic base
        li = li_ref[0, w].astype(jnp.int32)
        ll = jnp.bitwise_and(li, LANE - 1)
        ci = jnp.right_shift(li, _LANE_SHIFT)
        g = jnp.zeros((SUB, LANE), xp_ref.dtype)
        for k in range(K):
            chunk = jnp.broadcast_to(xw[k : k + 1], (SUB, LANE))
            g = jnp.where(ci == k, _lane_take(chunk, ll), g)
        acc = acc + vals_ref[0, w] * g
    y_ref[0] = acc


@partial(jax.jit, static_argnums=(4, 5))
def _spmv_dyn(vals4, li4, woff, xp2, K: int, interpret: bool):
    T, W = vals4.shape[0], vals4.shape[1]
    z = _i0()
    return pl.pallas_call(
        partial(_kernel_dyn, W=W, K=K),
        grid=(T,),
        in_specs=[
            # whole offset table in SMEM (a (1, W) block fails Mosaic's
            # block-shape divisibility check); kernel indexes by program_id
            pl.BlockSpec((T, W), lambda t: (z, z), memory_space=pltpu.SMEM),
            pl.BlockSpec(xp2.shape, lambda t: (z, z), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W, SUB, LANE), lambda t: (t, z, z, z)),
            pl.BlockSpec((1, W, SUB, LANE), lambda t: (t, z, z, z)),
        ],
        out_specs=pl.BlockSpec((1, SUB, LANE), lambda t: (t, z, z)),
        out_shape=jax.ShapeDtypeStruct((T, SUB, LANE), vals4.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 << 20,
        ),
        interpret=interpret,
    )(woff, xp2, vals4, li4)


def spmv_dyn(prep, x, n, K):
    vals4, li4, woff, pbl, xp_chunks, W, _ = prep
    interpret = jax.default_backend() != "tpu"
    xp = jnp.zeros((xp_chunks * LANE,), jnp.float32)
    xp = jax.lax.dynamic_update_slice(xp, x.astype(jnp.float32), (pbl,))
    y = _spmv_dyn(vals4, li4, woff, xp.reshape(-1, LANE), K, interpret)
    return y.reshape(-1)[:n]


def slope_matvec(fn, args, x, iters=8, spread=16):
    def make_loop(k):
        @jax.jit
        def loop(args_, v):
            return jax.lax.fori_loop(
                0, k, lambda i, c: (fn(args_, c) * (1.0 / 54.0)).astype(c.dtype), v
            )
        return lambda v: loop(args, v)
    return time_loop_slope(make_loop, x, iters=iters, spread=spread)


def main():
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    n = nx**3
    cfg = ProblemConfig(nx, nx, nx, dtype=jnp.float32)
    log(f"building permuted {nx}^3 stencil (n = {n})")
    from hpccg_tpu import native

    host = native.generate_ell_host(nx, nx, nx)
    if host is not None:
        vals_h, cols_h, valid_h, _b, _nnz = host
        A0 = EllMatrix(
            vals=vals_h.astype(np.float32), cols=cols_h, valid=valid_h,
            start_row=0, total_nrow=n,
        )
    else:
        prob = generate_ell(cfg)
        A0 = EllMatrix(
            vals=np.asarray(prob.A.vals, np.float32),
            cols=np.asarray(prob.A.cols), valid=np.asarray(prob.A.valid),
            start_row=0, total_nrow=n,
        )
    rng = np.random.default_rng(0)
    Ap = permute_ell(A0, rng.permutation(n))
    perm = rcm_permutation(Ap)
    Ar = permute_ell(Ap, perm)
    bw1 = bandwidth(Ar)
    nnz = int(np.asarray(Ar.valid).sum())
    log(f"RCM bandwidth {bw1}, nnz {nnz}")

    x = jnp.asarray(rng.standard_normal(n), jnp.float32)
    rows_c, cols_c, vals_c = Ar.to_coo()
    y_ref = np.zeros(n)
    np.add.at(y_ref, rows_c, vals_c * np.asarray(x)[cols_c.astype(np.int64)])

    for K in (16, 24, 32):
        t0 = time.time()
        prep = prep_dynwin(Ar, K=K)
        if prep is None:
            log(f"dynwin[K={K}]: cascade did not converge")
            continue
        W, rounds = prep[5], prep[6]
        prep_s = time.time() - t0
        width = int(np.asarray(Ar.valid).sum(axis=1).max())
        y = np.asarray(spmv_dyn(prep, x, n, K))
        err = np.max(np.abs(y - y_ref)) / np.max(np.abs(y_ref))
        assert err < 1e-4, err
        # Only arrays may cross the timing-loop jit boundary: the prep
        # tuple's Python ints (pbl, xp_chunks, W) are used as shapes/slice
        # starts inside spmv_dyn and must stay static, so close over them.
        vals4, li4, woff, pbl, xp_chunks, Wst, _r = prep
        t = slope_matvec(
            lambda a, v: spmv_dyn((*a, pbl, xp_chunks, Wst, _r), v, n, K),
            (vals4, li4, woff), x,
        )
        rate = nnz / t / 1e9
        log(
            f"dynwin[K={K}]: W={W} (inflation {W * n / nnz:.2f}x, width {width}), "
            f"{rounds} cascade rounds, prep {prep_s:.1f}s, "
            f"matvec {t * 1e3:.2f} ms = {rate:.2f} Gnnz/s, rel err {err:.1e}"
        )

    # shipped stack on the same case, for the head-to-head
    t0 = time.time()
    S = prepare_gell_stack(Ar, strip_chunks=32)
    prep_s = time.time() - t0
    t = slope_matvec(lambda S_, v: spmv_gell_stack(S_, v), S, x)
    log(
        f"stack[32ch]: wtot {S.wtot} (inflation {S.wtot * n / nnz:.1f}x), "
        f"prep {prep_s:.1f}s, matvec {t * 1e3:.2f} ms = {nnz / t / 1e9:.2f} Gnnz/s"
    )


if __name__ == "__main__":
    main()
