#!/usr/bin/env python
"""Greedy vs cascade dynwin prep (round 5, CPU-only statistics).

The probe's per-(tile,slot)-window prep converges by BUMPING over-window
entries one slot per round (38 rounds x an nnz argsort at 64^3 = ~30 s of
host time; minutes at 100^3). This checks the one-pass greedy equivalent (now the SHIPPED prep —
the wrapper below calls gell_dynwin._greedy_assign so the statistics
reflect production bases exactly):
all tiles advance in lockstep over output slots; slot w's base is the
per-tile min pending chunk (SUB-aligned) and every row whose next entry
fits [base, base+K) consumes it. Progress is guaranteed (the min row always
fits), W = max per-tile slot count falls out of the loop, and each round is
O(n) vector ops instead of O(nnz log nnz).

Prints W/inflation/prep-time for both preps on the same permuted stencil.
Usage: python exp/dynwin_greedy_check.py [nx] (default 64)
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from hpccg_tpu import ProblemConfig
from hpccg_tpu.models.stencil import generate_ell
from hpccg_tpu.operators import EllMatrix
from hpccg_tpu.ops.pallas.gell_kernel import LANE, RT, SUB, _cdiv, _normalize_sorted
from hpccg_tpu.reorder import bandwidth, permute_ell, rcm_permutation

_LANE_SHIFT = LANE.bit_length() - 1
_SUB_SHIFT = SUB.bit_length() - 1


def greedy_assign(ci_flat, counts, T, K, max_w=4096):
    """Thin wrapper over the SHIPPED greedy (gell_dynwin._greedy_assign,
    NumPy path — the probe must characterize the production assignment,
    including the carried-forward bases of finished tiles that shard
    rebasing depends on). Returns (slot, W, bases(T, W)) or None."""
    from hpccg_tpu.ops.pallas.gell_dynwin import _greedy_assign

    out = _greedy_assign(ci_flat, counts, T, K, max_w=max_w, use_native=False)
    if out is None:
        return None
    slot, W, bases = out
    return slot, W, bases


def main():
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    n = nx**3
    cfg = ProblemConfig(nx, nx, nx, dtype=np.float32)
    t0 = time.time()
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
    print(f"setup {time.time()-t0:.1f}s, RCM bandwidth {bandwidth(Ar)}")

    nrm = _normalize_sorted(Ar)
    n_, dd, vdt, vals, cols, valid, width, bw_lo, bw_hi = nrm
    pbl = _cdiv(bw_lo, LANE) * LANE
    T = _cdiv(n, RT)
    sel = valid
    row_flat = np.nonzero(sel)[0]
    pos = (cols[sel] + pbl).astype(np.int64)
    ci = pos >> _LANE_SHIFT
    counts = sel.sum(axis=1)
    nnz = int(counts.sum())

    for K in (8, 16, 24, 32):
        t0 = time.time()
        out = greedy_assign(ci, counts, T, K)
        dt = time.time() - t0
        if out is None:
            print(f"greedy[K={K}]: did not converge")
            continue
        slot, W, bases = out
        # validity: every entry within its (tile, slot) window
        t_i = row_flat // RT
        li = pos - bases[t_i, slot] * LANE
        assert li.min() >= 0 and li.max() < K * LANE, (li.min(), li.max())
        print(
            f"greedy[K={K}]: W={W} (inflation {W*n/nnz:.2f}x), prep {dt:.1f}s"
        )


if __name__ == "__main__":
    main()
