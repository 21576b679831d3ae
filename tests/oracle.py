"""Independent NumPy oracle implementing the reference's *specification*.

A deliberately naive, loop-based re-statement of the problem semantics
(generate_matrix.cpp:251-289) and of CG (HPCCG.cpp:312-402), used as the
correctness oracle for the JAX implementation. Written from the spec, kept
separate from the framework so the two cannot share bugs.
"""

from __future__ import annotations

import numpy as np


def oracle_matrix(nx, ny, nz, *, size=1, rank=0, seven_pt=False):
    """COO triplets + b/xexact for rank's z-stacked shard, reference order."""
    local_nrow = nx * ny * nz
    total_nrow = local_nrow * size
    start_row = local_nrow * rank
    rows, cols, vals = [], [], []
    b = np.zeros(local_nrow)
    for iz in range(nz):
        for iy in range(ny):
            for ix in range(nx):
                lr = iz * nx * ny + iy * nx + ix
                gr = start_row + lr
                nnzrow = 0
                for sz in (-1, 0, 1):
                    for sy in (-1, 0, 1):
                        for sx in (-1, 0, 1):
                            col = gr + sz * nx * ny + sy * nx + sx
                            if not (0 <= ix + sx < nx and 0 <= iy + sy < ny):
                                continue
                            if not (0 <= col < total_nrow):
                                continue
                            if seven_pt and sz * sz + sy * sy + sx * sx > 1:
                                continue
                            rows.append(gr)
                            cols.append(col)
                            vals.append(27.0 if col == gr else -1.0)
                            nnzrow += 1
                b[lr] = 27.0 - (nnzrow - 1)
    xexact = np.ones(local_nrow)
    return (
        np.array(rows),
        np.array(cols),
        np.array(vals),
        b,
        xexact,
    )


def oracle_dense(nx, ny, nz, *, seven_pt=False):
    rows, cols, vals, b, xexact = oracle_matrix(nx, ny, nz, seven_pt=seven_pt)
    n = nx * ny * nz
    A = np.zeros((n, n))
    A[rows, cols] = vals
    return A, b, xexact


def oracle_cg(A, b, x0, max_iter, tolerance=0.0):
    """CG with the reference's exact iteration structure (HPCCG.cpp:312-402).

    Returns (x, niters, normr, trace) with trace[k] = residual printed at
    iteration k (trace[0] = initial residual).
    """
    x = x0.astype(np.float64).copy()
    p = x.copy()
    Ap = A @ p
    r = b - Ap
    rtrans = r @ r
    normr = np.sqrt(rtrans)
    trace = [normr]
    niters = 0
    k = 1
    while k < max_iter and normr > tolerance:
        if k == 1:
            p = r.copy()
        else:
            oldrtrans = rtrans
            rtrans = r @ r
            beta = rtrans / oldrtrans
            p = r + beta * p
        normr = np.sqrt(rtrans)
        trace.append(normr)
        Ap = A @ p
        alpha = rtrans / (p @ Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        niters = k
        k += 1
    return x, niters, normr, np.array(trace)


# Golden fixture from the reference's checked-in run (out.txt:1-21):
# 10x10x10, serial build, max_iter=150 (main_old.cpp:166), tolerance=0.
GOLDEN_10_TRACE = {
    0: 258.24,
    15: 2.15402e-06,
    30: 2.81972e-20,
    45: 6.66682e-30,
    60: 7.96609e-39,
    75: 1.85259e-48,
    90: 1.15032e-56,
    105: 1.01621e-65,
    120: 1.39759e-75,
    135: 1.07273e-83,
    149: 1.68304e-92,
}
GOLDEN_10_NITERS = 149
