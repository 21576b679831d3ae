"""Conjugate-gradient solver (ref HPCCG.cpp:312-402 / HPCCG_sycl :83-301).

The reference's SYCL path crosses the host<->device boundary every kernel
(q->wait() + host-side scalar math, HPCCG.cpp:186-265). Here the *entire* CG
loop is one jitted ``lax.while_loop``: scalars (rtrans, alpha, beta, normr)
never leave the device, the loop condition evaluates on-device, and XLA fuses
the waxpby/ddot chains around the SpMV. One compiled program per
(problem-shape, max_iter) — no per-iteration dispatch at all.

Iteration structure replicated exactly (bit-compatible trajectory in f64):

    p = x0; Ap = A@p; r = b - Ap; rtrans = r.r; normr = sqrt(rtrans)
    for k = 1 .. max_iter-1 while normr > tolerance:
        if k == 1: p = r                         (HPCCG.cpp:360-363)
        else:      beta = rtrans_new/rtrans_old; p = r + beta*p   (:366-369)
        normr = sqrt(rtrans)                     (:371, printed residual)
        Ap = A@p                                 (:379)
        alpha = rtrans / (p . Ap)                (:381-382)
        x += alpha*p; r -= alpha*Ap              (:383-384)

The k==1 branch is expressed branch-free as beta=0 with an (idempotent,
bit-identical) recompute of rtrans = r.r.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from hpccg_tpu.ops.vector import ddot as _ddot


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["x", "niters", "normr", "rtrans", "trace"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class CGResult:
    """Solver output. ``trace[k]`` is the residual norm printed at iteration k
    (trace[0] = initial residual); entries past ``niters`` are NaN."""

    x: jax.Array
    niters: jax.Array  # int32, number of iterations executed (== ref niters)
    normr: jax.Array  # final residual norm (== ref normr at loop exit)
    rtrans: jax.Array
    trace: jax.Array  # (max_iter,) residual-norm trajectory


def cg_solve(
    matvec: Callable[[jax.Array], jax.Array],
    b: jax.Array,
    x0: jax.Array,
    *,
    max_iter: int,
    tolerance: float = 0.0,
    dot: Optional[Callable[[jax.Array, jax.Array], jax.Array]] = None,
    matvec_donor: Optional[Callable[[jax.Array, jax.Array], jax.Array]] = None,
    matvec_pap: Optional[Callable] = None,
    pap_reduce: Optional[Callable[[jax.Array], jax.Array]] = None,
) -> CGResult:
    """Run CG. Jit-safe; call under jax.jit (or shard_map) with static
    max_iter/tolerance. ``dot`` defaults to the local dot product; pass a
    psum-reducing dot for distributed solves.

    ``matvec_donor(p, dead_buf)``: optional variant that steals ``dead_buf``
    (the previous Ap, unused past the r update) for its output — Pallas
    kernels with aliased outputs stream ~2x faster on v5e.

    ``matvec_pap(p) -> (Ap, local p.Ap)``: optional fused variant that
    emits the p.Ap partial alongside Ap (saves the dot's re-read of both
    vectors at HBM-resident sizes, ~13% per iteration at 256^3);
    ``pap_reduce`` sums the partial across the mesh (identity if None).
    """
    if dot is None:
        dot = _ddot
    if pap_reduce is None:
        pap_reduce = lambda s: s  # noqa: E731
    dtype = b.dtype
    tol = jnp.asarray(tolerance, dtype)

    p = x0
    Ap = matvec(p)
    r = b - Ap
    rtrans = dot(r, r)
    normr0 = jnp.sqrt(rtrans)

    trace0 = jnp.full((max(max_iter, 1),), jnp.nan, dtype).at[0].set(normr0)

    # The reference computes rtrans = r.r at the loop TOP (HPCCG.cpp:367);
    # here the same dot is evaluated fused with the r-update at the previous
    # iteration's END and CARRIED (rr_next below) — identical input array,
    # identical reduction, identical value, but inside the while_loop body
    # XLA fuses the reduce into the r-update's elementwise fusion, saving a
    # full re-read of r per iteration at HBM-resident sizes (a loop-top dot
    # on a carried array cannot fuse across the loop boundary). At k==1 the
    # carried value IS the init r.r — the reference's bit-identical
    # recompute, by construction.

    def cond(carry):
        k, x, r, p, Ap, rtrans, normr, trace = carry
        return jnp.logical_and(k < max_iter, normr > tol)

    def body(carry):
        k, x, r, p, Ap_dead, rr_pair, _, trace = carry
        rtrans, rtrans_old = rr_pair
        beta = jnp.where(k == 1, jnp.asarray(0.0, dtype), rtrans / rtrans_old)
        p = r + beta * p
        normr = jnp.sqrt(rtrans)
        trace = trace.at[k].set(normr)
        if matvec_pap is not None:
            Ap, pap = matvec_pap(p)
            alpha = rtrans / pap_reduce(pap)
        else:
            if matvec_donor is not None:
                Ap = matvec_donor(p, Ap_dead)
            else:
                Ap = matvec(p)
            alpha = rtrans / dot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        rr_next = dot(r, r)  # fuses with the r-update (see note above)
        return (k + 1, x, r, p, Ap, (rr_next, rtrans), normr, trace)

    k0 = jnp.asarray(1, jnp.int32)
    carry = (k0, x0, r, p, Ap, (rtrans, rtrans), normr0, trace0)
    k, x, r, p, Ap, rr_pair, normr, trace = jax.lax.while_loop(cond, body, carry)
    # exit semantics: the reference leaves the loop with normr/rtrans as of
    # its last top-of-loop evaluation; rr_pair[1] is that value (rr_pair[0]
    # is one update newer — never consumed by a loop top)
    return CGResult(
        x=x, niters=k - 1, normr=normr, rtrans=rr_pair[1], trace=trace
    )


def cg_solve_single_reduction(
    matvec: Callable[[jax.Array], jax.Array],
    b: jax.Array,
    x0: jax.Array,
    *,
    max_iter: int,
    tolerance: float = 0.0,
    dot2: Optional[Callable] = None,
    replace_every: int = 0,
) -> CGResult:
    """Chronopoulos–Gear single-reduction CG: ONE fused 2-scalar reduction
    per iteration instead of two (communication-reduced CG; cf. the retrieved
    papers PAPERS.md — arXiv 2501.03743, 2105.06176).

    Maintains s = A p by the recurrence s' = u + beta*s (u = A r), so alpha
    and beta both derive from one (r.r, r.u) pair: the two MPI_Allreduces of
    the reference iteration (ddot.cpp:79 at HPCCG.cpp:367,381) become one
    psum of a stacked 2-vector. Costs one extra axpy + one extra carried
    vector — the right trade when allreduce latency dominates (small shards
    on a large mesh). Mathematically equivalent to cg_solve in exact
    arithmetic; the residual trajectory agrees to rounding.

    ``dot2((a1,b1),(a2,b2))`` returns (a1.b1, a2.b2) reduced in one round;
    defaults to the local fused pair.

    f32 note: the recurrence residual decays BELOW the true residual's
    stagnation floor (~1e-7 relative) and eventually flushes to exact zero,
    terminating tolerance=0 runs around iteration ~140 at typical sizes —
    long fixed-work benchmark runs should use method="cg", f64, or
    ``replace_every``.

    ``replace_every=K``: residual replacement (van der Vorst/Sleijpen-style)
    — every K iterations the recurrence residual is replaced by the TRUE
    residual b - A x (one extra matvec), re-anchoring the recurrence to the
    stagnation floor instead of letting it flush to zero. In exact
    arithmetic a no-op (f64 trajectory parity pinned in tests); the search
    direction p is kept (no restart). Collectives inside the lax.cond
    branch are fine under shard_map (replicated predicate).
    """
    if dot2 is None:
        def dot2(p1, p2):
            return jnp.vdot(*p1), jnp.vdot(*p2)

    dtype = b.dtype
    tol = jnp.asarray(tolerance, dtype)

    r = b - matvec(x0)
    u = matvec(r)
    gamma, delta = dot2((r, r), (r, u))
    normr0 = jnp.sqrt(gamma)
    trace0 = jnp.full((max(max_iter, 1),), jnp.nan, dtype).at[0].set(normr0)
    alpha0 = gamma / delta

    # gamma_top = the ||r||^2 a standard-CG body would have computed at ITS
    # loop top (one update older than the fused gamma): the reference's loop
    # condition and exit normr test that value (HPCCG.cpp:358,371), so cg1
    # must too — otherwise tolerance exits land one iteration early.
    def cond(c):
        k, x, r, p, s, gamma, alpha, gamma_top, trace = c
        return jnp.logical_and(k < max_iter, jnp.sqrt(gamma_top) > tol)

    def body(c):
        k, x, r, p, s, gamma, alpha, _, trace = c
        trace = trace.at[k].set(jnp.sqrt(gamma))
        x = x + alpha * p
        r = r - alpha * s
        if replace_every:
            r = jax.lax.cond(
                k % replace_every == 0,
                lambda x_, r_: b - matvec(x_),
                lambda x_, r_: r_,
                x, r,
            )
        u = matvec(r)
        gamma_new, delta = dot2((r, r), (r, u))
        beta = gamma_new / gamma
        alpha = gamma_new / (delta - beta * gamma_new / alpha)
        p = r + beta * p
        s = u + beta * s
        return (k + 1, x, r, p, s, gamma_new, alpha, gamma, trace)

    k0 = jnp.asarray(1, jnp.int32)
    carry = (k0, x0, r, r, u, gamma, alpha0, gamma, trace0)
    k, x, r, p, s, gamma, alpha, gamma_top, trace = jax.lax.while_loop(
        cond, body, carry
    )
    return CGResult(
        x=x, niters=k - 1, normr=jnp.sqrt(gamma_top), rtrans=gamma_top, trace=trace
    )


def cg_solve_pipelined(
    matvec: Callable[[jax.Array], jax.Array],
    b: jax.Array,
    x0: jax.Array,
    *,
    max_iter: int,
    tolerance: float = 0.0,
    dot2: Optional[Callable] = None,
    replace_every: int = 0,
) -> CGResult:
    """Ghysels–Vanroose pipelined CG: the iteration's single fused reduction
    overlaps the SpMV (arXiv 2105.06176 and the communication-hiding CG
    literature; PAPERS.md).

    Maintains w = A r, s = A p, z = A s by recurrences, so the one SpMV per
    iteration (q = A w) carries NO data dependency on that iteration's
    (gamma, delta) reduction — inside the jitted loop XLA's scheduler can run
    the psum concurrently with the matvec, hiding allreduce latency entirely
    on a mesh. Costs three extra carried vectors and three extra axpys vs
    cg1; in floating point the recurrences drift from true residuals
    somewhat faster than standard CG (same trajectory to ~1e-5 over typical
    run lengths; deep-convergence parity runs should use method="cg").

    ``replace_every=K``: residual replacement — every K iterations r is
    replaced by the true b - A x and w by A r (two extra matvecs at the
    replacement step; those iterations do not hide the reduction), curing
    the f32 recurrence flush like cg1's (see cg_solve_single_reduction).
    """
    if dot2 is None:
        def dot2(p1, p2):
            return jnp.vdot(*p1), jnp.vdot(*p2)

    dtype = b.dtype
    tol = jnp.asarray(tolerance, dtype)

    r = b - matvec(x0)
    w = matvec(r)
    gamma, delta = dot2((r, r), (w, r))
    normr0 = jnp.sqrt(gamma)
    trace0 = jnp.full((max(max_iter, 1),), jnp.nan, dtype).at[0].set(normr0)
    q = matvec(w)
    alpha = gamma / delta
    p, s, z = r, w, q

    # same delayed-exit semantics as cg1: the reference's loop condition and
    # exit normr test the body-top rtrans (HPCCG.cpp:358,371)
    def cond(c):
        k, x, r, w, p, s, z, gamma, alpha, gamma_top, trace = c
        return jnp.logical_and(k < max_iter, jnp.sqrt(gamma_top) > tol)

    def body(c):
        k, x, r, w, p, s, z, gamma, alpha, _, trace = c
        trace = trace.at[k].set(jnp.sqrt(gamma))
        x = x + alpha * p
        r = r - alpha * s
        w = w - alpha * z
        if replace_every:
            r, w = jax.lax.cond(
                k % replace_every == 0,
                lambda x_, r_, w_: (
                    (lambda rt: (rt, matvec(rt)))(b - matvec(x_))
                ),
                lambda x_, r_, w_: (r_, w_),
                x, r, w,
            )
        gamma_new, delta = dot2((r, r), (w, r))
        q = matvec(w)  # independent of the in-flight reduction -> overlaps
        beta = gamma_new / gamma
        alpha = gamma_new / (delta - beta * gamma_new / alpha)
        p = r + beta * p
        s = w + beta * s
        z = q + beta * z
        return (k + 1, x, r, w, p, s, z, gamma_new, alpha, gamma, trace)

    k0 = jnp.asarray(1, jnp.int32)
    carry = (k0, x0, r, w, p, s, z, gamma, alpha, gamma, trace0)
    out = jax.lax.while_loop(cond, body, carry)
    k, x, r, w, p, s, z, gamma, alpha, gamma_top, trace = out
    return CGResult(
        x=x, niters=k - 1, normr=jnp.sqrt(gamma_top), rtrans=gamma_top, trace=trace
    )


def cg_solve_fused(
    op,
    b_pad: jax.Array,
    x0_pad: jax.Array,
    masks: jax.Array,
    *,
    max_iter: int,
    tolerance: float = 0.0,
    psum: Optional[Callable[[jax.Array], jax.Array]] = None,
    halo2_fn=None,
    halo4_fn=None,
) -> CGResult:
    """CG with the two fused Pallas passes per iteration (ops/pallas/fused_cg):
    identical recurrence to cg_solve, but p-update+SpMV+dot fuse into one
    kernel and x/r updates + the next ddot into another — no standalone
    ddot/waxpby passes remain.

    Operates in the padded-plane layout. psum reduces dot partials across the
    mesh (distributed); halo2_fn(v)/halo4_fn(r, p) supply ppermuted boundary
    planes (None = true domain boundary).
    """
    from hpccg_tpu.ops.pallas.fused_cg import fused_update_p_apply, fused_update_x_r
    from hpccg_tpu.ops.pallas.stencil_kernel import spmv_padded

    dtype = b_pad.dtype
    tol = jnp.asarray(tolerance, dtype)
    gsum = psum if psum is not None else (lambda s: s)

    p = x0_pad
    Ap = spmv_padded(op, p, masks, halo2_fn(p) if halo2_fn else None)
    r = b_pad - Ap
    rtrans = gsum(jnp.vdot(r, r))
    normr0 = jnp.sqrt(rtrans)
    trace0 = jnp.full((max(max_iter, 1),), jnp.nan, dtype).at[0].set(normr0)

    def cond(c):
        k, x, r, p, ap, rt_prev, rt_cur, normr, trace = c
        return jnp.logical_and(k < max_iter, normr > tol)

    def body(c):
        k, x, r, p, ap_dead, rt_prev, rt_cur, _, trace = c
        beta = jnp.where(k == 1, jnp.asarray(0.0, dtype), rt_cur / rt_prev)
        normr = jnp.sqrt(rt_cur)
        trace = trace.at[k].set(normr)
        halo = halo4_fn(r, p) if halo4_fn else None
        p2, ap, pap = fused_update_p_apply(op, r, p, beta, masks, halo, ap_dead)
        alpha = rt_cur / gsum(pap)
        x, r, rr = fused_update_x_r(x, r, p2, ap, alpha)
        return (k + 1, x, r, p2, ap, rt_cur, gsum(rr), normr, trace)

    k0 = jnp.asarray(1, jnp.int32)
    carry = (k0, x0_pad, r, p, Ap, rtrans, rtrans, normr0, trace0)
    k, x, r, p, ap, rt_prev, rt_cur, normr, trace = jax.lax.while_loop(cond, body, carry)
    return CGResult(x=x, niters=k - 1, normr=normr, rtrans=rt_cur, trace=trace)


def resolve_backend(A, backend: str = "auto") -> str:
    """Map backend="auto" to the fastest measured backend for this problem.

    Measured on v5e (PERF.md): the whole-solve megakernel wins while the 5
    solve vectors fit VMEM (f32 ~<=128^3 whole / 144^3 slab; bf16 slab to
    ~200^3); the streaming whole-solve kernel (r/p pinned, x DMA-streamed)
    wins while 2 vectors fit (f32 ~<=200^3: 207 us/iter vs 790 XLA / 1003
    pallas; bf16 ~<=256^3: 366 vs 609 pallas-v2 at 256^3); the XLA stencil
    path covers the remaining band up to ~10.5M rows where it keeps most
    state VMEM-resident; the streaming pallas-v2 kernel wins once truly
    HBM-resident (f32 256^3: 1259 vs 2311; bf16 past 256^3). f64 on TPU rides the double-float
    (two-f32) stencil kernel, backend='pallas_dd' (Mosaic has no f64; XLA's
    emulated f64 pays double-double per op of the 27-sum). On CPU
    (tests/parity) auto stays on the XLA stencil path.
    """
    from hpccg_tpu.operators import StencilOperator

    KNOWN = (
        "auto", "stencil", "ell", "dia", "pallas", "pallas_v1",
        "pallas_fused", "megakernel", "streamkernel", "collective",
        "pallas_dd",
    )
    if backend not in KNOWN:
        raise ValueError(f"unknown backend {backend!r} (choose from {KNOWN})")
    if not isinstance(A, StencilOperator):
        # explicit matrices (ELL/DIA) dispatch through spmv(); the
        # whole-solve kernel names are stencil-only, so requesting one here
        # falls back to the native dispatch with a warning rather than
        # silently mislabeling the measurement
        if backend not in ("auto", "stencil", "ell", "dia"):
            import warnings

            warnings.warn(
                f"backend={backend!r} applies to stencil operators only; "
                f"{type(A).__name__} uses its native matvec dispatch",
                stacklevel=3,
            )
        from hpccg_tpu.operators import EllMatrix

        if (
            isinstance(A, EllMatrix)
            and jax.default_backend() == "tpu"
            and A.local_nrow >= 100_000
        ):
            import warnings

            warnings.warn(
                f"ELL gather SpMV at {A.local_nrow} rows on TPU is orders of "
                "magnitude off the memory roofline (no hardware gather); "
                "convert with to_dia() or hpccg_tpu.auto_structure() "
                "for a gather-free representation",
                stacklevel=3,
            )
        return "auto"
    if backend != "auto":
        return backend
    if jax.default_backend() != "tpu":
        return "stencil"
    if jnp.dtype(A.dtype).itemsize == 8:
        # f64: the double-float (two-f32) stencil kernel — XLA's TPU f64 is
        # software double-double applied to EVERY op of the 27-sum, the dd
        # kernel captures the same accuracy with error-free f32 transforms
        # (round-3, PERF.md)
        return "pallas_dd"
    if jnp.dtype(A.dtype).itemsize not in (2, 4):
        return "stencil"
    from hpccg_tpu.ops.pallas.megakernel import fits_vmem
    from hpccg_tpu.ops.pallas.streamkernel import fits_stream_vmem

    if fits_vmem(A, A.dtype):
        return "megakernel"
    if fits_stream_vmem(A, A.dtype):
        # the r/p-pinned streaming kernel: f32 reach ~200^3 (207 us/iter vs
        # 790 XLA / 1003 pallas); bf16 state (round 5) halves the pinned
        # footprint, extending the reach to 256^3 where it beats both the
        # XLA stencil band (208^3: 272 vs 285 us/iter) and the pallas-v2
        # HBM tier (256^3: 366 vs 609 us/iter)
        return "streamkernel"
    if A.local_nrow <= 10_500_000:
        # XLA keeps most CG state effectively VMEM-resident up to ~10.5M
        # rows and beats the streaming kernel there — measured for f32
        # (40 MB/vector) AND bf16 (208^3: XLA 291 vs pallas 330 us/iter;
        # the crossover is a row count, not a byte count, round 3)
        return "stencil"
    # truly HBM-resident: the one-pass pallas-v2 streaming tier (f32 256^3:
    # 1259 vs 2311; bf16 256^3: 596 vs 791 us/iter — bf16 computes f32
    # in-kernel with 2 B/element HBM traffic)
    return "pallas"


def make_cg(
    A,
    *,
    max_iter: Optional[int] = None,
    tolerance: Optional[float] = None,
    backend: str = "auto",
    method: str = "cg",
    replace_every: int = 0,
    config=None,
) -> Callable[[jax.Array, jax.Array], CGResult]:
    """Build a jitted single-device solver fn(b, x0) for operator A.

    ``replace_every``: residual replacement interval for the one-reduction
    methods (cg1/pipecg) — re-anchors the recurrence residual to the true
    b - A x every K iterations, curing the f32 flush-to-zero; ignored for
    method='cg' (its residual is already the recurrence the reference
    tests).

    Solve parameters come from ``max_iter``/``tolerance`` or from a
    :class:`hpccg_tpu.SolverConfig` passed as ``config`` (explicit keywords
    win; with neither, SolverConfig's defaults apply — max_iter=150,
    tolerance=0.0, the reference's fixed-work protocol).

    backend="auto" picks the fastest backend for the problem size (see
    resolve_backend). backend="pallas" (stencil operators only) runs the
    whole CG loop in the TPU-native padded-plane layout with the one-pass
    Pallas SpMV kernel; padding stays exactly zero through axpy/dot so the
    iteration scalars are identical to the flat path. backend="megakernel"
    runs the ENTIRE solve inside one Pallas call (VMEM-resident state).
    """
    from hpccg_tpu.config import SolverConfig
    from hpccg_tpu.operators import StencilOperator
    from hpccg_tpu.ops.spmv import spmv

    base = config if config is not None else SolverConfig()
    max_iter = base.max_iter if max_iter is None else max_iter
    tolerance = base.tolerance if tolerance is None else tolerance

    backend = resolve_backend(A, backend)

    from hpccg_tpu.operators import DiaMatrix

    if isinstance(A, DiaMatrix) and A.ndiag > 128 and jax.default_backend() == "tpu":
        from hpccg_tpu.ops.pallas.dia_kernel import (
            dia_dd_supported,
            dia_pallas_supported,
            prepare_dia,
            prepare_dia_dd,
        )

        if dia_pallas_supported(A.offsets, A.local_nrow, A.dtype) and not isinstance(
            A.data, jax.core.Tracer
        ):
            # block-pad the diagonal data into the kernel layout ONCE, here:
            # left inside the jitted solve, the (GB-scale) pad is not
            # reliably hoisted out of the CG loop (30 vs 179 Gslots/s
            # measured at 257 diagonals x 1M rows)
            A = prepare_dia(A)
        elif (
            jnp.dtype(A.dtype).itemsize == 8
            and A.ndiag > 256
            and dia_dd_supported(A.offsets, A.local_nrow)
            and not isinstance(A.data, jax.core.Tracer)
        ):
            # f64 past the XLA unroll cap: the double-f32 compensated
            # kernel (round-3) — f64-class accuracy (~1e-14 rel matvec) at
            # f32 VPU speed, no Mosaic f64 needed
            A = prepare_dia_dd(A)

    if method in ("cg1", "pipecg"):
        solver_fn = (
            cg_solve_single_reduction if method == "cg1" else cg_solve_pipelined
        )
        if backend in ("megakernel", "streamkernel", "pallas_fused"):
            # the whole-solve / fused kernels implement the standard
            # recurrence only; say so instead of silently re-routing a
            # benchmark to a kernel that never ran (cf. resolve_backend's
            # non-stencil fallback warning)
            import warnings

            warnings.warn(
                f"backend={backend!r} implements method='cg' only; "
                f"method={method!r} runs on the per-iteration pallas-v2 "
                "SpMV path instead",
                stacklevel=2,
            )
            backend = "pallas"
        # one-reduction variants ride the pallas-v2 layout or the XLA path
        if backend in ("pallas", "pallas_dd") and isinstance(A, StencilOperator):
            from hpccg_tpu.ops.pallas.stencil_v2 import (
                pad_plane3,
                spmv_padded_v2,
                spmv_padded_v2_dd,
                unpad_plane3,
            )

            mv = spmv_padded_v2_dd if backend == "pallas_dd" else spmv_padded_v2

            def solve_1red_pallas(b, x0):
                res = solver_fn(
                    lambda v: mv(A, v),
                    pad_plane3(A, b),
                    pad_plane3(A, x0),
                    max_iter=max_iter,
                    tolerance=tolerance,
                    replace_every=replace_every,
                )
                return CGResult(
                    x=unpad_plane3(A, res.x),
                    niters=res.niters,
                    normr=res.normr,
                    rtrans=res.rtrans,
                    trace=res.trace,
                )

            return jax.jit(solve_1red_pallas)

        def _solve_1red(A_, b, x0):
            return solver_fn(
                lambda v: spmv(A_, v, backend=backend if backend in ("auto", "stencil", "ell") else "auto"),
                b,
                x0,
                max_iter=max_iter,
                tolerance=tolerance,
                replace_every=replace_every,
            )

        # explicit matrices enter as jit ARGUMENTS (see the cg branch below)
        return partial(jax.jit(_solve_1red), A)
    if method != "cg":
        raise ValueError(f"unknown CG method {method!r}")

    if backend == "pallas_fused" and isinstance(A, StencilOperator):
        from hpccg_tpu.ops.pallas.stencil_kernel import (
            pad_plane,
            plane_masks,
            unpad_plane,
        )

        def solve_fused(b, x0):
            masks = jnp.asarray(plane_masks(A, b.dtype))
            res = cg_solve_fused(
                A,
                pad_plane(A, b),
                pad_plane(A, x0),
                masks,
                max_iter=max_iter,
                tolerance=tolerance,
            )
            return CGResult(
                x=unpad_plane(A, res.x),
                niters=res.niters,
                normr=res.normr,
                rtrans=res.rtrans,
                trace=res.trace,
            )

        return jax.jit(solve_fused)

    if backend == "pallas" and isinstance(A, StencilOperator):
        # v2 layout: z on the grid dim, y on sublanes, x on lanes — all
        # neighbor shifts are lane-roll-by-1 or sublane slices (stencil_v2.py)
        from hpccg_tpu.ops.pallas.stencil_v2 import (
            pad_plane3,
            spmv_padded_v2,
            spmv_padded_v2_pap,
            unpad_plane3,
        )

        def solve_pallas(b, x0):
            res = cg_solve(
                lambda v: spmv_padded_v2(A, v),
                pad_plane3(A, b),
                pad_plane3(A, x0),
                max_iter=max_iter,
                tolerance=tolerance,
                matvec_pap=lambda v: spmv_padded_v2_pap(A, v),
            )
            return CGResult(
                x=unpad_plane3(A, res.x),
                niters=res.niters,
                normr=res.normr,
                rtrans=res.rtrans,
                trace=res.trace,
            )

        return jax.jit(solve_pallas)

    if backend == "pallas_dd" and isinstance(A, StencilOperator):
        # f64 via the double-float (two-f32) stencil kernel: the 27-sum runs
        # error-free f32 transforms in Pallas; the CG recurrence and
        # axpy/dot stay XLA f64 (bandwidth-bound — emulation is cheap there)
        from hpccg_tpu.ops.pallas.stencil_v2 import (
            pad_plane3,
            spmv_padded_v2_dd,
            spmv_padded_v2_dd_pap,
            unpad_plane3,
        )

        def solve_pallas_dd(b, x0):
            res = cg_solve(
                lambda v: spmv_padded_v2_dd(A, v),
                pad_plane3(A, b),
                pad_plane3(A, x0),
                max_iter=max_iter,
                tolerance=tolerance,
                matvec_pap=lambda v: spmv_padded_v2_dd_pap(A, v),
            )
            return CGResult(
                x=unpad_plane3(A, res.x),
                niters=res.niters,
                normr=res.normr,
                rtrans=res.rtrans,
                trace=res.trace,
            )

        return jax.jit(solve_pallas_dd)

    if backend == "megakernel" and isinstance(A, StencilOperator):
        from hpccg_tpu.ops.pallas.megakernel import cg_solve_mega

        return jax.jit(
            lambda b, x0: cg_solve_mega(
                A, b, x0, max_iter=max_iter, tolerance=tolerance
            )
        )

    if backend == "streamkernel" and isinstance(A, StencilOperator):
        from hpccg_tpu.ops.pallas.streamkernel import cg_solve_stream

        return jax.jit(
            lambda b, x0: cg_solve_stream(
                A, b, x0, max_iter=max_iter, tolerance=tolerance
            )
        )

    if backend == "pallas_v1" and isinstance(A, StencilOperator):
        from hpccg_tpu.ops.pallas.stencil_kernel import (
            pad_plane,
            plane_masks,
            spmv_padded,
            unpad_plane,
        )

        def solve_pallas_v1(b, x0):
            masks = jnp.asarray(plane_masks(A, b.dtype))
            res = cg_solve(
                lambda v: spmv_padded(A, v, masks),
                pad_plane(A, b),
                pad_plane(A, x0),
                max_iter=max_iter,
                tolerance=tolerance,
                matvec_donor=lambda v, dead: spmv_padded(A, v, masks, None, dead),
            )
            return CGResult(
                x=unpad_plane(A, res.x),
                niters=res.niters,
                normr=res.normr,
                rtrans=res.rtrans,
                trace=res.trace,
            )

        return jax.jit(solve_pallas_v1)

    # A enters the jitted program as an ARGUMENT (it is a registered pytree),
    # not a closure constant: a closure-captured explicit matrix would be
    # embedded in the HLO as a literal — for a GB-scale DIA/ELL matrix that
    # stalls compilation for minutes serializing the constant (measured).
    # The StencilOperator is all-metadata, so both forms are equivalent
    # there; one code path covers everything.
    def solve_impl(A_, b, x0):
        return cg_solve(
            lambda v: spmv(A_, v, backend=backend),
            b,
            x0,
            max_iter=max_iter,
            tolerance=tolerance,
        )

    return partial(jax.jit(solve_impl), A)


def cg_solve_refined(
    A,
    b: jax.Array,
    x0: jax.Array,
    *,
    inner_max_iter: int = 150,
    outer_max_iter: int = 6,
    tolerance: float = 0.0,
    backend: str = "auto",
    method: str = "cg",
    replace_every: int = 0,
) -> CGResult:
    """Mixed-precision iterative refinement: f32 inner CG solves, f64-quality
    result.

    f64 on TPU is emulated (double-double with an f32 exponent range) and an
    order of magnitude slower than native f32, so a pure-f64 deep-convergence
    solve wastes the MXU/VPU. Classic iterative refinement gets f64 accuracy
    at f32 kernel speed: the residual r = b - A x is computed in f64 (one
    matvec per OUTER iteration — cheap), the correction solve A d = r runs
    entirely in f32 through the fast backends (megakernel/streamkernel/...),
    and x accumulates in f64. Each outer round recovers ~7 more decimal
    digits until the f64 floor.

    b/x0 must be f64 (enable jax_enable_x64). Returns a CGResult whose trace
    holds the OUTER f64 residual norms (length outer_max_iter + 1) and whose
    niters counts total INNER iterations.
    """
    from hpccg_tpu.operators import StencilOperator
    from hpccg_tpu.ops.spmv import spmv

    if jnp.dtype(b.dtype).itemsize != 8:
        raise ValueError("cg_solve_refined expects f64 b/x0 (jax_enable_x64)")

    if isinstance(A, StencilOperator):
        A32 = dataclasses.replace(A, dtype_name="float32")
    else:
        A32 = jax.tree_util.tree_map(
            lambda v: v.astype(jnp.float32)
            if jnp.issubdtype(v.dtype, jnp.floating)
            else v,
            A,
        )
    # The inner RHS is unit-scaled so a FIXED relative tolerance works for
    # every outer round; without a tolerance the f32 inner solve would
    # over-converge on small problems (residual collapses exactly -> the
    # reference recurrence's alpha = 0/0 NaN, see verify SKILL notes).
    inner = make_cg(
        A32, max_iter=inner_max_iter, tolerance=1e-6, backend=backend,
        method=method, replace_every=replace_every,
    )

    # exactly ONE emulated-f64 SpMV per outer round (it is the expensive op
    # this function exists to minimize): the residual computed at the end of
    # a round is reused as the next round's RHS
    x = x0
    trace = []
    total_inner = 0
    r64 = b - spmv(A, x)
    normr = jnp.sqrt(jnp.vdot(r64, r64))
    trace.append(float(normr))
    for _ in range(outer_max_iter):
        scale = float(normr)
        if scale <= tolerance or scale == 0.0:
            break
        rhs32 = (r64 / scale).astype(jnp.float32)
        res = inner(rhs32, jnp.zeros_like(rhs32))
        total_inner += int(res.niters)
        x = x + scale * res.x.astype(b.dtype)
        r64 = b - spmv(A, x)
        normr = jnp.sqrt(jnp.vdot(r64, r64))
        trace.append(float(normr))

    trace_arr = jnp.full((outer_max_iter + 1,), jnp.nan, b.dtype)
    trace_arr = trace_arr.at[: len(trace)].set(jnp.asarray(trace, b.dtype))
    return CGResult(
        x=x,
        niters=jnp.asarray(total_inner, jnp.int32),
        normr=jnp.asarray(float(normr), b.dtype),
        rtrans=jnp.asarray(float(normr) ** 2, b.dtype),
        trace=trace_arr,
    )
