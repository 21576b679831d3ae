"""Whole-solve CG mega-kernel: the ENTIRE CG loop inside one Pallas call.

The reference's SYCL path dispatches 5+ kernels per CG iteration with a
host-side q->wait() between each (HPCCG.cpp:186-265). The jitted-while_loop
solver (solver.py) already removes the host from the loop; this kernel removes
XLA from the loop too: b/x/r/p/Ap all live in VMEM for the whole solve, every
iteration is pure VPU work with zero HBM traffic and zero kernel-launch
boundaries. Two matvec strategies share the solve structure (see the mode
comment below): the fused whole-grid kernel to ~128^3 f32, and the
slab-looped variant to ~144^3 f32 / ~200^3 bf16; past those the streaming
backends take over.

Measured at the VPU roofline: one iteration is ~24 ops/element (stencil ~17
+ axpys/dots ~7), so 100^3 (1.39M padded elements) costs ~8.7 us/iter on a
v5e (~3.85 T op/s) — further gains need fewer ops, not better scheduling.
The r.r reduction is fused into the end-of-body r update (bit-identical to
the reference's top-of-body recompute, one fewer pass and no gating
reduction at the iteration head).

Layout matches stencil_v2: (nzp, ny_pad, nx_pad), y on sublanes, x on lanes.
Iteration structure is bit-compatible with solver.cg_solve: same recurrence,
same k==1 branch-free beta (the r.r each body uses is carried from the
fused end-of-body computation, bit-identical to a top-of-body recompute),
and the loop condition / exit normr use the body-used rtrans exactly as the
reference does (HPCCG.cpp:358,371).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hpccg_tpu.config import DIAG_VALUE, OFFDIAG_VALUE, Stencil
from hpccg_tpu.operators import StencilOperator
from hpccg_tpu.ops.pallas.stencil_v2 import (
    VMEM_LIMIT,
    _sum3_x,
    _sum3_y,
    pad_plane3,
    padded_dims,
    unpad_plane3,
)


# The kernel has two matvec strategies sharing one solve structure:
#
# - "whole": the stencil applies to the full grid in one fused expression.
#   Best VPU scheduling (the measured 8.7 us/iter at 100^3), but the fused
#   expression's temporaries cost ~6 extra vector-equivalents of VMEM
#   (spill-slot allocations observed on hardware put the true footprint near
#   ~14 vectors), capping it at the measured 128^3 f32 boundary.
# - "slab": the stencil applies z-slab by z-slab (fori_loop, MEGA_TZ planes
#   per step, p carrying one zero guard plane at each end), with the p.Ap
#   partial accumulated in-flight. Temporaries are slab-sized, so the
#   footprint is essentially the 5 resident vectors — extending the
#   whole-solve reach to ~144^3 at f32 and ~200^3 at bf16 (16-bit state
#   always uses slabs: it both needs the headroom and avoids Mosaic's
#   32-bit-only rotate in the deep fused expression).
MEGA_TZ = 8
SLAB_VMEM_LIMIT = 127 << 20  # compiler cap: all of the v5e's 128 MiB VMEM
# fit model budget: leaves ~12 MB for the scoped-stack slack the Mosaic
# register allocator takes beyond the 5 vectors + slab temporaries.
# Pinned by exp/vmem_boundary_check.py on hardware: 200^3 bf16 (model
# 111.9 MB) compiles, 208^3 bf16 (model 116.0 MB) OOMs; 144^3 f32 (model
# 114.8 MB) compiles.
SLAB_FIT_BUDGET = 115 << 20


def _mega_mode(op: StencilOperator, dtype) -> str | None:
    """'whole' | 'slab' | None (doesn't fit)."""
    dtype = jnp.dtype(dtype)
    if dtype.itemsize != 2:
        nzp, ny_pad, nx_pad = padded_dims(op, dtype, tz=1)
        if 8 * nzp * ny_pad * nx_pad * dtype.itemsize <= VMEM_LIMIT:
            return "whole"
    nzp, ny_pad, nx_pad = padded_dims(op, dtype, tz=MEGA_TZ)
    plane = ny_pad * nx_pad * dtype.itemsize
    vec = nzp * plane
    # 5 vectors + 2 guard planes + ~8 slab-deep temporaries + 2 MB slack
    need = 5 * vec + 2 * plane + 8 * (MEGA_TZ + 2) * plane + (2 << 20)
    return "slab" if need <= SLAB_FIT_BUDGET else None


def mega_tz(op: StencilOperator, dtype) -> int:
    """z-padding unit for the megakernel's layout (1 = whole-grid mode)."""
    return 1 if _mega_mode(op, dtype) == "whole" else MEGA_TZ


def fits_vmem(op: StencilOperator, dtype=None) -> bool:
    """True when some megakernel mode fits the VMEM budget."""
    return _mega_mode(op, dtype or op.dtype) is not None


def _matvec_full(u: jax.Array, valid: jax.Array, nx: int, ny: int, stencil: Stencil):
    """A @ u on the full padded grid in VMEM. Padding planes of u are zero, so
    z-clipping falls out of a zero-padded plane shift; the final valid mask
    keeps the padding exactly zero (z-pad planes see real neighbors below)."""
    nzp = u.shape[0]
    if stencil == Stencil.S27:
        xy = _sum3_y(_sum3_x(u, nx, force_mask=True), ny)
        zp = jnp.pad(xy, ((1, 1), (0, 0), (0, 0)))
        s = zp[0:nzp] + xy + zp[2 : nzp + 2]
    else:
        zp = jnp.pad(u, ((1, 1), (0, 0), (0, 0)))
        s = (
            _sum3_x(u, nx, force_mask=True)
            + _sum3_y(u, ny)
            - u
            + zp[0:nzp]
            + zp[2 : nzp + 2]
        )
    return ((DIAG_VALUE - OFFDIAG_VALUE) * u + OFFDIAG_VALUE * s) * valid


def _kernel(
    b_ref,
    x0_ref,
    x_ref,
    trace_ref,
    stats_ref,
    r_ref,
    p_ref,
    ap_ref,
    *,
    op: StencilOperator,
    max_iter: int,
    tolerance: float,
):
    dtype = b_ref.dtype
    # Vector arithmetic runs at the storage dtype (keeping temporaries
    # storage-sized, so bf16 state really halves the VMEM footprint); the
    # reductions and the alpha/beta recurrence accumulate in sdtype >= f32.
    # For f32/f64 sdtype == dtype and the compiled program is unchanged.
    sdtype = trace_ref.dtype
    nx, ny, nz = op.nx, op.ny, op.nz
    nzp, ny_pad, nx_pad = b_ref.shape
    iz = jax.lax.broadcasted_iota(jnp.int32, (nzp, 1, 1), 0)
    iy = jax.lax.broadcasted_iota(jnp.int32, (1, ny_pad, 1), 1)
    ix = jax.lax.broadcasted_iota(jnp.int32, (1, 1, nx_pad), 2)
    valid = ((iz < nz) & (iy < ny) & (ix < nx)).astype(dtype)
    mv = partial(_matvec_full, valid=valid, nx=nx, ny=ny, stencil=op.stencil)
    tol = jnp.asarray(tolerance, sdtype)

    trace_ref[:] = jnp.full_like(trace_ref, jnp.nan)

    # p = x0; Ap = A p; r = b - Ap; rtrans = r.r   (HPCCG.cpp:347-354)
    x_ref[:] = x0_ref[:]
    p_ref[:] = x0_ref[:]
    ap_ref[:] = mv(x0_ref[:])
    r_ref[:] = b_ref[:] - ap_ref[:]
    rtrans0 = jnp.sum(r_ref[:] * r_ref[:], dtype=sdtype)
    trace_ref[0, :] = jnp.full((128,), jnp.sqrt(rtrans0), sdtype)

    # carry: (k, rt_last, rr_fresh).
    # rt_last = the rtrans the LAST executed body used — what the
    # reference's loop condition tests and reports as normr at exit
    # (HPCCG.cpp:358,371): one update older than the freshest residual.
    # rr_fresh = r.r of the CURRENT r, computed fused with the r update at
    # the end of the previous body — bit-identical to the top-of-body
    # recompute solver.cg_solve does (same r, same reduction) but one fewer
    # full-array pass per iteration.
    def cond(c):
        k, rt_last, rr_fresh = c
        return jnp.logical_and(k < max_iter, jnp.sqrt(rt_last) > tol)

    def body(c):
        k, rt_prev, rtrans = c
        beta = jnp.where(k == 1, jnp.asarray(0.0, sdtype), rtrans / rt_prev)
        trace_ref[pl.ds(k, 1), :] = jnp.full((1, 128), jnp.sqrt(rtrans), sdtype)
        p_ref[:] = r_ref[:] + beta.astype(dtype) * p_ref[:]
        ap_ref[:] = mv(p_ref[:])
        pap = jnp.sum(p_ref[:] * ap_ref[:], dtype=sdtype)
        alpha = rtrans / pap
        x_ref[:] = x_ref[:] + alpha.astype(dtype) * p_ref[:]
        r_ref[:] = r_ref[:] - alpha.astype(dtype) * ap_ref[:]
        rr = jnp.sum(r_ref[:] * r_ref[:], dtype=sdtype)
        return (k + 1, rtrans, rr)

    k0 = jnp.asarray(1, jnp.int32)
    k, rt_last, _ = jax.lax.while_loop(cond, body, (k0, rtrans0, rtrans0))
    # stats/trace live in sdtype (>= f32): niters stays exact for any
    # realistic max_iter regardless of a bf16 vector dtype
    stats_ref[0, 0] = jnp.sqrt(rt_last)  # == ref normr at exit
    stats_ref[0, 1] = rt_last
    stats_ref[0, 2] = (k - 1).astype(sdtype)  # niters
    stats_ref[0, 3] = jnp.asarray(0.0, sdtype)  # spare slot, defined


def _kernel_slab(
    b_ref,
    x0_ref,
    x_ref,
    trace_ref,
    stats_ref,
    r_ref,
    p_ref,  # (nzp + 2, ny_pad, nx_pad): one zero guard plane per z end
    ap_ref,
    *,
    op: StencilOperator,
    max_iter: int,
    tolerance: float,
):
    """Same solve as _kernel, stencil applied MEGA_TZ z-planes at a time.

    The guarded p buffer makes every slab's (tz+2)-plane halo window a
    plain aligned slice (the streamkernel trick without the DMA), and the
    p.Ap reduction accumulates in-flight while each output slab is hot."""
    from hpccg_tpu.ops.pallas.streamkernel import _stencil_slab

    dtype = b_ref.dtype
    sdtype = trace_ref.dtype  # >= f32: reductions, recurrence, niters
    nx, ny, nz = op.nx, op.ny, op.nz
    nzp, ny_pad, nx_pad = b_ref.shape
    tz = min(MEGA_TZ, nzp)
    nzb = nzp // tz
    ix = jax.lax.broadcasted_iota(jnp.int32, (1, 1, nx_pad), 2)
    iy = jax.lax.broadcasted_iota(jnp.int32, (1, ny_pad, 1), 1)
    valid_xy = ((ix < nx) & (iy < ny)).astype(dtype)
    tol = jnp.asarray(tolerance, sdtype)

    def apply_p():
        """ap <- A @ p (slab-wise); returns the fused p.Ap in sdtype."""

        def slab(kb, acc):
            u = p_ref[pl.ds(kb * tz, tz + 2)]
            izs = jax.lax.broadcasted_iota(jnp.int32, (tz, 1, 1), 0) + kb * tz
            y = _stencil_slab(u, nx, ny, op.stencil) * (
                valid_xy * (izs < nz).astype(dtype)
            )
            ap_ref[pl.ds(kb * tz, tz)] = y
            return acc + jnp.sum(y * u[1 : tz + 1], dtype=sdtype)

        return jax.lax.fori_loop(0, nzb, slab, jnp.asarray(0.0, sdtype))

    # Every full-grid pass below runs slab-wise too: a whole-grid elementwise
    # statement makes Mosaic stack-allocate a full-vector temporary (measured:
    # ~4.7 vector-equivalents of scoped stack), which is exactly the VMEM this
    # mode exists to save.
    def each_slab(fn, init=None):
        def step(kb, acc):
            sl = pl.ds(kb * tz, tz)
            slp = pl.ds(kb * tz + 1, tz)  # p's view, shifted past the guard
            return fn(sl, slp, acc)

        return jax.lax.fori_loop(
            0, nzb, step, jnp.asarray(0.0, sdtype) if init is None else init
        )

    trace_ref[:] = jnp.full_like(trace_ref, jnp.nan)
    zero_plane = jnp.zeros((1, ny_pad, nx_pad), dtype)
    p_ref[0:1] = zero_plane
    p_ref[nzp + 1 : nzp + 2] = zero_plane

    # p = x0; Ap = A p; r = b - Ap; rtrans = r.r   (HPCCG.cpp:347-354)
    # (x_ref aliases x0_ref: the copy is an identity write, p reads x0 first)
    def init_xp(sl, slp, acc):
        v = x0_ref[sl]
        x_ref[sl] = v
        p_ref[slp] = v
        return acc

    each_slab(init_xp)
    apply_p()

    def init_r(sl, slp, acc):
        rv = b_ref[sl] - ap_ref[sl]
        r_ref[sl] = rv
        return acc + jnp.sum(rv * rv, dtype=sdtype)

    rtrans0 = each_slab(init_r)
    trace_ref[0, :] = jnp.full((128,), jnp.sqrt(rtrans0), sdtype)

    def cond(c):
        k, rt_last, rr_fresh = c
        return jnp.logical_and(k < max_iter, jnp.sqrt(rt_last) > tol)

    def body(c):
        k, rt_prev, rtrans = c
        beta = jnp.where(k == 1, jnp.asarray(0.0, sdtype), rtrans / rt_prev)
        trace_ref[pl.ds(k, 1), :] = jnp.full((1, 128), jnp.sqrt(rtrans), sdtype)
        b16 = beta.astype(dtype)

        def upd_p(sl, slp, acc):
            p_ref[slp] = r_ref[sl] + b16 * p_ref[slp]
            return acc

        each_slab(upd_p)
        pap = apply_p()
        alpha = rtrans / pap
        a16 = alpha.astype(dtype)

        def upd_xr(sl, slp, acc):
            x_ref[sl] = x_ref[sl] + a16 * p_ref[slp]
            rv = r_ref[sl] - a16 * ap_ref[sl]
            r_ref[sl] = rv
            return acc + jnp.sum(rv * rv, dtype=sdtype)

        rr = each_slab(upd_xr)
        return (k + 1, rtrans, rr)

    k0 = jnp.asarray(1, jnp.int32)
    k, rt_last, _ = jax.lax.while_loop(cond, body, (k0, rtrans0, rtrans0))
    stats_ref[0, 0] = jnp.sqrt(rt_last)
    stats_ref[0, 1] = rt_last
    stats_ref[0, 2] = (k - 1).astype(sdtype)
    stats_ref[0, 3] = jnp.asarray(0.0, sdtype)


@partial(jax.jit, static_argnums=(0, 3, 4, 5, 6))
def cg_mega_padded(
    op: StencilOperator,
    b_pad: jax.Array,
    x0_pad: jax.Array,
    max_iter: int,
    tolerance: float = 0.0,
    interpret: bool = False,
    slab: bool | None = None,
):
    """Run the whole CG solve in one Pallas call (padded v2 layout).

    b_pad/x0_pad must be padded with ``pad_plane3(op, v, mega_tz(op, dtype))``.
    slab=None picks the mode by VMEM fit (see _mega_mode); True/False force.
    Returns (x_pad, trace, stats) with stats = [normr, rtrans, niters]."""
    dtype = b_pad.dtype
    if slab is None:
        slab = _mega_mode(op, dtype) != "whole"
    nzp, ny_pad, nx_pad = padded_dims(op, dtype, tz=MEGA_TZ if slab else 1)
    assert b_pad.shape == (nzp, ny_pad, nx_pad)
    interpret = interpret or jax.default_backend() != "tpu"
    if not interpret and jnp.dtype(dtype).itemsize == 8:
        raise ValueError(
            "float64 is not supported by Mosaic TPU kernels; use the XLA "
            "backends (backend='stencil') on TPU, or CPU for f64 parity runs"
        )
    # scalar outputs (trace/stats incl. niters) in the f32-or-better compute
    # dtype — a bf16 stats slot would make niters inexact past 256 iterations
    sdtype = jnp.promote_types(dtype, jnp.float32)
    vec = jax.ShapeDtypeStruct((nzp, ny_pad, nx_pad), dtype)
    kernel = _kernel_slab if slab else _kernel
    p_planes = nzp + 2 if slab else nzp  # slab mode: zero guard plane per end
    return pl.pallas_call(
        partial(kernel, op=op, max_iter=max_iter, tolerance=tolerance),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            vec,  # x (aliased to x0)
            jax.ShapeDtypeStruct((max(max_iter, 1), 128), sdtype),  # trace
            jax.ShapeDtypeStruct((1, 4), sdtype),  # stats
        ),
        scratch_shapes=[
            pltpu.VMEM((nzp, ny_pad, nx_pad), dtype),  # r
            pltpu.VMEM((p_planes, ny_pad, nx_pad), dtype),  # p
            pltpu.VMEM((nzp, ny_pad, nx_pad), dtype),  # Ap
        ],
        input_output_aliases={1: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=SLAB_VMEM_LIMIT if slab else VMEM_LIMIT
        ),
        interpret=interpret,
    )(b_pad, x0_pad)


def cg_solve_mega(op: StencilOperator, b: jax.Array, x0: jax.Array, *, max_iter: int, tolerance: float = 0.0):
    """Flat-vector wrapper returning a solver.CGResult."""
    from hpccg_tpu.solver import CGResult

    tz = mega_tz(op, b.dtype)
    x_pad, trace, stats = cg_mega_padded(
        op, pad_plane3(op, b, tz), pad_plane3(op, x0, tz), max_iter, tolerance
    )
    return CGResult(
        x=unpad_plane3(op, x_pad),
        niters=stats[0, 2].astype(jnp.int32),
        normr=stats[0, 0],
        rtrans=stats[0, 1],
        trace=trace[:, 0],
    )
