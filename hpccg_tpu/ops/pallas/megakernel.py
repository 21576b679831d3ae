"""Whole-solve CG mega-kernel: the ENTIRE CG loop inside one Pallas call.

The reference's SYCL path dispatches 5+ kernels per CG iteration with a
host-side q->wait() between each (HPCCG.cpp:186-265). The jitted-while_loop
solver (solver.py) already removes the host from the loop; this kernel removes
XLA from the loop too: b/x/r/p/Ap all live in VMEM for the whole solve, every
iteration is pure VPU work with zero HBM traffic and zero kernel-launch
boundaries. Applicable when ~8 padded vector-equivalents (5 vectors +
stencil temporaries) fit the VMEM budget — up to ~128^3 at f32 given lane
padding; above that the streaming backends take over.

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


def fits_vmem(op: StencilOperator, dtype=None, budget: int = VMEM_LIMIT) -> bool:
    """True when the whole solve state (5 padded vectors + stencil temporaries,
    ~8 vector-equivalents) fits in the kernel VMEM budget."""
    nzp, ny_pad, nx_pad = padded_dims(op, dtype or op.dtype)
    vec = nzp * ny_pad * nx_pad * jnp.dtype(dtype or op.dtype).itemsize
    return 8 * vec <= budget


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
    nx, ny, nz = op.nx, op.ny, op.nz
    nzp, ny_pad, nx_pad = b_ref.shape
    iz = jax.lax.broadcasted_iota(jnp.int32, (nzp, 1, 1), 0)
    iy = jax.lax.broadcasted_iota(jnp.int32, (1, ny_pad, 1), 1)
    ix = jax.lax.broadcasted_iota(jnp.int32, (1, 1, nx_pad), 2)
    valid = ((iz < nz) & (iy < ny) & (ix < nx)).astype(dtype)
    mv = partial(_matvec_full, valid=valid, nx=nx, ny=ny, stencil=op.stencil)
    tol = jnp.asarray(tolerance, dtype)

    trace_ref[:] = jnp.full_like(trace_ref, jnp.nan)

    # p = x0; Ap = A p; r = b - Ap; rtrans = r.r   (HPCCG.cpp:347-354)
    x_ref[:] = x0_ref[:]
    p_ref[:] = x0_ref[:]
    ap_ref[:] = mv(x0_ref[:])
    r_ref[:] = b_ref[:] - ap_ref[:]
    rtrans0 = jnp.sum(r_ref[:] * r_ref[:])
    trace_ref[0, :] = jnp.full((128,), jnp.sqrt(rtrans0), dtype)

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
        beta = jnp.where(k == 1, jnp.asarray(0.0, dtype), rtrans / rt_prev)
        trace_ref[pl.ds(k, 1), :] = jnp.full((1, 128), jnp.sqrt(rtrans), dtype)
        p_ref[:] = r_ref[:] + beta * p_ref[:]
        ap_ref[:] = mv(p_ref[:])
        pap = jnp.sum(p_ref[:] * ap_ref[:])
        alpha = rtrans / pap
        x_ref[:] = x_ref[:] + alpha * p_ref[:]
        r_ref[:] = r_ref[:] - alpha * ap_ref[:]
        rr = jnp.sum(r_ref[:] * r_ref[:])
        return (k + 1, rtrans, rr)

    k0 = jnp.asarray(1, jnp.int32)
    k, rt_last, _ = jax.lax.while_loop(cond, body, (k0, rtrans0, rtrans0))
    stats_ref[0, 0] = jnp.sqrt(rt_last)  # == ref normr at exit
    stats_ref[0, 1] = rt_last
    stats_ref[0, 2] = (k - 1).astype(dtype)  # niters
    stats_ref[0, 3] = jnp.asarray(0.0, dtype)  # spare slot, defined


@partial(jax.jit, static_argnums=(0, 3, 4, 5))
def cg_mega_padded(
    op: StencilOperator,
    b_pad: jax.Array,
    x0_pad: jax.Array,
    max_iter: int,
    tolerance: float = 0.0,
    interpret: bool = False,
):
    """Run the whole CG solve in one Pallas call (padded v2 layout).

    Returns (x_pad, trace, stats) with stats = [normr, rtrans, niters]."""
    nzp, ny_pad, nx_pad = padded_dims(op, b_pad.dtype)
    dtype = b_pad.dtype
    assert b_pad.shape == (nzp, ny_pad, nx_pad)
    interpret = interpret or jax.default_backend() != "tpu"
    if not interpret and jnp.dtype(dtype).itemsize == 8:
        raise ValueError(
            "float64 is not supported by Mosaic TPU kernels; use the XLA "
            "backends (backend='stencil') on TPU, or CPU for f64 parity runs"
        )
    vec = jax.ShapeDtypeStruct((nzp, ny_pad, nx_pad), dtype)
    return pl.pallas_call(
        partial(_kernel, op=op, max_iter=max_iter, tolerance=tolerance),
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
            jax.ShapeDtypeStruct((max(max_iter, 1), 128), dtype),  # trace
            jax.ShapeDtypeStruct((1, 4), dtype),  # stats
        ),
        scratch_shapes=[
            pltpu.VMEM((nzp, ny_pad, nx_pad), dtype),  # r
            pltpu.VMEM((nzp, ny_pad, nx_pad), dtype),  # p
            pltpu.VMEM((nzp, ny_pad, nx_pad), dtype),  # Ap
        ],
        input_output_aliases={1: 0},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(b_pad, x0_pad)


def cg_solve_mega(op: StencilOperator, b: jax.Array, x0: jax.Array, *, max_iter: int, tolerance: float = 0.0):
    """Flat-vector wrapper returning a solver.CGResult."""
    from hpccg_tpu.solver import CGResult

    x_pad, trace, stats = cg_mega_padded(
        op, pad_plane3(op, b), pad_plane3(op, x0), max_iter, tolerance
    )
    return CGResult(
        x=unpad_plane3(op, x_pad),
        niters=stats[0, 2].astype(jnp.int32),
        normr=stats[0, 0],
        rtrans=stats[0, 1],
        trace=trace[:, 0],
    )
