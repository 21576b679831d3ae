"""Streaming whole-solve CG kernel: r and p pinned in VMEM, x streamed.

Extends the VMEM-resident megakernel (megakernel.py) to problems where the
full 5-vector solve state does not fit VMEM but TWO vectors do
(~128^3 < n <= ~200^3 at f32 on a 128 MiB-VMEM chip):

- r and p live in VMEM scratch for the whole solve (with one zero guard
  plane at each z end, so every stencil slab read is in-bounds);
- Ap is NEVER materialized: the stencil is recomputed slab-by-slab from the
  pinned p, once for the p.Ap reduction and once for the r update — VPU work
  is far cheaper than the two HBM passes (write+read of a 40 MB Ap);
- x stays in HBM and is streamed through a double-buffered DMA slab loop,
  updated in place (x += alpha*p) — the ONLY per-iteration HBM traffic:
  2 passes of x per iteration vs the ~7 effective passes of the XLA path.

Iteration structure matches solver.cg_solve (same recurrence, same
branch-free k==1 beta). The r.r each body uses is accumulated slab-wise
during the previous body's r update — value-equivalent to a top-of-body
recompute but a DIFFERENT reduction tree (per-slab partial sums), so
last-ulp trajectory differences vs the flat path are expected.

bf16 state (round 5) rides the megakernel slab recipe: vectors (r, p, the
streamed x) stay 16-bit in VMEM/HBM — halving both the pinned footprint
(reach extends from ~200^3 f32 to 256^3 bf16) and the per-iteration HBM
traffic — while every reduction (r.r, p.Ap) and the alpha/beta recurrence
accumulate in f32 (``sdtype``), and control scalars/trace are f32, so
niters stays exact past bf16's 256-integer range. Convergence floors at
the documented bf16 storage limit (max|x - 1| ~ 0.04), like every 16-bit
tier.
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
    _sum3_x,
    _sum3_y,
    pad_plane3,
    padded_dims,
    unpad_plane3,
)


def _stream_tz(op: StencilOperator, dtype) -> int:
    """Slab depth for the streaming loops (z planes per DMA/compute step)."""
    _, ny_pad, nx_pad = padded_dims(op, dtype, tz=1)
    plane = ny_pad * nx_pad * jnp.dtype(dtype).itemsize
    tz = max(int((4 << 20) // plane), 1)  # ~4 MB slabs
    return min(tz, op.nz)


def stream_dims(op: StencilOperator, dtype=None):
    """(nzs, ny_pad, nx_pad): z padded to the streaming slab depth."""
    dtype = jnp.dtype(dtype or op.dtype)
    return padded_dims(op, dtype, tz=_stream_tz(op, dtype))


STREAM_VMEM_LIMIT = 119 << 20  # just under the v5e's 128 MiB hardware VMEM


def fits_stream_vmem(
    op: StencilOperator, dtype=None, budget: int = STREAM_VMEM_LIMIT
) -> bool:
    """True when the 2 pinned vectors + DMA slots/stencil-slab temporaries
    (~30 MB) fit the kernel VMEM budget."""
    nzs, ny_pad, nx_pad = stream_dims(op, dtype)
    vec = (nzs + 2) * ny_pad * nx_pad * jnp.dtype(dtype or op.dtype).itemsize
    return 2 * vec + (30 << 20) <= budget


def _stencil_slab(u: jax.Array, nx: int, ny: int, stencil: Stencil) -> jax.Array:
    """A-apply on a (tz+2)-plane halo'd slab -> (tz, ...) output planes.
    The caller guarantees out-of-domain halo planes are zero."""
    tz = u.shape[0] - 2
    if stencil == Stencil.S27:
        xy = _sum3_y(_sum3_x(u, nx), ny)
        s = xy[0:tz] + xy[1 : tz + 1] + xy[2 : tz + 2]
    else:
        c = u[1 : tz + 1]
        s = _sum3_x(c, nx) + _sum3_y(c, ny) - c + u[0:tz] + u[2 : tz + 2]
    return (DIAG_VALUE - OFFDIAG_VALUE) * u[1 : tz + 1] + OFFDIAG_VALUE * s


def _kernel(
    b_hbm,
    x0_hbm,
    x_hbm,
    trace_ref,
    stats_ref,
    r_ref,  # (nzs+2, ny_pad, nx_pad) VMEM: guard plane at each z end
    p_ref,
    xbuf,  # (2, tz, ny_pad, nx_pad) VMEM DMA slots
    sems,  # DMA semaphores (4,): [0:2] loads, [2:4] stores
    *,
    op: StencilOperator,
    tz: int,
    max_iter: int,
    tolerance: float,
):
    dtype = r_ref.dtype
    sdtype = trace_ref.dtype  # >= f32: reductions, recurrence, control scalars
    nx, ny, nz = op.nx, op.ny, op.nz
    nzs = r_ref.shape[0] - 2
    nzb = nzs // tz
    ny_pad, nx_pad = r_ref.shape[1], r_ref.shape[2]
    tol = jnp.asarray(tolerance, sdtype)

    ix = jax.lax.broadcasted_iota(jnp.int32, (1, 1, nx_pad), 2)
    iy = jax.lax.broadcasted_iota(jnp.int32, (1, ny_pad, 1), 1)
    valid_xy = ((ix < nx) & (iy < ny)).astype(dtype)

    def zvalid(k):  # (tz, 1, 1) mask of real planes within slab k
        iz = jax.lax.broadcasted_iota(jnp.int32, (tz, 1, 1), 0) + k * tz
        return (iz < nz).astype(dtype)

    def slab_apply(k):
        """A @ p restricted to slab k, masked to the real domain."""
        u = p_ref[pl.ds(k * tz, tz + 2)]
        return _stencil_slab(u, nx, ny, op.stencil) * (valid_xy * zvalid(k))

    def load(slot, k, src):
        return pltpu.make_async_copy(
            src.at[pl.ds(k * tz, tz)], xbuf.at[slot], sems.at[slot]
        )

    def store(slot, k):
        return pltpu.make_async_copy(
            xbuf.at[slot], x_hbm.at[pl.ds(k * tz, tz)], sems.at[2 + slot]
        )

    trace_ref[:] = jnp.full_like(trace_ref, jnp.nan)

    # --- init: p = x0 (streamed into VMEM); r = b - A p (b streamed) ---
    r_ref[0] = jnp.zeros((ny_pad, nx_pad), dtype)  # guard planes stay zero
    r_ref[nzs + 1] = jnp.zeros((ny_pad, nx_pad), dtype)
    p_ref[0] = jnp.zeros((ny_pad, nx_pad), dtype)
    p_ref[nzs + 1] = jnp.zeros((ny_pad, nx_pad), dtype)

    def init_p(k, _):
        slot = k % 2
        dma = load(slot, k, x0_hbm)
        dma.start()
        dma.wait()
        p_ref[pl.ds(k * tz + 1, tz)] = xbuf[slot] * (valid_xy * zvalid(k))
        return 0

    jax.lax.fori_loop(0, nzb, init_p, 0)

    def init_r(k, acc):
        slot = k % 2
        dma = load(slot, k, b_hbm)
        dma.start()
        dma.wait()
        rv = xbuf[slot] * (valid_xy * zvalid(k)) - slab_apply(k)
        r_ref[pl.ds(k * tz + 1, tz)] = rv
        return acc + jnp.sum(rv * rv, dtype=sdtype)

    rtrans0 = jax.lax.fori_loop(0, nzb, init_r, jnp.asarray(0.0, sdtype))
    trace_ref[0, :] = jnp.full((128,), jnp.sqrt(rtrans0), trace_ref.dtype)

    # x starts as x0; copy it through (x_hbm may alias x0_hbm, but copy
    # anyway so the non-aliased interpret path is correct too)
    def init_x(k, _):
        slot = k % 2
        dma = load(slot, k, x0_hbm)
        dma.start()
        dma.wait()
        st = store(slot, k)
        st.start()
        st.wait()
        return 0

    jax.lax.fori_loop(0, nzb, init_x, 0)

    # carry: (k, rt_last, rr_fresh). rt_last = the rtrans the LAST executed
    # body used (== the normr the reference's loop condition tests,
    # HPCCG.cpp:358,371 — one update older than the freshest residual);
    # rr_fresh = r.r accumulated slab-wise DURING the r update
    # (value-equivalent to a top-of-body recompute — different reduction
    # tree, last-ulp differences — one fewer full VMEM pass + no gating
    # reduction at the iteration head).
    def cond(c):
        k, rt_last, rr_fresh = c
        return jnp.logical_and(k < max_iter, jnp.sqrt(rt_last) > tol)

    def body(c):
        k, rt_prev, rtrans = c
        beta = jnp.where(k == 1, jnp.asarray(0.0, sdtype), rtrans / rt_prev)
        trace_ref[pl.ds(k, 1), :] = jnp.full((1, 128), jnp.sqrt(rtrans), trace_ref.dtype)

        # p = r + beta p (pinned, pure VMEM) — slab-wise so the elementwise
        # temporary stays slab-sized (a whole-vector statement makes Mosaic
        # stack-allocate a full-vector temporary, cf. megakernel slab mode)
        b16 = beta.astype(dtype)

        def upd_p(k2, _):
            sl = pl.ds(k2 * tz + 1, tz)
            p_ref[sl] = r_ref[sl] + b16 * p_ref[sl]
            return 0

        jax.lax.fori_loop(0, nzb, upd_p, 0)

        # pAp: stencil recomputed slab-wise from pinned p
        def pap_slab(k2, acc):
            ap = slab_apply(k2)
            return acc + jnp.sum(
                p_ref[pl.ds(k2 * tz + 1, tz)] * ap, dtype=sdtype
            )

        pap = jax.lax.fori_loop(0, nzb, pap_slab, jnp.asarray(0.0, sdtype))
        alpha = rtrans / pap
        a16 = alpha.astype(dtype)

        # x += alpha p (streamed, double-buffered); r -= alpha A p (pinned,
        # stencil recomputed). The load for slab k+1 is started before the
        # compute of slab k; the store of slab k-2 must drain before its
        # slot is reloaded.
        ld0 = load(0, 0, x_hbm)
        ld0.start()

        def upd_slab(k2, acc):
            slot = k2 % 2
            ap = slab_apply(k2)
            rnew = r_ref[pl.ds(k2 * tz + 1, tz)] - a16 * ap
            r_ref[pl.ds(k2 * tz + 1, tz)] = rnew
            acc = acc + jnp.sum(rnew * rnew, dtype=sdtype)
            load(slot, k2, x_hbm).wait()
            xbuf[slot] = xbuf[slot] + a16 * p_ref[pl.ds(k2 * tz + 1, tz)]
            store(slot, k2).start()

            @pl.when(k2 + 1 < nzb)
            def _():
                # the next load reuses slot (k2+1)%2: its store (slab k2-1)
                # must have drained
                @pl.when(k2 >= 1)
                def _():
                    store((k2 + 1) % 2, k2 - 1).wait()

                load((k2 + 1) % 2, k2 + 1, x_hbm).start()

            return acc

        rr = jax.lax.fori_loop(0, nzb, upd_slab, jnp.asarray(0.0, sdtype))
        # drain the tail stores
        @pl.when(nzb >= 2)
        def _():
            store((nzb - 2) % 2, nzb - 2).wait()

        store((nzb - 1) % 2, nzb - 1).wait()

        return (k + 1, rtrans, rr)

    k0 = jnp.asarray(1, jnp.int32)
    k, rt_last, _ = jax.lax.while_loop(cond, body, (k0, rtrans0, rtrans0))
    # stats in f32-or-better: a bf16 niters slot is inexact past 256
    sdt = stats_ref.dtype
    stats_ref[0, 0] = jnp.sqrt(rt_last).astype(sdt)
    stats_ref[0, 1] = rt_last.astype(sdt)
    stats_ref[0, 2] = (k - 1).astype(sdt)
    stats_ref[0, 3] = jnp.asarray(0.0, sdt)  # spare slot, defined


@partial(jax.jit, static_argnums=(0, 3, 4, 5))
def cg_stream_padded(
    op: StencilOperator,
    b_pad: jax.Array,
    x0_pad: jax.Array,
    max_iter: int,
    tolerance: float = 0.0,
    interpret: bool = False,
):
    """Whole CG solve, one Pallas call, r/p pinned + x streamed.

    b_pad/x0_pad in the (nzs, ny_pad, nx_pad) stream layout (stream_dims).
    Returns (x_pad, trace, stats)."""
    nzs, ny_pad, nx_pad = stream_dims(op, b_pad.dtype)
    dtype = b_pad.dtype
    tz = _stream_tz(op, dtype)
    assert b_pad.shape == (nzs, ny_pad, nx_pad), (b_pad.shape, (nzs, ny_pad, nx_pad))
    interpret = interpret or jax.default_backend() != "tpu"
    if not interpret and jnp.dtype(dtype).itemsize == 8:
        raise ValueError(
            "float64 is not supported by Mosaic TPU kernels; use the XLA "
            "backends (backend='stencil') on TPU, or CPU for f64 parity runs"
        )
    vec = jax.ShapeDtypeStruct((nzs, ny_pad, nx_pad), dtype)
    return pl.pallas_call(
        partial(_kernel, op=op, tz=tz, max_iter=max_iter, tolerance=tolerance),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # b stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # x0 stays in HBM
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),  # x streamed in place
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            vec,
            jax.ShapeDtypeStruct((max(max_iter, 1), 128), jnp.promote_types(dtype, jnp.float32)),
            jax.ShapeDtypeStruct((1, 4), jnp.promote_types(dtype, jnp.float32)),
        ),
        scratch_shapes=[
            pltpu.VMEM((nzs + 2, ny_pad, nx_pad), dtype),  # r (+ guards)
            pltpu.VMEM((nzs + 2, ny_pad, nx_pad), dtype),  # p (+ guards)
            pltpu.VMEM((2, tz, ny_pad, nx_pad), dtype),  # x DMA slots
            pltpu.SemaphoreType.DMA((4,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=STREAM_VMEM_LIMIT, has_side_effects=True
        ),
        interpret=interpret,
    )(b_pad, x0_pad)


def cg_solve_stream(op: StencilOperator, b: jax.Array, x0: jax.Array, *, max_iter: int, tolerance: float = 0.0):
    """Flat-vector wrapper returning a solver.CGResult."""
    from hpccg_tpu.solver import CGResult

    tz = _stream_tz(op, b.dtype)
    x_pad, trace, stats = cg_stream_padded(
        op, pad_plane3(op, b, tz), pad_plane3(op, x0, tz), max_iter, tolerance
    )
    return CGResult(
        x=unpad_plane3(op, x_pad),
        niters=stats[0, 2].astype(jnp.int32),
        normr=stats[0, 0],
        rtrans=stats[0, 1],
        trace=trace[:, 0],
    )
