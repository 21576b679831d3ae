"""One-pass stencil SpMV Pallas kernel, v2 layout (ref HPC_sparsemv.cpp:94-109).

v1 (stencil_kernel.py) flattens each xy-plane onto the lane axis, so the
y-neighbor shift is a circular lane rotation by nx — measured roll-bound at
~150 GB/s effective on v5e for HBM-resident problems. v2 keeps the grid 3-D:

    vector layout (nzp, ny_pad, nx_pad):  z on the leading (grid) dim,
    y on sublanes (ny_pad % 8 == 0), x on lanes (nx_pad % 128 == 0)

so every neighbor access is cheap on the VPU:
  - x: lane roll by +-1 (masked at ix boundaries),
  - y: sublane slice of a zero-padded block (padding rows are zero, and a
       1-row jnp.pad supplies the y=0 halo),
  - z: the 27-pt xy-sum is computed once per plane of a (tz+2)-deep slab and
       combined by plane slices; halo planes come from single-plane neighbor
       blocks (clamped + predicated at the domain edges, exactly v1's trick).

Boundary masks are iota-computed in-kernel (v1 re-read a mask block from HBM
every grid step). HBM traffic is (tz+2)/tz reads + 1 write per element — the
2-pass stencil ideal — times the lane/sublane padding factor
(1.0 for nx in {128, 256, ...}).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hpccg_tpu.config import DIAG_VALUE, OFFDIAG_VALUE, Stencil
from hpccg_tpu.operators import StencilOperator
from hpccg_tpu.ops.pallas.ddmath import i0 as _i0

_Z0 = _i0()  # i32 index-map literal (Mosaic rejects i64 maps under x64)

LANE = 128
SUBLANE = 8
VMEM_LIMIT = 100 << 20


def _round_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


def padded_dims(op: StencilOperator, dtype=None, tz: int | None = None):
    """(nzp, ny_pad, nx_pad) for the v2 layout. The sublane unit doubles for
    16-bit storage (bf16 min tile is (16, 128))."""
    dtype = jnp.dtype(dtype or op.dtype)
    nx_pad = _round_up(op.nx, LANE)
    ny_pad = _round_up(op.ny, SUBLANE * 2 if dtype.itemsize == 2 else SUBLANE)
    # 16-bit storage computes in f32 in-kernel (see _kernel): the live slab
    # temporaries are f32, so the tz budget uses itemsize 4 there too
    tz = tz or _pick_tz(op.nz, ny_pad * nx_pad, max(dtype.itemsize, 4))
    nzp = _round_up(op.nz, tz)
    return nzp, ny_pad, nx_pad


def _pick_tz(nz: int, plane: int, itemsize: int, budget: int = 48 << 20) -> int:
    """Slab depth: ~(4*tz + 16) live plane-buffers (double-buffered mid/out
    blocks + xy-sum temporaries) within the VMEM budget."""
    cap = max((budget // (plane * itemsize) - 16) // 4, 1)
    return max(min(cap, nz), 1)


def pad_plane3(op: StencilOperator, x: jax.Array, tz: int | None = None) -> jax.Array:
    """(n,) flat row-major vector -> (nzp, ny_pad, nx_pad) padded layout."""
    nzp, ny_pad, nx_pad = padded_dims(op, x.dtype, tz)
    u = x.reshape(op.nz, op.ny, op.nx)
    return jnp.pad(
        u, ((0, nzp - op.nz), (0, ny_pad - op.ny), (0, nx_pad - op.nx))
    )


def unpad_plane3(op: StencilOperator, u: jax.Array) -> jax.Array:
    return u[: op.nz, : op.ny, : op.nx].reshape(-1)


def _shift_y(a: jax.Array, d: int) -> jax.Array:
    """s[..., y, :] = a[..., y-d, :], zero-filled (sublane slice of a pad)."""
    ny = a.shape[-2]
    p = jnp.pad(a, ((0, 0),) * (a.ndim - 2) + ((1, 1), (0, 0)))
    return jax.lax.slice_in_dim(p, 1 - d, 1 - d + ny, axis=a.ndim - 2)


def _sum3_x(u: jax.Array, nx: int, force_mask: bool = False) -> jax.Array:
    """u[.., x-1] + u[.., x] + u[.., x+1] with zero beyond [0, nx).

    Callers maintain the invariant that lanes >= nx are zero. When nx <
    nx_pad the circular rolls then clip the boundary for free: position 0
    receives lane nx_pad-1 (a zero pad lane) and position nx-1 receives lane
    nx (zero), so the two boundary-mask multiplies are unnecessary — only
    the *output* pad lanes pick up junk, which the caller's final valid mask
    kills. With nx == nx_pad the wraparound is real data and must be masked.

    force_mask keeps the masked multiplies even when elidable: measured on
    v5e, the whole-solve megakernel schedules ~20% FASTER with them (the
    fused multiply-adds pipeline better than the bare add chain there),
    while the grid-pipelined SpMV kernel is ~12% faster without."""
    nx_pad = u.shape[-1]
    if jnp.dtype(u.dtype).itemsize == 2:
        # Mosaic's rotate handles 32-bit data only ("Rotate with non-32-bit
        # data"); for bf16 shift via a zero lane-pad + unaligned slices.
        # Zero fill at both ends also makes the boundary masks unnecessary:
        # position 0's left neighbor and position nx-1's right neighbor are
        # exact zeros (pad lane or jnp.pad zero), never wraparound data.
        p = jnp.pad(u, ((0, 0),) * (u.ndim - 1) + ((1, 1),))
        left = jax.lax.slice_in_dim(p, 0, nx_pad, axis=u.ndim - 1)
        right = jax.lax.slice_in_dim(p, 2, nx_pad + 2, axis=u.ndim - 1)
        return left + u + right
    # pin the shift to i32: under jax_enable_x64 a Python int traces as an
    # i64 operand, which Mosaic's dynamic_rotate rejects (this bites f32
    # kernels whenever the RUNTIME has x64 on, e.g. iterative refinement)
    left = pltpu.roll(u, jnp.asarray(1, jnp.int32), axis=u.ndim - 1)
    right = pltpu.roll(u, jnp.asarray(nx_pad - 1, jnp.int32), axis=u.ndim - 1)
    if nx < nx_pad and not force_mask:
        return left + u + right
    ix = jax.lax.broadcasted_iota(jnp.int32, (1, 1, nx_pad), 2)
    dtype = u.dtype
    return left * (ix > 0).astype(dtype) + u + right * (ix < nx - 1).astype(dtype)


def _sum3_y(u: jax.Array, ny: int) -> jax.Array:
    """Same along y. Sublane padding rows are zero, but the row *at* ny-1
    needs its +1 neighbor (row ny, a pad row) to be zero — guaranteed by the
    layout invariant — and row 0's -1 neighbor comes from the jnp.pad."""
    del ny
    return _shift_y(u, 1) + u + _shift_y(u, -1)


def _kernel(halo_ref, lo_ref, mid_ref, hi_ref, out_ref, *, tz, nx, ny, nz, stencil):
    i = pl.program_id(0)
    nzb = pl.num_programs(0)
    dtype = mid_ref.dtype
    # 16-bit storage computes in f32 in-kernel: Mosaic's bf16 legalization
    # rejects the halo-concat arithmetic (round-2 PERF.md), and f32 compute
    # also restores the 32-bit lane rotate — loads upcast, the store
    # downcasts, HBM traffic stays 2 B/element (the whole point of bf16 in
    # the bandwidth-bound HBM regime)
    cdt = jnp.float32 if jnp.dtype(dtype).itemsize == 2 else dtype
    ny_pad, nx_pad = mid_ref.shape[-2], mid_ref.shape[-1]

    # z-halo planes: clamped single-plane neighbor blocks, predicated off at
    # the domain edges; external (distributed) halo overrides rows 0 / nz+...
    # bool -> cast, NOT jnp.where(..., 1.0, 0.0): under jax_enable_x64 (any
    # --dtype float64 / refinement process) literal-only branches trace as
    # weak f64 and Mosaic rejects the f64 arith.select
    sel_lo = (i > 0).astype(cdt)
    sel_hi = (i < nzb - 1).astype(cdt)
    u = jnp.concatenate(
        [
            lo_ref[:].astype(cdt) * sel_lo,
            mid_ref[:].astype(cdt),
            hi_ref[:].astype(cdt) * sel_hi,
        ],
        axis=0,
    )

    zrow = jax.lax.broadcasted_iota(jnp.int32, (tz + 2, 1, 1), 0) + i * tz - 1
    # global z of each concatenated plane is zrow; external halo planes sit at
    # z == -1 (below) and z == nz (above). z == nz is either the top block's
    # (clamped, zeroed) hi plane or a zero z-padding plane — both overridden.
    u = jnp.where(zrow == -1, halo_ref[0:1].astype(cdt), u)
    u = jnp.where(zrow == nz, halo_ref[1:2].astype(cdt), u)

    if stencil == Stencil.S27:
        xy = _sum3_y(_sum3_x(u, nx), ny)
        s = xy[0:tz] + xy[1 : tz + 1] + xy[2 : tz + 2]
    else:
        c = u[1 : tz + 1]
        s = _sum3_x(c, nx) + _sum3_y(c, ny) - c + u[0:tz] + u[2 : tz + 2]

    y = (DIAG_VALUE - OFFDIAG_VALUE) * u[1 : tz + 1] + OFFDIAG_VALUE * s

    # zero all padding (lanes past nx, sublanes past ny, z-planes past nz)
    ix = jax.lax.broadcasted_iota(jnp.int32, (1, 1, nx_pad), 2)
    iy = jax.lax.broadcasted_iota(jnp.int32, (1, ny_pad, 1), 1)
    iz = jax.lax.broadcasted_iota(jnp.int32, (tz, 1, 1), 0) + i * tz
    valid = (ix < nx).astype(cdt) * (iy < ny).astype(cdt) * (iz < nz).astype(cdt)
    out_ref[:] = (y * valid).astype(dtype)


def _v2_in_specs(tz: int, nzb: int, ny_pad: int, nx_pad: int):
    """Input BlockSpecs shared by the plain and fused-pAp kernels: external
    halo planes, clamped single-plane z-neighbor blocks, and the mid slab.

    Index-map literals are i32-pinned (ddmath.i0): the dd tier runs these
    specs under jax_enable_x64, where a Python 0 traces as an i64 transform
    return that Mosaic rejects (the dia_kernel hazard)."""
    z = _i0()
    return [
        pl.BlockSpec((2, ny_pad, nx_pad), lambda i: (z, z, z), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (1, ny_pad, nx_pad),
            lambda i: (jnp.maximum(i * tz - 1, 0), z, z),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec((tz, ny_pad, nx_pad), lambda i: (i, z, z), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (1, ny_pad, nx_pad),
            lambda i: (jnp.minimum(i * tz + tz, nzb * tz - 1), z, z),
            memory_space=pltpu.VMEM,
        ),
    ]


def _v2_out_spec(tz: int, ny_pad: int, nx_pad: int):
    z = _i0()
    return pl.BlockSpec(
        (tz, ny_pad, nx_pad), lambda i: (i, z, z), memory_space=pltpu.VMEM
    )


def check_mosaic_dtype(interpret, dtype) -> None:
    """Mosaic has no f64 lowering; fail with guidance instead of deep in
    the compiler (the CLI default dtype is f64)."""
    if not interpret and jnp.dtype(dtype).itemsize == 8:
        raise ValueError(
            "float64 is not supported by Mosaic TPU kernels; use the "
            "double-float tier (backend='pallas_dd', f64-class accuracy at "
            "f32 kernel speed), the XLA backends (backend='stencil'), or "
            "CPU for bit-exact f64 parity runs"
        )


@partial(jax.jit, static_argnums=(0, 3, 4))
def spmv_padded_v2(
    op: StencilOperator,
    u: jax.Array,
    halo=None,
    interpret: bool = False,
    tz: int | None = None,
) -> jax.Array:
    """y = A @ x in the (nzp, ny_pad, nx_pad) layout (the CG fast path).

    ``halo``: optional (2, ny_pad, nx_pad) external boundary planes
    [below, above] for distributed z-shards (what exchange_externals.cpp:84
    would have put at the tail of x). None -> zeros (true domain boundary).

    No donor/aliasing: measured on v5e, ANY extra aliased (or even dead
    ANY-space) operand halves the pipeline's streaming rate — a plain
    fresh-output call runs at the chip's ~330 GB/s ceiling, and XLA reuses
    the dead Ap buffer at its own allocation level anyway.
    """
    nzp, ny_pad, nx_pad = padded_dims(op, u.dtype, tz)
    dtype = u.dtype
    assert u.shape == (nzp, ny_pad, nx_pad), (u.shape, (nzp, ny_pad, nx_pad))
    tz = tz or _pick_tz(op.nz, ny_pad * nx_pad, max(jnp.dtype(dtype).itemsize, 4))
    nzb = nzp // tz
    if halo is None:
        halo = jnp.zeros((2, ny_pad, nx_pad), dtype)
    interpret = interpret or jax.default_backend() != "tpu"
    check_mosaic_dtype(interpret, dtype)

    return pl.pallas_call(
        partial(_kernel, tz=tz, nx=op.nx, ny=op.ny, nz=op.nz, stencil=op.stencil),
        grid=(nzb,),
        in_specs=_v2_in_specs(tz, nzb, ny_pad, nx_pad),
        out_specs=_v2_out_spec(tz, ny_pad, nx_pad),
        out_shape=jax.ShapeDtypeStruct((nzp, ny_pad, nx_pad), dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * op.stencil.value * op.local_nrow,
            bytes_accessed=2 * nzp * ny_pad * nx_pad * dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT,
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(halo, u, u, u)


def _pap_acc_dtype(dtype):
    return jnp.float32 if jnp.dtype(dtype).itemsize == 2 else jnp.dtype(dtype)


def _kernel_pap(halo_ref, lo_ref, mid_ref, hi_ref, out_ref, pap_ref, *, tz, nx, ny, nz, stencil):
    """Stencil kernel + in-flight p.Ap partial: the reduction accumulates in
    SMEM across (sequential) grid steps while the blocks are in VMEM — the
    standalone pAp dot at HBM-resident sizes would re-read both vectors.
    16-bit storage accumulates upcast in an f32 accumulator; wider dtypes
    accumulate at their own precision (f64 interpret parity)."""
    i = pl.program_id(0)
    _kernel(halo_ref, lo_ref, mid_ref, hi_ref, out_ref, tz=tz, nx=nx, ny=ny, nz=nz, stencil=stencil)
    adt = _pap_acc_dtype(mid_ref.dtype)

    @pl.when(i == 0)
    def _():
        pap_ref[0, 0] = jnp.asarray(0.0, adt)

    pap_ref[0, 0] += jnp.sum(mid_ref[:].astype(adt) * out_ref[:].astype(adt))


@partial(jax.jit, static_argnums=(0, 3, 4))
def spmv_padded_v2_pap(
    op: StencilOperator,
    u: jax.Array,
    halo=None,
    interpret: bool = False,
    tz: int | None = None,
):
    """(A @ x, x . (A @ x)) in one pass over the padded layout.

    Same traffic as spmv_padded_v2 but the p.Ap reduction comes for free
    (padding contributes zero: out blocks are valid-masked). The grid must
    run sequentially ("arbitrary") for the SMEM accumulation — measured
    within noise of the parallel-semantics pipeline on v5e."""
    nzp, ny_pad, nx_pad = padded_dims(op, u.dtype, tz)
    dtype = u.dtype
    assert u.shape == (nzp, ny_pad, nx_pad), (u.shape, (nzp, ny_pad, nx_pad))
    tz = tz or _pick_tz(op.nz, ny_pad * nx_pad, max(jnp.dtype(dtype).itemsize, 4))
    nzb = nzp // tz
    if halo is None:
        halo = jnp.zeros((2, ny_pad, nx_pad), dtype)
    interpret = interpret or jax.default_backend() != "tpu"
    check_mosaic_dtype(interpret, dtype)

    y, pap = pl.pallas_call(
        partial(_kernel_pap, tz=tz, nx=op.nx, ny=op.ny, nz=op.nz, stencil=op.stencil),
        grid=(nzb,),
        in_specs=_v2_in_specs(tz, nzb, ny_pad, nx_pad),
        out_specs=(
            _v2_out_spec(tz, ny_pad, nx_pad),
            pl.BlockSpec((1, 1), lambda i: (_Z0, _Z0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nzp, ny_pad, nx_pad), dtype),
            jax.ShapeDtypeStruct((1, 1), _pap_acc_dtype(dtype)),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * (op.stencil.value + 1) * op.local_nrow,
            bytes_accessed=2 * nzp * ny_pad * nx_pad * dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT,
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(halo, u, u, u)
    # scalar dtype follows the vectors (bf16 solves keep a bf16 recurrence,
    # like the non-fused dot path) — the in-kernel accumulation was f32
    return y, pap[0, 0].astype(dtype)


def spmv_stencil_pallas_v2(
    op: StencilOperator, x: jax.Array, interpret: bool = False, tz: int | None = None
) -> jax.Array:
    """y = A @ x for a flat (n,) vector (pads/unpads around the kernel)."""
    u = pad_plane3(op, x, tz)
    return unpad_plane3(op, spmv_padded_v2(op, u, None, interpret, tz))


# ---------------------------------------------------------------------------
# Double-float (two-f32) stencil kernel — the f64 generated-problem path
# ---------------------------------------------------------------------------
# The reference runs everything in f64 (HPC_sparsemv.cpp:68-87, main.cpp's
# double vectors). Mosaic has no f64 lowering, and XLA's TPU f64 is software
# double-double emulation applied to EVERY op of the 27-point sum — an order
# of magnitude off the f32 kernels. Like dia_kernel._kernel_dd, this variant
# carries x as an exact (hi, lo) f32 pair and exploits the stencil's
# structure: the coefficients are the exact small integers 28 = diag-offdiag
# and -1, so
#
#   - the hi-channel neighbor sums run the SAME factored sum3_x/sum3_y/z
#     reduction as the f32 kernel but through error-free TwoSum chains, each
#     add's rounding error captured into a plain-f32 error channel (errors
#     are O(2^-24)-scale: summing THEM naively costs only O(2^-48));
#   - the lo channel is eps-scale, so its 27-sum runs plain f32;
#   - 28*hi splits exactly (split12 h1+h2: 28*h1 and 28*h2 are exact —
#     5-bit coefficient times 12-bit halves), and OFFDIAG = -1 is an exact
#     negation.
#
# Worst-case error per output is O(2^-48 * 27|x|) — f64-class residual
# floors — at f32 VPU speed and 2x f32 HBM traffic (16 B/point vs XLA-f64's
# same traffic but ~10-20 emulated ops per arithmetic op). The CG loop
# around it stays XLA f64 (itself double-double on TPU, and axpy/dot are
# bandwidth-bound so emulation hurts far less there than in the 27-sum).


# error-free transform primitives shared with dia_kernel's dd kernel
from hpccg_tpu.ops.pallas.ddmath import (  # noqa: E402
    split12 as _split12,
    two_prod as _two_prod,
    two_sum as _two_sum_v,
)


def _two_sum3(a, b, c):
    """(s, e): s = fl(a+b+c) via a TwoSum chain, e = the exact rounding
    error of both adds (plain-f32 combined — e is already eps-scale)."""
    s1, e1 = _two_sum_v(a, b)
    s, e2 = _two_sum_v(s1, c)
    return s, e1 + e2


def _xpair(u: jax.Array, nx: int) -> tuple[jax.Array, jax.Array]:
    """(left, right) lane-neighbor shifts with the _sum3_x boundary rules:
    zero pad lanes make masking free when nx < nx_pad (see _sum3_x)."""
    nx_pad = u.shape[-1]
    left = pltpu.roll(u, jnp.asarray(1, jnp.int32), axis=u.ndim - 1)
    right = pltpu.roll(u, jnp.asarray(nx_pad - 1, jnp.int32), axis=u.ndim - 1)
    if nx < nx_pad:
        return left, right
    ix = jax.lax.broadcasted_iota(jnp.int32, (1, 1, nx_pad), 2)
    return (
        left * (ix > 0).astype(u.dtype),
        right * (ix < nx - 1).astype(u.dtype),
    )


def _dd_core(
    halo_ref,
    lohi_ref, midhi_ref, hihi_ref,
    lolo_ref, midlo_ref, hilo_ref,
    *, tz, nx, ny, nz, stencil,
):
    """Grid (nzb,): double-float stencil sweep over (hi, lo) f32 slabs.

    halo_ref is (4, ny_pad, nx_pad): external z-boundary planes
    [below_hi, above_hi, below_lo, above_lo] for distributed shards.
    Returns (yhi, ylo, c_hi, c_lo): the valid-masked output pair and the
    center (p) pair for fused reductions."""
    i = pl.program_id(0)
    nzb = pl.num_programs(0)
    f32 = jnp.float32

    # bool -> f32 cast, NOT jnp.where(..., 1.0, 0.0): under x64 the Python
    # float literals trace as weak f64 and Mosaic rejects the f64 select
    # (found on the dd tier's first chip contact)
    sel_lo = (i > 0).astype(f32)
    sel_hi = (i < nzb - 1).astype(f32)
    zrow = jax.lax.broadcasted_iota(jnp.int32, (tz + 2, 1, 1), 0) + i * tz - 1

    def build(lo_ref, mid_ref, hi_ref, below, above):
        u = jnp.concatenate(
            [lo_ref[:] * sel_lo, mid_ref[:], hi_ref[:] * sel_hi], axis=0
        )
        u = jnp.where(zrow == -1, below, u)
        return jnp.where(zrow == nz, above, u)

    uh = build(lohi_ref, midhi_ref, hihi_ref, halo_ref[0:1], halo_ref[1:2])
    ul = build(lolo_ref, midlo_ref, hilo_ref, halo_ref[2:3], halo_ref[3:4])

    if stencil == Stencil.S27:
        # hi channel: factored 27-sum through TwoSum chains, errors captured
        l, r = _xpair(uh, nx)
        sx, ex = _two_sum3(l, uh, r)
        sy, ey = _two_sum3(_shift_y(sx, 1), sx, _shift_y(sx, -1))
        ey = ey + (_shift_y(ex, 1) + ex + _shift_y(ex, -1))
        S, ez = _two_sum3(sy[0:tz], sy[1 : tz + 1], sy[2 : tz + 2])
        E = ez + (ey[0:tz] + ey[1 : tz + 1] + ey[2 : tz + 2])
        # lo channel: plain f32 (terms are eps-scale)
        ll, rr = _xpair(ul, nx)
        sxl = ll + ul + rr
        syl = _shift_y(sxl, 1) + sxl + _shift_y(sxl, -1)
        SL = syl[0:tz] + syl[1 : tz + 1] + syl[2 : tz + 2]
    else:  # S7: center + 6 face neighbors, chained TwoSums
        ch = uh[1 : tz + 1]
        l, r = _xpair(ch, nx)
        s1, e1 = _two_sum3(l, ch, r)
        s2, e2 = _two_sum3(_shift_y(ch, 1), s1, _shift_y(ch, -1))
        S, e3 = _two_sum3(uh[0:tz], s2, uh[2 : tz + 2])
        E = e1 + e2 + e3
        cl = ul[1 : tz + 1]
        ll, rr = _xpair(cl, nx)
        SL = (
            ll + cl + rr + _shift_y(cl, 1) + _shift_y(cl, -1)
            + ul[0:tz] + ul[2 : tz + 2]
        )

    # y = D*u - (S + E + SL), D = diag - offdiag = 28 exactly.
    # 28*hi via the exact split12 half products; -1 * sums is exact.
    c_hi = uh[1 : tz + 1]
    c_lo = ul[1 : tz + 1]
    D = jnp.asarray(DIAG_VALUE - OFFDIAG_VALUE, f32)
    h1, h2 = _split12(c_hi)
    p1 = D * h1  # exact: 5-bit x 12-bit
    p2 = D * h2  # exact (p2 is up to 2^-12 * |y| — NOT eps-scale, so it
    # joins the TwoSum chain; folding it into the plain tail measured 6e-12)
    t1, k1 = _two_sum_v(p1, -S)
    t2, k2 = _two_sum_v(t1, p2)
    q = ((k1 + k2) + D * c_lo) - (E + SL)
    yhi, ylo = _two_sum_v(t2, q)

    ix = jax.lax.broadcasted_iota(jnp.int32, (1, 1, yhi.shape[-1]), 2)
    iy = jax.lax.broadcasted_iota(jnp.int32, (1, yhi.shape[-2], 1), 1)
    iz = jax.lax.broadcasted_iota(jnp.int32, (tz, 1, 1), 0) + i * tz
    valid = (ix < nx).astype(f32) * (iy < ny).astype(f32) * (iz < nz).astype(f32)
    return yhi * valid, ylo * valid, c_hi, c_lo


def _kernel_dd(
    halo_ref,
    lohi_ref, midhi_ref, hihi_ref,
    lolo_ref, midlo_ref, hilo_ref,
    yhi_ref, ylo_ref,
    *, tz, nx, ny, nz, stencil,
):
    yhi, ylo, _, _ = _dd_core(
        halo_ref, lohi_ref, midhi_ref, hihi_ref, lolo_ref, midlo_ref,
        hilo_ref, tz=tz, nx=nx, ny=ny, nz=nz, stencil=stencil,
    )
    yhi_ref[:] = yhi
    ylo_ref[:] = ylo


def _kernel_dd_pap(
    halo_ref,
    lohi_ref, midhi_ref, hihi_ref,
    lolo_ref, midlo_ref, hilo_ref,
    yhi_ref, ylo_ref, paphi_ref, paplo_ref,
    *, tz, nx, ny, nz, stencil,
):
    """dd sweep + in-flight p.Ap partial at f64-class accuracy.

    The (ny_pad, nx_pad) accumulator PLANE pair persists across (sequential)
    grid steps: per z-plane, TwoProd(p_hi, y_hi) main products join a TwoSum
    chain per lane position (error into the lo plane along with the exact
    product errors and the hi*lo cross terms; p_lo*y_lo is ~2^-48-scale and
    dropped). The caller finishes with one tiny exact f64 plane-sum — no
    second HBM pass over p and Ap, which is the point: the standalone f64
    dot re-reads 16 B/point of the 24 B/point the sweep itself streams."""
    i = pl.program_id(0)
    yhi, ylo, c_hi, c_lo = _dd_core(
        halo_ref, lohi_ref, midhi_ref, hihi_ref, lolo_ref, midlo_ref,
        hilo_ref, tz=tz, nx=nx, ny=ny, nz=nz, stencil=stencil,
    )
    yhi_ref[:] = yhi
    ylo_ref[:] = ylo

    @pl.when(i == 0)
    def _():
        paphi_ref[:] = jnp.zeros_like(paphi_ref)
        paplo_ref[:] = jnp.zeros_like(paplo_ref)

    # y is valid-masked, so padding planes/lanes (and halo-plane values
    # parked in c at z >= nz) contribute exact zeros
    hi2, pe = _two_prod(c_hi, yhi)
    lo2 = pe + (c_hi * ylo + c_lo * yhi)
    # pairwise TwoSum tree over z: log2(tz) vectorized levels (a per-plane
    # Python loop would unroll tz-fold in Mosaic — tall-skinny domains push
    # tz into the hundreds); zero pad planes are exact TwoSum identities
    while hi2.shape[0] > 1:
        half = (hi2.shape[0] + 1) // 2
        if hi2.shape[0] % 2:
            pad = ((0, 1), (0, 0), (0, 0))
            hi2 = jnp.pad(hi2, pad)
            lo2 = jnp.pad(lo2, pad)
        s, e = _two_sum_v(hi2[:half], hi2[half:])
        lo2 = lo2[:half] + lo2[half:] + e
        hi2 = s
    acc, e = _two_sum_v(paphi_ref[:], hi2[0])
    paplo_ref[:] = paplo_ref[:] + (lo2[0] + e)
    paphi_ref[:] = acc


def _split_dd(u: jax.Array):
    """f64 array -> exact (hi, lo) f32 pair."""
    hi = u.astype(jnp.float32)
    lo = (u - hi.astype(u.dtype)).astype(jnp.float32)
    return hi, lo


def _dd_call(op, u, halo, interpret, tz, with_pap):
    """Shared scaffolding for the dd kernels (plain and fused-pAp)."""
    nzp, ny_pad, nx_pad = padded_dims(op, u.dtype, tz)
    assert u.shape == (nzp, ny_pad, nx_pad), (u.shape, (nzp, ny_pad, nx_pad))
    if jnp.dtype(u.dtype).itemsize != 8:
        raise ValueError(
            f"backend='pallas_dd' is the float64 tier (got {jnp.dtype(u.dtype).name}); "
            "f32/bf16 problems ride the plain pallas-v2 kernel (backend='pallas' "
            "or 'auto')"
        )
    assert float(OFFDIAG_VALUE) == -1.0 and float(DIAG_VALUE - OFFDIAG_VALUE) == 28.0
    tz = tz or _pick_tz(op.nz, ny_pad * nx_pad, 8)
    nzb = nzp // tz
    interpret = interpret or jax.default_backend() != "tpu"

    uhi, ulo = _split_dd(u)
    if halo is None:
        halo4 = jnp.zeros((4, ny_pad, nx_pad), jnp.float32)
    else:
        hhi, hlo = _split_dd(halo)
        halo4 = jnp.concatenate([hhi, hlo], axis=0)

    specs_hi = _v2_in_specs(tz, nzb, ny_pad, nx_pad)
    zi = _i0()  # i32 index-map literals: this path ONLY runs under x64
    halo_spec = pl.BlockSpec(
        (4, ny_pad, nx_pad), lambda i: (zi, zi, zi), memory_space=pltpu.VMEM
    )
    # In-kernel compensated pAp requires the compiler to preserve the
    # written f32 rounding. Mosaic does; XLA:CPU's LLVM pipeline runs with
    # fp-contract=fast, which FMA-contracts the p*y products into the
    # TwoSum adds inside a fused loop and silently breaks the error-free
    # transforms (measured ~1e-8 rel; nothing at HLO level — barriers,
    # bitcast round-trips — survives to instruction selection). Interpret
    # mode therefore takes the exact f64 dot outside the kernel instead.
    # (The dd MATVEC is immune: all its products are exact by construction
    # — split12-half and power-of-two coefficients — so contraction
    # cannot change their rounding.)
    kern_pap = with_pap and not interpret
    kern = _kernel_dd_pap if kern_pap else _kernel_dd
    out_specs = [_v2_out_spec(tz, ny_pad, nx_pad)] * 2
    out_shape = [jax.ShapeDtypeStruct((nzp, ny_pad, nx_pad), jnp.float32)] * 2
    if kern_pap:
        # the p.Ap accumulator plane pair: one block revisited every grid
        # step (forces sequential "arbitrary" semantics, like _kernel_pap)
        out_specs += [
            pl.BlockSpec((ny_pad, nx_pad), lambda i: (zi, zi), memory_space=pltpu.VMEM)
        ] * 2
        out_shape += [jax.ShapeDtypeStruct((ny_pad, nx_pad), jnp.float32)] * 2
    outs = pl.pallas_call(
        partial(kern, tz=tz, nx=op.nx, ny=op.ny, nz=op.nz, stencil=op.stencil),
        grid=(nzb,),
        in_specs=[halo_spec] + specs_hi[1:] + specs_hi[1:],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        cost_estimate=pl.CostEstimate(
            flops=(12 + 4 * with_pap) * op.stencil.value * op.local_nrow,
            bytes_accessed=4 * nzp * ny_pad * nx_pad * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT,
            dimension_semantics=("arbitrary",) if kern_pap else ("parallel",),
        ),
        interpret=interpret,
    )(halo4, uhi, uhi, uhi, ulo, ulo, ulo)
    y = outs[0].astype(u.dtype) + outs[1].astype(u.dtype)
    if not with_pap:
        return y
    if not kern_pap:
        # interpret: exact f64 dot (pads are zero in both u and y)
        return y, jnp.vdot(u.reshape(-1), y.reshape(-1))
    # (hi + lo) per lane position is exact in f64; the final plane sum is a
    # tiny O(ny*nx) f64 reduction
    return y, jnp.sum(outs[2].astype(u.dtype) + outs[3].astype(u.dtype))


@partial(jax.jit, static_argnums=(0, 3, 4))
def spmv_padded_v2_dd(
    op: StencilOperator,
    u: jax.Array,
    halo=None,
    interpret: bool = False,
    tz: int | None = None,
) -> jax.Array:
    """f64 y = A @ x in the padded v2 layout via the double-float kernel.

    ``halo``: optional f64 (2, ny_pad, nx_pad) external boundary planes
    [below, above] for distributed z-shards; None -> true domain boundary.
    The split/recombine run as (cheap, bandwidth-bound) XLA-f64 ops; the
    27-sum — where emulation multiplies every op — runs the f32 kernel."""
    return _dd_call(op, u, halo, interpret, tz, with_pap=False)


@partial(jax.jit, static_argnums=(0, 3, 4))
def spmv_padded_v2_dd_pap(
    op: StencilOperator,
    u: jax.Array,
    halo=None,
    interpret: bool = False,
    tz: int | None = None,
):
    """(A @ x, x . (A @ x)) in one dd pass — same traffic as
    spmv_padded_v2_dd, f64-class p.Ap from compensated in-kernel reduction
    (see _kernel_dd_pap)."""
    return _dd_call(op, u, halo, interpret, tz, with_pap=True)
