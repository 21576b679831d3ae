"""One-pass stencil SpMV Pallas kernel (the reference's native-kernel role,
HPC_sparsemv.cpp:94-109).

The reference's native kernel is a per-row gather over explicit CSR — ~12 B of
matrix traffic per nonzero. This kernel exploits the stencil structure: y =
28*x - S(x) where S is the boundary-clipped 3x3x3 (or 7-pt) neighbor sum, so
the HBM traffic is ~one read of x and one write of y (~0.3 B per
nnz-equivalent) instead of the CSR gather stream.

TPU-native layout (Mosaic alignment rules drive all of it):
- each xy-plane is flattened and zero-padded to M = roundup(ny*nx, 128) lanes,
  so every z-slice is lane-aligned; in-plane neighbor shifts are circular lane
  rolls by 1 (x) and nx (y) with precomputed boundary masks;
- z is padded to a multiple of the slab depth TZ (TZ % 8 == 0), so every block
  is sublane-aligned;
- the kernel reads three standard pipelined blocks per grid step: its TZ-plane
  slab plus the 8-plane blocks just below/above (only 1 of the 8 planes is
  used — Pallas clamps out-of-range neighbor indices at the domain edges and
  the contribution is predicated off by program id).

The CG fast path keeps all vectors in this padded layout (padding stays
exactly zero through axpy/dot), so the relayout cost is paid once per solve.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hpccg_tpu.ops.pallas.ddmath import i0 as _i0

_Z0 = _i0()  # i32 index-map literal (Mosaic rejects i64 maps under x64)

from hpccg_tpu.config import DIAG_VALUE, OFFDIAG_VALUE, Stencil
from hpccg_tpu.operators import StencilOperator

LANE = 128
SUBLANE = 8


def plane_width(ny: int, nx: int) -> int:
    return ((ny * nx + LANE - 1) // LANE) * LANE


VMEM_LIMIT = 96 << 20  # raise the default 16 MiB scoped-vmem compiler limit


def _pick_tz(nz: int, m: int, itemsize: int, budget: int = 40 << 20) -> int:
    """Slab depth: multiple of 8, keeping ~(5*tz+36) plane-rows of live VMEM
    (double-buffered in/out blocks + compute temporaries) inside the budget."""
    cap = max((budget // (m * itemsize) - 36) // 5, SUBLANE)
    tz = min((cap // SUBLANE) * SUBLANE, ((nz + SUBLANE - 1) // SUBLANE) * SUBLANE)
    return max(tz, SUBLANE)


def padded_nz(op: StencilOperator, dtype=None) -> int:
    dtype = jnp.dtype(dtype or op.dtype)
    m = plane_width(op.ny, op.nx)
    tz = _pick_tz(op.nz, m, dtype.itemsize)
    return ((op.nz + tz - 1) // tz) * tz


def plane_masks(op: StencilOperator, dtype) -> np.ndarray:
    """(5, M) boundary masks: [x>0, x<nx-1, y>0, y<ny-1, valid]."""
    ny, nx = op.ny, op.nx
    m = plane_width(ny, nx)
    f = np.arange(m)
    ix = f % nx
    iy = f // nx
    valid = f < ny * nx
    return np.stack(
        [
            valid & (ix > 0),
            valid & (ix < nx - 1),
            valid & (iy > 0),
            valid & (iy < ny - 1),
            valid,
        ]
    ).astype(dtype)


def pad_plane(op: StencilOperator, x: jax.Array) -> jax.Array:
    """(n,) flat vector -> (nzp, M) padded layout."""
    nz, pn = op.nz, op.ny * op.nx
    m = plane_width(op.ny, op.nx)
    nzp = padded_nz(op, x.dtype)
    u = x.reshape(nz, pn)
    return jnp.pad(u, ((0, nzp - nz), (0, m - pn)))


def unpad_plane(op: StencilOperator, u: jax.Array) -> jax.Array:
    return u[: op.nz, : op.ny * op.nx].reshape(-1)


def _masked_sum3(v: jax.Array, shift: int, mlo: jax.Array, mhi: jax.Array) -> jax.Array:
    """v[f-shift]*mlo + v[f] + v[f+shift]*mhi via circular lane rolls."""
    m = v.shape[-1]
    lo = pltpu.roll(v, shift, axis=v.ndim - 1) * mlo
    hi = pltpu.roll(v, m - shift, axis=v.ndim - 1) * mhi
    return lo + v + hi


def _stencil_slab(u, masks, tz: int, nx: int, stencil: Stencil):
    """y planes (tz, M) from the halo'd (tz+2, M) slab."""
    xm, xp, ym, yp, valid = (masks[i : i + 1] for i in range(5))
    if stencil == Stencil.S27:
        xy = _masked_sum3(_masked_sum3(u, 1, xm, xp), nx, ym, yp)
        s = xy[0:tz] + xy[1 : tz + 1] + xy[2 : tz + 2]
    else:
        c = u[1 : tz + 1]
        s = (
            _masked_sum3(c, 1, xm, xp)
            + _masked_sum3(c, nx, ym, yp)
            - c
            + u[0:tz]
            + u[2 : tz + 2]
        )
    y = (DIAG_VALUE - OFFDIAG_VALUE) * u[1 : tz + 1] + OFFDIAG_VALUE * s
    return y * valid  # keep the lane padding exactly zero


def _kernel(masks_ref, halo_ref, donor_ref, lo_ref, mid_ref, hi_ref, out_ref, *, tz, nx, nz, stencil):
    del donor_ref  # dead buffer aliased to out (see spmv_padded)
    i = pl.program_id(0)
    nzb = pl.num_programs(0)
    dtype = mid_ref.dtype
    nzp = nzb * tz

    # single halo plane from each 8-plane neighbor block; at the domain edges
    # the (clamped) block is wrong, so its contribution is predicated to zero
    # bool -> cast, NOT jnp.where(..., 1.0, 0.0): literal-only branches
    # trace as weak f64 under jax_enable_x64 and Mosaic rejects f64 selects
    sel_lo = (i > 0).astype(dtype)
    sel_hi = (i < nzb - 1).astype(dtype)
    u = jnp.concatenate(
        [lo_ref[SUBLANE - 1 : SUBLANE] * sel_lo, mid_ref[:], hi_ref[0:1] * sel_hi],
        axis=0,
    )

    # external halo planes (distributed z-shards; zeros single-chip).
    # The below-halo is concat row 0 of block 0; the above-halo replaces the
    # row just past the last real plane — a z-pad row if nz < nzp, else the
    # top block's hi plane (concat row tz+1).
    rows = jax.lax.broadcasted_iota(jnp.int32, (tz + 2, 1), 0)
    is_lo = jnp.logical_and(i == 0, rows == 0)
    hi_ib, hi_row = (nzb - 1, tz + 1) if nz == nzp else (nz // tz, nz % tz + 1)
    is_hi = jnp.logical_and(i == hi_ib, rows == hi_row)
    u = jnp.where(is_lo, halo_ref[0:1], u)
    u = jnp.where(is_hi, halo_ref[1:2], u)

    y = _stencil_slab(u, masks_ref[:], tz, nx, stencil)
    # zero the z-padding planes so padded vectors stay exactly zero there
    zrow = jax.lax.broadcasted_iota(jnp.int32, (tz, 1), 0) + i * tz
    out_ref[:] = y * (zrow < nz).astype(dtype)


@partial(jax.jit, static_argnums=(0, 5))
def spmv_padded(
    op: StencilOperator,
    u: jax.Array,
    masks: jax.Array,
    halo=None,
    donor=None,
    interpret: bool = False,
) -> jax.Array:
    """y = A @ x in the padded (nzp, M) layout (the CG fast path).

    ``halo``: optional (2, M) external boundary planes [below, above] for
    distributed z-shards (the data exchange_externals.cpp would have put at
    the tail of x). None -> zeros (true domain boundary).

    ``donor``: optional dead (nzp, M) buffer the output steals (e.g. the
    previous iteration's Ap). Measured on v5e: an aliased output streams at
    ~700 GB/s HBM vs ~330 GB/s for a freshly allocated one — pass a donor on
    every hot call.
    """
    m = plane_width(op.ny, op.nx)
    dtype = u.dtype
    tz = _pick_tz(op.nz, m, dtype.itemsize)
    nzp = ((op.nz + tz - 1) // tz) * tz
    assert u.shape == (nzp, m), (u.shape, (nzp, m))
    nzb = nzp // tz
    blk = tz // SUBLANE  # neighbor index maps count in 8-plane units
    if halo is None:
        halo = jnp.zeros((2, m), dtype)
    if donor is None:
        donor = jnp.zeros((nzp, m), dtype)
    # Mosaic only targets real TPUs; elsewhere (CPU tests) run interpreted
    interpret = interpret or jax.default_backend() != "tpu"
    from hpccg_tpu.ops.pallas.stencil_v2 import check_mosaic_dtype

    check_mosaic_dtype(interpret, dtype)

    return pl.pallas_call(
        partial(_kernel, tz=tz, nx=op.nx, nz=op.nz, stencil=op.stencil),
        grid=(nzb,),
        in_specs=[
            pl.BlockSpec((5, m), lambda i: (_Z0, _Z0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, m), lambda i: (_Z0, _Z0), memory_space=pltpu.VMEM),
            # dead donor: ANY space -> no block DMA, only the alias matters
            pl.BlockSpec(memory_space=pl.ANY),
            # neighbor blocks, explicitly clamped in range at the edges (the
            # kernel predicates their contribution off there anyway)
            pl.BlockSpec(
                (SUBLANE, m),
                lambda i: (jnp.maximum(i * blk - 1, 0), _Z0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((tz, m), lambda i: (i, _Z0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (SUBLANE, m),
                lambda i: (jnp.minimum(i * blk + blk, nzb * blk - 1), _Z0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec((tz, m), lambda i: (i, _Z0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nzp, m), dtype),
        input_output_aliases={2: 0},
        cost_estimate=pl.CostEstimate(
            flops=2 * op.stencil.value * op.local_nrow,
            bytes_accessed=2 * nzp * m * dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(masks, halo, donor, u, u, u)


def spmv_stencil_pallas(
    op: StencilOperator, x: jax.Array, interpret: bool = False
) -> jax.Array:
    """y = A @ x for a flat (n,) vector (pads/unpads around the kernel).

    For repeated applications (CG), use the padded layout directly via
    pad_plane/spmv_padded to avoid the per-call relayout.
    """
    masks = jnp.asarray(plane_masks(op, x.dtype))
    u = pad_plane(op, x)
    return unpad_plane(op, spmv_padded(op, u, masks, None, None, interpret))
