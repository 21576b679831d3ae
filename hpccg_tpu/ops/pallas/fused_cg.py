"""Fused CG-iteration Pallas kernels.

One reference CG iteration is 6 kernel passes (2 ddot, 3 waxpby, 1 SpMV —
HPCCG.cpp:367-384). Here it is two fused passes in the padded-plane layout:

- K1 (update_p_apply): p' = r + beta*p and Ap' = A@p' in one sweep (the
  stencil consumes p' built on the fly from the r/p slabs, so p' halo planes
  need no extra exchange), accumulating dot(p', Ap') across the grid.
- K2 (update_x_r): x += alpha*p', r -= alpha*Ap', accumulating dot(r', r')
  for the *next* iteration's beta (so no standalone ddot pass exists at all).

Scalar state (alpha/beta/rtrans) stays in SMEM/jit-land; the dots come back
as (1,1) SMEM outputs accumulated over the sequential TPU grid.

HBM traffic per iteration: ~6 array passes + 2 slab-halo refetches, vs ~14
for the unfused chain — and in the VMEM-resident regime (arrays <= a few 10s
of MB) it eliminates four kernel launches and all intermediate
materializations.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hpccg_tpu.ops.pallas.ddmath import i0 as _i0

_Z0 = _i0()  # i32 index-map literal (Mosaic rejects i64 maps under x64)

from hpccg_tpu.config import Stencil
from hpccg_tpu.operators import StencilOperator
from hpccg_tpu.ops.pallas.stencil_kernel import (
    SUBLANE,
    VMEM_LIMIT,
    _stencil_slab,
    plane_width,
)
from hpccg_tpu.ops.pallas.stencil_v2 import check_mosaic_dtype


def _assemble_slab(lo_ref, mid_ref, hi_ref, halo_lo, halo_hi, i, nzb, tz, nz):
    """(tz+2, M) halo'd slab from pipelined blocks + external halo planes
    (same substitution logic as stencil_kernel._kernel)."""
    dtype = mid_ref.dtype
    # bool -> cast, NOT jnp.where(..., 1.0, 0.0): literal-only branches
    # trace as weak f64 under jax_enable_x64 and Mosaic rejects f64 selects
    sel_lo = (i > 0).astype(dtype)
    sel_hi = (i < nzb - 1).astype(dtype)
    u = jnp.concatenate(
        [lo_ref[SUBLANE - 1 : SUBLANE] * sel_lo, mid_ref[:], hi_ref[0:1] * sel_hi],
        axis=0,
    )
    # substitute the external halos by GLOBAL z (exactly stencil_v2._kernel):
    # the z == nz plane can appear in several blocks' views (the hi concat
    # row of the block holding plane nz-1 AND a mid row of the next block
    # when nz < nzp and tz | nz) — a single (block, row) substitution misses
    # one of them and drops the above-halo at interior shards' top planes
    zrow = jax.lax.broadcasted_iota(jnp.int32, (tz + 2, 1), 0) + i * tz - 1
    u = jnp.where(zrow == -1, halo_lo, u)
    u = jnp.where(zrow == nz, halo_hi, u)
    return u


def _k1(
    masks_ref,
    beta_ref,
    halo_ref,  # (4, M): [r_below, r_above, p_below, p_above]
    donor_ref,  # dead buffer aliased to apout (never read)
    r_lo,
    r_mid,
    r_hi,
    p_lo,
    p_mid,
    p_hi,
    pout_ref,
    apout_ref,
    pap_ref,
    *,
    tz,
    nx,
    nz,
    stencil,
):
    del donor_ref
    i = pl.program_id(0)
    nzb = pl.num_programs(0)
    dtype = r_mid.dtype
    beta = beta_ref[0, 0]

    r_slab = _assemble_slab(r_lo, r_mid, r_hi, halo_ref[0:1], halo_ref[1:2], i, nzb, tz, nz)
    p_slab = _assemble_slab(p_lo, p_mid, p_hi, halo_ref[2:3], halo_ref[3:4], i, nzb, tz, nz)
    pp = r_slab + beta * p_slab  # p' on the full halo'd slab

    ap = _stencil_slab(pp, masks_ref[:], tz, nx, stencil)
    zrow = jax.lax.broadcasted_iota(jnp.int32, (tz, 1), 0) + i * tz
    zmask = (zrow < nz).astype(dtype)
    ap = ap * zmask
    pout = pp[1 : tz + 1] * zmask

    pout_ref[:] = pout
    apout_ref[:] = ap

    @pl.when(i == 0)
    def _():
        pap_ref[0, 0] = jnp.zeros((), dtype)

    pap_ref[0, 0] += jnp.sum(pout * ap)


def _k2(alpha_ref, x_ref, r_ref, p_ref, ap_ref, xout_ref, rout_ref, rr_ref):
    i = pl.program_id(0)
    dtype = x_ref.dtype
    alpha = alpha_ref[0, 0]
    xout_ref[:] = x_ref[:] + alpha * p_ref[:]
    rnew = r_ref[:] - alpha * ap_ref[:]
    rout_ref[:] = rnew

    @pl.when(i == 0)
    def _():
        rr_ref[0, 0] = jnp.zeros((), dtype)

    rr_ref[0, 0] += jnp.sum(rnew * rnew)


def _smem_scalar_spec():
    return pl.BlockSpec((1, 1), lambda i: (_Z0, _Z0), memory_space=pltpu.SMEM)


def _pick_tz_divisor(nzp: int, m: int, itemsize: int, budget: int) -> int:
    """Largest multiple of SUBLANE dividing nzp within the VMEM budget.

    The fused kernels must keep the caller's (nzp, M) shape (it is the CG
    carry), so unlike the standalone SpMV they cannot choose their own
    padding — only a block depth that divides it."""
    cap = max((budget // (m * itemsize) - 36) // 7, SUBLANE)
    tz = min((cap // SUBLANE) * SUBLANE, nzp)
    tz = max(tz, SUBLANE)
    while nzp % tz:
        tz -= SUBLANE
    return max(tz, SUBLANE)


@partial(jax.jit, static_argnums=(0, 7))
def fused_update_p_apply(
    op: StencilOperator, r, p, beta, masks, halo=None, donor=None, interpret: bool = False
):
    """(p', Ap', p'.Ap') — one fused pass. r/p/outputs in (nzp, M) layout.
    ``donor``: dead buffer stolen for Ap' (see spmv_padded)."""
    m = plane_width(op.ny, op.nx)
    dtype = r.dtype
    nzp = r.shape[0]
    tz = _pick_tz_divisor(nzp, m, dtype.itemsize, budget=24 << 20)
    nzb = nzp // tz
    blk = tz // SUBLANE
    if halo is None:
        halo = jnp.zeros((4, m), dtype)
    if donor is None:
        donor = jnp.zeros((nzp, m), dtype)
    beta = jnp.asarray(beta, dtype).reshape(1, 1)
    interpret = interpret or jax.default_backend() != "tpu"
    check_mosaic_dtype(interpret, dtype)

    def lo_map(i):
        return (jnp.maximum(i * blk - 1, 0), _i0())

    def hi_map(i):
        return (jnp.minimum(i * blk + blk, nzb * blk - 1), _i0())

    halo_spec = pl.BlockSpec((SUBLANE, m), lo_map, memory_space=pltpu.VMEM)
    halo_spec_hi = pl.BlockSpec((SUBLANE, m), hi_map, memory_space=pltpu.VMEM)
    mid_spec = pl.BlockSpec((tz, m), lambda i: (i, _Z0), memory_space=pltpu.VMEM)

    pout, apout, pap = pl.pallas_call(
        partial(_k1, tz=tz, nx=op.nx, nz=op.nz, stencil=op.stencil),
        grid=(nzb,),
        in_specs=[
            pl.BlockSpec((5, m), lambda i: (_Z0, _Z0), memory_space=pltpu.VMEM),
            _smem_scalar_spec(),
            pl.BlockSpec((4, m), lambda i: (_Z0, _Z0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            halo_spec,
            mid_spec,
            halo_spec_hi,
            halo_spec,
            mid_spec,
            halo_spec_hi,
        ],
        out_specs=(
            mid_spec,
            mid_spec,
            _smem_scalar_spec(),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nzp, m), dtype),
            jax.ShapeDtypeStruct((nzp, m), dtype),
            jax.ShapeDtypeStruct((1, 1), dtype),
        ),
        input_output_aliases={3: 1},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(masks, beta, halo, donor, r, r, r, p, p, p)
    return pout, apout, pap[0, 0]


@partial(jax.jit, static_argnums=(5,))
def fused_update_x_r(x, r, p, ap, alpha, interpret: bool = False):
    """(x', r', r'.r') — one fused elementwise pass over (nzp, M) arrays."""
    nzp, m = x.shape
    dtype = x.dtype
    tz = _pick_tz_divisor(nzp, m, dtype.itemsize, budget=24 << 20)
    nzb = nzp // tz
    alpha = jnp.asarray(alpha, dtype).reshape(1, 1)
    interpret = interpret or jax.default_backend() != "tpu"
    check_mosaic_dtype(interpret, dtype)

    mid_spec = pl.BlockSpec((tz, m), lambda i: (i, _Z0), memory_space=pltpu.VMEM)
    xout, rout, rr = pl.pallas_call(
        _k2,
        grid=(nzb,),
        in_specs=[_smem_scalar_spec(), mid_spec, mid_spec, mid_spec, mid_spec],
        out_specs=(mid_spec, mid_spec, _smem_scalar_spec()),
        out_shape=(
            jax.ShapeDtypeStruct((nzp, m), dtype),
            jax.ShapeDtypeStruct((nzp, m), dtype),
            jax.ShapeDtypeStruct((1, 1), dtype),
        ),
        input_output_aliases={1: 0, 2: 1},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(alpha, x, r, p, ap)
    return xout, rout, rr[0, 0]
