"""Halo exchange + halo'd stencil matvec (ref exchange_externals.cpp:51-131).

The reference posts MPI_Irecv/MPI_Send per neighbor and packs a gather-list
send buffer before every SpMV. For the z-stacked stencil problem each rank
exchanges exactly its top/bottom nx*ny boundary plane with <=2 neighbors
(SURVEY.md §3.4) — on TPU that is one ``jax.lax.ppermute`` per direction over
the 'z' mesh axis, riding ICI. Non-periodic global boundaries fall out of
ppermute semantics for free: destinations with no source receive zeros, which
is exactly the stencil's boundary clipping.

The reference's comm-plan construction (make_local_matrix.cpp, 611 lines of
index scans and MPI handshakes) dissolves entirely: the halo is static
metadata of the partition, known at trace time.

All functions here run *inside* shard_map over a mesh with axis ``axis_name``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hpccg_tpu.config import DIAG_VALUE, OFFDIAG_VALUE, Stencil
from hpccg_tpu.operators import StencilOperator, _axis_sum3


def exchange_halo(u: jax.Array, axis_name: str = "z"):
    """Exchange boundary z-planes with mesh neighbors.

    u: local grid block (local_nz, ny, nx).
    Returns (below, above): the neighbor planes adjacent to our first/last
    z-plane, zeros at the global domain boundary.
    """
    n = jax.lax.axis_size(axis_name)
    if n == 1:
        zero = jnp.zeros_like(u[0])
        return zero, zero
    # device i's last plane -> device i+1's "below" halo
    below = jax.lax.ppermute(u[-1], axis_name, [(i, i + 1) for i in range(n - 1)])
    # device i's first plane -> device i-1's "above" halo
    above = jax.lax.ppermute(u[0], axis_name, [(i + 1, i) for i in range(n - 1)])
    return below, above


def _neighbor_sum_halo(u: jax.Array, below: jax.Array, above: jax.Array, stencil: Stencil):
    """Boundary-clipped neighbor sum (incl. self) of the *global* field,
    restricted to this shard, given the exchanged halo planes."""
    ue = jnp.concatenate([below[None], u, above[None]], axis=0)
    nz = u.shape[0]
    if stencil == Stencil.S27:
        xy = _axis_sum3(_axis_sum3(ue, 2), 1)
        return xy[0:nz] + xy[1 : nz + 1] + xy[2 : nz + 2]
    # 7-pt: self + x/y face neighbors (local) + z face neighbors (from ue)
    xy_cross = _axis_sum3(u, 2) + _axis_sum3(u, 1) - u
    return xy_cross + ue[0:nz] + ue[2 : nz + 2]


def _neighbor_sum_halo_overlap(u, below, above, stencil: Stencil):
    """Same sum as _neighbor_sum_halo, but grouped so that everything except
    the two boundary planes is independent of the exchanged halos — XLA's
    latency-hiding scheduler can then run the ppermute concurrently with the
    interior compute (the halo/compute overlap of SURVEY.md §7.7, the analog
    of overlapping exchange_externals with interior SpMV)."""
    nz = u.shape[0]
    if stencil == Stencil.S27:
        xy = _axis_sum3(_axis_sum3(u, 2), 1)  # halo-independent
        xy_b = _axis_sum3(_axis_sum3(below[None], 2), 1)
        xy_a = _axis_sum3(_axis_sum3(above[None], 2), 1)
        lo = xy_b[0] + xy[0] + (xy[1] if nz > 1 else xy_a[0])
        if nz == 1:
            return lo[None]
        hi = xy[nz - 2] + xy[nz - 1] + xy_a[0]
        interior = xy[0 : nz - 2] + xy[1 : nz - 1] + xy[2:nz]
        return jnp.concatenate([lo[None], interior, hi[None]], axis=0)
    cross = _axis_sum3(u, 2) + _axis_sum3(u, 1) - u  # halo-independent
    z_lo = jnp.concatenate([below[None], u[:-1]], axis=0)
    z_hi = jnp.concatenate([u[1:], above[None]], axis=0)
    return cross + z_lo + z_hi


def stencil_matvec_halo(
    op: StencilOperator,
    x_local: jax.Array,
    axis_name: str = "z",
    overlap: bool = True,
) -> jax.Array:
    """Distributed A @ x for one z-shard (op holds the *local* dims).

    y = (DIAG-OFFDIAG)*x + OFFDIAG * S(x) with S the halo'd neighbor sum —
    the fused equivalent of exchange_externals + HPC_sparsemv per iteration
    (HPCCG.cpp:377-379). With overlap=True (default) the interior compute
    carries no data dependency on the ppermute.
    """
    u = op.grid(x_local)
    below, above = exchange_halo(u, axis_name)
    if overlap:
        s = _neighbor_sum_halo_overlap(u, below, above, op.stencil)
    else:
        s = _neighbor_sum_halo(u, below, above, op.stencil)
    y = (DIAG_VALUE - OFFDIAG_VALUE) * u + OFFDIAG_VALUE * s
    return y.reshape(-1)


def stencil_matvec_halo_pallas(
    op: StencilOperator,
    u_pad: jax.Array,
    masks: jax.Array,
    axis_name: str = "z",
    donor=None,
) -> jax.Array:
    """Distributed A @ x in the padded-plane layout with the Pallas kernel.

    ppermutes the boundary planes (rows of the (nzp, M) shard; row nz-1 up,
    row 0 down) and feeds them to the kernel's external-halo input. ``donor``
    is a dead buffer the output steals (see spmv_padded).
    """
    from hpccg_tpu.ops.pallas.stencil_kernel import spmv_padded

    n = jax.lax.axis_size(axis_name)
    nz = op.nz
    if n == 1:
        halo = None
    else:
        below = jax.lax.ppermute(
            u_pad[nz - 1], axis_name, [(i, i + 1) for i in range(n - 1)]
        )
        above = jax.lax.ppermute(
            u_pad[0], axis_name, [(i + 1, i) for i in range(n - 1)]
        )
        halo = jnp.stack([below, above])
    return spmv_padded(op, u_pad, masks, halo, donor)


def _halo_planes_v2(op: StencilOperator, u_pad: jax.Array, axis_name: str):
    """ppermute the shard's boundary z-planes (v2 layout): our last real
    plane goes up, our first goes down; None on a single-device mesh (true
    domain boundary -> the kernels substitute zeros)."""
    n = jax.lax.axis_size(axis_name)
    nz = op.nz
    if n == 1:
        return None
    below = jax.lax.ppermute(
        u_pad[nz - 1], axis_name, [(i, i + 1) for i in range(n - 1)]
    )
    above = jax.lax.ppermute(
        u_pad[0], axis_name, [(i + 1, i) for i in range(n - 1)]
    )
    return jnp.stack([below, above])


def stencil_matvec_halo_pallas_v2(
    op: StencilOperator,
    u_pad: jax.Array,
    axis_name: str = "z",
) -> jax.Array:
    """Distributed A @ x in the v2 (nzp, ny_pad, nx_pad) layout.

    Same ppermute pattern: our last real z-plane (u_pad[nz-1], a 2-D
    (ny_pad, nx_pad) plane) goes up, our first plane goes down, and the
    received planes feed the kernel's external-halo input."""
    from hpccg_tpu.ops.pallas.stencil_v2 import spmv_padded_v2

    return spmv_padded_v2(op, u_pad, _halo_planes_v2(op, u_pad, axis_name))


def stencil_matvec_halo_pallas_v2_pap(
    op: StencilOperator,
    u_pad: jax.Array,
    axis_name: str = "z",
):
    """Like stencil_matvec_halo_pallas_v2 but returns (Ap, local p.Ap
    partial) from the fused kernel (caller psums the partial)."""
    from hpccg_tpu.ops.pallas.stencil_v2 import spmv_padded_v2_pap

    return spmv_padded_v2_pap(op, u_pad, _halo_planes_v2(op, u_pad, axis_name))


def _plane_xy_sum(plane: jax.Array, op: StencilOperator) -> jax.Array:
    """The halo plane's contribution to its adjacent boundary plane:
    boundary-clipped xy neighbor sum for 27-pt (the z-neighbor plane
    contributes its full 3x3 xy-neighborhood), identity for 7-pt (face
    neighbor only). plane is (ny_pad, nx_pad) with zero padding."""
    if op.stencil == Stencil.S27:
        u = plane[None]  # _axis_sum3 pads/slices -> exact clipping
        return _axis_sum3(_axis_sum3(u, 2), 1)[0]
    return plane


def stencil_matvec_halo_pallas_v2_overlap(
    op: StencilOperator,
    u_pad: jax.Array,
    axis_name: str = "z",
    with_pap: bool = False,
    dd: bool = False,
):
    """Distributed A @ x with HALO/COMPUTE OVERLAP (the BASELINE requirement:
    ppermute "overlapped with interior SpMV compute").

    The plain pallas path feeds the ppermuted planes into the kernel, making
    the kernel data-dependent on the exchange. Here the kernel runs with a
    ZERO external halo — correct everywhere except the two boundary z-planes
    — while the ppermute carries no dependency on it; the halo lands as two
    tiny plane corrections afterwards (y[0] += OFFDIAG * xy3(below),
    y[nz-1] += OFFDIAG * xy3(above)), so XLA's scheduler is free to run the
    exchange concurrently with the interior kernel.

    with_pap=True also returns the local p.Ap partial (kernel partial +
    boundary-correction terms).

    dd=True routes f64 shards through the double-float (two-f32) kernel
    (round 3); the boundary corrections below are dtype-generic and run in
    XLA f64 — exact double-double plane arithmetic on O(ny*nx) data."""
    from hpccg_tpu.ops.pallas.stencil_v2 import (
        spmv_padded_v2,
        spmv_padded_v2_dd,
        spmv_padded_v2_dd_pap,
        spmv_padded_v2_pap,
    )

    nz = op.nz
    if dd and with_pap:
        y, pap = spmv_padded_v2_dd_pap(op, u_pad, None)
    elif dd:
        y = spmv_padded_v2_dd(op, u_pad, None)
    elif with_pap:
        y, pap = spmv_padded_v2_pap(op, u_pad, None)
    else:
        y = spmv_padded_v2(op, u_pad, None)

    n = jax.lax.axis_size(axis_name)
    if n == 1:
        return (y, pap) if with_pap else y

    below = jax.lax.ppermute(
        u_pad[nz - 1], axis_name, [(i, i + 1) for i in range(n - 1)]
    )
    above = jax.lax.ppermute(
        u_pad[0], axis_name, [(i + 1, i) for i in range(n - 1)]
    )
    # corrections are zero-padded like everything else (the ppermuted planes
    # come from padded arrays, and _plane_xy_sum's clipping keeps pad lanes
    # from leaking into real ones only via real data — mask to be exact)
    ny_pad, nx_pad = u_pad.shape[1], u_pad.shape[2]
    iy = jnp.arange(ny_pad)[:, None] < op.ny
    ix = jnp.arange(nx_pad)[None, :] < op.nx
    valid = (iy & ix).astype(u_pad.dtype)
    corr_lo = OFFDIAG_VALUE * _plane_xy_sum(below, op) * valid
    corr_hi = OFFDIAG_VALUE * _plane_xy_sum(above, op) * valid
    y = y.at[0].add(corr_lo).at[nz - 1].add(corr_hi)
    if with_pap:
        pap = (
            pap
            + jnp.vdot(u_pad[0], corr_lo)
            + jnp.vdot(u_pad[nz - 1], corr_hi)
        )
        return y, pap
    return y
