"""Collective whole-solve CG kernel: the ENTIRE multi-chip solve is one
Pallas call per shard — communication included.

The distributed solvers in parallel/cg.py run the loop under shard_map with
XLA collectives (ppermute halo + psum) between compiled regions; on a real
pod every iteration still pays XLA's collective launch overhead. This kernel
moves the communication *into* the kernel:

- halo exchange: an async remote copy (ICI RDMA) of each shard's boundary
  z-plane directly into the neighbor's VMEM guard plane — the guard planes
  of the pinned vector double as the receive buffers (the tail-of-x storage
  of exchange_externals.cpp:84, TPU-style);
- allreduce: one 2-scalar reduction per iteration (the single-reduction
  Chronopoulos-Gear recurrence, solver.cg_solve_single_reduction) — or,
  with method="cg", TWO one-scalar reductions per iteration implementing
  the reference recurrence exactly (the two MPI_Allreduces of
  HPCCG.cpp:367,381; _cg_whole_solve). On power-of-two meshes (>2) each
  reduction is a recursive-doubling butterfly (log2(ndev) symmetric
  partner exchanges); otherwise each device RDMA-broadcasts its partial
  row to every peer and waits for n-1 receipts.

Synchronization safety: a device's iteration-k+1 halo send happens only
after it passed its iteration-k allreduce — and completing the allreduce
(butterfly or broadcast) transitively requires every peer to have
contributed its k-partial, which each peer sends only after consuming its
k-halo. So single-buffered halo GUARD planes are hazard-free for
neighbors, while everything the allreduce itself touches (accumulation
rows, recursive-doubling landing rows, their receive semaphores) is
double-buffered by iteration parity: non-neighbor devices are not ordered
by the halo, and a fast device's k+1 partial must not land in a slow
peer's k round. The two unseparated init exchanges get their own
semaphore phase.

The second kernel (_kernel_pipelined) is the communication-HIDING variant:
the Ghysels-Vanroose recurrence lets the allreduce RDMAs fly while the
stencil applies, with halo planes in parity double-buffered landing zones.
It keeps the broadcast allreduce deliberately: all n-1 messages hide
behind compute anyway, while recursive doubling's sequential rounds would
re-serialize the wait.

State per shard (all VMEM): x, r, p, s (= A p by recurrence), u (= A r),
each with one guard plane per z end (the pipelined variant carries x, r,
w, p, s, z, q). Fits weak-scaling shard sizes (64^3..100^3 per chip).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hpccg_tpu.config import Stencil
from hpccg_tpu.operators import StencilOperator
from hpccg_tpu.ops.pallas.stencil_v2 import VMEM_LIMIT, check_mosaic_dtype, padded_dims
from hpccg_tpu.ops.pallas.streamkernel import _stencil_slab

LANE = 128

# When True (tests), the CPU interpreter runs with its data-race detector on
# (SURVEY.md §5: the reference has no race tooling; here every multi-device
# kernel path can be checked for read/write races across shards).
DETECT_RACES = False


def _interpret_params(interpret):
    """interpret=True engages a simple interpreter whose cross-device RDMA
    emulation silently drops asymmetric transfers; the full TPU interpreter
    (cross-device shared memory, on-wait DMA semantics, optional race
    detector) requires an explicit InterpretParams."""
    if interpret:
        return pltpu.InterpretParams(
            dma_execution_mode="on_wait", detect_races=DETECT_RACES
        )
    return interpret


def _allreduce_mine_row(g_local, d_local, dtype):
    """(1, LANE) row carrying (gamma, delta) — built with iota selects
    because .at[].set lowers to scatter, which Mosaic cannot lower."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)
    return jnp.where(
        lane == 0, g_local, jnp.where(lane == 1, d_local, 0.0)
    ).astype(dtype)


def _allreduce_bcast(allbuf, all_send, all_recv, my, slot, d):
    """Descriptor for broadcasting my partial row to device d (same row of
    the same parity slot on the destination)."""
    return pltpu.make_async_remote_copy(
        src_ref=allbuf.at[slot, pl.ds(my, 1)],
        dst_ref=allbuf.at[slot, pl.ds(my, 1)],
        send_sem=all_send.at[0],
        recv_sem=all_recv.at[slot],
        device_id=jnp.asarray(d, jnp.int32),
        device_id_type=pltpu.DeviceIdType.LOGICAL,
    )


def _allreduce_start(allbuf, all_send, all_recv, my, ndev, g_local, d_local, slot, dtype):
    """Write my (gamma, delta) row into every peer's parity slot (ndev-1
    RDMAs); peers' arrivals are awaited by _allreduce_finish."""
    allbuf[slot, pl.ds(my, 1)] = _allreduce_mine_row(g_local, d_local, dtype)
    for d in range(ndev):
        @pl.when(my != d)
        def _(d=d):
            _allreduce_bcast(allbuf, all_send, all_recv, my, slot, d).start()


def _allreduce_finish(allbuf, all_send, all_recv, my, ndev, slot):
    """Drain my ndev-1 sends, await ndev-1 arrivals (DMA sems count bytes;
    wait per same-shaped descriptor), and sum the slot's rows."""
    for d in range(ndev):
        @pl.when(my != d)
        def _(d=d):
            desc = _allreduce_bcast(allbuf, all_send, all_recv, my, slot, d)
            desc.wait_send()
            desc.wait_recv()
    tot = jnp.sum(allbuf[slot], axis=0, keepdims=True)
    return tot[0, 0], tot[0, 1]


def _allreduce_rd(rdsrc, rdbuf, rd_send, rd_recv, my, ndev, g_local, d_local, slot, dtype):
    """Recursive-doubling allreduce for power-of-two meshes: log2(ndev)
    rounds of ONE symmetric partner exchange each (vs ndev-1 broadcast
    messages per device). Each round uses its own landing row, and rows are
    parity-double-buffered across iterations like allbuf (round-r reuse at
    k+2 is ordered by the k+1 allreduce, which is a full barrier)."""
    rounds = ndev.bit_length() - 1
    acc = _allreduce_mine_row(g_local, d_local, dtype)
    for r in range(rounds):
        rdsrc[slot, pl.ds(r, 1)] = acc
        partner = jnp.bitwise_xor(my, jnp.asarray(1 << r, my.dtype))
        desc = pltpu.make_async_remote_copy(
            src_ref=rdsrc.at[slot, pl.ds(r, 1)],
            dst_ref=rdbuf.at[slot, pl.ds(r, 1)],
            send_sem=rd_send.at[0],
            recv_sem=rd_recv.at[slot, r],
            device_id=partner,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )
        desc.start()
        desc.wait_send()
        desc.wait_recv()
        acc = acc + rdbuf[slot, pl.ds(r, 1)]
    return acc[0, 0], acc[0, 1]


def fits_collective_vmem(
    op: StencilOperator, dtype=None, budget: int = VMEM_LIMIT
) -> bool:
    """5 pinned guarded vectors + stencil temporaries (~7 vec-equivalents)."""
    nzp, ny_pad, nx_pad = padded_dims(op, dtype or op.dtype, tz=1)
    vec = (nzp + 2) * ny_pad * nx_pad * jnp.dtype(dtype or op.dtype).itemsize
    return 7 * vec <= budget


def _cg1_whole_solve(
    b0,
    x00,
    exchange_and_apply,
    allreduce2,
    dot,
    x_ref,
    r_ref,
    p_ref,
    s_ref,
    u_ref,
    x_out,
    trace_ref,
    stats_ref,
    lo: int,
    sz: int,
    max_iter: int,
    tol,
):
    """The cg1 (Chronopoulos–Gear) whole-solve driver shared by the stencil
    and DIA collective kernels: init residual, the single-allreduce loop
    with parity slots, trace/stats packing. b0/x00 are the (already masked)
    real-row arrays; (lo, sz) is the refs' real-row window; the guard
    planes/rows around it must already be initialized by the caller.

    Faithful-recurrence quirk (same as solver.cg_solve_single_reduction and
    the reference's alpha = 0/0, verify SKILL notes): on EXACT convergence
    (gamma_new == delta == 0) alpha becomes NaN and the lagging stop-check
    runs one more iteration — x turns NaN while normr reports 0. Real
    fixed-work runs never hit it; constant-diagonal toy systems do.
    """
    w = pl.ds(lo, sz)
    trace_ref[:] = jnp.full_like(trace_ref, jnp.nan)
    # --- init (cg1): r = b - A x0; u = A r; (g, d) = allreduce; p=r; s=u ---
    x_ref[w] = x00
    exchange_and_apply(x_ref, u_ref, 0)  # u <- A x0 (scratch use)
    r_ref[w] = b0 - u_ref[w]
    exchange_and_apply(r_ref, u_ref, 1)
    gamma0, delta0 = allreduce2(dot(r_ref, r_ref), dot(r_ref, u_ref), 0)
    trace_ref[0, :] = jnp.full((LANE,), jnp.sqrt(gamma0), trace_ref.dtype)
    # real-row window only: the guards are RDMA targets — a fast peer's
    # NEXT-iteration halo may land there while we copy (the guards' values
    # are never read through p/s, but the access must still be race-free)
    p_ref[w] = r_ref[w]
    s_ref[w] = u_ref[w]
    alpha0 = gamma0 / delta0

    # carry: (k, gamma, alpha, gamma_top) — gamma_top is what a standard-CG
    # body would have computed at its loop top (one update older); the
    # reference's condition and exit normr test that (HPCCG.cpp:358,371)
    def cond(c):
        k, gamma, alpha, gamma_top = c
        return jnp.logical_and(k < max_iter, jnp.sqrt(gamma_top) > tol)

    def body(c):
        k, gamma, alpha, _ = c
        trace_ref[pl.ds(k, 1), :] = jnp.full(
            (1, LANE), jnp.sqrt(gamma), trace_ref.dtype
        )
        x_ref[w] = x_ref[w] + alpha * p_ref[w]
        r_ref[w] = r_ref[w] - alpha * s_ref[w]
        exchange_and_apply(r_ref, u_ref, 1)
        gamma_new, delta = allreduce2(
            dot(r_ref, r_ref),
            dot(r_ref, u_ref),
            jax.lax.rem(k, jnp.asarray(2, k.dtype)),
        )
        beta = gamma_new / gamma
        alpha_new = gamma_new / (delta - beta * gamma_new / alpha)
        p_ref[w] = r_ref[w] + beta * p_ref[w]
        s_ref[w] = u_ref[w] + beta * s_ref[w]
        return (k + 1, gamma_new, alpha_new, gamma)

    k0 = jnp.asarray(1, jnp.int32)
    k, gamma, alpha, gamma_top = jax.lax.while_loop(
        cond, body, (k0, gamma0, alpha0, gamma0)
    )
    x_out[:] = x_ref[w]
    # stats in f32-or-better: a bf16 niters slot is inexact past 256
    sdt = stats_ref.dtype
    stats_ref[0, 0] = jnp.sqrt(gamma_top).astype(sdt)
    stats_ref[0, 1] = gamma_top.astype(sdt)
    stats_ref[0, 2] = (k - 1).astype(sdt)
    stats_ref[0, 3] = jnp.asarray(0.0, sdt)  # spare slot, defined


def _cg_whole_solve(
    b0,
    x00,
    exchange_and_apply,
    allreduce2,
    dot,
    x_ref,
    r_ref,
    p_ref,
    ap_ref,
    x_out,
    trace_ref,
    stats_ref,
    lo: int,
    sz: int,
    max_iter: int,
    tol,
):
    """The REFERENCE recurrence (HPCCG.cpp:358-384) whole-solve driver: TWO
    in-kernel allreduces per iteration — r.r before the p-update, p.Ap after
    the halo'd apply — so `--backend collective --method cg` runs exactly
    the recurrence the reference's two MPI_Allreduces implement
    (HPCCG.cpp:367,381; round-3 VERDICT #3). Shares the stencil/DIA
    exchange_and_apply and allreduce machinery with _cg1_whole_solve; the
    exchanged vector here is p (the reference exchanges p at HPCCG.cpp:377).

    Slot discipline: rounds strictly alternate parity — init r.r at slot 0,
    then every iteration's r.r at slot 1 and p.Ap at slot 0 — so
    consecutive allreduce rounds never share a landing buffer and slot
    reuse two rounds later is ordered by the intervening full barrier
    (the same proof as the module docstring's cg1 argument; the halo guard
    single-buffering also holds: my iteration-k+1 p-send happens after my
    k p.Ap allreduce, which transitively requires every neighbor to have
    consumed its k halo).

    Scalars-only allreduce reuse: each round reduces (value, 0) through the
    2-scalar machinery and keeps the first lane.
    """
    w = pl.ds(lo, sz)
    zero = jnp.asarray(0.0, b0.dtype)
    trace_ref[:] = jnp.full_like(trace_ref, jnp.nan)
    # --- init (ref HPCCG.cpp:347-354): p = x0; Ap = A p; r = b - Ap ---
    x_ref[w] = x00
    p_ref[w] = x00
    exchange_and_apply(p_ref, ap_ref, 0)
    r_ref[w] = b0 - ap_ref[w]
    rtrans0, _ = allreduce2(dot(r_ref, r_ref), zero, 0)
    normr0 = jnp.sqrt(rtrans0)
    trace_ref[0, :] = jnp.full((LANE,), normr0, trace_ref.dtype)

    # carry: (k, rtrans, normr) — cond tests the loop-top normr exactly as
    # the reference's `for k ... while normr > tol` (HPCCG.cpp:358)
    def cond(c):
        k, rtrans, normr = c
        return jnp.logical_and(k < max_iter, normr > tol)

    def body(c):
        k, rtrans_old, _ = c
        # allreduce #1: rtrans = r.r (at k==1 this bit-identically
        # recomputes the init value, like the reference and cg_solve)
        rtrans, _ = allreduce2(dot(r_ref, r_ref), zero, 1)
        beta = jnp.where(k == 1, zero, rtrans / rtrans_old)
        p_ref[w] = r_ref[w] + beta * p_ref[w]
        normr = jnp.sqrt(rtrans)
        trace_ref[pl.ds(k, 1), :] = jnp.full((1, LANE), normr, trace_ref.dtype)
        exchange_and_apply(p_ref, ap_ref, 1)
        # allreduce #2: alpha = rtrans / p.Ap
        pap, _ = allreduce2(dot(p_ref, ap_ref), zero, 0)
        alpha = rtrans / pap
        x_ref[w] = x_ref[w] + alpha * p_ref[w]
        r_ref[w] = r_ref[w] - alpha * ap_ref[w]
        return (k + 1, rtrans, normr)

    k0 = jnp.asarray(1, jnp.int32)
    k, rtrans, normr = jax.lax.while_loop(cond, body, (k0, rtrans0, normr0))
    x_out[:] = x_ref[w]
    sdt = stats_ref.dtype
    stats_ref[0, 0] = normr.astype(sdt)
    stats_ref[0, 1] = rtrans.astype(sdt)
    stats_ref[0, 2] = (k - 1).astype(sdt)
    stats_ref[0, 3] = jnp.asarray(0.0, sdt)  # spare slot, defined


def _kernel(
    b_ref,
    x0_ref,
    x_out,
    trace_ref,
    stats_ref,
    x_ref,
    r_ref,
    p_ref,
    s_ref,
    u_ref,
    allbuf,  # (2, ndev, LANE): [iteration parity, device, scalars] —
    # double-buffered because non-neighbor devices are NOT synchronized by
    # the halo exchange: a fast device's k+1 partial may land while a slow
    # peer is still summing k; parity slots keep the rounds disjoint
    halo_send,  # (2,) DMA sems for boundary-plane sends [down, up]
    halo_recv,  # (2, 2) DMA sems for recvs [phase, from-below/from-above]:
    #   phase 0 = the init x0 exchange, phase 1 = every r exchange. The two
    #   init exchanges are NOT separated by an allreduce, so a fast peer's
    #   r-halo signal could otherwise be consumed as the x0-halo's; all
    #   consecutive r exchanges ARE allreduce-separated (see module doc).
    all_send,  # (1,) DMA sem, accumulates ndev-1 send completions
    all_recv,  # (2,) DMA sems (iteration parity), ndev-1 arrivals each
    rdsrc,  # (2, R, LANE) recursive-doubling send rows [parity, round]
    rdbuf,  # (2, R, LANE) recursive-doubling landing rows
    rd_recv,  # (2, R) DMA sems [parity, round]
    *,
    op: StencilOperator,
    ndev: int,
    axis: str,
    max_iter: int,
    tolerance: float,
    method: str = "cg1",
):
    dtype = b_ref.dtype
    nx, ny, nz = op.nx, op.ny, op.nz
    nzp, ny_pad, nx_pad = b_ref.shape
    tol = jnp.asarray(tolerance, dtype)
    my = jax.lax.axis_index(axis) if ndev > 1 else jnp.asarray(0, jnp.int32)
    # power-of-two meshes (>2) use log2(ndev)-round recursive doubling; the
    # broadcast path covers the rest (and ndev=2, where they coincide)
    use_rd = ndev > 2 and (ndev & (ndev - 1)) == 0

    ix = jax.lax.broadcasted_iota(jnp.int32, (1, 1, nx_pad), 2)
    iy = jax.lax.broadcasted_iota(jnp.int32, (1, ny_pad, 1), 1)
    iz = jax.lax.broadcasted_iota(jnp.int32, (nzp, 1, 1), 0)
    valid = ((ix < nx) & (iy < ny) & (iz < nz)).astype(dtype)

    def _halo_down(v_ref, phase):
        """My first real plane -> below-neighbor's top guard (their row
        nz+1), signalling their halo_recv[phase, 1]."""
        return pltpu.make_async_remote_copy(
            src_ref=v_ref.at[pl.ds(1, 1)],
            dst_ref=v_ref.at[pl.ds(nz + 1, 1)],
            send_sem=halo_send.at[0],
            recv_sem=halo_recv.at[phase, 1],
            device_id=my - 1,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )

    def _halo_up(v_ref, phase):
        """My last real plane -> above-neighbor's bottom guard (their row
        0), signalling their halo_recv[phase, 0]."""
        return pltpu.make_async_remote_copy(
            src_ref=v_ref.at[pl.ds(nz, 1)],
            dst_ref=v_ref.at[pl.ds(0, 1)],
            send_sem=halo_send.at[1],
            recv_sem=halo_recv.at[phase, 0],
            device_id=my + 1,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )

    def exchange_and_apply(v_ref, out_ref, phase):
        """out = A @ v for the GLOBAL operator restricted to this shard:
        RDMA v's boundary planes into the neighbors' guard planes, wait,
        then apply the stencil over the guarded (nzp+2) slab.

        DMA semaphores count bytes, so every wait goes through a copy
        descriptor of the matching shape. Send-existence and
        receive-existence differ at the mesh edges: I send downward iff
        my > 0, but I receive from ABOVE iff my < ndev-1."""
        if ndev > 1:
            @pl.when(my > 0)
            def _():
                _halo_down(v_ref, phase).start()

            @pl.when(my < ndev - 1)
            def _():
                _halo_up(v_ref, phase).start()

            @pl.when(my > 0)
            def _():
                _halo_down(v_ref, phase).wait_send()

            @pl.when(my < ndev - 1)
            def _():
                _halo_up(v_ref, phase).wait_send()

            # arrivals: from above into my row nz+1 (exists iff my < ndev-1),
            # from below into my row 0 (exists iff my > 0)
            @pl.when(my < ndev - 1)
            def _():
                _halo_down(v_ref, phase).wait_recv()

            @pl.when(my > 0)
            def _():
                _halo_up(v_ref, phase).wait_recv()

        out_ref[pl.ds(1, nzp)] = (
            _stencil_slab(v_ref[:], nx, ny, op.stencil) * valid
        )

    def allreduce2(g_local, d_local, slot):
        """One fused 2-scalar allreduce (start + finish back to back)."""
        if ndev == 1:
            return g_local, d_local
        if use_rd:
            return _allreduce_rd(
                rdsrc, rdbuf, all_send, rd_recv, my, ndev,
                g_local, d_local, slot, dtype,
            )
        _allreduce_start(
            allbuf, all_send, all_recv, my, ndev, g_local, d_local, slot, dtype
        )
        return _allreduce_finish(allbuf, all_send, all_recv, my, ndev, slot)

    def dot(a_ref, b2_ref):
        # real rows only: row nz+1 holds the RDMA'd halo plane (nonzero),
        # rows beyond are zero padding
        return jnp.sum(a_ref[pl.ds(1, nz)] * b2_ref[pl.ds(1, nz)])

    # Guard planes: only the rows that STAY zero (true domain boundaries)
    # are zeroed — interior guards are written by RDMA, and the reader's
    # wait_recv orders the write before any read, so no startup barrier is
    # needed. Only the EXCHANGED refs need edge guards (cg1: x then r
    # every iteration; cg: p); u is never exchanged — zero for hygiene
    # (cg1's p/s inherit defined guards via the full r/u copies).
    zero_row = jnp.zeros((1, ny_pad, nx_pad), dtype)
    u_ref[pl.ds(0, 1)] = zero_row
    u_ref[pl.ds(nzp + 1, 1)] = zero_row
    exchanged = (x_ref, r_ref) if method == "cg1" else (p_ref,)
    for ref in exchanged:
        @pl.when(my == 0)
        def _(ref=ref):
            ref[pl.ds(0, 1)] = zero_row

        @pl.when(my == ndev - 1)
        def _(ref=ref):
            ref[pl.ds(nzp + 1, 1)] = zero_row

    driver_args = (
        b_ref[:] * valid,
        x0_ref[:] * valid,
        exchange_and_apply,
        allreduce2,
        dot,
    )
    if method == "cg1":
        _cg1_whole_solve(
            *driver_args,
            x_ref, r_ref, p_ref, s_ref, u_ref,
            x_out, trace_ref, stats_ref,
            1, nzp, max_iter, tol,
        )
    else:
        # reference recurrence: s_ref doubles as Ap; u_ref stays unused
        _cg_whole_solve(
            *driver_args,
            x_ref, r_ref, p_ref, s_ref,
            x_out, trace_ref, stats_ref,
            1, nzp, max_iter, tol,
        )


def cg_collective_padded(
    op_local: StencilOperator,
    b_pad: jax.Array,
    x0_pad: jax.Array,
    *,
    ndev: int,
    axis: str = "z",
    max_iter: int,
    tolerance: float = 0.0,
    interpret: bool = False,
    method: str = "cg1",
):
    """Per-shard whole-solve call; MUST run inside shard_map over `axis`.

    b_pad/x0_pad: this shard's (nzp, ny_pad, nx_pad) padded block (op_local
    holds the local dims). Returns (x_pad, trace, stats).

    method: "cg1" (single in-kernel allreduce per iteration, the fast
    default) or "cg" (the reference recurrence — two in-kernel allreduces,
    HPCCG.cpp:367,381)."""
    if method not in ("cg1", "cg"):
        raise ValueError(f"collective kernel methods: cg1|cg, got {method!r}")
    nzp, ny_pad, nx_pad = padded_dims(op_local, b_pad.dtype, tz=1)
    dtype = b_pad.dtype
    assert b_pad.shape == (nzp, ny_pad, nx_pad)
    interpret = _interpret_params(interpret or jax.default_backend() != "tpu")
    check_mosaic_dtype(interpret, dtype)
    vec = jax.ShapeDtypeStruct((nzp, ny_pad, nx_pad), dtype)
    gvec = pltpu.VMEM((nzp + 2, ny_pad, nx_pad), dtype)
    return pl.pallas_call(
        partial(
            _kernel,
            op=op_local,
            ndev=ndev,
            axis=axis,
            max_iter=max_iter,
            tolerance=tolerance,
            method=method,
        ),
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
            vec,
            jax.ShapeDtypeStruct((max(max_iter, 1), LANE), jnp.promote_types(dtype, jnp.float32)),
            jax.ShapeDtypeStruct((1, 4), jnp.promote_types(dtype, jnp.float32)),
        ),
        scratch_shapes=[
            gvec,  # x
            gvec,  # r
            gvec,  # p
            gvec,  # s = A p
            gvec,  # u = A r
            pltpu.VMEM((2, max(ndev, 1), LANE), dtype),  # allreduce partials
            pltpu.SemaphoreType.DMA((2,)),  # halo sends
            pltpu.SemaphoreType.DMA((2, 2)),  # halo recvs (phase, direction)
            pltpu.SemaphoreType.DMA((1,)),  # allreduce sends
            pltpu.SemaphoreType.DMA((2,)),  # allreduce recvs (parity)
            pltpu.VMEM((2, max(ndev.bit_length() - 1, 1), LANE), dtype),  # rd src
            pltpu.VMEM((2, max(ndev.bit_length() - 1, 1), LANE), dtype),  # rd landing
            pltpu.SemaphoreType.DMA((2, max(ndev.bit_length() - 1, 1))),  # rd recvs
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT,
            has_side_effects=True,
        ),
        interpret=interpret,
    )(b_pad, x0_pad)


# ---------------------------------------------------------------------------
# Communication-hiding variant: pipelined CG (Ghysels-Vanroose) with the
# in-kernel allreduce overlapped by the stencil apply
# ---------------------------------------------------------------------------


def fits_collective_pipelined_vmem(
    op: StencilOperator, dtype=None, budget: int = VMEM_LIMIT
) -> bool:
    """Peak footprint: 7 pinned scratch vectors (x,r,w,p,s,z,q) + the three
    b/x0/x_out I/O buffers + the per-apply concatenated halo'd slab + ~2-3
    slab-sized stencil temporaries -> budget ~13 vector-equivalents."""
    nzp, ny_pad, nx_pad = padded_dims(op, dtype or op.dtype, tz=1)
    vec = nzp * ny_pad * nx_pad * jnp.dtype(dtype or op.dtype).itemsize
    return 13 * vec <= budget


def _kernel_pipelined(
    b_ref,
    x0_ref,
    x_out,
    trace_ref,
    stats_ref,
    x_ref,
    r_ref,
    w_ref,
    p_ref,
    s_ref,
    z_ref,
    q_ref,
    hbuf,  # (5, 2, ny_pad, nx_pad) halo landing zones by phase:
    #   0 = init x0 exchange, 1 = init r, 2 = init w, 3/4 = loop parity.
    #   Separate buffers (NOT in-place guard rows) so a fast peer's NEXT
    #   exchange can never overwrite a slab being read: consecutive loop
    #   exchanges alternate parity, and slot reuse at k+2 is ordered by the
    #   k+1 allreduce wait.
    allbuf,  # (2, ndev, LANE) partials, parity slots (see _kernel)
    halo_send,  # (2,) DMA sems [down, up]
    halo_recv,  # (5, 2) DMA sems [phase, from-below/from-above]
    all_send,  # (1,)
    all_recv,  # (2,) parity
    *,
    op: StencilOperator,
    ndev: int,
    axis: str,
    max_iter: int,
    tolerance: float,
):
    dtype = b_ref.dtype
    nx, ny, nz = op.nx, op.ny, op.nz
    nzp, ny_pad, nx_pad = b_ref.shape
    tol = jnp.asarray(tolerance, dtype)
    my = jax.lax.axis_index(axis) if ndev > 1 else jnp.asarray(0, jnp.int32)

    ix = jax.lax.broadcasted_iota(jnp.int32, (1, 1, nx_pad), 2)
    iy = jax.lax.broadcasted_iota(jnp.int32, (1, ny_pad, 1), 1)
    iz = jax.lax.broadcasted_iota(jnp.int32, (nzp, 1, 1), 0)
    valid = ((ix < nx) & (iy < ny) & (iz < nz)).astype(dtype)

    def _send_down(v_ref, phase):
        # my first real plane -> below-neighbor's "from above" landing row
        return pltpu.make_async_remote_copy(
            src_ref=v_ref.at[pl.ds(0, 1)],
            dst_ref=hbuf.at[phase, pl.ds(1, 1)],
            send_sem=halo_send.at[0],
            recv_sem=halo_recv.at[phase, 1],
            device_id=my - 1,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )

    def _send_up(v_ref, phase):
        # my last real plane -> above-neighbor's "from below" landing row
        return pltpu.make_async_remote_copy(
            src_ref=v_ref.at[pl.ds(nz - 1, 1)],
            dst_ref=hbuf.at[phase, pl.ds(0, 1)],
            send_sem=halo_send.at[1],
            recv_sem=halo_recv.at[phase, 0],
            device_id=my + 1,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )

    def exchange_start(v_ref, phase):
        if ndev == 1:
            return
        # true-boundary landing rows stay zero (zeroed once at kernel start)
        @pl.when(my > 0)
        def _():
            _send_down(v_ref, phase).start()

        @pl.when(my < ndev - 1)
        def _():
            _send_up(v_ref, phase).start()

    def exchange_wait(v_ref, phase):
        if ndev == 1:
            return
        @pl.when(my > 0)
        def _():
            _send_down(v_ref, phase).wait_send()

        @pl.when(my < ndev - 1)
        def _():
            _send_up(v_ref, phase).wait_send()

        @pl.when(my < ndev - 1)
        def _():
            _send_down(v_ref, phase).wait_recv()

        @pl.when(my > 0)
        def _():
            _send_up(v_ref, phase).wait_recv()

    def apply(v_ref, out_ref, phase):
        """out = A @ v using the phase's landing rows as z-halo planes.
        Callers must have completed exchange_wait(v_ref, phase)."""
        u = jnp.concatenate(
            [hbuf[phase, 0:1], v_ref[:], hbuf[phase, 1:2]], axis=0
        )
        out_ref[:] = _stencil_slab(u, nx, ny, op.stencil) * valid

    def dot(a_ref, b2_ref):
        return jnp.sum(a_ref[pl.ds(0, nz)] * b2_ref[pl.ds(0, nz)])

    def allreduce_start(g_local, d_local, slot):
        if ndev == 1:
            return
        _allreduce_start(
            allbuf, all_send, all_recv, my, ndev, g_local, d_local, slot, dtype
        )

    def allreduce_wait(g_local, d_local, slot):
        if ndev == 1:
            return g_local, d_local
        return _allreduce_finish(allbuf, all_send, all_recv, my, ndev, slot)

    trace_ref[:] = jnp.full_like(trace_ref, jnp.nan)
    # Zero ONLY the landing rows that stay zero (true domain boundaries,
    # which no peer ever writes). Blanket-zeroing would race a fast peer's
    # first halo write; every other row is RDMA-written before it is read,
    # ordered by the matching wait_recv.
    zero_row = jnp.zeros((1, ny_pad, nx_pad), dtype)
    for ph in range(5):
        @pl.when(my == 0)
        def _(ph=ph):
            hbuf[ph, pl.ds(0, 1)] = zero_row

        @pl.when(my == ndev - 1)
        def _(ph=ph):
            hbuf[ph, pl.ds(1, 1)] = zero_row

    # --- init (no overlap; the allreduce orders the phases for the loop) ---
    x_ref[:] = x0_ref[:] * valid
    exchange_start(x_ref, 0)
    exchange_wait(x_ref, 0)
    apply(x_ref, q_ref, 0)  # q as scratch: A x0
    r_ref[:] = b_ref[:] * valid - q_ref[:]
    exchange_start(r_ref, 1)
    exchange_wait(r_ref, 1)
    apply(r_ref, w_ref, 1)  # w = A r
    gamma_l, delta_l = dot(r_ref, r_ref), dot(w_ref, r_ref)
    exchange_start(w_ref, 2)
    exchange_wait(w_ref, 2)
    apply(w_ref, q_ref, 2)  # q = A w
    allreduce_start(gamma_l, delta_l, 0)
    gamma0, delta0 = allreduce_wait(gamma_l, delta_l, 0)
    trace_ref[0, :] = jnp.full((LANE,), jnp.sqrt(gamma0), trace_ref.dtype)
    alpha0 = gamma0 / delta0
    p_ref[:] = r_ref[:]
    s_ref[:] = w_ref[:]
    z_ref[:] = q_ref[:]

    # carry: (k, gamma, alpha, gamma_top) — delayed-exit semantics as cg1
    def cond(c):
        k, gamma, alpha, gamma_top = c
        return jnp.logical_and(k < max_iter, jnp.sqrt(gamma_top) > tol)

    def body(c):
        k, gamma, alpha, _ = c
        trace_ref[pl.ds(k, 1), :] = jnp.full((1, LANE), jnp.sqrt(gamma), trace_ref.dtype)
        x_ref[:] = x_ref[:] + alpha * p_ref[:]
        r_ref[:] = r_ref[:] - alpha * s_ref[:]
        w_ref[:] = w_ref[:] - alpha * z_ref[:]
        phase = 3 + jax.lax.rem(k, jnp.asarray(2, k.dtype))
        slot = jax.lax.rem(k, jnp.asarray(2, k.dtype))
        # halo + dots + allreduce all in flight before the stencil:
        exchange_start(w_ref, phase)
        gamma_l, delta_l = dot(r_ref, r_ref), dot(w_ref, r_ref)
        allreduce_start(gamma_l, delta_l, slot)
        exchange_wait(w_ref, phase)
        apply(w_ref, q_ref, phase)  # q = A w — hides the allreduce
        gamma_new, delta = allreduce_wait(gamma_l, delta_l, slot)
        beta = gamma_new / gamma
        alpha_new = gamma_new / (delta - beta * gamma_new / alpha)
        p_ref[:] = r_ref[:] + beta * p_ref[:]
        s_ref[:] = w_ref[:] + beta * s_ref[:]
        z_ref[:] = q_ref[:] + beta * z_ref[:]
        return (k + 1, gamma_new, alpha_new, gamma)

    k0 = jnp.asarray(1, jnp.int32)
    k, gamma, alpha, gamma_top = jax.lax.while_loop(
        cond, body, (k0, gamma0, alpha0, gamma0)
    )
    x_out[:] = x_ref[:]
    # stats in f32-or-better: a bf16 niters slot is inexact past 256
    sdt = stats_ref.dtype
    stats_ref[0, 0] = jnp.sqrt(gamma_top).astype(sdt)
    stats_ref[0, 1] = gamma_top.astype(sdt)
    stats_ref[0, 2] = (k - 1).astype(sdt)
    stats_ref[0, 3] = jnp.asarray(0.0, sdt)  # spare slot, defined


def cg_collective_pipelined_padded(
    op_local: StencilOperator,
    b_pad: jax.Array,
    x0_pad: jax.Array,
    *,
    ndev: int,
    axis: str = "z",
    max_iter: int,
    tolerance: float = 0.0,
    interpret: bool = False,
):
    """Per-shard communication-hiding whole-solve call (pipelined CG); MUST
    run inside shard_map over `axis`. Returns (x_pad, trace, stats)."""
    nzp, ny_pad, nx_pad = padded_dims(op_local, b_pad.dtype, tz=1)
    dtype = b_pad.dtype
    assert b_pad.shape == (nzp, ny_pad, nx_pad)
    interpret = _interpret_params(interpret or jax.default_backend() != "tpu")
    check_mosaic_dtype(interpret, dtype)
    vec = jax.ShapeDtypeStruct((nzp, ny_pad, nx_pad), dtype)
    svec = pltpu.VMEM((nzp, ny_pad, nx_pad), dtype)
    return pl.pallas_call(
        partial(
            _kernel_pipelined,
            op=op_local,
            ndev=ndev,
            axis=axis,
            max_iter=max_iter,
            tolerance=tolerance,
        ),
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
            vec,
            jax.ShapeDtypeStruct((max(max_iter, 1), LANE), jnp.promote_types(dtype, jnp.float32)),
            jax.ShapeDtypeStruct((1, 4), jnp.promote_types(dtype, jnp.float32)),
        ),
        scratch_shapes=[
            svec,  # x
            svec,  # r
            svec,  # w = A r
            svec,  # p
            svec,  # s = A p
            svec,  # z = A s
            svec,  # q = A w
            pltpu.VMEM((5, 2, ny_pad, nx_pad), dtype),  # halo landing zones
            pltpu.VMEM((2, max(ndev, 1), LANE), dtype),  # allreduce partials
            pltpu.SemaphoreType.DMA((2,)),  # halo sends
            pltpu.SemaphoreType.DMA((5, 2)),  # halo recvs (phase, dir)
            pltpu.SemaphoreType.DMA((1,)),  # allreduce sends
            pltpu.SemaphoreType.DMA((2,)),  # allreduce recvs (parity)
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT,
            has_side_effects=True,
        ),
        interpret=interpret,
    )(b_pad, x0_pad)


# ---------------------------------------------------------------------------
# Collective whole-solve kernel for BANDED EXPLICIT matrices (DIA): the
# loaded-matrix analog of _kernel. Rows live as (LANE,)-wide blocks; the
# band's reach beyond each shard is a strip of whole 128-element rows, so
# the halo exchange is an in-kernel RDMA of hbl/hbh guard ROWS (the stencil
# kernel's guard planes, band-sized). The apply is dia_kernel's recipe —
# per static offset one sublane slice + one lane rotate + select — over the
# whole VMEM-resident shard (diagonal data pinned in VMEM too, which is what
# bounds the reach: ndiag * L floats per shard). Same cg1 recurrence,
# allreduce machinery, and parity double-buffering as _kernel; reference
# spec: HPC_sparsemv.cpp:68-87 under exchange_externals.cpp:51-131 with the
# comm plan dissolved into the static band geometry.
# ---------------------------------------------------------------------------


def _dia_guards(offsets: tuple):
    """(glo, ghi, hbl, hbh): guard rows below/above the shard's R real rows,
    and how many of them the neighbor halo actually fills (whole 128-rows).
    glo covers the most negative offset's slice start; ghi the +1 slice row
    of the most positive offset."""
    qmin = min(o // LANE for o in offsets) if offsets else 0
    qmax = max(o // LANE for o in offsets) if offsets else 0
    bw_lo = max(0, -min(offsets)) if offsets else 0
    bw_hi = max(0, max(offsets)) if offsets else 0
    glo = max(0, -qmin)
    ghi = max(1, qmax + 1)
    hbl = -(-bw_lo // LANE)
    hbh = -(-bw_hi // LANE)
    return glo, ghi, hbl, hbh


def fits_collective_dia_vmem(
    offsets, L: int, dtype, budget: int = VMEM_LIMIT, max_iter: int = 512
) -> bool:
    """Everything pinned: the ndiag diagonal rows and b/x0/x_out I/O buffers
    (pallas VMEM inputs/outputs are allocations too), 5 guarded vectors, and
    the (max_iter, LANE) trace output; allreduce rows and stats ride the
    fixed slack."""
    if L % LANE:
        return False
    R = L // LANE
    glo, ghi, _, _ = _dia_guards(tuple(int(o) for o in offsets))
    elems = (
        (len(offsets) + 3) * R * LANE
        + 5 * (glo + R + ghi) * LANE
        + max(max_iter, 1) * LANE
    )
    return elems * jnp.dtype(dtype).itemsize + (4 << 20) <= budget


def _kernel_dia(
    b_ref,
    x0_ref,
    data_ref,  # (ndiag, R, LANE) this shard's diagonal data
    x_out,
    trace_ref,
    stats_ref,
    x_ref,  # (glo + R + ghi, LANE) guarded vectors
    r_ref,
    p_ref,
    s_ref,
    u_ref,
    allbuf,
    halo_send,  # (2,) [down, up]
    halo_recv,  # (2, 2) [phase, from-below/from-above] — phase 0 = the init
    # x0 exchange, phase 1 = every r exchange (same proof as _kernel: all
    # consecutive r exchanges are allreduce-separated)
    all_send,
    all_recv,
    rdsrc,
    rdbuf,
    rd_recv,
    *,
    offsets: tuple,
    ndev: int,
    axis: str,
    max_iter: int,
    tolerance: float,
    method: str = "cg1",
):
    dtype = b_ref.dtype
    R = b_ref.shape[0]
    glo, ghi, hbl, hbh = _dia_guards(offsets)
    tol = jnp.asarray(tolerance, dtype)
    my = jax.lax.axis_index(axis) if ndev > 1 else jnp.asarray(0, jnp.int32)
    use_rd = ndev > 2 and (ndev & (ndev - 1)) == 0
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, LANE), 1)

    def _strip_down(v_ref, phase):
        """My FIRST hbh real rows -> below-neighbor's high guard (the rows
        its positive offsets read past its last real row)."""
        return pltpu.make_async_remote_copy(
            src_ref=v_ref.at[pl.ds(glo, hbh)],
            dst_ref=v_ref.at[pl.ds(glo + R, hbh)],
            send_sem=halo_send.at[0],
            recv_sem=halo_recv.at[phase, 1],
            device_id=my - 1,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )

    def _strip_up(v_ref, phase):
        """My LAST hbl real rows -> above-neighbor's low guard."""
        return pltpu.make_async_remote_copy(
            src_ref=v_ref.at[pl.ds(glo + R - hbl, hbl)],
            dst_ref=v_ref.at[pl.ds(glo - hbl, hbl)],
            send_sem=halo_send.at[1],
            recv_sem=halo_recv.at[phase, 0],
            device_id=my + 1,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )

    def exchange_and_apply(v_ref, out_ref, phase):
        """out[real rows] = (A @ v) for the GLOBAL banded operator restricted
        to this shard: RDMA the band strips into the neighbors' guard rows,
        wait, then unroll the static offsets (dia_kernel's slice+rotate+select
        recipe, whole-shard)."""
        if ndev > 1:
            if hbh:
                @pl.when(my > 0)
                def _():
                    _strip_down(v_ref, phase).start()

            if hbl:
                @pl.when(my < ndev - 1)
                def _():
                    _strip_up(v_ref, phase).start()

            if hbh:
                @pl.when(my > 0)
                def _():
                    _strip_down(v_ref, phase).wait_send()

                @pl.when(my < ndev - 1)
                def _():
                    _strip_down(v_ref, phase).wait_recv()

            if hbl:
                @pl.when(my < ndev - 1)
                def _():
                    _strip_up(v_ref, phase).wait_send()

                @pl.when(my > 0)
                def _():
                    _strip_up(v_ref, phase).wait_recv()

        acc = jnp.zeros((R, LANE), dtype)
        for d, off in enumerate(offsets):
            q, rm = divmod(off, LANE)
            sl = v_ref[pl.ds(glo + q, R + 1)]
            if rm == 0:
                g = sl[0:R]
            else:
                rot = pltpu.roll(sl, jnp.asarray(LANE - rm, jnp.int32), axis=1)
                g = jnp.where(lane < LANE - rm, rot[0:R], rot[1 : R + 1])
            acc = acc + data_ref[d] * g
        out_ref[pl.ds(glo, R)] = acc

    def allreduce2(g_local, d_local, slot):
        if ndev == 1:
            return g_local, d_local
        if use_rd:
            return _allreduce_rd(
                rdsrc, rdbuf, all_send, rd_recv, my, ndev,
                g_local, d_local, slot, dtype,
            )
        _allreduce_start(
            allbuf, all_send, all_recv, my, ndev, g_local, d_local, slot, dtype
        )
        return _allreduce_finish(allbuf, all_send, all_recv, my, ndev, slot)

    def dot(a_ref, b2_ref):
        return jnp.sum(a_ref[pl.ds(glo, R)] * b2_ref[pl.ds(glo, R)])

    # Guard rows: zero everything NO RDMA ever writes, the RDMA landing
    # rows only at the domain edges (zeroing an interior landing row would
    # race a fast neighbor's incoming strip, exactly as in _kernel).
    # glo == hbl by construction (both are ceil(bw_lo/LANE)), so the low
    # side has no never-written remainder; the high side has one row when
    # bw_hi % LANE == 0 (ghi = qmax+1 vs hbh = qmax). Out-of-domain reads
    # multiply zero-padded diagonal data anyway; the zeros keep the values
    # defined. u's guards are never read or RDMA'd — zero for hygiene.
    for ref in (x_ref, r_ref, u_ref, p_ref, s_ref):
        if ghi > hbh:
            ref[pl.ds(glo + R + hbh, ghi - hbh)] = jnp.zeros((ghi - hbh, LANE), dtype)
    # edge guards only on the EXCHANGED refs (cg1: x then r; cg: p) — an
    # interior landing row is RDMA-written before any read
    exchanged = (x_ref, r_ref) if method == "cg1" else (p_ref,)
    for ref in exchanged:
        if hbl:
            @pl.when(my == 0)
            def _(ref=ref):
                ref[pl.ds(glo - hbl, hbl)] = jnp.zeros((hbl, LANE), dtype)

        if hbh:
            @pl.when(my == ndev - 1)
            def _(ref=ref):
                ref[pl.ds(glo + R, hbh)] = jnp.zeros((hbh, LANE), dtype)
    if hbl:
        u_ref[pl.ds(glo - hbl, hbl)] = jnp.zeros((hbl, LANE), dtype)
    if hbh:
        u_ref[pl.ds(glo + R, hbh)] = jnp.zeros((hbh, LANE), dtype)

    driver_args = (
        b_ref[:],
        x0_ref[:],
        exchange_and_apply,
        allreduce2,
        dot,
    )
    if method == "cg1":
        _cg1_whole_solve(
            *driver_args,
            x_ref, r_ref, p_ref, s_ref, u_ref,
            x_out, trace_ref, stats_ref,
            glo, R, max_iter, tol,
        )
    else:
        _cg_whole_solve(
            *driver_args,
            x_ref, r_ref, p_ref, s_ref,
            x_out, trace_ref, stats_ref,
            glo, R, max_iter, tol,
        )


def cg_collective_dia_padded(
    offsets: tuple,
    data3: jax.Array,
    b2: jax.Array,
    x02: jax.Array,
    *,
    ndev: int,
    axis: str = "z",
    max_iter: int,
    tolerance: float = 0.0,
    interpret: bool = False,
    method: str = "cg1",
):
    """Per-shard whole-solve call; MUST run inside shard_map over `axis`.

    data3: this shard's (ndiag, R, LANE) diagonal data (zero-padded outside
    the global band); b2/x02: the shard's (R, LANE) row blocks. Returns
    (x2, trace, stats).

    method: "cg1" (single in-kernel allreduce per iteration) or "cg" (the
    reference recurrence — two in-kernel allreduces per iteration)."""
    if method not in ("cg1", "cg"):
        raise ValueError(f"collective kernel methods: cg1|cg, got {method!r}")
    R, _ = b2.shape
    dtype = b2.dtype
    offsets = tuple(int(o) for o in offsets)
    glo, ghi, _, _ = _dia_guards(offsets)
    interpret = _interpret_params(interpret or jax.default_backend() != "tpu")
    check_mosaic_dtype(interpret, dtype)
    gvec = pltpu.VMEM((glo + R + ghi, LANE), dtype)
    return pl.pallas_call(
        partial(
            _kernel_dia,
            offsets=offsets,
            ndev=ndev,
            axis=axis,
            max_iter=max_iter,
            tolerance=tolerance,
            method=method,
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((R, LANE), dtype),
            jax.ShapeDtypeStruct(
                (max(max_iter, 1), LANE), jnp.promote_types(dtype, jnp.float32)
            ),
            jax.ShapeDtypeStruct((1, 4), jnp.promote_types(dtype, jnp.float32)),
        ),
        scratch_shapes=[
            gvec,  # x
            gvec,  # r
            gvec,  # p
            gvec,  # s = A p
            gvec,  # u = A r
            pltpu.VMEM((2, max(ndev, 1), LANE), dtype),  # allreduce partials
            pltpu.SemaphoreType.DMA((2,)),  # halo sends
            pltpu.SemaphoreType.DMA((2, 2)),  # halo recvs (phase, direction)
            pltpu.SemaphoreType.DMA((1,)),  # allreduce sends
            pltpu.SemaphoreType.DMA((2,)),  # allreduce recvs (parity)
            pltpu.VMEM((2, max(ndev.bit_length() - 1, 1), LANE), dtype),  # rd src
            pltpu.VMEM((2, max(ndev.bit_length() - 1, 1), LANE), dtype),  # rd landing
            pltpu.SemaphoreType.DMA((2, max(ndev.bit_length() - 1, 1))),  # rd recvs
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT,
            has_side_effects=True,
        ),
        interpret=interpret,
    )(b2, x02, data3)
