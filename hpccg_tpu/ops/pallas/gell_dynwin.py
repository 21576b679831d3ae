"""Dynamic-window gather-ELL SpMV — the LOW-INFLATION wide-scatter tier.

Round 4's strip-bucketed stack (gell_stack.py) made arbitrary wide-scatter
matrices fast by re-sorting each row's entries into per-strip ELL slots at
strip-STATIC window offsets; its cost is slot inflation — every strip's ELL
width is the global max per-row count within that strip (6.8x at the 100^3
permuted-stencil target). This tier removes most of that inflation by
letting every (tile, slot) carry its OWN x-window base in SMEM: slot w of
tile t gathers from ``xp[pl.ds(woff[t, w], K)]`` — a dynamic, SUB-aligned
K-chunk window — so a slot's window tracks wherever that tile's pending
columns actually are instead of a fixed strip grid.

Slot assignment is a one-pass lockstep GREEDY (prep, host-side NumPy): all
tiles advance together over output slots; slot w's base is the per-tile min
pending chunk (SUB-aligned so the sublane dynamic-slice start is legal) and
every row whose next-smallest column fits [base, base + K) consumes it.
Progress is guaranteed — the row owning the tile minimum always fits — so
W (the slot count) falls out of the loop; each round is O(n) vector ops.
Measured on the permuted-stencil target (exp/dynwin_probe.py, v5e): 64^3
K=16: inflation 2.06x vs the stack's 3.1x, 13.3 vs 4.9 Gnnz/s (2.7x); the
probe's bump-cascade prep (~73 s) is replaced by this greedy (~2 s) at
equal W.

Kernel cost shape: 6 B/slot-element streamed (f32 val + i16 window-local
index, like gell/stack) + one K-chunk dynamic window load and scan per
(tile, slot); the whole padded x stays VMEM-resident (same reach as
gell_kernel, ~24M f32 rows) and the (T, W) offset table lives in SMEM.
f64 rides the double-float variant (spmv_gell_dynwin_dd): exact (hi, lo)
f32 planes + the compensated gather (gell_kernel._kernel_dd's EFT recipe
with dynamic windows).

Reference spec: HPC_sparsemv.cpp:68-87 (any-CSR SpMV at memory speed) —
this tier is the TPU answer for the class where no gather-free
representation (DIA band / 32-chunk gell window) exists even after RCM.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hpccg_tpu.ops.pallas.ddmath import i0 as _i0
from hpccg_tpu.ops.pallas.gell_kernel import (
    LANE,
    RT,
    SUB,
    _cdiv,
    _lane_take,
    _normalize_sorted,
)

DYNWIN_VMEM_LIMIT = 100 << 20
# the per-(tile, slot) window-base table lives in SMEM as one (T, W) i32
# block; the probe validated 55 KB on v5e — this budget is gated and any
# overflow falls back to the strip stack at chooser time
DYNWIN_SMEM_LIMIT = 256 << 10

_LANE_SHIFT = LANE.bit_length() - 1
_SUB_SHIFT = SUB.bit_length() - 1
assert LANE == 1 << _LANE_SHIFT and SUB == 1 << _SUB_SHIFT


def gell_dynwin_supported(
    n: int, xp_chunks: int, W: int, *, K: int, dd: bool = False
) -> bool:
    """True when the VMEM-resident padded x + the double-buffered slot
    blocks (12 B/slot element f32, 20 dd — vals (+lo) f32 + li i16) + the
    SMEM offset table fit the kernel budgets."""
    if W <= 0 or K < SUB:
        # K < SUB cannot represent an entry at offset SUB-1 from its own
        # SUB-aligned base — the greedy would spin without progress
        return False
    if K * LANE > 32767:  # li must fit int16
        return False
    T = _cdiv(max(n, 1), RT)
    xp_bytes = (8 if dd else 4) * xp_chunks * LANE
    blocks = (20 if dd else 12) * W * SUB * LANE
    if T * W * 4 > DYNWIN_SMEM_LIMIT:
        return False
    return xp_bytes + blocks + (4 << 20) <= DYNWIN_VMEM_LIMIT


def _greedy_assign(
    ci_flat, counts, T: int, K: int, max_w: int = 1024, use_native=None
):
    """Lockstep greedy slot assignment.

    ci_flat: per-entry chunk index in the padded x, row-major (each row's
    entries contiguous and column-sorted). counts: entries per row.
    Returns (slot per entry, W, bases (T, W) int64 chunk indices) or None
    past ``max_w`` slots (pathological — the chooser then books the stack).
    Empty rounds carry each finished tile's last base forward so every
    stored base stays inside the tile's own window range (shard windows
    slice tightly around min/max base per shard).

    ``use_native``: None = prefer the csrc pass (hpccg_dynwin_greedy,
    bitwise-equal output — pinned by test_gell_dynwin) with NumPy
    fallback; False forces NumPy; True raises if unavailable."""
    import numpy as np

    assert K >= SUB, f"K={K}: below SUB the greedy cannot make progress"
    n = counts.shape[0]
    npad = T * RT
    nnz = int(counts.sum())
    if nnz == 0:
        return None
    row_starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    if use_native is not False:
        try:
            from hpccg_tpu import native

            out = native.dynwin_greedy(n, T, ci_flat, row_starts, counts, K, max_w)
        except ImportError:
            out = None
        if out is False:
            return None  # > max_w slots: a real answer, not a fallback case
        if out is not None:
            return out
        if use_native is True:
            raise RuntimeError("native dynwin greedy unavailable (csrc not built?)")
    ptr = np.zeros(n, np.int64)
    remaining = counts.astype(np.int64).copy()
    tile_of_row = np.arange(n) // RT
    slot = np.empty(nnz, np.int64)
    bases = []
    INF = np.iinfo(np.int64).max
    active = remaining > 0
    curp = np.full(npad, INF)
    prev_base = np.zeros(T, np.int64)
    while active.any():
        if len(bases) >= max_w:
            return None
        idx_r = np.minimum(row_starts + ptr, nnz - 1)
        cur = np.where(active, ci_flat[idx_r], INF)
        curp[:n] = cur
        tmin = curp.reshape(T, RT).min(axis=1)
        aligned = (tmin >> _SUB_SHIFT) << _SUB_SHIFT
        base = np.where(tmin == INF, prev_base, aligned)
        prev_base = base
        fit = active & (cur < base[tile_of_row] + K)
        slot[row_starts[fit] + ptr[fit]] = len(bases)
        ptr[fit] += 1
        remaining[fit] -= 1
        active = remaining > 0
        bases.append(base)
    return slot, len(bases), np.stack(bases, axis=1)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["vals4", "li4", "woff", "vals4lo"],
    meta_fields=["n", "W", "K", "pbl", "xp_chunks", "total_nrow", "nnz_count"],
)
@dataclasses.dataclass(frozen=True)
class GellDynwinMatrix:
    """Prepared dynamic-window gather-ELL operator.

    vals4/li4: (T, W, 8, 128) slot planes; li4 is the window-LOCAL element
    index (pos - woff[t, w]*LANE, in [0, K*LANE)). Empty slots carry val=0
    with li parked at 0 (the window base — always in bounds).
    woff: (T, W) int32 per-(tile, slot) window base CHUNK into the padded
    x, SUB-aligned (the kernel's SMEM table).
    vals4lo (f64 matrices only): exact f32 low halves for the dd kernel.
    """

    vals4: jax.Array  # f32 (hi halves for f64 matrices)
    li4: jax.Array  # i16
    woff: jax.Array  # i32 (T, W)
    n: int
    W: int
    K: int
    pbl: int  # x zero-padding (elements) before row 0
    xp_chunks: int
    total_nrow: int
    nnz_count: int
    vals4lo: jax.Array | None = None

    @property
    def local_nrow(self) -> int:
        return self.n

    @property
    def dtype(self):
        return jnp.dtype("float64") if self.vals4lo is not None else self.vals4.dtype

    @property
    def nnz(self) -> int:
        return self.nnz_count

    def matvec(self, x: jax.Array) -> jax.Array:
        if self.vals4lo is not None:
            return spmv_gell_dynwin_dd(self, x)
        return spmv_gell_dynwin(self, x)

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.matvec(x)

    def to_coo(self):
        """(rows, cols, vals) of stored nonzeros, row-major (zero-valued
        slots — padding — are dropped, like DIA/gell/stack)."""
        import numpy as np

        T = self.vals4.shape[0]
        vals = np.asarray(self.vals4).transpose(0, 2, 3, 1).reshape(T * RT, -1)
        if self.vals4lo is not None:
            vals = vals.astype(np.float64) + np.asarray(
                self.vals4lo, np.float64
            ).transpose(0, 2, 3, 1).reshape(T * RT, -1)
        li = np.asarray(self.li4).transpose(0, 2, 3, 1).reshape(T * RT, -1)
        # col = li + woff[t, w]*LANE - pbl
        wb = (
            np.asarray(self.woff, np.int64)[:, None, None, :]
            .repeat(SUB, 1)
            .repeat(LANE, 2)
            .reshape(T * RT, -1)
        )
        rows2 = np.arange(T * RT)[:, None]
        cols = li.astype(np.int64) + wb * LANE - self.pbl
        keep = (vals != 0) & (rows2 < self.n)
        rr = np.broadcast_to(rows2, vals.shape)[keep]
        order = np.argsort(rr, kind="stable")
        return rr[order], cols[keep][order], vals[keep][order]


def prepare_gell_dynwin(
    ell, *, K: int = 16, max_w: int = 1024, use_native=None, _assign=None
) -> GellDynwinMatrix:
    """Host-side preprocessing of an EllMatrix into dynamic-window form.

    f64 matrices split into exact (hi, lo) f32 planes for the compensated
    kernel. Raises ValueError when the greedy assignment exceeds ``max_w``
    slots or the VMEM/SMEM budgets (gell_dynwin_supported) — callers
    (auto_structure) fall back to the strip stack. ``use_native`` as in
    :func:`_greedy_assign` (the greedy dominates prep cost; the csrc pass
    is bitwise-equal). ``_assign``: a (slot, W, bases) tuple from a prior
    :func:`dynwin_cost_model` run on the SAME matrix and K — skips
    re-running the greedy (auto_structure passes its model's run through;
    the assignment is a pure function of (sorted cols, K))."""
    import numpy as np

    if ell.start_row != 0:
        raise ValueError("prepare_gell_dynwin needs the assembled matrix")
    if K < SUB or K * LANE > 32767:
        # below SUB the greedy cannot make progress (an entry at offset
        # SUB-1 from its own SUB-aligned base never fits); above, the
        # window-local index overflows int16
        raise ValueError(
            f"K={K} outside the representable window range "
            f"[{SUB}, {32767 // LANE}] chunks"
        )
    n, dd, vdt, vals, cols, valid, width, bw_lo, bw_hi = _normalize_sorted(ell)
    pbl = _cdiv(bw_lo, LANE) * LANE
    T = _cdiv(n, RT)

    sel = valid
    row_flat = np.nonzero(sel)[0]
    pos = (cols[sel] + pbl).astype(np.int64)
    ci = pos >> _LANE_SHIFT
    counts = sel.sum(axis=1)
    out = (
        _assign
        if _assign is not None
        else _greedy_assign(ci, counts, T, K, max_w=max_w, use_native=use_native)
    )
    if out is None:
        raise ValueError(
            f"dynwin greedy assignment exceeded {max_w} slots at K={K} "
            "(pathological scatter); use the strip stack"
        )
    slot, W, bases = out
    t_i = row_flat // RT
    li = pos - bases[t_i, slot] * LANE
    assert li.min() >= 0 and li.max() < K * LANE

    xp_chunks = max(int(bases.max()) + K, _cdiv(pbl + n, LANE))
    if not gell_dynwin_supported(n, xp_chunks, W, K=K, dd=dd):
        raise ValueError(
            f"{n} rows x {W} dynwin slots (K={K}): the VMEM-resident x / "
            "slot blocks or the SMEM offset table exceed the kernel budget "
            "(gell_dynwin_supported)"
        )

    lp4 = np.zeros((T, W, SUB, LANE), np.int16)
    filled = False
    if use_native is not False:
        # native scatter (bitwise-equal to the fancy-index path below —
        # pinned by test_native_greedy_equals_numpy_greedy)
        try:
            from hpccg_tpu import native as _native
        except ImportError:
            _native = None
        if _native is not None:
            row_starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
            vhi = np.zeros((T, W, SUB, LANE), np.float32)
            vlo = np.zeros((T, W, SUB, LANE), np.float32) if dd else None
            filled = _native.dynwin_fill(
                n, vals[sel], pos, row_starts, counts, slot, bases, W, K,
                dd, vhi, vlo, lp4,
            )
    if filled:
        vals4 = jnp.asarray(vhi)
        vals4lo = jnp.asarray(vlo) if dd else None
    else:
        vp4 = np.zeros((T, W, SUB, LANE), vdt)
        r = row_flat % RT
        s_i = r // LANE
        l_i = r % LANE
        vp4[t_i, slot, s_i, l_i] = vals[sel]
        lp4[t_i, slot, s_i, l_i] = li.astype(np.int16)
        if dd:
            vhi = vp4.astype(np.float32)
            vlo = (vp4 - vhi.astype(np.float64)).astype(np.float32)
            vals4, vals4lo = jnp.asarray(vhi), jnp.asarray(vlo)
        else:
            vals4, vals4lo = jnp.asarray(vp4), None
    return GellDynwinMatrix(
        vals4=vals4,
        vals4lo=vals4lo,
        li4=jnp.asarray(lp4),
        woff=jnp.asarray(bases.astype(np.int32)),
        n=n,
        W=W,
        K=K,
        pbl=pbl,
        xp_chunks=int(xp_chunks),
        total_nrow=ell.total_nrow or n,
        nnz_count=int(ell.nnz),
    )


def _kernel_dynwin(woff_ref, xp_ref, vals_ref, li_ref, y_ref, *, W: int, K: int):
    t = pl.program_id(0)
    acc = jnp.zeros((SUB, LANE), xp_ref.dtype)
    for w in range(W):
        xw = xp_ref[pl.ds(woff_ref[t, w], K)]  # (K, 128) at a dynamic base
        li = li_ref[0, w].astype(jnp.int32)
        ll = jnp.bitwise_and(li, LANE - 1)
        ci = jnp.right_shift(li, _LANE_SHIFT)
        g = jnp.zeros((SUB, LANE), xp_ref.dtype)
        for k in range(K):
            chunk = jnp.broadcast_to(xw[k : k + 1], (SUB, LANE))
            g = jnp.where(ci == k, _lane_take(chunk, ll), g)
        acc = acc + vals_ref[0, w] * g
    y_ref[0] = acc


@partial(jax.jit, static_argnums=(4, 5))
def _spmv_dynwin(vals4, li4, woff, xp2, K: int, interpret: bool):
    T, W = vals4.shape[0], vals4.shape[1]
    z = _i0()  # i32-pinned index-map literals (the Mosaic-under-x64 hazard)
    return pl.pallas_call(
        partial(_kernel_dynwin, W=W, K=K),
        grid=(T,),
        in_specs=[
            # whole offset table in SMEM (a (1, W) block fails Mosaic's
            # block-shape divisibility check); the kernel indexes it by
            # program_id — gell_dynwin_supported gates its size
            pl.BlockSpec((T, W), lambda t: (z, z), memory_space=pltpu.SMEM),
            pl.BlockSpec(xp2.shape, lambda t: (z, z), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W, SUB, LANE), lambda t: (t, z, z, z)),
            pl.BlockSpec((1, W, SUB, LANE), lambda t: (t, z, z, z)),
        ],
        out_specs=pl.BlockSpec((1, SUB, LANE), lambda t: (t, z, z)),
        out_shape=jax.ShapeDtypeStruct((T, SUB, LANE), vals4.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=DYNWIN_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(woff, xp2, vals4, li4)


def spmv_gell_dynwin(
    A: GellDynwinMatrix, x: jax.Array, *, interpret: bool | None = None
) -> jax.Array:
    """y = A @ x in ONE pallas call: per (tile, slot), a K-chunk x window is
    loaded at that slot's SMEM base and chunk-scanned with the vreg-local
    lane gather."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    assert A.vals4lo is None, "f64 GellDynwinMatrix: use spmv_gell_dynwin_dd"
    xp = jnp.zeros((A.xp_chunks * LANE,), jnp.float32)
    xp = jax.lax.dynamic_update_slice(xp, x.astype(jnp.float32), (A.pbl,))
    y = _spmv_dynwin(A.vals4, A.li4, A.woff, xp.reshape(-1, LANE), A.K, interpret)
    return y.reshape(-1)[: A.n]


def _kernel_dynwin_dd(
    woff_ref, xph_ref, xpl_ref, valsh_ref, valsl_ref, li_ref, yhi_ref, ylo_ref,
    *, W: int, K: int,
):
    """Double-float dynamic-window tile: gell_kernel._kernel_dd's
    compensated accumulation (every product feeding the accumulators exact
    by split12 construction) with per-(tile, slot) dynamic windows."""
    from hpccg_tpu.ops.pallas.ddmath import (
        df_add, fast_two_sum, split12, two_sum,
    )

    t = pl.program_id(0)
    f32 = jnp.float32
    sh = jnp.zeros((SUB, LANE), f32)  # main double-f32 accumulator
    sl = jnp.zeros((SUB, LANE), f32)
    th = jnp.zeros((SUB, LANE), f32)  # eps-scale terms accumulator
    tl = jnp.zeros((SUB, LANE), f32)
    for w in range(W):
        base = woff_ref[t, w]
        xwh = xph_ref[pl.ds(base, K)]  # (K, 128) hi window
        xwl = xpl_ref[pl.ds(base, K)]  # (K, 128) lo window
        li = li_ref[0, w].astype(jnp.int32)
        ll = jnp.bitwise_and(li, LANE - 1)
        ci = jnp.right_shift(li, _LANE_SHIFT)
        gh = jnp.zeros((SUB, LANE), f32)
        gl = jnp.zeros((SUB, LANE), f32)
        for k in range(K):
            ch = jnp.broadcast_to(xwh[k : k + 1], (SUB, LANE))
            cl = jnp.broadcast_to(xwl[k : k + 1], (SUB, LANE))
            sel = ci == k
            gh = jnp.where(sel, _lane_take(ch, ll), gh)
            gl = jnp.where(sel, _lane_take(cl, ll), gl)
        ah = valsh_ref[0, w]
        al = valsl_ref[0, w]
        a1, a2 = split12(ah)
        x1, x2 = split12(gh)
        p1 = a1 * x1  # exact (12b x 12b)
        v, verr = two_sum(a1 * x2, a2 * x1)  # exact products
        u = (a2 * x2 + ah * gl) + al * gh  # O(2^-24) terms
        sh, sl = df_add(sh, sl, p1)
        sh, sl = df_add(sh, sl, v)
        th, tl = df_add(th, tl, verr + u)
        sh, sl = fast_two_sum(sh, sl)  # renorm once per slot
    s, e = two_sum(sh, th)
    lo = (sl + tl) + e
    hi, lo2 = fast_two_sum(s, lo)
    yhi_ref[0] = hi
    ylo_ref[0] = lo2


@partial(jax.jit, static_argnums=(6, 7))
def _spmv_dynwin_dd(vals4, vals4lo, li4, woff, xp2h, xp2l, K: int, interpret: bool):
    T, W = vals4.shape[0], vals4.shape[1]
    # this kernel ONLY runs under jax_enable_x64 (the f64 tier): index-map
    # literals must be i32-pinned or Mosaic rejects the lowering
    z = _i0()
    xshape = xp2h.shape
    return pl.pallas_call(
        partial(_kernel_dynwin_dd, W=W, K=K),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((T, W), lambda t: (z, z), memory_space=pltpu.SMEM),
            pl.BlockSpec(xshape, lambda t: (z, z), memory_space=pltpu.VMEM),
            pl.BlockSpec(xshape, lambda t: (z, z), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W, SUB, LANE), lambda t: (t, z, z, z)),
            pl.BlockSpec((1, W, SUB, LANE), lambda t: (t, z, z, z)),
            pl.BlockSpec((1, W, SUB, LANE), lambda t: (t, z, z, z)),
        ],
        out_specs=(
            pl.BlockSpec((1, SUB, LANE), lambda t: (t, z, z)),
            pl.BlockSpec((1, SUB, LANE), lambda t: (t, z, z)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, SUB, LANE), jnp.float32),
            jax.ShapeDtypeStruct((T, SUB, LANE), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=DYNWIN_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(woff, xp2h, xp2l, vals4, vals4lo, li4)


def spmv_gell_dynwin_dd(
    A: GellDynwinMatrix, x: jax.Array, *, interpret: bool | None = None
) -> jax.Array:
    """f64 y = A @ x through the double-float dynamic-window kernel (~1e-14
    rel) — the f64 low-inflation wide-scatter tier."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    assert A.vals4lo is not None, "f32 GellDynwinMatrix: use spmv_gell_dynwin"
    xp = jnp.zeros((A.xp_chunks * LANE,), jnp.float64)
    xp = jax.lax.dynamic_update_slice(xp, x.astype(jnp.float64), (A.pbl,))
    xh = xp.astype(jnp.float32)
    xl = (xp - xh.astype(jnp.float64)).astype(jnp.float32)
    yhi, ylo = _spmv_dynwin_dd(
        A.vals4, A.vals4lo, A.li4, A.woff,
        xh.reshape(-1, LANE), xl.reshape(-1, LANE), A.K, interpret,
    )
    y = yhi.astype(jnp.float64) + ylo.astype(jnp.float64)
    return y.reshape(-1)[: A.n]


def dynwin_shard_geometry(A: GellDynwinMatrix, ndev: int):
    """(T_local, xw_chunks, shard_base (ndev,) int32, xp_pad_chunks) for
    running the dynwin kernel row-sharded over ndev devices on an
    all-gathered x: shard r runs tiles [r*T_l, (r+1)*T_l) against the
    window [shard_base[r], shard_base[r] + xw_chunks) of the padded global
    x, with its woff rows rebased to that window (spmv shard-side).
    xw_chunks is the max window span over shards (shard_map needs uniform
    shapes), so the padded x must extend to xp_pad_chunks =
    max_r(shard_base[r] + xw_chunks) — dynamic_slice CLAMPS an
    out-of-range start, which would silently shift a tail shard's window.
    Raises when the rows do not split into whole tiles per shard (pad with
    io.pad_problem_rows to a ndev*1024 multiple) or a shard's state
    exceeds the kernel budget."""
    import numpy as np

    T = A.vals4.shape[0]
    if A.n != T * RT or T % ndev:
        raise ValueError(
            f"{A.n} rows / {T} tiles do not split into {ndev} whole-tile "
            f"shards; pad rows to a multiple of {ndev * RT} "
            "(io.pad_problem_rows)"
        )
    T_l = T // ndev
    woff = np.asarray(A.woff, np.int64).reshape(ndev, T_l, A.W)
    lo = woff.min(axis=(1, 2))
    hi = woff.max(axis=(1, 2)) + A.K
    xw_chunks = int((hi - lo).max())
    xp_pad_chunks = max(A.xp_chunks, int((lo + xw_chunks).max()))
    if not gell_dynwin_supported(T_l * RT, xw_chunks, A.W, K=A.K, dd=A.vals4lo is not None):
        raise ValueError(
            f"{T_l * RT}-row shards x {A.W} dynwin slots: the shard's x "
            "window / slot blocks exceed the kernel budget"
        )
    return T_l, xw_chunks, lo.astype(np.int32), xp_pad_chunks


def dynwin_shard_arrays(A: GellDynwinMatrix, ndev: int):
    """(T_l, xw_chunks, xp_pad, woff_local, base2) — the host-side shard
    layout both distributed call sites (make_distributed_dynwin_cg and
    make_distributed_spmv_bench) share: woff_local is the (ndev, T_l, W)
    int32 table rebased onto each shard's tight window (clamped at 0 for
    the all-zero pad slots of empty tiles, whose carried base may sit
    below a shard's minimum), base2 the (ndev, 1) int32 window starts."""
    import numpy as np

    T_l, xw_chunks, lo, xp_pad = dynwin_shard_geometry(A, ndev)
    woff3 = np.asarray(A.woff, np.int64).reshape(ndev, T_l, A.W)
    woff_local = np.maximum(
        woff3 - lo[:, None, None].astype(np.int64), 0
    ).astype(np.int32)
    return T_l, xw_chunks, xp_pad, woff_local, lo.reshape(ndev, 1)


def spmv_gell_dynwin_shard(
    vals4: jax.Array,
    li4: jax.Array,
    woff_l: jax.Array,
    x_global: jax.Array,
    shard_base,
    *,
    K: int,
    pbl: int,
    xp_chunks: int,
    xw_chunks: int,
    vals4lo: jax.Array | None = None,
    interpret: bool | None = None,
) -> jax.Array:
    """One shard's rows of the global matvec (inside shard_map): slice this
    shard's xw_chunks-chunk window out of the padded global x at chunk
    ``shard_base`` and run the dynwin kernel over the shard's tiles with
    its pre-rebased woff table (woff - shard_base, clamped at 0 for empty
    pad slots). x_global is the all-gathered solution vector — the
    wide-scatter class has no neighbor-halo structure, so the comm plan is
    one all_gather per matvec and the speedup is the sharded kernel
    compute (same plan as the strip stack)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    dd = vals4lo is not None
    xp = jnp.zeros((xp_chunks * LANE,), jnp.float64 if dd else jnp.float32)
    xp = jax.lax.dynamic_update_slice(xp, x_global.astype(xp.dtype), (pbl,))
    xw = jax.lax.dynamic_slice(
        xp.reshape(-1, LANE),
        (jnp.asarray(shard_base, jnp.int32), _i0()),
        (xw_chunks, LANE),
    )
    if dd:
        xh = xw.astype(jnp.float32)
        xl = (xw - xh.astype(jnp.float64)).astype(jnp.float32)
        yhi, ylo = _spmv_dynwin_dd(vals4, vals4lo, li4, woff_l, xh, xl, K, interpret)
        y = yhi.astype(jnp.float64) + ylo.astype(jnp.float64)
    else:
        y = _spmv_dynwin(vals4, li4, woff_l, xw, K, interpret)
    return y.reshape(-1)


def dynwin_to_ell(A: GellDynwinMatrix):
    """Reconstruct the padded-ELL form (lossless: dynwin never stores zero
    entries — auto_structure excludes them)."""
    import numpy as np

    from hpccg_tpu.operators import EllMatrix

    rows, cols, vals = A.to_coo()
    n = A.n
    counts = np.bincount(rows, minlength=n) if len(rows) else np.zeros(n, np.int64)
    width = max(int(counts.max()) if counts.size else 0, 1)
    ev = np.zeros((n, width))
    ec = np.zeros((n, width), np.int32)
    evalid = np.zeros((n, width), bool)
    offs = np.concatenate([[0], np.cumsum(counts)[:-1]])
    slot = np.arange(len(rows)) - offs[rows]
    ev[rows, slot] = vals
    ec[rows, slot] = cols
    evalid[rows, slot] = True
    return EllMatrix(
        vals=jnp.asarray(ev, A.dtype),
        cols=jnp.asarray(ec),
        valid=jnp.asarray(evalid),
        start_row=0,
        total_nrow=A.total_nrow or n,
    )


def dynwin_cost_model(
    ell, *, K: int = 16, _norm=None, max_w: int = 1024, _carry=None
):
    """(ok, gnnz_rate, W) — the chooser's model: runs the greedy assignment
    (O(W * n), native when built) for the true W, then books the gather
    fit 1/(0.027 + 0.0014*K) ns/slot divided by the slot inflation
    W * n / nnz. Same fit family as the stack's model so the two tiers
    compare fairly (measured head-to-head 64^3: model ratio 2.5x, real
    2.7x — exp/dynwin_probe.py).

    ``_norm``: a precomputed _normalize_sorted(ell) tuple (auto_structure
    shares one per-row column sort across all candidate models).
    ``_carry``: a dict the model stores its greedy run in (keyed by K) so
    a winning candidate's build can pass it to prepare_gell_dynwin as
    ``_assign`` instead of re-running the greedy."""
    import numpy as np

    if K < SUB or K * LANE > 32767:
        return False, 0.0, 0
    n, dd, vdt, vals, cols, valid, width, bw_lo, bw_hi = (
        _norm if _norm is not None else _normalize_sorted(ell)
    )
    if dd and jax.default_backend() != "tpu":
        # interpret-mode dd off-chip is slower than the exact XLA/ELL paths
        # (same policy as gell_kernel/gell_stack's dd tiers)
        return False, 0.0, 0
    pbl = _cdiv(bw_lo, LANE) * LANE
    T = _cdiv(n, RT)
    sel = valid
    if not sel.any():
        return False, 0.0, 0
    pos = (cols[sel] + pbl).astype(np.int64)
    ci = pos >> _LANE_SHIFT
    counts = sel.sum(axis=1)
    out = _greedy_assign(ci, counts, T, K, max_w=max_w)
    if out is None:
        return False, 0.0, 0
    if _carry is not None:
        _carry[K] = out
    _slot, W, bases = out
    xp_chunks = max(int(bases.max()) + K, _cdiv(pbl + n, LANE))
    if not gell_dynwin_supported(n, xp_chunks, W, K=K, dd=dd):
        return False, 0.0, W
    nnz = int(counts.sum())
    inflation = (W * n) / max(nnz, 1)
    rate = (1.0 / (0.027 + 0.0014 * K)) / max(inflation, 1.0)
    if dd:
        # two gathers + the compensated products roughly double the
        # per-slot VPU work (the gell dd tier's measured factor)
        rate *= 0.5
    return True, rate, W
