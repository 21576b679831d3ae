"""Windowed gather-ELL SpMV kernel — the scattered-narrow-band tier.

Completes the general explicit-matrix coverage between DIA and raw ELL
(ref HPC_sparsemv.cpp:68-87 runs any CSR at memory speed; on TPU each
structure class needs its own mapping):

- few distinct diagonals            -> DiaMatrix (roll fusion / dia_kernel)
- many diagonals, dense             -> blocked-DIA Pallas kernel
- *narrow band, scattered offsets*  -> THIS kernel: DIA storage would
  inflate by ndiag/nnz-per-row (every stored slot streams from HBM), but
  the matrix is still local — every nonzero of a 1024-row tile lives in a
  small x window
- wide scatter                      -> no gather-free mapping exists
  (documented; XLA gather fallback)

Mechanism (probed on v5e, exp/gather_probe.py + PERF.md): Mosaic lowers
``jnp.take_along_axis(..., axis=1)`` to a vreg-local dynamic lane gather at
~279 G elems/s. A full-window gather is a scan over the window's 128-lane
chunks: for each ELL slot, gather from each chunk and select by the
precomputed chunk id —

    li = col + PBL - tile_base          (precomputed, streamed with vals)
    g  = select(li >> 7 == k, lane_gather(window_chunk_k, li & 127), g)

Cost: ~4 vector ops per (slot, chunk) per 1024-row tile + 8 B/nnz of
streamed (val, index) traffic — effective rate ~ min(stream_rate / 8 B,
VPU / 4K) where K = window chunks = (1024 + 2*bandwidth)/128. The
auto_structure chooser picks gather-ELL over inflated DIA when this model
wins (reorder.py).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hpccg_tpu.ops.pallas.ddmath import i0 as _i0

LANE = 128
SUB = 8
RT = SUB * LANE  # 1024 rows per tile
GELL_VMEM_LIMIT = 100 << 20


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def gell_supported(n: int, k_chunks: int, dd: bool = False) -> bool:
    """True when the padded x window state fits the kernel VMEM budget
    (x stays fully VMEM-resident) and the chunk scan is bounded.
    dd=True doubles the resident x state (hi + lo windows, f64 tier)."""
    if k_chunks > 32:
        return False
    xp_bytes = (8 if dd else 4) * (_cdiv(n, RT) * RT + 2 * k_chunks * LANE)
    blocks = (6 if dd else 4) * 64 * SUB * LANE  # double-buffered blocks
    return xp_bytes + blocks + (4 << 20) <= GELL_VMEM_LIMIT


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["vals3", "li3", "vals3lo"],
    meta_fields=["n", "width", "k_chunks", "pbl", "total_nrow", "nnz_count", "slot_bounds"],
)
@dataclasses.dataclass(frozen=True)
class GellMatrix:
    """Prepared windowed gather-ELL operator.

    vals3/li3: (T, width, 8, 128) — tile-major ELL values and window-local
    flat indices (row r of tile t sits at sublane (r%1024)//128, lane r%128).
    Invalid slots carry val=0 with an in-window index.

    vals3lo (f64 matrices only): the exact f32 low halves of the values —
    the dd tier streams (hi, lo) pairs and runs the compensated gather
    kernel (spmv_gell_dd); None for f32 matrices.
    """

    vals3: jax.Array  # f32 (the hi halves for f64 matrices)
    li3: jax.Array  # i16 in [0, k_chunks*128) — the window is <= 4096 wide,
    # so 16-bit indices halve the index stream (8 -> 6 B/nnz of traffic)
    n: int
    width: int
    k_chunks: int
    pbl: int  # x zero-padding (elements) before row 0
    total_nrow: int
    nnz_count: int
    # per-slot STATIC chunk bounds (lo, hi) over all tiles: rows store
    # columns sorted, so slot w's window-local chunk ids concentrate around
    # the w-th offset quantile — the chunk scan only visits [lo, hi]
    # instead of all k_chunks (pure win, zero runtime cost)
    slot_bounds: tuple = ()
    vals3lo: jax.Array | None = None

    @property
    def local_nrow(self) -> int:
        return self.n

    @property
    def dtype(self):
        return jnp.dtype("float64") if self.vals3lo is not None else self.vals3.dtype

    @property
    def nnz(self) -> int:
        return self.nnz_count

    def matvec(self, x: jax.Array) -> jax.Array:
        if self.vals3lo is not None:
            return spmv_gell_dd(self, x)
        return spmv_gell(self, x)

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.matvec(x)

    def to_coo(self):
        """(rows, cols, vals) of stored nonzeros, row-major (zero-valued
        slots — padding and invalid entries — are dropped, like DIA)."""
        import numpy as np

        T = self.vals3.shape[0]
        vals = np.asarray(self.vals3).transpose(0, 2, 3, 1).reshape(T * RT, -1)
        if self.vals3lo is not None:
            # f64 reconstruction from the (hi, lo) pair — double-float
            # precision (~2^-49 rel), like every dd representation
            vals = vals.astype(np.float64) + np.asarray(
                self.vals3lo, np.float64
            ).transpose(0, 2, 3, 1).reshape(T * RT, -1)
        li = np.asarray(self.li3).transpose(0, 2, 3, 1).reshape(T * RT, -1)
        rows2 = np.arange(T * RT)[:, None]
        tile_base = (rows2 // RT) * RT
        cols = li - self.pbl + tile_base
        keep = (vals != 0) & (rows2 < self.n)
        rr = np.broadcast_to(rows2, vals.shape)[keep]
        order = np.argsort(rr, kind="stable")
        return rr[order], cols[keep][order], vals[keep][order]


def _normalize_sorted(ell):
    """The shared front half of prepare_gell / prepare_gell_shards: dtype
    plan (dd = f64 -> (hi, lo) planes), dense vals/cols/valid with each
    row's slots sorted by column (slot w = w-th smallest column of its row,
    invalid slots last — window-local chunk ids then concentrate per slot,
    feeding the static bounds), and the matrix bandwidth."""
    import numpy as np

    n = ell.local_nrow
    dd = np.asarray(ell.vals).dtype.itemsize == 8
    vdt = np.float64 if dd else np.float32
    vals = np.asarray(ell.vals, vdt)
    cols = np.asarray(ell.cols, np.int64)
    valid = np.asarray(ell.valid)
    width = max(ell.width, 1)
    if vals.shape[1] == 0:
        vals = np.zeros((n, 1), vdt)
        cols = np.zeros((n, 1), np.int64)
        valid = np.zeros((n, 1), bool)

    sort_key = np.where(valid, cols, np.iinfo(np.int64).max)
    order = np.argsort(sort_key, axis=1, kind="stable")
    vals = np.take_along_axis(vals, order, axis=1)
    cols = np.take_along_axis(cols, order, axis=1)
    valid = np.take_along_axis(valid, order, axis=1)

    offs = np.where(valid, cols - np.arange(n)[:, None], 0)
    bw_lo = max(0, int(-offs.min()) if offs.size else 0)
    bw_hi = max(0, int(offs.max()) if offs.size else 0)
    return n, dd, vdt, vals, cols, valid, width, bw_lo, bw_hi


def _slot_bounds(ci, valid, width: int):
    """Per-slot static (lo, hi) chunk bounds over VALID entries, plus the
    per-slot parking index for invalid slots (their slot's lo chunk, so
    they cannot widen the bounds)."""
    import numpy as np

    bounds = []
    for w in range(width):
        sel = valid[:, w]
        if sel.any():
            bounds.append((int(ci[sel, w].min()), int(ci[sel, w].max())))
        else:
            bounds.append((0, 0))
    fallback = np.asarray([lo * LANE for lo, _ in bounds])[None, :]
    return bounds, fallback


def prepare_gell(ell, *, max_k_chunks: int = 32) -> GellMatrix:
    """Host-side preprocessing of an EllMatrix into tile-windowed form.

    Returns None-equivalent failure by raising ValueError when a tile's
    window exceeds ``max_k_chunks`` 128-lane chunks (bandwidth too wide)."""
    import numpy as np

    if ell.start_row != 0:
        raise ValueError("prepare_gell needs the assembled matrix")
    n, dd, vdt, vals, cols, valid, width, bw_lo, bw_hi = _normalize_sorted(ell)
    pbl = _cdiv(bw_lo, LANE) * LANE
    pbh = _cdiv(bw_hi, LANE) * LANE
    k_chunks = (RT + pbl + pbh) // LANE
    if k_chunks > max_k_chunks:
        raise ValueError(
            f"window of {k_chunks} chunks (bandwidth {bw_lo}/{bw_hi}) "
            f"exceeds max_k_chunks={max_k_chunks}"
        )
    if not gell_supported(n, k_chunks, dd=dd):
        raise ValueError(
            f"{n} rows: the VMEM-resident x window exceeds the kernel "
            "budget (gell_supported); use DIA or the distributed paths"
        )

    T = _cdiv(n, RT)
    npad = T * RT
    vp = np.zeros((npad, width), vdt)
    lp = np.zeros((npad, width), np.int64)
    vp[:n, : vals.shape[1]] = np.where(valid, vals, 0.0)
    tile_base = (np.arange(npad) // RT) * RT  # (npad,)
    validp = np.pad(valid, ((0, npad - n), (0, width - valid.shape[1])))
    li_valid = (
        np.pad(cols, ((0, npad - n), (0, width - cols.shape[1])))
        + pbl
        - tile_base[:, None]
    )
    slot_bounds, fallback = _slot_bounds(li_valid >> 7, validp, width)
    li = np.where(validp, li_valid, fallback)
    assert li.min() >= 0 and li.max() < k_chunks * LANE, (li.min(), li.max())
    lp[:, :] = li

    def _tile3(a):
        return np.ascontiguousarray(
            a.reshape(T, SUB, LANE, width).transpose(0, 3, 1, 2)
        )

    if dd:
        vhi = vp.astype(np.float32)
        vlo = (vp - vhi.astype(np.float64)).astype(np.float32)
        vals3, vals3lo = jnp.asarray(_tile3(vhi)), jnp.asarray(_tile3(vlo))
    else:
        vals3, vals3lo = jnp.asarray(_tile3(vp)), None
    li3 = lp.reshape(T, SUB, LANE, width).transpose(0, 3, 1, 2)
    assert k_chunks * LANE <= 32767  # li fits int16
    return GellMatrix(
        vals3=vals3,
        vals3lo=vals3lo,
        li3=jnp.asarray(np.ascontiguousarray(li3), jnp.int16),
        n=n,
        width=width,
        k_chunks=k_chunks,
        pbl=pbl,
        total_nrow=ell.total_nrow or n,
        nnz_count=int(ell.nnz),
        slot_bounds=tuple(slot_bounds),
    )


def gell_to_ell(g: GellMatrix):
    """Reconstruct the padded-ELL form of a GellMatrix (lossless: gell
    matrices never store zero entries — auto_structure excludes them)."""
    import numpy as np

    from hpccg_tpu.operators import EllMatrix

    rows, cols, vals = g.to_coo()
    n = g.n
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
        vals=jnp.asarray(ev, g.dtype),
        cols=jnp.asarray(ec),
        valid=jnp.asarray(evalid),
        start_row=0,
        total_nrow=g.total_nrow or n,
    )


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["vals4", "li4", "cl_idx", "cl_val", "ch_idx", "ch_val", "vals4lo"],
    meta_fields=[
        "ndev", "L", "width", "k_chunks", "pbl", "bw_lo", "bw_hi",
        "total_nrow", "nnz_count", "slot_bounds",
    ],
)
@dataclasses.dataclass(frozen=True)
class GellShards:
    """Row-sharded windowed gather-ELL operator (the distributed tier).

    vals4/li4: (ndev, T, width, 8, 128) — shard-major stacks of the
    single-device layout, to be sharded on axis 0. li values are SHARD-LOCAL
    window indices: shard r's tile t holds li = col - r*L + pbl - t*RT, so
    boundary tiles map out-of-shard columns into the xp buffer's bandwidth
    padding — where spmv_gell_shard writes the ppermuted neighbor strips
    (the windowed analog of dia_kernel.spmv_dia_prepared's halo fill;
    ref exchange_externals.cpp:51-131 + HPC_sparsemv.cpp:68-87).

    vals4lo (f64 matrices only): the exact f32 low halves — each shard
    then runs the double-float gather kernel (spmv_gell_shard_dd), with
    the boundary corrections and halos in f64 (they are O(bandwidth)-
    sized, so XLA's emulated f64 there costs nothing).
    """

    vals4: jax.Array
    li4: jax.Array
    # boundary-crossing entries as fixed-size per-shard COO lists:
    # cl_idx (ndev, 2, C_lo) i32 rows [local_row, halo_lo_index] with
    # values cl_val (ndev, C_lo) f32 (padding entries: value 0, index 0) —
    # and the same for the upper neighbor (ch_*). These feed the
    # HALO/COMPUTE OVERLAP: the gather kernel runs with a ZERO halo (no
    # ppermute dependency) and the exchanged strips land as a tiny
    # scatter-add correction on the boundary rows.
    cl_idx: jax.Array
    cl_val: jax.Array
    ch_idx: jax.Array
    ch_val: jax.Array
    ndev: int
    L: int  # rows per shard
    width: int
    k_chunks: int
    pbl: int
    bw_lo: int  # halo rows needed from the lower neighbor
    bw_hi: int  # ... and the upper neighbor
    total_nrow: int
    nnz_count: int
    slot_bounds: tuple = ()
    vals4lo: jax.Array | None = None

    @property
    def local_nrow(self) -> int:
        return self.ndev * self.L

    @property
    def dtype(self):
        return jnp.dtype("float64") if self.vals4lo is not None else self.vals4.dtype

    @property
    def nnz(self) -> int:
        return self.nnz_count


def prepare_gell_shards(ell, ndev: int, *, max_k_chunks: int = 32) -> GellShards:
    """Host-side prep of an assembled EllMatrix (or GellMatrix) into ndev
    row shards of tile-windowed form with a UNIFORM window (one shard_map
    program serves every shard).

    Raises ValueError when the matrix cannot ride this path: bandwidth
    wider than one shard (halo would need non-neighbor ppermutes — use the
    all-gather path), window over ``max_k_chunks`` chunks, or per-shard
    VMEM budget exceeded."""
    import numpy as np

    if isinstance(ell, GellMatrix):
        ell = gell_to_ell(ell)
    if ell.start_row != 0:
        raise ValueError("prepare_gell_shards needs the assembled matrix")
    if ell.local_nrow % ndev:
        raise ValueError(
            f"{ell.local_nrow} rows do not divide {ndev} shards; pad with "
            "hpccg_tpu.io.pad_problem_rows(prob, ndev)"
        )
    n, dd, vdt, vals, cols, valid, width, bw_lo, bw_hi = _normalize_sorted(ell)
    L = n // ndev
    rows = np.arange(n)[:, None]
    if bw_lo > L or bw_hi > L:
        raise ValueError(
            f"bandwidth ({bw_lo}/{bw_hi}) exceeds the {L}-row shard: "
            "neighbor halo insufficient — use the all-gather ELL path"
        )
    pbl = _cdiv(bw_lo, LANE) * LANE
    pbh = _cdiv(bw_hi, LANE) * LANE
    k_chunks = (RT + pbl + pbh) // LANE
    if k_chunks > max_k_chunks:
        raise ValueError(
            f"window of {k_chunks} chunks (bandwidth {bw_lo}/{bw_hi}) "
            f"exceeds max_k_chunks={max_k_chunks}"
        )
    if not gell_supported(L, k_chunks, dd=dd):
        raise ValueError(
            f"{L}-row shards: the VMEM-resident x window exceeds the "
            "kernel budget (gell_supported)"
        )

    T = _cdiv(L, RT)
    npad = T * RT
    # shard-local window index: row i lives in shard r = i//L at local row
    # i%L, tile base (i%L)//RT*RT. Bounds (valid entries): cols of row i
    # span [i-bw_lo, i+bw_hi] => li in [pbl-bw_lo, RT-1+pbl+bw_hi], i.e.
    # [0, k_chunks*LANE) — out-of-shard columns land in the halo padding.
    shard = rows // L
    tile_base = ((rows % L) // RT) * RT
    li_valid = cols + pbl - shard * L - tile_base
    slot_bounds, fallback = _slot_bounds(np.where(valid, li_valid >> 7, 0), valid, width)
    li = np.where(valid, li_valid, fallback)
    assert li.min() >= 0 and li.max() < k_chunks * LANE, (li.min(), li.max())
    assert k_chunks * LANE <= 32767  # li fits int16

    # (ndev, L, width) -> per-shard tile padding to (ndev, npad, width)
    v4 = np.zeros((ndev, npad, width), vdt)
    l4 = np.zeros((ndev, npad, width), np.int64)
    v4[:, :L] = np.where(valid, vals, 0.0).reshape(ndev, L, width)
    l4[:, :L] = li.reshape(ndev, L, width)
    # pad rows (invalid everywhere) park at each slot's lo chunk
    l4[:, L:] = fallback[None]

    # boundary-crossing entries as fixed-size per-shard COO lists for the
    # overlap corrections: the zero-halo kernel reads exact zeros at these
    # slots' window positions, so adding val * halo afterwards is exact
    is_lo = valid & (cols < shard * L)
    is_hi = valid & (cols >= (shard + 1) * L)

    def _coo(mask, halo_index):
        counts = mask.reshape(ndev, L * width).sum(axis=1)
        C = max(int(counts.max()) if counts.size else 0, 1)
        idx = np.zeros((ndev, 2, C), np.int32)
        val = np.zeros((ndev, C), vdt)
        for r in range(ndev):
            m = mask[r * L : (r + 1) * L]
            rr, ww = np.nonzero(m)
            k = len(rr)
            if k:
                cs = cols[r * L : (r + 1) * L][rr, ww]
                val[r, :k] = vals[r * L : (r + 1) * L][rr, ww]
                idx[r, 0, :k] = rr
                idx[r, 1, :k] = halo_index(cs, r)
        return idx, val

    cl_idx, cl_val = _coo(is_lo, lambda c, r: c - (r * L - bw_lo))
    ch_idx, ch_val = _coo(is_hi, lambda c, r: c - (r + 1) * L)

    def _tile4(a):
        return np.ascontiguousarray(
            a.reshape(ndev, T, SUB, LANE, width).transpose(0, 1, 4, 2, 3)
        )

    if dd:
        v4hi = v4.astype(np.float32)
        v4lo = (v4 - v4hi.astype(np.float64)).astype(np.float32)
        vals4, vals4lo = jnp.asarray(_tile4(v4hi)), jnp.asarray(_tile4(v4lo))
    else:
        vals4, vals4lo = jnp.asarray(_tile4(v4)), None
    li4 = l4.reshape(ndev, T, SUB, LANE, width).transpose(0, 1, 4, 2, 3)
    return GellShards(
        vals4=vals4,
        vals4lo=vals4lo,
        li4=jnp.asarray(np.ascontiguousarray(li4), jnp.int16),
        cl_idx=jnp.asarray(cl_idx),
        cl_val=jnp.asarray(cl_val),
        ch_idx=jnp.asarray(ch_idx),
        ch_val=jnp.asarray(ch_val),
        ndev=ndev,
        L=L,
        width=width,
        k_chunks=k_chunks,
        pbl=pbl,
        bw_lo=bw_lo,
        bw_hi=bw_hi,
        total_nrow=ell.total_nrow or n,
        nnz_count=int(ell.nnz),
        slot_bounds=tuple(slot_bounds),
    )


def spmv_gell_shard(
    vals3: jax.Array,
    li3: jax.Array,
    x_local: jax.Array,
    halo_lo: jax.Array | None,
    halo_hi: jax.Array | None,
    *,
    L: int,
    width: int,
    k_chunks: int,
    pbl: int,
    bw_lo: int,
    slot_bounds: tuple,
    interpret: bool | None = None,
) -> jax.Array:
    """One shard's rows of the GLOBAL matvec: the ppermuted neighbor strips
    are written into the xp window's bandwidth padding (zeros at true global
    edges arrive naturally as ppermute's zero fill)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    T = vals3.shape[0]
    npad = T * RT
    pbh_total = k_chunks * LANE - RT  # = pbl + pbh
    xp = jnp.zeros((pbl + npad + pbh_total,), jnp.float32)
    xp = jax.lax.dynamic_update_slice(xp, x_local.astype(jnp.float32), (pbl,))
    if halo_lo is not None and halo_lo.shape[0]:
        xp = jax.lax.dynamic_update_slice(
            xp, halo_lo.astype(jnp.float32), (pbl - bw_lo,)
        )
    if halo_hi is not None and halo_hi.shape[0]:
        # the upper neighbor's first bw_hi values sit right after the REAL
        # L rows (the shard's [L, npad) tile-pad positions are never
        # referenced by valid slots)
        xp = jax.lax.dynamic_update_slice(
            xp, halo_hi.astype(jnp.float32), (pbl + L,)
        )
    y = _spmv_gell(
        vals3, li3, xp.reshape(-1, LANE), width, k_chunks, interpret, slot_bounds
    )
    return y.reshape(-1)[:L]


def spmv_gell_shard_dd(
    vals3: jax.Array,
    vals3lo: jax.Array,
    li3: jax.Array,
    x_local: jax.Array,
    *,
    L: int,
    width: int,
    k_chunks: int,
    pbl: int,
    slot_bounds: tuple,
    interpret: bool | None = None,
) -> jax.Array:
    """One shard's rows of the f64 matvec through the double-float gather
    kernel, on a ZERO halo (the distributed wrapper adds the ppermuted
    strips as exact f64 boundary corrections — the overlap structure, so
    no halo parameters here)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    T = vals3.shape[0]
    npad = T * RT
    pbh_total = k_chunks * LANE - RT
    xp = jnp.zeros((pbl + npad + pbh_total,), jnp.float64)
    xp = jax.lax.dynamic_update_slice(xp, x_local.astype(jnp.float64), (pbl,))
    xh = xp.astype(jnp.float32)
    xl = (xp - xh.astype(jnp.float64)).astype(jnp.float32)
    yhi, ylo = _spmv_gell_dd(
        vals3, vals3lo, li3, xh.reshape(-1, LANE), xl.reshape(-1, LANE),
        width, k_chunks, interpret, slot_bounds,
    )
    y = yhi.astype(jnp.float64) + ylo.astype(jnp.float64)
    return y.reshape(-1)[:L]


def _lane_take(ch, ll):
    """Lane gather ch[i, ll[i, j]] keeping i32 indices. This is exactly the
    batched gather ``jnp.take_along_axis(ch, ll, axis=1)`` emits, EXCEPT the
    index dtype: under jax_enable_x64 take_along_axis force-converts indices
    to i64 (jax indexing.py picks ``default_int_dtype()`` for the index
    width) and Mosaic rejects the 64-bit convert — found on first chip
    contact of the dd tier. ll is already masked into [0, LANE)."""
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(),
        collapsed_slice_dims=(1,),
        start_index_map=(1,),
        operand_batching_dims=(0,),
        start_indices_batching_dims=(0,),
    )
    return jax.lax.gather(
        ch,
        ll[..., None],
        dnums,
        slice_sizes=(1, 1),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )


def _kernel(xp_ref, vals_ref, li_ref, y_ref, *, width: int, k_chunks: int, slot_bounds: tuple):
    t = pl.program_id(0)
    # this tile's x window: K chunks of 128, starting at padded chunk t*8
    xw = xp_ref[pl.ds(t * SUB, k_chunks)]  # (K, 128)
    acc = jnp.zeros((SUB, LANE), xp_ref.dtype)
    for w in range(width):
        li = li_ref[0, w].astype(jnp.int32)  # i16 stream, i32 compute
        ll = jnp.bitwise_and(li, LANE - 1)
        ci = jnp.right_shift(li, 7)
        g = jnp.zeros((SUB, LANE), xp_ref.dtype)
        lo, hi = slot_bounds[w] if slot_bounds else (0, k_chunks - 1)
        for k in range(lo, hi + 1):
            chunk = jnp.broadcast_to(xw[k : k + 1], (SUB, LANE))
            gk = _lane_take(chunk, ll)
            g = jnp.where(ci == k, gk, g)
        acc = acc + vals_ref[0, w] * g
    y_ref[0] = acc


@partial(jax.jit, static_argnums=(3, 4, 5, 6))
def _spmv_gell(vals3, li3, xp2, width: int, k_chunks: int, interpret: bool, slot_bounds: tuple = ()):
    T = vals3.shape[0]
    # index-map literals i32-pinned (ddmath.i0): under jax_enable_x64 — any
    # --dtype float64 process, even for this f32 kernel — Python 0 literals
    # trace as i64 transform returns and Mosaic rejects the lowering
    z = _i0()
    return pl.pallas_call(
        partial(_kernel, width=width, k_chunks=k_chunks, slot_bounds=slot_bounds),
        grid=(T,),
        in_specs=[
            pl.BlockSpec(
                xp2.shape, lambda t: (z, z), memory_space=pltpu.VMEM
            ),  # xp2 whole, explicit i32 map
            pl.BlockSpec((1, width, SUB, LANE), lambda t: (t, z, z, z)),
            pl.BlockSpec((1, width, SUB, LANE), lambda t: (t, z, z, z)),
        ],
        out_specs=pl.BlockSpec((1, SUB, LANE), lambda t: (t, z, z)),
        out_shape=jax.ShapeDtypeStruct((T, SUB, LANE), vals3.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=GELL_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(xp2, vals3, li3)


def _kernel_dd(
    xph_ref, xpl_ref, valsh_ref, valsl_ref, li_ref, yhi_ref, ylo_ref,
    *, width: int, k_chunks: int, slot_bounds: tuple,
):
    """Double-float gather tile: every product feeding the compensated
    accumulators is EXACT by construction (split12 halves), per ddmath's
    compiler contract — the same recipe as dia_kernel._kernel_dd, with the
    shifted-diagonal reads replaced by the chunk-scan lane gather."""
    from hpccg_tpu.ops.pallas.ddmath import (
        df_add, fast_two_sum, split12, two_sum,
    )

    t = pl.program_id(0)
    xwh = xph_ref[pl.ds(t * SUB, k_chunks)]  # (K, 128) hi window
    xwl = xpl_ref[pl.ds(t * SUB, k_chunks)]  # (K, 128) lo window
    f32 = jnp.float32
    sh = jnp.zeros((SUB, LANE), f32)  # main double-f32 accumulator
    sl = jnp.zeros((SUB, LANE), f32)
    th = jnp.zeros((SUB, LANE), f32)  # eps-scale terms accumulator
    tl = jnp.zeros((SUB, LANE), f32)
    for w in range(width):
        li = li_ref[0, w].astype(jnp.int32)
        ll = jnp.bitwise_and(li, LANE - 1)
        ci = jnp.right_shift(li, 7)
        gh = jnp.zeros((SUB, LANE), f32)
        gl = jnp.zeros((SUB, LANE), f32)
        lo_b, hi_b = slot_bounds[w] if slot_bounds else (0, k_chunks - 1)
        for k in range(lo_b, hi_b + 1):
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


@partial(jax.jit, static_argnums=(5, 6, 7, 8))
def _spmv_gell_dd(
    vals3, vals3lo, li3, xp2h, xp2l, width: int, k_chunks: int,
    interpret: bool, slot_bounds: tuple = (),
):
    T = vals3.shape[0]
    # this kernel ONLY runs under jax_enable_x64 (it is the f64 tier), so
    # every index-map literal must be i32-pinned or Mosaic rejects the
    # lowering (the dia_kernel _i0 hazard; default whole-array maps included)
    z = _i0()
    xshape = xp2h.shape
    return pl.pallas_call(
        partial(_kernel_dd, width=width, k_chunks=k_chunks, slot_bounds=slot_bounds),
        grid=(T,),
        in_specs=[
            pl.BlockSpec(xshape, lambda t: (z, z), memory_space=pltpu.VMEM),  # xp hi
            pl.BlockSpec(xshape, lambda t: (z, z), memory_space=pltpu.VMEM),  # xp lo
            pl.BlockSpec((1, width, SUB, LANE), lambda t: (t, z, z, z)),
            pl.BlockSpec((1, width, SUB, LANE), lambda t: (t, z, z, z)),
            pl.BlockSpec((1, width, SUB, LANE), lambda t: (t, z, z, z)),
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
            vmem_limit_bytes=GELL_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(xp2h, xp2l, vals3, vals3lo, li3)


def spmv_gell_dd(
    A: GellMatrix, x: jax.Array, *, interpret: bool | None = None
) -> jax.Array:
    """f64 y = A @ x through the double-float gather kernel (~1e-14 rel;
    the f64 scattered-narrow-band tier — DIA has the banded f64 case)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    assert A.vals3lo is not None, "f32 GellMatrix: use spmv_gell"
    T = A.vals3.shape[0]
    npad = T * RT
    pbh_total = A.k_chunks * LANE - RT
    xp = jnp.zeros((A.pbl + npad + pbh_total,), jnp.float64)
    xp = jax.lax.dynamic_update_slice(xp, x.astype(jnp.float64), (A.pbl,))
    xh = xp.astype(jnp.float32)
    xl = (xp - xh.astype(jnp.float64)).astype(jnp.float32)
    yhi, ylo = _spmv_gell_dd(
        A.vals3, A.vals3lo, A.li3, xh.reshape(-1, LANE), xl.reshape(-1, LANE),
        A.width, A.k_chunks, interpret, A.slot_bounds,
    )
    y = yhi.astype(jnp.float64) + ylo.astype(jnp.float64)
    return y.reshape(-1)[: A.n]


def spmv_gell(A: GellMatrix, x: jax.Array, *, interpret: bool | None = None) -> jax.Array:
    """y = A @ x. The x zero-extension is per-call XLA; everything heavy
    (vals/index layout) was done once in prepare_gell."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    T = A.vals3.shape[0]
    npad = T * RT
    # zero-pad x to [pbl | npad | window overhang] — f32 only (the lane
    # gather and the stored values are 32-bit)
    pbh_total = A.k_chunks * LANE - RT  # = pbl + pbh
    xp = jnp.zeros((A.pbl + npad + pbh_total, ), jnp.float32)
    xp = jax.lax.dynamic_update_slice(xp, x.astype(jnp.float32), (A.pbl,))
    xp2 = xp.reshape(-1, LANE)
    y = _spmv_gell(
        A.vals3, A.li3, xp2, A.width, A.k_chunks, interpret, A.slot_bounds
    )
    return y.reshape(-1)[: A.n]
