"""Strip-bucketed gather-ELL SpMV — the WIDE-scatter tier.

Closes the last capability class where the reference's any-CSR-at-memory-
speed SpMV (HPC_sparsemv.cpp:68-87) had no fast TPU counterpart: matrices
whose band stays too wide for the windowed gather kernel even after RCM
(k_chunks > 32 — e.g. a randomly permuted 3-D stencil, whose optimal
bandwidth is Theta(n^(2/3))). The round-3 fallback was the honest-but-slow
XLA take gather (~0.14 Gnnz/s); this kernel restores the vreg-local lane
gather (~279 G elems/s probed) by BUCKETING nonzeros by diagonal strip:

- the offset range [-bw_lo, bw_hi] is cut into strips of ``strip_chunks``
  128-lane chunks, aligned to the chunk grid;
- each row's entries are re-sorted into per-strip ELL slots (the slot
  inflation is the max-per-row count within each strip, summed over
  strips — for scattered 27-nnz rows over S strips, roughly
  S * max Binomial(27, 1/S), a small constant factor);
- ONE pallas call per matvec: for each 1024-row tile the kernel loads each
  strip's (8 + strip_chunks)-chunk x window with a strip-STATIC offset
  (``pl.ds(t*SUB + woff_s, k_s)``) and runs gell_kernel's chunk-scan lane
  gather over that strip's slots, with per-slot static [lo, hi] bounds.

Cost shape: 6 B/slot streamed (f32 val + i16 window-local index) + ~4 VPU
ops per (slot, scanned chunk); the whole padded x stays VMEM-resident
(same reach limit as gell_kernel: ~24M f32 rows). Unlike the plain
windowed kernel there is NO bandwidth cap — strips tile any band that
fits x in VMEM. f64 matrices ride the double-float variant
(spmv_gell_stack_dd): (hi, lo) f32 planes + gell_kernel._kernel_dd's
compensated accumulation per strip (~1e-14 rel, ~2x the slot cost).

The alternatives measured before shipping this design (exp/
wide_scatter_probe.py + PERF.md round 4): MXU block-dense tiles lose by
memory traffic (a permuted stencil's 128x128 tiles are ~0.1% occupied, so
the dense stream pays ~1000x the bytes), and sort+segment-sum COO loses to
the scatter on the output side. Reference spec: HPC_sparsemv.cpp:68-87.
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

STACK_VMEM_LIMIT = 100 << 20


def _strip_widths(sid, slot_in_strip, valid, width: int, S: int):
    """Per-strip ELL width = the max per-row entry count within each strip,
    in ONE pass over the valid entries.

    Within a row sorted by column each strip's entries are a contiguous
    run, so the per-(row, strip) count is the run length and the width is
    1 + max slot_in_strip over the strip's entries. A bincount over the
    combined (sid, slot) key replaces the strip-at-a-time masked max
    (S passes over the full entry array — measured 160 s of a 189 s prep
    at 1M x 27 x 246 strips; this pass is ~1 s)."""
    import numpy as np

    if S <= 0 or not valid.any():
        return np.zeros(max(S, 1), np.int64)
    key = sid[valid] * width + slot_in_strip[valid]
    counts = np.bincount(key, minlength=S * width).reshape(S, width)
    occupied = counts > 0
    # last occupied slot column + 1 per strip (0 for empty strips)
    return np.where(
        occupied.any(axis=1), width - np.argmax(occupied[:, ::-1], axis=1), 0
    ).astype(np.int64)


def _strip_runs(sid, valid):
    """(slot_in_strip) for each entry: position within its row's contiguous
    run of same-strip entries (rows sorted by column => offsets sorted =>
    each strip's entries form one run per row)."""
    import numpy as np

    w = sid.shape[1]
    idx = np.arange(w)[None, :]
    is_start = np.ones_like(valid)
    if w > 1:
        is_start[:, 1:] = sid[:, 1:] != sid[:, :-1]
    run_start = np.maximum.accumulate(np.where(is_start, idx, 0), axis=1)
    return idx - run_start


def gell_stack_supported(n: int, max_end_chunk: int, wtot: int, dd: bool = False) -> bool:
    """True when the padded x (VMEM-resident, like gell_kernel) plus the
    double-buffered slot blocks fit the kernel budget. Per slot element the
    tile blocks stream vals f32 (+ lo f32 for dd) + li i16, DOUBLE-buffered
    by the pipeline: 12 B f32 / 20 B dd — wtot is unbounded in this tier
    (unlike gell_kernel's width <= 64), so the accounting must be honest or
    near-budget matrices pass the gate and die in Mosaic instead of taking
    the designed fallback."""
    if wtot <= 0:
        return False
    xp_bytes = (8 if dd else 4) * max_end_chunk * LANE
    blocks = (20 if dd else 12) * wtot * SUB * LANE
    return xp_bytes + blocks + (4 << 20) <= STACK_VMEM_LIMIT


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["vals3", "li3", "vals3lo"],
    meta_fields=["n", "wtot", "strips", "pbl", "xp_chunks", "total_nrow", "nnz_count"],
)
@dataclasses.dataclass(frozen=True)
class GellStackMatrix:
    """Prepared strip-bucketed gather-ELL operator.

    vals3/li3: (T, wtot, 8, 128) — all strips' ELL slots concatenated along
    the width axis; slot columns [w0_s, w0_s + width_s) belong to strip s
    and carry window-local indices relative to that strip's per-tile window
    start (chunk ``t*SUB + woff_s`` of the padded x). Invalid slots carry
    val=0 with an in-window parked index.

    strips: static tuple of (w0, width, woff, k_chunks, bounds) where
    bounds is the per-slot ((lo, hi), ...) chunk-scan range.

    vals3lo (f64 matrices only): the exact f32 low halves of the values —
    the dd tier streams (hi, lo) pairs through the compensated strip-gather
    kernel (spmv_gell_stack_dd); None for f32 matrices.
    """

    vals3: jax.Array  # f32 (the hi halves for f64 matrices)
    li3: jax.Array  # i16
    n: int
    wtot: int
    strips: tuple
    pbl: int  # x zero-padding (elements) before row 0
    xp_chunks: int  # total padded-x chunks the windows may touch
    total_nrow: int
    nnz_count: int
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
            return spmv_gell_stack_dd(self, x)
        return spmv_gell_stack(self, x)

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.matvec(x)

    def to_coo(self):
        """(rows, cols, vals) of stored nonzeros, row-major (zero-valued
        slots — padding — are dropped, like DIA/gell)."""
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
        # undo the per-strip window-local encoding: col = li + t*RT + f_s
        f_by_slot = np.zeros(self.wtot, np.int64)
        for w0, width_s, woff, _k, _b in self.strips:
            f_by_slot[w0 : w0 + width_s] = woff * LANE - self.pbl
        cols = li.astype(np.int64) + tile_base + f_by_slot[None, :]
        keep = (vals != 0) & (rows2 < self.n)
        rr = np.broadcast_to(rows2, vals.shape)[keep]
        order = np.argsort(rr, kind="stable")
        return rr[order], cols[keep][order], vals[keep][order]


def _prepare_gell_stack_native(ell, *, strip_chunks: int, use_native):
    """Native (csrc hpccg_stack_scan/fill) prep: same output as the NumPy
    path, one C++ pass per stage instead of the chain of full-array NumPy
    passes (~10x at 1M x 27). Returns None when the library is unavailable
    or the matrix is degenerate (the NumPy branch owns those edges)."""
    import numpy as np

    if use_native is False:
        return None
    try:
        from hpccg_tpu import native
    except ImportError:
        return None
    if not native.available():
        return None
    n = ell.local_nrow
    vals = np.asarray(ell.vals)
    dd = vals.dtype.itemsize == 8
    cols = np.asarray(ell.cols, np.int64)
    valid = np.asarray(ell.valid)
    width = vals.shape[1]
    if n == 0 or width == 0 or not valid.any():
        return None
    offs = np.where(valid, cols - np.arange(n)[:, None], 0)
    bw_lo = max(0, int(-offs.min()))
    bw_hi = max(0, int(offs.max()))
    W_el = strip_chunks * LANE
    pbl = _cdiv(bw_lo, LANE) * LANE
    S = (bw_hi + pbl) // W_el + 1
    k_s = SUB + strip_chunks
    assert k_s * LANE <= 32767  # li fits int16
    scan = native.stack_scan(n, width, cols, valid, pbl, W_el, S)
    if scan is None:
        return None
    widths, lo_sw, hi_sw = scan
    keep = np.nonzero(widths)[0]
    if keep.size == 0:
        return None
    base = np.full(S, -1, np.int64)
    base[keep] = np.concatenate([[0], np.cumsum(widths[keep])[:-1]])
    wtot = int(widths[keep].sum())
    T = _cdiv(n, RT)
    lo_b = np.zeros(wtot, np.int64)
    hi_b = np.zeros(wtot, np.int64)
    strips_meta = []
    for s in keep:
        w0, ws = int(base[s]), int(widths[s])
        lo_b[w0 : w0 + ws] = lo_sw[s, :ws]
        hi_b[w0 : w0 + ws] = hi_sw[s, :ws]
        strips_meta.append(
            (
                w0, ws, int(s) * strip_chunks, k_s,
                tuple(
                    (int(lo_sw[s, j]), int(hi_sw[s, j])) for j in range(ws)
                ),
            )
        )
    xp_chunks = max(
        (T - 1) * SUB + woff + k for (_w0, _ws, woff, k, _b) in strips_meta
    )
    if not gell_stack_supported(n, xp_chunks, wtot, dd=dd):
        raise ValueError(
            f"{n} rows x {wtot} stacked slots: the VMEM-resident x window / "
            "slot blocks exceed the kernel budget (gell_stack_supported)"
        )
    vp4 = np.zeros((T, wtot, SUB, LANE), np.float32)
    vp4lo = np.zeros((T, wtot, SUB, LANE), np.float32) if dd else None
    lp4 = np.empty((T, wtot, SUB, LANE), np.int16)
    lp4[:] = (lo_b * LANE).astype(np.int16)[None, :, None, None]
    if not native.stack_fill(
        n, width, vals, cols, valid, pbl, W_el, S, base, wtot, dd,
        vp4, vp4lo, lp4,
    ):
        return None
    return GellStackMatrix(
        vals3=jnp.asarray(vp4),
        vals3lo=jnp.asarray(vp4lo) if dd else None,
        li3=jnp.asarray(lp4),
        n=n,
        wtot=wtot,
        strips=tuple(strips_meta),
        pbl=pbl,
        xp_chunks=int(xp_chunks),
        total_nrow=ell.total_nrow or n,
        nnz_count=int(ell.nnz),
    )


def prepare_gell_stack(
    ell, *, strip_chunks: int = 16, use_native: bool | None = None
) -> GellStackMatrix:
    """Host-side preprocessing of an EllMatrix into strip-bucketed form.

    f64 matrices split into exact (hi, lo) f32 planes for the compensated
    strip-gather kernel. Raises ValueError when the VMEM-resident x / slot
    blocks exceed the kernel budget.

    use_native: None = prefer the csrc fast path (exactly equal output,
    tests/test_gell_stack.py pins it) with NumPy fallback; False forces
    NumPy; True raises if the native library is unavailable."""
    import numpy as np

    if ell.start_row != 0:
        raise ValueError("prepare_gell_stack needs the assembled matrix")
    nat = _prepare_gell_stack_native(
        ell, strip_chunks=strip_chunks, use_native=use_native
    )
    if nat is not None:
        return nat
    if use_native is True:
        from hpccg_tpu import native

        if not native.available():
            raise RuntimeError("native stack prep unavailable (csrc not built?)")
        # degenerate matrix (empty / all-invalid): the NumPy branch owns it
    n, dd, vdt, vals, cols, valid, width, bw_lo, bw_hi = _normalize_sorted(ell)
    W_el = strip_chunks * LANE
    pbl = _cdiv(bw_lo, LANE) * LANE
    offs = np.where(valid, cols - np.arange(n)[:, None], 0)
    # strip id on the chunk-aligned grid: s = (off + pbl) // W_el, so strip
    # s's window starts at element f_s = s*W_el - pbl (chunk-aligned)
    sid = np.where(valid, (offs + pbl) // W_el, np.iinfo(np.int64).max)
    S = int(sid[valid].max()) + 1 if valid.any() else 1
    if not valid.any():
        S = 0

    T = _cdiv(n, RT)
    npad = T * RT
    k_s = SUB + strip_chunks  # fixed per-strip window: 8 tile chunks + strip
    assert k_s * LANE <= 32767  # li fits int16

    tile_base = (np.arange(n) // RT) * RT

    # Within a row sorted by column, offsets are sorted too, so each strip's
    # entries form a CONTIGUOUS RUN — slot-within-strip is position minus
    # run start, computed in one vectorized pass (no per-strip argsorts;
    # the per-strip loop was minutes at 1M x 27 x 60 strips).
    slot_in_strip = _strip_runs(sid, valid)

    # per-strip widths: max run length per strip id, one bincount pass
    widths = _strip_widths(sid, slot_in_strip, valid, sid.shape[1], S)
    keep = np.nonzero(widths)[0]
    if keep.size == 0:
        # all-zero matrix: one empty strip keeps the shapes legal
        strips_meta = [(0, 1, 0, k_s, ((0, 0),))]
        wtot = 1
        vp4 = np.zeros((T, 1, SUB, LANE), vdt)
        lp4 = np.zeros((T, 1, SUB, LANE), np.int16)
    else:
        # base output column per (kept) strip
        base = np.full(S, -1, np.int64)
        base[keep] = np.concatenate([[0], np.cumsum(widths[keep])[:-1]])
        wtot = int(widths[keep].sum())

        # window-local indices: li = col - tile_base - f_s with
        # f_s = s*W_el - pbl. Flat (nnz,)-sized COO vectors only — dense
        # (npad, wtot) int64 temporaries cost multi-GB passes at 1M x 600
        vsel = valid
        row_flat = np.nonzero(vsel)[0]
        li_flat = cols[vsel] - tile_base[row_flat] - (sid[vsel] * W_el - pbl)
        out_flat = (base[sid[vsel]] + slot_in_strip[vsel]).astype(np.int64)
        assert li_flat.min() >= 0 and li_flat.max() < k_s * LANE

        # per-slot static chunk bounds (ci = li >> 7) via one sort +
        # reduceat (ufunc.at is orders of magnitude slower at 26M entries)
        ci_flat = li_flat >> 7
        order = np.argsort(out_flat, kind="stable")
        oc_sorted = out_flat[order]
        ci_sorted = ci_flat[order]
        starts = np.searchsorted(oc_sorted, np.arange(wtot))
        ends = np.searchsorted(oc_sorted, np.arange(wtot), side="right")
        lo_b = np.zeros(wtot, np.int64)
        hi_b = np.zeros(wtot, np.int64)
        nonempty = ends > starts
        if nonempty.any():
            lo_b[nonempty] = np.minimum.reduceat(ci_sorted, starts[nonempty])
            hi_b[nonempty] = np.maximum.reduceat(ci_sorted, starts[nonempty])

        # park value per slot column, then scatter the real entries —
        # DIRECTLY in the (T, wtot, 8, 128) tile layout (building (npad,
        # wtot) and transposing paid a 28 s strided ascontiguousarray at
        # 1M x 300)
        vp4 = np.zeros((T, wtot, SUB, LANE), vdt)
        lp4 = np.empty((T, wtot, SUB, LANE), np.int16)
        lp4[:] = (lo_b * LANE).astype(np.int16)[None, :, None, None]
        t_i = row_flat // RT
        s_i = (row_flat % RT) // LANE
        l_i = row_flat % LANE
        vp4[t_i, out_flat, s_i, l_i] = vals[vsel]
        lp4[t_i, out_flat, s_i, l_i] = li_flat.astype(np.int16)

        strips_meta = []
        for s in keep:
            w0 = int(base[s])
            ws = int(widths[s])
            bounds = tuple(
                (int(lo_b[w0 + j]), int(hi_b[w0 + j])) for j in range(ws)
            )
            strips_meta.append((w0, ws, int(s) * strip_chunks, k_s, bounds))

    # the furthest chunk any tile's window touches
    xp_chunks = max(
        (T - 1) * SUB + woff + k for (_w0, _ws, woff, k, _b) in strips_meta
    )
    if not gell_stack_supported(n, xp_chunks, wtot, dd=dd):
        raise ValueError(
            f"{n} rows x {wtot} stacked slots: the VMEM-resident x window / "
            "slot blocks exceed the kernel budget (gell_stack_supported)"
        )

    if dd:
        vhi = vp4.astype(np.float32)
        vlo = (vp4 - vhi.astype(np.float64)).astype(np.float32)
        vals3, vals3lo = jnp.asarray(vhi), jnp.asarray(vlo)
    else:
        vals3, vals3lo = jnp.asarray(vp4), None
    return GellStackMatrix(
        vals3=vals3,
        vals3lo=vals3lo,
        li3=jnp.asarray(lp4),
        n=n,
        wtot=wtot,
        strips=tuple(strips_meta),
        pbl=pbl,
        xp_chunks=int(xp_chunks),
        total_nrow=ell.total_nrow or n,
        nnz_count=int(ell.nnz),
    )


def _kernel_stack(xp_ref, vals_ref, li_ref, y_ref, *, strips: tuple):
    t = pl.program_id(0)
    acc = jnp.zeros((SUB, LANE), xp_ref.dtype)
    for w0, width_s, woff, k_s, bounds in strips:
        # this strip's x window: k_s chunks starting at its static offset
        xw = xp_ref[pl.ds(t * SUB + woff, k_s)]  # (k_s, 128)
        for j in range(width_s):
            w = w0 + j
            li = li_ref[0, w].astype(jnp.int32)
            ll = jnp.bitwise_and(li, LANE - 1)
            ci = jnp.right_shift(li, 7)
            g = jnp.zeros((SUB, LANE), xp_ref.dtype)
            lo, hi = bounds[j]
            for k in range(lo, hi + 1):
                chunk = jnp.broadcast_to(xw[k : k + 1], (SUB, LANE))
                g = jnp.where(ci == k, _lane_take(chunk, ll), g)
            acc = acc + vals_ref[0, w] * g
    y_ref[0] = acc


@partial(jax.jit, static_argnums=(3, 4))
def _spmv_stack(vals3, li3, xp2, strips: tuple, interpret: bool):
    T = vals3.shape[0]
    wtot = vals3.shape[1]
    z = _i0()  # i32-pinned index-map literals (the Mosaic-under-x64 hazard)
    return pl.pallas_call(
        partial(_kernel_stack, strips=strips),
        grid=(T,),
        in_specs=[
            pl.BlockSpec(xp2.shape, lambda t: (z, z), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wtot, SUB, LANE), lambda t: (t, z, z, z)),
            pl.BlockSpec((1, wtot, SUB, LANE), lambda t: (t, z, z, z)),
        ],
        out_specs=pl.BlockSpec((1, SUB, LANE), lambda t: (t, z, z)),
        out_shape=jax.ShapeDtypeStruct((T, SUB, LANE), vals3.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=STACK_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(xp2, vals3, li3)


def spmv_gell_stack(
    A: GellStackMatrix, x: jax.Array, *, interpret: bool | None = None
) -> jax.Array:
    """y = A @ x in ONE pallas call: per tile, each strip's window is loaded
    at its static offset and its slots chunk-scanned (gell_kernel's lane
    gather)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    assert A.vals3lo is None, "f64 GellStackMatrix: use spmv_gell_stack_dd"
    xp = jnp.zeros((A.xp_chunks * LANE,), jnp.float32)
    xp = jax.lax.dynamic_update_slice(xp, x.astype(jnp.float32), (A.pbl,))
    y = _spmv_stack(A.vals3, A.li3, xp.reshape(-1, LANE), A.strips, interpret)
    return y.reshape(-1)[: A.n]


def _kernel_stack_dd(
    xph_ref, xpl_ref, valsh_ref, valsl_ref, li_ref, yhi_ref, ylo_ref,
    *, strips: tuple,
):
    """Double-float strip-gather tile: gell_kernel._kernel_dd's compensated
    accumulation (every product feeding the accumulators exact by split12
    construction) with the shifted windows replaced by per-strip windows at
    strip-static offsets."""
    from hpccg_tpu.ops.pallas.ddmath import (
        df_add, fast_two_sum, split12, two_sum,
    )

    t = pl.program_id(0)
    f32 = jnp.float32
    sh = jnp.zeros((SUB, LANE), f32)  # main double-f32 accumulator
    sl = jnp.zeros((SUB, LANE), f32)
    th = jnp.zeros((SUB, LANE), f32)  # eps-scale terms accumulator
    tl = jnp.zeros((SUB, LANE), f32)
    for w0, width_s, woff, k_s, bounds in strips:
        xwh = xph_ref[pl.ds(t * SUB + woff, k_s)]  # (k_s, 128) hi window
        xwl = xpl_ref[pl.ds(t * SUB + woff, k_s)]  # (k_s, 128) lo window
        for j in range(width_s):
            w = w0 + j
            li = li_ref[0, w].astype(jnp.int32)
            ll = jnp.bitwise_and(li, LANE - 1)
            ci = jnp.right_shift(li, 7)
            gh = jnp.zeros((SUB, LANE), f32)
            gl = jnp.zeros((SUB, LANE), f32)
            lo_b, hi_b = bounds[j]
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


@partial(jax.jit, static_argnums=(5, 6))
def _spmv_stack_dd(vals3, vals3lo, li3, xp2h, xp2l, strips: tuple, interpret: bool):
    T = vals3.shape[0]
    wtot = vals3.shape[1]
    # this kernel ONLY runs under jax_enable_x64 (the f64 tier): index-map
    # literals must be i32-pinned or Mosaic rejects the lowering
    z = _i0()
    xshape = xp2h.shape
    return pl.pallas_call(
        partial(_kernel_stack_dd, strips=strips),
        grid=(T,),
        in_specs=[
            pl.BlockSpec(xshape, lambda t: (z, z), memory_space=pltpu.VMEM),  # xp hi
            pl.BlockSpec(xshape, lambda t: (z, z), memory_space=pltpu.VMEM),  # xp lo
            pl.BlockSpec((1, wtot, SUB, LANE), lambda t: (t, z, z, z)),
            pl.BlockSpec((1, wtot, SUB, LANE), lambda t: (t, z, z, z)),
            pl.BlockSpec((1, wtot, SUB, LANE), lambda t: (t, z, z, z)),
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
            vmem_limit_bytes=STACK_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(xp2h, xp2l, vals3, vals3lo, li3)


def spmv_gell_stack_dd(
    A: GellStackMatrix, x: jax.Array, *, interpret: bool | None = None
) -> jax.Array:
    """f64 y = A @ x through the double-float strip-gather kernel (~1e-14
    rel) — the f64 WIDE-scatter tier (gell_kernel.spmv_gell_dd covers the
    narrow-band case)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    assert A.vals3lo is not None, "f32 GellStackMatrix: use spmv_gell_stack"
    xp = jnp.zeros((A.xp_chunks * LANE,), jnp.float64)
    xp = jax.lax.dynamic_update_slice(xp, x.astype(jnp.float64), (A.pbl,))
    xh = xp.astype(jnp.float32)
    xl = (xp - xh.astype(jnp.float64)).astype(jnp.float32)
    yhi, ylo = _spmv_stack_dd(
        A.vals3, A.vals3lo, A.li3, xh.reshape(-1, LANE), xl.reshape(-1, LANE),
        A.strips, interpret,
    )
    y = yhi.astype(jnp.float64) + ylo.astype(jnp.float64)
    return y.reshape(-1)[: A.n]


def stack_shard_geometry(A: GellStackMatrix, ndev: int):
    """(T_local, xw_chunks) for running the stack kernel row-sharded over
    ndev devices on an all-gathered x: shard r runs tiles [r*T_l, (r+1)*T_l)
    with its x window sliced from the padded global x at chunk r*T_l*SUB —
    the kernel's per-tile ``pl.ds(t*SUB + woff, k)`` indexing then works
    unchanged with the LOCAL tile id. Raises when the padded rows do not
    split into whole tiles per shard (pad with io.pad_problem_rows to a
    ndev*1024 multiple) or a shard's window state exceeds the VMEM budget."""
    T = A.vals3.shape[0]
    if A.n != T * RT or T % ndev:
        raise ValueError(
            f"{A.n} rows / {T} tiles do not split into {ndev} whole-tile "
            f"shards; pad rows to a multiple of {ndev * RT} "
            "(io.pad_problem_rows)"
        )
    T_l = T // ndev
    xw_chunks = (T_l - 1) * SUB + max(
        woff + k for (_w0, _ws, woff, k, _b) in A.strips
    )
    if not gell_stack_supported(
        T_l * RT, xw_chunks, A.wtot, dd=A.vals3lo is not None
    ):
        raise ValueError(
            f"{T_l * RT}-row shards x {A.wtot} stacked slots: the shard's "
            "x window / slot blocks exceed the kernel budget"
        )
    return T_l, xw_chunks


def spmv_gell_stack_shard(
    vals3: jax.Array,
    li3: jax.Array,
    x_global: jax.Array,
    shard_idx,
    *,
    strips: tuple,
    pbl: int,
    xp_chunks: int,
    xw_chunks: int,
    vals3lo: jax.Array | None = None,
    interpret: bool | None = None,
) -> jax.Array:
    """One shard's rows of the global matvec (inside shard_map): slice this
    shard's xw_chunks-chunk window out of the padded global x at chunk
    shard_idx*T_l*SUB and run the stack kernel over the shard's tiles.
    x_global is the all-gathered solution vector — the wide-scatter class
    has no neighbor-halo structure, so the comm plan is one all_gather per
    matvec and the speedup is the sharded kernel compute."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    T_l = vals3.shape[0]
    dd = vals3lo is not None
    xp = jnp.zeros((xp_chunks * LANE,), jnp.float64 if dd else jnp.float32)
    xp = jax.lax.dynamic_update_slice(xp, x_global.astype(xp.dtype), (pbl,))
    xw = jax.lax.dynamic_slice(
        xp.reshape(-1, LANE),
        (jnp.int32(shard_idx) * jnp.int32(T_l * SUB), _i0()),
        (xw_chunks, LANE),
    )
    if dd:
        xh = xw.astype(jnp.float32)
        xl = (xw - xh.astype(jnp.float64)).astype(jnp.float32)
        yhi, ylo = _spmv_stack_dd(vals3, vals3lo, li3, xh, xl, strips, interpret)
        y = yhi.astype(jnp.float64) + ylo.astype(jnp.float64)
    else:
        y = _spmv_stack(vals3, li3, xw, strips, interpret)
    return y.reshape(-1)


def stack_to_ell(A: GellStackMatrix):
    """Reconstruct the padded-ELL form (lossless: stacks never store zero
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


def stack_cost_model(ell, *, strip_chunks: int = 16, _norm=None):
    """(ok, gnnz_rate, wtot) — the chooser's model WITHOUT building the
    operator: per-slot cost ~ 0.027 + 0.0014 * k ns (gell_kernel's measured
    fit, k = the strip window's chunk count) divided by the slot inflation
    wtot * n / nnz. One vectorized pass over the entries.

    ``_norm``: a precomputed _normalize_sorted(ell) tuple — the chooser
    sweeps several strip widths and the per-row column sort is identical
    across them (auto_structure passes it once instead of paying ~4
    full-matrix sorts)."""
    import numpy as np

    n, dd, vdt, vals, cols, valid, width, bw_lo, bw_hi = (
        _norm if _norm is not None else _normalize_sorted(ell)
    )
    if dd and jax.default_backend() != "tpu":
        # the interpret-mode dd strip gather off-chip is slower than the
        # exact XLA/ELL paths (same policy as gell_kernel's dd tier)
        return False, 0.0, 0
    W_el = strip_chunks * LANE
    pbl = _cdiv(bw_lo, LANE) * LANE
    offs = np.where(valid, cols - np.arange(n)[:, None], 0)
    sid = np.where(valid, (offs + pbl) // W_el, -1)
    S = int(sid.max()) + 1 if valid.any() else 0
    if S <= 0:
        return False, 0.0, 0
    # per-strip width = max per-row count = max run length (rows sorted by
    # column), one bincount pass — same path as prepare_gell_stack
    wtot = int(
        _strip_widths(sid, _strip_runs(sid, valid), valid, sid.shape[1], S).sum()
    )
    nnz = int(valid.sum())
    if nnz == 0:
        return False, 0.0, 0
    k_s = SUB + strip_chunks
    T = _cdiv(n, RT)
    xp_chunks = (T - 1) * SUB + S * strip_chunks + k_s
    if not gell_stack_supported(n, xp_chunks, wtot, dd=dd):
        return False, 0.0, wtot
    inflation = (wtot * n) / nnz
    rate = (1.0 / (0.027 + 0.0014 * k_s)) / max(inflation, 1.0)
    if dd:
        # two gathers + the compensated products roughly double the
        # per-slot VPU work (the gell dd tier's measured factor)
        rate *= 0.5
    return True, rate, wtot
