"""Blocked-DIA SpMV Pallas kernel — the fast *general* explicit-matrix path.

The reference SpMV (HPC_sparsemv.cpp:68-87) runs any CSR matrix at memory
speed because CPUs/GPUs have hardware gather. TPUs do not: the VPU addresses
vregs, not arbitrary VMEM, so a per-nonzero gather (EllMatrix.matvec's
jnp.take) is orders of magnitude off the roofline. The TPU-native answer for
explicit matrices is diagonal storage: every nonzero of a matrix with
offsets(A) = {col - row} lives on one of ndiag diagonals, and a diagonal's
contribution to y = A@x is an elementwise multiply with a *shifted* x — no
data-dependent addressing at all.

ops/operators.DiaMatrix handles <= ~128 diagonals as an unrolled XLA fusion.
This kernel removes the diagonal-count limit (the VERDICT round-1 gap: a
"random >= 256-diagonal" matrix): diagonal data streams from HBM in blocks
while x stays VMEM-resident, and each diagonal's shift decomposes into

    off = 128*q + r  (floor division) =>
    x_flat[i + off] = select(lane < 128 - r,
                             rot_r(xp[rowblk + q    ])[lane],
                             rot_r(xp[rowblk + q + 1])[lane])

one dynamic sublane slice + one dynamic lane rotate + one select per
diagonal — all vectorized VPU work with *scalar-prefetched* offsets (the
comm-plan analog: the sparsity pattern is data, not code). x is zero-padded
by the bandwidth on both ends, so out-of-range shifts read exact zeros and
no masking is needed (DiaMatrix stores zeros outside each diagonal's valid
range by construction).

Cost model: traffic = 4 B per stored diagonal slot (value only; no column
indices — the reference CSR format pays >= 12 B/nnz), and the stream is
read-dominated, which on a v5e runs at ~716 GB/s (not the ~330 GB/s mixed
read+write rate — see PERF.md's direction-asymmetry probes): measured
~179 Gslots/s standalone and ~188 Gslots/s inside end-to-end CG at 257
diagonals x 1M rows, independent of ndiag.
"""

from __future__ import annotations

import functools
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
# swept on v5e (exp + PERF.md): RB=256/DG=8 streams diagonal data at
# ~716 GB/s (~179 Gslots/s) vs 477 GB/s at RB=64 — bigger y blocks amortize
# the per-diagonal shift work and the revisit pipeline
RB_ROWS = 256  # sublane rows per y block: 256*128 elements (128 KB f32)
DG = 8  # diagonals per data block
DIA_VMEM_LIMIT = 100 << 20


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def dia_pallas_supported(ndiag_offsets, n: int, dtype) -> bool:
    """True when this (offsets, n, dtype) can run the Pallas DIA kernel on
    the current backend: 32-bit data (Mosaic rotate is 32-bit only) and the
    bandwidth-padded x fits VMEM."""
    if jnp.dtype(dtype).itemsize != 4:
        return False
    qmin = min(ndiag_offsets) // LANE if ndiag_offsets else 0
    qmax = max(ndiag_offsets) // LANE if ndiag_offsets else 0
    pad_lo = max(0, -qmin) + RB_ROWS
    pad_hi = max(0, qmax + 1) + RB_ROWS
    rows = _cdiv(n, LANE) + pad_lo + pad_hi
    xp_bytes = rows * LANE * jnp.dtype(dtype).itemsize
    blocks = (2 * DG * RB_ROWS * LANE + 2 * RB_ROWS * LANE) * jnp.dtype(dtype).itemsize
    return xp_bytes + blocks + (4 << 20) <= DIA_VMEM_LIMIT


def _kernel(offs_ref, xp_ref, data_ref, y_ref, *, pad_lo: int):
    """Grid (row_blocks, diag_blocks); y block revisited across diag steps."""
    d = pl.program_id(1)

    @pl.when(d == 0)
    def _():
        y_ref[:] = jnp.zeros_like(y_ref)

    lane = jax.lax.broadcasted_iota(jnp.int32, (RB_ROWS, LANE), 1)
    # pin the lane constant to i32: under jax_enable_x64 the Python literal
    # traces as a weak i64, whose promotion convert Mosaic cannot lower
    # (infinite _convert_helper recursion) — bites every f64 run
    lc = jnp.asarray(LANE, jnp.int32)
    acc = y_ref[:]
    for j in range(DG):
        idx = d * DG + j
        off = offs_ref[idx]
        q = jnp.floor_divide(off, lc)
        r = off - q * lc  # in [0, 128)
        # xp rows [pad_lo + base + q, +RB_ROWS+1): base is handled by the
        # x BlockSpec being the FULL array; slice dynamically here.
        base = pl.program_id(0) * RB_ROWS
        sl = xp_ref[pl.ds(pad_lo + base + q, RB_ROWS + 1)]
        rot = pltpu.roll(sl, (lc - r) % lc, axis=1)
        g = jnp.where(lane < lc - r, rot[0:RB_ROWS], rot[1 : RB_ROWS + 1])
        contrib = data_ref[j] * g
        # diagonal slots past the real ndiag are zero-padded data: no mask
        acc = acc + contrib
    y_ref[:] = acc


# index-map literals must be i32: under jax_enable_x64 a Python 0 traces as
# i64 in the lowered transform function and Mosaic rejects it (this bit the
# whole-array xp spec's default (0, 0) map on every f64 run)
from hpccg_tpu.ops.pallas.ddmath import i0 as _i0  # noqa: E402


@partial(jax.jit, static_argnums=(0, 3))
def _spmv_dia_pallas(offsets, data2, xp, interpret: bool):
    ndiag_pad, nrows, _ = data2.shape
    qmin = min(offsets) // LANE if offsets else 0
    pad_lo = max(0, -qmin) + RB_ROWS
    grid = (nrows // RB_ROWS, ndiag_pad // DG)
    offs_arr = jnp.asarray(
        offsets + (0,) * (ndiag_pad - len(offsets)), jnp.int32
    )
    z = _i0()
    return pl.pallas_call(
        partial(_kernel, pad_lo=pad_lo),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    xp.shape, lambda i, d, offs: (z, z),
                    memory_space=pltpu.VMEM,
                ),  # xp: whole array, explicit i32 map
                pl.BlockSpec(
                    (DG, RB_ROWS, LANE),
                    lambda i, d, offs: (d, i, z),
                ),
            ],
            out_specs=pl.BlockSpec(
                (RB_ROWS, LANE), lambda i, d, offs: (i, z)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((nrows, LANE), data2.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=DIA_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(offs_arr, xp, data2)


@functools.lru_cache(maxsize=64)
def _plan(offsets: tuple, n: int):
    """Static padding plan for an (offsets, n) sparsity pattern."""
    nrows = _cdiv(n, LANE)
    nrows_pad = _cdiv(nrows, RB_ROWS) * RB_ROWS
    qmin = min(offsets) // LANE if offsets else 0
    qmax = max(offsets) // LANE if offsets else 0
    pad_lo = max(0, -qmin) + RB_ROWS
    pad_hi = max(0, qmax + 1) + RB_ROWS
    ndiag_pad = _cdiv(len(offsets), DG) * DG
    return nrows, nrows_pad, pad_lo, pad_hi, ndiag_pad


def _pad_data(data, offsets: tuple, n: int):
    """Block-pad the (ndiag, n) diagonal data for the kernel's layout."""
    _, nrows_pad, _, _, ndiag_pad = _plan(offsets, n)
    data2 = jnp.zeros((ndiag_pad, nrows_pad * LANE), data.dtype)
    data2 = jax.lax.dynamic_update_slice(data2, data, (0, 0))
    return data2.reshape(ndiag_pad, nrows_pad, LANE)


# The padded diagonal data is a pure function of the (constant) matrix, so
# building it inside a jitted solve would let XLA constant-fold a multi-GB
# literal into the executable (measured: a 1 GB data2 stalls the AOT compile
# for minutes). Prepare it ONCE, eagerly, outside any trace, and cache per
# underlying data buffer. Keys are id()s, revalidated via weakref to rule
# out id reuse after the original array is freed.
_prepared: dict = {}


def _cache_put(cache: dict, key, ref_obj, value):
    """Insert with eviction: entries whose source array died are dropped
    FIRST (their cached device buffers can be GB-scale), then a size
    backstop clears everything."""
    import weakref

    for k in [k for k, (r, _) in cache.items() if r() is None]:
        del cache[k]
    if len(cache) > 16:
        cache.clear()
    cache[key] = (weakref.ref(ref_obj), value)


def _prepared_data(A, dtype):
    key = (id(A.data), jnp.dtype(dtype).name)
    hit = _prepared.get(key)
    if hit is not None:
        ref, data2 = hit
        if ref() is A.data:
            return data2
    offsets = tuple(int(o) for o in A.offsets)
    data2 = jax.jit(_pad_data, static_argnums=(1, 2))(
        A.data.astype(dtype), offsets, A.local_nrow
    )
    data2 = jax.block_until_ready(data2)
    _cache_put(_prepared, key, A.data, data2)
    return data2


def spmv_dia_prepared(
    offsets: tuple,
    data2: jax.Array,
    x: jax.Array,
    n: int,
    halo_lo: jax.Array | None = None,
    halo_hi: jax.Array | None = None,
    interpret: bool | None = None,
) -> jax.Array:
    """y = A @ x from pre-padded diagonal data (see _pad_data), with the
    bandwidth padding optionally FILLED with neighbor halo values.

    This is the distributed entry point: a row shard's matrix references
    x values up to bw_lo below and bw_hi above its range — exactly the
    region the kernel's xp padding already reserves for boundary-clipping
    zeros. Writing the ppermuted halo strips there makes the same kernel
    compute the shard's rows of the GLOBAL matvec (zeros at true global
    edges arrive naturally as ppermute's zero fill)."""
    nrows, nrows_pad, pad_lo, pad_hi, ndiag_pad = _plan(offsets, n)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    dtype = x.dtype
    xp = jnp.zeros(((pad_lo + nrows_pad + pad_hi) * LANE,), dtype)
    base = pad_lo * LANE
    xp = jax.lax.dynamic_update_slice(xp, x, (base,))
    if halo_lo is not None and halo_lo.shape[0]:
        xp = jax.lax.dynamic_update_slice(
            xp, halo_lo.astype(dtype), (base - halo_lo.shape[0],)
        )
    if halo_hi is not None and halo_hi.shape[0]:
        xp = jax.lax.dynamic_update_slice(xp, halo_hi.astype(dtype), (base + n,))
    y = _spmv_dia_pallas(offsets, data2, xp.reshape(-1, LANE), interpret)
    return y.reshape(-1)[:n]


def prepare_dia_shards(A, ndev: int):
    """Per-shard pre-padded diagonal data for the distributed pallas path:
    (ndev, ndiag_pad, nrows_pad, LANE), to be sharded on axis 0. Eager —
    never trace this into a solve (see _prepared_data's literal hazard)."""
    import numpy as np

    n = A.local_nrow
    if n % ndev:
        raise ValueError(f"{n} rows do not divide {ndev} shards")
    L = n // ndev
    offsets = tuple(int(o) for o in A.offsets)
    data = np.asarray(A.data)
    ndiag = data.shape[0]
    _, nrows_pad, _, _, ndiag_pad = _plan(offsets, L)
    # plain NumPy pad (the same layout _pad_data builds), ONE device upload
    out = np.zeros((ndev, ndiag_pad, nrows_pad * LANE), data.dtype)
    for r in range(ndev):
        out[r, :ndiag, :L] = data[:, r * L : (r + 1) * L]
    return jnp.asarray(out.reshape(ndev, ndiag_pad, nrows_pad, LANE))


def spmv_dia_pallas(A, x: jax.Array, *, interpret: bool | None = None) -> jax.Array:
    """y = A @ x for a DiaMatrix with any number of diagonals.

    The x zero-extension (bandwidth padding) is jit-fused XLA — it depends
    on x, so it stays an op; the block-padded diagonal data is prepared once
    per matrix (see _prepared_data) and enters the program as a plain device
    buffer. The MAC sweep is the Pallas kernel above.
    """
    n = A.local_nrow
    offsets = tuple(int(o) for o in A.offsets)
    nrows, nrows_pad, pad_lo, pad_hi, ndiag_pad = _plan(offsets, n)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    dtype = x.dtype
    xp = jnp.zeros(((pad_lo + nrows_pad + pad_hi) * LANE,), dtype)
    xp = jax.lax.dynamic_update_slice(xp, x.astype(dtype), (pad_lo * LANE,))
    xp = xp.reshape(-1, LANE)

    if isinstance(A.data, jax.core.Tracer):
        data2 = _pad_data(A.data.astype(dtype), offsets, n)  # traced fallback
    else:
        data2 = _prepared_data(A, dtype)

    y = _spmv_dia_pallas(offsets, data2, xp, interpret)
    return y.reshape(-1)[:n]


# ---------------------------------------------------------------------------
# PreparedDia — the solve-ready form
# ---------------------------------------------------------------------------
# A DiaMatrix whose data has been block-padded ONCE into the kernel layout.
# Passing a raw DiaMatrix as a jit argument makes the padding part of the
# traced program, and XLA does NOT reliably hoist the (potentially GB-scale)
# copy out of the CG loop — measured 30 Gslots/s with the pad in-loop vs
# 179 Gslots/s prepared. make_cg converts automatically.

import dataclasses as _dc


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["data2"],
    meta_fields=["offsets", "n", "total_nrow", "nnz_count"],
)
@_dc.dataclass(frozen=True)
class PreparedDia:
    """Kernel-layout DIA operator: data2 is (ndiag_pad, nrows_pad, LANE)."""

    data2: jax.Array
    offsets: tuple
    n: int
    total_nrow: int
    nnz_count: int

    @property
    def local_nrow(self) -> int:
        return self.n

    @property
    def ndiag(self) -> int:
        return len(self.offsets)

    @property
    def dtype(self):
        return self.data2.dtype

    @property
    def nnz(self) -> int:
        return self.nnz_count

    def matvec(self, x: jax.Array) -> jax.Array:
        offsets = self.offsets
        n = self.n
        nrows, nrows_pad, pad_lo, pad_hi, ndiag_pad = _plan(offsets, n)
        interpret = jax.default_backend() != "tpu"
        xp = jnp.zeros(((pad_lo + nrows_pad + pad_hi) * LANE,), x.dtype)
        xp = jax.lax.dynamic_update_slice(xp, x, (pad_lo * LANE,))
        y = _spmv_dia_pallas(
            offsets, self.data2.astype(x.dtype), xp.reshape(-1, LANE), interpret
        )
        return y.reshape(-1)[:n]

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.matvec(x)


_prepared_ops: dict = {}


def prepare_dia(A) -> PreparedDia:
    """Eagerly convert a DiaMatrix into the kernel-ready PreparedDia.

    Cached per data buffer: besides the layout pad, the nnz count is a full
    device pass — recomputing it on every eager matvec would dominate."""
    key = id(A.data)
    hit = _prepared_ops.get(key)
    if hit is not None:
        ref, prepared = hit
        if ref() is A.data:
            return prepared
    offsets = tuple(int(o) for o in A.offsets)
    prepared = PreparedDia(
        data2=_prepared_data(A, A.dtype),
        offsets=offsets,
        n=A.local_nrow,
        total_nrow=A.total_nrow or A.local_nrow,
        nnz_count=int(A.nnz),
    )
    _cache_put(_prepared_ops, key, A.data, prepared)
    return prepared


# ---------------------------------------------------------------------------
# Double-float (two-f32) blocked-DIA kernel — the f64 general path
# ---------------------------------------------------------------------------
# The reference runs everything in f64 (HPC_sparsemv.cpp:68-87). Mosaic has
# no f64 lowering, and the XLA unrolled-roll f64 path is capped at 256
# diagonals by compile time (reorder.py) — so a wide-band f64 file matrix
# previously had NO fast path. Here each f64 value is carried as an exact
# (hi, lo) f32 pair and the MAC sweep runs compensated f32 arithmetic:
#
#   a*x = (a1 + a2 + alo) * (x1 + x2 + xlo)        12-bit operand splits
#       = a1*x1                                    exact f32 product
#       + TwoSum(a1*x2, a2*x1)                     exact products, exact sum
#       + (a2*x2 + ahi*xlo) + alo*xhi              O(2^-24) terms
#
# accumulated into two double-f32 accumulators with error-free TwoSum
# transforms (renormalized once per slot). Worst-case error per output is
# O(ndiag * 2^-48) — f64-class residual floors — at pure-f32 VPU speed and
# 8 B/slot of stream traffic (vs the reference CSR's >= 12 B/nnz in f64).
# The x splits (x1, x2, xlo) are built once per matvec in XLA and stay
# VMEM-resident; diagonal (hi, lo) streams from HBM in blocks.

# error-free transform primitives shared with stencil_v2's dd kernel
# (split12 = integer-masked operand split: immune to XLA:CPU's
# fp-contract=fast, which breaks the arithmetic Veltkamp split — see
# ddmath's compiler-contract note)
from hpccg_tpu.ops.pallas.ddmath import (  # noqa: E402
    df_add as _df_add,
    fast_two_sum as _fast_two_sum,
    split12 as _split12,
    two_sum as _two_sum,
)


def dia_dd_supported(ndiag_offsets, n: int) -> bool:
    """Can the double-float DIA kernel run this (offsets, n): three
    bandwidth-padded f32 x-splits VMEM-resident + two diagonal streams."""
    qmin = min(ndiag_offsets) // LANE if ndiag_offsets else 0
    qmax = max(ndiag_offsets) // LANE if ndiag_offsets else 0
    pad_lo = max(0, -qmin) + RB_ROWS
    pad_hi = max(0, qmax + 1) + RB_ROWS
    rows = _cdiv(n, LANE) + pad_lo + pad_hi
    xp_bytes = 3 * rows * LANE * 4
    blocks = 2 * (2 * DG * RB_ROWS * LANE + 2 * RB_ROWS * LANE) * 4
    return xp_bytes + blocks + (8 << 20) <= DIA_VMEM_LIMIT


def _kernel_dd(
    offs_ref, x1_ref, x2_ref, xlo_ref, dhi_ref, dlo_ref,
    yhi_ref, ylo_ref, acc_ref, *, pad_lo: int
):
    """Grid (row_blocks, diag_blocks), diag innermost; acc_ref carries the
    two double-f32 accumulators across diag steps."""
    d = pl.program_id(1)
    nd = pl.num_programs(1)

    @pl.when(d == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    lane = jax.lax.broadcasted_iota(jnp.int32, (RB_ROWS, LANE), 1)
    lc = jnp.asarray(LANE, jnp.int32)  # i32-pinned (see _kernel)
    base = pl.program_id(0) * RB_ROWS
    sh, sl = acc_ref[0], acc_ref[1]  # main double-f32 accumulator
    th, tl = acc_ref[2], acc_ref[3]  # small-terms double-f32 accumulator
    for j in range(DG):
        off = offs_ref[d * DG + j]
        q = jnp.floor_divide(off, lc)
        r = off - q * lc

        def shifted(ref, q=q, r=r):
            sl_ = ref[pl.ds(pad_lo + base + q, RB_ROWS + 1)]
            rot = pltpu.roll(sl_, (lc - r) % lc, axis=1)
            return jnp.where(lane < lc - r, rot[0:RB_ROWS], rot[1 : RB_ROWS + 1])

        X1 = shifted(x1_ref)
        X2 = shifted(x2_ref)
        XLO = shifted(xlo_ref)
        XHI = X1 + X2  # exact: split halves recombine exactly
        ahi = dhi_ref[j]
        alo = dlo_ref[j]
        a1, a2 = _split12(ahi)
        p1 = a1 * X1  # exact (12b x 12b)
        v, verr = _two_sum(a1 * X2, a2 * X1)  # exact products
        u = (a2 * X2 + ahi * XLO) + alo * XHI  # O(2^-24) terms
        w = verr + u
        sh, sl = _df_add(sh, sl, p1)
        sh, sl = _df_add(sh, sl, v)
        th, tl = _df_add(th, tl, w)
        sh, sl = _fast_two_sum(sh, sl)  # renorm once per slot
    acc_ref[0], acc_ref[1] = sh, sl
    acc_ref[2], acc_ref[3] = th, tl

    @pl.when(d == nd - 1)
    def _():
        s, e = _two_sum(acc_ref[0], acc_ref[2])
        lo = (acc_ref[1] + acc_ref[3]) + e
        hi, lo2 = _fast_two_sum(s, lo)
        yhi_ref[:] = hi
        ylo_ref[:] = lo2


@partial(jax.jit, static_argnums=(0, 4))
def _spmv_dia_dd(offsets, data2_hi, data2_lo, xp3, interpret: bool):
    """xp3: (3, rows, LANE) f32 — the padded x1/x2/xlo splits."""
    ndiag_pad, nrows, _ = data2_hi.shape
    qmin = min(offsets) // LANE if offsets else 0
    pad_lo = max(0, -qmin) + RB_ROWS
    grid = (nrows // RB_ROWS, ndiag_pad // DG)
    offs_arr = jnp.asarray(offsets + (0,) * (ndiag_pad - len(offsets)), jnp.int32)
    z = _i0()
    xshape = xp3.shape[1:]
    return pl.pallas_call(
        partial(_kernel_dd, pad_lo=pad_lo),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(xshape, lambda i, d, offs: (z, z), memory_space=pltpu.VMEM),
                pl.BlockSpec(xshape, lambda i, d, offs: (z, z), memory_space=pltpu.VMEM),
                pl.BlockSpec(xshape, lambda i, d, offs: (z, z), memory_space=pltpu.VMEM),
                pl.BlockSpec((DG, RB_ROWS, LANE), lambda i, d, offs: (d, i, z)),
                pl.BlockSpec((DG, RB_ROWS, LANE), lambda i, d, offs: (d, i, z)),
            ],
            out_specs=(
                pl.BlockSpec((RB_ROWS, LANE), lambda i, d, offs: (i, z)),
                pl.BlockSpec((RB_ROWS, LANE), lambda i, d, offs: (i, z)),
            ),
            scratch_shapes=[pltpu.VMEM((4, RB_ROWS, LANE), jnp.float32)],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nrows, LANE), jnp.float32),
            jax.ShapeDtypeStruct((nrows, LANE), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=DIA_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(offs_arr, xp3[0], xp3[1], xp3[2], data2_hi, data2_lo)


def _split_x_dd(offsets: tuple, n: int, x, halo_lo=None, halo_hi=None):
    """f64 x -> padded (3, rows, LANE) f32 splits [x1, x2, xlo], with the
    optional neighbor halo written into the bandwidth padding first."""
    nrows, nrows_pad, pad_lo, pad_hi, _ = _plan(offsets, n)
    xp = jnp.zeros(((pad_lo + nrows_pad + pad_hi) * LANE,), x.dtype)
    base = pad_lo * LANE
    xp = jax.lax.dynamic_update_slice(xp, x, (base,))
    if halo_lo is not None and halo_lo.shape[0]:
        xp = jax.lax.dynamic_update_slice(
            xp, halo_lo.astype(x.dtype), (base - halo_lo.shape[0],)
        )
    if halo_hi is not None and halo_hi.shape[0]:
        xp = jax.lax.dynamic_update_slice(xp, halo_hi.astype(x.dtype), (base + n,))
    x_hi = xp.astype(jnp.float32)
    x_lo = (xp - x_hi.astype(xp.dtype)).astype(jnp.float32)
    x1, x2 = _split12(x_hi)
    return jnp.stack([x1, x2, x_lo]).reshape(3, -1, LANE)


def spmv_dia_dd_prepared(
    offsets: tuple,
    data2_hi: jax.Array,
    data2_lo: jax.Array,
    x: jax.Array,
    n: int,
    halo_lo: jax.Array | None = None,
    halo_hi: jax.Array | None = None,
    interpret: bool | None = None,
) -> jax.Array:
    """f64 y = A @ x from pre-split diagonal streams (double-f32 kernel),
    with optional neighbor halo filled into the bandwidth padding (the
    distributed entry point, like spmv_dia_prepared)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    xp3 = _split_x_dd(offsets, n, x, halo_lo, halo_hi)
    yhi, ylo = _spmv_dia_dd(offsets, data2_hi, data2_lo, xp3, interpret)
    y = yhi.astype(x.dtype) + ylo.astype(x.dtype)
    return y.reshape(-1)[:n]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["data2_hi", "data2_lo"],
    meta_fields=["offsets", "n", "total_nrow", "nnz_count"],
)
@_dc.dataclass(frozen=True)
class PreparedDiaDD:
    """Kernel-layout double-f32 DIA operator for f64 matrices."""

    data2_hi: jax.Array
    data2_lo: jax.Array
    offsets: tuple
    n: int
    total_nrow: int
    nnz_count: int

    @property
    def local_nrow(self) -> int:
        return self.n

    @property
    def ndiag(self) -> int:
        return len(self.offsets)

    @property
    def dtype(self):
        return jnp.dtype(jnp.float64)

    @property
    def nnz(self) -> int:
        return self.nnz_count

    def matvec(self, x: jax.Array) -> jax.Array:
        return spmv_dia_dd_prepared(
            self.offsets, self.data2_hi, self.data2_lo, x, self.n
        )

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.matvec(x)


_prepared_dd: dict = {}


def prepare_dia_dd(A) -> PreparedDiaDD:
    """Eagerly split an f64 DiaMatrix into kernel-layout (hi, lo) f32
    streams (exact: lo = data - f64(hi)). Cached per data buffer."""
    import numpy as np

    key = id(A.data)
    hit = _prepared_dd.get(key)
    if hit is not None:
        ref, prepared = hit
        if ref() is A.data:
            return prepared
    offsets = tuple(int(o) for o in A.offsets)
    n = A.local_nrow
    data = np.asarray(A.data, np.float64)
    hi = data.astype(np.float32)
    lo = (data - hi.astype(np.float64)).astype(np.float32)
    _, nrows_pad, _, _, ndiag_pad = _plan(offsets, n)
    out_hi = np.zeros((ndiag_pad, nrows_pad * LANE), np.float32)
    out_lo = np.zeros((ndiag_pad, nrows_pad * LANE), np.float32)
    out_hi[: len(offsets), :n] = hi
    out_lo[: len(offsets), :n] = lo
    prepared = PreparedDiaDD(
        data2_hi=jnp.asarray(out_hi.reshape(ndiag_pad, nrows_pad, LANE)),
        data2_lo=jnp.asarray(out_lo.reshape(ndiag_pad, nrows_pad, LANE)),
        offsets=offsets,
        n=n,
        total_nrow=A.total_nrow or n,
        nnz_count=int(A.nnz),
    )
    _cache_put(_prepared_dd, key, A.data, prepared)
    return prepared


def prepare_dia_dd_shards(A, ndev: int):
    """Per-shard (hi, lo) kernel-layout streams for the distributed
    double-f32 path: two (ndev, ndiag_pad, nrows_pad, LANE) arrays."""
    import numpy as np

    n = A.local_nrow
    if n % ndev:
        raise ValueError(f"{n} rows do not divide {ndev} shards")
    L = n // ndev
    offsets = tuple(int(o) for o in A.offsets)
    data = np.asarray(A.data, np.float64)
    hi = data.astype(np.float32)
    lo = (data - hi.astype(np.float64)).astype(np.float32)
    _, nrows_pad, _, _, ndiag_pad = _plan(offsets, L)
    out_hi = np.zeros((ndev, ndiag_pad, nrows_pad * LANE), np.float32)
    out_lo = np.zeros((ndev, ndiag_pad, nrows_pad * LANE), np.float32)
    for r in range(ndev):
        out_hi[r, : len(offsets), :L] = hi[:, r * L : (r + 1) * L]
        out_lo[r, : len(offsets), :L] = lo[:, r * L : (r + 1) * L]
    shape = (ndev, ndiag_pad, nrows_pad, LANE)
    return jnp.asarray(out_hi.reshape(shape)), jnp.asarray(out_lo.reshape(shape))
