"""Matrix / problem IO.

- read_hpc_row / write_hpc_row: the reference's "HPC row" text format
  (read_HPC_row.cpp:217-373; deprecated per README.md:114-118 but kept for
  parity). Token stream: ``total_nrow total_nnz``, then nnz-per-row counts,
  then (val, ind) pairs row-major, then (x, b, xexact) triples.
- dump_matlab: 1-indexed COO triplets for Matlab spconvert
  (dump_matlab_matrix.cpp:59-82).
- save_problem / load_problem: npz checkpoint of a Problem (+ optional CG
  state) — the persistence capability the reference lacks (SURVEY.md §5).

Host-side text parsing is vectorized NumPy (single fromstring pass), and an
optional C++ tokenizer (hpccg_tpu.native) accelerates the large-file path.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hpccg_tpu.models.stencil import Problem
from hpccg_tpu.operators import DiaMatrix, EllMatrix, StencilOperator


def _tokenize(path: str) -> np.ndarray:
    """All whitespace-separated numeric tokens as float64."""
    try:
        from hpccg_tpu import native

        toks = native.tokenize_file(path)
        if toks is not None:
            return toks
    except ImportError:
        pass
    # NumPy-2-safe parse (np.fromstring's text mode is removed in NumPy 2.x
    # mainline): bytes.split handles arbitrary whitespace/ragged lines in C,
    # and np.array converts the byte tokens to float64 in one vectorized pass
    with open(path, "rb") as f:
        data = f.read()
    toks = data.split()
    if not toks:
        return np.zeros((0,), np.float64)
    return np.array(toks, dtype=np.float64)


def _matrix_to_device(A):
    """Move a host-leaf (numpy) EllMatrix onto the device. The readers run
    ALL structure analysis (to_dia, auto_structure, RCM) on host arrays and
    upload only the representation that will actually solve: a device round
    trip of the full ELL through the axon tunnel measured ~2.5 s per MB of
    f32 readback (88 s for a 1M x 9 matrix), all of it wasted when the
    matrix converts to DIA/gell anyway."""
    if isinstance(A, EllMatrix) and not isinstance(A.vals, jax.Array):
        return dataclasses.replace(
            A,
            vals=jnp.asarray(A.vals),
            cols=jnp.asarray(A.cols),
            valid=jnp.asarray(A.valid),
        )
    return A


def read_hpc_row(
    path: str, *, dtype=jnp.float64, to_dia: bool = True, device: bool = True
) -> Tuple[Problem, jax.Array]:
    """Load an HPC-row file into an explicit-matrix Problem.

    Returns (problem, x_file): the file carries an initial guess x alongside
    b/xexact (read_HPC_row.cpp:331-347); problem.x0 is that initial guess.

    With ``to_dia`` (default) a banded matrix (<= 128 distinct diagonals —
    every stencil-generated file qualifies) is converted to DIA storage,
    whose matvec is gather-free (TPU-native); unstructured matrices stay in
    padded ELL.
    """
    toks = _tokenize(path)
    if toks.size < 2:
        raise ValueError(f"{path}: not an HPC-row file (fewer than 2 tokens)")
    nrow = int(toks[0])
    nnz = int(toks[1])
    counts = toks[2 : 2 + nrow].astype(np.int64)
    if counts.size < nrow or counts.sum() != nnz:
        raise ValueError(
            f"{path}: header claims nrow={nrow} nnz={nnz}, "
            f"counts sum to {counts.sum() if counts.size == nrow else 'short file'}"
        )
    pos = 2 + nrow
    pairs = toks[pos : pos + 2 * nnz]
    if pairs.size < 2 * nnz:
        raise ValueError(f"{path}: truncated (val, ind) section")
    vals_flat = pairs[0::2]
    cols_flat = pairs[1::2].astype(np.int64)
    pos += 2 * nnz
    tail = toks[pos : pos + 3 * nrow]
    if tail.size < 3 * nrow:
        raise ValueError(f"{path}: truncated x/b/xexact section")
    x = tail[0::3]
    b = tail[1::3]
    xexact = tail[2::3]

    width = int(counts.max()) if nrow else 0
    vals = np.zeros((nrow, width))
    cols = np.zeros((nrow, width), dtype=np.int32)
    valid = np.zeros((nrow, width), dtype=bool)
    # scatter jagged rows into the padded layout
    row_ids = np.repeat(np.arange(nrow), counts)
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])
    slot_ids = np.arange(nnz) - np.repeat(offsets, counts)
    vals[row_ids, slot_ids] = vals_flat
    cols[row_ids, slot_ids] = cols_flat
    valid[row_ids, slot_ids] = True

    # host-leaf ELL: the structure decision (to_dia here, auto_structure in
    # the structured reader) reads these arrays with np.asarray — keeping
    # them numpy until the decision lands avoids a full device round trip
    # of the matrix (see _matrix_to_device)
    cdt = np.dtype(jnp.zeros((), dtype).dtype)  # canonicalized (x64-aware)
    A = EllMatrix(
        vals=vals.astype(cdt),
        cols=cols,
        valid=valid,
        start_row=0,
        total_nrow=nrow,
    )
    if to_dia:
        dia = A.to_dia()
        if dia is not None:
            A = dia
    if device:
        A = _matrix_to_device(A)
    prob = Problem(
        A=A,
        b=jnp.asarray(b, dtype),
        x0=jnp.asarray(x, dtype),
        xexact=jnp.asarray(xexact, dtype),
        total_nrow=nrow,
        total_nnz_model=nnz,
        total_nnz_exact=nnz,
    )
    return prob, prob.x0


def read_hpc_row_structured(
    path: str,
    *,
    dtype=jnp.float64,
    max_diags: int = 4096,
    max_inflation: float = 64.0,
    reorder: bool = True,
    allow_gell: bool = True,
):
    """Load an HPC-row file and pick the fastest TPU representation.

    Beyond :func:`read_hpc_row`'s direct banded->DIA conversion, this runs
    :func:`hpccg_tpu.reorder.auto_structure`: a matrix that is a hidden
    banded matrix under a row/column permutation is RCM-reordered and solved
    in the reordered basis (CG is basis-invariant — b is permuted once here,
    x must be unpermuted once by the caller via the returned ``perm``).

    Returns (problem, perm, report): ``problem`` is in the *solve* basis
    (b/x0/xexact permuted consistently with A); ``perm`` is None when no
    reordering was applied, else ``x_original[perm[i]] = x_solved[i]``.
    """
    from hpccg_tpu.reorder import StructureReport, auto_structure

    prob, _ = read_hpc_row(path, dtype=dtype, to_dia=False, device=False)
    if not reorder:
        # --no-reorder only disables RCM, not the banded->DIA conversion —
        # but the conversion keeps auto_structure's guards: the f64
        # roll-loop compile cap, the slot-inflation bound, and the storage
        # cap (a 4096-offset scattered matrix must NOT materialize a
        # multi-GB mostly-zero DIA array here)
        rows_c, cols_c, vals_c = prob.A.to_coo()
        offs_c = cols_c.astype(np.int64) - rows_c.astype(np.int64)
        ndiag = int(np.unique(offs_c).size)
        n_ = prob.A.local_nrow
        from hpccg_tpu.reorder import effective_dia_cap

        bw_lo_ = max(0, int(-offs_c.min()) if offs_c.size else 0)
        bw_hi_ = max(0, int(offs_c.max()) if offs_c.size else 0)
        cap = effective_dia_cap(
            max_diags, jnp.dtype(dtype).itemsize == 8, bw_lo_, bw_hi_, n_
        )
        inflation = (ndiag * n_) / max(prob.A.nnz, 1)
        storage_ok = ndiag * n_ * jnp.dtype(dtype).itemsize <= (8 << 30)
        has_stored_zeros = bool(np.any(vals_c == 0))
        dia = (
            prob.A.to_dia(max_diags=cap)
            if ndiag <= cap and inflation <= max_inflation and storage_ok
            and not has_stored_zeros
            else None
        )
        if dia is not None:
            A, perm = dia, None
            report = StructureReport(
                format="dia", ndiag=dia.ndiag, bandwidth_before=0,
                bandwidth_after=None, inflation=None,
                reason=f"banded as loaded: {dia.ndiag} diagonals (reorder off)",
            )
        else:
            A, perm = prob.A, None
            # same honest stored-zero reason the auto_structure path gives:
            # DIA would drop explicit zeros, making dumps/round-trips lossy
            reason = (
                "reorder disabled; matrix stores explicit zero entries, "
                "which DIA would drop — ELL gather path"
                if has_stored_zeros
                else "reorder disabled; not directly banded — ELL gather path"
            )
            report = StructureReport(
                format="ell", ndiag=None, bandwidth_before=0,
                bandwidth_after=None, inflation=None,
                reason=reason,
            )
    else:
        A, perm, report = auto_structure(
            prob.A, max_diags=max_diags, max_inflation=max_inflation,
            allow_gell=allow_gell,
        )
    A = _matrix_to_device(A)  # the honest-ELL fallback keeps host leaves
    if perm is not None:
        p = np.asarray(perm)
        prob = Problem(
            A=A,
            b=jnp.asarray(np.asarray(prob.b)[p]),
            x0=jnp.asarray(np.asarray(prob.x0)[p]),
            xexact=jnp.asarray(np.asarray(prob.xexact)[p]),
            total_nrow=prob.total_nrow,
            total_nnz_model=prob.total_nnz_model,
            total_nnz_exact=prob.total_nnz_exact,
        )
    else:
        prob = dataclasses.replace(prob, A=A)
    return prob, perm, report


def pad_problem_rows(prob: Problem, multiple: int) -> Problem:
    """Pad an explicit-matrix problem so its row count divides ``multiple``
    (shard_map needs equal shards — the analog of read_HPC_row.cpp:255-266's
    remainder handling, solved by padding instead of ragged blocks).

    Pad rows are decoupled identity rows with b = x0 = xexact = 0: they
    solve to exactly 0, contribute 0 to every dot product once converged,
    and nothing references them — the CG trajectory on the real rows is
    IDENTICAL to the unpadded problem's (pad residuals are 0 from the first
    iteration). total_nrow reflects the padded size; the FLOP/nnz models
    keep the true counts.
    """
    n = prob.total_nrow
    npad = ((n + multiple - 1) // multiple) * multiple
    if npad == n:
        return prob
    extra = npad - n
    A = prob.A
    if type(A).__name__ == "GellMatrix":
        # round-trip through ELL (lossless: gell never stores zeros), pad,
        # and re-prepare — the identity pad rows only touch offset 0, so the
        # window cannot widen
        from hpccg_tpu.ops.pallas.gell_kernel import gell_to_ell, prepare_gell

        ell_padded = pad_problem_rows(
            dataclasses.replace(prob, A=gell_to_ell(A)), multiple
        )
        return dataclasses.replace(ell_padded, A=prepare_gell(ell_padded.A))
    if isinstance(A, EllMatrix):
        width = max(A.width, 1)
        vals = np.zeros((npad, width), np.asarray(A.vals).dtype)
        cols = np.zeros((npad, width), np.int32)
        valid = np.zeros((npad, width), bool)
        vals[:n, : A.width] = np.asarray(A.vals)
        cols[:n, : A.width] = np.asarray(A.cols)
        valid[:n, : A.width] = np.asarray(A.valid)
        vals[n:, 0] = 1.0
        cols[n:, 0] = np.arange(n, npad)
        valid[n:, 0] = True
        A2 = EllMatrix(
            vals=jnp.asarray(vals), cols=jnp.asarray(cols),
            valid=jnp.asarray(valid), start_row=0, total_nrow=npad,
        )
    elif isinstance(A, DiaMatrix):
        offs = list(A.offsets)
        data = np.asarray(A.data)
        if 0 not in offs:
            at = int(np.searchsorted(np.asarray(offs), 0))
            offs.insert(at, 0)
            data = np.insert(data, at, 0.0, axis=0)
        data2 = np.zeros((len(offs), npad), data.dtype)
        data2[:, :n] = data
        d0 = offs.index(0)
        data2[d0, n:] = 1.0
        A2 = DiaMatrix(
            data=jnp.asarray(data2), offsets=tuple(offs), total_nrow=npad
        )
    else:
        raise TypeError(
            "pad_problem_rows pads explicit matrices; the stencil operator "
            "shards by construction"
        )

    def padv(v):
        return jnp.concatenate(
            [jnp.asarray(v), jnp.zeros((extra,), jnp.asarray(v).dtype)]
        )

    return Problem(
        A=A2,
        b=padv(prob.b),
        x0=padv(prob.x0),
        xexact=padv(prob.xexact),
        total_nrow=npad,
        total_nnz_model=prob.total_nnz_model,
        total_nnz_exact=prob.total_nnz_exact,
    )


def unpermute(x, perm) -> np.ndarray:
    """Map a solve-basis vector back to the file's original row order."""
    x = np.asarray(x)
    if perm is None:
        return x
    out = np.empty_like(x)
    out[np.asarray(perm)] = x
    return out


def write_hpc_row(path: str, prob: Problem, x: Optional[np.ndarray] = None) -> None:
    """Serialize a Problem to the HPC-row text format (inverse of the reader)."""
    A = prob.A
    if isinstance(A, StencilOperator):
        raise TypeError("write_hpc_row needs an explicit matrix; use generate_ell")
    nrow = A.local_nrow
    x = np.zeros(nrow) if x is None else np.asarray(x)
    b = np.asarray(prob.b)
    xexact = np.asarray(prob.xexact)
    if isinstance(A, EllMatrix):
        try:
            from hpccg_tpu import native

            if native.write_hpc_row_native(
                path, np.asarray(A.vals), np.asarray(A.cols),
                np.asarray(A.valid), x, b, xexact,
            ):
                return
        except ImportError:
            pass
    rows, cols, vals = A.to_coo()
    counts = np.asarray(A.nnz_per_row())
    with open(path, "w") as f:
        f.write(f"{nrow} {counts.sum()}\n")
        f.write(" ".join(str(c) for c in counts) + "\n")
        k = 0
        for r in range(nrow):
            parts = []
            for _ in range(counts[r]):
                parts.append(f"{vals[k]:.17g} {cols[k]}")
                k += 1
            f.write(" ".join(parts) + "\n")
        for i in range(nrow):
            f.write(f"{x[i]:.17g} {b[i]:.17g} {xexact[i]:.17g}\n")


def dump_matlab(
    prefix: str,
    A,
    rank: int = 0,
    start_row: int = 0,
    perm=None,
    true_nrow: Optional[int] = None,
) -> Optional[str]:
    """Write 1-indexed (row, col, val) triplets to <prefix><rank>.dat for
    Matlab spconvert (ref dump_matlab_matrix.cpp:59-82; ranks > 3 are no-ops).

    ``start_row`` offsets the row (and, for a z-stacked stencil shard, the
    column) numbering — pass ``rank * local_nrow`` to dump one shard of a
    distributed problem exactly as the reference's per-rank dumps do.

    ``perm``/``true_nrow`` map a solve-basis matrix back to the loaded
    file's basis (the reference dump reflects the actual input ordering):
    pad rows >= true_nrow are stripped, then rows/cols are relabeled via
    ``perm`` (solve row i = original row perm[i]) and re-sorted row-major.
    """
    if rank > 3:
        return None
    if isinstance(A, StencilOperator):
        import dataclasses as _dc

        from hpccg_tpu.config import ProblemConfig
        from hpccg_tpu.models.stencil import generate_ell

        ell = generate_ell(
            ProblemConfig(A.nx, A.ny, A.nz, stencil=A.stencil, dtype=A.dtype)
        ).A
        if start_row:
            # z-stacked shard: global row AND column ids shift together
            A = _dc.replace(
                ell, cols=ell.cols + start_row, start_row=start_row
            )
        else:
            A = ell
    elif start_row:
        raise ValueError(
            "start_row applies to stencil shards; explicit matrices carry "
            "their own partition metadata (EllMatrix.start_row)"
        )
    rows, cols, vals = A.to_coo()
    if true_nrow is not None:
        keep = (np.asarray(rows) < true_nrow) & (np.asarray(cols) < true_nrow)
        rows, cols, vals = (
            np.asarray(rows)[keep], np.asarray(cols)[keep], np.asarray(vals)[keep]
        )
    if perm is not None:
        p = np.asarray(perm)
        rows = p[np.asarray(rows, np.int64)]
        cols = p[np.asarray(cols, np.int64)]
        order = np.lexsort((cols, rows))
        rows, cols, vals = rows[order], cols[order], np.asarray(vals)[order]
    path = f"{prefix}{rank}.dat"
    with open(path, "w") as f:
        for r, c, v in zip(rows, cols, vals):
            f.write(f" {r + 1} {c + 1} {v:22.16e}\n")
    return path


def save_problem(path: str, prob: Problem, state: Optional[dict] = None) -> None:
    """Checkpoint a Problem (and optional solver state) as npz."""
    arrs = {
        "b": np.asarray(prob.b),
        "x0": np.asarray(prob.x0),
        "xexact": np.asarray(prob.xexact),
        "meta": np.asarray(
            [prob.total_nrow, prob.total_nnz_model, prob.total_nnz_exact]
        ),
    }
    A = prob.A
    if isinstance(A, StencilOperator):
        arrs["stencil_meta"] = np.asarray([A.nx, A.ny, A.nz, A.stencil.value])
        arrs["stencil_dtype"] = np.asarray(A.dtype_name)
    elif isinstance(A, DiaMatrix):
        arrs["dia_data"] = np.asarray(A.data)
        arrs["dia_offsets"] = np.asarray(A.offsets, np.int64)
        arrs["dia_meta"] = np.asarray([A.total_nrow or -1])
    elif type(A).__name__ == "GellMatrix":
        arrs["gell_vals3"] = np.asarray(A.vals3)
        if A.vals3lo is not None:
            arrs["gell_vals3lo"] = np.asarray(A.vals3lo)
        arrs["gell_li3"] = np.asarray(A.li3)
        arrs["gell_meta"] = np.asarray(
            [A.n, A.width, A.k_chunks, A.pbl, A.total_nrow, A.nnz_count]
        )
        arrs["gell_bounds"] = np.asarray(A.slot_bounds or [], np.int32).reshape(-1, 2)
    else:
        arrs["vals"] = np.asarray(A.vals)
        arrs["cols"] = np.asarray(A.cols)
        arrs["valid"] = np.asarray(A.valid)
        arrs["ell_meta"] = np.asarray([A.start_row, A.total_nrow or -1])
    if state:
        for k, v in state.items():
            arrs[f"state_{k}"] = np.asarray(v)
    np.savez_compressed(path, **arrs)


def load_problem(path: str) -> Tuple[Problem, dict]:
    """Inverse of save_problem. Returns (problem, state_dict)."""
    from hpccg_tpu.config import Stencil

    z = np.load(path, allow_pickle=False)
    meta = z["meta"]
    if "stencil_meta" in z:
        nx, ny, nz, sv = (int(v) for v in z["stencil_meta"])
        A = StencilOperator(
            nx=nx, ny=ny, nz=nz, stencil=Stencil(sv), dtype_name=str(z["stencil_dtype"])
        )
    elif "dia_data" in z:
        total = int(z["dia_meta"][0])
        A = DiaMatrix(
            data=jnp.asarray(z["dia_data"]),
            offsets=tuple(int(o) for o in z["dia_offsets"]),
            total_nrow=None if total < 0 else total,
        )
    elif "gell_vals3" in z:
        from hpccg_tpu.ops.pallas.gell_kernel import GellMatrix

        n_, w_, k_, pbl_, tot_, nnz_ = (int(v) for v in z["gell_meta"])
        bounds = tuple(
            (int(a), int(b)) for a, b in z.get("gell_bounds", np.zeros((0, 2)))
        )
        A = GellMatrix(
            vals3=jnp.asarray(z["gell_vals3"]),
            vals3lo=jnp.asarray(z["gell_vals3lo"])
            if "gell_vals3lo" in z
            else None,
            li3=jnp.asarray(z["gell_li3"]),
            n=n_, width=w_, k_chunks=k_, pbl=pbl_,
            total_nrow=tot_, nnz_count=nnz_, slot_bounds=bounds,
        )
    else:
        start_row, total = (int(v) for v in z["ell_meta"])
        A = EllMatrix(
            vals=jnp.asarray(z["vals"]),
            cols=jnp.asarray(z["cols"]),
            valid=jnp.asarray(z["valid"]),
            start_row=start_row,
            total_nrow=None if total < 0 else total,
        )
    prob = Problem(
        A=A,
        b=jnp.asarray(z["b"]),
        x0=jnp.asarray(z["x0"]),
        xexact=jnp.asarray(z["xexact"]),
        total_nrow=int(meta[0]),
        total_nnz_model=int(meta[1]),
        total_nnz_exact=int(meta[2]),
    )
    state = {
        k[len("state_") :]: z[k] for k in z.files if k.startswith("state_")
    }
    return prob, state
