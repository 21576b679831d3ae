"""Bounded-memory distributed file loading (round-3 VERDICT #4 / missing #2).

The reference reads only the local row block per rank
(read_HPC_row.cpp:255-293); these tests pin the same contract for the
streaming readers: correctness parity vs the full-file reader, identical
native/Python scan results, and — the memory claim itself — a sharded load
that NEVER calls the whole-file tokenizer and never materializes more than
one block's tokens at a time, verified by instrumenting the token plumbing
while loading a file bigger than any single shard's budget.
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hpccg_tpu import ProblemConfig
from hpccg_tpu.models.stencil import generate_ell
from hpccg_tpu.io import (
    _scan_block_py,
    _stream_tokens_py,
    read_hpc_row,
    read_hpc_row_block,
    read_hpc_row_sharded,
    write_hpc_row,
)
from hpccg_tpu.parallel import make_distributed_ell_cg, make_mesh
from hpccg_tpu.solver import make_cg

pytestmark = pytest.mark.quick


@pytest.fixture(scope="module")
def row_file(tmp_path_factory):
    cfg = ProblemConfig(5, 4, 14)  # 280 rows, 27-pt
    prob = generate_ell(cfg)
    path = str(tmp_path_factory.mktemp("stream") / "prob.dat")
    write_hpc_row(path, prob)
    return path, prob


def test_scan_block_native_matches_python(row_file):
    path, _ = row_file
    from hpccg_tpu import native

    py = _scan_block_py(path, 50, 100)
    if native.available():
        nat = native.scan_block(path, 50, 100)
        assert nat[:6] == py[:6]
        np.testing.assert_array_equal(nat[6], py[6])
    # spot-check the scan against the full tokenization
    full, _ = read_hpc_row(path, to_dia=False, device=False)
    counts = np.asarray(full.A.nnz_per_row())
    assert py[0] == 280 and py[1] == counts.sum()
    assert py[2] == counts[:50].sum()  # prefix nnz
    assert py[3] == counts[50:150].sum()  # block nnz
    assert py[5] == counts.max()  # global max width
    np.testing.assert_array_equal(py[6], counts[50:150])


def test_stream_tokens_tiny_window(row_file):
    """Boundary-split tokens: a 64-byte window forces carries constantly."""
    path, _ = row_file
    from hpccg_tpu.io import _iter_token_chunks

    big = np.concatenate(list(_iter_token_chunks(path)))
    tiny = np.concatenate(list(_iter_token_chunks(path, window=64)))
    np.testing.assert_array_equal(big, tiny)
    np.testing.assert_array_equal(_stream_tokens_py(path, 7, 33), big[7:40])


def test_block_reads_assemble_to_full_read(row_file):
    path, _ = row_file
    full, _ = read_hpc_row(path, to_dia=False, device=False)
    rows_f, cols_f, vals_f = full.A.to_coo()
    parts = [read_hpc_row_block(path, r, 3) for r in range(3)]
    # reference partition rule: 280 = 94 + 93 + 93
    assert [p[0].local_nrow for p in parts] == [94, 93, 93]
    assert [p[0].start_row for p in parts] == [0, 94, 187]
    rows_b = np.concatenate([p[0].to_coo()[0] for p in parts])
    cols_b = np.concatenate([p[0].to_coo()[1] for p in parts])
    vals_b = np.concatenate([p[0].to_coo()[2] for p in parts])
    np.testing.assert_array_equal(rows_b, rows_f)
    np.testing.assert_array_equal(cols_b, cols_f)
    np.testing.assert_array_equal(vals_b, vals_f)
    b_b = np.concatenate([p[2] for p in parts])
    np.testing.assert_array_equal(b_b, np.asarray(full.b))


def test_sharded_load_bounded_memory_and_parity(row_file, monkeypatch):
    """The memory contract: loading on the 8-device virtual mesh must never
    invoke the whole-file tokenizer, and no single token request may exceed
    one block's worth — the 'file larger than one shard's budget' check,
    enforced by instrumentation rather than RSS (deterministic)."""
    path, _ = row_file
    import hpccg_tpu.io as io_mod

    full, _ = read_hpc_row(path, to_dia=False)  # oracle BEFORE the patch

    def _no_full_read(p):
        raise AssertionError("stream load called the whole-file tokenizer")

    monkeypatch.setattr(io_mod, "_tokenize", _no_full_read)

    max_request = 0
    real_range = io_mod._tokenize_range

    def spy_range(p, skip, count):
        nonlocal max_request
        max_request = max(max_request, count)
        return real_range(p, skip, count)

    monkeypatch.setattr(io_mod, "_tokenize_range", spy_range)

    # the native chained-cursor plan bypasses _tokenize_range — spy its
    # emit counts too (skip-only calls request 0 tokens and stream through
    # a fixed window, so only `count` matters for the memory bound)
    from hpccg_tpu import native

    if native.available():
        real_at = native.tokenize_range_at

        def spy_at(p, start_byte, skip, count):
            nonlocal max_request
            max_request = max(max_request, count)
            return real_at(p, start_byte, skip, count)

        monkeypatch.setattr(native, "tokenize_range_at", spy_at)

    mesh = make_mesh(8)
    prob, x_file = read_hpc_row_sharded(path, mesh)
    # 280 rows / 8 devices = 35-row blocks; the largest single request is
    # one block's (val, ind) pairs: 2 * block_nnz <= 2 * 35 * 27 << the
    # whole file's ~10960 tokens
    assert 0 < max_request <= 2 * 35 * 27  # > 0: the spies actually fired
    assert max_request < 2800  # ~a quarter of the file

    res = make_distributed_ell_cg(mesh, max_iter=20)(prob.A, prob.b, prob.x0)
    r1 = make_cg(full.A, max_iter=20)(full.b, full.x0)
    tc, t1 = np.asarray(res.trace), np.asarray(r1.trace)
    good = np.isfinite(t1) & (t1 > 1e-10 * t1[0])
    np.testing.assert_allclose(tc[good], t1[good], rtol=1e-9)


def test_sharded_load_pad_rows(tmp_path):
    """140 rows on 8 devices: the last block carries 4 identity pad rows;
    the trajectory matches the unpadded single-device solve."""
    cfg = ProblemConfig(5, 4, 7)  # 140 rows
    prob = generate_ell(cfg)
    path = str(tmp_path / "rem.dat")
    write_hpc_row(path, prob)
    mesh = make_mesh(8)
    sp, _ = read_hpc_row_sharded(path, mesh)
    assert sp.total_nrow == 144
    res = make_distributed_ell_cg(mesh, max_iter=20)(sp.A, sp.b, sp.x0)
    r1 = make_cg(prob.A, max_iter=20)(prob.b, prob.x0)
    assert int(res.niters) == int(r1.niters)
    tc, t1 = np.asarray(res.trace), np.asarray(r1.trace)
    good = np.isfinite(t1) & (t1 > 1e-10 * t1[0])
    np.testing.assert_allclose(tc[good], t1[good], rtol=1e-9)
    x = np.asarray(res.x)
    np.testing.assert_array_equal(x[140:], 0.0)
    np.testing.assert_allclose(x[:140], 1.0, atol=1e-6)


@pytest.mark.slow
def test_cli_stream_load(tmp_path, capsys):
    """End to end: --stream-load --mesh 8 solves with finite kernel rows and
    says which path ran."""
    import contextlib
    import io as _io

    from hpccg_tpu.cli import main

    cfg = ProblemConfig(5, 4, 14)
    prob = generate_ell(cfg)
    path = str(tmp_path / "prob.dat")
    write_hpc_row(path, prob)

    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main([path, "--stream-load", "--mesh", "8", "--max-iter", "15",
                   "--json", "--quiet"])
    assert rc == 0
    err = capsys.readouterr().err
    assert "stream-load" in err
    out = json.loads(buf.getvalue()[buf.getvalue().index("{"):])
    assert out["Number of iterations"] == 14  # ref loop: k < max_iter
    assert np.isfinite(out["Time Summary"]["SPARSEMV"])


def test_sharded_load_tiny_file_all_pad_devices(tmp_path):
    """A file with fewer rows than devices: the trailing devices' blocks
    are ALL pad (review finding — the empty-block scatter used to raise a
    broadcast ValueError) and must come back as identity rows."""
    from hpccg_tpu import ProblemConfig
    from hpccg_tpu.models.stencil import generate_ell

    prob_src = generate_ell(ProblemConfig(1, 2, 3))  # 6 rows
    path = str(tmp_path / "tiny.dat")
    write_hpc_row(path, prob_src)
    mesh = make_mesh(8)
    prob, _x = read_hpc_row_sharded(path, mesh)
    assert prob.total_nrow == 8
    vals = np.asarray(prob.A.vals)
    valid = np.asarray(prob.A.valid)
    for r in (6, 7):  # identity pad rows on the all-pad devices
        assert vals[r, 0] == 1.0 and valid[r, 0]
        assert not valid[r, 1:].any()
    # the rank-block API tolerates size > rows too
    from hpccg_tpu.io import read_hpc_row_block

    A7, _x7, _b7, _xe7, _ = read_hpc_row_block(path, 7, 8)
    assert A7.vals.shape[0] == 0


def test_sharded_load_chained_equals_fallback(row_file, monkeypatch):
    """The native chained-cursor section streaming must produce exactly
    the per-device blocks of the per-device _read_block fallback."""
    from hpccg_tpu import native

    if not native.available():
        pytest.skip("native library unavailable")
    path, _ = row_file
    mesh = make_mesh(8)
    p_chain, x_chain = read_hpc_row_sharded(path, mesh)
    monkeypatch.setattr(native, "available", lambda: False)
    p_fall, x_fall = read_hpc_row_sharded(path, mesh)
    np.testing.assert_array_equal(np.asarray(p_chain.A.vals), np.asarray(p_fall.A.vals))
    np.testing.assert_array_equal(np.asarray(p_chain.A.cols), np.asarray(p_fall.A.cols))
    np.testing.assert_array_equal(np.asarray(p_chain.A.valid), np.asarray(p_fall.A.valid))
    for a, b in ((p_chain.b, p_fall.b), (x_chain, x_fall), (p_chain.xexact, p_fall.xexact)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_tokenize_range_at_chaining(tmp_path):
    """The chained-cursor tokenizer: resuming at end_byte continues exactly
    where the previous call stopped; skip-only calls consume their tokens."""
    from hpccg_tpu import native

    if not native.available():
        pytest.skip("native library unavailable")
    path = str(tmp_path / "toks.txt")
    with open(path, "w") as f:
        f.write("1 2 3\n4.5 6e2 -7\n 8 9 10 11\n")
    t, e1 = native.tokenize_range_at(path, 0, 0, 3)
    assert list(t) == [1.0, 2.0, 3.0]
    t2, e2 = native.tokenize_range_at(path, e1, 0, 2)
    assert list(t2) == [4.5, 600.0]
    _t3, e3 = native.tokenize_range_at(path, e2, 2, 0)  # skip-only
    t4, _ = native.tokenize_range_at(path, e3, 0, 3)
    assert list(t4) == [9.0, 10.0, 11.0]
    t5, _ = native.tokenize_range_at(path, e1, 3, 2)  # skip + emit
    assert list(t5) == [8.0, 9.0]
