"""bench.py is the driver's contract (ONE JSON line): guard it on CPU."""

import pytest
import io
import json
import sys
from contextlib import redirect_stdout


@pytest.mark.slow
def test_bench_emits_one_json_line(monkeypatch):
    import bench

    monkeypatch.setattr(
        sys, "argv",
        # f64: an f32 problem this small converges to an EXACTLY zero
        # residual before the long slope leg completes
        ["bench.py", "--nx", "8", "--ny", "8", "--nz", "8", "--dtype",
         "float64", "--max-iter", "20", "--reps", "3", "--backend", "stencil"],
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        bench.main()
    lines = [l for l in buf.getvalue().strip().splitlines() if l.strip()]
    assert len(lines) == 1
    d = json.loads(lines[0])
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in d
    assert d["unit"] == "Gnnz/s"
    assert d["extras"]["niters"] == 19
