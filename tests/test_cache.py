"""Persistent compilation cache wiring (utils/cache.py).

The drivers enable jax's persistent compilation cache so repeat CLI
invocations skip the 20-60 s tunnel compiles (f64: minutes). These tests
pin the env contract; actual cache-hit timing is chip-validated in
REPRODUCE.md (the second `python bench.py` invocation's compile phase).
"""

import os

import jax

from hpccg_tpu.utils.cache import enable_compilation_cache


def test_cache_enabled_sets_config(tmp_path, monkeypatch):
    monkeypatch.delenv("HPCCG_NO_COMPILE_CACHE", raising=False)
    monkeypatch.setenv("HPCCG_CACHE_DIR", str(tmp_path / "xla"))
    got = enable_compilation_cache()
    assert got == str(tmp_path / "xla")
    assert os.path.isdir(got)
    assert jax.config.jax_compilation_cache_dir == got


def test_cache_opt_out(monkeypatch):
    monkeypatch.setenv("HPCCG_NO_COMPILE_CACHE", "1")
    assert enable_compilation_cache() is None


def test_cli_still_runs_with_cache(tmp_path, monkeypatch, capsys):
    """End-to-end: the CLI path that now calls enable_compilation_cache
    still solves and reports (cache dir redirected into tmp)."""
    monkeypatch.setenv("HPCCG_CACHE_DIR", str(tmp_path / "xla"))
    from hpccg_tpu.cli import main

    rc = main(["8", "8", "8", "--max-iter", "12", "--quiet", "--json"])
    assert rc == 0
    out = capsys.readouterr().out
    assert '"Final residual"' in out or "Final residual" in out
