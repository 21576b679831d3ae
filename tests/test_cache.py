"""Persistent compilation cache wiring (utils/cache.py).

The drivers enable jax's persistent compilation cache so repeat CLI
invocations skip the 20-60 s tunnel compiles (f64: minutes). These tests
pin the env contract; actual cache-hit timing is chip-validated in
REPRODUCE.md (the second `python bench.py` invocation's compile phase).
"""

import os

import jax
import pytest

from hpccg_tpu.utils.cache import enable_compilation_cache


@pytest.fixture
def restore_cache_config():
    """Save/restore the global jax compile-cache config so these tests'
    tmp_path redirections do not leak cache writes into the rest of the
    pytest session (ADVICE round 3)."""
    before = getattr(jax.config, "jax_compilation_cache_dir", None)
    yield
    jax.config.update("jax_compilation_cache_dir", before)


def test_cache_enabled_sets_config(tmp_path, monkeypatch, restore_cache_config):
    monkeypatch.delenv("HPCCG_NO_COMPILE_CACHE", raising=False)
    monkeypatch.setenv("HPCCG_CACHE_DIR", str(tmp_path / "xla"))
    got = enable_compilation_cache()
    assert got == str(tmp_path / "xla")
    assert os.path.isdir(got)
    assert jax.config.jax_compilation_cache_dir == got


def test_cache_honors_jax_env_var(tmp_path, monkeypatch, restore_cache_config):
    """A user-set JAX_COMPILATION_CACHE_DIR (jax's own standard env var)
    wins over the package default — never silently redirected (ADVICE)."""
    monkeypatch.delenv("HPCCG_NO_COMPILE_CACHE", raising=False)
    monkeypatch.delenv("HPCCG_CACHE_DIR", raising=False)
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", str(tmp_path / "pod"))
    got = enable_compilation_cache()
    assert got == str(tmp_path / "pod")
    assert jax.config.jax_compilation_cache_dir == got


def test_cache_opt_out(monkeypatch):
    monkeypatch.setenv("HPCCG_NO_COMPILE_CACHE", "1")
    assert enable_compilation_cache() is None


def test_cli_still_runs_with_cache(tmp_path, monkeypatch, capsys, restore_cache_config):
    """End-to-end: the CLI path that now calls enable_compilation_cache
    still solves and reports (cache dir redirected into tmp)."""
    monkeypatch.setenv("HPCCG_CACHE_DIR", str(tmp_path / "xla"))
    from hpccg_tpu.cli import main

    rc = main(["8", "8", "8", "--max-iter", "12", "--quiet", "--json"])
    assert rc == 0
    out = capsys.readouterr().out
    assert '"Final residual"' in out or "Final residual" in out
