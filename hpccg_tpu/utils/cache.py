"""Persistent XLA compilation cache for the CLI entry points.

Compiles through the axon TPU tunnel cost ~20-60 s for the big whole-solve
kernels and minutes for f64 solves (the XLA software-f64 vector ops around
the dd kernels) — per PROCESS, since jax's in-memory jit cache dies with the
interpreter. The reference pays its compile cost once at build time
(MakefileSYCL); a CLI framework that re-pays it on every invocation is
strictly worse UX, so the drivers (cli.py, bench.py, sweep.py) enable jax's
persistent compilation cache: the second `python -m hpccg_tpu 100 100 100`
skips straight to execution.

Opt out with HPCCG_NO_COMPILE_CACHE=1; relocate with HPCCG_CACHE_DIR. A
user-set JAX_COMPILATION_CACHE_DIR (jax's own standard env var) or an
already-configured jax_compilation_cache_dir is honored and never
overridden. Library imports do NOT enable it (a library must not write to
$HOME as an import side effect) — only the executable entry points call
this.
"""

from __future__ import annotations

import os


def enable_compilation_cache() -> str | None:
    """Turn on jax's persistent compilation cache. Returns the cache dir in
    effect, or None when disabled by env or unsupported by the jax install."""
    if os.environ.get("HPCCG_NO_COMPILE_CACHE"):
        return None
    try:
        import jax
    except Exception:  # pragma: no cover - no jax at all
        return None
    # precedence: explicit HPCCG_CACHE_DIR > jax's own standard env var /
    # an already-set jax config (never clobber user configuration) > default
    path = os.environ.get("HPCCG_CACHE_DIR")
    if path is None:
        existing = os.environ.get("JAX_COMPILATION_CACHE_DIR") or getattr(
            jax.config, "jax_compilation_cache_dir", None
        )
        if existing:
            path = existing
        else:
            path = os.path.join(
                os.path.expanduser("~"), ".cache", "hpccg_tpu", "xla"
            )
    try:
        os.makedirs(path, exist_ok=True)
        # optional tuning keys first, each individually best-effort (an
        # older jax lacking them must not leave the cache half-configured
        # or make the return value lie about whether caching is on)
        for key, val in (
            # cache everything that took real compile time; tiny compiles
            # are cheaper to redo than to hash/serialize
            ("jax_persistent_cache_min_compile_time_secs", 1.0),
            ("jax_persistent_cache_min_entry_size_bytes", 0),
        ):
            try:
                jax.config.update(key, val)
            except Exception:  # pragma: no cover - old jax
                pass
        # the switch that actually enables caching goes LAST so the return
        # value matches the real state
        jax.config.update("jax_compilation_cache_dir", path)
    except Exception:  # pragma: no cover - old jax or read-only $HOME
        return None
    return path
