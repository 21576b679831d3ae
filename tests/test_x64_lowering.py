"""Mosaic-under-x64 lowering regression (chip CI leg).

Under jax_enable_x64, Python int literals in BlockSpec index maps or kernel
arithmetic trace as i64 and Mosaic rejects the lowering — the hazard is
documented at ddmath.i0 and bit the whole-array xp spec on every f64 DIA run
in round 3. The dd tiers (DIA, gather-ELL, stencil) ONLY execute under x64
and the f32 tiers execute under x64 whenever the runtime enables it
(--dtype float64, iterative refinement), so the interpret-mode suite cannot
catch a regression here. This wrapper makes the chip CI path exist:
collected always, skipped off-chip; the --interpret smoke variant runs in
the quick tier so the script itself never rots.

Run on the chip:  python -m pytest tests/test_x64_lowering.py -m tpu
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "exp", "x64_lowering_check.py")


def _clean_env():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = " ".join(
        f
        for f in env.get("XLA_FLAGS", "").split()
        if not f.startswith("--xla_force_host_platform_device_count")
    )
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


@pytest.mark.slow  # full fresh-process JAX startup + 5 interpret kernels
def test_x64_lowering_interpret_smoke():
    """The check script's API surface stays valid (CPU, interpret mode)."""
    proc = subprocess.run(
        [sys.executable, SCRIPT, "--interpret"],
        capture_output=True,
        text=True,
        env=_clean_env(),
        timeout=600,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "X64 LOWERING CHECK OK" in proc.stdout


@pytest.mark.tpu
@pytest.mark.slow
def test_x64_lowering_on_chip():
    env = _clean_env()
    # a HUNG tunnel (backend init blocks forever) is different from an
    # absent one: probe reachability with a short fuse first
    try:
        probe = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            capture_output=True,
            text=True,
            env=env,
            timeout=90,
            cwd=REPO,
        )
    except subprocess.TimeoutExpired:
        pytest.skip("TPU backend init hung (tunnel unreachable)")
    if probe.returncode != 0:
        pytest.skip("no TPU reachable; x64 lowering is a Mosaic-compiler fact")
    proc = subprocess.run(
        [sys.executable, SCRIPT],
        capture_output=True,
        text=True,
        env=env,
        timeout=1800,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "X64 LOWERING CHECK OK" in proc.stdout
