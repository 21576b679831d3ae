"""VMEM-fit boundary pinning as a collected test (VERDICT round-2 weak #4).

exp/vmem_boundary_check.py compiles every whole-solve kernel at its LARGEST
claimed fit on the real chip — the budgets in megakernel.fits_vmem /
streamkernel.fits_stream_vmem are Mosaic-compiler facts, so a future edit to
SLAB_FIT_BUDGET or the fit model would regress silently until a user OOMs.
This wrapper makes the chip CI path exist: collected always, skipped unless
a real TPU is reachable (the suite conftest forces JAX_PLATFORMS=cpu, so the
check runs in a subprocess with a clean platform env).

Run on the chip:  python -m pytest tests/test_vmem_boundary.py -m tpu
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.tpu
@pytest.mark.slow
def test_vmem_fit_boundaries_compile_on_chip():
    env = dict(os.environ)
    # undo the conftest's virtual-CPU forcing; let the script see the chip
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = " ".join(
        f
        for f in env.get("XLA_FLAGS", "").split()
        if not f.startswith("--xla_force_host_platform_device_count")
    )
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # a HUNG tunnel (backend init blocks forever) is different from an
    # absent one: probe reachability with a short-fuse subprocess first so
    # the suite skips in ~a minute instead of stalling out the full compile
    # timeout below
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
        pytest.skip("no TPU reachable; boundary fits are Mosaic-compiler facts")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "exp", "vmem_boundary_check.py")],
        capture_output=True,
        text=True,
        env=env,
        timeout=1800,  # several big Mosaic compiles
        cwd=REPO,
    )
    out = proc.stdout + proc.stderr
    if "SKIP: needs the real TPU" in out:
        pytest.skip("no TPU reachable; boundary fits are Mosaic-compiler facts")
    assert proc.returncode == 0, out
    assert "FAIL" not in out, out
