"""Compile the whole-solve kernels at their LARGEST claimed VMEM fits on the
real chip (VERDICT round-1 weak #6: the fits_* budgets were hand-tuned
constants — a mis-estimate surfaces as a Mosaic OOM at boundary sizes).

Run on TPU:  PYTHONPATH=. python exp/vmem_boundary_check.py
Each config compiles + runs 3 iterations (compile is the assertion; the run
confirms the executable actually loads). One line per config; exits nonzero
on the first failure.
"""

import sys
import time

import jax
import jax.numpy as jnp


def check(name, fn):
    t0 = time.time()
    try:
        fn()
        print(f"PASS {name} ({time.time() - t0:.0f}s)", flush=True)
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e).splitlines()[0][:200] if str(e) else type(e).__name__
        print(f"FAIL {name}: {msg}", flush=True)
        return False


def solve_at(n, dtype, backend, max_iter=3):
    from hpccg_tpu import ProblemConfig, generate_problem
    from hpccg_tpu.solver import make_cg

    prob = generate_problem(ProblemConfig(n, n, n, dtype=dtype))
    res = make_cg(prob.A, max_iter=max_iter, tolerance=0.0, backend=backend)(
        prob.b, prob.x0
    )
    assert float(res.normr) < float(res.trace[0])


def collective_at(n, method, ndev=1):
    from hpccg_tpu import ProblemConfig
    from hpccg_tpu.parallel import make_mesh
    from hpccg_tpu.parallel.cg import generate_problem_sharded, make_distributed_cg

    mesh = make_mesh(ndev)
    cfg = ProblemConfig(n, n, n, dtype=jnp.float32)
    prob = generate_problem_sharded(cfg, mesh)
    res = make_distributed_cg(
        cfg, mesh, max_iter=3, backend="collective", method=method
    )(prob.b, prob.x0)
    assert float(res.normr) < float(res.trace[0])


def main():
    if jax.default_backend() != "tpu":
        print("SKIP: needs the real TPU (boundaries are Mosaic-compiler facts)")
        return 0
    from hpccg_tpu.operators import StencilOperator
    from hpccg_tpu.ops.pallas.megakernel import _mega_mode
    from hpccg_tpu.ops.pallas.streamkernel import fits_stream_vmem

    op = lambda n, d: StencilOperator(nx=n, ny=n, nz=n, dtype_name=d)  # noqa: E731
    # confirm each config IS at its claimed boundary before compiling it
    assert _mega_mode(op(128, "float32"), jnp.float32) == "whole"
    assert _mega_mode(op(144, "float32"), jnp.float32) == "slab"
    assert _mega_mode(op(200, "bfloat16"), jnp.bfloat16) == "slab"
    assert fits_stream_vmem(op(200, "float32"), jnp.float32)
    # bf16 state (round 5) extends the streaming reach to 256^3
    assert fits_stream_vmem(op(256, "bfloat16"), jnp.bfloat16)
    assert not fits_stream_vmem(op(272, "bfloat16"), jnp.bfloat16)

    ok = True
    ok &= check("megakernel whole-grid 128^3 f32", lambda: solve_at(128, jnp.float32, "megakernel"))
    ok &= check("megakernel slab 144^3 f32", lambda: solve_at(144, jnp.float32, "megakernel"))
    ok &= check("megakernel slab 200^3 bf16", lambda: solve_at(200, jnp.bfloat16, "megakernel"))
    ok &= check("streamkernel 200^3 f32", lambda: solve_at(200, jnp.float32, "streamkernel"))
    ok &= check("streamkernel 256^3 bf16", lambda: solve_at(256, jnp.bfloat16, "streamkernel"))
    ok &= check("collective cg1 100^3 (1 shard)", lambda: collective_at(100, "cg1"))
    ok &= check("collective pipecg 100^3 (1 shard)", lambda: collective_at(100, "pipecg"))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
