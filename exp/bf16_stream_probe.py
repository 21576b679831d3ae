#!/usr/bin/env python
"""bf16 streaming whole-solve kernel probe (round 5).

The round-4 pass breakdown pinned the f32 256^3 floor at ~1.24 ms/iter and
named bf16 the lever past it; the best measured bf16 tier at 256^3 was the
per-iteration pallas-v2 path (596 us/iter, ~6 effective bf16 passes). The
streamkernel (r/p pinned in VMEM, x DMA-streamed, Ap recomputed) was f32-only
— at bf16 the two pinned vectors cost 2 B/element, so its reach extends from
~200^3 to 256^3 and its per-iteration HBM traffic is TWO bf16 passes of x
(~2 x 34 MB at 256^3 ~ 200 us at the 330 GB/s mixed floor).

Measures, per size (default 200 208 232 256), bf16:
  - streamkernel (forced)
  - the current auto tier at that size (megakernel <=200^3 / stencil <=10.5M
    rows / pallas-v2 past) for the delta the resolve_backend gate should key on
Prints us/iter (slope-timed) + the effective bf16 pass count.

Usage: python exp/bf16_stream_probe.py [n ...]
"""

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from hpccg_tpu import ProblemConfig, generate_problem
from hpccg_tpu.solver import make_cg, resolve_backend
from hpccg_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def time_cg_iter(prob, backend, iters=65, spread=32):
    """Per-iteration seconds by slope between two max_iter values."""
    import time

    import numpy as np

    from hpccg_tpu.utils.timing import fence

    k1, k2 = iters, iters * spread
    s1 = make_cg(prob.A, max_iter=k1, tolerance=0.0, backend=backend)
    s2 = make_cg(prob.A, max_iter=k2, tolerance=0.0, backend=backend)
    fence(s1(prob.b, prob.x0))
    fence(s2(prob.b, prob.x0))
    slopes = []
    for _ in range(3):
        t0 = time.perf_counter()
        r1 = s1(prob.b, prob.x0)
        fence(r1)
        t1 = time.perf_counter()
        r2 = s2(prob.b, prob.x0)
        fence(r2)
        t2 = time.perf_counter()
        slopes.append((t2 - t1) - (t1 - t0))
    assert int(r2.niters) == k2 - 1, (
        "early exit poisons the slope",
        int(r2.niters),
        float(r2.normr),
    )
    return max(np.median(slopes), 0.0) / (k2 - k1)


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [208, 232, 256]
    floor = 330e9
    print(f"device: {jax.devices()[0].device_kind}")
    for n in sizes:
        cfg = ProblemConfig(n, n, n, dtype=jnp.bfloat16)
        prob = generate_problem(cfg)
        vec_mb = prob.total_nrow * 2 / 1e6
        auto = resolve_backend(prob.A, "auto")
        print(
            f"# {n}^3 bf16: {vec_mb:.0f} MB/vector; 1 bf16 pass ~ "
            f"{vec_mb * 1e3 / 330:.0f} us at the 330 GB/s floor; auto={auto}"
        )
        from hpccg_tpu.ops.pallas.streamkernel import fits_stream_vmem

        if not fits_stream_vmem(prob.A, prob.A.dtype):
            print(f"  streamkernel: does not fit ({n}^3 bf16)")
        else:
            try:
                t = time_cg_iter(prob, "streamkernel")
                print(
                    f"  streamkernel: {t*1e6:7.1f} us/iter = "
                    f"{t*floor/(vec_mb*1e6):.1f} bf16 passes"
                )
            except Exception as e:
                print(f"  streamkernel: {type(e).__name__}: {e}")
        if auto != "streamkernel":
            t = time_cg_iter(prob, auto)
            print(f"  auto ({auto}): {t*1e6:7.1f} us/iter")


if __name__ == "__main__":
    main()
