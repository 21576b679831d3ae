"""f64 wide-band double-float DIA kernel benchmark (round 3).

Run on TPU:  PYTHONPATH=. python exp/dd_bench.py
301-diagonal SPD f64 matrix, 262k rows — past the XLA unroll cap, so the
only f64 path is the dd kernel (make_cg routes there automatically).
Expected on v5e: ~1.16 ms/iter = ~68 Gslots/s end-to-end CG; matvec rel
err vs the NumPy oracle ~3e-14 (plain f32 is ~1e-7). NOTE: the fixed-work
deep run flushes rtrans below the emulated-f64 exponent floor (~1e-38) on
this well-conditioned test matrix and NaNs out after convergence — the
documented f64-on-TPU flush behavior, not a kernel defect.

The first f64 CG compile through the tunnel takes tens of minutes (the
XLA f64 vector ops around the kernel, not the kernel itself); subsequent
compiles hit the cache.
"""

import statistics
import time

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from hpccg_tpu.operators import DiaMatrix  # noqa: E402
from hpccg_tpu.solver import make_cg  # noqa: E402
from hpccg_tpu.utils.timing import fence  # noqa: E402


def main():
    rng = np.random.default_rng(0)
    n = 262144
    offs = tuple(range(-150, 151))
    data = np.zeros((len(offs), n))
    for d, off in enumerate(offs):
        lo, hi = max(0, -off), min(n, n - off)
        data[d, lo:hi] = (
            2.0 * len(offs) if off == 0 else rng.uniform(-1, -0.1, hi - lo)
        )
    # b = A @ 1 in numpy (avoid a 301-roll f64 XLA compile just for setup)
    b_np = np.zeros(n)
    for d, off in enumerate(offs):
        xs = np.zeros(n)
        t = slice(max(0, -off), min(n, n - off))
        xs[t] = 1.0
        b_np += data[d] * xs
    A = DiaMatrix(data=jnp.asarray(data), offsets=offs, total_nrow=n)
    b = jnp.asarray(b_np)
    x0 = jnp.zeros_like(b)

    # matvec accuracy vs the oracle
    from hpccg_tpu.ops.pallas.dia_kernel import prepare_dia_dd

    x = rng.standard_normal(n)
    y = np.asarray(prepare_dia_dd(A).matvec(jnp.asarray(x)))
    yref = np.zeros(n)
    for d, off in enumerate(offs):
        xs = np.zeros(n)
        t = slice(max(0, -off), min(n, n - off))
        s = slice(max(0, off), min(n, n + off))
        xs[t] = x[s]
        yref += data[d] * xs
    print("matvec rel err:", np.max(np.abs(y - yref)) / np.max(np.abs(yref)), flush=True)

    k1, k2 = 9, 65
    t0 = time.time()
    s1 = make_cg(A, max_iter=k1 + 1, tolerance=0.0)
    r = s1(b, x0)
    fence(r)
    print(
        f"short leg compile+run {time.time() - t0:.0f}s; niters {int(r.niters)}",
        flush=True,
    )
    s2 = make_cg(A, max_iter=k2 + 1, tolerance=0.0)
    fence(s2(b, x0))
    ss = []
    for _ in range(3):
        t0 = time.perf_counter()
        fence(s1(b, x0))
        t1 = time.perf_counter()
        fence(s2(b, x0))
        t2 = time.perf_counter()
        ss.append(((t2 - t1) - (t1 - t0)) / (k2 - k1))
    per = statistics.median(ss)
    slots = len(offs) * n
    print(f"dd CG: {per*1e3:.3f} ms/iter, {slots/per/1e9:.1f} Gslots/s")


if __name__ == "__main__":
    main()
