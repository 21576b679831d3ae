"""Wall-clock timing with proper device fencing (ref mytimer.cpp).

The reference picks a timer backend at compile time (mytimer.cpp:49-121); here
one ``time.perf_counter`` path suffices, but timed regions MUST be fenced with
a scalar host readback: on remote-dispatch backends (axon tunnel)
``jax.block_until_ready`` can return before the device queue drains, producing
microsecond-scale "timings" for millisecond-scale work.
"""

from __future__ import annotations

import statistics
import time
from typing import Callable

import jax
import numpy as np


def fence(tree) -> None:
    """Force completion of every leaf: block, then read one scalar back."""
    jax.block_until_ready(tree)
    leaves = jax.tree_util.tree_leaves(tree)
    if leaves:
        leaf = leaves[0]
        np.asarray(jax.device_get(leaf.ravel()[0] if hasattr(leaf, "ravel") else leaf))


def time_fn(fn: Callable, *args, reps: int = 5, warmup: int = 2) -> float:
    """Median wall seconds per fenced call of fn(*args)."""
    for _ in range(max(warmup, 1)):
        fence(fn(*args))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fence(fn(*args))
        times.append(time.perf_counter() - t0)
    return statistics.median(times)


def time_loop_body(body: Callable, init, *, iters: int = 64, reps: int = 3) -> float:
    """Seconds per call of ``body`` (carry -> carry).

    Measures jitted fori_loops of K and 4K iterations and returns the slope
    (t_4K - t_K) / 3K: per-dispatch overhead (tens of ms through a remote
    tunnel) cancels exactly, leaving the marginal per-iteration cost.
    ``body`` must make the carry flow through the computation, or XLA will
    hoist/DCE it.
    """

    def make_loop(k: int):
        return jax.jit(lambda c: jax.lax.fori_loop(0, k, lambda i, c: body(c), c))

    return time_loop_slope(make_loop, init, iters=iters, reps=reps)


def time_loop_slope(
    make_loop: Callable[[int], Callable],
    init,
    *,
    iters: int = 64,
    spread: int = 64,
    reps: int = 3,
) -> float:
    """Slope-timing for a caller-built K-iteration loop: make_loop(k) must
    return a jitted callable running k iterations.

    The dispatch constant through the remote tunnel is tens of ms with
    several ms of jitter, so the two loop lengths must differ by a lot
    (default 64x) for the marginal per-iteration cost to rise above the
    noise. The chip's effective clock also drifts over minutes, so the
    (short, long) pair is measured INTERLEAVED and the median of per-pair
    slopes is returned — a pair shares one clock epoch.
    """
    short = make_loop(iters)
    long_ = make_loop(spread * iters)
    # compile + warm both
    fence(short(init))
    fence(long_(init))
    slopes = []
    for _ in range(max(reps, 3)):
        t0 = time.perf_counter()
        fence(short(init))
        t1 = time.perf_counter()
        fence(long_(init))
        t2 = time.perf_counter()
        slopes.append((t2 - t1) - (t1 - t0))
    # 0.0 = "below timer resolution", mirroring the reference's golden run
    # (out.txt reports 0 kernel times and inf MFLOPS at small sizes)
    return max(statistics.median(slopes), 0.0) / ((spread - 1) * iters)
