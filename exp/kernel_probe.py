"""Probe: SpMV kernel streaming rate at HBM-resident sizes (PERF.md lever 1).

Times the one-pass Pallas stencil SpMV alone (with donor aliasing, as the CG
loop uses it) and the full CG iteration, at several problem shapes, and
reports effective HBM GB/s assuming the ideal 2 passes (read x + write y).
"""

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from hpccg_tpu import ProblemConfig, generate_problem
from hpccg_tpu.ops.pallas.stencil_kernel import (
    pad_plane,
    plane_masks,
    plane_width,
    padded_nz,
    spmv_padded,
)
from hpccg_tpu.utils.timing import time_loop_body

shapes = [(256, 256, 256), (128, 128, 512), (100, 100, 100)]
for nx, ny, nz in shapes:
    cfg = ProblemConfig(nx, ny, nz, dtype=jnp.float32)
    prob = generate_problem(cfg)
    op = prob.A
    masks = jnp.asarray(plane_masks(op, jnp.float32))
    u0 = pad_plane(op, prob.b)
    m = plane_width(ny, nx)
    nzp = padded_nz(op, jnp.float32)
    nbytes = nzp * m * 4

    # ping-pong donor: y steals the previous x, so every call is aliased
    def body(c):
        x, dead = c
        y = spmv_padded(op, x, masks, None, dead)
        return (y, x)

    t = time_loop_body(body, (u0, u0 + 1.0), iters=16, reps=3)
    gbps = 2 * nbytes / t / 1e9
    print(
        f"{nx}x{ny}x{nz}: spmv {t*1e6:8.1f} us  array {nbytes/2**20:7.1f} MiB"
        f"  eff {gbps:6.1f} GB/s (2-pass model)"
    )
