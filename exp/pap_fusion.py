"""Experiment: fuse the p.Ap reduction into the streaming SpMV kernel.

The separate pAp dot at HBM-resident sizes re-reads p and Ap (~2 passes).
Accumulating the partial in SMEM across (sequential) grid steps gets it for
free while the blocks are already in VMEM."""

import sys
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from hpccg_tpu import ProblemConfig, generate_problem
from hpccg_tpu.ops.pallas.stencil_v2 import (
    VMEM_LIMIT,
    _kernel,
    _pick_tz,
    pad_plane3,
    padded_dims,
)
from hpccg_tpu.solver import make_cg
from hpccg_tpu.utils.timing import time_fn, time_loop_body

cfg = ProblemConfig(256, 256, 256, dtype=jnp.float32)
prob = generate_problem(cfg)
op = prob.A
nzp, nyp, nxp = padded_dims(op, jnp.float32)
tz = _pick_tz(op.nz, nyp * nxp, 4)
nzb = nzp // tz


def kern(halo_ref, lo_ref, mid_ref, hi_ref, out_ref, pap_ref):
    i = pl.program_id(0)
    _kernel(halo_ref, lo_ref, mid_ref, hi_ref, out_ref,
            tz=tz, nx=op.nx, ny=op.ny, nz=op.nz, stencil=op.stencil)

    @pl.when(i == 0)
    def _():
        pap_ref[0, 0] = jnp.asarray(0.0, mid_ref.dtype)

    pap_ref[0, 0] += jnp.sum(mid_ref[:] * out_ref[:])


@jax.jit
def spmv_pap(u):
    halo = jnp.zeros((2, nyp, nxp), jnp.float32)
    return pl.pallas_call(
        kern,
        grid=(nzb,),
        in_specs=[
            pl.BlockSpec((2, nyp, nxp), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nyp, nxp), lambda i: (jnp.maximum(i * tz - 1, 0), 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tz, nyp, nxp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nyp, nxp), lambda i: (jnp.minimum(i * tz + tz, nzb * tz - 1), 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tz, nyp, nxp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nzp, nyp, nxp), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT,
            dimension_semantics=("arbitrary",),
        ),
    )(halo, u, u, u)


# correctness
u0 = pad_plane3(op, prob.b)
y, pap = spmv_pap(u0)
import numpy as np
want = float(jnp.vdot(prob.b, op.matvec(prob.b)))  # padding is zero in both
got = float(pap[0, 0])
print("pap rel err:", abs(got - want) / abs(want))

# standalone speed
def body(c):
    x, dead = c
    y, pap = spmv_pap(x)
    return (y + 0 * pap, x)

t = time_loop_body(body, (u0, u0 + 1.0), iters=16, reps=3)
print(f"spmv+pap fused: {t*1e6:.0f} us (plain spmv was ~422 us)")

# full-CG effect: custom loop
from hpccg_tpu.solver import CGResult


def cg_fused_pap(b, x0, max_iter):
    p = x0
    Ap, _ = spmv_pap(p)
    r = b - Ap
    rtrans = jnp.vdot(r, r)

    def body(c):
        k, x, r, p, rtrans_old = c
        rtrans = jnp.vdot(r, r)
        beta = jnp.where(k == 1, 0.0, rtrans / rtrans_old)
        p2 = r + beta * p
        Ap, pap = spmv_pap(p2)
        alpha = rtrans / pap[0, 0]
        x = x + alpha * p2
        r = r - alpha * Ap
        return (k + 1, x, r, p2, rtrans)

    k0 = jnp.asarray(1, jnp.int32)
    out = jax.lax.while_loop(
        lambda c: c[0] < max_iter, body, (k0, x0, r, p, rtrans)
    )
    return out[1]


# NOTE: the production version of this kernel is
# hpccg_tpu.ops.pallas.stencil_v2.spmv_padded_v2_pap (wired into the pallas
# backends); this file is the original measurement script.
b_pad = pad_plane3(op, prob.b)
x0_pad = pad_plane3(op, prob.x0)
t1 = time_fn(jax.jit(partial(cg_fused_pap, max_iter=17)), b_pad, x0_pad, reps=3)
t2 = time_fn(jax.jit(partial(cg_fused_pap, max_iter=129)), b_pad, x0_pad, reps=3)
print(f"CG w/ fused pAp at 256^3: {(t2-t1)/112*1e6:.0f} us/iter (plain pallas: ~1390)")
