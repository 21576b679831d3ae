"""Calibrate achievable streaming rates: XLA vs Pallas block pipeline,
fresh vs aliased output, tz sweep, with the kernel-v2 block structure."""

import sys
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from hpccg_tpu.utils.timing import time_loop_body

NZ, NY, NX = 264, 256, 256  # match the 256^3 padded problem
nbytes = NZ * NY * NX * 4
print(f"array {nbytes/2**20:.1f} MiB")


def copy_kernel(donor_ref, in_ref, out_ref):
    del donor_ref
    out_ref[:] = in_ref[:] + 1.0


def make_pallas_copy(tz, aliased):
    nzb = NZ // tz

    @jax.jit
    def f(x, dead):
        return pl.pallas_call(
            copy_kernel,
            grid=(nzb,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((tz, NY, NX), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tz, NY, NX), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((NZ, NY, NX), jnp.float32),
            input_output_aliases={0: 0} if aliased else {},
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
        )(dead, x)

    return f


x0 = jnp.ones((NZ, NY, NX), jnp.float32)


def run(name, f):
    def body(c):
        x, dead = c
        y = f(x, dead)
        return (y, x)

    t = time_loop_body(body, (x0, x0 + 1.0), iters=16, reps=3)
    print(f"{name:34s} {t*1e6:8.1f} us  {2*nbytes/t/1e9:6.1f} GB/s (2-pass)")


run("xla y=x+1 ping-pong", jax.jit(lambda x, dead: x + 1.0))
for tz in (8, 12, 24, 44, 88):
    if NZ % tz:
        continue
    run(f"pallas copy tz={tz} aliased", make_pallas_copy(tz, True))
run("pallas copy tz=24 fresh", make_pallas_copy(24, False))
