"""HBM direction-asymmetry probe (PERF.md): pure WRITE streaming rate
through a Pallas pipeline. Together with the read-dominated DIA kernel
(~716 GB/s) and every mixed read+write path (~330 GB/s total), this pins
the machine model: each direction alone approaches HBM spec; 1:1 mixed
traffic pays read/write turnaround and halves. Run: PYTHONPATH=. python
exp/rw_probe.py"""
import sys, time, statistics
import jax, jax.numpy as jnp, numpy as np
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE, RB = 128, 512
NR = 262144  # 262144 rows x 128 lanes x 4 B = 128 MB output

def wkernel(seed_ref, o_ref):
    o_ref[:] = seed_ref[:] * 1.00001

@jax.jit
def write_big(seed):
    return pl.pallas_call(
        wkernel,
        grid=(NR // RB,),
        in_specs=[pl.BlockSpec((RB, LANE), lambda i: (0, 0))],  # same small block re-read
        out_specs=pl.BlockSpec((RB, LANE), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((NR, LANE), jnp.float32),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
    )(seed)

seed = jnp.ones((RB, LANE), jnp.float32)
@partial(jax.jit, static_argnums=(1,))
def loop(s, k):
    def body(i, c):
        o = write_big(c)
        return o[0:RB] * (1.0 / 1.00001)
    return jax.lax.fori_loop(0, k, body, s)

def fence(v): float(v[0,0]); return v
fence(loop(seed, 2)); fence(loop(seed, 18))
sl=[]
for _ in range(3):
    t0=time.perf_counter(); fence(loop(seed, 2)); t1=time.perf_counter(); fence(loop(seed, 18)); t2=time.perf_counter()
    sl.append(((t2-t1)-(t1-t0))/16)
t = statistics.median(sl)
gb = NR*LANE*4/1e9
print(f"pure-write pallas: {t*1e6:.0f} us for {gb:.3f} GB -> {gb/t:.0f} GB/s write")
