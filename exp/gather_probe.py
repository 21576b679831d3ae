"""Measure what "TPU has no fast gather" means on THIS chip — the evidence
behind the DIA/RCM design of the general explicit path (PERF.md).

Probes:
1. XLA jnp.take throughput for a random (nnz,)-index gather from a (n,)
   operand at ELL-SpMV-like shapes (the EllMatrix.matvec access pattern).
2. Whether Mosaic lowers an in-kernel vectorized gather at all
   (jnp.take_along_axis along lanes inside a Pallas kernel) — if this ever
   starts compiling AND runs at rate, a banded-window gather-ELL kernel
   becomes worth building (see VERDICT round-1 discussion).

Run on TPU: PYTHONPATH=. python exp/gather_probe.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hpccg_tpu.utils.timing import time_loop_body


def probe_xla_take(n, width):
    rng = np.random.default_rng(0)
    cols = jnp.asarray(rng.integers(0, n, size=(n, width)), jnp.int32)
    vals = jnp.asarray(rng.standard_normal((n, width)), jnp.float32)

    def body(x):
        g = jnp.take(x, cols, axis=0)
        return jnp.einsum("rw,rw->r", vals, g) * (1.0 / width)

    t = time_loop_body(body, jnp.ones((n,), jnp.float32), iters=4)
    gnnz = n * width / t / 1e9
    print(
        f"XLA take gather SpMV  n={n:>8} width={width}: "
        f"{t*1e6:10.1f} us  {gnnz:8.3f} Gnnz/s",
        flush=True,
    )


def probe_pallas_lane_gather():
    """out[s, l] = operand[s, idx[s, l]] — per-sublane lane shuffle."""

    def kernel(x_ref, idx_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:], axis=1)

    x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
    idx = jnp.flip(jnp.broadcast_to(jnp.arange(128, dtype=jnp.int32), (8, 128)), 1)
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, idx)
        ok = np.array_equal(np.asarray(out), np.asarray(x)[:, ::-1])
        print(f"Mosaic lane gather (take_along_axis): COMPILES, correct={ok}")
        return True
    except Exception as e:  # noqa: BLE001
        first = str(e).splitlines()[0][:160] if str(e) else type(e).__name__
        print(f"Mosaic lane gather (take_along_axis): NOT LOWERED ({first})")
        return False


def main():
    if jax.default_backend() != "tpu":
        print("SKIP: probes measure the real chip")
        return
    probe_pallas_lane_gather()
    probe_xla_take(32**3, 27)
    probe_xla_take(64**3, 27)


if __name__ == "__main__":
    main()
