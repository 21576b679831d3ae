"""Pallas TPU kernels — the native-kernel tier (counterpart of the
reference's SYCL/OMP kernels, HPC_sparsemv.cpp:94-109 etc.).

- stencil_kernel: one-pass 27/7-pt stencil SpMV (slab pipeline over z-blocks)
- fused_cg: fused CG-step kernels (axpy+SpMV+dot in single passes)
"""

from hpccg_tpu.ops.pallas.stencil_kernel import spmv_stencil_pallas


def spmv_pallas(A, x):
    from hpccg_tpu.operators import StencilOperator

    if isinstance(A, StencilOperator):
        return spmv_stencil_pallas(A, x)
    raise NotImplementedError(
        "pallas backend currently covers the stencil operator; ELL uses XLA gather"
    )


__all__ = ["spmv_pallas", "spmv_stencil_pallas"]
