"""Pallas TPU kernels — the native-kernel tier (counterpart of the
reference's SYCL/OMP kernels, HPC_sparsemv.cpp:94-109 etc.).

- stencil_v2: one-pass 27/7-pt stencil SpMV, v2 layout (z grid dim, y on
  sublanes, x on lanes) — the default; ~2x v1 at VMEM-resident sizes
- stencil_kernel: v1 layout (xy-planes flattened onto lanes) — kept for
  comparison as backend "pallas_v1"
- fused_cg: fused CG-step kernels (axpy+SpMV+dot in single passes)
"""

import jax.numpy as jnp

from hpccg_tpu.ops.pallas.stencil_kernel import spmv_stencil_pallas
from hpccg_tpu.ops.pallas.stencil_v2 import spmv_stencil_pallas_v2


def spmv_pallas(A, x):
    from hpccg_tpu.operators import DiaMatrix, StencilOperator

    if isinstance(A, StencilOperator):
        return spmv_stencil_pallas_v2(A, x)
    if isinstance(A, DiaMatrix):
        from hpccg_tpu.ops.pallas.dia_kernel import (
            dia_pallas_supported,
            spmv_dia_pallas,
        )

        offs = tuple(int(o) for o in A.offsets)
        if not dia_pallas_supported(offs, A.local_nrow, A.dtype):
            raise NotImplementedError(
                "the blocked-DIA Pallas kernel needs 32-bit data (Mosaic "
                "rotate is 32-bit only) and a bandwidth-padded x that fits "
                f"the VMEM budget; this {len(offs)}-diagonal "
                f"{jnp.dtype(A.dtype).name} matrix at {A.local_nrow} rows "
                "does not qualify — use backend='auto' (XLA roll fusion) or "
                "float32 data"
            )
        return spmv_dia_pallas(A, x)
    raise NotImplementedError(
        "pallas backend covers stencil and DIA operators; there is no fast "
        "TPU gather for raw ELL — reorder with hpccg_tpu.reorder."
        "auto_structure (RCM -> banded/DIA) first"
    )


__all__ = ["spmv_pallas", "spmv_stencil_pallas", "spmv_stencil_pallas_v2"]
