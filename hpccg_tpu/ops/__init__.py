"""Compute kernels (the reference's L3 tier: HPC_sparsemv.cpp, ddot.cpp,
waxpby.cpp, compute_residual.cpp)."""

from hpccg_tpu.ops.vector import compute_residual, ddot, waxpby
from hpccg_tpu.ops.spmv import spmv

__all__ = ["ddot", "waxpby", "compute_residual", "spmv"]
