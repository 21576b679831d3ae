"""Problem construction (the reference's L1 tier: generate_matrix.cpp,
read_HPC_row.cpp, dump_matlab_matrix.cpp)."""

from hpccg_tpu.models.stencil import Problem, generate_ell, generate_problem

__all__ = ["Problem", "generate_problem", "generate_ell"]
