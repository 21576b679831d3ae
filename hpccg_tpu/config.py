"""Runtime configuration (replaces the reference's three config tiers).

The reference configures itself with compile-time -D flags, in-source constants
(use_7pt_stencil, generate_matrix.cpp:219; max_iter/tolerance, main.cpp:187-188)
and argv. Here everything is one runtime dataclass — no recompile tiers.
"""

from __future__ import annotations

import dataclasses
import enum

import jax.numpy as jnp


class Stencil(enum.Enum):
    """Stencil selection (ref generate_matrix.cpp:219,267)."""

    S27 = 27
    S7 = 7

    @classmethod
    def from_any(cls, v) -> "Stencil":
        if isinstance(v, Stencil):
            return v
        return cls(int(v))


# The stencil's diagonal / off-diagonal values (ref generate_matrix.cpp:270,273).
DIAG_VALUE = 27.0
OFFDIAG_VALUE = -1.0


@dataclasses.dataclass(frozen=True)
class ProblemConfig:
    """A local (per-process in the reference) problem block.

    nx, ny, nz are the *local* block dims; the global domain is z-stacked
    (ref generate_matrix.cpp:225-229, README.md:53-63).
    """

    nx: int
    ny: int
    nz: int
    stencil: Stencil = Stencil.S27
    dtype: jnp.dtype = jnp.float64

    def __post_init__(self):
        object.__setattr__(self, "stencil", Stencil.from_any(self.stencil))
        if min(self.nx, self.ny, self.nz) < 1:
            raise ValueError(f"grid dims must be >= 1, got {(self.nx, self.ny, self.nz)}")

    @property
    def local_nrow(self) -> int:
        return self.nx * self.ny * self.nz


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    """CG solve parameters (ref main.cpp:187-188: max_iter=500, tolerance=0.0).

    Like the reference loop ``for k=1; k<max_iter && normr>tol`` the solver
    performs at most ``max_iter - 1`` iterations.
    """

    max_iter: int = 150
    tolerance: float = 0.0
