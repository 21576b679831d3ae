"""Error-free f32 transforms shared by the double-float (two-f32) kernels.

The TPU VPU has no f64 and no FMA error extraction, so dd kernels
(dia_kernel, stencil_v2, gell_kernel) build f64-class arithmetic from
these exact building blocks (Dekker/Knuth — see Muller et al., "Handbook
of Floating-Point Arithmetic").

COMPILER CONTRACT (why split12 is integer-masked): exactness of the
transforms requires the compiler to preserve the written f32 rounding.
Mosaic does. XLA:CPU's LLVM pipeline compiles with fp-contract=fast, so
a MULTIPLY feeding an add/sub can be FMA-contracted, silently changing
its rounding — that breaks the arithmetic Veltkamp split
(h = c - (c - a) with c = a*4097 contracts to fms) and any TwoSum whose
operand is an inexact product. Nothing at HLO level (optimization
barriers, bitcast round-trips) survives to instruction selection, so the
rule is structural instead: every product that feeds a TwoSum/df chain
must be EXACT by construction (split halves, power-of-two or small-int
coefficients) — contraction cannot change the rounding of an exact
product — and operand splitting uses integer mantissa masking, which has
no float ops to contract. Inexact products are allowed only in
eps-scale tails where a contracted rounding shifts eps^2-level bits.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

def split12(a):
    """a = h + l exactly with h, l each fitting 12-bit significands, via
    integer mantissa truncation (zero the low 12 mantissa bits) — immune
    to fp-contract because the split itself has no float arithmetic.
    h*h' products of two splits are exact (<= 24 significand bits)."""
    bits = jax.lax.bitcast_convert_type(a, jnp.int32)
    h = jax.lax.bitcast_convert_type(
        jnp.bitwise_and(bits, jnp.int32(-4096)), jnp.float32
    )
    return h, a - h  # exact: l is the truncated low 12 mantissa bits


def two_sum(a, b):
    """Error-free: a + b = s + e exactly (6 ops, Knuth)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def fast_two_sum(a, b):
    """Error-free for |a| >= |b| (3 ops, Dekker)."""
    s = a + b
    e = b - (s - a)
    return s, e


def two_prod(a, b):
    """Error-free: a * b = p + e exactly (split both operands; all
    sub-products exact, so the chain is fp-contract-immune EXCEPT the
    final `x - p` cancellation which has no mult — safe)."""
    ah, al = split12(a)
    bh, bl = split12(b)
    p = a * b
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def df_add(hi, lo, x):
    """(hi, lo) += x without renormalization (7 ops); callers renorm
    periodically (fast_two_sum) to keep |lo| small."""
    s, e = two_sum(hi, x)
    return s, lo + e


def i0():
    """np.int32(0) for Pallas BlockSpec index-map literals. Under
    jax_enable_x64 a Python ``0`` in an index map traces as a weak-i64
    transform return and Mosaic rejects the lowering — every kernel that
    can run in an x64 process (all dd kernels; any kernel reachable from a
    --dtype float64 run) must pin its index-map constants with this."""
    import numpy as np

    return np.int32(0)
