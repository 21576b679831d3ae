"""Error-free f32 transforms shared by the double-float (two-f32) kernels.

The TPU VPU has no f64 and no FMA error extraction, so dd kernels
(dia_kernel, stencil_v2) build f64-class arithmetic from these exact
building blocks (Dekker/Knuth/Veltkamp — see Muller et al., "Handbook of
Floating-Point Arithmetic"). Pure elementwise ops: safe inside Mosaic
kernels and under the interpreter alike, as long as the compiler does not
reassociate (XLA and Mosaic both honor the written association for f32).
"""

from __future__ import annotations

VELTKAMP = 4097.0  # 2^12 + 1: splits a 24-bit f32 significand 12 + 12


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


def veltkamp_split(a):
    """a = h + l exactly with h, l fitting 12-bit significands (|a| below
    ~8e34 so the scaled intermediate cannot overflow f32)."""
    c = a * VELTKAMP
    h = c - (c - a)
    return h, a - h


def two_prod(a, b):
    """Error-free: a * b = p + e exactly (Veltkamp split both operands)."""
    ah, al = veltkamp_split(a)
    bh, bl = veltkamp_split(b)
    p = a * b
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e
