"""Emulated 64/128-bit unsigned integer arithmetic on uint32 pairs.

TPUs have no native 64-bit integer multiplier; every u64 value is represented
as a pair of uint32 arrays ``(lo, hi)`` and all wide products are built from
16-bit half-word multiplies (32x32 -> 64 via four 16x16 -> 32 products).
This is the arithmetic bedrock for all modular kernels
(cf. BASELINE.json: "32-bit limb-decomposed modular arithmetic").

All functions are shape-polymorphic elementwise jnp ops: they jit, vmap,
shard and fuse like any other XLA elementwise graph, and run identically on
TPU and CPU backends (tests use the CPU backend).

Conventions
-----------
- A "u64" is a tuple ``(lo, hi)`` of equal-shape ``uint32`` arrays.
- A "u128" is a tuple ``(x0, x1, x2, x3)`` of ``uint32`` little-endian limbs.
- Inputs must already be uint32; Python int scalars are allowed where noted.
"""

from __future__ import annotations

import jax.numpy as jnp

U32 = jnp.uint32

_MASK16 = 0xFFFF


def u64_const(value: int, like=None):
    """Split a Python int < 2^64 into uint32 (lo, hi) scalars/arrays."""
    lo = jnp.asarray(value & 0xFFFFFFFF, dtype=U32)
    hi = jnp.asarray((value >> 32) & 0xFFFFFFFF, dtype=U32)
    if like is not None:
        lo = jnp.broadcast_to(lo, jnp.shape(like))
        hi = jnp.broadcast_to(hi, jnp.shape(like))
    return lo, hi


def umul32(a, b):
    """Full 32x32 -> 64 product of uint32 arrays. Returns (lo, hi)."""
    a0 = a & _MASK16
    a1 = a >> 16
    b0 = b & _MASK16
    b1 = b >> 16
    ll = a0 * b0
    lh = a0 * b1
    hl = a1 * b0
    hh = a1 * b1
    # Carry column: top 16 of ll plus low 16 of both cross terms (< 3*2^16).
    t = (ll >> 16) + (lh & _MASK16) + (hl & _MASK16)
    lo = (ll & _MASK16) | ((t & _MASK16) << 16)
    hi = hh + (lh >> 16) + (hl >> 16) + (t >> 16)
    return lo, hi


def umul32_lo(a, b):
    """Low 32 bits of a*b (plain wrapping multiply)."""
    return a * b


def add64(a, b):
    """(lo, hi) + (lo, hi) mod 2^64."""
    lo = a[0] + b[0]
    carry = (lo < a[0]).astype(U32)
    hi = a[1] + b[1] + carry
    return lo, hi


def sub64(a, b):
    """(lo, hi) - (lo, hi) mod 2^64."""
    lo = a[0] - b[0]
    borrow = (a[0] < b[0]).astype(U32)
    hi = a[1] - b[1] - borrow
    return lo, hi


def geq64(a, b):
    """a >= b for u64 pairs (elementwise bool)."""
    return (a[1] > b[1]) | ((a[1] == b[1]) & (a[0] >= b[0]))


def lt64(a, b):
    return ~geq64(a, b)


def eq64(a, b):
    return (a[0] == b[0]) & (a[1] == b[1])


def select64(pred, a, b):
    """pred ? a : b elementwise on u64 pairs."""
    return (
        jnp.where(pred, a[0], b[0]),
        jnp.where(pred, a[1], b[1]),
    )


def iszero64(a):
    return (a[0] == 0) & (a[1] == 0)


def mullo64(a, b):
    """Low 64 bits of the 64x64 product (for Montgomery m = T * qinv mod R)."""
    p0_lo, p0_hi = umul32(a[0], b[0])
    lo = p0_lo
    hi = p0_hi + a[0] * b[1] + a[1] * b[0]
    return lo, hi


def mul64_128(a, b):
    """Full 64x64 -> 128 product. Returns (x0, x1, x2, x3) uint32 limbs."""
    l00, h00 = umul32(a[0], b[0])
    l01, h01 = umul32(a[0], b[1])
    l10, h10 = umul32(a[1], b[0])
    l11, h11 = umul32(a[1], b[1])

    x0 = l00

    # x1 = h00 + l01 + l10 with carries into x2
    s = h00 + l01
    c1 = (s < h00).astype(U32)
    x1 = s + l10
    c2 = (x1 < s).astype(U32)

    # x2 = h01 + h10 + l11 + c1 + c2 with carries into x3
    s = h01 + h10
    c3 = (s < h01).astype(U32)
    s2 = s + l11
    c4 = (s2 < s).astype(U32)
    s3 = s2 + c1 + c2  # adding <= 2 cannot carry twice
    c5 = (s3 < s2).astype(U32)
    x2 = s3

    x3 = h11 + c3 + c4 + c5
    return x0, x1, x2, x3


def add128(a, b):
    """128-bit addition of 4-limb values (mod 2^128)."""
    r0 = a[0] + b[0]
    c0 = (r0 < a[0]).astype(U32)
    s1 = a[1] + b[1]
    c1a = (s1 < a[1]).astype(U32)
    r1 = s1 + c0
    c1b = (r1 < s1).astype(U32)
    s2 = a[2] + b[2]
    c2a = (s2 < a[2]).astype(U32)
    r2 = s2 + c1a + c1b
    c2b = (r2 < s2).astype(U32)
    r3 = a[3] + b[3] + c2a + c2b
    return r0, r1, r2, r3
