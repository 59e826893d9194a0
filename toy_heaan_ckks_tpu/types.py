"""Plaintext / Ciphertext containers.

Parity with the reference's HEAAN-style precision bookkeeping
(reference: src/crypto/types.rs:3-69): a plaintext carries its scale bits
and slot count; a ciphertext carries ``logp`` (precision) and ``logq``
(modulus budget) separately.
"""

from __future__ import annotations

import dataclasses

from .ops.poly import Poly


@dataclasses.dataclass(frozen=True, eq=False)
class Plaintext:
    poly: Poly
    scale_bits: int
    slots: int

    @property
    def ctx(self):
        return self.poly.ctx


@dataclasses.dataclass(frozen=True, eq=False)
class Ciphertext:
    c0: Poly
    c1: Poly
    logp: int
    logq: int

    @property
    def ctx(self):
        return self.c0.ctx

    @property
    def level(self) -> int:
        return self.c0.ctx.num_channels
