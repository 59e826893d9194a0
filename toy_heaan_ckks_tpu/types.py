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
    # Exact scale Delta. The reference tracks only integer logp, which
    # drifts by (2^bits - q_last)/q_last per rescale (SURVEY.md §2.2,
    # "~1-bit drift"); tracking the true scale as a float (SEAL/Lattigo
    # practice) removes that systematic decode error. None -> 2^scale_bits.
    scale: float | None = None

    @property
    def ctx(self):
        return self.poly.ctx

    @property
    def true_scale(self) -> float:
        return float(self.scale) if self.scale else float(2.0 ** self.scale_bits)


@dataclasses.dataclass(frozen=True, eq=False)
class Ciphertext:
    c0: Poly
    c1: Poly
    logp: int
    logq: int
    scale: float | None = None  # exact Delta; None -> 2^logp

    @property
    def true_scale(self) -> float:
        return float(self.scale) if self.scale else float(2.0 ** self.logp)

    @property
    def ctx(self):
        return self.c0.ctx

    @property
    def level(self) -> int:
        return self.c0.ctx.num_channels

    def mod_switch(self, levels: int = 1) -> "Ciphertext":
        """Drop the top ``levels`` RNS channels WITHOUT dividing (modulus
        switch). logq shrinks by the dropped primes' bits; logp unchanged.

        Implements the reference's declared-but-unimplemented
        ``Ciphertext::mod_switch`` / ``PolyModSwitch`` trait
        (reference: src/crypto/types.rs:44-68, src/rings/traits.rs:129-164
        — no concrete impl exists upstream; SURVEY.md §2.2).
        """
        ctx = self.ctx
        if levels < 1 or levels >= ctx.num_channels:
            raise ValueError("mod_switch: invalid level count")
        dropped_bits = sum(
            m.bit_length() for m in ctx.moduli[-levels:]
        )
        return Ciphertext(
            c0=self.c0.mod_drop_last(levels),
            c1=self.c1.mod_drop_last(levels),
            logp=self.logp,
            logq=self.logq - dropped_bits,
            scale=self.scale,
        )
