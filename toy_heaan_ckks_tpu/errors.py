"""Typed error hierarchy (parity with the reference's thiserror enums).

The reference defines RnsNttError / CkksError / per-key error enums
(reference: src/rings/backends/rns_ntt/errors.rs:3-22,
src/crypto/errors.rs:3-26). Here the same conditions raise typed
exceptions; each subclasses ValueError so existing ``except ValueError``
call sites keep working.
"""

from __future__ import annotations


class CkksError(ValueError):
    """Base class for all library errors."""


class InvalidDegree(CkksError):
    """Ring degree is not a power of two (reference: RnsNttError::InvalidDegree)."""


class EmptyBasis(CkksError):
    """No RNS moduli supplied (reference: RnsNttError::EmptyBasis)."""


class NonNttFriendlyModulus(CkksError):
    """q != 1 (mod 2N) (reference: RnsNttError::NonNttFriendlyModulus)."""


class InvalidModDrop(CkksError):
    """Dropping too many RNS channels (reference: RnsNttError::InvalidModDrop)."""


class ChannelCountMismatch(CkksError):
    """Operands built over different bases
    (reference: RnsNttError::ChannelCountMismatch)."""


class NonReducedCoefficient(CkksError):
    """A residue >= its modulus
    (reference: RnsNttError::NonReducedCoefficient)."""


class EncodingError(CkksError):
    """Encoder misuse: too many slots / degree mismatch
    (reference: src/crypto/errors.rs CkksError variants)."""


class KeyError_(CkksError):
    """Key parameter validation failures (reference: per-key error enums)."""
