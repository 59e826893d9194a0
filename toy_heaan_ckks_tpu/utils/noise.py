"""Noise / precision diagnostics for ciphertexts (dev observability).

The reference's only "metric" is each example's bound check
(reference examples/*.rs `check_bound` style); production CKKS work
needs to SEE the noise budget while developing a circuit. These helpers
measure it exactly — decryption goes through the big-int CRT path, so
the reported coefficient noise is the true integer distance, not a
float estimate.

All functions need the secret key: they are debugging tools for circuit
development, not runtime observers.
"""

from __future__ import annotations

import numpy as np

from ..engine import CkksEngine
from ..keys import SecretKey
from ..types import Ciphertext, Plaintext

__all__ = [
    "coefficient_noise_bits",
    "slot_precision_bits",
    "budget_report",
]


def coefficient_noise_bits(ct: Ciphertext, sk: SecretKey,
                           pt: Plaintext) -> float:
    """log2 of the largest |decrypt(ct) - pt| coefficient (exact ints).

    ``pt`` is the exact expected plaintext (e.g. the encoding of the true
    message at the ciphertext's scale). Fresh encryptions measure around
    log2(sigma * sqrt(hw * N)); each homomorphic op adds its analytic
    share. Returns -inf for a noiseless match."""
    got = CkksEngine.decrypt(ct, sk.reduce_to(ct.ctx)).poly.to_coeffs()
    want = pt.poly.to_coeffs()
    worst = max(abs(int(a) - int(b)) for a, b in zip(got, want))
    return float(np.log2(worst)) if worst else float("-inf")


def slot_precision_bits(ct: Ciphertext, sk: SecretKey, encoder,
                        expected) -> float:
    """-log2 of the max slot-space error vs ``expected`` — the usable
    message precision in bits (e.g. ~20 bits means errors ~1e-6)."""
    expected = np.asarray(expected)
    dec = encoder.decode_complex(
        CkksEngine.decrypt(ct, sk.reduce_to(ct.ctx))
    )[: expected.shape[0]]
    err = float(np.max(np.abs(dec - expected)))
    return float(-np.log2(err)) if err else float("inf")


def budget_report(ct: Ciphertext, sk: SecretKey | None = None,
                  encoder=None, expected=None) -> dict:
    """One-line status of a ciphertext's remaining compute budget.

    Always reports the level/modulus bookkeeping; with ``sk`` (and
    optionally ``encoder``+``expected``) adds the measured precision.
    """
    out = {
        "level": ct.level,
        "logq": ct.logq,
        "logp": ct.logp,
        "true_scale_bits": float(np.log2(ct.true_scale)),
        "levels_remaining": ct.level - 1,
    }
    if sk is not None and encoder is not None and expected is not None:
        out["slot_precision_bits"] = slot_precision_bits(
            ct, sk, encoder, expected
        )
    return out
