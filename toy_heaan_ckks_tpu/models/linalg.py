"""Encrypted linear algebra: dense matrix x encrypted-vector products.

Public surface over the diagonal-method matvec machinery that powers
bootstrapping's homomorphic DFTs (models/bootstrap.py): any dense n x n
complex matrix (n = N/2 slots) applied to an encrypted vector in ONE
multiplicative level, with either

  - the dense double-hoisted path (one gadget decomposition + one P
    mod-down shared by all n-1 rotations; O(n) rotation keys), or
  - Halevi-Shoup baby-step/giant-step (O(sqrt n) keys;
    ``giant="auto"`` picks by n).

No reference counterpart (the reference exposes only single rotations,
src/crypto/engine.rs:401-463); this is the building block for encrypted
neural-network layers and statistics.
"""

from __future__ import annotations

import numpy as np

from ..engine import CkksEngine
from ..types import Ciphertext
from .bootstrap import BootstrapKeys, _matvec

__all__ = ["matrix_diagonals", "encrypted_matvec", "MatvecKeys"]

# rotation-key supplier for matvecs: identical key-ladder structure to
# the bootstrap key set, so it IS one (alias kept for discoverability —
# users building matvec pipelines need not know about bootstrapping)
MatvecKeys = BootstrapKeys


def matrix_diagonals(m: np.ndarray) -> list[np.ndarray]:
    """Generalized diagonals of a square matrix: diag_r[i] = m[i, (i+r)%n]
    (the diagonal-method decomposition, Halevi-Shoup)."""
    m = np.asarray(m)
    n = m.shape[0]
    if m.shape != (n, n):
        raise ValueError("matrix_diagonals: need a square matrix")
    idx = np.arange(n)
    return [m[idx, (idx + r) % n] for r in range(n)]


def encrypted_matvec(
    ct: Ciphertext,
    matrix: np.ndarray,
    keys: MatvecKeys,
    encoder,
    giant="auto",
) -> Ciphertext:
    """m @ v on an encrypted v (slots = N/2 = matrix dimension).

    Costs one multiplicative level (call follows with the rescale
    included). ``giant``: "auto" (BSGS above 16 slots), an explicit
    giant-step size dividing N/2, or None for the dense double-hoisted
    path.
    """
    n2 = ct.ctx.degree // 2
    m = np.asarray(matrix, dtype=np.complex128)
    if m.shape != (n2, n2):
        raise ValueError(
            f"encrypted_matvec: matrix must be {n2}x{n2} (N/2 slots)"
        )
    out = _matvec(ct, keys, matrix_diagonals(m), encoder, giant)
    return CkksEngine.rescale_ciphertext(out)
