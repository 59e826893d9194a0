"""Encrypted linear algebra: matrix x vector and matrix x matrix.

Public surface over the diagonal-method matvec machinery that powers
bootstrapping's homomorphic DFTs (models/bootstrap.py): any dense n x n
complex matrix (n = N/2 slots) applied to an encrypted vector in ONE
multiplicative level, with either

  - the dense double-hoisted path (one gadget decomposition + one P
    mod-down shared by all n-1 rotations; O(n) rotation keys), or
  - Halevi-Shoup baby-step/giant-step (O(sqrt n) keys;
    ``giant="auto"`` picks by n).

Plus fully encrypted d x d matrix PRODUCTS (both operands encrypted,
packed row-major into d^2 = N/2 slots) via the
Jiang-Kim-Lauter-Song method (CCS 2018): pre-permute A by sigma and B
by tau (sparse diagonal linear maps, one level each), then

    C = sum_{k=0}^{d-1} phi^k(sigma(A)) * psi^k(tau(B))

where phi^k is a column shift (two masked rotations) and psi^k a row
shift (ONE pure rotation by k*d) — d ciphertext-ciphertext multiplies
and O(d) rotations total, depth 3, instead of the naive d matvecs.
All rotation fans share hoisted gadget decompositions.

No reference counterpart (the reference exposes only single rotations,
src/crypto/engine.rs:401-463); this is the building block for encrypted
neural-network layers and statistics.
"""

from __future__ import annotations

import math

import numpy as np

from ..engine import SCALE_MATCH_TOL, CkksEngine
from ..errors import CkksError
from ..types import Ciphertext
from .algorithms import align_level
from .bootstrap import BootstrapKeys, _matvec

__all__ = [
    "matrix_diagonals",
    "encrypted_matvec",
    "encrypted_matmul",
    "encrypted_transpose",
    "MatvecKeys",
]

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


# ── encrypted matrix x matrix (JKLS, CCS 2018) ──────────────────────────────


def _square_dim(n2: int) -> int:
    d = math.isqrt(n2)
    if d * d != n2 or d < 2:
        raise CkksError(
            f"encrypted matmul needs d^2 = N/2 slots (got N/2 = {n2})"
        )
    return d


def _sigma_diagonals(d: int) -> dict[int, np.ndarray]:
    """Diagonal decomposition of sigma: out[i,j] = in[i, (i+j) mod d] on
    the row-major packing — 2d-1 nonzero diagonals of the d^2 x d^2
    permutation (offsets i and n2-d+i)."""
    n2 = d * d
    i, j = np.divmod(np.arange(n2), d)
    diags: dict[int, np.ndarray] = {}
    for off in range(d):  # rows with i + j < d sit on diagonal i
        diags[off] = ((i == off) & (i + j < d)).astype(np.float64)
    for off in range(1, d):  # wrapped half: i + j >= d
        diags[n2 - d + off] = ((i == off) & (i + j >= d)).astype(np.float64)
    return {r: v for r, v in diags.items() if v.any()}


def _tau_diagonals(d: int) -> dict[int, np.ndarray]:
    """tau: out[i,j] = in[(i+j) mod d, j] — exactly d diagonals, offset
    j*d with a column-j indicator (the wrapped branch lands on the SAME
    offset mod d^2)."""
    n2 = d * d
    j = np.arange(n2) % d
    return {col * d: (j == col).astype(np.float64) for col in range(d)}


def _transpose_diagonals(d: int) -> dict[int, np.ndarray]:
    """Transpose permutation: out[i,j] = in[j,i] — 2d-1 diagonals at
    offsets t*(d-1) mod d^2 for t = j - i in (-(d-1), d-1)."""
    n2 = d * d
    i, j = np.divmod(np.arange(n2), d)
    return {
        (t * (d - 1)) % n2: (j - i == t).astype(np.float64)
        for t in range(-(d - 1), d)
        if ((j - i) == t).any()
    }


def _sparse_matvec(ct: Ciphertext, keys: MatvecKeys, diags: dict,
                   encoder) -> Ciphertext:
    """sum_r diag_r o rot_r(ct) over a SPARSE diagonal set, one hoisted
    gadget decomposition for all nonzero offsets (the dense
    ``_matvec_hoisted`` restricted to the offsets present). Rescaled."""
    offs = sorted(r for r in diags if r != 0)
    acc = None
    if offs:
        rotks = [keys.rot_key(ct.level, r) for r in offs]
        ext_ctx = rotks[0].ext_ctx
        pts = [encoder.encode_complex(diags[r], ext_ctx) for r in offs]
        acc = CkksEngine.rotate_weighted_sum_hoisted(ct, rotks, pts)
    if 0 in diags:
        t0 = CkksEngine.mul_plain(
            ct, encoder.encode_complex(diags[0], ct.ctx)
        )
        acc = t0 if acc is None else CkksEngine.add_ciphertexts(acc, t0)
    return CkksEngine.rescale_ciphertext(acc)


def encrypted_transpose(ct: Ciphertext, keys: MatvecKeys,
                        encoder) -> Ciphertext:
    """Transpose of an encrypted row-major d x d matrix (d^2 = N/2
    slots): one sparse diagonal permutation, one level (JKLS Sec. 3.2).
    """
    d = _square_dim(ct.ctx.degree // 2)
    return _sparse_matvec(ct, keys, _transpose_diagonals(d), encoder)


def encrypted_matmul(ct_a: Ciphertext, ct_b: Ciphertext,
                     keys: MatvecKeys, encoder) -> Ciphertext:
    """A @ B with BOTH d x d matrices encrypted (row-major packing,
    d^2 = N/2 slots): the JKLS algorithm.

    Depth 3 (sigma/tau permutation level, column-shift mask level, one
    ct-ct multiply level); d ciphertext multiplies; every rotation fan
    (sigma, tau, the 2(d-1) column shifts of sigma(A), the d-1 row
    shifts of tau(B)) shares one hoisted gadget decomposition. Operands
    must sit at the same level with matching scales.
    """
    if ct_a.level != ct_b.level:
        raise CkksError(
            "encrypted_matmul: operands must sit at the same level "
            f"(got {ct_a.level} and {ct_b.level}); align_level first"
        )
    if abs(ct_a.true_scale - ct_b.true_scale) > SCALE_MATCH_TOL * max(
        ct_a.true_scale, ct_b.true_scale
    ):
        raise CkksError(
            "encrypted_matmul: operand scales differ "
            f"({ct_a.true_scale:.6g} vs {ct_b.true_scale:.6g})"
        )
    n2 = ct_a.ctx.degree // 2
    d = _square_dim(n2)
    ladder, params = keys.ladder, keys.params

    def engine_at(level):
        return CkksEngine(ladder.at_level(level).ctx, params)

    a_s = _sparse_matvec(ct_a, keys, _sigma_diagonals(d), encoder)
    b_t = _sparse_matvec(ct_b, keys, _tau_diagonals(d), encoder)

    # column shifts phi^k(a_s): rotations by k (slots j < d-k) and
    # n2-d+k (slots j >= d-k), all hoisted off one decomposition
    lvl = a_s.level
    lo_off = list(range(1, d))
    hi_off = [n2 - d + k for k in range(1, d)]
    rots = CkksEngine.rotate_hoisted(
        a_s, [keys.rot_key(lvl, r) for r in lo_off + hi_off]
    )
    rot_lo = dict(zip(lo_off, rots[: d - 1]))
    rot_hi = dict(zip(hi_off, rots[d - 1 :]))

    j = np.arange(n2) % d

    def phi(k: int) -> Ciphertext:
        if k == 0:  # uniform one-level mask multiply keeps scales aligned
            t = CkksEngine.mul_plain(
                a_s, encoder.encode_complex(np.ones(n2), a_s.ctx)
            )
        else:
            m_lo = (j < d - k).astype(np.float64)
            m_hi = (j >= d - k).astype(np.float64)
            t = CkksEngine.add_ciphertexts(
                CkksEngine.mul_plain(
                    rot_lo[k], encoder.encode_complex(m_lo, a_s.ctx)
                ),
                CkksEngine.mul_plain(
                    rot_hi[n2 - d + k],
                    encoder.encode_complex(m_hi, a_s.ctx),
                ),
            )
        return CkksEngine.rescale_ciphertext(t)

    # row shifts psi^k(b_t) = ONE rotation by k*d; align b_t down to the
    # masked level first so one alignment serves all d shifts
    b_dn = align_level(engine_at(b_t.level), b_t, lvl - 1)
    psis = [b_dn] + CkksEngine.rotate_hoisted(
        b_dn, [keys.rot_key(b_dn.level, k * d) for k in range(1, d)]
    )

    acc = None
    for k in range(d):
        pk = phi(k)
        rlk = ladder.at_level(pk.level).rlk
        prod = CkksEngine.mul_ciphertexts_gadget(pk, psis[k], rlk)
        acc = prod if acc is None else CkksEngine.add_ciphertexts(acc, prod)
    return CkksEngine.rescale_ciphertext(acc)
