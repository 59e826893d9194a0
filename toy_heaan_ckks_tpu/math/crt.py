"""Exact CRT reconstruction (host-side, arbitrary precision).

Parity with the reference's centered reconstruction
(reference: src/rings/backends/rns_ntt/basis.rs:158-180), but WITHOUT the
u128 ceiling: Python big ints remove the reference's Q < 2^128 limit, so
decode works at any level count.

Vectorised over numpy object arrays: for N=8192, L=7 this is a few tens of
milliseconds, and it only runs at the encode/decode boundary (client side),
never on the TPU hot path. A C++ fast path may be layered underneath later.
"""

from __future__ import annotations

import numpy as np


def crt_garner_coefficients(moduli: list[int]) -> list[tuple[int, int]]:
    """Precompute (Q_i, Q_i^{-1} mod q_i) for direct CRT over ``moduli``."""
    q = 1
    for m in moduli:
        q *= m
    out = []
    for m in moduli:
        qi = q // m
        qi_inv = pow(qi % m, -1, m)
        out.append((qi, qi_inv))
    return out


def reconstruct_centered(residues: np.ndarray, moduli: list[int]) -> np.ndarray:
    """CRT-reconstruct each coefficient, centered in (-Q/2, Q/2].

    ``residues`` has shape (L, N) with residues[i][j] = a_j mod q_i (any
    integer dtype, or object). Returns an object-dtype array of N Python
    ints (exact, may exceed i64 when Q is large).

    Routed through the native C++ multiword implementation when compiled
    (toy_heaan_ckks_tpu/native/ckks_native.cpp); this pure-Python body is
    the fallback and oracle.
    """
    moduli = [int(m) for m in moduli]
    from .. import native

    if native.available() and all(m < (1 << 63) for m in moduli):
        return native.crt_reconstruct_centered(
            np.asarray(residues, dtype=np.uint64)
            if residues.dtype != object
            else np.array(
                [[int(x) for x in row] for row in residues], dtype=np.uint64
            ),
            moduli,
        )
    big_q = 1
    for m in moduli:
        big_q *= m
    half_q = big_q // 2

    n = residues.shape[1]
    acc = np.zeros(n, dtype=object)
    pre = crt_garner_coefficients(moduli)
    for i, m in enumerate(moduli):
        qi, qi_inv = pre[i]
        r = residues[i].astype(object)
        s = (r * qi_inv) % m
        acc = (acc + s * qi) % big_q

    centered = np.where(acc > half_q, acc - big_q, acc)
    return centered


def to_residues(coeffs: np.ndarray, moduli: list[int]) -> np.ndarray:
    """Map signed integer coefficients (exact, object or int64) to per-channel
    residues in [0, q_i). Returns shape (L, N) object array of Python ints.

    Parity: RnsPoly::from_coeffs reduces with rem_euclid per channel
    (reference: src/rings/backends/rns_ntt/poly.rs:49-67).
    """
    coeffs = np.asarray(coeffs, dtype=object)
    from .. import native

    if native.available() and all(
        isinstance(c, (int, np.integer)) and -(1 << 63) <= c < (1 << 63)
        for c in coeffs.flat
    ) and all(int(m) < (1 << 63) for m in moduli):
        res = native.reduce_coeffs(
            np.asarray([int(c) for c in coeffs], dtype=np.int64), moduli
        )
        return res.astype(object)
    out = np.empty((len(moduli), coeffs.shape[0]), dtype=object)
    for i, m in enumerate(moduli):
        out[i] = coeffs % int(m)
    return out
