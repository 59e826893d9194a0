"""Canonical-embedding transforms for CKKS encoding.

Semantics parity with the reference's special FFT helpers
(reference: src/encoding/special_fft.rs:21-242):

- Slot ordering via the J-function: slot k < N/2 evaluates at psi^{5^k mod 2N}
  and slot N-1-k at the conjugate root (psi = e^{i*pi/N}).
- ``special_idft`` / ``special_dft`` are the reference's O(N^2) Vandermonde
  transforms, kept here (numpy complex128) as the correctness oracle.
- ``embed_encode`` / ``embed_decode`` are the production path: one length-N
  FFT plus a twist and a permutation — O(N log N), removing the reference's
  O(N^2) encode hot loop (SURVEY.md §3.1).

Derivation of the fast path: with e_k the J-ordered exponents,
    decode:  out[k] = p(psi^{e_k}) and {e_k} = all odd residues mod 2N,
    p(psi^{2j+1}) = sum_i c_i psi^i e^{+2pi i * ij / N} = N * ifft(c * psi^i)[j]
so decode is a twist, an inverse FFT and a gather at idx[k] = (e_k-1)/2;
encode is the exact inverse (scatter, forward FFT, untwist, 1/N).
"""

from __future__ import annotations

import functools

import numpy as np


@functools.lru_cache(maxsize=32)
def j_exponents(degree: int) -> np.ndarray:
    """J-ordered odd exponents e_k (k = 0..N-1) mod 2N."""
    n = degree
    two_n = 2 * n
    exps = np.empty(n, dtype=np.int64)
    val = 1
    for h in range(n // 2):
        exps[h] = val
        exps[n - 1 - h] = two_n - val
        val = (val * 5) % two_n
    return exps


@functools.lru_cache(maxsize=32)
def _fft_tables(degree: int):
    n = degree
    exps = j_exponents(n)
    idx = (exps - 1) // 2  # position of each slot's root among odd powers
    i = np.arange(n)
    psi_pow = np.exp(1j * np.pi * i / n)  # psi^i
    return idx, psi_pow


def build_conjugate_slots(values: np.ndarray, degree: int) -> np.ndarray:
    """Conjugate-symmetric N-slot vector: slot k = v_k, slot N-1-k = conj(v_k).

    Zero-pads unsupplied slots (parity: special_fft.rs:158-178).
    """
    n = degree
    values = np.asarray(values, dtype=np.complex128)
    if values.shape[-1] > n // 2:
        raise ValueError("input exceeds slot capacity")
    slots = np.zeros(n, dtype=np.complex128)
    k = values.shape[-1]
    slots[: n // 2][:k] = values
    slots[n // 2 :] = np.conj(slots[: n // 2][::-1])
    return slots


# ── Production FFT path ──────────────────────────────────────────────────────


def embed_encode(slots: np.ndarray, degree: int) -> np.ndarray:
    """Full conjugate-symmetric slot vector -> real coefficient vector.

    Equals the reference's special_idft up to float rounding.
    """
    n = degree
    idx, psi_pow = _fft_tables(n)
    e = np.zeros(n, dtype=np.complex128)
    e[idx] = slots
    coeffs = np.fft.fft(e) / (n * psi_pow)
    return coeffs


def embed_decode(coeffs: np.ndarray, degree: int) -> np.ndarray:
    """Coefficient vector -> slot values (evaluations at J-ordered roots)."""
    n = degree
    idx, psi_pow = _fft_tables(n)
    evals = np.fft.ifft(np.asarray(coeffs, dtype=np.complex128) * psi_pow) * n
    return evals[idx]


# ── O(N^2) Vandermonde oracle (reference parity, for tests) ──────────────────


def special_idft(slots: np.ndarray, degree: int) -> np.ndarray:
    """Reference-parity inverse embedding (special_fft.rs:194-220)."""
    n = degree
    exps = j_exponents(n)
    psi = np.exp(1j * np.pi / n)
    roots = psi ** exps  # slot_roots[k]
    permuted = np.asarray(slots, dtype=np.complex128)[::-1]
    powers = roots[:, None] ** np.arange(n)[None, :]  # (slot, coeff)
    return (permuted @ powers) / n


def special_dft(coeffs: np.ndarray, degree: int) -> np.ndarray:
    """Reference-parity forward embedding (special_fft.rs:224-242)."""
    n = degree
    exps = j_exponents(n)
    psi = np.exp(1j * np.pi / n)
    roots_inv = np.conj(psi ** exps)
    powers = roots_inv[:, None] ** np.arange(n)[None, :]
    slots = powers @ np.asarray(coeffs, dtype=np.complex128)
    return slots[::-1]
