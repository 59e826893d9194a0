"""Native C++ host runtime vs the pure-Python oracles (exact parity).

The native layer (toy_heaan_ckks_tpu/native/ckks_native.cpp) implements
the prime machinery and CRT reconstruction that the reference keeps in
native Rust (src/math/primes.rs; basis.rs:158-180); these tests pin it to
the Python implementations bit-for-bit.
"""

import os
import random

import numpy as np
import pytest

from toy_heaan_ckks_tpu import native
from toy_heaan_ckks_tpu.math import primes as pp
from toy_heaan_ckks_tpu.math import crt

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no g++)"
)


def _py_is_prime(n: int) -> bool:
    # force the pure-Python Miller-Rabin path
    if n in (0, 1):
        return False
    if n in (2, 3):
        return True
    if n % 2 == 0:
        return False
    d, r = n - 1, 0
    while d % 2 == 0:
        d //= 2
        r += 1
    for a in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        if a >= n:
            continue
        x = pow(a, d, n)
        if x in (1, n - 1):
            continue
        for _ in range(r - 1):
            x = pow(x, 2, n)
            if x == n - 1:
                break
        else:
            return False
    return True


def test_is_prime_parity_random():
    rnd = random.Random(7)
    for _ in range(500):
        n = rnd.randrange(0, 1 << 63)
        assert native.is_prime_u64(n) == _py_is_prime(n), n


def test_is_prime_known_values():
    # reference golden: get_first_prime_up(30, 1024) == 1_073_750_017
    # (reference src/math/primes.rs:407-410)
    assert pp.get_first_prime_up(30, 1024) == 1_073_750_017
    for composite in (3215031751, 3825123056546413051):  # strong pseudoprimes
        assert not native.is_prime_u64(composite)


def test_prime_search_parity():
    for bound, n in [(1 << 31, 1024), (1 << 40, 8192), (100_000, 16)]:
        got = native.first_prime_down(bound, 2 * n)
        want = pp.get_first_prime_down(bound, n)
        assert (got or None) == want


def test_crt_reconstruct_parity():
    rng = np.random.default_rng(3)
    moduli = pp.generate_primes(61, 7, 8192)  # Q ~ 2^427: beyond u128
    res = np.stack([rng.integers(0, m, 512, dtype=np.uint64) for m in moduli])
    a = native.crt_reconstruct_centered(res, moduli)

    # pure-Python oracle (bypass the native dispatch inside crt)
    big_q = 1
    for m in moduli:
        big_q *= m
    acc = np.zeros(512, dtype=object)
    for i, m in enumerate(moduli):
        qi = big_q // m
        s = (res[i].astype(object) * pow(qi % m, -1, m)) % m
        acc = (acc + s * qi) % big_q
    want = np.where(acc > big_q // 2, acc - big_q, acc)
    assert all(int(x) == int(y) for x, y in zip(a, want))


def test_reduce_coeffs_parity():
    rng = np.random.default_rng(5)
    moduli = pp.generate_primes(31, 4, 64)
    coeffs = rng.integers(-(2**62), 2**62, 256, dtype=np.int64)
    got = native.reduce_coeffs(coeffs, moduli)
    for i, m in enumerate(moduli):
        want = coeffs.astype(object) % m
        assert all(int(x) == int(y) for x, y in zip(got[i], want))


def test_crt_to_double_matches_exact():
    rng = np.random.default_rng(9)
    moduli = pp.generate_primes(40, 3, 1024)
    res = np.stack([rng.integers(0, m, 128, dtype=np.uint64) for m in moduli])
    exact = native.crt_reconstruct_centered(res, moduli)
    d = native.crt_to_double(res, moduli, 2.0**40)
    want = np.array([float(int(x)) / 2.0**40 for x in exact])
    np.testing.assert_allclose(d, want, rtol=1e-15)


def test_python_fallback_used_when_disabled(monkeypatch):
    coeffs = np.array([5, -7, 10**30, -(10**30)], dtype=object)
    moduli = [97, 193]
    out = crt.to_residues(coeffs, moduli)  # big ints force the object path
    for i, m in enumerate(moduli):
        assert all(0 <= int(x) < m for x in out[i])
        assert int(out[i][0]) == 5 % m
