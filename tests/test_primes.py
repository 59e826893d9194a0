"""Prime machinery tests.

Mirrors the reference's unit-test strategy for primes
(reference: src/math/primes.rs:221-464, src/math/utils.rs:82-105):
Miller-Rabin vs trial-division oracle over ranges, known golden values,
NTT-friendliness, and generate_primes contracts.
"""

import pytest

from toy_heaan_ckks_tpu.math.primes import (
    find_primitive_root,
    generate_primes,
    get_first_prime_down,
    get_first_prime_up,
    is_ntt_friendly_prime,
    is_prime,
    is_prime_reference,
    mod_inverse,
)


def test_small_primes():
    known = {2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47}
    for n in range(50):
        assert is_prime(n) == (n in known)


def test_miller_rabin_matches_trial_division_range():
    for n in range(2, 3000):
        assert is_prime(n) == is_prime_reference(n), n


def test_carmichael_and_strong_pseudoprimes_rejected():
    # Carmichael numbers and strong pseudoprimes to base 2
    for n in (561, 1105, 1729, 2047, 3277, 4033, 8321, 15841, 29341):
        assert not is_prime(n)


def test_large_known_primes():
    assert is_prime(2**61 - 1)  # Mersenne prime
    assert not is_prime(2**62 - 1)
    assert is_prime(18446744073709551557)  # largest u64 prime
    assert not is_prime(18446744073709551615)


def test_get_first_prime_up_golden():
    # Golden value pinned by the reference (src/math/primes.rs:407-410).
    assert get_first_prime_up(30, 1024) == 1_073_750_017


def test_get_first_prime_up_congruence():
    for logq, n in ((20, 256), (30, 1024), (45, 4096)):
        p = get_first_prime_up(logq, n)
        assert p >= 1 << logq
        assert p % (2 * n) == 1
        assert is_prime(p)


def test_get_first_prime_down():
    p = get_first_prime_down(1 << 31, 1024)
    assert p is not None
    assert p < 1 << 31
    assert p % 2048 == 1
    assert is_prime(p)
    assert get_first_prime_down(2, 8) is None


def test_ntt_friendly():
    # 97 = 1 mod 16, 113 = 1 mod 16 (degree 8)
    assert is_ntt_friendly_prime(97, 8)
    assert is_ntt_friendly_prime(113, 8)
    assert not is_ntt_friendly_prime(19, 8)  # prime but 19 % 16 != 1
    assert not is_ntt_friendly_prime(33, 8)  # 33 % 16 = 1 but composite


@pytest.mark.parametrize("bits,count,degree", [(31, 4, 16), (40, 3, 1024), (62, 2, 1024)])
def test_generate_primes(bits, count, degree):
    primes = generate_primes(bits, count, degree)
    assert len(primes) == count
    assert len(set(primes)) == count
    for p in primes:
        assert (1 << (bits - 1)) <= p < (1 << bits)
        assert is_ntt_friendly_prime(p, degree)


def test_generate_primes_exhaustion():
    with pytest.raises(ValueError):
        generate_primes(4, 10, 2)


def test_mod_inverse():
    for a, m in ((3, 97), (96, 97), (12345, 1_073_750_017)):
        inv = mod_inverse(a, m)
        assert (a * inv) % m == 1
    with pytest.raises(ValueError):
        mod_inverse(4, 8)


def test_find_primitive_root():
    for q, degree in ((97, 8), (1_073_750_017, 1024)):
        order = 2 * degree
        psi = find_primitive_root(q, order)
        assert pow(psi, order, q) == 1
        assert pow(psi, order // 2, q) != 1
        # psi^N = -1 (negacyclic requirement)
        assert pow(psi, degree, q) == q - 1
