"""Statistical sampler tests, key-distribution balance, panic contracts,
and NTT idempotence — the reference test classes round 1 skipped.

Mirrors: uniform bucket balance and Gaussian moments
(reference src/math/sampling.rs:116-207), the 100-key distribution
balance (src/keys/secret_key.rs:334-377), per-assert panic contracts
(src/math/primes.rs:221-464), and NTT idempotence
(src/rings/backends/rns_ntt/poly.rs:717-739).
"""

import numpy as np
import pytest

from toy_heaan_ckks_tpu import CkksContext, generate_primes
from toy_heaan_ckks_tpu.errors import (
    EmptyBasis,
    InvalidDegree,
    InvalidModDrop,
    NonNttFriendlyModulus,
)
from toy_heaan_ckks_tpu.keys import SecretKey, SecretKeyParams
from toy_heaan_ckks_tpu.math import primes, sampling
from toy_heaan_ckks_tpu.math.sampling import make_rng
from toy_heaan_ckks_tpu.ops.modular import ModulusChain
from toy_heaan_ckks_tpu.ops.poly import Poly


# ── statistical sampler tests (sampling.rs:116-207) ─────────────────────────


def test_uniform_bucket_balance():
    """10 equal buckets over [0, q); each within +/-30% of N/10 at N=8192
    (reference sampling.rs:116-135)."""
    n, q = 8192, 1_073_741_441
    vals = sampling.uniform_coefficients(n, q, make_rng(1))
    assert vals.max() < q
    buckets = np.bincount((vals * 10 // q).astype(int), minlength=10)
    expected = n / 10
    assert (buckets > expected * 0.7).all() and (buckets < expected * 1.3).all()


def test_gaussian_mean_and_variance():
    """Mean ~ 0 and variance within 35% of sigma^2 at N=16384
    (reference sampling.rs:172-207)."""
    n, sigma = 16384, 3.2
    vals = sampling.gaussian_coefficients(n, sigma, make_rng(2)).astype(float)
    assert abs(vals.mean()) < 0.35 * sigma
    var = vals.var()
    # rounding to integers adds ~1/12 to the variance
    assert 0.65 * sigma**2 < var < 1.35 * (sigma**2 + 1 / 12)


def test_ternary_exact_weight_and_sign_balance():
    n, hw = 8192, 4096
    vals = sampling.ternary_coefficients(n, hw, make_rng(3))
    assert int(np.count_nonzero(vals)) == hw
    assert set(np.unique(vals)).issubset({-1, 0, 1})
    pos = int((vals == 1).sum())
    assert 0.4 * hw < pos < 0.6 * hw  # fair coin at hw=4096


def test_secret_key_balance_over_100_keys():
    """Aggregate +1/-1 balance over 100 keys; every key's hamming weight
    exact (reference secret_key.rs:334-377)."""
    degree, hw = 64, 32
    ctx = CkksContext.build(generate_primes(30, 1, degree), degree)
    rng = make_rng(4)
    plus = minus = 0
    for _ in range(100):
        sk = SecretKey.generate(SecretKeyParams(hw), ctx, rng)
        coeffs = sk.coeffs
        assert int(np.count_nonzero(coeffs)) == hw
        plus += int((coeffs == 1).sum())
        minus += int((coeffs == -1).sum())
    total = plus + minus
    assert total == 100 * hw
    # binomial(3200, 1/2): 3 sigma ~ 85
    assert abs(plus - minus) < 0.1 * total


# ── panic / error contracts (primes.rs:221-464 tests each assert) ───────────


def test_prime_contracts():
    with pytest.raises(ValueError):
        primes.is_prime(1 << 64)
    with pytest.raises(ValueError):
        primes.is_prime(-1)
    with pytest.raises(ValueError):
        primes.get_first_prime_up(64, 1024)
    with pytest.raises(ValueError):
        primes.get_first_prime_up(-1, 1024)
    with pytest.raises(ValueError):
        primes.get_first_prime_up(30, 0)
    with pytest.raises(ValueError):
        primes.get_first_prime_down(1 << 40, 0)
    assert primes.get_first_prime_down(2, 16) is None
    with pytest.raises(ValueError):
        primes.generate_primes(3, 1, 16)
    with pytest.raises(ValueError):
        primes.generate_primes(64, 1, 16)
    with pytest.raises(ValueError):
        primes.generate_primes(30, 0, 16)
    with pytest.raises(ValueError):
        primes.generate_primes(30, 1, 0)
    with pytest.raises(ValueError):
        primes.is_ntt_friendly_prime(17, 0)
    with pytest.raises(ValueError):
        primes.find_primitive_root(13, 5)  # 5 does not divide 12


def test_sampler_contracts():
    rng = make_rng(5)
    with pytest.raises(ValueError):
        sampling.uniform_coefficients(8, 0, rng)
    with pytest.raises(ValueError):
        sampling.gaussian_coefficients(8, 0.0, rng)
    with pytest.raises(ValueError):
        sampling.gaussian_coefficients(8, float("nan"), rng)
    with pytest.raises(ValueError):
        sampling.ternary_coefficients(8, 9, rng)
    with pytest.raises(ValueError):
        SecretKeyParams(65).validate(64)


def test_context_contracts():
    with pytest.raises(EmptyBasis):
        ModulusChain.build(())
    with pytest.raises(NonNttFriendlyModulus):
        ModulusChain.build((1 << 63,))
    with pytest.raises(NonNttFriendlyModulus):
        CkksContext.build((13,), 16)  # 13 != 1 mod 32
    with pytest.raises(InvalidDegree):
        CkksContext.build(generate_primes(30, 1, 16), 12)
    ctx = CkksContext.build(generate_primes(30, 2, 16), 16)
    with pytest.raises(InvalidModDrop):
        ctx.drop_last(2)


# ── NTT idempotence (poly.rs:717-739) ───────────────────────────────────────


def test_ntt_domain_conversion_idempotent():
    degree = 64
    ctx = CkksContext.build(generate_primes(30, 3, degree), degree)
    p = Poly.sample_uniform(ctx, make_rng(6))
    ntt1 = p.to_ntt_domain()
    ntt2 = ntt1.to_ntt_domain()  # already in NTT domain: identity
    assert ntt2 is ntt1
    back1 = ntt1.to_coeff_domain()
    back2 = back1.to_coeff_domain()
    assert back2 is back1
    np.testing.assert_array_equal(np.asarray(back1.data), np.asarray(p.data))
