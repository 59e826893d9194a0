"""Encrypted comparison suite (models/compare.py).

sign/compare/max/min/relu are polynomial approximations (CKK20
composite method); tests check slot-wise accuracy against the exact
discontinuous functions on inputs respecting the margin contract
|x| >= delta, plus the host-side iteration planner.
"""

import numpy as np
import pytest

from toy_heaan_ckks_tpu import (
    CkksContext,
    CkksEncoder,
    CkksEngine,
    CkksParams,
    generate_primes,
)
from toy_heaan_ckks_tpu.keys import KeyLadder
from toy_heaan_ckks_tpu.math.sampling import make_rng
from toy_heaan_ckks_tpu.models.compare import (
    SIGN_G3,
    compare,
    eval_max,
    eval_min,
    eval_relu,
    eval_sign,
    plan_sign_iterations,
    sign_f_coeffs,
)

DEGREE = 64
SCALE = 30


def _setup(levels: int, seed: int = 23):
    full = CkksContext.build(generate_primes(30, levels, DEGREE), DEGREE)
    params = CkksParams(3.2, 8, SCALE)
    eng = CkksEngine(full, params)
    rng = make_rng(seed)
    sk = eng.generate_secret_key(rng)
    pk = eng.generate_public_key(sk, rng)
    ladder = KeyLadder(full, sk, 3.2, rng, lazy=True)
    enc = CkksEncoder(DEGREE, SCALE)
    return full, params, eng, rng, sk, pk, ladder, enc


def _dec(enc, sk, out):
    return enc.decode(CkksEngine.decrypt(out, sk.reduce_to(out.ctx))).real


def test_sign_polynomial_families():
    """f_n fixes +-1 and stays inside [-1,1]; g_3 pushes the margin up
    and stays inside [-1,1]; the planner's choice really meets eps."""
    xs = np.linspace(-1, 1, 2001)
    for n in (1, 2, 3, 4):
        f = np.polynomial.Polynomial(sign_f_coeffs(n))
        assert abs(f(1.0) - 1.0) < 1e-12 and abs(f(-1.0) + 1.0) < 1e-12
        assert np.abs(f(xs)).max() <= 1.0 + 1e-12
        # strictly closer to sign on the open interval
        mid = xs[(np.abs(xs) > 0.05) & (np.abs(xs) < 0.95)]
        assert np.all(np.abs(f(mid) - np.sign(mid))
                      < np.abs(mid - np.sign(mid)))
    g = np.polynomial.Polynomial(SIGN_G3)
    assert np.abs(g(xs)).max() <= 1.0
    assert g(0.05) > 0.2  # steep near zero: the whole point of g

    d_g, d_f = plan_sign_iterations(0.05, 1e-3)
    assert (d_g, d_f) == (2, 2)  # matches the hand-simulated table
    with pytest.raises(ValueError):
        plan_sign_iterations(1e-9, 1e-12)


def test_eval_sign_encrypted():
    full, params, eng, rng, sk, pk, ladder, enc = _setup(15)
    x = np.concatenate(
        [np.linspace(0.2, 1.0, DEGREE // 4),
         -np.linspace(0.2, 1.0, DEGREE // 4)]
    )
    ct = eng.encrypt(enc.encode(x, full), pk, full.total_bits(), rng)
    out = eval_sign(ladder, params, ct, g_iters=1, f_iters=2)
    got = _dec(enc, sk, out)[: len(x)]
    assert np.max(np.abs(got - np.sign(x))) < 0.02


def test_compare_and_minmax():
    full, params, eng, rng, sk, pk, ladder, enc = _setup(16)
    rs = np.random.default_rng(5)
    n = DEGREE // 2
    lo = rs.uniform(0.0, 0.35, n)
    hi = lo + rs.uniform(0.25, 0.6, n)  # margin >= 0.25, both in [0, 0.95]
    swap = rs.uniform(size=n) < 0.5
    a = np.where(swap, lo, hi)
    b = np.where(swap, hi, lo)
    assert np.all(np.abs(a - b) >= 0.25) and np.all(np.abs(a - b) <= 1.0)
    ca = eng.encrypt(enc.encode(a, full), pk, full.total_bits(), rng)
    cb = eng.encrypt(enc.encode(b, full), pk, full.total_bits(), rng)

    cmp_ct = compare(ladder, params, ca, cb, g_iters=1, f_iters=2)
    got = _dec(enc, sk, cmp_ct)[: len(a)]
    assert np.max(np.abs(got - (a > b).astype(float))) < 0.02

    mx = eval_max(ladder, params, ca, cb, g_iters=1, f_iters=2)
    got_mx = _dec(enc, sk, mx)[: len(a)]
    assert np.max(np.abs(got_mx - np.maximum(a, b))) < 0.02

    mn = eval_min(ladder, params, ca, cb, g_iters=1, f_iters=2)
    got_mn = _dec(enc, sk, mn)[: len(a)]
    assert np.max(np.abs(got_mn - np.minimum(a, b))) < 0.02
    # max + min == a + b (identity survives the shared-sign evaluation)
    np.testing.assert_allclose(got_mx + got_mn, a + b, atol=0.02)


def test_eval_relu():
    full, params, eng, rng, sk, pk, ladder, enc = _setup(16)
    x = np.concatenate(
        [np.linspace(0.2, 1.0, DEGREE // 4),
         -np.linspace(0.2, 1.0, DEGREE // 4)]
    )
    ct = eng.encrypt(enc.encode(x, full), pk, full.total_bits(), rng)
    out = eval_relu(ladder, params, ct, g_iters=1, f_iters=2)
    got = _dec(enc, sk, out)[: len(x)]
    assert np.max(np.abs(got - np.maximum(x, 0.0))) < 0.02
