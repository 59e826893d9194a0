"""Paterson-Stockmeyer Chebyshev evaluation + function-evaluation API.

``eval_chebyshev_ps`` must match the plain Chebyshev series (and the
linear-recurrence evaluator) within CKKS noise while consuming only
~log2(deg) levels; ``eval_function`` must approximate the target
function to the interpolant's accuracy.
"""

import numpy as np

from toy_heaan_ckks_tpu import (
    CkksContext,
    CkksEncoder,
    CkksEngine,
    CkksParams,
    generate_primes,
)
from toy_heaan_ckks_tpu.keys import KeyLadder
from toy_heaan_ckks_tpu.math.sampling import make_rng
from toy_heaan_ckks_tpu.models.funceval import (
    chebyshev_fit,
    eval_chebyshev_ps,
    eval_function,
    eval_sigmoid,
)

DEGREE = 64
SCALE = 30


def _setup(levels: int, seed: int = 7):
    # SCALE = prime-bit-width rule (tests/integration_mul.rs:6-14): PS
    # recursion branches reach one level through different histories;
    # only q_i ~ Delta keeps their exact scales aligned (sigma^2/q vs
    # sigma*Delta/q differ by Delta/q per level).
    full = CkksContext.build(generate_primes(30, levels, DEGREE), DEGREE)
    params = CkksParams(3.2, 8, SCALE)
    eng = CkksEngine(full, params)
    rng = make_rng(seed)
    sk = eng.generate_secret_key(rng)
    pk = eng.generate_public_key(sk, rng)
    ladder = KeyLadder(full, sk, 3.2, rng, lazy=True)
    enc = CkksEncoder(DEGREE, SCALE)
    return full, params, eng, rng, sk, pk, ladder, enc


def test_ps_matches_plain_chebyshev_deg12():
    """Degree 12 in 9 levels — the linear evaluator would need 13."""
    full, params, eng, rng, sk, pk, ladder, enc = _setup(9)
    x = np.linspace(-0.95, 0.95, DEGREE // 2)
    ct = eng.encrypt(enc.encode(x, full), pk, full.total_bits(), rng)
    coeffs = [0.31, -0.5, 0.22, 0.11, -0.07, 0.05, 0.04, -0.03,
              0.02, 0.015, -0.01, 0.008, 0.005]
    out = eval_chebyshev_ps(ladder, params, ct, coeffs)
    want = np.polynomial.chebyshev.chebval(x, coeffs)
    got = enc.decode(
        CkksEngine.decrypt(out, sk.reduce_to(out.ctx))
    )[: len(x)].real
    assert np.max(np.abs(got - want)) < 2e-3
    # depth: deg-12 PS uses ~6 levels (binary T-chain + 2 recursion muls)
    assert full.num_channels - out.ctx.num_channels <= 7


def test_ps_matches_linear_evaluator():
    from toy_heaan_ckks_tpu.models.bootstrap import eval_chebyshev

    full, params, eng, rng, sk, pk, ladder, enc = _setup(8)
    x = np.linspace(-0.8, 0.8, DEGREE // 2)
    ct = eng.encrypt(enc.encode(x, full), pk, full.total_bits(), rng)
    coeffs = [0.2, 0.4, -0.3, 0.1, 0.05, -0.02, 0.01]  # deg 6
    ps = eval_chebyshev_ps(ladder, params, ct, coeffs)
    lin = eval_chebyshev(ladder, params, ct, coeffs)
    d_ps = enc.decode(CkksEngine.decrypt(ps, sk.reduce_to(ps.ctx)))
    d_lin = enc.decode(CkksEngine.decrypt(lin, sk.reduce_to(lin.ctx)))
    np.testing.assert_allclose(
        d_ps[: len(x)].real, d_lin[: len(x)].real, atol=2e-3
    )


def test_eval_sigmoid():
    full, params, eng, rng, sk, pk, ladder, enc = _setup(10)
    x = np.linspace(-6.0, 6.0, DEGREE // 2)
    ct = eng.encrypt(enc.encode(x, full), pk, full.total_bits(), rng)
    out = eval_sigmoid(ladder, params, ct, interval=(-8.0, 8.0), degree=31)
    got = enc.decode(
        CkksEngine.decrypt(out, sk.reduce_to(out.ctx))
    )[: len(x)].real
    want = 1.0 / (1.0 + np.exp(-x))
    assert np.max(np.abs(got - want)) < 5e-3


def test_eval_function_exp():
    full, params, eng, rng, sk, pk, ladder, enc = _setup(9)
    x = np.linspace(-0.9, 0.9, DEGREE // 2)
    ct = eng.encrypt(enc.encode(x, full), pk, full.total_bits(), rng)
    out = eval_function(
        ladder, params, ct, np.exp, interval=(-1.0, 1.0), degree=15
    )
    got = enc.decode(
        CkksEngine.decrypt(out, sk.reduce_to(out.ctx))
    )[: len(x)].real
    assert np.max(np.abs(got - np.exp(x))) < 2e-3


def test_chebyshev_fit_accuracy():
    c = chebyshev_fit(np.exp, -1.0, 1.0, 15)
    u = np.linspace(-1, 1, 101)
    np.testing.assert_allclose(
        np.polynomial.chebyshev.chebval(u, c), np.exp(u), atol=1e-10
    )


def test_ps_wide_chain():
    """PS evaluation on a wide (61-bit) chain — the reference's
    heavy-prime class (tests/integration_mul.rs:47-51) — with the
    SCALE = prime-bit-width rule at 61 bits."""
    degree, scale, levels = 64, 61, 8
    full = CkksContext.build(generate_primes(scale, levels, degree), degree)
    params = CkksParams(3.2, 8, scale)
    eng = CkksEngine(full, params)
    rng = make_rng(19)
    sk = eng.generate_secret_key(rng)
    pk = eng.generate_public_key(sk, rng)
    ladder = KeyLadder(full, sk, 3.2, rng, lazy=True)
    enc = CkksEncoder(degree, scale)

    x = np.linspace(-0.9, 0.9, degree // 2)
    ct = eng.encrypt(enc.encode(x, full), pk, full.total_bits(), rng)
    coeffs = [0.25, 0.5, -0.25, 0.125, 0.0625, -0.03125, 0.015625]
    out = eval_chebyshev_ps(ladder, params, ct, coeffs)
    want = np.polynomial.chebyshev.chebval(x, coeffs)
    got = enc.decode(
        CkksEngine.decrypt(out, sk.reduce_to(out.ctx))
    )[: len(x)].real
    # Delta = 2^61: precision is limited by the fit/noise, not the scale
    assert np.max(np.abs(got - want)) < 1e-6


def test_normalize_scale_and_combine_heal():
    """normalize_scale brings a drifted ciphertext onto an exact target
    scale (values unchanged, one level consumed); funceval._combine
    self-heals branches whose scales drifted past SCALE_MATCH_TOL (1%)
    instead of raising, leaves sub-tolerance drift untouched, and the
    sum decodes correctly (round-4 regression: 3 composed sign
    iterations hit a 1.03% branch mismatch)."""
    import dataclasses

    from toy_heaan_ckks_tpu.models.algorithms import normalize_scale
    from toy_heaan_ckks_tpu.models.funceval import _combine

    full, params, eng, rng, sk, pk, ladder, enc = _setup(4)
    x = np.linspace(-0.5, 0.5, DEGREE // 2)
    ct = eng.encrypt(enc.encode(x, full), pk, full.total_bits(), rng)

    # direct normalize: 0.7% drifted metadata -> exact target
    drifted = dataclasses.replace(ct, scale=ct.true_scale * 1.007)
    target = ct.true_scale * 1.002
    got = normalize_scale(eng, drifted, target)
    assert got.level == ct.level - 1
    assert abs(got.true_scale - target) < 1e-6 * target
    # slots scaled by exactly 1: decode against the drifted metadata's
    # own claim (values were encrypted at the undrifted scale, so decode
    # with the normalized scale sees x / 1.007)
    dec = enc.decode(CkksEngine.decrypt(got, sk.reduce_to(got.ctx)))
    np.testing.assert_allclose(
        dec[: len(x)].real, x / 1.007, atol=1e-4
    )

    # _combine heal: drift ABOVE the 1% hard tolerance -> no raise, one
    # extra level, correct sum (pre-heal this raised CkksError)
    def engine_at(level):
        return CkksEngine(ladder.at_level(level).ctx, params)

    b = dataclasses.replace(ct, scale=ct.true_scale * 1.015)
    out = _combine(engine_at, ct, b)
    assert out.level == ct.level - 1  # heal consumed one level
    dec2 = enc.decode(CkksEngine.decrypt(out, sk.reduce_to(out.ctx)))
    np.testing.assert_allclose(
        dec2[: len(x)].real, x + x / 1.015, atol=2e-3
    )

    # sub-tolerance drift costs nothing: no heal, level preserved
    b2 = dataclasses.replace(ct, scale=ct.true_scale * 1.005)
    out2 = _combine(engine_at, ct, b2)
    assert out2.level == ct.level
