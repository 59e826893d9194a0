"""Rotation + slot-algorithm tests.

Mirrors the reference rotation examples and the std-dev pipeline plan:
- rotation_demo: rotate(+1) -> add -> rotate(+2), bound 1e-4 at N=32,
  3 x 30-bit primes, Delta = 2^58 (examples/rotation_demo.rs).
- rotation_stress: k chained rotations, noise linear ~ k * 2e-7
  (examples/rotation_stress.rs, scaled down to k=32 for CI).
- sum_slots / mul_plain_scalar / sub / Horner / std_dev
  (specs/ctx.md items 1-6, examples/std_dev_8.rs).
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
from toy_heaan_ckks_tpu.models import algorithms as alg

N = 32
SLOTS = 16


def rotate_vec(v, k):
    return np.roll(v, -k)


@pytest.fixture(scope="module")
def rot_setup():
    # N=32, 3 x 30-bit primes, Delta = 2^58 >> q_i (rotation_demo params)
    primes = generate_primes(30, 3, N)
    ctx = CkksContext.build(primes, N)
    params = CkksParams(error_variance=3.2, hamming_weight=N // 2, scale_bits=58)
    engine = CkksEngine(ctx, params)
    encoder = CkksEncoder(N, 58)
    rng = make_rng(42)
    sk = engine.generate_secret_key(rng)
    pk = engine.generate_public_key(sk, rng)
    return ctx, params, engine, encoder, rng, sk, pk


def test_rotation_demo(rot_setup):
    ctx, params, engine, encoder, rng, sk, pk = rot_setup
    rotk1 = engine.generate_gadget_rotation_key(sk, 1, rng)
    rotk2 = engine.generate_gadget_rotation_key(sk, 2, rng)

    values = np.arange(1.0, SLOTS + 1)
    ct = engine.encrypt(encoder.encode(values, ctx), pk, ctx.total_bits(), rng)

    ct_rot1 = CkksEngine.rotate_ciphertext(ct, rotk1)
    assert ct_rot1.logp == ct.logp and ct_rot1.logq == ct.logq  # level-free
    ct_added = CkksEngine.add_ciphertexts(ct, ct_rot1)
    ct_result = CkksEngine.rotate_ciphertext(ct_added, rotk2)

    expected = rotate_vec(values + rotate_vec(values, 1), 2)
    out = encoder.decode(CkksEngine.decrypt(ct_result, sk))[:SLOTS]
    assert np.max(np.abs(out - expected)) <= 1e-4


def test_negative_rotation(rot_setup):
    ctx, params, engine, encoder, rng, sk, pk = rot_setup
    rotk = engine.generate_gadget_rotation_key(sk, -1, rng)
    values = np.arange(1.0, SLOTS + 1)
    ct = engine.encrypt(encoder.encode(values, ctx), pk, ctx.total_bits(), rng)
    out = encoder.decode(
        CkksEngine.decrypt(CkksEngine.rotate_ciphertext(ct, rotk), sk)
    )[:SLOTS]
    assert np.max(np.abs(out - rotate_vec(values, -1))) <= 1e-4


def test_rotation_stress_linear_noise(rot_setup):
    # Parity with examples/rotation_stress.rs: error grows ~ linearly,
    # ~2e-7 per rotation at these parameters (we run 32 instead of 800).
    ctx, params, engine, encoder, rng, sk, pk = rot_setup
    rotk = engine.generate_gadget_rotation_key(sk, 1, rng)
    values = np.arange(1.0, SLOTS + 1)
    ct = engine.encrypt(encoder.encode(values, ctx), pk, ctx.total_bits(), rng)
    k = 32
    for _ in range(k):
        ct = CkksEngine.rotate_ciphertext(ct, rotk)
    out = encoder.decode(CkksEngine.decrypt(ct, sk))[:SLOTS]
    expected = rotate_vec(values, k % SLOTS)
    err = np.max(np.abs(out - expected))
    assert err <= k * 2e-6, err  # 10x headroom over the ~2e-7/rot model


def test_sum_slots_and_scalar_mul():
    primes = generate_primes(30, 4, N)
    ctx = CkksContext.build(primes, N)
    params = CkksParams(error_variance=3.2, hamming_weight=N // 2, scale_bits=30)
    engine = CkksEngine(ctx, params)
    encoder = CkksEncoder(N, 30)
    rng = make_rng(5)
    sk = engine.generate_secret_key(rng)
    pk = engine.generate_public_key(sk, rng)
    ladder = KeyLadder(ctx, sk, 3.2, rng, rotations=(1, 2, 4, 8))

    values = np.linspace(0.1, 0.9, SLOTS)
    ct = engine.encrypt(encoder.encode(values, ctx), pk, ctx.total_bits(), rng)

    ct_sum = alg.sum_slots(ct, ladder, SLOTS)
    out = encoder.decode(CkksEngine.decrypt(ct_sum, sk))[:SLOTS]
    assert np.max(np.abs(out - values.sum())) < 1e-3

    # mean via mul_plain_scalar + rescale (consumes one level)
    mean_ct = CkksEngine.rescale_ciphertext(
        engine.mul_plain_scalar(ct_sum, 1.0 / SLOTS)
    )
    sk_red = sk.reduce_to(mean_ct.ctx)
    out = encoder.decode(CkksEngine.decrypt(mean_ct, sk_red))[:SLOTS]
    assert np.max(np.abs(out - values.mean())) < 1e-3


def test_sub_and_neg():
    primes = generate_primes(30, 2, N)
    ctx = CkksContext.build(primes, N)
    params = CkksParams(error_variance=3.2, hamming_weight=N // 2, scale_bits=30)
    engine = CkksEngine(ctx, params)
    encoder = CkksEncoder(N, 30)
    rng = make_rng(6)
    sk = engine.generate_secret_key(rng)
    pk = engine.generate_public_key(sk, rng)
    a = np.array([0.5, -0.25, 0.75])
    b = np.array([0.25, 0.5, -0.5])
    logq = ctx.total_bits()
    ct_a = engine.encrypt(encoder.encode(a, ctx), pk, logq, rng)
    ct_b = engine.encrypt(encoder.encode(b, ctx), pk, logq, rng)
    out = encoder.decode(
        CkksEngine.decrypt(CkksEngine.sub_ciphertexts(ct_a, ct_b), sk)
    )[:3]
    assert np.max(np.abs(out - (a - b))) < 1e-3
    out_neg = encoder.decode(
        CkksEngine.decrypt(CkksEngine.neg_ciphertext(ct_a), sk)
    )[:3]
    assert np.max(np.abs(out_neg + a)) < 1e-3


@pytest.fixture(scope="module")
def deep_setup():
    # 7 x 30-bit primes at N=32, SCALE=30 — the std_dev budget (specs/ctx.md)
    primes = generate_primes(30, 7, N)
    ctx = CkksContext.build(primes, N)
    params = CkksParams(error_variance=3.2, hamming_weight=N // 2, scale_bits=30)
    engine = CkksEngine(ctx, params)
    encoder = CkksEncoder(N, 30)
    rng = make_rng(7)
    sk = engine.generate_secret_key(rng)
    pk = engine.generate_public_key(sk, rng)
    ladder = KeyLadder(ctx, sk, 3.2, rng, rotations=(1, 2, 4, 8))
    return ctx, params, engine, encoder, rng, sk, pk, ladder


def test_eval_poly_horner(deep_setup):
    ctx, params, engine, encoder, rng, sk, pk, ladder = deep_setup
    coeffs = [0.3, -0.5, 0.25, 0.125]  # 0.3 - 0.5x + 0.25x^2 + 0.125x^3
    x = np.array([0.1, 0.4, 0.7, 0.95])
    ct = engine.encrypt(encoder.encode(x, ctx), pk, ctx.total_bits(), rng)
    ct_out = alg.eval_poly_horner(ladder, params, ct, coeffs)
    sk_red = sk.reduce_to(ct_out.ctx)
    out = encoder.decode(CkksEngine.decrypt(ct_out, sk_red))[: len(x)]
    want = np.polyval(coeffs[::-1], x)
    assert np.max(np.abs(out - want)) < 1e-3


def test_sqrt_poly_fit_quality():
    coeffs = alg.sqrt_poly_coeffs()
    x = np.linspace(0.01, 0.25, 200)
    approx = np.polyval(list(coeffs)[::-1], x)
    assert np.max(np.abs(approx - np.sqrt(x))) < 0.02


def test_encrypted_std_dev(deep_setup):
    # The std_dev_8/ctx.md flagship pipeline: 16 normalized sensor readings.
    ctx, params, engine, encoder, rng, sk, pk, ladder = deep_setup
    t = np.arange(SLOTS)
    readings = 0.5 + 0.3 * np.sin(t / 3.0) + 0.05 * np.cos(t * 1.7)
    readings = np.clip(readings, 0.0, 1.0)

    ct = engine.encrypt(encoder.encode(readings, ctx), pk, ctx.total_bits(), rng)
    ct_std = alg.encrypted_std_dev(ladder, params, ct, SLOTS)

    sk_red = sk.reduce_to(ct_std.ctx)
    out = encoder.decode(CkksEngine.decrypt(ct_std, sk_red))[:SLOTS]

    true_std = float(np.std(readings))
    # dominated by the degree-3 sqrt fit error (~1e-2)
    assert np.max(np.abs(out - true_std)) < 0.03, (out[:4], true_std)


def test_conjugate_ciphertext():
    """conj(ct) decodes to the complex conjugate of the slots; Re(x) =
    (x + conj(x))/2 recovers the real parts of a complex encoding."""
    import numpy as np

    from toy_heaan_ckks_tpu import (
        CkksContext, CkksEncoder, CkksEngine, CkksParams, generate_primes,
    )
    from toy_heaan_ckks_tpu.math.sampling import make_rng

    degree = 64
    ctx = CkksContext.build(generate_primes(30, 3, degree), degree)
    eng = CkksEngine(ctx, CkksParams(3.2, degree // 2, 30))
    rng = make_rng(19)
    sk = eng.generate_secret_key(rng)
    pk = eng.generate_public_key(sk, rng)
    cjk = eng.generate_conjugation_key(sk, rng)
    enc = CkksEncoder(degree, 30)
    z = np.linspace(0.1, 0.9, degree // 2) + 1j * np.linspace(-0.4, 0.4, degree // 2)
    ct = eng.encrypt(enc.encode_complex(z, ctx), pk, ctx.total_bits(), rng)
    cc = CkksEngine.conjugate_ciphertext(ct, cjk)
    out = enc.decode_complex(CkksEngine.decrypt(cc, sk))
    np.testing.assert_allclose(out, np.conj(z), atol=1e-4)
    re_ct = CkksEngine.add_ciphertexts(ct, cc)
    re = enc.decode_complex(CkksEngine.decrypt(re_ct, sk)) / 2
    np.testing.assert_allclose(re.real, z.real, atol=1e-4)
    np.testing.assert_allclose(re.imag, 0, atol=1e-4)
