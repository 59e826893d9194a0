"""End-to-end homomorphic pipeline tests.

Reproduces the reference's acceptance contracts:
- encrypt -> add -> decrypt within 10*sigma*sqrt(hw*N)/Delta + 4/Delta
  (examples/encrypt_add.rs:119-131)
- mul + gadget relin + rescale within 1e-4 at toy params
  (examples/encrypt_mul.rs:149-155)
- the five N=1024 integration scenarios of tests/integration_mul.rs
  (single mul < 1e-8, chained muls < 1e-4, (a+b)*c < 1e-8, (a*b)+c < 1e-4,
  full-slot mul < 1e-6)
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
from toy_heaan_ckks_tpu.math.sampling import make_rng

N_BIG = 1024
SCALE_LARGE = 62
SCALE_CHAIN = 40


def make_engine(ctx, scale_bits, hw=None):
    return CkksEngine(
        ctx,
        CkksParams(
            error_variance=3.2,
            hamming_weight=hw if hw is not None else ctx.degree // 2,
            scale_bits=scale_bits,
        ),
    )


def max_abs_err(expected, actual):
    return float(np.max(np.abs(np.asarray(expected) - np.asarray(actual))))


# ── toy params (N=16) ────────────────────────────────────────────────────────


def test_encrypt_decrypt_roundtrip_toy():
    degree, scale = 16, 30
    ctx = CkksContext.build(generate_primes(31, 3, degree), degree)
    engine = make_engine(ctx, scale, hw=8)
    encoder = CkksEncoder(degree, scale)
    rng = make_rng(42)

    sk = engine.generate_secret_key(rng)
    pk = engine.generate_public_key(sk, rng)

    values = np.array([1.5, -0.25, 0.75, 2.0])
    pt = encoder.encode(values, ctx)
    ct = engine.encrypt(pt, pk, ctx.total_bits(), rng)
    out = encoder.decode(CkksEngine.decrypt(ct, sk))[: len(values)]

    sigma, hw = 3.2, 8
    delta = 2.0**scale
    bound = 10 * sigma * np.sqrt(hw * degree) / delta + 4 / delta
    assert max_abs_err(values, out) <= bound


def test_encrypt_add_decrypt_toy():
    # Parity with examples/encrypt_add.rs
    degree, scale = 16, 30
    ctx = CkksContext.build(generate_primes(31, 3, degree), degree)
    engine = make_engine(ctx, scale, hw=8)
    encoder = CkksEncoder(degree, scale)
    rng = make_rng(42)

    sk = engine.generate_secret_key(rng)
    pk = engine.generate_public_key(sk, rng)

    a = np.array([1.5, 2.5, -3.0, 0.25])
    b = np.array([0.5, -1.0, 2.0, 1.75])
    ct_a = engine.encrypt(encoder.encode(a, ctx), pk, ctx.total_bits(), rng)
    ct_b = engine.encrypt(encoder.encode(b, ctx), pk, ctx.total_bits(), rng)
    ct_sum = CkksEngine.add_ciphertexts(ct_a, ct_b)
    out = encoder.decode(CkksEngine.decrypt(ct_sum, sk))[: len(a)]

    sigma, hw = 3.2, 8
    delta = 2.0**scale
    bound = 2 * (10 * sigma * np.sqrt(hw * degree) / delta) + 8 / delta
    assert max_abs_err(a + b, out) <= bound


def test_encrypt_mul_gadget_rescale_toy():
    # Parity with examples/encrypt_mul.rs (N=16, 4x31-bit, bound 1e-4)
    degree, scale = 16, 30
    ctx = CkksContext.build(generate_primes(31, 4, degree), degree)
    engine = make_engine(ctx, scale, hw=8)
    encoder = CkksEncoder(degree, scale)
    rng = make_rng(42)

    sk = engine.generate_secret_key(rng)
    pk = engine.generate_public_key(sk, rng)
    rlk = engine.generate_gadget_relin_key(sk, rng)

    a = np.array([1.5, -0.5, 0.75, 0.25])
    b = np.array([0.5, 2.0, -1.0, 0.125])
    logq = ctx.total_bits()
    ct_a = engine.encrypt(encoder.encode(a, ctx), pk, logq, rng)
    ct_b = engine.encrypt(encoder.encode(b, ctx), pk, logq, rng)

    ct_prod = CkksEngine.mul_ciphertexts_gadget(ct_a, ct_b, rlk)
    assert ct_prod.logp == 2 * scale
    ct_rs = CkksEngine.rescale_ciphertext(ct_prod)
    assert ct_rs.level == 3

    sk_red = sk.reduce_to(ct_rs.ctx)
    out = encoder.decode(CkksEngine.decrypt(ct_rs, sk_red))[: len(a)]
    assert max_abs_err(a * b, out) <= 1e-4


def test_legacy_mul_ciphertexts_api():
    # Legacy single-pair relin (reference engine.rs:153-203): correctness of
    # the algebra at tiny noise; uses small values so d2*e noise stays low.
    degree, scale = 16, 30
    ctx = CkksContext.build(generate_primes(31, 4, degree), degree)
    engine = make_engine(ctx, scale, hw=8)
    encoder = CkksEncoder(degree, scale)
    rng = make_rng(11)
    sk = engine.generate_secret_key(rng)
    pk = engine.generate_public_key(sk, rng)
    rlk = engine.generate_relinearization_key(sk, rng)
    a = np.array([0.5, -0.25])
    b = np.array([0.25, 0.5])
    logq = ctx.total_bits()
    ct_a = engine.encrypt(encoder.encode(a, ctx), pk, logq, rng)
    ct_b = engine.encrypt(encoder.encode(b, ctx), pk, logq, rng)
    ct = CkksEngine.mul_ciphertexts(ct_a, ct_b, rlk)
    # Bookkeeping parity only: the reference's single-pair relin path has
    # noise ~ |d2| * e (unbounded for general ciphertexts) and is flagged as
    # legacy scaffolding by its own audit (specs/ckks_add_mul_audit.md);
    # only the key relation is verified end-to-end upstream (examples/
    # keys.rs:103-159), which test_keys.py::test_relin_key_relation covers.
    assert ct.logp == 2 * scale
    assert ct.logq == ct_a.logq
    assert ct.level == ctx.num_channels


# ── N=1024 integration scenarios (reference tests/integration_mul.rs) ────────


@pytest.fixture(scope="module")
def large_setup():
    primes = generate_primes(SCALE_LARGE, 2, N_BIG)
    ctx = CkksContext.build(primes, N_BIG)
    engine = make_engine(ctx, SCALE_LARGE)
    encoder = CkksEncoder(N_BIG, SCALE_LARGE)
    rng = make_rng(1)
    sk = engine.generate_secret_key(rng)
    pk = engine.generate_public_key(sk, rng)
    rlk = engine.generate_gadget_relin_key(sk, rng)
    return ctx, engine, encoder, rng, sk, pk, rlk


@pytest.fixture(scope="module")
def chain_setup():
    primes = generate_primes(SCALE_CHAIN, 3, N_BIG)
    ctx = CkksContext.build(primes, N_BIG)
    engine = make_engine(ctx, SCALE_CHAIN)
    encoder = CkksEncoder(N_BIG, SCALE_CHAIN)
    rng = make_rng(2)
    sk = engine.generate_secret_key(rng)
    pk = engine.generate_public_key(sk, rng)
    rlk = engine.generate_gadget_relin_key(sk, rng)
    return ctx, engine, encoder, rng, sk, pk, rlk


def mul_and_rescale(ct_a, ct_b, rlk):
    return CkksEngine.rescale_ciphertext(
        CkksEngine.mul_ciphertexts_gadget(ct_a, ct_b, rlk)
    )


def test_single_multiplication_large_primes(large_setup):
    ctx, engine, encoder, rng, sk, pk, rlk = large_setup
    logq = ctx.total_bits()
    a = np.array([0.5, -0.25, 0.75, -0.125, 0.9, -0.6, 0.3, -0.8])
    b = np.array([0.4, 0.8, -0.2, 0.6, -0.5, 0.35, -0.7, 0.15])
    ct_a = engine.encrypt(encoder.encode(a, ctx), pk, logq, rng)
    ct_b = engine.encrypt(encoder.encode(b, ctx), pk, logq, rng)
    ct_rs = mul_and_rescale(ct_a, ct_b, rlk)
    sk_l1 = sk.reduce_to(ct_rs.ctx)
    out = encoder.decode(CkksEngine.decrypt(ct_rs, sk_l1))[: len(a)]
    assert max_abs_err(a * b, out) < 1e-8


def test_two_chained_multiplications(chain_setup):
    ctx, engine, encoder, rng, sk, pk, rlk = chain_setup
    logq = ctx.total_bits()
    a = np.array([0.9, 0.5, 0.8, 0.3, 0.7, 0.4, 0.6, 0.2])
    b = np.array([0.8, 0.6, 0.4, 0.9, 0.5, 0.7, 0.3, 0.85])
    c = np.array([0.7, 0.9, 0.3, 0.5, 0.6, 0.8, 0.4, 0.1])

    ct_a = engine.encrypt(encoder.encode(a, ctx), pk, logq, rng)
    ct_b = engine.encrypt(encoder.encode(b, ctx), pk, logq, rng)
    ct_ab = mul_and_rescale(ct_a, ct_b, rlk)

    ctx_l2 = ct_ab.ctx
    sk_l2 = sk.reduce_to(ctx_l2)
    engine_l2 = make_engine(ctx_l2, SCALE_CHAIN)
    pk_l2 = engine_l2.generate_public_key(sk_l2, rng)
    rlk_l2 = engine_l2.generate_gadget_relin_key(sk_l2, rng)

    pt_c = encoder.encode(c, ctx_l2)
    ct_c = engine_l2.encrypt(pt_c, pk_l2, ct_ab.logq, rng)
    ct_abc = mul_and_rescale(ct_ab, ct_c, rlk_l2)

    sk_l1 = sk.reduce_to(ct_abc.ctx)
    out = encoder.decode(CkksEngine.decrypt(ct_abc, sk_l1))[: len(a)]
    assert max_abs_err(a * b * c, out) < 1e-4


def test_add_then_multiply(large_setup):
    ctx, engine, encoder, rng, sk, pk, rlk = large_setup
    logq = ctx.total_bits()
    a = np.array([0.3, -0.4, 0.6, -0.2, 0.8, -0.1, 0.5, -0.7])
    b = np.array([-0.1, 0.5, -0.3, 0.7, -0.4, 0.6, -0.2, 0.4])
    c = np.array([0.9, 0.7, 0.5, 0.3, 0.8, 0.6, 0.4, 0.2])
    ct_a = engine.encrypt(encoder.encode(a, ctx), pk, logq, rng)
    ct_b = engine.encrypt(encoder.encode(b, ctx), pk, logq, rng)
    ct_c = engine.encrypt(encoder.encode(c, ctx), pk, logq, rng)
    ct_sum = CkksEngine.add_ciphertexts(ct_a, ct_b)
    ct_rs = mul_and_rescale(ct_sum, ct_c, rlk)
    sk_l1 = sk.reduce_to(ct_rs.ctx)
    out = encoder.decode(CkksEngine.decrypt(ct_rs, sk_l1))[: len(a)]
    assert max_abs_err((a + b) * c, out) < 1e-8


def test_multiply_then_add(chain_setup):
    ctx, engine, encoder, rng, sk, pk, rlk = chain_setup
    logq = ctx.total_bits()
    a = np.array([0.6, -0.3, 0.8, -0.5, 0.4, -0.7, 0.2, -0.9])
    b = np.array([0.5, 0.7, 0.3, 0.9, 0.6, 0.4, 0.8, 0.1])
    c = np.array([0.1, -0.2, 0.4, -0.3, 0.7, -0.5, 0.3, -0.6])
    ct_a = engine.encrypt(encoder.encode(a, ctx), pk, logq, rng)
    ct_b = engine.encrypt(encoder.encode(b, ctx), pk, logq, rng)
    ct_ab = mul_and_rescale(ct_a, ct_b, rlk)

    ctx_l2 = ct_ab.ctx
    sk_l2 = sk.reduce_to(ctx_l2)
    engine_l2 = make_engine(ctx_l2, SCALE_CHAIN)
    pk_l2 = engine_l2.generate_public_key(sk_l2, rng)
    ct_c = engine_l2.encrypt(encoder.encode(c, ctx_l2), pk_l2, ct_ab.logq, rng)

    ct_sum = CkksEngine.add_ciphertexts(ct_ab, ct_c)
    out = encoder.decode(CkksEngine.decrypt(ct_sum, sk_l2))[: len(a)]
    assert max_abs_err(a * b + c, out) < 1e-4


def test_full_slots_single_multiplication(large_setup):
    ctx, engine, encoder, rng, sk, pk, rlk = large_setup
    logq = ctx.total_bits()
    slots = N_BIG // 2
    val_rng = make_rng(99)
    a = val_rng.uniform(-0.9, 0.9, size=slots)
    b = val_rng.uniform(-0.9, 0.9, size=slots)
    ct_a = engine.encrypt(encoder.encode(a, ctx), pk, logq, rng)
    ct_b = engine.encrypt(encoder.encode(b, ctx), pk, logq, rng)
    ct_rs = mul_and_rescale(ct_a, ct_b, rlk)
    sk_l1 = sk.reduce_to(ct_rs.ctx)
    out = encoder.decode(CkksEngine.decrypt(ct_rs, sk_l1))[:slots]
    assert max_abs_err(a * b, out) < 1e-6


def test_legacy_mul_exact_relinearization_identity():
    """Value-level verification of the legacy single-pair relin path
    (reference engine.rs:153-203): the multiplied ciphertext must satisfy

        c0' + c1'*s == (c0 + c1*s)*(d0 + d1*s) + d2*(b + a*s - s^2)

    exactly (residue equality) — i.e. the output decrypts to the product
    of the decryptions plus d2 times the key's small relinearization
    residual. This pins the whole path end-to-end (the residual itself
    makes the decoded noise unbounded by design, so bounds cannot)."""
    degree = 64
    ctx = CkksContext.build(generate_primes(30, 4, degree), degree)
    engine = CkksEngine(ctx, CkksParams(3.2, degree // 2, 30))
    rng = make_rng(77)
    sk = engine.generate_secret_key(rng)
    pk = engine.generate_public_key(sk, rng)
    rk = engine.generate_relinearization_key(sk, rng)
    enc = CkksEncoder(degree, 30)
    a = np.linspace(0.1, 0.9, degree // 2)
    b = np.linspace(-0.5, 0.5, degree // 2)
    ct1 = engine.encrypt(enc.encode(a, ctx), pk, ctx.total_bits(), rng)
    ct2 = engine.encrypt(enc.encode(b, ctx), pk, ctx.total_bits(), rng)

    out = CkksEngine.mul_ciphertexts(ct1, ct2, rk)

    s = sk.poly
    dec = lambda ct: ct.c0.to_ntt_domain() + ct.c1.to_ntt_domain() * s
    lhs = dec(out)
    m1, m2 = dec(ct1), dec(ct2)
    d2 = ct1.c1.to_ntt_domain() * ct2.c1.to_ntt_domain()
    resid = rk.b + rk.a * s - s * s
    rhs = m1 * m2 + d2 * resid
    np.testing.assert_array_equal(
        np.asarray(lhs.data), np.asarray(rhs.data)
    )


def test_square_ciphertext_bit_exact_with_general_mul():
    # square_ciphertext's 2*c0*c1 shortcut must produce the SAME residues
    # as mul_ciphertexts_gadget(ct, ct) (mont_mul is commutative and the
    # modular double equals the two-product sum canonically)
    degree, scale = 16, 30
    ctx = CkksContext.build(generate_primes(31, 4, degree), degree)
    engine = make_engine(ctx, scale, hw=8)
    encoder = CkksEncoder(degree, scale)
    rng = make_rng(9)

    sk = engine.generate_secret_key(rng)
    pk = engine.generate_public_key(sk, rng)
    rlk = engine.generate_gadget_relin_key(sk, rng, digit_size=2)

    a = np.array([1.25, -0.5, 0.3, 0.8])
    ct = engine.encrypt(encoder.encode(a, ctx), pk, ctx.total_bits(), rng)

    sq = CkksEngine.square_ciphertext(ct, rlk)
    ref = CkksEngine.mul_ciphertexts_gadget(ct, ct, rlk)
    np.testing.assert_array_equal(
        np.asarray(sq.c0.to_ntt_domain().data),
        np.asarray(ref.c0.to_ntt_domain().data),
    )
    np.testing.assert_array_equal(
        np.asarray(sq.c1.to_ntt_domain().data),
        np.asarray(ref.c1.to_ntt_domain().data),
    )
    assert sq.logp == ref.logp and sq.logq == ref.logq

    out = encoder.decode(
        CkksEngine.decrypt(
            CkksEngine.rescale_ciphertext(sq),
            sk.reduce_to(ctx.drop_last(1)),
        )
    )[: len(a)]
    assert max_abs_err(a * a, out) <= 1e-4
