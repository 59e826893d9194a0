"""Exact-scale tracking: decode divides by the TRUE scale, not 2^logp.

The reference tracks only integer logp, so every rescale drifts the scale
by (2^bits - q_last)/q_last — a systematic relative decode error that
reaches ~1e-3 at N=2^14 with 31-bit chains (SURVEY.md §2.2 notes the
~1-bit drift idiom). Tracking Delta exactly as a float (SEAL/Lattigo
practice) removes it; these tests pin that with a chain whose q_last is
deliberately FAR from 2^scale_bits.
"""

import numpy as np

from toy_heaan_ckks_tpu import (
    CkksContext,
    CkksEncoder,
    CkksEngine,
    CkksParams,
    generate_primes,
)
from toy_heaan_ckks_tpu.math.sampling import make_rng


def test_rescale_with_mismatched_prime_decodes_exactly():
    degree = 256
    # q_last just ABOVE 2^29 (bit_length 30): logp drops by 30 while the
    # actual division is by ~2^29, so a 2^logp-based decode would be off
    # by a factor of ~2 — the drift the exact scale must absorb
    from toy_heaan_ckks_tpu import get_first_prime_up

    q0 = generate_primes(30, 2, degree)
    q_last = get_first_prime_up(29, degree)
    assert q_last.bit_length() == 30 and q_last < 2**29 * 1.01
    moduli = [q0[0], q0[1], q_last]
    ctx = CkksContext.build(moduli, degree)
    eng = CkksEngine(ctx, CkksParams(3.2, 64, 30))
    rng = make_rng(5)
    sk = eng.generate_secret_key(rng)
    pk = eng.generate_public_key(sk, rng)
    rlk = eng.generate_gadget_relin_key(sk, rng, digit_size=2)
    enc = CkksEncoder(degree, 30)
    a = np.linspace(0.2, 1.0, degree // 2)
    b = np.linspace(-1.0, 1.0, degree // 2)
    ca = eng.encrypt(enc.encode(a, ctx), pk, ctx.total_bits(), rng)
    cb = eng.encrypt(enc.encode(b, ctx), pk, ctx.total_bits(), rng)
    cm = eng.rescale_ciphertext(eng.mul_ciphertexts_gadget(ca, cb, rlk))
    # the true scale is 2^60 / q_last, NOT 2^logp
    assert cm.scale is not None
    assert abs(cm.true_scale - 2.0**60 / moduli[-1]) < 1.0
    assert abs(cm.true_scale / 2.0**cm.logp - 1.0) > 0.5  # drift is real
    out = enc.decode(eng.decrypt(cm, sk.reduce_to(cm.ctx)))
    err = np.max(np.abs(out[: degree // 2] - a * b))
    assert err < 1e-3, err  # with a 2^logp decode this would be ~|ab|


def test_mixed_radix_chain_rescale():
    """Regression: a 29-bit q_last inside a 32-bit (generic-radix) chain.

    Derived contexts for channel slices must inherit the parent's
    Montgomery radix; auto-detection flipped the sliced q_last channel to
    R=2^32 and corrupted every rescale on mixed-width chains."""
    from toy_heaan_ckks_tpu import get_first_prime_up
    from toy_heaan_ckks_tpu.ops.poly import Poly
    from toy_heaan_ckks_tpu.ops import poly as pops

    degree = 128
    q0 = generate_primes(32, 2, degree)
    q_last = get_first_prime_up(28, degree)
    ctx = CkksContext.build([q0[0], q0[1], q_last], degree)
    assert not ctx.chain.small
    assert not ctx.slice_channels(2, 3).chain.small  # inherits generic radix

    rng = np.random.default_rng(3)
    k = rng.integers(-(2**40), 2**40, degree).astype(object)
    p = Poly.from_coeffs(k * q_last, ctx)
    r = p.to_ntt_domain().rescale_ntt().to_coeff_domain().to_coeffs()
    assert all(int(x) == int(y) for x, y in zip(r, k))

    # non-multiple: rescale_ntt must equal the coeff-domain oracle
    m = Poly.from_coeffs(
        rng.integers(-(2**60), 2**60, degree).astype(object), ctx
    )
    a = m.rescale().to_coeffs()
    b = m.to_ntt_domain().rescale_ntt().to_coeff_domain().to_coeffs()
    assert all(int(x) == int(y) for x, y in zip(a, b))


def test_scale_propagates_through_ops():
    degree = 128
    ctx = CkksContext.build(generate_primes(30, 3, degree), degree)
    eng = CkksEngine(ctx, CkksParams(3.2, 32, 28))
    rng = make_rng(9)
    sk = eng.generate_secret_key(rng)
    pk = eng.generate_public_key(sk, rng)
    enc = CkksEncoder(degree, 28)
    v = np.ones(degree // 2) * 0.5
    ct = eng.encrypt(enc.encode(v, ctx), pk, ctx.total_bits(), rng)
    assert ct.true_scale == 2.0**28
    s = eng.add_ciphertexts(ct, ct)
    assert s.true_scale == 2.0**28
    n = eng.neg_ciphertext(ct)
    assert n.true_scale == 2.0**28
    sw = ct.mod_switch(1)
    assert sw.true_scale == ct.true_scale
