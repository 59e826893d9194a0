"""Regression tests for the round-1 advisor findings (ADVICE.md).

1. high — digit_size values whose grouping is not recovered by
   ceil(L/num_digits) (e.g. 5 at L=8 -> groups (5,3)) must key-switch
   correctly: the plan is now derived from the key's stored digit_size.
2. medium — the pure-Python NTT-prime search fallback must snap to the
   p == 1 (mod 2N) class (else it hangs forever from an even start).
3. low — add/sub/add_plain must reject operands whose *true* scales
   differ even when integer logp matches.
4. low — using a full-level gadget key on a rescaled ciphertext must
   raise a typed error, not silently corrupt.
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
from toy_heaan_ckks_tpu.errors import CkksError, ChannelCountMismatch
from toy_heaan_ckks_tpu.math.sampling import make_rng


def _engine(degree=64, count=8, bits=30):
    ctx = CkksContext.build(generate_primes(bits, count, degree), degree)
    eng = CkksEngine(ctx, CkksParams(3.2, degree // 2, bits))
    rng = make_rng(11)
    sk = eng.generate_secret_key(rng)
    pk = eng.generate_public_key(sk, rng)
    return ctx, eng, sk, pk, rng


@pytest.mark.parametrize("digit_size", [3, 5, 7])
def test_non_roundtrip_digit_sizes_multiply_correctly(digit_size):
    """ADVICE high: digit_size=5 at L=8 encodes groups (5,3); the old plan
    recovered ceil(8/2)=4 -> (4,4) and silently corrupted (error ~7e54)."""
    degree = 64
    ctx, eng, sk, pk, rng = _engine(degree=degree)
    rlk = eng.generate_gadget_relin_key(sk, rng, digit_size=digit_size)
    enc = CkksEncoder(degree, 30)
    a = np.linspace(0.1, 0.9, degree // 2)
    b = np.linspace(-0.5, 0.5, degree // 2)
    ca = eng.encrypt(enc.encode(a, ctx), pk, ctx.total_bits(), rng)
    cb = eng.encrypt(enc.encode(b, ctx), pk, ctx.total_bits(), rng)
    ct = eng.rescale_ciphertext(eng.mul_ciphertexts_gadget(ca, cb, rlk))
    sk_red = sk.reduce_to(ct.ctx)
    got = enc.decode(eng.decrypt(ct, sk_red))
    assert np.max(np.abs(got - a * b)) < 1e-4


def test_prime_fallback_snaps_congruence(monkeypatch):
    """ADVICE medium: _next_up's pure-Python fallback from an even start
    (2^scale_bits) must terminate and return an NTT-friendly prime."""
    from toy_heaan_ckks_tpu.utils import params as P
    import toy_heaan_ckks_tpu.native as native

    monkeypatch.setattr(native, "available", lambda: False)
    p = P._next_up(1 << 30, 1024)
    assert p is not None and p > (1 << 30) and p % 2048 == 1
    plan = P.build_modulus_chain(1024, 30, 2)
    assert len(plan.moduli) == 3


def test_scale_mismatch_rejected():
    """ADVICE low: same logp but different true_scale must not add."""
    degree = 64
    ctx, eng, sk, pk, rng = _engine(degree=degree)
    rlk = eng.generate_gadget_relin_key(sk, rng)
    enc = CkksEncoder(degree, 30)
    a = np.linspace(0.1, 0.9, degree // 2)
    ca = eng.encrypt(enc.encode(a, ctx), pk, ctx.total_bits(), rng)
    # same level, same integer logp, drifted true scale (what a rescale by
    # q_last != 2^bits produces)
    import dataclasses

    drifted = dataclasses.replace(ca, scale=ca.true_scale * 1.05)
    with pytest.raises(CkksError):
        eng.add_ciphertexts(ca, drifted)
    with pytest.raises(CkksError):
        eng.sub_ciphertexts(ca, drifted)
    with pytest.raises(CkksError):
        eng.add_plain(drifted, enc.encode(a, ctx))
    # matched scales still work
    out = eng.add_ciphertexts(ca, ca)
    assert out.logp == ca.logp


def test_full_level_key_on_rescaled_ct_raises():
    """ADVICE low: a master-level key applied after rescale must raise a
    typed ChannelCountMismatch (the assert used to vanish under -O)."""
    degree = 64
    ctx, eng, sk, pk, rng = _engine(degree=degree)
    rlk = eng.generate_gadget_relin_key(sk, rng)
    enc = CkksEncoder(degree, 30)
    a = np.linspace(0.1, 0.9, degree // 2)
    ca = eng.encrypt(enc.encode(a, ctx), pk, ctx.total_bits(), rng)
    ct = eng.rescale_ciphertext(eng.mul_ciphertexts_gadget(ca, ca, rlk))
    with pytest.raises(ChannelCountMismatch):
        eng.mul_ciphertexts_gadget(ct, ct, rlk)


# ── round-2 advisor findings ────────────────────────────────────────────────


@pytest.mark.parametrize(
    "degree,bits",
    [
        (1 << 10, 31),  # expanded-plane layout
        (1 << 16, 29),  # factored row x lane layout (N > 2^15)
    ],
)
def test_inv_ntt_fold_matches_two_pass_small(degree, bits):
    """ADVICE r2 low: pin inv_ntt_fold == mont_mul_lo(iNTT(x), post)
    directly (uint32 equality), with a non-trivial post factor, on BOTH
    the expanded-plane and the factored twiddle layouts."""
    import jax.numpy as jnp

    from toy_heaan_ckks_tpu.math.sampling import make_rng
    from toy_heaan_ckks_tpu.ops import small_fast as sf
    from toy_heaan_ckks_tpu.ops.ntt_pallas import _use_factored
    from toy_heaan_ckks_tpu.ops.poly import Poly

    assert _use_factored(degree) == (degree > 1 << 15)
    ctx = CkksContext.build(generate_primes(bits, 2, degree), degree)
    moduli = tuple(int(m) for m in ctx.moduli)
    post = tuple((q - 1) // 3 for q in moduli)  # non-trivial, distinct
    x = Poly.sample_uniform(ctx, make_rng(3)).to_ntt_domain().data[..., 0, :]

    got = sf.inv_ntt_fold(x, moduli, degree, post, interpret=True)
    ref = sf.mont_mul_lo(
        sf.ntt_lo(x, moduli, degree, inverse=True, interpret=True),
        jnp.asarray(np.array(post, np.uint32))[:, None],
        sf._lo(ctx.chain.q),
        sf._lo(ctx.chain.qinv),
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize(
    "degree,bits",
    [
        (1 << 11, 61),  # expanded-plane layout (wide caps at 2^14)
        (1 << 15, 61),  # factored layout (N > 2^14 on the wide path)
    ],
)
def test_inv_ntt_fold_wide_matches_two_pass(degree, bits):
    """ADVICE r2 low: same pin for the 2-limb path, both layouts."""
    from toy_heaan_ckks_tpu.engine import _pack_u64_cols
    from toy_heaan_ckks_tpu.math.sampling import make_rng
    from toy_heaan_ckks_tpu.ops import modular as mm
    from toy_heaan_ckks_tpu.ops.keyswitch_pallas_wide import (
        inv_ntt_fold_wide,
    )
    from toy_heaan_ckks_tpu.ops.ntt_pallas_wide import (
        _use_factored_wide,
        ntt_pallas_wide,
    )
    from toy_heaan_ckks_tpu.ops.poly import Poly

    assert _use_factored_wide(degree) == (degree > 1 << 14)
    ctx = CkksContext.build(generate_primes(bits, 2, degree), degree)
    moduli = tuple(int(m) for m in ctx.moduli)
    post = tuple((q - 1) // 3 for q in moduli)
    x = Poly.sample_uniform(ctx, make_rng(5)).to_ntt_domain().data

    got = inv_ntt_fold_wide(x, moduli, degree, post, interpret=True)
    import jax.numpy as jnp

    ref = mm.mont_mul(
        ntt_pallas_wide(x, moduli, degree, inverse=True, interpret=True),
        jnp.asarray(_pack_u64_cols(np.array(post, dtype=object))),
        ctx.chain,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


# ── round-3 advisor findings ────────────────────────────────────────────────


def test_models_package_reexports_matmul():
    """ADVICE r3 low: encrypted_matmul / encrypted_transpose must be
    importable from the models package, not only from the submodule."""
    from toy_heaan_ckks_tpu import models

    assert models.encrypted_matmul is not None
    assert models.encrypted_transpose is not None


def test_encrypted_matmul_rejects_mismatched_operands():
    """ADVICE r3 low: level / scale mismatches raise a typed CkksError at
    entry instead of failing deep inside mul_ciphertexts_gadget."""
    import dataclasses

    from toy_heaan_ckks_tpu.keys import KeyLadder
    from toy_heaan_ckks_tpu.models.algorithms import align_level
    from toy_heaan_ckks_tpu.models.linalg import MatvecKeys, encrypted_matmul

    degree, scale = 128, 30
    full = CkksContext.build(generate_primes(scale, 4, degree), degree)
    params = CkksParams(3.2, 8, scale)
    eng = CkksEngine(full, params)
    rng = make_rng(23)
    sk = eng.generate_secret_key(rng)
    pk = eng.generate_public_key(sk, rng)
    ladder = KeyLadder(full, sk, 3.2, rng, lazy=True)
    keys = MatvecKeys(ladder, params, rng)
    enc = CkksEncoder(degree, scale)

    ct = eng.encrypt(
        enc.encode(np.zeros(degree // 2), full), pk, full.total_bits(), rng
    )
    ct_low = align_level(eng, ct, ct.level - 1)
    with pytest.raises(CkksError, match="level"):
        encrypted_matmul(ct, ct_low, keys, enc)

    drifted = dataclasses.replace(ct, scale=ct.true_scale * 1.05)
    with pytest.raises(CkksError, match="scale"):
        encrypted_matmul(ct, drifted, keys, enc)
