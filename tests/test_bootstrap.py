"""Bootstrapping primitives: modulus raising and Chebyshev evaluation.

``raise_modulus`` is an exact integer operation: the raised ciphertext
must decrypt to m + q0*I coefficient-wise (congruent to the level-1
decryption mod q0, with the overflow polynomial I bounded by the secret's
1-norm). ``eval_chebyshev`` must match the plain Chebyshev series on
encrypted inputs within CKKS noise.
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
from toy_heaan_ckks_tpu.errors import CkksError
from toy_heaan_ckks_tpu.keys import KeyLadder
from toy_heaan_ckks_tpu.math.sampling import make_rng
from toy_heaan_ckks_tpu.models.bootstrap import eval_chebyshev, raise_modulus

DEGREE = 64
SCALE = 30


def test_raise_modulus_exact_congruence():
    full = CkksContext.build(generate_primes(31, 6, DEGREE), DEGREE)
    ctx1 = full.slice_channels(0, 1)
    q0 = ctx1.moduli[0]
    hw = 8
    params = CkksParams(3.2, hw, SCALE)
    eng_full = CkksEngine(full, params)
    rng = make_rng(3)
    sk = eng_full.generate_secret_key(rng)
    sk1 = sk.reduce_to(ctx1)
    eng1 = CkksEngine(ctx1, params)
    pk1 = eng1.generate_public_key(sk1, rng)

    enc = CkksEncoder(DEGREE, SCALE)
    a = np.linspace(-0.9, 0.9, DEGREE // 2)
    ct1 = eng1.encrypt(enc.encode(a, ctx1), pk1, ctx1.total_bits(), rng)

    raised = raise_modulus(ct1, full)
    assert raised.logq == full.total_bits()

    m1 = CkksEngine.decrypt(ct1, sk1).poly.to_coeffs()
    mr = CkksEngine.decrypt(raised, sk).poly.to_coeffs()

    # exact congruence mod q0, coefficient-wise
    diff = (mr - m1) % q0
    assert all(int(d) == 0 for d in diff)
    # overflow polynomial I is small (|I| <= (1 + ||s||_1)/2 + 1)
    I = (mr - m1) // q0
    assert max(abs(int(v)) for v in I) <= (hw + 3) // 2 + 1

    # and the raised ciphertext still decodes to the message mod q0
    out = enc.decode(CkksEngine.decrypt(ct1, sk1))
    np.testing.assert_allclose(out[: len(a)], a, atol=1e-4)


def test_raise_modulus_rejects_multi_channel():
    full = CkksContext.build(generate_primes(31, 4, DEGREE), DEGREE)
    params = CkksParams(3.2, 8, SCALE)
    eng = CkksEngine(full, params)
    rng = make_rng(5)
    sk = eng.generate_secret_key(rng)
    pk = eng.generate_public_key(sk, rng)
    enc = CkksEncoder(DEGREE, SCALE)
    ct = eng.encrypt(
        enc.encode(np.zeros(DEGREE // 2), full), pk, full.total_bits(), rng
    )
    with pytest.raises(CkksError):
        raise_modulus(ct, full)


def test_eval_chebyshev_matches_plain():
    # SCALE == prime bit width (the reference's rule) so logp is
    # invariant across the recurrence's multiply+rescale steps
    count, scale = 7, 31
    full = CkksContext.build(generate_primes(scale, count, DEGREE), DEGREE)
    params = CkksParams(3.2, 8, scale)
    eng = CkksEngine(full, params)
    rng = make_rng(11)
    sk = eng.generate_secret_key(rng)
    pk = eng.generate_public_key(sk, rng)
    ladder = KeyLadder(full, sk, 3.2, rng, lazy=True)

    enc = CkksEncoder(DEGREE, scale)
    x = np.linspace(-0.95, 0.95, DEGREE // 2)
    ct = eng.encrypt(enc.encode(x, full), pk, full.total_bits(), rng)

    coeffs = [0.3, -0.5, 0.25, 0.125, -0.0625]  # degree 4
    out_ct = eval_chebyshev(ladder, params, ct, coeffs)
    out = enc.decode(
        CkksEngine.decrypt(out_ct, sk.reduce_to(out_ct.ctx))
    )[: len(x)]

    expect = np.polynomial.chebyshev.chebval(x, coeffs)
    np.testing.assert_allclose(out, expect, atol=2e-3)


def test_coeff_to_slot_roundtrip():
    """CtS then StC with no EvalMod in between is the identity on slots.

    Exercises the dense hoisted diagonal matvecs and the complex-packing
    identities (P z = c_lo + i c_hi, A t = z) end-to-end under
    encryption."""
    from toy_heaan_ckks_tpu.models.bootstrap import (
        BootstrapKeys,
        coeff_to_slot,
        slot_to_coeff,
    )

    deg, scale, count = 32, 31, 3
    full = CkksContext.build(generate_primes(scale, count, deg), deg)
    params = CkksParams(3.2, 4, scale)
    eng = CkksEngine(full, params)
    rng = make_rng(21)
    sk = eng.generate_secret_key(rng)
    pk = eng.generate_public_key(sk, rng)
    ladder = KeyLadder(full, sk, 3.2, rng, lazy=True)
    bkeys = BootstrapKeys(ladder, params, rng)

    enc = CkksEncoder(deg, scale)
    rng2 = np.random.default_rng(7)
    a = rng2.uniform(-0.5, 0.5, deg // 2) + 1j * rng2.uniform(
        -0.5, 0.5, deg // 2
    )
    ct = eng.encrypt(enc.encode_complex(a, full), pk, full.total_bits(), rng)

    t = coeff_to_slot(ct, bkeys, enc)
    back = slot_to_coeff(t, bkeys, enc)

    out = enc.decode_complex(CkksEngine.decrypt(back, sk.reduce_to(back.ctx)))
    np.testing.assert_allclose(out[: len(a)], a, atol=2e-4)

    # and the intermediate really is the packed coefficient vector
    m = CkksEngine.decrypt(ct, sk).poly.to_coeffs()
    delta = ct.true_scale
    want_t = (
        np.array([int(v) for v in m[: deg // 2]], dtype=np.float64)
        + 1j * np.array([int(v) for v in m[deg // 2 :]], dtype=np.float64)
    ) / delta
    got_t = enc.decode_complex(CkksEngine.decrypt(t, sk.reduce_to(t.ctx)))
    np.testing.assert_allclose(got_t[: deg // 2], want_t, atol=2e-4)


def test_matvec_bsgs_matches_dense():
    """BSGS CtS/StC (O(sqrt N) keys) agrees with the dense hoisted path.

    Same slot values out (within key-switch noise) and the roundtrip is
    still the identity; the BSGS path must also request far fewer
    rotation keys.
    """
    from toy_heaan_ckks_tpu.models.bootstrap import (
        BootstrapKeys,
        coeff_to_slot,
        slot_to_coeff,
    )

    deg, scale, count = 64, 31, 3
    full = CkksContext.build(generate_primes(scale, count, deg), deg)
    params = CkksParams(3.2, 4, scale)
    eng = CkksEngine(full, params)
    rng = make_rng(45)
    sk = eng.generate_secret_key(rng)
    pk = eng.generate_public_key(sk, rng)
    ladder = KeyLadder(full, sk, 3.2, rng, lazy=True)
    bkeys_dense = BootstrapKeys(ladder, params, rng)
    bkeys_bsgs = BootstrapKeys(ladder, params, rng)

    enc = CkksEncoder(deg, scale)
    rng2 = np.random.default_rng(8)
    a = rng2.uniform(-0.5, 0.5, deg // 2) + 1j * rng2.uniform(
        -0.5, 0.5, deg // 2
    )
    ct = eng.encrypt(enc.encode_complex(a, full), pk, full.total_bits(), rng)

    t_dense = coeff_to_slot(ct, bkeys_dense, enc, giant=None)
    t_bsgs = coeff_to_slot(ct, bkeys_bsgs, enc, giant=8)  # 8 | N/2 = 32

    skd = sk.reduce_to(t_dense.ctx)
    out_dense = enc.decode_complex(CkksEngine.decrypt(t_dense, skd))
    out_bsgs = enc.decode_complex(CkksEngine.decrypt(t_bsgs, skd))
    np.testing.assert_allclose(out_bsgs, out_dense, atol=2e-4)

    # O(sqrt n) key material: offsets 1..7 (baby) + {8,16,24} (giant)
    offs = sorted(o for (_, o) in bkeys_bsgs._rot)
    assert offs == [1, 2, 3, 4, 5, 6, 7, 8, 16, 24]

    # and the full BSGS roundtrip is the identity on the message
    back = slot_to_coeff(t_bsgs, bkeys_bsgs, enc, giant=8)
    out = enc.decode_complex(CkksEngine.decrypt(back, sk.reduce_to(back.ctx)))
    np.testing.assert_allclose(out[: len(a)], a, atol=2e-4)


def test_bootstrap_end_to_end():
    """Full refresh: a level-1 ciphertext comes back at a usable level
    with the SAME message (within the sine-approximation error)."""
    from toy_heaan_ckks_tpu.models.bootstrap import (
        BootstrapKeys,
        bootstrap,
    )

    deg, scale, count = 32, 31, 17
    full = CkksContext.build(generate_primes(scale, count, deg), deg)
    ctx1 = full.slice_channels(0, 1)
    hw = 2
    params = CkksParams(3.2, hw, scale)
    rng = make_rng(33)
    eng_full = CkksEngine(full, params)
    sk = eng_full.generate_secret_key(rng)
    sk1 = sk.reduce_to(ctx1)
    eng1 = CkksEngine(ctx1, params)
    pk1 = eng1.generate_public_key(sk1, rng)
    ladder = KeyLadder(full, sk, 3.2, rng, lazy=True)
    bkeys = BootstrapKeys(ladder, params, rng)

    enc = CkksEncoder(deg, scale)
    rng2 = np.random.default_rng(9)
    a = rng2.uniform(-0.02, 0.02, deg // 2)
    ct1 = eng1.encrypt(enc.encode(a, ctx1), pk1, ctx1.total_bits(), rng)
    assert ct1.level == 1  # exhausted: no multiplies possible

    r_dbl, cheb_deg = 5, 6
    out = bootstrap(ct1, full, bkeys, params, enc, r=r_dbl, deg=cheb_deg)

    assert out.level == count - (cheb_deg + r_dbl + 4)
    assert out.level > ct1.level  # the point of bootstrapping

    got = enc.decode(CkksEngine.decrypt(out, sk.reduce_to(out.ctx)))
    np.testing.assert_allclose(got[: len(a)], a, atol=2e-3)


def test_grouped_dft_factorization_exact():
    """The FFT-stage factorization reproduces the dense CtS/StC matrices
    to machine precision: stc groups multiply to A with bit-reversed
    columns, cts groups to R @ P, and their composition is the identity
    (the bit-reversal cancels between the two transforms)."""
    from toy_heaan_ckks_tpu.models.bootstrap import (
        _cts_diagonals,
        _grouped_dft_diagonals,
    )

    for deg, levels in ((32, 2), (64, 3), (256, 4)):
        n2 = deg // 2
        m = n2.bit_length() - 1
        P_diags, A_diags = _cts_diagonals(deg)
        k = np.arange(n2)
        A = np.zeros((n2, n2), complex)
        P = np.zeros((n2, n2), complex)
        for r in range(n2):
            A[k, (k + r) % n2] = A_diags[r]
            P[k, (k + r) % n2] = P_diags[r]
        cts, stc = _grouped_dft_diagonals(deg, levels)

        def dense(D):
            M = np.zeros((n2, n2), complex)
            for r, d in D.items():
                M[k, (k + r) % n2] = d
            return M

        rev = np.array(
            [int(format(i, f"0{m}b")[::-1], 2) for i in range(n2)]
        )
        S = np.eye(n2, dtype=complex)
        for G in stc:  # application order: S_total = G_last @ ... @ G_0
            S = dense(G) @ S
        C = np.eye(n2, dtype=complex)
        for G in cts:
            C = dense(G) @ C
        np.testing.assert_allclose(S, A[:, rev], atol=1e-12)
        np.testing.assert_allclose(C, P[rev, :], atol=1e-12)
        np.testing.assert_allclose(S @ C, np.eye(n2), atol=1e-12)
        # sparsity: each group has ~2^{s+1} diagonals, not n2
        assert all(len(g) <= 2 ** (m // levels + 2) for g in cts + stc)


def test_factored_cts_stc_roundtrip():
    """Factored (levels=2) CtS then StC is the identity on slots, and
    each matvec level's rotation keys are evicted after use."""
    from toy_heaan_ckks_tpu.models.bootstrap import (
        BootstrapKeys,
        coeff_to_slot,
        slot_to_coeff,
    )

    deg, scale, count = 64, 31, 5
    full = CkksContext.build(generate_primes(scale, count, deg), deg)
    params = CkksParams(3.2, 4, scale)
    eng = CkksEngine(full, params)
    rng = make_rng(21)
    sk = eng.generate_secret_key(rng)
    pk = eng.generate_public_key(sk, rng)
    ladder = KeyLadder(full, sk, 3.2, rng, lazy=True)
    bkeys = BootstrapKeys(ladder, params, rng)

    enc = CkksEncoder(deg, scale)
    rng2 = np.random.default_rng(7)
    a = rng2.uniform(-0.5, 0.5, deg // 2) + 1j * rng2.uniform(
        -0.5, 0.5, deg // 2
    )
    ct = eng.encrypt(enc.encode_complex(a, full), pk, full.total_bits(), rng)

    t = coeff_to_slot(ct, bkeys, enc, levels=2)
    back = slot_to_coeff(t, bkeys, enc, levels=2)
    assert back.level == count - 4  # 2 levels per factored DFT

    out = enc.decode_complex(CkksEngine.decrypt(back, sk.reduce_to(back.ctx)))
    np.testing.assert_allclose(out[: len(a)], a, atol=2e-4)
    assert len(bkeys._rot) == 0  # every matvec level was evicted


def test_bootstrap_factored_dft_ds4_arcsine():
    """Full bootstrap on the factored-DFT path with digit_size=4 hybrid
    keys and the arcsine cubic correction (the production configuration
    for large N): same message back, level accounting =
    count - (deg + r + 2 + 2*dft_levels + 2)."""
    from toy_heaan_ckks_tpu.models.bootstrap import (
        BootstrapKeys,
        bootstrap,
    )

    deg, scale, count = 32, 31, 21
    full = CkksContext.build(generate_primes(scale, count, deg), deg)
    ctx1 = full.slice_channels(0, 1)
    params = CkksParams(3.2, 2, scale)
    rng = make_rng(33)
    eng_full = CkksEngine(full, params)
    sk = eng_full.generate_secret_key(rng)
    sk1 = sk.reduce_to(ctx1)
    eng1 = CkksEngine(ctx1, params)
    pk1 = eng1.generate_public_key(sk1, rng)
    ladder = KeyLadder(full, sk, 3.2, rng, lazy=True, digit_size=4)
    bkeys = BootstrapKeys(ladder, params, rng, digit_size=4)

    enc = CkksEncoder(deg, scale)
    rng2 = np.random.default_rng(9)
    a = rng2.uniform(-0.02, 0.02, deg // 2)
    ct1 = eng1.encrypt(enc.encode(a, ctx1), pk1, ctx1.total_bits(), rng)

    r_dbl, cheb_deg, dft_levels = 5, 6, 2
    out = bootstrap(
        ct1, full, bkeys, params, enc, r=r_dbl, deg=cheb_deg,
        dft_levels=dft_levels, arcsine=True,
    )
    assert out.level == count - (cheb_deg + r_dbl + 2 + 2 * dft_levels + 2)
    assert out.level > ct1.level

    got = enc.decode(CkksEngine.decrypt(out, sk.reduce_to(out.ctx)))
    np.testing.assert_allclose(got[: len(a)], a, atol=2e-3)


def test_bootstrap_ps_eval_mod():
    """Bootstrap with the Paterson-Stockmeyer EvalMod (method="ps"):
    same message within the sine-approximation error, and at least as
    many levels left as the linear evaluator (PS consumes ~log2(deg)
    levels for the Chebyshev stage instead of deg)."""
    from toy_heaan_ckks_tpu.models.bootstrap import (
        BootstrapKeys,
        bootstrap,
    )

    deg, scale, count = 32, 31, 17
    full = CkksContext.build(generate_primes(scale, count, deg), deg)
    ctx1 = full.slice_channels(0, 1)
    hw = 2
    params = CkksParams(3.2, hw, scale)
    rng = make_rng(33)
    eng_full = CkksEngine(full, params)
    sk = eng_full.generate_secret_key(rng)
    sk1 = sk.reduce_to(ctx1)
    eng1 = CkksEngine(ctx1, params)
    pk1 = eng1.generate_public_key(sk1, rng)
    ladder = KeyLadder(full, sk, 3.2, rng, lazy=True)
    bkeys = BootstrapKeys(ladder, params, rng)

    enc = CkksEncoder(deg, scale)
    rng2 = np.random.default_rng(9)
    a = rng2.uniform(-0.02, 0.02, deg // 2)
    ct1 = eng1.encrypt(enc.encode(a, ctx1), pk1, ctx1.total_bits(), rng)

    r_dbl, cheb_deg = 5, 6
    out = bootstrap(
        ct1, full, bkeys, params, enc, r=r_dbl, deg=cheb_deg, method="ps"
    )
    # linear would land exactly at count - (deg + r + 4); PS must do at
    # least as well (shallower Chebyshev stage)
    assert out.level >= count - (cheb_deg + r_dbl + 4)
    assert out.level > ct1.level

    got = enc.decode(CkksEngine.decrypt(out, sk.reduce_to(out.ctx)))
    np.testing.assert_allclose(got[: len(a)], a, atol=2e-3)
