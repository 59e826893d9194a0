"""Key-material tests: algebraic relations and distribution properties.

Mirrors reference key tests (src/keys/secret_key.rs:295-377,
public_key.rs, relin_key.rs:117-160, rotation_key.rs:129-161,
examples/keys.rs:103-159): b + a*s ~ e small, relin b + a*s - s^2 small,
hamming weight exact, determinism.
"""

import numpy as np
import pytest

from toy_heaan_ckks_tpu import (
    CkksContext,
    CkksEngine,
    CkksParams,
    generate_primes,
)
from toy_heaan_ckks_tpu.math.sampling import make_rng

DEGREE = 16


@pytest.fixture(scope="module")
def setup():
    primes = generate_primes(31, 3, DEGREE)
    ctx = CkksContext.build(primes, DEGREE)
    engine = CkksEngine(
        ctx,
        CkksParams(error_variance=3.2, hamming_weight=8, scale_bits=30),
    )
    return ctx, engine


def test_secret_key_hamming_weight(setup):
    _, engine = setup
    sk = engine.generate_secret_key(make_rng(42))
    coeffs = sk.poly.to_coeffs()
    nonzero = [c for c in coeffs if c != 0]
    assert len(nonzero) == 8
    assert all(c in (-1, 1) for c in nonzero)


def test_secret_key_determinism(setup):
    _, engine = setup
    a = engine.generate_secret_key(make_rng(7))
    b = engine.generate_secret_key(make_rng(7))
    assert (a.poly.residues() == b.poly.residues()).all()
    c = engine.generate_secret_key(make_rng(8))
    assert (a.poly.residues() != c.poly.residues()).any()


def test_public_key_relation(setup):
    # b + a*s = e with |e| small (rounded Gaussian, sigma=3.2)
    _, engine = setup
    rng = make_rng(1)
    sk = engine.generate_secret_key(rng)
    pk = engine.generate_public_key(sk, rng)
    residual = (pk.b + pk.a * sk.poly).to_coeffs()
    assert max(abs(int(x)) for x in residual) < 3.2 * 8


def test_relin_key_relation(setup):
    # b + a*s - s^2 = e small
    _, engine = setup
    rng = make_rng(2)
    sk = engine.generate_secret_key(rng)
    rlk = engine.generate_relinearization_key(sk, rng)
    s_sq = sk.poly * sk.poly
    residual = (rlk.b + rlk.a * sk.poly - s_sq).to_coeffs()
    assert max(abs(int(x)) for x in residual) < np.sqrt(3.2) * 10


def test_rotation_key_relation(setup):
    # b + a*s - s(X^{5^k}) = e small
    _, engine = setup
    rng = make_rng(3)
    sk = engine.generate_secret_key(rng)
    rotk = engine.generate_rotation_key(sk, 1, rng)
    s_k = sk.poly.rotate_slots(1).to_ntt_domain()
    residual = (rotk.b + rotk.a * sk.poly - s_k).to_coeffs()
    assert max(abs(int(x)) for x in residual) < np.sqrt(3.2) * 10


def test_gadget_relin_key_relation(setup):
    # Hybrid gadget: per digit i over the raised modulus QP,
    # b_i + a_i*s = P*e_i*s^2 + err, where e_i is the CRT indicator of
    # channel i (reference engine.rs:206-228 extended with the special
    # prime per specs/parameters.md).
    ctx, engine = setup
    rng = make_rng(4)
    sk = engine.generate_secret_key(rng)
    rlk = engine.generate_gadget_relin_key(sk, rng)
    ext_ctx = rlk.ext_ctx
    s_ext = sk.extend_to(ext_ctx)
    s_sq_coeff = (sk.poly * sk.poly).to_coeff_domain().residues()  # (L, N)

    from toy_heaan_ckks_tpu.ops.poly import Poly

    L = ctx.num_channels
    for i in range(L):
        b_i = Poly(rlk.b[i], ext_ctx, True)
        a_i = Poly(rlk.a[i], ext_ctx, True)
        diff = (b_i + a_i * s_ext).to_coeff_domain()
        want = np.zeros((L + 1, DEGREE), dtype=object)
        want[i] = (s_sq_coeff[i] * (rlk.special % ctx.moduli[i])) % ctx.moduli[i]
        target = Poly.from_residues(want, ext_ctx, ntt_domain=False)
        # residual = (b_i + a_i s) - P*e_i*s^2 must have small coefficients
        residual = (diff - target).to_coeffs()
        assert max(abs(int(x)) for x in residual) < np.sqrt(3.2) * 10, i


def test_reduce_sk(setup):
    ctx, engine = setup
    sk = engine.generate_secret_key(make_rng(5))
    sub_ctx = ctx.drop_last(1)
    sk2 = sk.reduce_to(sub_ctx)
    assert sk2.poly.ctx.num_channels == 2
    assert (sk2.poly.residues() == sk.poly.residues()[:2]).all()


def test_key_ladder_lazy_and_memory(setup):
    """Lazy ladder generates a level only on first access and reports the
    device bytes it holds."""
    from toy_heaan_ckks_tpu.keys import KeyLadder

    ctx, engine = setup
    rng = make_rng(55)
    sk = engine.generate_secret_key(rng)
    ladder = KeyLadder(ctx, sk, 3.2, rng, rotations=(1,), lazy=True)
    assert ladder.levels == {}
    assert ladder.memory_bytes() == 0
    top = ctx.num_channels
    keys = ladder.at_level(top)
    assert keys.ctx.num_channels == top
    assert set(ladder.levels) == {top}
    m1 = ladder.memory_bytes()
    assert m1 > 0
    ladder.at_level(top - 1)
    assert ladder.memory_bytes() > m1
    import pytest as _pytest

    with _pytest.raises(KeyError):
        ladder.at_level(top + 1)
