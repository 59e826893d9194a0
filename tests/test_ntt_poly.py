"""NTT + RNS poly layer tests against an exact schoolbook oracle.

Mirrors the reference's ring-backend test strategy
(reference: src/rings/backends/rns_ntt/poly.rs:657-1050): NTT roundtrip,
NTT-vs-schoolbook multiplication oracle, negacyclic wraparound, rescale
exactness, automorphism identities, sampler properties.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from toy_heaan_ckks_tpu.context import CkksContext
from toy_heaan_ckks_tpu.math.primes import generate_primes
from toy_heaan_ckks_tpu.math.sampling import make_rng
from toy_heaan_ckks_tpu.ops.poly import Poly


def negacyclic_mul_oracle(a, b, q):
    """Exact O(N^2) schoolbook negacyclic product of residue vectors mod q."""
    n = len(a)
    out = [0] * n
    for i in range(n):
        ai = int(a[i])
        if ai == 0:
            continue
        for j in range(n):
            p = ai * int(b[j])
            k = i + j
            if k < n:
                out[k] = (out[k] + p) % q
            else:
                out[k - n] = (out[k - n] - p) % q
    return np.array(out, dtype=object)


@pytest.fixture(scope="module", params=[31, 62])
def ctx16(request):
    primes = generate_primes(request.param, 3, 16)
    return CkksContext.build(primes, 16)


def rand_poly(ctx, seed):
    rng = make_rng(seed)
    return Poly.sample_uniform(ctx, rng)


def test_ntt_roundtrip(ctx16):
    p = rand_poly(ctx16, 7)
    back = p.to_ntt_domain().to_coeff_domain()
    assert (p.residues() == back.residues()).all()


def test_ntt_mul_matches_schoolbook(ctx16):
    a = rand_poly(ctx16, 1)
    b = rand_poly(ctx16, 2)
    got = (a * b).residues()
    ar, br = a.residues(), b.residues()
    for ch, q in enumerate(ctx16.moduli):
        want = negacyclic_mul_oracle(ar[ch], br[ch], q)
        assert (got[ch] == want).all(), f"channel {ch}"


def test_ntt_domain_mul_equals_coeff_domain_mul(ctx16):
    a = rand_poly(ctx16, 3)
    b = rand_poly(ctx16, 4)
    coeff_path = (a * b).residues()
    ntt_path = (
        (a.to_ntt_domain() * b.to_ntt_domain()).to_coeff_domain().residues()
    )
    assert (coeff_path == ntt_path).all()


def test_negacyclic_wraparound(ctx16):
    # x^15 * x = -1 * x^0  (X^N = -1)
    n = ctx16.degree
    a = np.zeros(n, dtype=object)
    a[n - 1] = 1
    b = np.zeros(n, dtype=object)
    b[1] = 1
    p = Poly.from_coeffs(a, ctx16) * Poly.from_coeffs(b, ctx16)
    coeffs = p.to_coeffs()
    assert coeffs[0] == -1
    assert (coeffs[1:] == 0).all()


def test_from_to_coeffs_centered(ctx16):
    coeffs = np.array([5, -7, 0, 1, -1, 123, -456, 2] + [0] * 8, dtype=object)
    p = Poly.from_coeffs(coeffs, ctx16)
    assert (p.to_coeffs() == coeffs).all()


def test_rescale_exact_division(ctx16):
    # A polynomial that is an exact multiple of q_last must rescale to the
    # quotient (parity: reference poly.rs:1012-1033).
    q_last = ctx16.moduli[-1]
    base = np.array(range(-8, 8), dtype=object)
    p = Poly.from_coeffs(base * q_last, ctx16)
    rs = p.rescale()
    assert rs.ctx.num_channels == ctx16.num_channels - 1
    assert (rs.to_coeffs() == base).all()


def test_rescale_rounds_toward_subtraction(ctx16):
    # rescale(c) computes (c - (c mod q_last)) / q_last exactly.
    rng = make_rng(11)
    p = rand_poly(ctx16, 12)
    coeffs = p.to_coeffs()  # centered exact ints
    q_last = ctx16.moduli[-1]
    rs = p.rescale()
    got = rs.to_coeffs()
    # Verify the defining congruences channel-wise
    res = rs.residues()
    full = p.residues()
    for i, q in enumerate(ctx16.moduli[:-1]):
        inv = pow(q_last % q, -1, q)
        want = ((full[i] - full[-1] % q) * inv) % q
        assert (res[i] == want).all()


def test_rescale_from_ntt_domain_equivalent(ctx16):
    p = rand_poly(ctx16, 13)
    a = p.rescale().residues()
    b = p.to_ntt_domain().rescale().residues()
    assert (a == b).all()


def test_mod_drop_last(ctx16):
    p = rand_poly(ctx16, 14)
    d = p.mod_drop_last(1)
    assert d.ctx.num_channels == 2
    assert (d.residues() == p.residues()[:2]).all()


def test_automorphism_identity_and_sign(ctx16):
    p = rand_poly(ctx16, 15)
    ident = p.automorphism(1)
    assert (ident.residues() == p.residues()).all()

    # x -> x^3 on monomial x: becomes x^3
    n = ctx16.degree
    mono = np.zeros(n, dtype=object)
    mono[1] = 1
    m = Poly.from_coeffs(mono, ctx16).automorphism(3)
    c = m.to_coeffs()
    assert c[3] == 1 and (np.delete(c, 3) == 0).all()

    # x^{n-1} -> x^{3(n-1) mod 2n} with sign flip when >= n
    mono2 = np.zeros(n, dtype=object)
    mono2[n - 1] = 1
    jf = (3 * (n - 1)) % (2 * n)
    m2 = Poly.from_coeffs(mono2, ctx16).automorphism(3)
    c2 = m2.to_coeffs()
    expect_idx = jf % n
    expect_sign = -1 if jf >= n else 1
    assert c2[expect_idx] == expect_sign


def test_automorphism_respects_ring_hom(ctx16):
    # sigma(a*b) == sigma(a) * sigma(b)
    a = rand_poly(ctx16, 16)
    b = rand_poly(ctx16, 17)
    lhs = (a * b).automorphism(5)
    rhs = a.automorphism(5) * b.automorphism(5)
    assert (lhs.residues() == rhs.residues()).all()


def test_rotate_slots_composition(ctx16):
    p = rand_poly(ctx16, 18)
    r2 = p.rotate_slots(1).rotate_slots(1)
    r_direct = p.rotate_slots(2)
    assert (r2.residues() == r_direct.residues()).all()


def test_sampler_properties():
    primes = generate_primes(31, 2, 64)
    ctx = CkksContext.build(primes, 64)
    rng = make_rng(42)
    t = Poly.sample_tribits(ctx, 16, rng)
    coeffs = t.to_coeffs()
    nonzero = [c for c in coeffs if c != 0]
    assert len(nonzero) == 16
    assert all(c in (-1, 1) for c in nonzero)

    g = Poly.sample_gaussian(ctx, 3.2, rng)
    gc = g.to_coeffs()
    assert max(abs(int(c)) for c in gc) < 3.2 * 8

    # determinism: same seed -> same poly
    a = Poly.sample_uniform(ctx, make_rng(5))
    b = Poly.sample_uniform(ctx, make_rng(5))
    assert (a.residues() == b.residues()).all()


def test_add_neg_sub(ctx16):
    a = rand_poly(ctx16, 20)
    b = rand_poly(ctx16, 21)
    s = (a + b).residues()
    moduli = np.array(ctx16.moduli, dtype=object)[:, None]
    assert (s == (a.residues() + b.residues()) % moduli).all()
    z = (a + (-a)).residues()
    assert (z == 0).all()
    d = (a - b).residues()
    assert (d == (a.residues() - b.residues()) % moduli).all()


def test_large_degree_roundtrip():
    primes = generate_primes(61, 2, 1024)
    ctx = CkksContext.build(primes, 1024)
    p = rand_poly(ctx, 30)
    back = p.to_ntt_domain().to_coeff_domain()
    assert (p.residues() == back.residues()).all()
