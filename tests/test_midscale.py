"""Mid-scale model-circuit precision tests (N = 512-1024).

The model circuits (bootstrap / comparison / function evaluation /
linear algebra) are unit-tested at N=64; this tier pins their precision
at the reference's own integration ring size
(reference tests/integration_mul.rs:35 uses N=1024) so scale-dependent
noise growth (~sqrt(N) per key switch) is covered by CI, not just by
the on-chip examples. Bounds are analytic: CKKS key-switch noise at
these sizes stays well under each circuit's approximation error.
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
from toy_heaan_ckks_tpu.utils.params import build_modulus_chain

SCALE = 30


def _setup(degree, levels, seed=7, hw=16):
    full = CkksContext.build(generate_primes(SCALE, levels, degree), degree)
    params = CkksParams(3.2, hw, SCALE)
    eng = CkksEngine(full, params)
    rng = make_rng(seed)
    sk = eng.generate_secret_key(rng)
    pk = eng.generate_public_key(sk, rng)
    ladder = KeyLadder(full, sk, 3.2, rng, lazy=True)
    enc = CkksEncoder(degree, SCALE)
    return full, params, eng, rng, sk, pk, ladder, enc


def test_funceval_sigmoid_n1024():
    """PS sigmoid at N=1024 (full 512 slots): max error bounded by the
    Chebyshev fit error (~1e-3 for deg 12 on [-8, 8]) — key-switch
    noise at N=1024/Delta=2^30 is ~2^-19, far below it."""
    from toy_heaan_ckks_tpu.models.funceval import eval_sigmoid

    degree = 1024
    full, params, eng, rng, sk, pk, ladder, enc = _setup(degree, 8)
    x = np.linspace(-6.0, 6.0, degree // 2)
    ct = eng.encrypt(enc.encode(x, full), pk, full.total_bits(), rng)
    out = eval_sigmoid(ladder, params, ct)
    got = enc.decode(
        CkksEngine.decrypt(out, sk.reduce_to(out.ctx))
    )[: len(x)].real
    want = 1.0 / (1.0 + np.exp(-x))
    assert np.max(np.abs(got - want)) < 5e-3


def test_compare_sign_n1024():
    """Composed sign iterations at N=1024: outputs within 0.05 of +-1
    for inputs with |x| >= 0.2 (the circuit's designed resolution)."""
    from toy_heaan_ckks_tpu.models.compare import eval_sign

    degree = 1024
    plan = build_modulus_chain(degree, SCALE, 12, first_bits=40)
    full = CkksContext.build(list(plan.moduli), degree)
    params = CkksParams(3.2, 16, SCALE)
    eng = CkksEngine(full, params)
    rng = make_rng(9)
    sk = eng.generate_secret_key(rng)
    pk = eng.generate_public_key(sk, rng)
    ladder = KeyLadder(full, sk, 3.2, rng, lazy=True)
    enc = CkksEncoder(degree, SCALE)

    half = degree // 4
    x = np.concatenate(
        [np.linspace(0.2, 1.0, half), -np.linspace(0.2, 1.0, half)]
    )
    ct = eng.encrypt(enc.encode(x, full), pk, full.total_bits(), rng)
    out = eval_sign(ladder, params, ct)
    got = enc.decode(
        CkksEngine.decrypt(out, sk.reduce_to(out.ctx))
    )[: len(x)].real
    assert np.max(np.abs(got - np.sign(x))) < 0.05


def test_linalg_matvec_n512():
    """Hoisted diagonal matvec at N=512 (256x256 encrypted matvec):
    error bounded by encode rounding accumulated over 256 diagonals
    (~256 * |m| * 2^-30 ~ 1e-5) plus key-switch noise."""
    from toy_heaan_ckks_tpu.models.linalg import MatvecKeys, encrypted_matvec

    degree = 512
    slots = degree // 2
    full, params, eng, rng, sk, pk, ladder, enc = _setup(degree, 3, seed=29)
    keys = MatvecKeys(ladder, params, rng)

    rng2 = np.random.default_rng(4)
    m = rng2.uniform(-0.2, 0.2, (slots, slots)) + 1j * rng2.uniform(
        -0.2, 0.2, (slots, slots)
    )
    v = rng2.uniform(-0.5, 0.5, slots) + 1j * rng2.uniform(-0.5, 0.5, slots)
    ct = eng.encrypt(enc.encode_complex(v, full), pk, full.total_bits(), rng)
    out = encrypted_matvec(ct, m, keys, enc, giant="auto")
    got = enc.decode_complex(
        CkksEngine.decrypt(out, sk.reduce_to(out.ctx))
    )[:slots]
    np.testing.assert_allclose(got, m @ v, atol=2e-3)


def test_bootstrap_n512_production_recipe():
    """The production bootstrap recipe (factored DFTs, ds=4 hybrid keys,
    wide q0=2^60 > Delta=2^55 layout) at N=512, 256 slots: >= 12 bits
    of slot precision — the same acceptance bound
    examples/bootstrap_large.py enforces at N=2^13. The precision
    budget: sine linearization (2 pi m/rho)^2/6 ~ 2^-20 rel at
    mmax=0.01, EvalMod fit ~1.4e-8 abs, amplified key-switch noise
    ~2^-30 abs at this N — all below 2^-12 * mmax."""
    from toy_heaan_ckks_tpu.models.bootstrap import BootstrapKeys, bootstrap

    degree, scale, first, depth, hw = 512, 55, 60, 22, 8
    plan = build_modulus_chain(degree, scale, depth, first_bits=first)
    full = CkksContext.build(list(plan.moduli), degree)
    ctx1 = full.slice_channels(0, 1)
    params = CkksParams(3.2, hw, scale)
    rng = make_rng(42)
    eng_full = CkksEngine(full, params)
    sk = eng_full.generate_secret_key(rng)
    sk1 = sk.reduce_to(ctx1)
    eng1 = CkksEngine(ctx1, params)
    pk1 = eng1.generate_public_key(sk1, rng)
    ladder = KeyLadder(full, sk, 3.2, rng, lazy=True, digit_size=4)
    bkeys = BootstrapKeys(ladder, params, rng, digit_size=4)
    enc = CkksEncoder(degree, scale)

    mmax = 0.01
    rng2 = np.random.default_rng(7)
    vals = rng2.uniform(-mmax, mmax, degree // 2)
    ct1 = eng1.encrypt(enc.encode(vals, ctx1), pk1, ctx1.total_bits(), rng)
    out = bootstrap(
        ct1, full, bkeys, params, enc, r=7, deg=8, dft_levels=3
    )
    assert out.level >= 2
    got = enc.decode(
        CkksEngine.decrypt(out, sk.reduce_to(out.ctx))
    )[: degree // 2].real
    err = np.abs(got - vals).max()
    bits = -np.log2(err / mmax)
    assert bits >= 12.0, f"bootstrap precision {bits:.1f} bits < 12"
