"""The fused multiply+relin+rescale composite: accuracy and path parity.

The composite divides once by P * q_last (relin mod-down fused with the
ciphertext rescale); it must decode within the same bounds as the
sequential engine path, agree with it up to the rescale's O(1/Delta^2)
rounding, and be bit-exact between the generic jnp branch and the
single-limb Pallas branch.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from toy_heaan_ckks_tpu import (
    CkksContext,
    CkksEncoder,
    CkksEngine,
    CkksParams,
    generate_primes,
)
from toy_heaan_ckks_tpu.engine import _switch_plan
from toy_heaan_ckks_tpu.math.sampling import make_rng
from toy_heaan_ckks_tpu.ops import small_fast as sf
from toy_heaan_ckks_tpu.ops.poly import Poly
from toy_heaan_ckks_tpu.parallel.sharded import _mul_relin_rescale_arrays
from toy_heaan_ckks_tpu.types import Ciphertext


def _setup(degree=64, count=5, bits=30, digit_size=2):
    ctx = CkksContext.build(generate_primes(bits, count, degree), degree)
    eng = CkksEngine(ctx, CkksParams(3.2, degree // 2, bits))
    rng = make_rng(7)
    sk = eng.generate_secret_key(rng)
    pk = eng.generate_public_key(sk, rng)
    rlk = eng.generate_gadget_relin_key(sk, rng, digit_size=digit_size)
    return ctx, eng, sk, pk, rlk


def test_composite_accuracy_and_vs_sequential():
    degree = 64
    ctx, eng, sk, pk, rlk = _setup(degree=degree)
    enc = CkksEncoder(degree, 30)
    a = np.linspace(0.1, 0.9, degree // 2)
    b = np.linspace(-0.5, 0.5, degree // 2)
    rng = make_rng(3)
    ca = eng.encrypt(enc.encode(a, ctx), pk, ctx.total_bits(), rng)
    cb = eng.encrypt(enc.encode(b, ctx), pk, ctx.total_bits(), rng)

    batchify = lambda p: p.to_ntt_domain().data[None]
    o0, o1 = _mul_relin_rescale_arrays(
        batchify(ca.c0), batchify(ca.c1), batchify(cb.c0), batchify(cb.c1),
        rlk.a, rlk.b, ctx, rlk.ext_ctx, ctx.drop_last(1),
        digit_size=rlk.digit_size,
    )
    child = ctx.drop_last(1)
    ct = Ciphertext(
        c0=Poly(o0[0], child, True),
        c1=Poly(o1[0], child, True),
        logp=ca.logp + cb.logp - ctx.moduli[-1].bit_length(),
        logq=ca.logq - ctx.moduli[-1].bit_length(),
        scale=ca.true_scale * cb.true_scale / ctx.moduli[-1],
    )
    out = enc.decode(eng.decrypt(ct, sk.reduce_to(child)))
    np.testing.assert_allclose(out[: len(a)], a * b, atol=1e-4)

    # sequential engine path agrees to rescale-rounding precision
    seq = eng.rescale_ciphertext(eng.mul_ciphertexts_gadget(ca, cb, rlk))
    seq_out = enc.decode(eng.decrypt(seq, sk.reduce_to(seq.ctx)))
    np.testing.assert_allclose(out[: len(a)], seq_out[: len(a)], atol=1e-6)


def test_engine_mul_rescale_surface():
    """CkksEngine.mul_rescale == the raw composite (bit-exact residues)
    with the sequential path's bookkeeping (logp/logq/scale), agreeing
    with mul+rescale to rescale-rounding precision."""
    degree = 64
    ctx, eng, sk, pk, rlk = _setup(degree=degree)
    enc = CkksEncoder(degree, 30)
    a = np.linspace(0.1, 0.9, degree // 2)
    b = np.linspace(-0.5, 0.5, degree // 2)
    rng = make_rng(3)
    ca = eng.encrypt(enc.encode(a, ctx), pk, ctx.total_bits(), rng)
    cb = eng.encrypt(enc.encode(b, ctx), pk, ctx.total_bits(), rng)

    ct = CkksEngine.mul_rescale(ca, cb, rlk)

    batchify = lambda p: p.to_ntt_domain().data[None]
    o0, _ = _mul_relin_rescale_arrays(
        batchify(ca.c0), batchify(ca.c1), batchify(cb.c0), batchify(cb.c1),
        rlk.a, rlk.b, ctx, rlk.ext_ctx, ctx.drop_last(1),
        digit_size=rlk.digit_size,
    )
    np.testing.assert_array_equal(np.asarray(ct.c0.data), np.asarray(o0[0]))

    seq = eng.rescale_ciphertext(eng.mul_ciphertexts_gadget(ca, cb, rlk))
    assert ct.logp == seq.logp and ct.logq == seq.logq
    assert ct.level == seq.level
    np.testing.assert_allclose(ct.true_scale, seq.true_scale, rtol=1e-12)
    got = enc.decode(eng.decrypt(ct, sk.reduce_to(ct.ctx)))
    seq_out = enc.decode(eng.decrypt(seq, sk.reduce_to(seq.ctx)))
    np.testing.assert_allclose(got[: len(a)], seq_out[: len(a)], atol=1e-6)
    np.testing.assert_allclose(got[: len(a)], a * b, atol=1e-4)


@pytest.mark.parametrize("batch", [2, 4])
def test_generic_vs_lo_fast_bit_exact(batch):
    # batch=2/4 exercise the paired-grid-step kernel paths (pair follows
    # the outer size in _auto_pair)
    degree = 1024  # pallas-supported size (interpret mode)
    ctx, eng, sk, pk, rlk = _setup(degree=degree, count=4, digit_size=2)
    plan = _switch_plan(ctx.moduli, rlk.ext_ctx.moduli, rlk.digit_size)
    args = [
        jnp.stack(
            [Poly.sample_uniform(ctx, make_rng(10 * s + i)).to_ntt_domain().data
             for i in range(batch)]
        )
        for s in range(4)
    ]
    g0, g1 = _mul_relin_rescale_arrays(
        *args, rlk.a, rlk.b, ctx, rlk.ext_ctx, ctx.drop_last(1),
        digit_size=rlk.digit_size,
    )
    f0, f1 = sf.mul_relin_rescale_lo(
        *[a[..., 0, :] for a in args], rlk.a, rlk.b,
        ctx, rlk.ext_ctx, plan, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(g0[..., 0, :]), np.asarray(f0))
    np.testing.assert_array_equal(np.asarray(g1[..., 0, :]), np.asarray(f1))
