"""Wide-chain (2-limb) fused Pallas composites vs the generic jnp path.

The reference's heavy configurations (40/61/62-bit chains:
tests/integration_mul.rs:47-51, examples/horner_chain.rs:65) must run the
full multiply + hybrid relin + fused rescale and the rotation key switch
through the wide Pallas kernels bit-exactly with the generic jnp
composites (which test_engine already pins to the accuracy contract).
Interpret mode on CPU; uint32 equality, not approximate closeness.
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
from toy_heaan_ckks_tpu.engine import (
    _gadget_accumulate,
    _mod_down_ntt,
    _switch_plan,
)
from toy_heaan_ckks_tpu.math.sampling import make_rng
from toy_heaan_ckks_tpu.ops import wide_fast as wf
from toy_heaan_ckks_tpu.ops.poly import Poly
from toy_heaan_ckks_tpu.parallel.sharded import _mul_relin_rescale_arrays


def _setup(degree=256, count=4, bits=40, digit_size=1, seed=7):
    ctx = CkksContext.build(generate_primes(bits, count, degree), degree)
    eng = CkksEngine(ctx, CkksParams(3.2, degree // 2, bits))
    rng = make_rng(seed)
    sk = eng.generate_secret_key(rng)
    pk = eng.generate_public_key(sk, rng)
    rlk = eng.generate_gadget_relin_key(sk, rng, digit_size=digit_size)
    return ctx, eng, sk, pk, rlk


@pytest.mark.parametrize("bits,count,digit_size", [
    (40, 4, 1),
    (40, 4, 2),
    (61, 3, 1),
])
def test_mul_relin_rescale_wide_bit_exact(bits, count, digit_size):
    degree = 256
    ctx, eng, sk, pk, rlk = _setup(
        degree=degree, count=count, bits=bits, digit_size=digit_size
    )
    args = [
        jnp.stack(
            [Poly.sample_uniform(ctx, make_rng(10 * s + i)).to_ntt_domain().data
             for i in range(2)]
        )
        for s in range(4)
    ]
    g0, g1 = _mul_relin_rescale_arrays(
        *args, rlk.a, rlk.b, ctx, rlk.ext_ctx, ctx.drop_last(1),
        digit_size=rlk.digit_size,
    )
    plan = _switch_plan(ctx.moduli, rlk.ext_ctx.moduli, rlk.digit_size)
    f0, f1 = wf.mul_relin_rescale_wide(
        *args, rlk.a, rlk.b, ctx, rlk.ext_ctx, plan, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(g0), np.asarray(f0))
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(f1))


def test_key_switch_wide_bit_exact():
    degree = 256
    ctx, eng, sk, pk, rlk = _setup(degree=degree, bits=61, count=3)
    d = Poly.sample_uniform(ctx, make_rng(21)).to_ntt_domain().data
    plan = _switch_plan(ctx.moduli, rlk.ext_ctx.moduli, rlk.digit_size)
    ks0, ks1 = _gadget_accumulate(d, rlk.a, rlk.b, ctx, rlk.ext_ctx, plan)
    ref0 = _mod_down_ntt(ks0, ctx, rlk.ext_ctx, plan)
    ref1 = _mod_down_ntt(ks1, ctx, rlk.ext_ctx, plan)
    f0, f1 = wf.key_switch_wide(
        d, rlk.a, rlk.b, ctx, rlk.ext_ctx, plan, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(ref0), np.asarray(f0))
    np.testing.assert_array_equal(np.asarray(ref1), np.asarray(f1))


def test_wide_composite_decodes_within_bound():
    """End-to-end: the wide Pallas composite's output decodes to a*b
    within the reference integration bound (integration_mul.rs:140-145
    class: single mul on a wide chain, 1e-8-grade accuracy at 40 bits)."""
    from toy_heaan_ckks_tpu.types import Ciphertext

    degree = 256
    bits = 40
    ctx, eng, sk, pk, rlk = _setup(degree=degree, bits=bits, count=3)
    enc = CkksEncoder(degree, bits)
    rng = make_rng(3)
    a = np.linspace(0.1, 0.9, degree // 2)
    b = np.linspace(-0.5, 0.5, degree // 2)
    ca = eng.encrypt(enc.encode(a, ctx), pk, ctx.total_bits(), rng)
    cb = eng.encrypt(enc.encode(b, ctx), pk, ctx.total_bits(), rng)
    batchify = lambda p: p.to_ntt_domain().data[None]
    plan = _switch_plan(ctx.moduli, rlk.ext_ctx.moduli, rlk.digit_size)
    o0, o1 = wf.mul_relin_rescale_wide(
        batchify(ca.c0), batchify(ca.c1), batchify(cb.c0), batchify(cb.c1),
        rlk.a, rlk.b, ctx, rlk.ext_ctx, plan, interpret=True,
    )
    child = ctx.drop_last(1)
    q_last = ctx.moduli[-1]
    ct = Ciphertext(
        c0=Poly(o0[0], child, True),
        c1=Poly(o1[0], child, True),
        logp=ca.logp + cb.logp - q_last.bit_length(),
        logq=ca.logq - q_last.bit_length(),
        scale=ca.true_scale * cb.true_scale / q_last,
    )
    got = enc.decode(eng.decrypt(ct, sk.reduce_to(child)))
    assert np.max(np.abs(got - a * b)) < 1e-6
