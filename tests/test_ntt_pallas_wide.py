"""Wide (2-limb) Pallas NTT kernel vs the staged jnp oracle (bit-exact).

Covers the reference's heavy prime configurations (40/61/62-bit chains —
tests/integration_mul.rs, examples/horner_chain.rs) that the small-prime
kernel cannot. Interpret mode on CPU.
"""

import numpy as np
import pytest

from toy_heaan_ckks_tpu import CkksContext, generate_primes
from toy_heaan_ckks_tpu.math.sampling import make_rng
from toy_heaan_ckks_tpu.ops import poly as pops
from toy_heaan_ckks_tpu.ops.ntt_pallas_wide import (
    ntt_pallas_wide,
    supported_wide,
)
from toy_heaan_ckks_tpu.ops.poly import Poly


def test_wide_kernel_matches_jnp_bit_exact():
    degree, bits, count = 1024, 40, 3
    ctx = CkksContext.build(generate_primes(bits, count, degree), degree)
    p = Poly.sample_uniform(ctx, make_rng(5))
    ref_f = pops.forward_ntt(p.data, ctx.ntt, ctx.chain)
    pal_f = ntt_pallas_wide(
        p.data, tuple(ctx.moduli), degree, inverse=False, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(ref_f), np.asarray(pal_f))
    pal_i = ntt_pallas_wide(
        pal_f, tuple(ctx.moduli), degree, inverse=True, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(pal_i), np.asarray(p.data))


def test_wide_kernel_62bit_roundtrip():
    # near the 63-bit Montgomery ceiling; roundtrip pins the Shoup math
    degree, bits, count = 1024, 62, 2
    ctx = CkksContext.build(generate_primes(bits, count, degree), degree)
    p = Poly.sample_uniform(ctx, make_rng(9))
    f = ntt_pallas_wide(
        p.data, tuple(ctx.moduli), degree, inverse=False, interpret=True
    )
    b = ntt_pallas_wide(
        f, tuple(ctx.moduli), degree, inverse=True, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(b), np.asarray(p.data))
    # pointwise mul in tree order == negacyclic convolution: x * 1 == x
    one = Poly.from_coeffs(
        np.array([1] + [0] * (degree - 1), dtype=object), ctx
    )
    one_f = ntt_pallas_wide(
        one.data, tuple(ctx.moduli), degree, inverse=False, interpret=True
    )
    from toy_heaan_ckks_tpu.ops import modular as mm

    prod = mm.mont_mul(f, one_f, ctx.chain)
    back = ntt_pallas_wide(
        prod, tuple(ctx.moduli), degree, inverse=True, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(back), np.asarray(p.data))


def test_supported_wide_gate():
    assert supported_wide(1 << 14, (1 << 61, ))
    assert supported_wide(1 << 15, (1 << 40,))  # factored-twiddle kernel
    assert supported_wide(1 << 16, (1 << 40,))
    assert not supported_wide(1 << 17, (1 << 40,))
    assert not supported_wide(512, (1 << 40,))
    assert not supported_wide(1 << 12, (1 << 63,))  # beyond Montgomery budget


def test_wide_kernel_63bit_non_lazy_roundtrip():
    """Harvey-lazy needs 4q < 2^64 (q < 2^62); a 63-bit modulus must
    dispatch the strict-reduction butterflies and still match the staged
    jnp oracle bit-exactly."""
    from toy_heaan_ckks_tpu.ops.ntt_pallas_wide import lazy_ok_wide

    degree, bits, count = 1024, 63, 1
    ctx = CkksContext.build(generate_primes(bits, count, degree), degree)
    assert not lazy_ok_wide(ctx.moduli)
    assert all((1 << 62) < int(m) < (1 << 63) for m in ctx.moduli)
    p = Poly.sample_uniform(ctx, make_rng(17))
    ref = pops.forward_ntt(p.data, ctx.ntt, ctx.chain)
    got = ntt_pallas_wide(
        p.data, tuple(ctx.moduli), degree, False, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
    gi = ntt_pallas_wide(
        got, tuple(ctx.moduli), degree, True, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(gi), np.asarray(p.data))


def test_lazy_ok_wide_gate():
    from toy_heaan_ckks_tpu.ops.ntt_pallas_wide import lazy_ok_wide

    assert lazy_ok_wide([(1 << 61) + 33, (1 << 40) + 5])
    assert not lazy_ok_wide([(1 << 62) + 57])
