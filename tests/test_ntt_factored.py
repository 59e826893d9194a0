"""Factored row x lane twiddle NTT kernel vs the staged jnp oracle.

N = 2^16 exceeded the round-1 kernel's VMEM budget (expanded (N,) twiddle
planes per stage); the factored kernel splits each stage's plane into an
(R,) row factor and a (C,) lane factor whose outer product is the plane
(the CRT-tree exponents are additive over the group-index bit split).
Bit-exactness is uint32 equality against ops/ntt.py — the same oracle
discipline as the full-plane kernel (reference:
src/rings/backends/rns_ntt/poly.rs:960-975).
"""

import os

import numpy as np
import pytest

from toy_heaan_ckks_tpu import CkksContext, generate_primes
from toy_heaan_ckks_tpu.math.sampling import make_rng
from toy_heaan_ckks_tpu.ops import poly as pops
from toy_heaan_ckks_tpu.ops import ntt_pallas as npal
from toy_heaan_ckks_tpu.ops.poly import Poly


def _factored_ntt(data, ctx, inverse, degree):
    tabs = npal._planes_factored_cached(tuple(ctx.moduli), degree)
    (frw, frwp, flw, flwp, irw, irwp, ilw, ilwp, q, ninv, ninvp) = tabs
    rw, rwp, lw, lwp = (
        (irw, irwp, ilw, ilwp) if inverse else (frw, frwp, flw, flwp)
    )
    return npal._ntt_factored_call(
        data[..., 0, :], rw, rwp, lw, lwp, q, ninv, ninvp,
        degree=degree, inverse=inverse, interpret=True,
        lazy=npal.lazy_ok(ctx.moduli),
    )


@pytest.mark.parametrize("degree,bits", [(4096, 29), (4096, 31)])
def test_factored_matches_oracle_mid_degree(degree, bits):
    """Cross-check at a degree where the full-plane kernel also works:
    factored output == staged jnp == (lazy and non-lazy covered by bits)."""
    ctx = CkksContext.build(generate_primes(bits, 2, degree), degree)
    p = Poly.sample_uniform(ctx, make_rng(5))
    ref_f = pops.forward_ntt(p.data, ctx.ntt, ctx.chain)
    got_f = _factored_ntt(p.data, ctx, False, degree)
    np.testing.assert_array_equal(
        np.asarray(ref_f[..., 0, :]), np.asarray(got_f)
    )
    got_i = _factored_ntt(ref_f, ctx, True, degree)
    np.testing.assert_array_equal(
        np.asarray(p.data[..., 0, :]), np.asarray(got_i)
    )


def test_factored_wide_matches_oracle():
    """2-limb factored kernel (direct call at a CI-sized degree; the same
    table math and kernel dispatch at 2^15/2^16 on chip)."""
    from toy_heaan_ckks_tpu.ops.ntt_pallas_wide import (
        _ntt_factored_wide,
        _use_factored_wide,
        supported_wide,
    )

    degree = 2048
    ctx = CkksContext.build(generate_primes(61, 2, degree), degree)
    p = Poly.sample_uniform(ctx, make_rng(5))
    ref = pops.forward_ntt(p.data, ctx.ntt, ctx.chain)
    got = _ntt_factored_wide(
        p.data, tuple(ctx.moduli), degree, False, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
    gi = _ntt_factored_wide(
        got, tuple(ctx.moduli), degree, True, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(gi), np.asarray(p.data))
    # envelope: factored mode engages above 2^14 and is supported to 2^16
    assert not _use_factored_wide(1 << 14)
    assert _use_factored_wide(1 << 15)
    assert supported_wide(1 << 16, ctx.moduli)


def test_factored_supports_2_16():
    """supported() now covers N = 2^16; roundtrip + oracle equality."""
    degree = 1 << 16
    assert npal.supported(degree, True)
    assert npal._use_factored(degree)
    ctx = CkksContext.build(generate_primes(29, 1, degree), degree)
    p = Poly.sample_uniform(ctx, make_rng(7))
    ref_f = pops.forward_ntt(p.data, ctx.ntt, ctx.chain)
    got_f = _factored_ntt(p.data, ctx, False, degree)
    np.testing.assert_array_equal(
        np.asarray(ref_f[..., 0, :]), np.asarray(got_f)
    )
    got_i = _factored_ntt(ref_f, ctx, True, degree)
    np.testing.assert_array_equal(
        np.asarray(p.data[..., 0, :]), np.asarray(got_i)
    )


_HEAVY_SKIP = pytest.mark.skipif(
    not os.environ.get("CKKS_HEAVY_INTERPRET"),
    reason=(
        "interpret-mode composite at N >= 2^15: the inlined grid-step "
        "graph takes >2h to compile on a 1-core host (measured r4). "
        "The same composites are verified compiled-on-TPU with uint32 "
        "equality by tools/ab_check.py (configs small-2^16-29b-ds1 / "
        "wide-2^15-61b-ds1, recorded in ABCHECK_r*.json); the factored "
        "kernel branch itself is covered above and by "
        "test_advice_regressions.test_inv_ntt_fold_*. Set "
        "CKKS_HEAVY_INTERPRET=1 to run here too."
    ),
)


@_HEAVY_SKIP
def test_fused_composite_factored_2_16():
    """The fused mult+relin+rescale composite at N = 2^16: the in-kernel
    NTT stages (key-switch accumulate, yhat emission, mod-down combine)
    run on factored row x lane twiddles there; bit-exact vs the generic
    jnp branch, same oracle discipline as the N <= 2^15 plane path."""
    import jax.numpy as jnp

    from toy_heaan_ckks_tpu import CkksEngine, CkksParams
    from toy_heaan_ckks_tpu.engine import _switch_plan
    from toy_heaan_ckks_tpu.ops import small_fast as sf
    from toy_heaan_ckks_tpu.ops.poly import _use_pallas_fused, _on_tpu
    from toy_heaan_ckks_tpu.parallel.sharded import (
        _mul_relin_rescale_arrays,
    )

    degree = 1 << 16
    ctx = CkksContext.build(generate_primes(30, 2, degree), degree)
    if _on_tpu():  # gate itself (tests force CPU; guard is for chip runs)
        assert _use_pallas_fused(ctx)
    eng = CkksEngine(ctx, CkksParams(3.2, degree // 2, 30))
    rng = make_rng(11)
    sk = eng.generate_secret_key(rng)
    rlk = eng.generate_gadget_relin_key(sk, rng, digit_size=2)
    plan = _switch_plan(ctx.moduli, rlk.ext_ctx.moduli, rlk.digit_size)
    args = [
        Poly.sample_uniform(ctx, make_rng(20 + s)).to_ntt_domain().data[None]
        for s in range(4)
    ]
    g0, g1 = _mul_relin_rescale_arrays(
        *args, rlk.a, rlk.b, ctx, rlk.ext_ctx, ctx.drop_last(1),
        digit_size=rlk.digit_size,
    )
    f0, f1 = sf.mul_relin_rescale_lo(
        *[jnp.asarray(a)[..., 0, :] for a in args], rlk.a, rlk.b,
        ctx, rlk.ext_ctx, plan, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(g0[..., 0, :]), np.asarray(f0))
    np.testing.assert_array_equal(np.asarray(g1[..., 0, :]), np.asarray(f1))


@_HEAVY_SKIP
def test_fused_composite_factored_wide_2_15():
    """Wide (2-limb) fused composite above its expanded-plane octave
    (N = 2^15 > 2^14): key-switch accumulate, yhat emission, and mod-down
    combine all run factored row x lane twiddles; bit-exact vs the
    generic jnp branch."""
    import jax.numpy as jnp

    from toy_heaan_ckks_tpu import CkksEngine, CkksParams
    from toy_heaan_ckks_tpu.engine import _switch_plan
    from toy_heaan_ckks_tpu.ops import wide_fast as wf
    from toy_heaan_ckks_tpu.ops.ntt_pallas_wide import _use_factored_wide
    from toy_heaan_ckks_tpu.parallel.sharded import (
        _mul_relin_rescale_arrays,
    )

    degree = 1 << 15
    assert _use_factored_wide(degree)
    ctx = CkksContext.build(generate_primes(61, 2, degree), degree)
    eng = CkksEngine(ctx, CkksParams(3.2, degree // 2, 61))
    rng = make_rng(13)
    sk = eng.generate_secret_key(rng)
    rlk = eng.generate_gadget_relin_key(sk, rng, digit_size=1)
    plan = _switch_plan(ctx.moduli, rlk.ext_ctx.moduli, rlk.digit_size)
    args = [
        Poly.sample_uniform(ctx, make_rng(30 + s)).to_ntt_domain().data[None]
        for s in range(4)
    ]
    g0, g1 = _mul_relin_rescale_arrays(
        *args, rlk.a, rlk.b, ctx, rlk.ext_ctx, ctx.drop_last(1),
        digit_size=rlk.digit_size,
    )
    f0, f1 = wf.mul_relin_rescale_wide(
        *[jnp.asarray(a) for a in args], rlk.a, rlk.b,
        ctx, rlk.ext_ctx, plan, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(g0), np.asarray(f0))
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(f1))
