"""Pallas fused-NTT kernel vs the staged jnp oracle (bit-exact).

Runs the kernel in interpreter mode on CPU (tests force JAX_PLATFORMS=cpu
in conftest); on TPU the same kernel is compiled and dispatched
automatically by ops.poly.to_ntt / to_coeff.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from toy_heaan_ckks_tpu import CkksContext, generate_primes
from toy_heaan_ckks_tpu.math.sampling import make_rng
from toy_heaan_ckks_tpu.ops import poly as pops
from toy_heaan_ckks_tpu.ops.ntt_pallas import ntt_pallas, supported
from toy_heaan_ckks_tpu.ops.poly import Poly


@pytest.mark.parametrize("degree,count,bits", [(1024, 3, 30), (2048, 4, 31)])
def test_pallas_matches_jnp_bit_exact(degree, count, bits):
    primes = generate_primes(bits, count, degree)
    ctx = CkksContext.build(primes, degree)
    p = Poly.sample_uniform(ctx, make_rng(7))

    ref_f = pops.forward_ntt(p.data, ctx.ntt, ctx.chain)
    pal_f = ntt_pallas(p.data, ctx.moduli, degree, inverse=False, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref_f), np.asarray(pal_f))

    ref_i = pops.inverse_ntt(ref_f, ctx.ntt, ctx.chain)
    pal_i = ntt_pallas(pal_f, ctx.moduli, degree, inverse=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref_i), np.asarray(pal_i))
    np.testing.assert_array_equal(np.asarray(ref_i), np.asarray(p.data))


@pytest.mark.parametrize("batch", [3, 4])
def test_pallas_batched_lead_dims(batch):
    # batch=3 -> outer 6 -> auto pair=2; batch=4 -> outer 8 -> auto
    # pair=4 (the multi-plane grid-step path must stay bit-exact)
    degree = 1024
    primes = generate_primes(30, 2, degree)
    ctx = CkksContext.build(primes, degree)
    d = jnp.stack(
        [Poly.sample_uniform(ctx, make_rng(s)).data for s in range(batch)]
    )
    ref = pops.forward_ntt(d, ctx.ntt, ctx.chain)
    pal = ntt_pallas(d, ctx.moduli, degree, inverse=False, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(pal))


def test_supported_gate():
    assert supported(1 << 14, small=True)
    assert not supported(1 << 14, small=False)  # >= 2^31 primes: jnp path
    assert not supported(512, small=True)  # tiny degrees: jnp path
    assert not supported(1000, small=True)  # non-power-of-two


def test_auto_pair_vmem_model():
    """Pair selection must keep the double-buffered scoped-VMEM footprint
    2*(fixed + p*per_item)*N*4 under ~15 MB. Pins the round-4 regression:
    the key-switch kernel at N=2^15 digit_size=1 (fixed = 2*15 twiddle +
    2*4 key planes) OOM'd on chip at pair=2 (18.29 M scoped vs the 16 M
    limit); the model must force pair=1 there WITHOUT disturbing the
    tuned bench configs (2^14 ds4 pair=4; 2^16 factored composite
    pair=1)."""
    from toy_heaan_ckks_tpu.ops.ntt_pallas import _auto_pair

    # regression config: N=2^15, L=4, D=4, S=15 expanded planes
    assert _auto_pair(32, 1 << 15, 2 * 4 + 4 + 3, fixed_planes=30 + 8) == 1
    # bench main config: N=2^14, L=8, D=2, S=14 — measured working at 4
    assert _auto_pair(32, 1 << 14, 2 * 8 + 2 + 3, fixed_planes=28 + 4) == 4
    # bench big config: N=2^16 factored (tiny twiddles), D=2 keys
    assert _auto_pair(4, 1 << 16, 2 * 4 + 2 + 3, fixed_planes=4) == 1
    # env override still wins (restore any pre-existing value)
    import os

    prev = os.environ.get("CKKS_FUSED_PAIR")
    os.environ["CKKS_FUSED_PAIR"] = "2"
    try:
        assert _auto_pair(32, 1 << 15, 15, fixed_planes=38) == 2
    finally:
        if prev is None:
            del os.environ["CKKS_FUSED_PAIR"]
        else:
            os.environ["CKKS_FUSED_PAIR"] = prev
