"""Skip-own-tower key-switch accumulation: split-kernel path parity.

For digit t's own-group channels the raised digit is congruent to the
switched polynomial itself, so ``gadget_accumulate_pallas(..., d_ntt=...)``
replaces L of the E*D per-element forward NTTs with direct key products on
the NTT-resident input (the SEAL/OpenFHE "skip own tower in ModUp" idiom;
the reference raises every channel unconditionally —
/root/reference/src/crypto/engine.rs:505-528). The shortcut must be
bit-exact with the single-call kernel for every digit grouping, including
ragged ones (L not divisible by digit_size) and digit_size >= L (one
digit, zero NTTs on base channels).
"""

import numpy as np
import pytest

from toy_heaan_ckks_tpu import CkksContext, CkksEngine, CkksParams, generate_primes
from toy_heaan_ckks_tpu.engine import _switch_plan
from toy_heaan_ckks_tpu.math.sampling import make_rng
from toy_heaan_ckks_tpu.ops import small_fast as sf
from toy_heaan_ckks_tpu.ops.keyswitch_pallas import gadget_accumulate_pallas
from toy_heaan_ckks_tpu.ops.keyswitch_pallas_wide import (
    gadget_accumulate_pallas_wide,
)
from toy_heaan_ckks_tpu.ops.poly import Poly

DEGREE = 1024


def _setup(bits, count, digit_size, seed=11):
    ctx = CkksContext.build(generate_primes(bits, count, DEGREE), DEGREE)
    eng = CkksEngine(ctx, CkksParams(3.2, DEGREE // 2, bits))
    rng = make_rng(seed)
    sk = eng.generate_secret_key(rng)
    rlk = eng.generate_gadget_relin_key(sk, rng, digit_size=digit_size)
    plan = _switch_plan(ctx.moduli, rlk.ext_ctx.moduli, rlk.digit_size)
    d = Poly.sample_uniform(ctx, make_rng(seed + 1)).to_ntt_domain().data
    return ctx, rlk, plan, d


@pytest.mark.parametrize("digit_size,count", [(1, 4), (2, 4), (3, 5), (8, 4)])
def test_small_split_matches_single_call(digit_size, count):
    ctx, rlk, plan, d = _setup(30, count, digit_size)
    d_lo = d[..., 0, :]
    d_coeff = sf.ntt_lo(d_lo, ctx.moduli, ctx.degree, True, interpret=True)
    q, qinv = ctx.chain.q[:, 0], ctx.chain.qinv[:, 0]
    y = sf.mont_mul_lo(d_coeff, plan.dec_inv[:, 0], q, qinv)
    kw = dict(
        base_moduli=ctx.moduli, ext_moduli=rlk.ext_ctx.moduli,
        degree=ctx.degree, digit_size=plan.digit_size,
        interpret=True, stack_limbs=False,
    )
    ref0, ref1 = gadget_accumulate_pallas(y, rlk.a, rlk.b, **kw)
    new0, new1 = gadget_accumulate_pallas(y, rlk.a, rlk.b, d_ntt=d_lo, **kw)
    np.testing.assert_array_equal(np.asarray(ref0), np.asarray(new0))
    np.testing.assert_array_equal(np.asarray(ref1), np.asarray(new1))


@pytest.mark.parametrize("digit_size,count", [(1, 3), (2, 3)])
def test_wide_split_matches_single_call(digit_size, count):
    ctx, rlk, plan, d = _setup(40, count, digit_size)
    from toy_heaan_ckks_tpu.ops.ntt_pallas_wide import ntt_pallas_wide
    from toy_heaan_ckks_tpu.ops import modular as mm

    d_coeff = ntt_pallas_wide(d, ctx.moduli, ctx.degree, inverse=True,
                              interpret=True)
    y = mm.mont_mul(d_coeff, plan.dec_inv, ctx.chain)
    kw = dict(
        base_moduli=ctx.moduli, ext_moduli=rlk.ext_ctx.moduli,
        degree=ctx.degree, digit_size=plan.digit_size, interpret=True,
    )
    ref0, ref1 = gadget_accumulate_pallas_wide(y, rlk.a, rlk.b, **kw)
    new0, new1 = gadget_accumulate_pallas_wide(y, rlk.a, rlk.b, d_ntt=d,
                                               **kw)
    np.testing.assert_array_equal(np.asarray(ref0), np.asarray(new0))
    np.testing.assert_array_equal(np.asarray(ref1), np.asarray(new1))
