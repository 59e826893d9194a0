"""Fused mod-down/combine kernel vs the jnp lo-plane oracles (bit-exact).

``small_fast.mod_down_lo`` / ``rescale_ntt_lo`` are the readable oracle
implementations; the fused kernel (ops/moddown_pallas.py) must reproduce
them exactly, including the yhat emission folded into the inverse NTT's
final constants.
"""

import numpy as np
import jax.numpy as jnp

from toy_heaan_ckks_tpu import CkksContext, CkksEngine, CkksParams, generate_primes
from toy_heaan_ckks_tpu.engine import _switch_plan
from toy_heaan_ckks_tpu.math.sampling import make_rng
from toy_heaan_ckks_tpu.ops import small_fast as sf
from toy_heaan_ckks_tpu.ops.moddown_pallas import (
    inv_ntt_to_yhat,
    mod_down_combine_pallas,
)
from toy_heaan_ckks_tpu.ops.poly import Poly


def _setup(degree=1024, L=5, ds=2):
    ctx = CkksContext.build(generate_primes(30, L, degree), degree)
    eng = CkksEngine(ctx, CkksParams(3.2, 16, 30))
    sk = eng.generate_secret_key(make_rng(1))
    rlk = eng.generate_gadget_relin_key(sk, make_rng(2), digit_size=ds)
    return ctx, rlk.ext_ctx, rlk


def test_yhat_emission_matches_oracle():
    ctx, ext, rlk = _setup()
    L = len(ctx.moduli)
    plan = _switch_plan(ctx.moduli, ext.moduli, rlk.digit_size)
    x = Poly.sample_uniform(ext, make_rng(7)).to_ntt_domain().data[None, :, 0, :]
    specials = ext.moduli[L:]
    sp_ctx = ext.slice_channels(L, len(ext.moduli))
    x_sp = sf.ntt_lo(x[..., L:, :], specials, ctx.degree, True, interpret=True)
    want = sf.mont_mul_lo(
        x_sp, sf._lo(plan.sp_inv), sf._lo(sp_ctx.chain.q), sf._lo(sp_ctx.chain.qinv)
    )
    got = inv_ntt_to_yhat(
        x[..., L:, :], specials, ctx.moduli, ctx.degree, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


def test_mod_down_kernel_matches_oracle():
    ctx, ext, rlk = _setup()
    L = len(ctx.moduli)
    plan = _switch_plan(ctx.moduli, ext.moduli, rlk.digit_size)
    x = Poly.sample_uniform(ext, make_rng(9)).to_ntt_domain().data[None, :, 0, :]
    want = sf.mod_down_lo(x, ctx, ext, plan, interpret=True)
    specials = ext.moduli[L:]
    yhat = inv_ntt_to_yhat(
        x[..., L:, :], specials, ctx.moduli, ctx.degree, interpret=True
    )
    got = mod_down_combine_pallas(
        yhat, x[..., :L, :], None,
        child_moduli=ctx.moduli, dropped_moduli=specials,
        degree=ctx.degree, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


def test_combined_division_exact_floor():
    """Combined (t*P + ks) / (P*q_last) equals exact integer floor division
    within the g'+1-unit extension bound."""
    ctx, ext, rlk = _setup()
    L = len(ctx.moduli)
    from toy_heaan_ckks_tpu.engine import _combined_down_consts

    p_mont, _ = _combined_down_consts(ctx.moduli, ext.moduli)
    q, qinv = ctx.chain.q[:, 0], ctx.chain.qinv[:, 0]
    t = Poly.sample_uniform(ctx, make_rng(3)).to_ntt_domain().data[None, :, 0, :]
    ks = Poly.sample_uniform(ext, make_rng(4)).to_ntt_domain().data[None, :, 0, :]
    Lc = L - 1
    dropped = ext.moduli[Lc:]
    p_specials = 1
    for p in ext.moduli[L:]:
        p_specials *= p
    t_last_p = sf.mont_mul_lo(
        t[..., Lc:L, :], sf._lo(p_mont)[Lc:L], q[Lc:L], qinv[Lc:L]
    )
    x_drop = jnp.concatenate(
        [sf.add_lo(t_last_p, ks[..., Lc:L, :], q[Lc:L]), ks[..., L:, :]],
        axis=-2,
    )
    yhat = inv_ntt_to_yhat(
        x_drop, dropped, ctx.moduli[:-1], ctx.degree, interpret=True
    )
    out = mod_down_combine_pallas(
        yhat, ks[..., :Lc, :], t[..., :Lc, :],
        child_moduli=ctx.moduli[:-1], dropped_moduli=dropped,
        degree=ctx.degree, interpret=True, t_scale=p_specials,
    )
    child = ctx.drop_last(1)

    def to_ints(lo, cc):
        stacked = jnp.stack([lo[0], jnp.zeros_like(lo[0])], axis=-2)
        return Poly(stacked, cc, True).to_coeff_domain().to_coeffs()

    t_ints = to_ints(t, ctx)
    ks_ints = to_ints(ks, ext)
    out_ints = to_ints(out, child)
    M = 1
    for m in dropped:
        M *= m
    Qc = 1
    for m in child.moduli:
        Qc *= m
    for j in range(32):
        x_int = int(t_ints[j]) * p_specials + int(ks_ints[j])
        want = ((x_int - (x_int % M)) // M) % Qc
        got = int(out_ints[j]) % Qc
        diff = (got - want) % Qc
        assert min(diff, Qc - diff) <= len(dropped) + 1


def test_mod_down_ntt_extension_error_bound():
    """engine._mod_down_ntt's approximate basis extension vs the EXACT
    big-int mod-down: |error| <= g' (the number of special primes), for
    g' in {1, 2} — the bound engine.py:206-213 argues in prose. The
    error is the same small integer e in [0, g') on every channel
    (x - (x mod P + e*P) is divisible by P), so the test also checks
    cross-channel consistency."""
    from toy_heaan_ckks_tpu.engine import _mod_down_ntt

    rng = np.random.default_rng(31)
    for ds in (1, 2):
        ctx, ext, rlk = _setup(degree=64, L=4, ds=ds)
        L = len(ctx.moduli)
        gp = len(ext.moduli) - L
        assert gp == ds  # digit_size specials by default
        plan = _switch_plan(ctx.moduli, ext.moduli, rlk.digit_size)

        QP = 1
        for m in ext.moduli:
            QP *= m
        P = 1
        for m in ext.moduli[L:]:
            P *= m
        xs = [int(rng.integers(0, 1 << 62)) * int(rng.integers(0, 1 << 60))
              % QP for _ in range(ctx.degree)]
        x = Poly.from_coeffs(np.array(xs, dtype=object), ext)
        got = _mod_down_ntt(x.to_ntt_domain().data, ctx, ext, plan)
        got_ints = Poly(got, ctx, True).to_coeff_domain()

        # compare residues per channel against the exact floor division
        from toy_heaan_ckks_tpu.ops import modular as mm

        plain = np.asarray(mm.from_mont(got_ints.data, ctx.chain))
        lo = plain[..., 0, :].astype(object)
        hi = plain[..., 1, :].astype(object)
        got_res = lo + (hi << 32)  # (L, N) plain residues
        for j in range(ctx.degree):
            exact = (xs[j] - (xs[j] % P)) // P
            errs = set()
            for ci, q in enumerate(ctx.moduli):
                d = (int(got_res[ci][j]) - exact) % q
                d = d if d <= q // 2 else d - q
                errs.add(d)
            assert len(errs) == 1, f"inconsistent extension error {errs}"
            (e,) = errs
            assert abs(e) <= gp, f"extension error {e} exceeds g'={gp}"
