"""Single-limb fast path for small-prime chains (all q < 2^31).

The generic layer stores residues as uint32 (lo, hi) limb pairs stacked on
a size-2 axis; for small chains the hi limbs are identically zero, yet the
stacked layout still costs sublane padding on every elementwise pass and a
slice + re-stack materialisation around every Pallas kernel call. This
module runs whole composites (ct x ct multiply with hybrid gadget
relinearization and rescale; rotation key switch) on bare lo planes
(..., L, N), bit-exact with the generic path (same modular arithmetic,
same operation order up to modular-addition commutativity).

Everything here assumes Montgomery radix 2^32 and is dispatched only when
``ntt_pallas.supported`` holds for the extended chain.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..context import CkksContext
from .ntt_pallas import (
    _ntt_factored_call,
    _ntt_planes_call,
    _planes_cached,
    _planes_factored_cached,
    _use_factored,
    lazy_ok,
)
from .u64 import umul32

# ── lo-plane modular primitives (q, consts broadcast as (L, 1)) ─────────────


def _lo(col):
    """(L, 2, 1) limb-column constant -> (L, 1) lo view."""
    return col[:, 0]


def add_lo(a, b, q):
    s = a + b
    return jnp.where(s >= q, s - q, s)


def sub_lo(a, b, q):
    return jnp.where(a >= b, a - b, a + q - b)


def mont_mul_lo(a, b, q, qinv):
    """Montgomery product (R = 2^32): a*b*R^{-1} mod q, out in [0, q)."""
    t_lo, t_hi = umul32(a, b)
    m = t_lo * qinv
    mq_lo, mq_hi = umul32(m, q)
    s = t_lo + mq_lo
    carry = (s < t_lo).astype(jnp.uint32)
    res = t_hi + mq_hi + carry
    return jnp.where(res >= q, res - q, res)


def ntt_lo(a_lo, moduli: tuple, degree: int, inverse: bool,
           interpret: bool = False):
    """Fused Pallas NTT on bare lo planes (..., L, N).

    N > 2^15 routes to the factored row x lane twiddle kernel (the
    expanded per-stage planes exceed VMEM there)."""
    if _use_factored(degree):
        tabs = _planes_factored_cached(tuple(moduli), degree)
        (frw, frwp, flw, flwp, irw, irwp, ilw, ilwp, q, ninv, ninvp) = tabs
        rw, rwp, lw, lwp = (
            (irw, irwp, ilw, ilwp) if inverse else (frw, frwp, flw, flwp)
        )
        return _ntt_factored_call(
            a_lo, rw, rwp, lw, lwp, q, ninv, ninvp,
            degree=degree, inverse=inverse, interpret=interpret,
            lazy=lazy_ok(moduli),
        )
    fwd_w, fwd_wp, inv_w, inv_wp, q, ninv, ninvp = _planes_cached(
        tuple(moduli), degree
    )
    w, wp = (inv_w, inv_wp) if inverse else (fwd_w, fwd_wp)
    return _ntt_planes_call(
        a_lo, w, wp, q, ninv, ninvp,
        degree=degree, inverse=inverse, interpret=interpret,
        lazy=lazy_ok(moduli),
    )


# ── composites ───────────────────────────────────────────────────────────────


def rescale_ntt_lo(x, ctx: CkksContext, interpret: bool = False):
    """NTT-domain exact rescale on lo planes: (..., L, N) -> (..., L-1, N)."""
    num = x.shape[-2]
    child = ctx.drop_last(1)
    last_ctx = ctx.slice_channels(num - 1, num)
    lc, cc = last_ctx.chain, child.chain

    last = ntt_lo(
        x[..., num - 1 :, :], last_ctx.moduli, ctx.degree, True, interpret
    )
    plain = mont_mul_lo(last, jnp.uint32(1), _lo(lc.q), _lo(lc.qinv))
    bcast = jnp.broadcast_to(plain, x.shape[:-2] + (num - 1, x.shape[-1]))
    mont = mont_mul_lo(bcast, _lo(cc.r2), _lo(cc.q), _lo(cc.qinv))
    x_ntt = ntt_lo(mont, child.moduli, ctx.degree, False, interpret)
    diff = sub_lo(x[..., : num - 1, :], x_ntt, _lo(cc.q))
    return mont_mul_lo(diff, _lo(ctx.qlast_inv), _lo(cc.q), _lo(cc.qinv))


def mod_down_lo(x, ctx: CkksContext, ext_ctx: CkksContext, plan,
                interpret: bool = False):
    """Divide NTT-domain lo planes over QP by P: (..., E, N) -> (..., L, N)."""
    L = len(ctx.moduli)
    E = x.shape[-2]
    gp = E - L
    sp_ctx = ext_ctx.slice_channels(L, E)
    spc, bc = sp_ctx.chain, ctx.chain

    x_sp = ntt_lo(x[..., L:, :], sp_ctx.moduli, ctx.degree, True, interpret)
    yhat = mont_mul_lo(x_sp, _lo(plan.sp_inv), _lo(spc.q), _lo(spc.qinv))
    acc = None
    for m in range(gp):
        term = mont_mul_lo(
            yhat[..., m : m + 1, :], _lo(plan.phat_c[m]),
            _lo(bc.q), _lo(bc.qinv),
        )
        acc = term if acc is None else add_lo(acc, term, _lo(bc.q))
    ext_ntt = ntt_lo(acc, ctx.moduli, ctx.degree, False, interpret)
    diff = sub_lo(x[..., :L, :], ext_ntt, _lo(bc.q))
    return mont_mul_lo(diff, _lo(plan.p_inv), _lo(bc.q), _lo(bc.qinv))


def mul_relin_rescale_lo(c0a, c1a, c0b, c1b, key_a, key_b,
                         ctx: CkksContext, ext_ctx: CkksContext, plan,
                         interpret: bool = False):
    """Full batched multiply + hybrid gadget relin + rescale on lo planes.

    Inputs (..., L, N) NTT-domain Montgomery lo planes; keys (D, E, 2, N).
    Returns (out0, out1) with L-1 channels, NTT domain. The relin mod-down
    and ciphertext rescale are fused into one division by P * q_last (see
    parallel/sharded.py — bit-exact with the generic composite).
    """
    from ..engine import _combined_down_consts
    from .keyswitch_pallas import gadget_accumulate_pallas

    bc = ctx.chain
    L = len(ctx.moduli)
    q, qinv = _lo(bc.q), _lo(bc.qinv)
    t0 = mont_mul_lo(c0a, c0b, q, qinv)
    t1 = add_lo(
        mont_mul_lo(c0a, c1b, q, qinv),
        mont_mul_lo(c1a, c0b, q, qinv),
        q,
    )
    t2 = mont_mul_lo(c1a, c1b, q, qinv)

    d_coeff = ntt_lo(t2, ctx.moduli, ctx.degree, True, interpret)
    y = mont_mul_lo(d_coeff, _lo(plan.dec_inv), q, qinv)  # plain yhat
    ks0, ks1 = gadget_accumulate_pallas(
        y, key_a, key_b,
        base_moduli=ctx.moduli, ext_moduli=ext_ctx.moduli,
        degree=ctx.degree, digit_size=plan.digit_size,
        interpret=interpret, stack_limbs=False, d_ntt=t2,
    )

    from .moddown_pallas import inv_ntt_to_yhat, mod_down_combine_pallas

    p_mont, _ = _combined_down_consts(ctx.moduli, ext_ctx.moduli)
    child_moduli = ctx.moduli[:-1]
    dropped = ext_ctx.moduli[L - 1 :]  # (q_last, specials...)
    Lc = L - 1

    def combine(t, ks):
        # the dropped q_last channel of the combined numerator includes
        # the tensor term scaled by P; the special channels do not (P == 0
        # there)
        t_last_p = mont_mul_lo(
            t[..., Lc:L, :], _lo(p_mont)[Lc:L], q[Lc:L], qinv[Lc:L]
        )
        x_drop = jnp.concatenate(
            [add_lo(t_last_p, ks[..., Lc:L, :], q[Lc:L]), ks[..., L:, :]],
            axis=-2,
        )
        yhat = inv_ntt_to_yhat(
            x_drop, dropped, child_moduli, ctx.degree, interpret
        )
        p_specials = 1
        for p in ext_ctx.moduli[L:]:
            p_specials *= p
        return mod_down_combine_pallas(
            yhat, ks[..., :Lc, :], t[..., :Lc, :],
            child_moduli=child_moduli, dropped_moduli=dropped,
            degree=ctx.degree, interpret=interpret, t_scale=p_specials,
        )

    return combine(t0, ks0), combine(t1, ks1)


def key_switch_lo(d, key_a, key_b, ctx: CkksContext, ext_ctx: CkksContext,
                  plan, interpret: bool = False):
    """Hybrid gadget key switch of NTT-domain lo planes (..., L, N)."""
    from .keyswitch_pallas import gadget_accumulate_pallas
    from .moddown_pallas import inv_ntt_to_yhat, mod_down_combine_pallas

    bc = ctx.chain
    L = len(ctx.moduli)
    specials = ext_ctx.moduli[L:]
    d_coeff = ntt_lo(d, ctx.moduli, ctx.degree, True, interpret)
    y = mont_mul_lo(d_coeff, _lo(plan.dec_inv), _lo(bc.q), _lo(bc.qinv))
    ks0, ks1 = gadget_accumulate_pallas(
        y, key_a, key_b,
        base_moduli=ctx.moduli, ext_moduli=ext_ctx.moduli,
        degree=ctx.degree, digit_size=plan.digit_size,
        interpret=interpret, stack_limbs=False, d_ntt=d,
    )

    def down(ks):
        yhat = inv_ntt_to_yhat(
            ks[..., L:, :], specials, ctx.moduli, ctx.degree, interpret
        )
        return mod_down_combine_pallas(
            yhat, ks[..., :L, :], None,
            child_moduli=ctx.moduli, dropped_moduli=specials,
            degree=ctx.degree, interpret=interpret,
        )

    return down(ks0), down(ks1)
