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

import functools

import jax
import jax.numpy as jnp
import numpy as np

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


def _use_mxu(moduli, degree: int) -> bool:
    """Opt-in MXU matmul-NTT dispatch (CKKS_NTT_MXU=1): measured at ~1.6x
    the butterfly kernel's batched cost on the current chip (see
    ops/ntt_mxu.py docstring), kept for latency-bound unbatched use and
    future hardware."""
    import os

    if os.environ.get("CKKS_NTT_MXU") != "1":
        return False
    from .ntt_mxu import supported_mxu

    return supported_mxu(degree, moduli)


def ntt_lo(a_lo, moduli: tuple, degree: int, inverse: bool,
           interpret: bool = False):
    """Fused Pallas NTT on bare lo planes (..., L, N).

    N > 2^15 routes to the factored row x lane twiddle kernel (the
    expanded per-stage planes exceed VMEM there)."""
    if _use_mxu(moduli, degree):
        from .ntt_mxu import ntt_mxu_pallas

        return ntt_mxu_pallas(
            a_lo, tuple(int(m) for m in moduli), degree, inverse,
            interpret=interpret,
        )
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


@functools.lru_cache(maxsize=128)
def _fold_consts(moduli: tuple, degree: int, post: tuple):
    """Folded inverse-NTT final constants: the kernel's pre-final
    accumulator is Mont(c * N), so one Harvey multiply by
    N^{-1} * post_k * R^{-1} mod q_k emits mont_mul(iNTT(x), post) directly
    — the trailing elementwise pass costs nothing."""
    w = np.zeros((len(moduli), 1), np.uint32)
    wp = np.zeros((len(moduli), 1), np.uint32)
    for k, q in enumerate(moduli):
        v = (
            pow(degree, -1, q) * (post[k] % q) * pow(1 << 32, -1, q)
        ) % q
        w[k, 0] = v
        wp[k, 0] = (v << 32) // q
    return w, wp


def inv_ntt_fold(x_lo, moduli: tuple, degree: int, post: tuple,
                 interpret: bool = False):
    """Inverse NTT with plain per-channel post-factors folded into the
    final kernel constant: bit-exact with
    ``mont_mul_lo(ntt_lo(x, inverse=True), post)`` in ONE kernel pass.

    ``post``: tuple of plain ints per channel (e.g. the switch plan's
    dec_inv, a mod-down's sp_inv, or 1 to de-Montgomery).
    """
    moduli = tuple(int(m) for m in moduli)
    if _use_mxu(moduli, degree):
        from .ntt_mxu import ntt_mxu_pallas

        return ntt_mxu_pallas(
            x_lo, moduli, degree, True,
            post=tuple(int(p) for p in post), interpret=interpret,
        )
    w, wp = _fold_consts(moduli, degree, tuple(int(p) for p in post))
    if _use_factored(degree):
        tabs = _planes_factored_cached(moduli, degree)
        irw, irwp, ilw, ilwp, q = tabs[4], tabs[5], tabs[6], tabs[7], tabs[8]
        return _ntt_factored_call(
            x_lo, irw, irwp, ilw, ilwp, q, w, wp,
            degree=degree, inverse=True, interpret=interpret,
            lazy=lazy_ok(moduli),
        )
    _, _, inv_w, inv_wp, q, _, _ = _planes_cached(moduli, degree)
    return _ntt_planes_call(
        x_lo, inv_w, inv_wp, q, w, wp,
        degree=degree, inverse=True, interpret=interpret,
        lazy=lazy_ok(moduli),
    )


@functools.lru_cache(maxsize=128)
def _dec_inv_ints(moduli: tuple, digit_size: int) -> tuple:
    """Plain (Qhat_{t,k})^{-1} mod q_k per channel as host ints (so the
    fold constants never touch traced arrays) — delegates to the shared
    helper in keys.py, the same source engine._switch_plan packs from."""
    from ..keys import dec_inv_ints

    return dec_inv_ints(moduli, digit_size)


# ── composites ───────────────────────────────────────────────────────────────


def rescale_ntt_lo(x, ctx: CkksContext, interpret: bool = False):
    """NTT-domain exact rescale on lo planes: (..., L, N) -> (..., L-1, N)."""
    num = x.shape[-2]
    child = ctx.drop_last(1)
    last_ctx = ctx.slice_channels(num - 1, num)
    cc = child.chain

    # de-Montgomery (post=1) folds into the iNTT final constant
    plain = inv_ntt_fold(
        x[..., num - 1 :, :], last_ctx.moduli, ctx.degree, (1,), interpret
    )
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
    bc = ctx.chain

    from ..keys import sp_inv_ints

    specials = tuple(int(m) for m in sp_ctx.moduli)
    sp_inv = sp_inv_ints(specials)
    yhat = inv_ntt_fold(
        x[..., L:, :], specials, ctx.degree, sp_inv, interpret
    )
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

    # fusing t0/t1/t2 + this iNTT into one Pallas kernel was measured on
    # chip at parity (the composite is VMEM-roll-latency-bound, not
    # HBM-bound) — XLA already multi-output-fuses the tensor passes
    moduli = tuple(int(m) for m in ctx.moduli)
    y = inv_ntt_fold(  # plain yhat: dec_inv folded into the iNTT constant
        t2, moduli, ctx.degree,
        _dec_inv_ints(moduli, plan.digit_size), interpret,
    )
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

    L = len(ctx.moduli)
    specials = ext_ctx.moduli[L:]
    moduli = tuple(int(m) for m in ctx.moduli)
    y = inv_ntt_fold(
        d, moduli, ctx.degree,
        _dec_inv_ints(moduli, plan.digit_size), interpret,
    )
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
