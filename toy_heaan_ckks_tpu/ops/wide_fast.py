"""Fused composites for WIDE prime chains (2^31 <= q < 2^63, 2-limb).

Mirrors ops/small_fast.py for the generic limb layout (..., L, 2, N):
whole ct x ct multiply with hybrid gadget relinearization + rescale, and
the rotation key switch, with the decomposition/accumulate and mod-down
running as fused Pallas kernels (ops/keyswitch_pallas_wide.py) and the
NTTs as the wide fused kernel (ops/ntt_pallas_wide.py). Covers the
reference's heavy configurations (40-62-bit chains:
tests/integration_mul.rs:47-51, examples/horner_chain.rs:65) that round 1
left on the staged jnp path.

Bit-exact with the generic jnp path (same modular arithmetic, same
operation order up to modular-addition commutativity). Dispatched by
``parallel/sharded._mul_relin_rescale_arrays`` and
``engine._gadget_key_switch`` when ``ops.poly._use_pallas_wide`` holds for
the extended chain.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..context import CkksContext
from . import modular as mm
from .poly import _chain_slice
from .keyswitch_pallas_wide import (
    gadget_accumulate_pallas_wide,
    inv_ntt_fold_wide,
    inv_ntt_to_yhat_wide,
    mod_down_combine_pallas_wide,
)


def _y_fold_wide(d_ntt, ctx: CkksContext, plan, interpret: bool):
    """Plain decomposition residues y = mont_mul(iNTT(d), dec_inv) with
    the dec_inv multiply folded into the wide iNTT's final constant."""
    from .small_fast import _dec_inv_ints

    moduli = tuple(int(m) for m in ctx.moduli)
    return inv_ntt_fold_wide(
        d_ntt, moduli, ctx.degree,
        _dec_inv_ints(moduli, plan.digit_size), interpret,
    )


def mul_relin_rescale_wide(c0a, c1a, c0b, c1b, key_a, key_b,
                           ctx: CkksContext, ext_ctx: CkksContext, plan,
                           interpret: bool = False):
    """Full batched multiply + hybrid gadget relin + rescale (wide chains).

    Inputs (..., L, 2, N) NTT-domain Montgomery limb data; keys
    (D, E, 2, N). Returns (out0, out1) with L-1 channels, NTT domain. The
    relin mod-down and ciphertext rescale are fused into one division by
    P * q_last (see parallel/sharded.py — bit-exact with the generic
    composite).
    """
    from ..engine import _combined_down_consts

    bc = ctx.chain
    L = len(ctx.moduli)
    t0 = mm.mont_mul(c0a, c0b, bc)
    t1 = mm.add_mod(
        mm.mont_mul(c0a, c1b, bc), mm.mont_mul(c1a, c0b, bc), bc
    )
    t2 = mm.mont_mul(c1a, c1b, bc)

    y = _y_fold_wide(t2, ctx, plan, interpret)  # plain yhat, one kernel
    ks0, ks1 = gadget_accumulate_pallas_wide(
        y, key_a, key_b,
        base_moduli=ctx.moduli, ext_moduli=ext_ctx.moduli,
        degree=ctx.degree, digit_size=plan.digit_size, interpret=interpret,
        d_ntt=t2,
    )

    p_mont, _ = _combined_down_consts(ctx.moduli, ext_ctx.moduli)
    child_moduli = ctx.moduli[:-1]
    dropped = ext_ctx.moduli[L - 1 :]  # (q_last, specials...)
    Lc = L - 1
    p_specials = 1
    for p in ext_ctx.moduli[L:]:
        p_specials *= p

    lchain = _chain_slice(bc, Lc, L)

    def combine(t, ks):
        # the dropped q_last channel of the combined numerator includes the
        # tensor term scaled by P; the special channels do not (P == 0
        # there)
        t_last_p = mm.mont_mul(
            t[..., Lc:L, :, :], p_mont[Lc:L], lchain
        )
        x_drop = jnp.concatenate(
            [
                mm.add_mod(t_last_p, ks[..., Lc:L, :, :], lchain),
                ks[..., L:, :, :],
            ],
            axis=-3,
        )
        yhat = inv_ntt_to_yhat_wide(
            x_drop, dropped, child_moduli, ctx.degree, interpret=interpret
        )
        return mod_down_combine_pallas_wide(
            yhat, ks[..., :Lc, :, :], t[..., :Lc, :, :],
            child_moduli=child_moduli, dropped_moduli=dropped,
            degree=ctx.degree, interpret=interpret, t_scale=p_specials,
        )

    return combine(t0, ks0), combine(t1, ks1)


def key_switch_wide(d, key_a, key_b, ctx: CkksContext, ext_ctx: CkksContext,
                    plan, interpret: bool = False):
    """Hybrid gadget key switch of NTT-domain limb data (..., L, 2, N)."""
    L = len(ctx.moduli)
    specials = ext_ctx.moduli[L:]
    y = _y_fold_wide(d, ctx, plan, interpret)
    ks0, ks1 = gadget_accumulate_pallas_wide(
        y, key_a, key_b,
        base_moduli=ctx.moduli, ext_moduli=ext_ctx.moduli,
        degree=ctx.degree, digit_size=plan.digit_size, interpret=interpret,
        d_ntt=d,
    )

    def down(ks):
        yhat = inv_ntt_to_yhat_wide(
            ks[..., L:, :, :], specials, ctx.moduli, ctx.degree,
            interpret=interpret,
        )
        return mod_down_combine_pallas_wide(
            yhat, ks[..., :L, :, :], None,
            child_moduli=ctx.moduli, dropped_moduli=specials,
            degree=ctx.degree, interpret=interpret,
        )

    return down(ks0), down(ks1)
