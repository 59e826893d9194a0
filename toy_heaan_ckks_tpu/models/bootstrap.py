"""CKKS bootstrapping primitives (beyond the reference).

The reference (oiwn/toy-heaan-ckks) is a levelled scheme: once the
modulus chain is consumed the ciphertext is dead. This module adds the
capability that separates a toy from a production CKKS — refreshing an
exhausted ciphertext — built from the framework's own primitives:

1. ``raise_modulus``  — exact re-interpretation of a level-1 ciphertext
   over a fresh full basis; decryption then yields m + q0*I with a small
   integer overflow polynomial I (|I| bounded by the secret's 1-norm).
2. ``eval_chebyshev`` — numerically stable Chebyshev-basis polynomial
   evaluation via the three-term recurrence (one ct x ct multiply +
   rescale per degree), used for the sine approximation of EvalMod.
3. ``coeff_to_slot`` / ``slot_to_coeff`` — the homomorphic DFTs between
   coefficient and slot representations, evaluated as double-hoisted
   diagonal matrix-vector products with one shared mod-down each, with
   the conjugation key supplying the anti-linear half.
4. ``bootstrap`` — the full pipeline: raise -> CtS -> EvalMod (scaled
   sine) -> StC, returning a ciphertext of the SAME message at a higher
   level than the input.

No security claim is attached to the toy parameter sets used in the
tests/examples (as with every parameter set in this repo — see
utils/params.py for the 128-bit doctrine).
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

from ..context import CkksContext
from ..engine import CkksEngine
from ..errors import CkksError
from ..ops import modular as mm
from ..ops.poly import Poly
from ..types import Ciphertext

__all__ = [
    "raise_modulus",
    "eval_chebyshev",
]


def _raise_lo(x_plain_lo, q0: int, target_ctx: CkksContext):
    """Centered lift of plain residues mod q0 into every target channel.

    x: uint32 (..., 1, N) plain values in [0, q0). Returns uint32
    (..., Lt, N) plain residues of the centered representative
    v in (-q0/2, q0/2]: v = x - q0 when 2x > q0 else x, reduced mod each
    q_j. Requires every q_j > q0/2 so the reduction is one conditional
    add (checked by the caller).
    """
    q_t = target_ctx.chain.q[:, 0]  # (Lt, 1) lo limbs
    x = x_plain_lo  # broadcast (..., 1, N) against (Lt, 1)
    neg = x + q_t - jnp.uint32(q0)  # x > q0/2: in [0, q_j)
    return jnp.where(2 * x > jnp.uint32(q0), neg, jnp.broadcast_to(
        x, x.shape[:-2] + (q_t.shape[0], x.shape[-1])
    ))


def raise_modulus(ct: Ciphertext, target_ctx: CkksContext) -> Ciphertext:
    """Re-interpret a level-1 ciphertext over a fresh full basis.

    The coefficients of c0/c1 are lifted centered from Z_q0 to Z and
    reduced into ``target_ctx``'s RNS basis — an EXACT integer
    operation. Decrypting the result under the (extended) secret yields
    m + q0*I where I is the integer polynomial absorbed by the mod-q0
    reduction: |I|_inf <= (1 + ||s||_1)/2 + 1, small for sparse secrets.
    This is the entry step of bootstrapping (Cheon et al., EUROCRYPT'18,
    "Bootstrapping for approximate homomorphic encryption", §3).

    The reference has no counterpart — its chain dies at level 1
    (engine.rs:255-282 only ever drops primes).
    """
    ctx = ct.ctx
    if ctx.num_channels != 1:
        raise CkksError("raise_modulus: ciphertext must be at level 1")
    if not (ctx.chain.small and target_ctx.chain.small):
        raise CkksError("raise_modulus: small-prime chains only")
    q0 = ctx.moduli[0]
    if any(2 * q <= q0 for q in target_ctx.moduli):
        raise CkksError(
            "raise_modulus: every target prime must exceed q0/2"
        )
    if target_ctx.degree != ctx.degree:
        raise CkksError("raise_modulus: ring degree mismatch")

    def lift(poly: Poly) -> Poly:
        data = poly.to_coeff_domain().data  # (1, 2, N) Montgomery
        plain = mm.from_mont(data, ctx.chain)[..., 0, :]  # (1, N)
        v = _raise_lo(plain, q0, target_ctx)  # (Lt, N) plain
        limbs = jnp.stack([v, jnp.zeros_like(v)], axis=-2)
        mont = mm.to_mont(limbs, target_ctx.chain)
        return Poly(mont, target_ctx, False).to_ntt_domain()

    return Ciphertext(
        c0=lift(ct.c0),
        c1=lift(ct.c1),
        logp=ct.logp,
        logq=target_ctx.total_bits(),
        scale=ct.scale,
    )


def eval_chebyshev(ladder, params, ct: Ciphertext, coeffs) -> Ciphertext:
    """Evaluate sum_k coeffs[k] * T_k(x) on an encrypted x in [-1, 1].

    Chebyshev basis with the three-term recurrence
    T_{k+1} = 2 x T_k - T_{k-1} — numerically stable where the monomial
    conversion of a high-degree fit catastrophically cancels. One
    ct x ct multiply + rescale per degree (depth = deg, like Horner —
    ``models/algorithms.eval_poly_horner`` is the monomial twin).

    ``ladder``: KeyLadder covering ct's level down to level-deg.
    """
    from .algorithms import _add_const, align_level

    coeffs = [float(c) for c in coeffs]
    deg = len(coeffs) - 1
    if deg < 1:
        raise ValueError("eval_chebyshev: need degree >= 1")

    def engine_at(level):
        return CkksEngine(ladder.at_level(level).ctx, params)

    # acc = c0 + c1*x at x's scale
    t_prev = None  # T_{k-1}(x) ciphertext
    t_cur = ct  # T_1 = x
    acc = CkksEngine.rescale_ciphertext(
        engine_at(ct.level).mul_plain_scalar(ct, coeffs[1])
    )
    acc = _add_const(engine_at(acc.level), acc, coeffs[0])

    for k in range(2, deg + 1):
        # T_k = 2 x T_{k-1} - T_{k-2}
        x_al = align_level(engine_at(ct.level), ct, t_cur.level)
        rlk = ladder.at_level(t_cur.level).rlk
        t_next = CkksEngine.rescale_ciphertext(
            CkksEngine.mul_ciphertexts_gadget(x_al, t_cur, rlk)
        )
        eng = engine_at(t_next.level)
        t_next = CkksEngine.add_ciphertexts(t_next, t_next)  # 2xT
        if t_prev is not None:
            prev_al = align_level(
                engine_at(t_prev.level), t_prev, t_next.level
            )
            t_next = CkksEngine.sub_ciphertexts(t_next, prev_al)
        else:
            t_next = _add_const(eng, t_next, -1.0)  # T_0 = 1
        t_prev, t_cur = t_cur, t_next

        term = CkksEngine.rescale_ciphertext(
            engine_at(t_cur.level).mul_plain_scalar(t_cur, coeffs[k])
        )
        acc = align_level(engine_at(acc.level), acc, term.level)
        acc = CkksEngine.add_ciphertexts(acc, term)
    return acc
