"""Homomorphic slot algorithms: rotation trees, Horner evaluation, sqrt.

These are the "model"-level pipelines the reference plans in its specs and
examples (reference: specs/ctx.md "What needs to be built" items 1-5,
examples/std_dev_8.rs, examples/horner_chain.rs):

- ``sum_slots``: binary rotation tree — after log2(slots) rotations every
  slot holds the sum of all slots.
- ``align_level``: bring a fresh ciphertext down to a target level by a
  noise-free multiply-by-1.0 + rescale (the level/scale alignment the specs
  call for before subtraction; the reference instead re-encrypts fresh
  operands per level).
- ``eval_poly_horner``: generic Horner polynomial evaluation, one
  ct x ct multiply + rescale per degree.
- ``poly_sqrt``: degree-3 polynomial approximation of sqrt on [0, 0.25]
  (least-squares fit, the "direct Chebyshev" pragmatic choice of
  specs/ctx.md item 5).
- ``encrypted_std_dev``: the full sensor std-dev pipeline
  (sum -> mean -> center -> square -> variance -> sqrt).
"""

from __future__ import annotations

import functools

import numpy as np

from ..engine import CkksEngine, CkksParams
from ..keys import KeyLadder
from ..types import Ciphertext


def sum_slots(ct: Ciphertext, ladder: KeyLadder, slots: int) -> Ciphertext:
    """Binary rotation tree: every slot ends up holding sum(all slots).

    Needs rotation keys for offsets 1, 2, 4, ..., slots/2 at ct's level
    (specs/ctx.md item 3). Level-free.
    """
    if slots & (slots - 1):
        raise ValueError("sum_slots: slots must be a power of two")
    keys = ladder.at_level(ct.level)
    acc = ct
    offset = 1
    while offset < slots:
        rotated = CkksEngine.rotate_ciphertext(acc, keys.rot[offset])
        acc = CkksEngine.add_ciphertexts(acc, rotated)
        offset *= 2
    return acc


def sum_slots_hoisted(ct: Ciphertext, rot_keys) -> Ciphertext:
    """Slot-sum via double-hoisted rotations: ct + sum_j rot_j(ct),
    j = 1..slots-1, sharing ONE gadget decomposition of c1 AND one P
    mod-down for the whole sum.

    ``rot_keys``: rotation keys for every offset 1..slots-1 (same ext
    basis + digit_size). Trades the binary tree's log2(slots) full
    key-switches (each paying the L + D*E channel-NTT decomposition,
    sequentially dependent) for slots-1 pointwise key products + gathers
    in the extended basis and a single shared decomposition + mod-down —
    a fixed channel-NTT budget independent of the rotation count, and
    far better latency (one batched kernel chain, no sequential
    dependency). Level-free; decode-equal to the tree within key-switch
    noise (not residue-equal — see engine._hoisted_rotate_sum_core).
    """
    rotated_sum = CkksEngine.rotate_sum_hoisted(ct, rot_keys)
    return CkksEngine.add_ciphertexts(ct, rotated_sum)


def align_level(
    engine: CkksEngine, ct: Ciphertext, target_level: int
) -> Ciphertext:
    """Drop ``ct`` to ``target_level`` by multiply-by-1.0 + rescale steps.

    Each step consumes one prime exactly like the path the other operand
    took, so logp/logq bookkeeping matches for subsequent add/sub (requires
    the SCALE = prime-bit-width rule, reference tests/integration_mul.rs:
    6-14)."""
    acc = ct
    while acc.level > target_level:
        acc = CkksEngine.rescale_ciphertext(engine.mul_plain_scalar(acc, 1.0))
    return acc


def normalize_scale(
    engine: CkksEngine, ct: Ciphertext, target_scale: float
) -> Ciphertext:
    """Bring ``ct.true_scale`` to (float-exactly tracked) ``target_scale``,
    consuming one level.

    Multiplies by the constant 1.0 encoded at the adjusted scale
    Delta' = target_scale * q_top / ct.true_scale, then rescales by
    q_top: the slot values are multiplied by exactly 1 (the plaintext's
    declared scale IS its rounded integer, so it represents 1.0 with no
    approximation), while the tracked scale lands on
    target_scale * round(Delta')/Delta' — within 2^-31 relative.

    This is the standard SEAL/Lattigo scale-management primitive the
    reference (integer-logp-only) cannot express; deep branchy circuits
    (composed Paterson-Stockmeyer iterations) need it because scale
    drift compounds multiplicatively through ct x ct products and
    different branches reach the same level with different exact scales
    (see funceval._combine, which self-heals with this).
    """
    from ..ops.poly import Poly
    from ..types import Plaintext

    ctx = ct.ctx
    if ctx.num_channels < 2:
        raise ValueError("normalize_scale: no level left to consume")
    q_top = ctx.moduli[-1]
    dp = target_scale * q_top / ct.true_scale
    enc = int(round(dp))
    if enc < 1:
        raise ValueError(
            f"normalize_scale: adjustment {dp:.3g} not encodable"
        )
    coeffs = np.zeros(ctx.degree, dtype=object)
    coeffs[0] = enc
    pt = Plaintext(
        poly=Poly.from_coeffs(coeffs, ctx),
        scale_bits=engine.params.scale_bits,
        slots=ctx.degree // 2,
        scale=float(enc),  # the constant is exactly 1.0 at this scale
    )
    return CkksEngine.rescale_ciphertext(CkksEngine.mul_plain(ct, pt))


def eval_poly_horner(
    ladder: KeyLadder,
    params: CkksParams,
    ct: Ciphertext,
    coeffs: list[float],
) -> Ciphertext:
    """Evaluate a_0 + a_1 x + ... + a_d x^d on an encrypted x via Horner.

    Consumes d levels (one ct x ct multiply + rescale per step, with the
    plain coefficient folded in as a constant-polynomial addition); parity
    with specs/ctx.md item 4. ``coeffs[k]`` multiplies x^k.
    """
    coeffs = [float(c) for c in coeffs]
    d = len(coeffs) - 1
    if d < 1:
        raise ValueError("eval_poly_horner: need degree >= 1")

    def engine_at(level):
        return CkksEngine(ladder.at_level(level).ctx, params)

    # r = a_d * x + a_{d-1}
    eng = engine_at(ct.level)
    r = CkksEngine.rescale_ciphertext(eng.mul_plain_scalar(ct, coeffs[d]))
    r = _add_const(engine_at(r.level), r, coeffs[d - 1])
    x = ct
    for k in range(d - 2, -1, -1):
        x = align_level(engine_at(x.level), x, r.level)
        rlk = ladder.at_level(r.level).rlk
        r = CkksEngine.mul_rescale(r, x, rlk)
        r = _add_const(engine_at(r.level), r, coeffs[k])
    return r


def _add_const(engine: CkksEngine, ct: Ciphertext, value) -> Ciphertext:
    """Add a plain constant to every slot (constant-poly plaintext).

    The constant is encoded at the ciphertext's EXACT scale (not the
    nominal 2^logp), so the addition introduces no scale-drift error
    even deep in an evaluation chain. Complex constants ride the
    X^{N/2} monomial, which evaluates to i at every first-half slot
    root (zeta_k^{N/2} = i^{J(k)} = i since J(k) = 5^k = 1 mod 4)."""
    from ..ops.poly import Poly
    from ..types import Plaintext

    ctx = ct.ctx
    v = complex(value)
    coeffs = np.zeros(ctx.degree, dtype=object)
    coeffs[0] = int(round(v.real * ct.true_scale))
    if v.imag:
        coeffs[ctx.degree // 2] = int(round(v.imag * ct.true_scale))
    pt = Plaintext(
        poly=Poly.from_coeffs(coeffs, ctx), scale_bits=ct.logp,
        slots=ctx.degree // 2, scale=ct.true_scale,
    )
    return CkksEngine.add_plain(ct, pt)


@functools.lru_cache(maxsize=8)
def sqrt_poly_coeffs(degree: int = 3, lo: float = 0.0, hi: float = 0.25):
    """Least-squares polynomial fit of sqrt(x) on [lo, hi].

    Degree 3 fits the std-dev level budget (2 multiplies via Horner);
    singular sqrt'(0) makes near-zero variance less accurate — acceptable
    per specs/ctx.md item 5.
    """
    x = np.linspace(lo + 1e-6, hi, 2048)
    fit = np.polynomial.chebyshev.Chebyshev.fit(x, np.sqrt(x), degree)
    return tuple(fit.convert(kind=np.polynomial.Polynomial).coef)


def encrypted_std_dev(
    ladder: KeyLadder,
    params: CkksParams,
    ct: Ciphertext,
    slots: int,
) -> Ciphertext:
    """Homomorphic standard deviation over ``slots`` values in one ct.

    Pipeline (specs/ctx.md): sum_slots -> mean -> center -> square ->
    variance -> polynomial sqrt. Requires inputs normalised to [0, 1] so
    variance lies in [0, 0.25]. Consumes 3 + deg(sqrt)-1 levels.
    """

    def engine_at(level):
        return CkksEngine(ladder.at_level(level).ctx, params)

    # mean in every slot
    sum_ct = sum_slots(ct, ladder, slots)
    mean = CkksEngine.rescale_ciphertext(
        engine_at(sum_ct.level).mul_plain_scalar(sum_ct, 1.0 / slots)
    )

    # center the original
    x = align_level(engine_at(ct.level), ct, mean.level)
    centered = CkksEngine.sub_ciphertexts(x, mean)

    # squared deviations (squaring shortcut: bit-identical, one fewer
    # pointwise product)
    rlk = ladder.at_level(centered.level).rlk
    sq = CkksEngine.rescale_ciphertext(
        CkksEngine.square_ciphertext(centered, rlk)
    )

    # variance in every slot
    sq_sum = sum_slots(sq, ladder, slots)
    variance = CkksEngine.rescale_ciphertext(
        engine_at(sq_sum.level).mul_plain_scalar(sq_sum, 1.0 / slots)
    )

    # sqrt via degree-3 polynomial
    return eval_poly_horner(
        ladder, params, variance, list(sqrt_poly_coeffs())
    )
