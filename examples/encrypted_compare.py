"""Encrypted comparison: slot-wise max / compare on ciphertexts
(beyond-reference showcase).

CKKS cannot branch, so sign(x) is evaluated as a composition of small
odd polynomials (Cheon-Kim-Kim, Asiacrypt 2020): g_3 iterations grow
the decision margin geometrically, f_3 iterations then converge
quadratically to +-1 — exponentially cheaper than one giant minimax
polynomial. Each iteration is a degree-7 Paterson-Stockmeyer
evaluation (~4 ct-ct multiplies, ~4 levels).

This example compares two encrypted vectors slot-wise (a > b as 0/1)
and computes their slot-wise max, checking both against the plain
result on inputs honoring the margin contract |a - b| >= 0.25.

Acceptance: max |compare - (a>b)| <= 0.02 and
max |max_enc - max(a,b)| <= 0.02; exit 1 otherwise.
"""

from _common import check_bound, table
import numpy as np

from toy_heaan_ckks_tpu import (
    CkksContext, CkksEncoder, CkksEngine, CkksParams, build_modulus_chain,
)
from toy_heaan_ckks_tpu.keys import KeyLadder
from toy_heaan_ckks_tpu.math.sampling import make_rng
from toy_heaan_ckks_tpu.models.compare import compare, eval_max

N = 256
SLOTS = N // 2
SCALE = 30
DEPTH = 16  # (1 g + 2 f) iterations x ~4 levels + combine margin
# Deep composed circuits need a SCALE-MATCHED chain (the parameter
# doctrine in utils/params.py): intermediates alternate just-above /
# just-below 2^SCALE so per-level scale drift cancels instead of
# compounding through the PS product tree. A one-sided generate_primes
# chain drifts branch scales >1% apart here, which funceval's combine
# would have to burn levels re-equalising (normalize_scale).


def main():
    plan = build_modulus_chain(N, SCALE, DEPTH)
    ctx = CkksContext.build(list(plan.moduli), N)
    params = CkksParams(3.2, N // 2, SCALE)
    engine = CkksEngine(ctx, params)
    encoder = CkksEncoder(N, SCALE)
    rng = make_rng(42)

    sk = engine.generate_secret_key(rng)
    pk = engine.generate_public_key(sk, rng)
    ladder = KeyLadder(ctx, sk, 3.2, rng, lazy=True)

    m_rng = np.random.default_rng(7)
    lo = m_rng.uniform(0.0, 0.35, SLOTS)
    hi = lo + m_rng.uniform(0.25, 0.6, SLOTS)
    swap = m_rng.uniform(size=SLOTS) < 0.5
    a = np.where(swap, lo, hi)
    b = np.where(swap, hi, lo)

    ct_a = engine.encrypt(encoder.encode(a, ctx), pk, ctx.total_bits(), rng)
    ct_b = engine.encrypt(encoder.encode(b, ctx), pk, ctx.total_bits(), rng)

    cmp_ct = compare(ladder, params, ct_a, ct_b, g_iters=1, f_iters=2)
    got_cmp = encoder.decode(
        CkksEngine.decrypt(cmp_ct, sk.reduce_to(cmp_ct.ctx))
    )[:SLOTS].real
    err_cmp = float(np.max(np.abs(got_cmp - (a > b).astype(float))))

    mx_ct = eval_max(ladder, params, ct_a, ct_b, g_iters=1, f_iters=2)
    got_mx = encoder.decode(
        CkksEngine.decrypt(mx_ct, sk.reduce_to(mx_ct.ctx))
    )[:SLOTS].real
    err_mx = float(np.max(np.abs(got_mx - np.maximum(a, b))))

    rows = [
        ["slots compared", SLOTS],
        ["margin |a-b| >=", 0.25],
        ["sign iterations", "g_3 x1, f_3 x2 (deg-7 PS each)"],
        ["levels consumed (compare)", ct_a.level - cmp_ct.level],
        ["max |compare err|", f"{err_cmp:.2e}"],
        ["max |max err|", f"{err_mx:.2e}"],
    ]
    print(table(["quantity", "value"], rows))
    check_bound("encrypted compare", err_cmp, 2e-2)
    check_bound("encrypted max", err_mx, 2e-2)


if __name__ == "__main__":
    main()
