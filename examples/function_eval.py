"""Homomorphic smooth-function evaluation (beyond the reference).

Evaluates sigmoid, exp, and 1/x on ENCRYPTED inputs with the
Paterson-Stockmeyer Chebyshev evaluator (models/funceval.py): a
degree-d interpolant costs ~2*sqrt(d) ciphertext multiplies and
~log2(d) levels — a degree-31 sigmoid fits in an 11-prime chain that
the linear recurrence (one level per degree) could never traverse.

Acceptance style mirrors the reference's executable examples (bound
check + exit 1 on violation, reference examples/horner_chain.rs:296-317);
the bound is the measured plain interpolation error plus a CKKS noise
margin.
"""

import numpy as np
from _common import check_bound, max_abs_err, table

from toy_heaan_ckks_tpu import (
    CkksContext, CkksEncoder, CkksEngine, CkksParams, generate_primes,
)
from toy_heaan_ckks_tpu.keys import KeyLadder
from toy_heaan_ckks_tpu.math.sampling import make_rng
from toy_heaan_ckks_tpu.models.funceval import (
    chebyshev_fit,
    eval_function,
)

N = 64
SLOTS = N // 2
SCALE = 30  # == prime bit width (the PS scale rule)
CHAIN = 11


def run_case(name, f, interval, degree, xs, eng, ladder, params, enc,
             pk, sk, ctx, rng):
    ct = eng.encrypt(enc.encode(xs, ctx), pk, ctx.total_bits(), rng)
    out = eval_function(ladder, params, ct, f, interval, degree)
    got = enc.decode(
        CkksEngine.decrypt(out, sk.reduce_to(out.ctx))
    )[: len(xs)].real

    # plain interpolant error on the same points sets the honest floor
    a, b = interval
    u = (2 * xs - (a + b)) / (b - a)
    fit = np.polynomial.chebyshev.chebval(u, chebyshev_fit(f, a, b, degree))
    fit_err = float(np.max(np.abs(fit - f(xs))))
    err = max_abs_err(f(xs), got)
    bound = fit_err + 2e-3  # CKKS noise margin
    levels_used = CHAIN - 1 - out.level
    return got, err, bound, fit_err, levels_used


def main():
    ctx = CkksContext.build(generate_primes(SCALE, CHAIN, N), N)
    params = CkksParams(3.2, 8, SCALE)
    eng = CkksEngine(ctx, params)
    rng = make_rng(77)
    sk = eng.generate_secret_key(rng)
    pk = eng.generate_public_key(sk, rng)
    ladder = KeyLadder(ctx, sk, 3.2, rng, lazy=True)
    enc = CkksEncoder(N, SCALE)

    rng_data = np.random.default_rng(5)
    cases = [
        ("sigmoid", lambda x: 1.0 / (1.0 + np.exp(-x)), (-8.0, 8.0), 31,
         rng_data.uniform(-6, 6, SLOTS)),
        ("exp", np.exp, (-1.0, 1.0), 15,
         rng_data.uniform(-0.9, 0.9, SLOTS)),
        ("inverse", lambda x: 1.0 / x, (0.25, 2.0), 31,
         rng_data.uniform(0.3, 1.9, SLOTS)),
    ]

    rows = []
    oks = []
    for name, f, interval, degree, xs in cases:
        got, err, bound, fit_err, lvl = run_case(
            name, f, interval, degree, xs, eng, ladder, params, enc,
            pk, sk, ctx, rng,
        )
        rows.append(
            [name, degree, f"{fit_err:.2e}", f"{err:.3e}", f"{bound:.2e}",
             lvl]
        )
        oks.append((name, err, bound))

    print(table(
        ["function", "cheb deg", "fit err", "enc err", "bound",
         "levels used"],
        rows,
    ))
    for name, err, bound in oks:
        check_bound(f"funceval/{name}", err, bound)


if __name__ == "__main__":
    main()
