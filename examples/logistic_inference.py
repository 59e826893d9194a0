"""Encrypted logistic-regression inference (beyond the reference).

Four patient records (8 features each) are packed into one ciphertext in
32 slots; the server computes sigmoid(w.x + b) per record WITHOUT seeing
the data:

  1. plain-weight multiply  (mul_plain: w/4 folded in, mapping z to [-1,1])
  2. rotation sum tree      (offsets 1,2,4 — each block's slot 0 gets w.x)
  3. + b/4                  (exact-scale constant addition)
  4. sigmoid(4u)            (degree-7 Chebyshev, three-term recurrence)

Combines the framework's slot algorithms (models/algorithms.sum_slots),
Chebyshev evaluation (models/bootstrap.eval_chebyshev) and the KeyLadder.
The acceptance bound is the measured plain Chebyshev-fit error plus a
CKKS noise margin, in the reference's executable-acceptance style
(reference examples/horner_chain.rs:296-317 bound discipline).
"""

import numpy as np
from _common import check_bound, table

from toy_heaan_ckks_tpu import (
    CkksContext, CkksEncoder, CkksEngine, CkksParams, generate_primes,
)
from toy_heaan_ckks_tpu.keys import KeyLadder
from toy_heaan_ckks_tpu.math.sampling import make_rng
from toy_heaan_ckks_tpu.models.algorithms import _add_const, sum_slots
from toy_heaan_ckks_tpu.models.bootstrap import eval_chebyshev

N = 64
SLOTS = N // 2
FEATURES = 8
SAMPLES = SLOTS // FEATURES  # 4 records per ciphertext
SCALE = 31
CHAIN = 11
CHEB_DEG = 7


def main():
    rng_data = np.random.default_rng(17)
    X = rng_data.uniform(-1.0, 1.0, (SAMPLES, FEATURES))
    w = rng_data.uniform(-0.6, 0.6, FEATURES)
    b = 0.25
    z_plain = X @ w + b  # |z| <= 0.6*8 + 0.25 < 4 by construction
    expect = 1.0 / (1.0 + np.exp(-z_plain))

    # sigmoid(z) = f(u), u = z/4 in [-1, 1]; fold the 1/4 into the weights
    cheb = np.polynomial.chebyshev.Chebyshev.interpolate(
        lambda u: 1.0 / (1.0 + np.exp(-4.0 * u)), CHEB_DEG
    )
    fit_err = float(np.max(np.abs(
        cheb(np.linspace(-1, 1, 4001))
        - 1.0 / (1.0 + np.exp(-4.0 * np.linspace(-1, 1, 4001)))
    )))

    ctx = CkksContext.build(generate_primes(SCALE, CHAIN, N), N)
    params = CkksParams(3.2, 4, SCALE)
    eng = CkksEngine(ctx, params)
    rng = make_rng(42)
    sk = eng.generate_secret_key(rng)
    pk = eng.generate_public_key(sk, rng)
    ladder = KeyLadder(ctx, sk, 3.2, rng, rotations=(1, 2, 4), lazy=True)
    enc = CkksEncoder(N, SCALE)

    # pack records into feature blocks; weights tiled to match
    x_slots = X.reshape(-1)
    w_slots = np.tile(w / 4.0, SAMPLES)
    ct = eng.encrypt(enc.encode(x_slots, ctx), pk, ctx.total_bits(), rng)

    prod = CkksEngine.rescale_ciphertext(
        CkksEngine.mul_plain(ct, enc.encode(w_slots, ctx))
    )
    dot = sum_slots(prod, ladder, FEATURES)  # block j's slot 0 = w.x_j / 4
    z = _add_const(
        CkksEngine(ladder.at_level(dot.level).ctx, params), dot, b / 4.0
    )
    sig = eval_chebyshev(ladder, params, z, cheb.coef)

    out = enc.decode(CkksEngine.decrypt(sig, sk.reduce_to(sig.ctx)))
    got = np.array([out[j * FEATURES].real for j in range(SAMPLES)])

    print(table(
        ["record", "z = w.x+b", "sigmoid (plain)", "sigmoid (encrypted)",
         "error"],
        [
            [j, f"{z_plain[j]:+.4f}", f"{expect[j]:.6f}", f"{got[j]:.6f}",
             f"{abs(expect[j] - got[j]):.2e}"]
            for j in range(SAMPLES)
        ],
    ))
    print(f"chebyshev deg-{CHEB_DEG} fit error: {fit_err:.2e}")
    bound = fit_err + 5e-4  # approximation + CKKS noise margin
    check_bound(
        "encrypted logistic inference",
        float(np.max(np.abs(expect - got))),
        bound,
    )


if __name__ == "__main__":
    main()
