"""Horner-chain over 4096 slots (reference: examples/horner_chain.rs).

Five iterations of x <- x * alpha + beta (5 muls + 5 adds) at N=8192 with
seven 61-bit primes, SCALE=61. The contractive map (alpha=0.8, beta=0.1)
converges toward 0.5; final max error must be <= 1e-5. Every fresh operand
is encrypted at the accumulator's current level/logq, with per-level keys
drawn from the ladder.
"""

from _common import check_bound, max_abs_err
import numpy as np

from toy_heaan_ckks_tpu import (
    CkksContext, CkksEncoder, CkksEngine, CkksParams, generate_primes,
)
from toy_heaan_ckks_tpu.keys import KeyLadder
from toy_heaan_ckks_tpu.math.sampling import make_rng

N = 8192
SLOTS = N // 2
SCALE = 61
ITERS = 5
NUM_PRIMES = ITERS + 2
ALPHA = 0.8
BETA = 0.1


def main():
    primes = generate_primes(SCALE, NUM_PRIMES, N)
    ctx = CkksContext.build(primes, N)
    params = CkksParams(3.2, N // 2, SCALE)
    engine = CkksEngine(ctx, params)
    encoder = CkksEncoder(N, SCALE)
    rng = make_rng(42)

    sk = engine.generate_secret_key(rng)
    pk = engine.generate_public_key(sk, rng)
    print("generating per-level key ladder ...")
    ladder = KeyLadder(ctx, sk, 3.2, rng)

    x0 = np.linspace(0.0, 1.0, SLOTS)
    expected = x0.copy()
    for _ in range(ITERS):
        expected = expected * ALPHA + BETA

    logq = ctx.total_bits()
    ct = engine.encrypt(encoder.encode(x0, ctx), pk, logq, rng)

    for it in range(ITERS):
        lvl = ladder.at_level(ct.level)
        eng = CkksEngine(lvl.ctx, params)
        # encrypt alpha and beta fresh at the current level / logq
        pt_alpha = encoder.encode(np.full(SLOTS, ALPHA), lvl.ctx)
        ct_alpha = eng.encrypt(pt_alpha, lvl.pk, ct.logq, rng)
        ct = CkksEngine.rescale_ciphertext(
            CkksEngine.mul_ciphertexts_gadget(ct, ct_alpha, lvl.rlk)
        )
        lvl2 = ladder.at_level(ct.level)
        eng2 = CkksEngine(lvl2.ctx, params)
        pt_beta = encoder.encode(np.full(SLOTS, BETA), lvl2.ctx)
        ct_beta = eng2.encrypt(pt_beta, lvl2.pk, ct.logq, rng)
        ct = CkksEngine.add_ciphertexts(ct, ct_beta)
        print(f"iter {it+1}: level={ct.level} logp={ct.logp} logq={ct.logq}")

    sk_final = sk.reduce_to(ct.ctx)
    out = encoder.decode(CkksEngine.decrypt(ct, sk_final))[:SLOTS]
    err = max_abs_err(expected, out)
    print(f"\nfixed point beta/(1-alpha) = {BETA/(1-ALPHA):.3f}; "
          f"mean decoded = {np.mean(out):.6f}")
    check_bound("horner chain (5 mul + 5 add, 4096 slots)", err, 1e-5)


if __name__ == "__main__":
    main()
