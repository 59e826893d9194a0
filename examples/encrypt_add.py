"""Encrypt -> homomorphic add -> decrypt (reference: examples/encrypt_add.rs).

N=16, three 31-bit primes, Delta=2^30. Error bound is the physically
derived 2 * 10*sigma*sqrt(hw*N)/Delta + 8/Delta for a sum of two fresh
encryptions.
"""

from _common import check_bound, max_abs_err, table
import numpy as np

from toy_heaan_ckks_tpu import (
    CkksContext, CkksEncoder, CkksEngine, CkksParams, generate_primes,
)
from toy_heaan_ckks_tpu.math.sampling import make_rng

DEGREE = 16
SCALE_BITS = 30
HAMMING = 8
SIGMA = 3.2


def main():
    primes = generate_primes(31, 3, DEGREE)
    ctx = CkksContext.build(primes, DEGREE)
    engine = CkksEngine(ctx, CkksParams(SIGMA, HAMMING, SCALE_BITS))
    encoder = CkksEncoder(DEGREE, SCALE_BITS)
    rng = make_rng(42)

    sk = engine.generate_secret_key(rng)
    pk = engine.generate_public_key(sk, rng)

    a = np.array([1.5, 2.5, -3.0, 0.25, 1.0, -0.5, 0.75, -1.25])
    b = np.array([0.5, -1.0, 2.0, 1.75, -0.25, 0.5, -0.5, 1.0])
    logq = ctx.total_bits()

    ct_a = engine.encrypt(encoder.encode(a, ctx), pk, logq, rng)
    ct_b = engine.encrypt(encoder.encode(b, ctx), pk, logq, rng)
    ct_sum = CkksEngine.add_ciphertexts(ct_a, ct_b)
    out = encoder.decode(CkksEngine.decrypt(ct_sum, sk))[: len(a)]

    print(table(
        ["slot", "a", "b", "a+b", "decrypted", "error"],
        [
            [i, x, y, x + y, f"{o:.8f}", f"{abs(x+y-o):.2e}"]
            for i, (x, y, o) in enumerate(zip(a, b, out))
        ],
    ))

    delta = 2.0**SCALE_BITS
    bound = 2 * (10 * SIGMA * np.sqrt(HAMMING * DEGREE) / delta) + 8 / delta
    check_bound("encrypt+add+decrypt", max_abs_err(a + b, out), bound)


if __name__ == "__main__":
    main()
