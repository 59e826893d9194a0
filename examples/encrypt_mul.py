"""Encrypt -> ct x ct multiply (gadget relin) -> rescale -> decrypt
(reference: examples/encrypt_mul.rs). N=16, four 31-bit primes; bound 1e-4.
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


def main():
    primes = generate_primes(31, 4, DEGREE)
    ctx = CkksContext.build(primes, DEGREE)
    engine = CkksEngine(ctx, CkksParams(3.2, HAMMING, SCALE_BITS))
    encoder = CkksEncoder(DEGREE, SCALE_BITS)
    rng = make_rng(42)

    sk = engine.generate_secret_key(rng)
    pk = engine.generate_public_key(sk, rng)
    rlk = engine.generate_gadget_relin_key(sk, rng)

    a = np.array([1.5, -0.5, 0.75, 0.25])
    b = np.array([0.5, 2.0, -1.0, 0.125])
    logq = ctx.total_bits()

    ct_a = engine.encrypt(encoder.encode(a, ctx), pk, logq, rng)
    ct_b = engine.encrypt(encoder.encode(b, ctx), pk, logq, rng)

    ct_prod = CkksEngine.mul_ciphertexts_gadget(ct_a, ct_b, rlk)
    print(f"after mul:     logp={ct_prod.logp} logq={ct_prod.logq} "
          f"level={ct_prod.level}")
    ct_rs = CkksEngine.rescale_ciphertext(ct_prod)
    print(f"after rescale: logp={ct_rs.logp} logq={ct_rs.logq} "
          f"level={ct_rs.level}\n")

    sk_red = sk.reduce_to(ct_rs.ctx)
    out = encoder.decode(CkksEngine.decrypt(ct_rs, sk_red))[: len(a)]

    print(table(
        ["slot", "a", "b", "a*b", "decrypted", "error"],
        [
            [i, x, y, x * y, f"{o:.8f}", f"{abs(x*y-o):.2e}"]
            for i, (x, y, o) in enumerate(zip(a, b, out))
        ],
    ))
    check_bound("mul+relin+rescale", max_abs_err(a * b, out), 1e-4)


if __name__ == "__main__":
    main()
