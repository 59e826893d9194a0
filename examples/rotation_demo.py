"""Slot rotation demo (reference: examples/rotation_demo.rs).

encode([1..16]) -> encrypt -> rotate(+1) -> add(original) -> rotate(+2)
-> decrypt -> verify, bound 1e-4. N=32, three 30-bit primes, Delta=2^58.
Rotation is level-free: logp/logq are unchanged.
"""

from _common import check_bound, max_abs_err, table
import numpy as np

from toy_heaan_ckks_tpu import (
    CkksContext, CkksEncoder, CkksEngine, CkksParams, generate_primes,
)
from toy_heaan_ckks_tpu.math.sampling import make_rng

N = 32
SLOTS = 16
SCALE = 58


def rotate_vec(v, k):
    return np.roll(v, -k)


def main():
    primes = generate_primes(30, 3, N)
    ctx = CkksContext.build(primes, N)
    engine = CkksEngine(ctx, CkksParams(3.2, N // 2, SCALE))
    encoder = CkksEncoder(N, SCALE)
    rng = make_rng(42)

    sk = engine.generate_secret_key(rng)
    pk = engine.generate_public_key(sk, rng)
    rotk1 = engine.generate_gadget_rotation_key(sk, 1, rng)
    rotk2 = engine.generate_gadget_rotation_key(sk, 2, rng)

    values = np.arange(1.0, SLOTS + 1)
    ct = engine.encrypt(encoder.encode(values, ctx), pk, ctx.total_bits(), rng)

    ct_rot1 = CkksEngine.rotate_ciphertext(ct, rotk1)
    print(f"rotate(+1): logp={ct_rot1.logp} logq={ct_rot1.logq} (level-free)")
    ct_added = CkksEngine.add_ciphertexts(ct, ct_rot1)
    ct_result = CkksEngine.rotate_ciphertext(ct_added, rotk2)

    expected = rotate_vec(values + rotate_vec(values, 1), 2)
    out = encoder.decode(CkksEngine.decrypt(ct_result, sk))[:SLOTS]

    print(table(
        ["slot", "expected", "decrypted", "error"],
        [
            [i, e, f"{o:.8f}", f"{abs(e-o):.2e}"]
            for i, (e, o) in enumerate(zip(expected, out))
        ],
    ))
    check_bound("rotate/add/rotate", max_abs_err(expected, out), 1e-4)


if __name__ == "__main__":
    main()
