"""Rotation stress test (reference: examples/rotation_stress.rs).

Applies k = 1..800 chained rotations (reference checkpoints to k=800,
rotation_stress.rs:62-105) and verifies the error stays under a
linear noise model err <= k * per_rot at checkpoints. With hybrid
(special-prime) key switching the per-rotation noise is ~ sqrt(N)*L*sigma/
Delta — far below the reference's ~2e-7 model at the same parameters.
"""

from _common import check_bound, table
import numpy as np

from toy_heaan_ckks_tpu import (
    CkksContext, CkksEncoder, CkksEngine, CkksParams, generate_primes,
)
from toy_heaan_ckks_tpu.math.sampling import make_rng

N = 32
SLOTS = 16
SCALE = 58
CHECKPOINTS = (1, 2, 4, 8, 16, 50, 100, 200, 400, 800)
PER_ROT = 2e-7  # reference's linear noise model (rotation_stress.rs:1-7)


def main():
    primes = generate_primes(30, 3, N)
    ctx = CkksContext.build(primes, N)
    engine = CkksEngine(ctx, CkksParams(3.2, N // 2, SCALE))
    encoder = CkksEncoder(N, SCALE)
    rng = make_rng(42)

    sk = engine.generate_secret_key(rng)
    pk = engine.generate_public_key(sk, rng)
    rotk = engine.generate_gadget_rotation_key(sk, 1, rng)

    values = np.arange(1.0, SLOTS + 1)
    ct = engine.encrypt(encoder.encode(values, ctx), pk, ctx.total_bits(), rng)

    rows = []
    k = 0
    worst_ratio = 0.0
    for target in CHECKPOINTS:
        while k < target:
            ct = CkksEngine.rotate_ciphertext(ct, rotk)
            k += 1
        out = encoder.decode(CkksEngine.decrypt(ct, sk))[:SLOTS]
        expected = np.roll(values, -(k % SLOTS))
        err = float(np.max(np.abs(out - expected)))
        bound = max(k * PER_ROT, 1e-9)
        rows.append([k, f"{err:.2e}", f"{bound:.2e}", err <= bound])
        worst_ratio = max(worst_ratio, err / bound)

    print(table(["rotations", "max err", "bound k*2e-7", "ok?"], rows))
    check_bound("rotation stress (linear noise)", worst_ratio, 1.0)


if __name__ == "__main__":
    main()
