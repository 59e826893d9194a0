"""Encrypted standard deviation over 16 sensor readings
(reference: examples/std_dev_8.rs + specs/ctx.md — a scaffold upstream;
fully working here thanks to special-prime key switching).

One ciphertext holds 16 normalized readings; the pipeline computes
sum -> mean -> centered -> squared -> variance -> polynomial sqrt,
entirely homomorphically (5 levels + level-free rotations).
"""

from _common import check_bound, table
import numpy as np

from toy_heaan_ckks_tpu import (
    CkksContext, CkksEncoder, CkksEngine, CkksParams, generate_primes,
)
from toy_heaan_ckks_tpu.keys import KeyLadder
from toy_heaan_ckks_tpu.math.sampling import make_rng
from toy_heaan_ckks_tpu.models import algorithms as alg

N = 32
SLOTS = 16
SCALE = 30
NUM_PRIMES = 7  # 5 levels consumed + 2 headroom (specs/ctx.md)


def main():
    primes = generate_primes(SCALE, NUM_PRIMES, N)
    ctx = CkksContext.build(primes, N)
    params = CkksParams(3.2, N // 2, SCALE)
    engine = CkksEngine(ctx, params)
    encoder = CkksEncoder(N, SCALE)
    rng = make_rng(42)

    sk = engine.generate_secret_key(rng)
    pk = engine.generate_public_key(sk, rng)
    print("generating key ladder (rotations 1,2,4,8 at every level) ...")
    ladder = KeyLadder(ctx, sk, 3.2, rng, rotations=(1, 2, 4, 8))

    # synthetic minute of sensor data: sine + noise, normalized to [0, 1]
    t = np.arange(SLOTS)
    readings = 0.5 + 0.3 * np.sin(t / 3.0) + 0.05 * np.cos(t * 1.7)
    readings = np.clip(readings, 0.0, 1.0)
    true_std = float(np.std(readings))

    ct = engine.encrypt(encoder.encode(readings, ctx), pk, ctx.total_bits(), rng)
    ct_std = alg.encrypted_std_dev(ladder, params, ct, SLOTS)
    print(f"output: level={ct_std.level} logp={ct_std.logp} logq={ct_std.logq}")

    sk_red = sk.reduce_to(ct_std.ctx)
    out = encoder.decode(CkksEngine.decrypt(ct_std, sk_red))[:SLOTS]

    print(table(
        ["slot", "decrypted std", "true std", "error"],
        [
            [i, f"{o:.6f}", f"{true_std:.6f}", f"{abs(o-true_std):.2e}"]
            for i, o in list(enumerate(out))[:8]
        ],
    ))
    err = float(np.max(np.abs(out - true_std)))
    # dominated by the degree-3 sqrt approximation (~1e-2 worst case)
    check_bound("encrypted std-dev (16 slots)", err, 0.03)


if __name__ == "__main__":
    main()
