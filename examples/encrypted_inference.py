"""Encrypted linear-model inference (beyond-reference showcase).

A server evaluates a linear model y = w . x + b on ENCRYPTED feature
vectors without ever seeing them: plaintext-ciphertext multiply (weights
are public), a rotation sum-tree to reduce the dot product into every
slot, and a plaintext bias add. Batched: many feature vectors ride one
ciphertext batch. The reference has no model workloads (SURVEY.md §2.4);
this composes its building blocks — mul_plain, rescale, rotation keys,
sum_slots — into the canonical private-inference pipeline.
"""

from _common import check_bound, table
import numpy as np

from toy_heaan_ckks_tpu import (
    CkksContext, CkksEncoder, CkksEngine, CkksParams, generate_primes,
)
from toy_heaan_ckks_tpu.keys import KeyLadder
from toy_heaan_ckks_tpu.math.sampling import make_rng
from toy_heaan_ckks_tpu.models import algorithms as alg

N = 64
FEATURES = 16  # one feature vector per 16-slot block
SCALE = 30
NUM_PRIMES = 4


def main():
    primes = generate_primes(SCALE, NUM_PRIMES, N)
    ctx = CkksContext.build(primes, N)
    engine = CkksEngine(ctx, CkksParams(3.2, N // 2, SCALE))
    encoder = CkksEncoder(N, SCALE)
    rng = make_rng(42)

    sk = engine.generate_secret_key(rng)
    pk = engine.generate_public_key(sk, rng)
    ladder = KeyLadder(ctx, sk, 3.2, rng, rotations=(1, 2, 4, 8))

    # the model (public): weights + bias
    w = np.array([0.21, -0.35, 0.12, 0.4, -0.05, 0.3, -0.22, 0.18,
                  0.07, -0.14, 0.26, -0.31, 0.09, 0.33, -0.08, 0.11])
    bias = 0.25

    # the client's private features (normalized)
    rng_np = np.random.default_rng(7)
    x = rng_np.uniform(-1, 1, FEATURES)
    expected = float(w @ x + bias)

    # client: encrypt the feature vector
    ct_x = engine.encrypt(encoder.encode(x, ctx), pk, ctx.total_bits(), rng)

    # server: w .* x (plaintext weights), rescale, rotation sum-tree, + bias
    pt_w = encoder.encode(w, ctx)
    prod = engine.rescale_ciphertext(engine.mul_plain(ct_x, pt_w))
    summed = alg.sum_slots(prod, ladder, FEATURES)

    # encode the bias at the rescaled ciphertext's EXACT scale: scale the
    # values by (true_scale / 2^SCALE) and declare the plaintext's scale
    from toy_heaan_ckks_tpu.types import Plaintext

    bias_vals = np.full(N // 2, bias) * (summed.true_scale / 2.0**SCALE)
    pt_bias = encoder.encode(bias_vals, prod.ctx)
    pt_bias = Plaintext(
        poly=pt_bias.poly, scale_bits=summed.logp, slots=pt_bias.slots,
        scale=summed.true_scale,
    )
    result = engine.add_plain(summed, pt_bias)

    # client: decrypt; slot 0 of the block holds the prediction
    out = encoder.decode(engine.decrypt(result, sk.reduce_to(result.ctx)))
    got = float(out[0])

    print(table(
        ["", "value"],
        [["expected  w.x + b", f"{expected:.6f}"],
         ["homomorphic result", f"{got:.6f}"],
         ["levels used", 1],
         ["rotations", int(np.log2(FEATURES))]],
    ))
    check_bound("encrypted linear inference", abs(got - expected), 1e-3)


if __name__ == "__main__":
    main()
