"""Fully encrypted matrix x matrix product (beyond-reference showcase).

C = A @ B with BOTH d x d operands encrypted, packed row-major into
d^2 = N/2 slots — the Jiang-Kim-Lauter-Song algorithm (CCS 2018):
permute A by sigma and B by tau (one sparse diagonal linear map each),
then accumulate d column-shift x row-shift products,

    C = sum_k phi^k(sigma(A)) * psi^k(tau(B)),

for d ciphertext-ciphertext multiplies at depth 3 — versus d full
matvecs (d^2 rotations) naively. Every rotation fan here (sigma, tau,
the 2(d-1) column shifts, the d-1 row shifts) shares one hoisted gadget
decomposition. The reference has no matrix workloads at all
(engine.rs:401-463 exposes single rotations only).

Acceptance: max |C_enc - A @ B| <= 1e-3 over all d^2 slots; exit 1
otherwise.
"""

from _common import check_bound, table
import numpy as np

from toy_heaan_ckks_tpu import (
    CkksContext, CkksEncoder, CkksEngine, CkksParams, generate_primes,
)
from toy_heaan_ckks_tpu.keys import KeyLadder
from toy_heaan_ckks_tpu.math.sampling import make_rng
from toy_heaan_ckks_tpu.models.linalg import MatvecKeys, encrypted_matmul

N = 512
D = 16  # D*D == N/2 slots
SCALE = 30
NUM_PRIMES = 5  # JKLS depth 3 + margin


def main():
    ctx = CkksContext.build(generate_primes(SCALE, NUM_PRIMES, N), N)
    params = CkksParams(3.2, N // 2, SCALE)
    engine = CkksEngine(ctx, params)
    encoder = CkksEncoder(N, SCALE)
    rng = make_rng(42)

    sk = engine.generate_secret_key(rng)
    pk = engine.generate_public_key(sk, rng)
    ladder = KeyLadder(ctx, sk, 3.2, rng, lazy=True)
    keys = MatvecKeys(ladder, params, rng)

    m_rng = np.random.default_rng(7)
    a = m_rng.uniform(-1.0, 1.0, (D, D)) / np.sqrt(D)
    b = m_rng.uniform(-1.0, 1.0, (D, D)) / np.sqrt(D)
    expected = a @ b

    ct_a = engine.encrypt(
        encoder.encode(a.reshape(-1), ctx), pk, ctx.total_bits(), rng
    )
    ct_b = engine.encrypt(
        encoder.encode(b.reshape(-1), ctx), pk, ctx.total_bits(), rng
    )

    out = encrypted_matmul(ct_a, ct_b, keys, encoder)
    got = encoder.decode(
        CkksEngine.decrypt(out, sk.reduce_to(out.ctx))
    )[: D * D].real.reshape(D, D)
    err = float(np.max(np.abs(got - expected)))

    rows = [
        ["matrix", f"{D}x{D} (both encrypted)"],
        ["ct-ct multiplies", D],
        ["depth (levels)", ct_a.level - out.level],
        ["hoisted decompositions", 4],
        ["max |err|", f"{err:.2e}"],
    ]
    print(table(["quantity", "value"], rows))
    check_bound("encrypted matmul", err, 1e-3)


if __name__ == "__main__":
    main()
