"""Encrypted matrix-vector product via the diagonal method + hoisted
rotations (beyond-reference showcase).

y = M @ x on an ENCRYPTED x: with d_j the j-th generalized diagonal of M
(d_j[i] = M[i, (i+j) mod n]), y = sum_j d_j * rot_j(x). All n-1 rotations
apply to the SAME ciphertext, so one hoisted gadget decomposition serves
every key (CkksEngine.rotate_hoisted) — the per-rotation cost drops from
a full key switch (L + D*E channel-NTTs) to a slot gather + pointwise key
product + mod-down. The reference has no matrix workloads and pays the
full key switch per rotation (engine.rs:429-452).

Acceptance: max |y_enc - M @ x| <= 1e-3 over all slots; exit 1 otherwise.
"""

from _common import check_bound, table
import numpy as np

from toy_heaan_ckks_tpu import (
    CkksContext, CkksEncoder, CkksEngine, CkksParams, generate_primes,
)
from toy_heaan_ckks_tpu.math.sampling import make_rng

N = 64
SLOTS = N // 2
SCALE = 30
NUM_PRIMES = 3


def main():
    primes = generate_primes(SCALE, NUM_PRIMES, N)
    ctx = CkksContext.build(primes, N)
    engine = CkksEngine(ctx, CkksParams(3.2, N // 2, SCALE))
    encoder = CkksEncoder(N, SCALE)
    rng = make_rng(42)

    sk = engine.generate_secret_key(rng)
    pk = engine.generate_public_key(sk, rng)
    rot_keys = [
        engine.generate_gadget_rotation_key(sk, j, rng)
        for j in range(1, SLOTS)
    ]

    m_rng = np.random.default_rng(7)
    M = m_rng.uniform(-0.5, 0.5, (SLOTS, SLOTS))
    x = m_rng.uniform(-1.0, 1.0, SLOTS)
    expected = M @ x

    ct = engine.encrypt(encoder.encode(x, ctx), pk, ctx.total_bits(), rng)

    # ONE hoisted decomposition -> all SLOTS-1 rotations of ct
    rotated = CkksEngine.rotate_hoisted(ct, rot_keys)

    def diag_pt(j):
        d = np.array([M[i, (i + j) % SLOTS] for i in range(SLOTS)])
        return encoder.encode(d, ctx)

    acc = CkksEngine.mul_plain(ct, diag_pt(0))
    for j in range(1, SLOTS):
        term = CkksEngine.mul_plain(rotated[j - 1], diag_pt(j))
        acc = CkksEngine.add_ciphertexts(acc, term)
    acc = CkksEngine.rescale_ciphertext(acc)

    out = encoder.decode(CkksEngine.decrypt(acc, sk.reduce_to(acc.ctx)))
    out = out[:SLOTS]
    err = float(np.max(np.abs(out - expected)))

    rows = [
        ["matrix", f"{SLOTS}x{SLOTS}"],
        ["rotations", SLOTS - 1],
        ["decompositions (hoisted)", 1],
        ["decompositions (naive)", SLOTS - 1],
        ["max |err|", f"{err:.2e}"],
    ]
    print(table(["quantity", "value"], rows))
    check_bound("hoisted matvec", err, 1e-3)


if __name__ == "__main__":
    main()
