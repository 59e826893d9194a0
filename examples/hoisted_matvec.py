"""Encrypted matrix-vector product via the diagonal method + hoisted
rotations (beyond-reference showcase).

y = M @ x on an ENCRYPTED x: with d_j the j-th generalized diagonal of M
(d_j[i] = M[i, (i+j) mod n]), y = sum_j d_j * rot_j(x). All n-1 rotations
apply to the SAME ciphertext, so one hoisted gadget decomposition serves
every key, and the whole weighted sum shares ONE P mod-down
(CkksEngine.rotate_weighted_sum_hoisted, double hoisting: the diagonals
are encoded over the extended key basis and multiplied before the
mod-down) — the per-rotation cost drops from a full key switch
(L + D*E channel-NTTs) to a slot gather + two pointwise products. The
reference has no matrix workloads and pays the full key switch per
rotation (engine.rs:429-452).

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

    # ONE hoisted decomposition AND one shared mod-down for all SLOTS-1
    # weighted rotations (double hoisting): the diagonal plaintexts are
    # encoded over the keys' extended basis so the weight multiply
    # happens before the single P mod-down.
    def diag(j):
        return np.array([M[i, (i + j) % SLOTS] for i in range(SLOTS)])

    ext_ctx = rot_keys[0].ext_ctx
    pts_ext = [encoder.encode(diag(j), ext_ctx) for j in range(1, SLOTS)]
    acc = CkksEngine.rotate_weighted_sum_hoisted(ct, rot_keys, pts_ext)
    acc = CkksEngine.add_ciphertexts(
        acc, CkksEngine.mul_plain(ct, encoder.encode(diag(0), ctx))
    )
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
