"""Bootstrapping demo (beyond the reference).

The reference's modulus chain only ever shrinks (engine.rs:255-282): at
level 1 a ciphertext is dead. This demo refreshes one — encrypt at an
EXHAUSTED level-1 basis, bootstrap (raise -> CoeffToSlot -> EvalMod ->
SlotToCoeff), then prove the refreshed ciphertext is alive by running a
homomorphic multiply on it.

N=32, 17 x 31-bit chain, sparse secret (hw=2). The recovered message
must match within the sine-approximation bound; the post-bootstrap
square must match within ordinary CKKS mult noise.
"""

from _common import check_bound, max_abs_err, table
import numpy as np

from toy_heaan_ckks_tpu import (
    CkksContext, CkksEncoder, CkksEngine, CkksParams, generate_primes,
)
from toy_heaan_ckks_tpu.keys import KeyLadder
from toy_heaan_ckks_tpu.math.sampling import make_rng
from toy_heaan_ckks_tpu.models.bootstrap import BootstrapKeys, bootstrap

N = 32
SLOTS = N // 2
SCALE = 31
CHAIN = 17
HW = 2
R_DBL, CHEB_DEG = 5, 6  # EvalMod double-angle steps / Chebyshev degree


def main():
    full = CkksContext.build(generate_primes(SCALE, CHAIN, N), N)
    ctx1 = full.slice_channels(0, 1)
    params = CkksParams(3.2, HW, SCALE)
    rng = make_rng(42)

    eng_full = CkksEngine(full, params)
    sk = eng_full.generate_secret_key(rng)
    sk1 = sk.reduce_to(ctx1)
    eng1 = CkksEngine(ctx1, params)
    pk1 = eng1.generate_public_key(sk1, rng)
    ladder = KeyLadder(full, sk, 3.2, rng, lazy=True)
    bkeys = BootstrapKeys(ladder, params, rng)
    encoder = CkksEncoder(N, SCALE)

    values = np.linspace(-0.02, 0.02, SLOTS)
    ct1 = eng1.encrypt(
        encoder.encode(values, ctx1), pk1, ctx1.total_bits(), rng
    )
    print(f"exhausted ciphertext: level={ct1.level} logq={ct1.logq}")

    # giant=4 forces the baby-step/giant-step matvec: (4-1) baby +
    # (N/8 - 1) giant rotation keys instead of the dense N/2 - 1 per
    # matvec level — the difference between an infeasible and a
    # practical bootstrap key set at production degrees.
    out = bootstrap(
        ct1, full, bkeys, params, encoder, r=R_DBL, deg=CHEB_DEG, giant=4
    )
    n_rot = len(bkeys._rot)
    print(f"bootstrapped:         level={out.level} logq={out.logq}")
    print(f"BSGS rotation keys:   {n_rot} (dense method would need "
          f"{2 * (SLOTS - 1)} across the two matvec levels)")
    assert out.level > ct1.level

    got = encoder.decode(
        CkksEngine.decrypt(out, sk.reduce_to(out.ctx))
    )[:SLOTS]
    print(table(
        ["slot", "expected", "refreshed", "error"],
        [
            [i, f"{e:.6f}", f"{o:.6f}", f"{abs(e - o):.2e}"]
            for i, (e, o) in enumerate(zip(values[:6], got[:6]))
        ],
    ))
    check_bound("bootstrap recovery", max_abs_err(values, got), 2e-3)

    # the refreshed ciphertext is ALIVE: square it homomorphically
    rlk = ladder.at_level(out.level).rlk
    sq = CkksEngine.rescale_ciphertext(CkksEngine.square_ciphertext(out, rlk))
    got_sq = encoder.decode(
        CkksEngine.decrypt(sq, sk.reduce_to(sq.ctx))
    )[:SLOTS]
    check_bound(
        "post-bootstrap square", max_abs_err(values**2, got_sq), 2e-4
    )


if __name__ == "__main__":
    main()
