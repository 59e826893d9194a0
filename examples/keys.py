"""Key generation demo: verifies the RLWE key relations
(reference: examples/keys.rs).

- public key:  b + a*s ~ e (small)
- relin key:   b + a*s - s^2 ~ e (small)
- rotation:    b + a*s - s(X^{5^k}) ~ e (small)
"""

from _common import table
import numpy as np

from toy_heaan_ckks_tpu import CkksContext, CkksEngine, CkksParams, generate_primes
from toy_heaan_ckks_tpu.math.sampling import make_rng

DEGREE = 16
HAMMING = 8


def main():
    primes = generate_primes(31, 3, DEGREE)
    ctx = CkksContext.build(primes, DEGREE)
    engine = CkksEngine(ctx, CkksParams(3.2, HAMMING, 30))
    rng = make_rng(42)

    sk = engine.generate_secret_key(rng)
    pk = engine.generate_public_key(sk, rng)
    rlk = engine.generate_relinearization_key(sk, rng)
    rotk = engine.generate_rotation_key(sk, 1, rng)

    coeffs = sk.poly.to_coeffs()
    nonzero = [int(c) for c in coeffs if c != 0]
    print(f"secret key: hamming weight {len(nonzero)} (target {HAMMING}), "
          f"values in {sorted(set(nonzero))}")
    assert len(nonzero) == HAMMING
    assert set(nonzero) <= {-1, 1}

    rows = []
    ok = True

    res_pk = (pk.b + pk.a * sk.poly).to_coeffs()
    m = max(abs(int(x)) for x in res_pk)
    rows.append(["public key", "b + a*s", m, m < 32])
    ok &= m < 32

    s_sq = sk.poly * sk.poly
    res_rlk = (rlk.b + rlk.a * sk.poly - s_sq).to_coeffs()
    m = max(abs(int(x)) for x in res_rlk)
    rows.append(["relin key", "b + a*s - s^2", m, m < 32])
    ok &= m < 32

    s_k = sk.poly.rotate_slots(1).to_ntt_domain()
    res_rot = (rotk.b + rotk.a * sk.poly - s_k).to_coeffs()
    m = max(abs(int(x)) for x in res_rot)
    rows.append(["rotation key", "b + a*s - s(X^5)", m, m < 32])
    ok &= m < 32

    print(table(["key", "relation", "max |residual|", "small?"], rows))
    if not ok:
        raise SystemExit(1)
    print("\nAll key relations verified.")


if __name__ == "__main__":
    main()
