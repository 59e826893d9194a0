"""CKKS encode/decode roundtrip demo (reference: examples/encode_decode.rs).

N=16, three 31-bit NTT primes. Verifies the canonical-embedding roundtrip
error is ~2/Delta and sweeps the scale to show error ~ 1/Delta.
"""

from _common import check_bound, max_abs_err, table
import numpy as np

from toy_heaan_ckks_tpu import CkksContext, CkksEncoder, generate_primes

DEGREE = 16
SCALE_BITS = 30


def main():
    primes = generate_primes(31, 3, DEGREE)
    ctx = CkksContext.build(primes, DEGREE)
    print(f"RNS basis: {primes} (logq = {ctx.total_bits()})\n")

    encoder = CkksEncoder(DEGREE, SCALE_BITS)
    values = np.array([1.5, -2.25, 3.75, 0.5, -0.125, 2.0, -1.0, 0.25])
    pt = encoder.encode(values, ctx)
    decoded = encoder.decode(pt)

    print(table(
        ["slot", "input", "decoded", "error"],
        [
            [i, f"{v:.6f}", f"{d:.6f}", f"{abs(v-d):.2e}"]
            for i, (v, d) in enumerate(zip(values, decoded))
        ],
    ))
    err = max_abs_err(values, decoded)
    check_bound("encode/decode roundtrip", err, 2.0 / 2.0**SCALE_BITS)

    # scale sweep on pi (reference encode_decode.rs:127-149)
    print("\nScale sweep on pi:")
    rows = []
    for bits in (10, 20, 30, 40):
        enc = CkksEncoder(DEGREE, bits)
        out = enc.decode(enc.encode([np.pi], ctx))[0]
        rows.append([bits, f"{out:.10f}", f"{abs(out - np.pi):.2e}"])
        assert abs(out - np.pi) < 4 / 2.0**bits
    print(table(["scale_bits", "decoded pi", "error"], rows))
    print("\nAll encode/decode checks passed.")


if __name__ == "__main__":
    main()
