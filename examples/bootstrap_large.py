"""Production-scale bootstrapping (beyond the reference).

The reference's modulus chain only ever shrinks
(reference src/crypto/engine.rs:255-282): at level 1 a ciphertext is
dead. `examples/bootstrap_demo.py` refreshes one at toy size (N=32);
THIS example demonstrates the refresh at a production ring degree —
N=2^13, all 4096 slots packed — with the machinery that makes that
feasible:

- factored homomorphic DFTs (`dft_levels=3`): CoeffToSlot/SlotToCoeff
  as 3 sparse hoisted matvecs of 16/31/31 diagonals each instead of one
  dense 4096-diagonal matvec (16x fewer rotations AND plaintexts);
- hybrid digit_size=4 key switching for every rotation/relin key;
- per-level rotation-key eviction (each matvec level's keys are used
  exactly once);
- a wide-path scale layout q0 ~ 2^60 > Delta = 2^55 so the sine
  linearization error and the 2^r-amplified EvalMod noise are both
  small (the arcsine correction exists for q0 ~ Delta layouts);
- a scale-matched chain from `utils/params.build_modulus_chain`.

Acceptance: >= MIN_BITS bits of slot precision (-log2(err/max|m|)) on
the refreshed ciphertext, which must come back at a usable level (>= 2)
from a DEAD level-1 input. Exits 1 on violation. Writes a BOOT json
artifact (latency, slots/s, levels recovered, measured precision) when
--json PATH is given.
"""

import argparse
import json
import time

from _common import check_bound, max_abs_err, table
import numpy as np

from toy_heaan_ckks_tpu import (
    CkksContext, CkksEncoder, CkksEngine, CkksParams,
)
from toy_heaan_ckks_tpu.keys import KeyLadder
from toy_heaan_ckks_tpu.math.sampling import make_rng
from toy_heaan_ckks_tpu.models.bootstrap import BootstrapKeys, bootstrap
from toy_heaan_ckks_tpu.utils.params import build_modulus_chain

LOG_N = 13
SCALE = 55  # Delta = 2^55 (wide path: 2-limb Montgomery, q < 2^62)
FIRST_BITS = 60  # q0 ~ 2^60 > Delta: rho = q0/Delta ~ 2^5. Precision
# is set by max(sine linearization (2 pi m/rho)^2/6, key-switch noise
# * 2^r * rho/(2 pi) / Delta): a q0 ~ Delta ~ 2^30 small-prime layout
# caps at ~7 bits (measured, N=2^8); Delta = 2^45 leaves the amplified
# noise at ~12 bits (measured, N=64); Delta = 2^55 pushes the noise
# floor ~10 bits lower so the linearization term (~20 bits at
# mmax=0.01) dominates — the production layout (HEAAN-RNS/Lattigo).
DEPTH = 27  # chain q0 + 27 scale primes; refresh consumes 23
HW = 8  # sparse secret: K = ceil((1+hw)/2 + 1) + 1 = 7
R_DBL, CHEB_DEG = 7, 8  # EvalMod double-angle steps / Chebyshev degree
DFT_LEVELS = 3  # 12 butterfly stages -> 3 groups of 4 per DFT
MMAX = 0.01  # message magnitude
MIN_BITS = 12.0  # acceptance: slot precision in bits


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log-n", type=int, default=LOG_N)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    n = 1 << args.log_n
    slots = n // 2
    plan = build_modulus_chain(n, SCALE, DEPTH, first_bits=FIRST_BITS)
    full = CkksContext.build(list(plan.moduli), n)
    ctx1 = full.slice_channels(0, 1)
    params = CkksParams(3.2, HW, SCALE)
    rng = make_rng(42)

    t0 = time.time()
    eng_full = CkksEngine(full, params)
    sk = eng_full.generate_secret_key(rng)
    sk1 = sk.reduce_to(ctx1)
    eng1 = CkksEngine(ctx1, params)
    pk1 = eng1.generate_public_key(sk1, rng)
    ladder = KeyLadder(full, sk, 3.2, rng, lazy=True, digit_size=4)
    # evict=False: keep all ~150 rotation keys (~5 GB at N=2^13 ds=4)
    # resident so the second refresh is keygen-free
    bkeys = BootstrapKeys(ladder, params, rng, digit_size=4, evict=False)
    encoder = CkksEncoder(n, SCALE)
    print(f"setup: N=2^{args.log_n}, chain {len(plan.moduli)} x ~{SCALE}b "
          f"(logQ={plan.total_bits}), hw={HW}, ds=4  "
          f"[{time.time()-t0:.1f}s]")

    rng2 = np.random.default_rng(7)
    values = rng2.uniform(-MMAX, MMAX, slots)
    ct1 = eng1.encrypt(
        encoder.encode(values, ctx1), pk1, ctx1.total_bits(), rng
    )
    print(f"exhausted ciphertext: level={ct1.level} logq={ct1.logq}")

    # first refresh: pays all key generation + jit compilation
    t1 = time.time()
    out = bootstrap(
        ct1, full, bkeys, params, encoder, r=R_DBL, deg=CHEB_DEG,
        dft_levels=DFT_LEVELS,
    )
    cold = time.time() - t1
    print(f"bootstrapped (cold):  level={out.level} logq={out.logq}  "
          f"[{cold:.1f}s incl. keygen+compile]")

    # second refresh on a fresh message: warm latency (keys cached by
    # the ladder where reusable, composites compiled)
    values2 = rng2.uniform(-MMAX, MMAX, slots)
    ct2 = eng1.encrypt(
        encoder.encode(values2, ctx1), pk1, ctx1.total_bits(), rng
    )
    t2 = time.time()
    out2 = bootstrap(
        ct2, full, bkeys, params, encoder, r=R_DBL, deg=CHEB_DEG,
        dft_levels=DFT_LEVELS,
    )
    warm = time.time() - t2
    print(f"bootstrapped (warm):  level={out2.level}  [{warm:.1f}s]")

    got = encoder.decode(
        CkksEngine.decrypt(out, sk.reduce_to(out.ctx))
    )[:slots].real
    got2 = encoder.decode(
        CkksEngine.decrypt(out2, sk.reduce_to(out2.ctx))
    )[:slots].real
    err = max(max_abs_err(values, got), max_abs_err(values2, got2))
    bits = -np.log2(err / MMAX)

    print(table(
        ["slot", "expected", "refreshed", "error"],
        [
            [i, f"{e:.8f}", f"{o:.8f}", f"{abs(e - o):.2e}"]
            for i, (e, o) in enumerate(zip(values[:6], got[:6]))
        ],
    ))
    print(f"slot precision: {bits:.1f} bits over {slots} slots "
          f"(max err {err:.2e} vs |m| <= {MMAX})")
    print(f"levels recovered: 1 -> {out.level} "
          f"({out.level - 1} usable multiplications granted)")
    print(f"throughput (warm): {slots / warm:.0f} slots/s")

    if args.json:
        with open(args.json, "w") as f:
            json.dump({
                "log_n": args.log_n, "slots": slots,
                "chain_primes": len(plan.moduli),
                "log_qp": plan.total_bits,
                "hw": HW, "digit_size": 4,
                "r": R_DBL, "cheb_deg": CHEB_DEG,
                "dft_levels": DFT_LEVELS, "arcsine": False,
                "refresh_latency_cold_s": round(cold, 2),
                "refresh_latency_warm_s": round(warm, 2),
                "slots_per_s_warm": round(slots / warm, 1),
                "level_in": 1, "level_out": out.level,
                "precision_bits": round(float(bits), 2),
                "max_err": float(err), "mmax": MMAX,
            }, f, indent=1)
        print(f"wrote {args.json}")

    assert out.level >= 2, "refresh must return a usable level"
    check_bound(
        "bootstrap precision (bits)", MIN_BITS - float(bits), 0.0
    )


if __name__ == "__main__":
    main()
