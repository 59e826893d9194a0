"""On-device A/B regression harness: Pallas vs staged-jnp, bit-exact.

Runs every core composite compiled on the real chip twice — once with the
fused Pallas kernels (CKKS_DISABLE_PALLAS unset) and once on the staged
jnp path (CKKS_DISABLE_PALLAS=1) — and asserts uint32 residue equality
across a configuration matrix. This extends the repo's interpret-mode
oracle tests (the reference's oracle discipline,
src/rings/backends/rns_ntt/poly.rs:960-975) to the actual compiled
artifacts on hardware.

Each arm runs in a fresh subprocess: the kernel dispatch is baked into jit
traces at first call, so flipping the env var inside one process would
silently compare a path against itself.

Usage:
    python tools/ab_check.py             # full matrix
    python tools/ab_check.py --quick     # one small + one wide config
    python tools/ab_check.py --json OUT  # write a result artifact

Composites covered per config: forward/inverse NTT, fused batched
mul+relin+rescale, sequential engine mul (gadget) + rescale, rotation via
gadget key switch, hoisted rotation (single-decomposition multi-rotate,
double-hoisted sum, double-hoisted weighted sum — the bootstrap/linalg
hot paths whose lo-plane branches only execute on TPU), square, and
conjugation.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

CONFIGS = [
    # name, degree, bits, count, digit_size
    ("small-2^10-30b-ds1", 1 << 10, 30, 4, 1),
    ("small-2^12-30b-ds2", 1 << 12, 30, 6, 2),
    ("small-2^14-31b-ds4", 1 << 14, 31, 8, 4),
    ("small-2^15-30b-ds1", 1 << 15, 30, 4, 1),
    ("small-2^16-29b-ds1", 1 << 16, 29, 3, 1),  # factored-twiddle NTT
    ("wide-2^10-40b-ds1", 1 << 10, 40, 4, 1),
    ("wide-2^13-61b-ds1", 1 << 13, 61, 3, 1),
    ("wide-2^13-61b-ds2", 1 << 13, 61, 4, 2),
    ("wide-2^14-62b-ds1", 1 << 14, 62, 2, 1),
    ("wide-2^15-61b-ds1", 1 << 15, 61, 3, 1),  # factored wide NTT
]
QUICK = {"small-2^12-30b-ds2", "wide-2^13-61b-ds1"}

_RUNNER = r"""
import os, sys, numpy as np
degree, bits, count, digit_size, out_path = (
    int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]),
    sys.argv[5],
)
import jax
jax.config.update(
    "jax_compilation_cache_dir", os.path.join(os.getcwd(), ".jax_cache")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
import jax.numpy as jnp
from toy_heaan_ckks_tpu import (CkksContext, CkksEngine, CkksParams,
                                generate_primes)
from toy_heaan_ckks_tpu.math.sampling import make_rng
from toy_heaan_ckks_tpu.ops import poly as pops
from toy_heaan_ckks_tpu.ops.poly import Poly
from toy_heaan_ckks_tpu.parallel.sharded import batched_mul_relin_rescale

ctx = CkksContext.build(generate_primes(bits, count, degree), degree)
eng = CkksEngine(ctx, CkksParams(3.2, degree // 2, bits))
rng = make_rng(1234)
sk = eng.generate_secret_key(rng)
rlk = eng.generate_gadget_relin_key(sk, rng, digit_size=digit_size)
rotk = eng.generate_gadget_rotation_key(sk, 1, rng, digit_size=digit_size)

out = {}
p = Poly.sample_uniform(ctx, make_rng(7))
f = pops.to_ntt(p.data, ctx)
out["ntt_fwd"] = np.asarray(f)
out["ntt_inv"] = np.asarray(pops.to_coeff(f, ctx))

# fused batched multiply + relin + rescale (batch 2)
args = [
    jnp.stack([
        Poly.sample_uniform(ctx, make_rng(10 * s + i)).to_ntt_domain().data
        for i in range(2)
    ])
    for s in range(4)
]
o0, o1 = batched_mul_relin_rescale(
    (args[0], args[1]), (args[2], args[3]), rlk, ctx, ctx.drop_last(1)
)
out["fused_mul0"] = np.asarray(o0)
out["fused_mul1"] = np.asarray(o1)

# sequential engine multiply (gadget) — separate key-switch + rescale path
from toy_heaan_ckks_tpu.types import Ciphertext
mk = lambda s: Ciphertext(
    c0=Poly(args[0][s % 2], ctx, True), c1=Poly(args[1][s % 2], ctx, True),
    logp=bits, logq=ctx.total_bits(),
)
ct = CkksEngine.rescale_ciphertext(
    CkksEngine.mul_ciphertexts_gadget(mk(0), mk(1), rlk)
)
out["seq_mul0"] = np.asarray(ct.c0.data)
out["seq_mul1"] = np.asarray(ct.c1.data)

# rotation (gadget key switch)
cr = CkksEngine.rotate_ciphertext(mk(0), rotk)
out["rot0"] = np.asarray(cr.c0.data)
out["rot1"] = np.asarray(cr.c1.data)

# hoisted composites (bootstrap/linalg hot paths): their small_fast
# lo-plane branches execute ONLY on TPU, so on-chip A/B is the only
# place they are ever bit-compared against the generic branch
rotk2 = eng.generate_gadget_rotation_key(sk, 2, rng, digit_size=digit_size)
cjk = eng.generate_conjugation_key(sk, rng, digit_size=digit_size)

hs = CkksEngine.rotate_hoisted(mk(0), [rotk, rotk2])
for i, c in enumerate(hs):
    out[f"hoist{i}_0"] = np.asarray(c.c0.data)
    out[f"hoist{i}_1"] = np.asarray(c.c1.data)

srot = CkksEngine.rotate_sum_hoisted(mk(0), [rotk, rotk2])
out["hsum0"] = np.asarray(srot.c0.data)
out["hsum1"] = np.asarray(srot.c1.data)

from toy_heaan_ckks_tpu import CkksEncoder
enc = CkksEncoder(degree, bits)
rng2 = np.random.default_rng(99)
diags = rng2.uniform(-1, 1, (2, degree // 2)) + 1j * rng2.uniform(
    -1, 1, (2, degree // 2)
)
pts = [enc.encode_complex(d, rotk.ext_ctx) for d in diags]
wsum = CkksEngine.rotate_weighted_sum_hoisted(mk(0), [rotk, rotk2], pts)
out["hwsum0"] = np.asarray(wsum.c0.data)
out["hwsum1"] = np.asarray(wsum.c1.data)

sq = CkksEngine.square_ciphertext(mk(0), rlk)
out["square0"] = np.asarray(sq.c0.data)
out["square1"] = np.asarray(sq.c1.data)

cj = CkksEngine.conjugate_ciphertext(mk(0), cjk)
out["conj0"] = np.asarray(cj.c0.data)
out["conj1"] = np.asarray(cj.c1.data)

np.savez(out_path, **out)
print("runner done", flush=True)
"""


def run_arm(cfg, disable_pallas: bool, out_path: str) -> tuple[bool, str, float]:
    name, degree, bits, count, ds = cfg
    env = dict(os.environ)
    env.pop("CKKS_DISABLE_PALLAS", None)
    if disable_pallas:
        env["CKKS_DISABLE_PALLAS"] = "1"
    t0 = time.time()
    # N = 2^16 staged-jnp arms spend most of their wall clock in remote
    # compiles (each one cached persistently, so a retry resumes);
    # give the big configs more headroom and survive a timeout.
    limit = 3600 if degree >= (1 << 16) else 1800
    try:
        proc = subprocess.run(
            [sys.executable, "-c", _RUNNER, str(degree), str(bits),
             str(count), str(ds), out_path],
            env=env, capture_output=True, text=True, timeout=limit,
        )
    except subprocess.TimeoutExpired:
        return False, f"runner timed out after {limit}s", time.time() - t0
    dt = time.time() - t0
    if proc.returncode != 0:
        # keep enough tail that a transient-fault signature buried under
        # chained-exception / teardown output still matches in
        # run_arm_retry's classification
        return False, proc.stderr[-8000:], dt
    return True, "", dt


_TRANSIENT_SIGNATURES = (
    # the tunnel's remote-compile endpoint drops connections transiently
    "response body closed before all bytes were read",
    "Connection reset by peer",
    "Socket closed",
    # a timed-out arm is RESUMABLE, not deterministic: remote compiles
    # are persistently cached, so the retry picks up where the last
    # attempt died (cold-cache N>=2^15 staged-jnp arms need this)
    "runner timed out after",
)


def run_arm_retry(cfg, disable_pallas: bool, out_path: str,
                  attempts: int = 3) -> tuple[bool, str, float]:
    """Retry transient tunnel faults (connection drops) AND timeouts:
    compiles are persistently cached, so a timed-out arm resumes where
    the last attempt died rather than starting over. Deterministic
    failures (kernel crash, VMEM OOM) report immediately — retrying
    them would burn up to 3x the per-arm limit for nothing."""
    err, dt = "", 0.0
    for _ in range(attempts):
        ok, err, dt = run_arm(cfg, disable_pallas, out_path)
        if ok:
            return True, "", dt
        if not any(sig in err for sig in _TRANSIENT_SIGNATURES):
            break
    return False, err, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--json", default=None)
    ap.add_argument("--only", default=None,
                    help="substring filter on config names")
    args = ap.parse_args()

    import numpy as np

    configs = [
        c for c in CONFIGS
        if (not args.quick or c[0] in QUICK)
        and (args.only is None or args.only in c[0])
    ]
    results = []
    failed = 0
    for cfg in configs:
        name = cfg[0]
        with tempfile.TemporaryDirectory() as td:
            a_path = os.path.join(td, "a.npz")
            b_path = os.path.join(td, "b.npz")
            ok_a, err_a, dt_a = run_arm_retry(cfg, False, a_path)
            ok_b, err_b, dt_b = run_arm_retry(cfg, True, b_path)
            if not (ok_a and ok_b):
                print(f"FAIL {name}: runner error\n{err_a or err_b}")
                results.append({"config": name, "status": "runner_error"})
                failed += 1
                continue
            a = np.load(a_path)
            b = np.load(b_path)
            bad = [k for k in a.files if not np.array_equal(a[k], b[k])]
            if bad:
                print(f"FAIL {name}: mismatch in {bad}")
                results.append(
                    {"config": name, "status": "mismatch", "keys": bad}
                )
                failed += 1
            else:
                print(f"PASS {name} ({len(a.files)} arrays, "
                      f"pallas {dt_a:.0f}s / jnp {dt_b:.0f}s)")
                results.append({"config": name, "status": "pass",
                                "arrays": len(a.files),
                                "t_pallas_s": round(dt_a, 1),
                                "t_jnp_s": round(dt_b, 1)})
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"results": results, "failed": failed,
                       "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S")},
                      f, indent=1)
    print(f"{len(results) - failed}/{len(results)} configs bit-exact")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
