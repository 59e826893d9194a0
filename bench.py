"""Benchmark: ciphertext-ciphertext multiplies (relin+rescale)/sec/chip.

The north-star metric from BASELINE.json, measured at N = 2^14 with an
8-prime (31-bit) chain and hybrid gadget relinearization, on whatever
accelerator JAX selects (the driver runs this on one real TPU chip).
Also reports:
  - a second configuration on the wide (2-limb) path — N = 2^13 with a
    61-bit chain, the reference's heavy-prime class
    (examples/horner_chain.rs, tests/integration_mul.rs) — with its
    speedup over the staged-jnp path on the same chip;
  - the fused NTT kernel's per-channel-transform cost and its fraction of
    the HBM-bandwidth roofline (self-calibrated: the minimum time to read
    + write one N-point u32 plane at the measured copy bandwidth).

The reference (oiwn/toy-heaan-ckks) publishes no throughput numbers
(BASELINE.md), so ``vs_baseline`` reports speedup vs this same exact
workload executed on one CPU host thread pool via XLA:CPU — a strong
single-host native proxy measured on this machine (cached in
.bench_cpu_baseline.json after the first run).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "mults/s/chip", "vs_baseline": N,
   "wide": {...}, "ntt": {...}, "compare": {...}}
where ``compare`` is an in-window paired A/B (fused composite vs the
sequential key-switch+rescale path, interleaved in THIS process/window)
— the falsifiability mechanism for perf claims that cross-window
variance (±25%, CLAUDE.md) otherwise swallows.
"""

from __future__ import annotations

import functools
import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DEGREE = 1 << 14
NUM_PRIMES = 8
PRIME_BITS = 31
DIGIT_SIZE = 4  # hybrid key-switch digit size (4 channels/digit, 4 specials)
BATCH = 32  # throughput knee: twiddle/key fetches amortise across the batch
WARMUP = 2
ITERS = 96  # marginal loop length: keeps chip time >> tunnel flush jitter

WIDE_DEGREE = 1 << 13
WIDE_PRIMES = 4
WIDE_BITS = 61
WIDE_BATCH = 8
WIDE_ITERS = 64

# third configuration: the top of the ring-degree envelope (factored
# row x lane twiddles inside every fused composite kernel)
BIG_DEGREE = 1 << 16
BIG_PRIMES = 4
BIG_BITS = 30
BIG_DIGIT = 2
BIG_BATCH = 4
BIG_ITERS = 24

_DIR = os.path.dirname(os.path.abspath(__file__))
_CPU_CACHE = os.path.join(_DIR, ".bench_cpu_baseline.json")
_WIDE_JNP_CACHE = os.path.join(_DIR, ".bench_wide_jnp.json")


def _jax_setup():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(_DIR, ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
    return jax


def _measure(degree: int, num_primes: int, bits: int, digit_size: int,
             batch: int, iters: int, warmup: int) -> float:
    """Seconds per single mult(relin+rescale), amortised over the batch.

    The multiplies run *on device* inside one jitted ``lax.fori_loop``
    and the reported time is the MARGINAL cost between a long and a short
    loop, with a device->host value fetch forcing completion: on this
    tunneled runtime ``block_until_ready`` can return before execution
    finishes and every round trip carries a large fixed latency, so only
    (t_long - t_short) / (iters_long - iters_short) measures the chip.
    The loop carry perturbs the next iteration's input, preventing XLA
    from hoisting the body.
    """
    jax = _jax_setup()
    import jax.numpy as jnp
    import numpy as np

    from toy_heaan_ckks_tpu import (
        CkksContext,
        CkksEngine,
        CkksParams,
        generate_primes,
    )
    from toy_heaan_ckks_tpu.math.sampling import make_rng
    from toy_heaan_ckks_tpu.ops.poly import Poly
    from toy_heaan_ckks_tpu.parallel.sharded import _mul_relin_rescale_arrays

    primes = generate_primes(bits, num_primes, degree)
    ctx = CkksContext.build(primes, degree)
    engine = CkksEngine(ctx, CkksParams(3.2, degree // 2, bits))
    rng = make_rng(7)
    sk = engine.generate_secret_key(rng)
    rlk = engine.generate_gadget_relin_key(sk, rng, digit_size=digit_size)
    child = ctx.drop_last(1)

    def rand_ct(seed):
        r = make_rng(seed)
        return jnp.stack(
            [
                Poly.sample_uniform(ctx, r).to_ntt_domain().data
                for _ in range(batch)
            ]
        )

    c0a, c1a, c0b, c1b = (rand_ct(s) for s in (1, 2, 3, 4))

    @functools.partial(jax.jit, static_argnames=("n_iters",))
    def fn(a0, a1, b0, b1, n_iters):
        def body(i, carry):
            a = a0.at[0, 0, 0, 0].set(carry[0, 0, 0, 0])
            out = _mul_relin_rescale_arrays(
                a, a1, b0, b1, rlk.a, rlk.b, ctx, rlk.ext_ctx, child,
                digit_size=digit_size,
            )
            # fold BOTH output components into the carry: a c1 component
            # that never escapes the loop body is dead code, and XLA
            # elides its entire mod-down (pallas kernels included) —
            # which would overstate throughput by ~25%
            return out[0].at[0, 0, 0, 0].add(out[1][0, 0, 0, 0])

        init = jnp.zeros(
            (batch, num_primes - 1, 2, degree), dtype=jnp.uint32
        )
        return jax.lax.fori_loop(0, n_iters, body, init)

    short, long_ = 1, 1 + iters

    def timed(n_iters):
        t0 = time.time()
        out = fn(c0a, c1a, c0b, c1b, n_iters)
        np.asarray(out[0, 0, 0, :4])  # forces completion (sync fetch)
        return time.time() - t0

    for _ in range(warmup):
        timed(short)
        timed(long_)

    # Tunnel latency drifts minute-to-minute, so PAIR each long sample
    # with an adjacent short sample and take the MEDIAN of the paired
    # deltas — more robust than median(long) - median(short) when the
    # baseline moves between reps, and unbiased (a lower quantile would
    # harvest deltas deflated by a latency spike landing on the short
    # sample, overstating throughput). The chip is time-shared behind
    # the tunnel and whole windows can run 20-30% slow; 9 reps widen
    # the window but window-level contention is irreducible — compare
    # numbers only within one window (CLAUDE.md).
    n_reps = 9 if iters > 2 else 1
    deltas = []
    for _ in range(n_reps):
        ts = timed(short)
        tl = timed(long_)
        deltas.append(tl - ts)
    return max(statistics.median(deltas), 1e-9) / ((long_ - short) * batch)


def _measure_ntt_roofline() -> dict:
    """Per-channel-NTT marginal cost + fraction of the HBM roofline.

    Roofline model: the fused kernel must read and write one (N,) u32
    plane per channel-transform from/to HBM (twiddles amortise across the
    batch); the floor is 2*N*4 bytes at the chip's effective copy
    bandwidth, which is measured in-process (marginal cost of a big
    device copy) rather than assumed from a spec sheet.
    """
    jax = _jax_setup()
    import jax.numpy as jnp
    import numpy as np

    from toy_heaan_ckks_tpu import CkksContext, generate_primes
    from toy_heaan_ckks_tpu.math.sampling import make_rng
    from toy_heaan_ckks_tpu.ops import poly as pops
    from toy_heaan_ckks_tpu.ops.poly import Poly
    from toy_heaan_ckks_tpu.utils.profiling import ntt_butterfly_count

    degree, L, B = DEGREE, NUM_PRIMES, BATCH
    ctx = CkksContext.build(generate_primes(PRIME_BITS, L, degree), degree)
    d = jnp.stack(
        [Poly.sample_uniform(ctx, make_rng(i)).data for i in range(B)]
    )

    @functools.partial(jax.jit, static_argnames=("k",))
    def loop(x, k):
        return jax.lax.fori_loop(0, k, lambda i, c: pops.to_ntt(c, ctx), x)

    def t(k):
        t0 = time.perf_counter()
        o = loop(d, k)
        np.asarray(o[0, 0, 0, :4])
        return time.perf_counter() - t0

    k1, k2 = 1, 33
    t(k1); t(k2); t(k1); t(k2)
    # paired deltas, positives only (tunnel latency drifts; an unlucky
    # pairing can make long - short negative on this runtime)
    ntt_deltas = []
    for _ in range(7):
        a = t(k1)
        b = t(k2)
        if b - a > 0:
            ntt_deltas.append((b - a) / ((k2 - k1) * B * L))
    if not ntt_deltas:
        return {"channel_ntt_us": None, "gbutterflies_per_s": None,
                "copy_bw_gb_s": None, "roofline_pct": None}
    per_ntt = statistics.median(ntt_deltas)

    # effective copy bandwidth: marginal cost of y = x + 1 on 256 MB
    big = jnp.zeros((64, 1024, 1024), jnp.uint32)

    @functools.partial(jax.jit, static_argnames=("k",))
    def cp(x, k):
        return jax.lax.fori_loop(0, k, lambda i, c: c + jnp.uint32(1), x)

    def tc(k):
        t0 = time.perf_counter()
        o = cp(big, k)
        np.asarray(o[0, 0, :4])
        return time.perf_counter() - t0

    tc(1); tc(17); tc(1); tc(17)
    # tunnel timing jitter can exceed the short-loop time; keep only
    # positive marginal deltas and take their median (5 attempts)
    deltas = []
    for _ in range(5):
        ca = min(tc(1) for _ in range(2))
        cb = statistics.median(tc(17) for _ in range(2))
        if cb - ca > 0:
            deltas.append((cb - ca) / 16)
    bytes_per_pass = 2 * big.size * 4  # read + write
    out = {
        "channel_ntt_us": round(per_ntt * 1e6, 3),
        "gbutterflies_per_s": round(
            ntt_butterfly_count(degree, 1) / per_ntt / 1e9, 1
        ),
    }
    if deltas:
        per_pass = statistics.median(deltas)
        bw = bytes_per_pass / per_pass
        floor = 2 * degree * 4 / bw  # read+write one u32 plane
        out["copy_bw_gb_s"] = round(bw / 1e9, 0)
        out["roofline_pct"] = round(100 * floor / per_ntt, 1)
    else:
        out["copy_bw_gb_s"] = None
        out["roofline_pct"] = None
    return out


def _compare(name: str, reps: int = 11) -> dict:
    """In-window paired A/B: candidate vs control, interleaved.

    Window-level chip contention makes numbers from different bench runs
    incomparable (±25%, CLAUDE.md) — so a perf claim is only falsifiable
    when both implementations are measured in the SAME process, minutes
    apart, with the same marginal-loop method. This interleaves
    control/candidate marginal measurements rep by rep and reports the
    per-rep delta distribution; the median delta is the claim.

    Comparisons (control is always the shipped default):
      pair-off   candidate disables multi-plane grid-step pairing in the
                 fused composite kernels (CKKS_FUSED_PAIR=1). The tuned
                 pairing should WIN (~+10%/channel-NTT at N=2^14 ds4) —
                 a harness-validation comparison with a known sign.
      seq-mul    candidate is the sequential engine path (separate
                 key-switch mod-down + rescale, 2L more channel-NTTs)
                 vs the fused mul_relin_rescale composite.
      ntt-swap   candidate sets CKKS_NTT_MOVE=swap (single-partner-swap
                 movement formulation; measured 2.21 vs 1.64 us in round
                 2 — control should win).

    Env-knob candidates work by toggling the knob while TRACING a
    separate jit instance (kernel structure is baked at trace time;
    the knob is read inside the kernel-call wrapper, not cached).
    """
    jax = _jax_setup()
    import jax.numpy as jnp
    import numpy as np

    from toy_heaan_ckks_tpu import (
        CkksContext,
        CkksEngine,
        CkksParams,
        generate_primes,
    )
    from toy_heaan_ckks_tpu.math.sampling import make_rng
    from toy_heaan_ckks_tpu.ops.poly import Poly
    from toy_heaan_ckks_tpu.parallel.sharded import _mul_relin_rescale_arrays

    degree, L, bits, ds, batch = (
        DEGREE, NUM_PRIMES, PRIME_BITS, DIGIT_SIZE, BATCH
    )
    iters = 48
    ctx = CkksContext.build(generate_primes(bits, L, degree), degree)
    engine = CkksEngine(ctx, CkksParams(3.2, degree // 2, bits))
    rng = make_rng(7)
    sk = engine.generate_secret_key(rng)
    rlk = engine.generate_gadget_relin_key(sk, rng, digit_size=ds)
    child = ctx.drop_last(1)

    def rand_ct(seed):
        r = make_rng(seed)
        return jnp.stack(
            [
                Poly.sample_uniform(ctx, r).to_ntt_domain().data
                for _ in range(batch)
            ]
        )

    c0a, c1a, c0b, c1b = (rand_ct(s) for s in (1, 2, 3, 4))

    def fused_body(a, a1, b0, b1):
        return _mul_relin_rescale_arrays(
            a, a1, b0, b1, rlk.a, rlk.b, ctx, rlk.ext_ctx, child,
            digit_size=ds,
        )

    def seq_body(a, a1, b0, b1):
        from toy_heaan_ckks_tpu.engine import _mul_gadget_core
        from toy_heaan_ckks_tpu.ops import poly as pops

        o0, o1 = _mul_gadget_core(
            a, a1, b0, b1, rlk.a, rlk.b, ctx, rlk.ext_ctx, digit_size=ds
        )
        return (
            pops.rescale_ntt(o0, ctx),
            pops.rescale_ntt(o1, ctx),
        )

    def make_loop(body):
        @functools.partial(jax.jit, static_argnames=("n_iters",))
        def fn(a0, a1, b0, b1, n_iters):
            def step(i, carry):
                a = a0.at[0, 0, 0, 0].set(carry[0, 0, 0, 0])
                out = body(a, a1, b0, b1)
                return out[0].at[0, 0, 0, 0].add(out[1][0, 0, 0, 0])

            init = jnp.zeros((batch, L - 1, 2, degree), dtype=jnp.uint32)
            return jax.lax.fori_loop(0, n_iters, step, init)

        return fn

    knobs = {
        "pair-off": {"CKKS_FUSED_PAIR": "1", "CKKS_NTT_PAIR": "1"},
        "ntt-swap": {"CKKS_NTT_MOVE": "swap"},
    }
    if name in knobs:
        control = make_loop(fused_body)
        candidate = make_loop(fused_body)
        cand_env = knobs[name]
    elif name == "seq-mul":
        control = make_loop(fused_body)
        candidate = make_loop(seq_body)
        cand_env = {}
    else:
        raise SystemExit(f"unknown comparison {name!r}")

    short, long_ = 1, 1 + iters

    def timed(fn, n_iters):
        t0 = time.time()
        out = fn(c0a, c1a, c0b, c1b, n_iters)
        np.asarray(out[0, 0, 0, :4])
        return time.time() - t0

    # trace+compile: control with clean env, candidate with the knob set
    # (kernel structure bakes at trace time)
    timed(control, short)
    timed(control, long_)
    saved = {k: os.environ.get(k) for k in cand_env}
    os.environ.update(cand_env)
    try:
        timed(candidate, short)
        timed(candidate, long_)
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v

    per = (long_ - short) * batch
    deltas, ctl, cnd = [], [], []
    for _ in range(reps):
        cs = timed(control, short)
        cl = timed(control, long_)
        as_ = timed(candidate, short)
        al = timed(candidate, long_)
        c = max(cl - cs, 1e-9) / per
        a = max(al - as_, 1e-9) / per
        ctl.append(c)
        cnd.append(a)
        deltas.append(100.0 * (c - a) / c)  # >0: candidate faster

    deltas.sort()
    q = lambda p: deltas[min(len(deltas) - 1, int(p * len(deltas)))]
    return {
        "compare": name,
        "config": f"N=2^14 L={L}x{bits}b ds={ds} batch={batch}",
        "control_us_per_mult": round(statistics.median(ctl) * 1e6, 2),
        "candidate_us_per_mult": round(statistics.median(cnd) * 1e6, 2),
        "delta_pct_median": round(statistics.median(deltas), 2),
        "delta_pct_q25_q75": [round(q(0.25), 2), round(q(0.75), 2)],
        "reps": reps,
        "note": "delta_pct > 0 means the candidate is FASTER",
    }


def _cpu_baseline_sec_per_mult() -> float | None:
    if os.path.exists(_CPU_CACHE):
        try:
            with open(_CPU_CACHE) as f:
                return float(json.load(f)["sec_per_mult"])
        except Exception:
            pass
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["BENCH_CPU_MODE"] = "1"
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, timeout=3600,
        )
        val = float(out.stdout.strip().splitlines()[-1])
        with open(_CPU_CACHE, "w") as f:
            json.dump({"sec_per_mult": val}, f)
        return val
    except Exception:
        return None


def _wide_jnp_sec_per_mult() -> float | None:
    """Staged-jnp arm of the wide config, same chip (subprocess: the
    kernel dispatch is baked into jit traces at first call)."""
    if os.path.exists(_WIDE_JNP_CACHE):
        try:
            with open(_WIDE_JNP_CACHE) as f:
                return float(json.load(f)["sec_per_mult"])
        except Exception:
            pass
    env = dict(os.environ)
    env["CKKS_DISABLE_PALLAS"] = "1"
    env["BENCH_WIDE_MODE"] = "1"
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, timeout=3600,
        )
        val = float(out.stdout.strip().splitlines()[-1])
        with open(_WIDE_JNP_CACHE, "w") as f:
            json.dump({"sec_per_mult": val}, f)
        return val
    except Exception:
        return None


def main():
    if "--compare" in sys.argv:
        i = sys.argv.index("--compare")
        name = sys.argv[i + 1] if i + 1 < len(sys.argv) else "pair-off"
        print(json.dumps(_compare(name)))
        return
    if os.environ.get("BENCH_CPU_MODE"):
        # subprocess mode: measure on CPU with few iterations, print number
        import jax

        jax.config.update("jax_platforms", "cpu")
        print(_measure(DEGREE, NUM_PRIMES, PRIME_BITS, DIGIT_SIZE,
                       batch=1, iters=2, warmup=1))
        return
    if os.environ.get("BENCH_WIDE_MODE"):
        # subprocess mode: wide config on the staged jnp path (same chip)
        print(_measure(WIDE_DEGREE, WIDE_PRIMES, WIDE_BITS, 1,
                       batch=WIDE_BATCH, iters=4, warmup=1))
        return

    sec = _measure(DEGREE, NUM_PRIMES, PRIME_BITS, DIGIT_SIZE,
                   batch=BATCH, iters=ITERS, warmup=WARMUP)
    mults_per_sec = 1.0 / sec

    cpu_sec = _cpu_baseline_sec_per_mult()
    vs_baseline = (cpu_sec / sec) if cpu_sec else 1.0

    wide_sec = _measure(WIDE_DEGREE, WIDE_PRIMES, WIDE_BITS, 1,
                        batch=WIDE_BATCH, iters=WIDE_ITERS, warmup=WARMUP)
    wide_jnp = _wide_jnp_sec_per_mult()
    big_sec = _measure(BIG_DEGREE, BIG_PRIMES, BIG_BITS, BIG_DIGIT,
                       batch=BIG_BATCH, iters=BIG_ITERS, warmup=WARMUP)
    # single-ciphertext latency (batch=1): the serving-path metric —
    # batched throughput amortises twiddle/key traffic, latency cannot
    lat_sec = _measure(DEGREE, NUM_PRIMES, PRIME_BITS, DIGIT_SIZE,
                       batch=1, iters=48, warmup=WARMUP)
    ntt = _measure_ntt_roofline()
    # in-window paired A/B (VERDICT r04 §2): control = shipped fused
    # composite, candidate = sequential key-switch+rescale path — the
    # one falsifiable perf claim window variance cannot fake. Guarded:
    # a compare failure must not cost the headline number.
    try:
        cmp_row = _compare("seq-mul", reps=7)
    except Exception as e:  # noqa: BLE001 — diagnostic field only
        cmp_row = {"compare": "seq-mul", "error": repr(e)}

    print(
        json.dumps(
            {
                "metric": (
                    f"ct-ct mults (relin+rescale)/sec/chip @ N=2^14, "
                    f"L={NUM_PRIMES}x{PRIME_BITS}b, batch={BATCH}"
                ),
                "value": round(mults_per_sec, 2),
                "unit": "mults/s/chip",
                "vs_baseline": round(vs_baseline, 2),
                "wide": {
                    "metric": (
                        f"mults/s/chip @ N=2^13, L={WIDE_PRIMES}x"
                        f"{WIDE_BITS}b (2-limb), batch={WIDE_BATCH}"
                    ),
                    "value": round(1.0 / wide_sec, 2),
                    "vs_staged_jnp": (
                        round(wide_jnp / wide_sec, 2) if wide_jnp else None
                    ),
                },
                "big": {
                    "metric": (
                        f"mults/s/chip @ N=2^16, L={BIG_PRIMES}x"
                        f"{BIG_BITS}b, batch={BIG_BATCH} (factored twiddles)"
                    ),
                    "value": round(1.0 / big_sec, 2),
                },
                "latency": {
                    "metric": (
                        f"single-mult latency @ N=2^14, "
                        f"L={NUM_PRIMES}x{PRIME_BITS}b, batch=1"
                    ),
                    "value_ms": round(lat_sec * 1e3, 3),
                },
                "ntt": ntt,
                "compare": cmp_row,
            }
        )
    )


if __name__ == "__main__":
    main()
