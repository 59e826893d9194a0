"""Benchmark: ciphertext-ciphertext multiplies (relin+rescale)/sec/chip.

The north-star metric from BASELINE.json, measured at N = 2^14 with an
8-prime (31-bit) chain and hybrid gadget relinearization, on whatever
accelerator JAX selects (the driver runs this on one real TPU chip).

The reference (oiwn/toy-heaan-ckks) publishes no throughput numbers
(BASELINE.md), so ``vs_baseline`` reports speedup vs this same exact
workload executed on one CPU host thread pool via XLA:CPU — a strong
single-host native proxy measured on this machine (cached in
.bench_cpu_baseline.json after the first run).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "mults/s/chip", "vs_baseline": N}
"""

from __future__ import annotations

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
ITERS = 32  # marginal loop length: keeps chip time >> tunnel flush jitter

_CPU_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          ".bench_cpu_baseline.json")


def _measure(batch: int, iters: int, warmup: int) -> float:
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
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
    import jax.numpy as jnp

    from toy_heaan_ckks_tpu import (
        CkksContext,
        CkksEngine,
        CkksParams,
        generate_primes,
    )
    from toy_heaan_ckks_tpu.math.sampling import make_rng
    from toy_heaan_ckks_tpu.ops.poly import Poly
    from toy_heaan_ckks_tpu.parallel.sharded import _mul_relin_rescale_arrays

    primes = generate_primes(PRIME_BITS, NUM_PRIMES, DEGREE)
    ctx = CkksContext.build(primes, DEGREE)
    engine = CkksEngine(ctx, CkksParams(3.2, DEGREE // 2, PRIME_BITS))
    rng = make_rng(7)
    sk = engine.generate_secret_key(rng)
    rlk = engine.generate_gadget_relin_key(sk, rng, digit_size=DIGIT_SIZE)
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

    import functools

    import numpy as np

    @functools.partial(jax.jit, static_argnames=("n_iters",))
    def fn(a0, a1, b0, b1, n_iters):
        def body(i, carry):
            a = a0.at[0, 0, 0, 0].set(carry[0, 0, 0, 0])
            out = _mul_relin_rescale_arrays(
                a, a1, b0, b1, rlk.a, rlk.b, ctx, rlk.ext_ctx, child
            )
            return out[0]

        init = jnp.zeros(
            (batch, NUM_PRIMES - 1, 2, DEGREE), dtype=jnp.uint32
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

    n_reps = 3 if iters > 2 else 1
    t_short = statistics.median(timed(short) for _ in range(n_reps))
    t_long = statistics.median(timed(long_) for _ in range(n_reps))
    return max(t_long - t_short, 1e-9) / ((long_ - short) * batch)


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
            env=env,
            capture_output=True,
            text=True,
            timeout=3600,
        )
        val = float(out.stdout.strip().splitlines()[-1])
        with open(_CPU_CACHE, "w") as f:
            json.dump({"sec_per_mult": val}, f)
        return val
    except Exception:
        return None


def main():
    if os.environ.get("BENCH_CPU_MODE"):
        # subprocess mode: measure on CPU with few iterations, print number
        import jax

        jax.config.update("jax_platforms", "cpu")
        print(_measure(batch=1, iters=2, warmup=1))
        return

    sec = _measure(batch=BATCH, iters=ITERS, warmup=WARMUP)
    mults_per_sec = 1.0 / sec

    cpu_sec = _cpu_baseline_sec_per_mult()
    vs_baseline = (cpu_sec / sec) if cpu_sec else 1.0

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
            }
        )
    )


if __name__ == "__main__":
    main()
