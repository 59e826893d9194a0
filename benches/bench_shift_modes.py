"""Measure the NTT kernel's shift-formulation variants on the chip.

The fused kernel's two circular shifts per butterfly stage are ~60% of
kernel time (round-1 finding). This microbench times the per-channel-NTT
marginal cost and the end-to-end mult throughput for each
CKKS_SHIFT_CONCAT mode ("" = pltpu.roll everywhere, "rows", "lanes",
"both" = concatenate-of-slices on those axes), one subprocess per mode
(the knob binds at import).
"""

from __future__ import annotations

import os
import subprocess
import sys

_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_RUNNER = r"""
import functools, os, statistics, sys, time
sys.path.insert(0, os.getcwd())
import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.getcwd(), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
import jax.numpy as jnp
import numpy as np
from toy_heaan_ckks_tpu import CkksContext, CkksEngine, CkksParams, generate_primes
from toy_heaan_ckks_tpu.math.sampling import make_rng
from toy_heaan_ckks_tpu.ops import poly as pops
from toy_heaan_ckks_tpu.ops.poly import Poly
from toy_heaan_ckks_tpu.parallel.sharded import _mul_relin_rescale_arrays

degree, L, B = 1 << 14, 8, 32
ctx = CkksContext.build(generate_primes(31, L, degree), degree)
d = jnp.stack([Poly.sample_uniform(ctx, make_rng(i)).data for i in range(B)])

@functools.partial(jax.jit, static_argnames=("k",))
def loop(x, k):
    return jax.lax.fori_loop(0, k, lambda i, c: pops.to_ntt(c, ctx), x)

def t(k):
    t0 = time.perf_counter()
    o = loop(d, k)
    np.asarray(o[0, 0, 0, :4])
    return time.perf_counter() - t0

t(1); t(33); t(1); t(33)
a = statistics.median(t(1) for _ in range(3))
b = statistics.median(t(33) for _ in range(3))
per_ntt = (b - a) / (32 * B * L)

# end-to-end mult
engine = CkksEngine(ctx, CkksParams(3.2, degree // 2, 31))
rng = make_rng(7)
sk = engine.generate_secret_key(rng)
rlk = engine.generate_gadget_relin_key(sk, rng, digit_size=4)
child = ctx.drop_last(1)
cts = [jnp.stack([Poly.sample_uniform(ctx, make_rng(10+s*8+i)).to_ntt_domain().data
                  for i in range(B)]) for s in range(4)]

@functools.partial(jax.jit, static_argnames=("n_iters",))
def fn(a0, a1, b0, b1, n_iters):
    def body(i, carry):
        a = a0.at[0, 0, 0, 0].set(carry[0, 0, 0, 0])
        out = _mul_relin_rescale_arrays(a, a1, b0, b1, rlk.a, rlk.b,
                                        ctx, rlk.ext_ctx, child, digit_size=4)
        return out[0]
    init = jnp.zeros((B, L - 1, 2, degree), jnp.uint32)
    return jax.lax.fori_loop(0, n_iters, body, init)

def tm(k):
    t0 = time.time()
    o = fn(*cts, k)
    np.asarray(o[0, 0, 0, :4])
    return time.time() - t0

tm(1); tm(33); tm(1); tm(33)
s = statistics.median(tm(1) for _ in range(3))
l = statistics.median(tm(33) for _ in range(3))
sec = (l - s) / (32 * B)
print(f"RESULT {per_ntt*1e6:.3f} {1.0/sec:.1f}")
"""


def main():
    modes = ["", "rows", "lanes", "both"]
    for mode in modes:
        env = dict(os.environ)
        env["CKKS_SHIFT_CONCAT"] = mode
        out = subprocess.run(
            [sys.executable, "-c", _RUNNER], env=env, cwd=_DIR,
            capture_output=True, text=True, timeout=1800,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("RESULT")]
        if line:
            ntt_us, mults = line[0].split()[1:]
            print(f"mode={mode or 'roll':6s} channel-NTT {ntt_us} us   "
                  f"{mults} mults/s/chip")
        else:
            print(f"mode={mode or 'roll'}: FAILED\n{out.stderr[-800:]}")


if __name__ == "__main__":
    main()
