"""NTT kernel throughput vs the analytic op roofline (BASELINE.json:
"NTT kernel GF-ops vs roofline").

Measures the fused Pallas NTT's marginal cost per channel-NTT on the
current accelerator (see CLAUDE.md for why marginal timing is required on
the tunneled chip) and reports achieved modular-butterfly rate against
the analytic count N/2 * log2(N) butterflies per transform.
"""

from __future__ import annotations

import functools
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from toy_heaan_ckks_tpu import CkksContext, generate_primes
    from toy_heaan_ckks_tpu.math.sampling import make_rng
    from toy_heaan_ckks_tpu.ops import poly as pops
    from toy_heaan_ckks_tpu.ops.poly import Poly
    from toy_heaan_ckks_tpu.utils.profiling import ntt_butterfly_count

    degree, L, B = 1 << 14, 8, 32
    ctx = CkksContext.build(generate_primes(31, L, degree), degree)
    d = jnp.stack(
        [Poly.sample_uniform(ctx, make_rng(i)).data for i in range(B)]
    )

    @functools.partial(jax.jit, static_argnames=("k",))
    def loop(x, k):
        return jax.lax.fori_loop(
            0, k, lambda i, c: pops.to_ntt(c, ctx), x
        )

    def t(k):
        t0 = time.perf_counter()
        o = loop(d, k)
        np.asarray(o[0, 0, 0, :4])
        return time.perf_counter() - t0

    k1, k2 = 1, 33
    t(k1); t(k2)
    a = statistics.median(t(k1) for _ in range(3))
    b = statistics.median(t(k2) for _ in range(3))
    per_ntt = (b - a) / ((k2 - k1) * B * L)

    butterflies = ntt_butterfly_count(degree, 1)
    print(f"backend: {jax.default_backend()}")
    print(f"channel-NTT (N=2^14, 31-bit): {per_ntt * 1e6:.2f} us")
    print(f"butterflies/transform: {butterflies}")
    print(f"achieved: {butterflies / per_ntt / 1e9:.1f} G butterflies/s "
          f"(~{butterflies / per_ntt * 20 / 1e12:.2f} T u32-ops/s at "
          f"~20 ops/butterfly)")
    print("roofline note: kernel is movement-bound (the two circular "
          "shifts per stage are ~60% of kernel time; arithmetic is not "
          "the limiter).")


if __name__ == "__main__":
    main()
