"""Per-rotation amortised cost: hoisted vs per-rotation key switch.

VERDICT item: hoisting must show >= 2x cheaper amortised per-rotation
cost. Measures, with marginal-cost timing (see CLAUDE.md), the chip time
of (a) m sequential ``rotate_ciphertext``-style key switches and (b) ONE
hoisted decomposition + m cheap applications (``rotate_hoisted``), both
on the same N=2^14, L=8x31b, digit_size=4 ciphertext.
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

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
    import jax.numpy as jnp

    from toy_heaan_ckks_tpu import (
        CkksContext,
        CkksEngine,
        CkksParams,
        generate_primes,
    )
    from toy_heaan_ckks_tpu.engine import (
        _gadget_key_switch,
        _hoisted_rotate_core,
        _hoisted_rotate_sum_core,
    )
    from toy_heaan_ckks_tpu.math.sampling import make_rng
    from toy_heaan_ckks_tpu.ops import modular as mm
    from toy_heaan_ckks_tpu.ops.poly import Poly

    import sys as _sys
    ds_arg = int(_sys.argv[1]) if len(_sys.argv) > 1 else 4
    degree, L, ds, m = 1 << 14, 8, ds_arg, 15
    ctx = CkksContext.build(generate_primes(31, L, degree), degree)
    engine = CkksEngine(ctx, CkksParams(3.2, degree // 2, 31))
    rng = make_rng(7)
    sk = engine.generate_secret_key(rng)
    rotks = [
        engine.generate_gadget_rotation_key(sk, k, rng, digit_size=ds)
        for k in range(1, m + 1)
    ]
    ext_ctx = rotks[0].ext_ctx
    c0 = Poly.sample_uniform(ctx, make_rng(1)).to_ntt_domain().data
    c1 = Poly.sample_uniform(ctx, make_rng(2)).to_ntt_domain().data
    half, two_n = degree // 2, 2 * degree
    perms = jnp.stack(
        [ctx.automorphism_table_ntt(pow(5, k.rotation % half, two_n))
         for k in rotks]
    )
    keys_a = jnp.stack([k.a for k in rotks])
    keys_b = jnp.stack([k.b for k in rotks])

    @functools.partial(jax.jit, static_argnames=("n_iters",))
    def seq(c0x, c1x, n_iters):
        # one rotation repeated m times per iteration: identical per-
        # rotation cost to m distinct keys, 15x smaller program (the
        # fully unrolled variant exceeds the remote-compile size limit)
        def body(i, carry):
            cc0, cc1 = carry
            cc0 = cc0.at[0, 0, 0].set(c0x[0, 0, 0])
            for _ in range(m_seq):
                r0 = jnp.take(cc0, perms[0], axis=-1)
                r1 = jnp.take(cc1, perms[0], axis=-1)
                ks0, ks1 = _gadget_key_switch(
                    r1, rotks[0].a, rotks[0].b, ctx, ext_ctx, digit_size=ds
                )
                cc0, cc1 = mm.add_mod(r0, ks0, ctx.chain), ks1
            return cc0, cc1

        return jax.lax.fori_loop(0, n_iters, body, (c0x, c1x))

    @functools.partial(jax.jit, static_argnames=("n_iters",))
    def hoist(c0x, c1x, ka, kb, n_iters):
        # keys passed as jit args: closure-captured arrays are baked into
        # the HLO and blow the remote-compile request limit (CLAUDE.md)
        def body(i, carry):
            cc0, cc1 = carry
            cc0 = cc0.at[0, 0, 0].set(c0x[0, 0, 0])
            o0, o1 = _hoisted_rotate_core(
                cc0, cc1, perms, ka, kb, ctx, ext_ctx, digit_size=ds
            )
            return o0[0], o1[0]

        return jax.lax.fori_loop(0, n_iters, body, (c0x, c1x))

    @functools.partial(jax.jit, static_argnames=("n_iters",))
    def hoist_sum(c0x, c1x, ka, kb, n_iters):
        # double hoisting: one decomposition AND one mod-down per SUM
        def body(i, carry):
            cc0, cc1 = carry
            cc0 = cc0.at[0, 0, 0].set(c0x[0, 0, 0])
            return _hoisted_rotate_sum_core(
                cc0, cc1, perms, ka, kb, ctx, ext_ctx, digit_size=ds
            )

        return jax.lax.fori_loop(0, n_iters, body, (c0x, c1x))

    m_seq = 3  # smaller unroll for the sequential arm (remote-compile
    # request size limit at digit_size=1); per-rotation cost is unchanged

    def measure(fn, iters=8, per=m, extra=()):
        def t(k):
            t0 = time.time()
            o = fn(c0, c1, *extra, k)
            np.asarray(o[0][0, 0, :4])
            return time.time() - t0

        t(1); t(1 + iters); t(1); t(1 + iters)
        a = statistics.median(t(1) for _ in range(3))
        b = statistics.median(t(1 + iters) for _ in range(3))
        return (b - a) / iters / per  # per rotation

    per_seq = measure(seq, per=m_seq)
    per_hoist = measure(hoist, extra=(keys_a, keys_b))
    per_sum = measure(hoist_sum, extra=(keys_a, keys_b))
    print(f"per-rotation (sequential key switch):  {per_seq*1e6:.1f} us")
    print(f"per-rotation (hoisted, m={m}):         {per_hoist*1e6:.1f} us")
    print(f"per-rotation (double-hoisted sum):     {per_sum*1e6:.1f} us")
    print(f"speedup hoisted:        {per_seq/per_hoist:.2f}x")
    print(f"speedup double-hoisted: {per_seq/per_sum:.2f}x")


if __name__ == "__main__":
    main()
