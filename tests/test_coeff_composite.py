"""Coefficient-sharded fused multiply composite vs the single-chip path.

The full mul+relin+rescale composite with the ring-degree axis sharded
over the 8-virtual-device CPU mesh must produce residues identical to
the unsharded composite (parallel/sharded.py) — extending the SURVEY.md
§7 stage-10 bit-exactness gate from the standalone NTT to the whole
engine composite (reference semantics: src/crypto/engine.rs:473-539 +
:255-282).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from toy_heaan_ckks_tpu import (
    CkksContext,
    CkksEngine,
    CkksParams,
    generate_primes,
)
from toy_heaan_ckks_tpu.math.sampling import make_rng
from toy_heaan_ckks_tpu.ops.poly import Poly
from toy_heaan_ckks_tpu.parallel.coeff_composite import (
    build_mul_relin_rescale_coeff,
)
from toy_heaan_ckks_tpu.parallel.sharded import _mul_relin_rescale_arrays

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _mesh():
    return Mesh(np.array(jax.devices()[:8]), axis_names=("coeff",))


@pytest.mark.parametrize("digit_size", [1, 2])
def test_coeff_sharded_composite_bit_exact(digit_size):
    degree, L, B = 1024, 4, 2
    mesh = _mesh()
    ctx = CkksContext.build(generate_primes(30, L, degree), degree)
    eng = CkksEngine(ctx, CkksParams(3.2, degree // 2, 30))
    rng = make_rng(17)
    sk = eng.generate_secret_key(rng)
    rlk = eng.generate_gadget_relin_key(sk, rng, digit_size=digit_size)

    args = [
        jnp.stack(
            [
                Poly.sample_uniform(ctx, make_rng(40 + 10 * s + b))
                .to_ntt_domain()
                .data
                for b in range(B)
            ]
        )
        for s in range(4)
    ]
    want0, want1 = _mul_relin_rescale_arrays(
        *args, rlk.a, rlk.b, ctx, rlk.ext_ctx, ctx.drop_last(1),
        digit_size=digit_size,
    )

    fn = build_mul_relin_rescale_coeff(
        mesh, ctx, rlk.ext_ctx, digit_size=digit_size
    )
    shard = lambda x: jax.device_put(
        x, NamedSharding(mesh, P(None, None, "coeff"))
    )
    lo = lambda x: jnp.asarray(x)[..., 0, :]
    got0, got1 = fn(
        *[shard(lo(a)) for a in args],
        shard(lo(rlk.a)), shard(lo(rlk.b)),
    )
    np.testing.assert_array_equal(np.asarray(got0), np.asarray(lo(want0)))
    np.testing.assert_array_equal(np.asarray(got1), np.asarray(lo(want1)))


def test_coeff_sharded_composite_remote_dma_interpret():
    """Same gate with the async-remote-copy cross-stage exchange
    (interpret mode on the CPU mesh)."""
    degree, L, B = 1024, 3, 1
    mesh = _mesh()
    ctx = CkksContext.build(generate_primes(30, L, degree), degree)
    eng = CkksEngine(ctx, CkksParams(3.2, degree // 2, 30))
    rng = make_rng(23)
    sk = eng.generate_secret_key(rng)
    rlk = eng.generate_gadget_relin_key(sk, rng, digit_size=1)

    args = [
        Poly.sample_uniform(ctx, make_rng(60 + s)).to_ntt_domain().data[None]
        for s in range(4)
    ]
    want0, want1 = _mul_relin_rescale_arrays(
        *args, rlk.a, rlk.b, ctx, rlk.ext_ctx, ctx.drop_last(1),
        digit_size=1,
    )
    fn = build_mul_relin_rescale_coeff(
        mesh, ctx, rlk.ext_ctx, digit_size=1, remote_dma=True,
        interpret=True,
    )
    shard = lambda x: jax.device_put(
        x, NamedSharding(mesh, P(None, None, "coeff"))
    )
    lo = lambda x: jnp.asarray(x)[..., 0, :]
    got0, got1 = fn(
        *[shard(lo(a)) for a in args], shard(lo(rlk.a)), shard(lo(rlk.b))
    )
    np.testing.assert_array_equal(np.asarray(got0), np.asarray(lo(want0)))
    np.testing.assert_array_equal(np.asarray(got1), np.asarray(lo(want1)))


def test_coeff_sharded_composite_wide_bit_exact():
    """Wide-chain (61-bit) coefficient-sharded composite vs the
    single-chip wide path: identical uint32 limb arrays. Lifts the
    round-4 small-chain-only restriction — the reference's heavy-prime
    class (tests/integration_mul.rs:47-51, examples/horner_chain.rs:65)
    now rides the ring-degree scaling axis."""
    degree, L, B = 512, 3, 2
    mesh = _mesh()
    ctx = CkksContext.build(generate_primes(61, L, degree), degree)
    eng = CkksEngine(ctx, CkksParams(3.2, degree // 2, 61))
    rng = make_rng(23)
    sk = eng.generate_secret_key(rng)
    rlk = eng.generate_gadget_relin_key(sk, rng, digit_size=1)

    args = [
        jnp.stack(
            [
                Poly.sample_uniform(ctx, make_rng(90 + 10 * s + b))
                .to_ntt_domain()
                .data
                for b in range(B)
            ]
        )
        for s in range(4)
    ]
    want0, want1 = _mul_relin_rescale_arrays(
        *args, rlk.a, rlk.b, ctx, rlk.ext_ctx, ctx.drop_last(1),
        digit_size=1,
    )

    fn = build_mul_relin_rescale_coeff(mesh, ctx, rlk.ext_ctx, digit_size=1)
    shard = lambda x: jax.device_put(
        x, NamedSharding(mesh, P(None, None, None, "coeff"))
    )
    got0, got1 = fn(
        *[shard(jnp.asarray(a)) for a in args],
        shard(jnp.asarray(rlk.a)), shard(jnp.asarray(rlk.b)),
    )
    np.testing.assert_array_equal(np.asarray(got0), np.asarray(want0))
    np.testing.assert_array_equal(np.asarray(got1), np.asarray(want1))


def _rotate_setup(degree, L, bits, seed):
    ctx = CkksContext.build(generate_primes(bits, L, degree), degree)
    eng = CkksEngine(ctx, CkksParams(3.2, degree // 2, bits))
    rng = make_rng(seed)
    sk = eng.generate_secret_key(rng)
    rotk = eng.generate_gadget_rotation_key(sk, 1, rng, digit_size=1)
    from toy_heaan_ckks_tpu.types import Ciphertext

    c0 = Poly.sample_uniform(ctx, make_rng(seed + 1)).to_ntt_domain()
    c1 = Poly.sample_uniform(ctx, make_rng(seed + 2)).to_ntt_domain()
    ct = Ciphertext(c0=c0, c1=c1, logp=bits, logq=ctx.total_bits())
    want = CkksEngine.rotate_ciphertext(ct, rotk)
    two_n = 2 * degree
    perm = ctx.automorphism_table_ntt(pow(5, 1, two_n))
    return ctx, eng, rotk, ct, want, perm


def test_coeff_sharded_rotation_bit_exact():
    """Coefficient-sharded rotation (automorphism + gadget key switch)
    vs CkksEngine.rotate_ciphertext: identical residues. Reference
    semantics: src/crypto/engine.rs:401-463, here with the ring axis
    sharded over 8 devices."""
    from toy_heaan_ckks_tpu.parallel.coeff_composite import (
        build_rotate_coeff,
    )

    degree, L = 1024, 3
    mesh = _mesh()
    ctx, eng, rotk, ct, want, perm = _rotate_setup(degree, L, 30, 51)

    fn = build_rotate_coeff(mesh, ctx, rotk.ext_ctx, perm, digit_size=1)
    shard = lambda x: jax.device_put(
        x, NamedSharding(mesh, P(None, None, "coeff"))
    )
    lo = lambda x: jnp.asarray(x)[..., 0, :]
    got0, got1 = fn(
        shard(lo(ct.c0.data)[None]), shard(lo(ct.c1.data)[None]),
        shard(lo(rotk.a)), shard(lo(rotk.b)),
    )
    np.testing.assert_array_equal(
        np.asarray(got0)[0], np.asarray(lo(want.c0.data))
    )
    np.testing.assert_array_equal(
        np.asarray(got1)[0], np.asarray(lo(want.c1.data))
    )


def test_coeff_sharded_rotation_wide_bit_exact():
    """Wide-chain coefficient-sharded rotation vs the single-chip
    engine path: identical limb arrays."""
    from toy_heaan_ckks_tpu.parallel.coeff_composite import (
        build_rotate_coeff,
    )

    degree, L = 512, 3
    mesh = _mesh()
    ctx, eng, rotk, ct, want, perm = _rotate_setup(degree, L, 61, 61)

    fn = build_rotate_coeff(mesh, ctx, rotk.ext_ctx, perm, digit_size=1)
    shard = lambda x: jax.device_put(
        x, NamedSharding(mesh, P(None, None, None, "coeff"))
    )
    got0, got1 = fn(
        shard(jnp.asarray(ct.c0.data)[None]),
        shard(jnp.asarray(ct.c1.data)[None]),
        shard(jnp.asarray(rotk.a)), shard(jnp.asarray(rotk.b)),
    )
    np.testing.assert_array_equal(
        np.asarray(got0)[0], np.asarray(want.c0.data)
    )
    np.testing.assert_array_equal(
        np.asarray(got1)[0], np.asarray(want.c1.data)
    )
