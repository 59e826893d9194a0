"""Coefficient-axis sharded NTT vs the single-chip path (bit-exact).

Runs on the 8-virtual-device CPU mesh from conftest; asserts the
distributed butterfly network (ppermute cross-stages + local stages)
produces residues identical to the unsharded tree NTT — the bit-exactness
gate of SURVEY.md §7 stage 10.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from toy_heaan_ckks_tpu import CkksContext, generate_primes
from toy_heaan_ckks_tpu.math.sampling import make_rng
from toy_heaan_ckks_tpu.ops import poly as pops
from toy_heaan_ckks_tpu.ops.poly import Poly
from toy_heaan_ckks_tpu.parallel.coeff_ntt import build_coeff_sharded_ntt

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _mesh():
    return Mesh(np.array(jax.devices()[:8]), axis_names=("coeff",))


@pytest.mark.parametrize("degree,count", [(1024, 3), (4096, 2)])
def test_forward_matches_single_chip(degree, count):
    mesh = _mesh()
    ctx = CkksContext.build(generate_primes(30, count, degree), degree)
    p = Poly.sample_uniform(ctx, make_rng(5))
    lo = p.data[:, 0, :]
    sharded_lo = jax.device_put(
        lo, NamedSharding(mesh, P(None, "coeff"))
    )
    fwd = build_coeff_sharded_ntt(mesh, ctx.moduli, degree, inverse=False)
    got = np.asarray(fwd(sharded_lo))
    want = np.asarray(pops.to_ntt(p.data, ctx))[:, 0, :]
    np.testing.assert_array_equal(got, want)


def test_roundtrip_and_inverse_match(degree=2048, count=2):
    mesh = _mesh()
    ctx = CkksContext.build(generate_primes(30, count, degree), degree)
    p = Poly.sample_uniform(ctx, make_rng(9))
    lo = jax.device_put(
        p.data[:, 0, :], NamedSharding(mesh, P(None, "coeff"))
    )
    fwd = build_coeff_sharded_ntt(mesh, ctx.moduli, degree, inverse=False)
    inv = build_coeff_sharded_ntt(mesh, ctx.moduli, degree, inverse=True)
    ntt = fwd(lo)
    want_ntt = np.asarray(pops.to_ntt(p.data, ctx))[:, 0, :]
    np.testing.assert_array_equal(np.asarray(ntt), want_ntt)
    back = inv(ntt)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(p.data[:, 0, :]))


def test_batched_lead_dims(degree=1024, count=2):
    mesh = _mesh()
    ctx = CkksContext.build(generate_primes(30, count, degree), degree)
    d = jnp.stack(
        [Poly.sample_uniform(ctx, make_rng(s)).data[:, 0, :] for s in range(3)]
    )
    sharded = jax.device_put(
        d, NamedSharding(mesh, P(None, None, "coeff"))
    )
    fwd = build_coeff_sharded_ntt(mesh, ctx.moduli, degree, inverse=False)
    got = np.asarray(fwd(sharded))
    want = np.asarray(pops.to_ntt(jnp.stack(
        [jnp.stack([row, jnp.zeros_like(row)], axis=-2) for row in d]
    ), ctx))[..., 0, :]
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("inverse", [False, True])
def test_pallas_local_tail_bit_exact(inverse, degree=1024, count=2):
    """Local stages delegated to the fused Pallas tail kernel (interpret
    mode) must match the all-jnp shard_map path and the single-chip NTT."""
    mesh = _mesh()
    ctx = CkksContext.build(generate_primes(30, count, degree), degree)
    p = Poly.sample_uniform(ctx, make_rng(13))
    lo = p.data[:, 0, :]
    if inverse:
        lo = np.asarray(pops.to_ntt(p.data, ctx))[:, 0, :]
    sharded = jax.device_put(
        jnp.asarray(lo), NamedSharding(mesh, P(None, "coeff"))
    )
    ref_fn = build_coeff_sharded_ntt(
        mesh, ctx.moduli, degree, inverse=inverse, use_pallas=False
    )
    pal_fn = build_coeff_sharded_ntt(
        mesh, ctx.moduli, degree, inverse=inverse,
        use_pallas=True, interpret=True,
    )
    ref = np.asarray(ref_fn(sharded))
    got = np.asarray(pal_fn(sharded))
    np.testing.assert_array_equal(got, ref)
    single = (
        np.asarray(pops.to_coeff(p.data.at[:, 0, :].set(lo), ctx))
        if inverse else np.asarray(pops.to_ntt(p.data, ctx))
    )[:, 0, :]
    np.testing.assert_array_equal(got, single)


@pytest.mark.parametrize("inverse", [False, True])
def test_remote_dma_cross_stage_bit_exact(inverse, degree=1024, count=2):
    """Cross-shard stages via the Pallas async-remote-copy exchange
    (interpret mode) must match the ppermute path bit-for-bit."""
    mesh = _mesh()
    ctx = CkksContext.build(generate_primes(30, count, degree), degree)
    p = Poly.sample_uniform(ctx, make_rng(23))
    lo = p.data[:, 0, :]
    sharded = jax.device_put(
        jnp.asarray(lo), NamedSharding(mesh, P(None, "coeff"))
    )
    ref_fn = build_coeff_sharded_ntt(
        mesh, ctx.moduli, degree, inverse=inverse, use_pallas=False
    )
    dma_fn = build_coeff_sharded_ntt(
        mesh, ctx.moduli, degree, inverse=inverse,
        use_pallas=False, remote_dma=True, interpret=True,
    )
    np.testing.assert_array_equal(
        np.asarray(dma_fn(sharded)), np.asarray(ref_fn(sharded))
    )
