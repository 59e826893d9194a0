"""MXU (matmul) NTT formulation vs the staged jnp oracle — bit-exact.

The 4-step factorization (ops/ntt_mxu.py) re-expresses the tree-order
negacyclic transform as two modular matrix products; both the pure-jnp
entry and the fused Pallas kernel must produce uint32 residues identical
to ops/ntt.py (same oracle discipline as every other NTT implementation
in this repo; reference: src/rings/backends/rns_ntt/poly.rs:960-975).
"""

import numpy as np
import pytest

from toy_heaan_ckks_tpu import CkksContext, generate_primes
from toy_heaan_ckks_tpu.math.sampling import make_rng
from toy_heaan_ckks_tpu.ops import poly as pops
from toy_heaan_ckks_tpu.ops.ntt_mxu import (
    ntt_mxu,
    ntt_mxu_pallas,
    supported_mxu,
)
from toy_heaan_ckks_tpu.ops.poly import Poly


@pytest.mark.parametrize("degree,bits", [(1024, 31), (8192, 29)])
def test_mxu_jnp_matches_oracle(degree, bits):
    ctx = CkksContext.build(generate_primes(bits, 3, degree), degree)
    moduli = tuple(int(m) for m in ctx.moduli)
    assert supported_mxu(degree, moduli)
    p = Poly.sample_uniform(ctx, make_rng(3))
    ref_f = pops.forward_ntt(p.data, ctx.ntt, ctx.chain)
    got_f = ntt_mxu(p.data[..., 0, :], moduli, degree, False)
    np.testing.assert_array_equal(
        np.asarray(ref_f[..., 0, :]), np.asarray(got_f)
    )
    got_i = ntt_mxu(ref_f[..., 0, :], moduli, degree, True)
    np.testing.assert_array_equal(
        np.asarray(p.data[..., 0, :]), np.asarray(got_i)
    )


def test_mxu_pallas_matches_oracle_and_fold(degree=1024, bits=31):
    from toy_heaan_ckks_tpu.ops import small_fast as sf

    ctx = CkksContext.build(generate_primes(bits, 3, degree), degree)
    moduli = tuple(int(m) for m in ctx.moduli)
    p = Poly.sample_uniform(ctx, make_rng(7))
    ref_f = pops.forward_ntt(p.data, ctx.ntt, ctx.chain)
    got_f = ntt_mxu_pallas(
        p.data[None, ..., 0, :], moduli, degree, False, interpret=True
    )
    np.testing.assert_array_equal(
        np.asarray(ref_f[None, ..., 0, :]), np.asarray(got_f)
    )
    got_i = ntt_mxu_pallas(
        ref_f[None, ..., 0, :], moduli, degree, True, interpret=True
    )
    np.testing.assert_array_equal(
        np.asarray(p.data[None, ..., 0, :]), np.asarray(got_i)
    )
    # fold path: plain output == inv_ntt_fold (the composite entry point)
    post = tuple((q - 1) // 3 for q in moduli)
    ref_fold = sf.inv_ntt_fold(
        ref_f[..., 0, :], moduli, degree, post, interpret=True
    )
    got_fold = ntt_mxu_pallas(
        ref_f[None, ..., 0, :], moduli, degree, True, post=post,
        interpret=True,
    )
    np.testing.assert_array_equal(
        np.asarray(ref_fold[None]), np.asarray(got_fold)
    )


def test_mxu_envelope():
    """Exactness envelope: the f32 limb dots stay exact only while the
    contraction length K keeps K * 255^2 < 2^24 (K <= 256)."""
    small = (1073741827,)  # any <2^31 placeholder moduli for the check
    assert supported_mxu(1 << 10, small)
    assert supported_mxu(1 << 14, small)
    assert supported_mxu(1 << 15, small)  # layout (256, 128)
    assert not supported_mxu(1 << 16, small)  # K = 512 would be inexact
    assert not supported_mxu(1 << 14, (1 << 61,))  # wide chains excluded


def test_mxu_dispatch_env(monkeypatch):
    """CKKS_NTT_MXU=1 routes small_fast.ntt_lo through the MXU kernel
    (still bit-exact, interpret mode here)."""
    from toy_heaan_ckks_tpu.ops import small_fast as sf

    degree = 1024
    ctx = CkksContext.build(generate_primes(31, 2, degree), degree)
    moduli = tuple(int(m) for m in ctx.moduli)
    p = Poly.sample_uniform(ctx, make_rng(11))
    want = np.asarray(
        sf.ntt_lo(p.data[..., 0, :], moduli, degree, False, interpret=True)
    )
    monkeypatch.setenv("CKKS_NTT_MXU", "1")
    got = np.asarray(
        sf.ntt_lo(p.data[..., 0, :], moduli, degree, False, interpret=True)
    )
    np.testing.assert_array_equal(want, got)
