"""Property tests for the uint32-pair u64 arithmetic and Montgomery modular ops.

Oracle: exact Python big-int arithmetic. Covers all prime sizes the
reference exercises (30/31/40/61/62-bit chains).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from toy_heaan_ckks_tpu.math.primes import generate_primes
from toy_heaan_ckks_tpu.ops import u64 as u
from toy_heaan_ckks_tpu.ops import modular as mm


def rand_u64(rng, shape, bound=1 << 64):
    vals = rng.integers(0, bound, size=shape, dtype=np.uint64, endpoint=False)
    return vals


def split(vals):
    lo = jnp.asarray((vals & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    hi = jnp.asarray((vals >> np.uint64(32)).astype(np.uint32))
    return lo, hi


def join(pair):
    lo = np.asarray(pair[0]).astype(object)
    hi = np.asarray(pair[1]).astype(object)
    return lo + (hi << 32)


@pytest.fixture(scope="module")
def rng():
    return np.random.Generator(np.random.PCG64(1234))


def test_umul32(rng):
    a = rng.integers(0, 1 << 32, size=1000, dtype=np.uint64)
    b = rng.integers(0, 1 << 32, size=1000, dtype=np.uint64)
    lo, hi = u.umul32(jnp.asarray(a.astype(np.uint32)), jnp.asarray(b.astype(np.uint32)))
    got = np.asarray(lo).astype(object) + (np.asarray(hi).astype(object) << 32)
    want = a.astype(object) * b.astype(object)
    assert (got == want).all()


def test_add_sub_cmp64(rng):
    a = rand_u64(rng, 1000)
    b = rand_u64(rng, 1000)
    ap, bp = split(a), split(b)
    assert (join(u.add64(ap, bp)) == (a.astype(object) + b.astype(object)) % (1 << 64)).all()
    assert (join(u.sub64(ap, bp)) == (a.astype(object) - b.astype(object)) % (1 << 64)).all()
    assert (np.asarray(u.geq64(ap, bp)) == (a >= b)).all()


def test_mul64_128(rng):
    a = rand_u64(rng, 1000)
    b = rand_u64(rng, 1000)
    x = u.mul64_128(split(a), split(b))
    got = sum(np.asarray(x[i]).astype(object) << (32 * i) for i in range(4))
    want = a.astype(object) * b.astype(object)
    assert (got == want).all()


def test_mullo64(rng):
    a = rand_u64(rng, 1000)
    b = rand_u64(rng, 1000)
    got = join(u.mullo64(split(a), split(b)))
    want = (a.astype(object) * b.astype(object)) % (1 << 64)
    assert (got == want).all()


@pytest.mark.parametrize("bits", [30, 31, 40, 61, 62])
def test_mont_mul_and_modops(rng, bits):
    primes = generate_primes(bits, 3, 1024)
    chain = mm.ModulusChain.build(primes)
    L, N = 3, 256
    q_arr = np.array(primes, dtype=object)

    a_plain = np.empty((L, N), dtype=object)
    b_plain = np.empty((L, N), dtype=object)
    for i, q in enumerate(primes):
        a_plain[i] = rng.integers(0, q, size=N, dtype=np.uint64).astype(object)
        b_plain[i] = rng.integers(0, q, size=N, dtype=np.uint64).astype(object)

    a = jnp.asarray(mm.pack_residues(a_plain))
    b = jnp.asarray(mm.pack_residues(b_plain))

    # to_mont / from_mont roundtrip
    am = mm.to_mont(a, chain)
    back = mm.unpack_residues(np.asarray(mm.from_mont(am, chain)))
    assert (back == a_plain).all()
    # to_mont is x * R mod q (R = 2^32 on the small fast path)
    radix = 1 << chain.radix_bits
    assert chain.small == (bits <= 31)
    am_val = mm.unpack_residues(np.asarray(am))
    assert (am_val == (a_plain * (radix % q_arr[:, None])) % q_arr[:, None]).all()

    # mont_mul in Montgomery domain == plain product
    bm = mm.to_mont(b, chain)
    prod_m = mm.mont_mul(am, bm, chain)
    prod = mm.unpack_residues(np.asarray(mm.from_mont(prod_m, chain)))
    assert (prod == (a_plain * b_plain) % q_arr[:, None]).all()

    # add/sub/neg
    s = mm.unpack_residues(np.asarray(mm.add_mod(a, b, chain)))
    assert (s == (a_plain + b_plain) % q_arr[:, None]).all()
    d = mm.unpack_residues(np.asarray(mm.sub_mod(a, b, chain)))
    assert (d == (a_plain - b_plain) % q_arr[:, None]).all()
    n = mm.unpack_residues(np.asarray(mm.neg_mod(a, chain)))
    assert (n == (-a_plain) % q_arr[:, None]).all()

    # reduce_u64: arbitrary u64 values reduced mod each q
    x = rand_u64(rng, (L, N))
    xs = jnp.asarray(mm.pack_residues(x.astype(object)))
    red = mm.unpack_residues(np.asarray(mm.reduce_u64(xs, chain)))
    assert (red == x.astype(object) % q_arr[:, None]).all()


def test_chain_drop_last_and_total_bits():
    primes = generate_primes(31, 4, 16)
    chain = mm.ModulusChain.build(primes)
    assert chain.total_bits() == sum(p.bit_length() - 1 for p in primes)
    sub = chain.drop_last(1)
    assert sub.moduli == tuple(primes[:3])
    assert sub.q.shape[0] == 3
    with pytest.raises(ValueError):
        chain.drop_last(4)
