"""Multi-device sharding tests on the virtual 8-device CPU mesh.

Gate (SURVEY.md §7 stage 10): sharded execution must produce bit-exact
residues vs the single-device run — feasible because everything is exact
integer arithmetic.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from toy_heaan_ckks_tpu import CkksContext, CkksEngine, CkksParams, generate_primes
from toy_heaan_ckks_tpu.keys import KeyLadder
from toy_heaan_ckks_tpu.math.sampling import make_rng
from toy_heaan_ckks_tpu.parallel.mesh import make_ckks_mesh, ct_spec, key_spec
from toy_heaan_ckks_tpu.parallel.sharded import (
    batched_mul_relin_rescale,
    build_mul_relin_rescale,
    build_rotate,
)

DEGREE = 64
L = 4


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) >= 8, "tests need 8 virtual CPU devices"
    primes = generate_primes(30, L, DEGREE)
    ctx = CkksContext.build(primes, DEGREE)
    params = CkksParams(3.2, DEGREE // 2, 30)
    engine = CkksEngine(ctx, params)
    rng = make_rng(123)
    sk = engine.generate_secret_key(rng)
    rlk = engine.generate_gadget_relin_key(sk, rng)
    rotk = engine.generate_gadget_rotation_key(sk, 1, rng)

    # batch of 2 random NTT-domain ciphertext pairs
    from toy_heaan_ckks_tpu.ops.poly import Poly

    def rand_batch(seed):
        r = make_rng(seed)
        polys = [Poly.sample_uniform(ctx, r).to_ntt_domain().data for _ in range(2)]
        return jnp.stack(polys)

    c0a, c1a, c0b, c1b = (rand_batch(s) for s in (1, 2, 3, 4))
    return ctx, rlk, rotk, (c0a, c1a, c0b, c1b)


def test_sharded_mul_matches_single_device(setup):
    ctx, rlk, rotk, (c0a, c1a, c0b, c1b) = setup
    child = ctx.drop_last(1)

    ref0, ref1 = batched_mul_relin_rescale(
        (c0a, c1a), (c0b, c1b), rlk, ctx, child
    )

    mesh = make_ckks_mesh(8, batch=2)
    fn = build_mul_relin_rescale(mesh, ctx, rlk.ext_ctx)
    put = lambda x: jax.device_put(x, ct_spec(mesh))
    kput = lambda x: jax.device_put(x, key_spec(mesh))
    out0, out1 = fn(put(c0a), put(c1a), put(c0b), put(c1b), kput(rlk.a), kput(rlk.b))

    assert (np.asarray(out0) == np.asarray(ref0)).all()
    assert (np.asarray(out1) == np.asarray(ref1)).all()


def test_sharded_rotate_matches_single_device(setup):
    ctx, rlk, rotk, (c0a, c1a, _, _) = setup
    from toy_heaan_ckks_tpu.engine import _gadget_key_switch
    from toy_heaan_ckks_tpu.ops import modular as mm
    from toy_heaan_ckks_tpu.ops import poly as pops

    import jax.numpy as jnp

    exponent = pow(5, rotk.rotation % (DEGREE // 2), 2 * DEGREE)
    perm = ctx.automorphism_table_ntt(exponent)

    # single-device reference
    refs = []
    for i in range(2):
        c0r = jnp.take(c0a[i], perm, axis=-1)
        c1r = jnp.take(c1a[i], perm, axis=-1)
        ks0, ks1 = _gadget_key_switch(c1r, rotk.a, rotk.b, ctx, rotk.ext_ctx, digit_size=rotk.digit_size)
        refs.append((mm.add_mod(c0r, ks0, ctx.chain), ks1))

    mesh = make_ckks_mesh(8, batch=2)
    fn = build_rotate(mesh, ctx, rotk.ext_ctx, perm)
    put = lambda x: jax.device_put(x, ct_spec(mesh))
    kput = lambda x: jax.device_put(x, key_spec(mesh))
    out0, out1 = fn(put(c0a), put(c1a), kput(rotk.a), kput(rotk.b))

    for i in range(2):
        assert (np.asarray(out0[i]) == np.asarray(refs[i][0])).all()
        assert (np.asarray(out1[i]) == np.asarray(refs[i][1])).all()


def test_mesh_shapes():
    mesh = make_ckks_mesh(8, batch=2)
    assert mesh.devices.shape == (2, 4)
    mesh1 = make_ckks_mesh(8, batch=1)
    assert mesh1.devices.shape == (1, 8)
    with pytest.raises(ValueError):
        make_ckks_mesh(8, batch=3)
