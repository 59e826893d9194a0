"""Sharding edge cases on the virtual 8-device CPU mesh.

Round-1 coverage only exercised digit_size=1 with L equal to the channel
axis; these tests pin the awkward ratios: digit counts that do not match
the channel axis, L not divisible by the axis, and the explicit
out_shardings on the rescaled (L-1 channel) output. The gate is unchanged
(SURVEY.md §7 stage 10): bit-exact residues vs the single-device run.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from toy_heaan_ckks_tpu import (
    CkksContext,
    CkksEngine,
    CkksParams,
    generate_primes,
)
from toy_heaan_ckks_tpu.math.sampling import make_rng
from toy_heaan_ckks_tpu.ops.poly import Poly
from toy_heaan_ckks_tpu.parallel.mesh import (
    ct_spec_for,
    key_spec_for,
    make_ckks_mesh,
)
from toy_heaan_ckks_tpu.parallel.sharded import (
    batched_mul_relin_rescale,
    build_mul_relin_rescale,
)

DEGREE = 64


def _setup(L, digit_size, batch=2):
    primes = generate_primes(30, L, DEGREE)
    ctx = CkksContext.build(primes, DEGREE)
    engine = CkksEngine(ctx, CkksParams(3.2, DEGREE // 2, 30))
    rng = make_rng(321)
    sk = engine.generate_secret_key(rng)
    rlk = engine.generate_gadget_relin_key(sk, rng, digit_size=digit_size)

    def rand_batch(seed):
        r = make_rng(seed)
        return jnp.stack(
            [Poly.sample_uniform(ctx, r).to_ntt_domain().data
             for _ in range(batch)]
        )

    return ctx, rlk, tuple(rand_batch(s) for s in (1, 2, 3, 4))


@pytest.mark.parametrize("L,digit_size,batch_axis", [
    (4, 2, 2),   # D=2 digits on a 4-wide channel axis (uneven key shard)
    (4, 4, 2),   # D=1: key effectively replicated along the axis
    (5, 1, 2),   # L=5 not divisible by the 4-wide channel axis
    (3, 2, 2),   # L=3, D=2, both awkward on a 4-wide axis
    (6, 4, 1),   # 8-wide channel axis, L=6, D=2
])
def test_sharded_mul_awkward_ratios_bit_exact(L, digit_size, batch_axis):
    assert len(jax.devices()) >= 8
    ctx, rlk, (c0a, c1a, c0b, c1b) = _setup(L, digit_size)
    child = ctx.drop_last(1)

    ref0, ref1 = batched_mul_relin_rescale(
        (c0a, c1a), (c0b, c1b), rlk, ctx, child
    )

    mesh = make_ckks_mesh(8, batch=batch_axis)
    fn = build_mul_relin_rescale(
        mesh, ctx, rlk.ext_ctx, digit_size=rlk.digit_size
    )
    put = lambda x: jax.device_put(x, ct_spec_for(mesh, L))
    kput = lambda x: jax.device_put(x, key_spec_for(mesh, rlk.a.shape[0]))
    out0, out1 = fn(
        put(c0a), put(c1a), put(c0b), put(c1b), kput(rlk.a), kput(rlk.b)
    )
    # explicit out_shardings: channel-sharded when L-1 divides the axis,
    # replicated on the channel axis otherwise
    assert out0.sharding.spec == ct_spec_for(mesh, L - 1).spec
    np.testing.assert_array_equal(np.asarray(out0), np.asarray(ref0))
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(ref1))


def test_multihost_mesh_scaffolding():
    """(host, batch, channel) mesh: shapes, specs, and a sharded multiply
    on the virtual devices (2 'hosts' x 4 chips emulated on the 8-device
    CPU mesh — DCN semantics cannot be exercised single-host, but the
    GSPMD program must compile and stay bit-exact)."""
    from toy_heaan_ckks_tpu.parallel.mesh import (
        ct_spec_mh,
        key_spec_mh,
        make_multihost_mesh,
    )
    from toy_heaan_ckks_tpu.parallel.sharded import (
        _mul_relin_rescale_arrays,
    )
    import functools

    mesh = make_multihost_mesh(hosts=2, chips_per_host=4, batch_per_host=1)
    assert mesh.devices.shape == (2, 1, 4)
    with pytest.raises(ValueError):
        make_multihost_mesh(hosts=3, chips_per_host=4)
    with pytest.raises(ValueError):
        make_multihost_mesh(hosts=2, chips_per_host=4, batch_per_host=3)

    L = 4
    ctx, rlk, (c0a, c1a, c0b, c1b) = _setup(L, 1, batch=4)
    child = ctx.drop_last(1)
    ref0, ref1 = batched_mul_relin_rescale(
        (c0a, c1a), (c0b, c1b), rlk, ctx, child
    )
    data_s = ct_spec_mh(mesh)
    key_s = key_spec_mh(mesh)
    fn = jax.jit(
        functools.partial(
            _mul_relin_rescale_arrays,
            ctx=ctx, ext_ctx=rlk.ext_ctx, child_ctx=child, digit_size=1,
        ),
        in_shardings=(data_s,) * 4 + (key_s, key_s),
    )
    put = lambda x: jax.device_put(x, data_s)
    kput = lambda x: jax.device_put(x, key_s)
    out0, out1 = fn(
        put(c0a), put(c1a), put(c0b), put(c1b), kput(rlk.a), kput(rlk.b)
    )
    np.testing.assert_array_equal(np.asarray(out0), np.asarray(ref0))
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(ref1))
