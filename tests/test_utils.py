"""Serialization round-trips, mod_switch, parameter doctrine, profiling."""

import numpy as np
import pytest

from toy_heaan_ckks_tpu import (
    CkksContext,
    CkksEncoder,
    CkksEngine,
    CkksParams,
    generate_primes,
)
from toy_heaan_ckks_tpu.math.sampling import make_rng
from toy_heaan_ckks_tpu.utils import serialization as ser
from toy_heaan_ckks_tpu.utils.params import MAX_LOGQP_128, build_modulus_chain
from toy_heaan_ckks_tpu.utils.profiling import (
    Stopwatch,
    mult_op_counts,
    ntt_butterfly_count,
)


@pytest.fixture(scope="module")
def setup():
    degree = 64
    ctx = CkksContext.build(generate_primes(30, 4, degree), degree)
    eng = CkksEngine(ctx, CkksParams(3.2, degree // 2, 30))
    rng = make_rng(7)
    sk = eng.generate_secret_key(rng)
    pk = eng.generate_public_key(sk, rng)
    rlk = eng.generate_gadget_relin_key(sk, rng, digit_size=2)
    rotk = eng.generate_gadget_rotation_key(sk, 1, rng, digit_size=2)
    enc = CkksEncoder(degree, 30)
    return ctx, eng, sk, pk, rlk, rotk, enc


def test_ciphertext_roundtrip(tmp_path, setup):
    ctx, eng, sk, pk, rlk, rotk, enc = setup
    vals = np.linspace(-1, 1, ctx.degree // 2)
    ct = eng.encrypt(enc.encode(vals, ctx), pk, ctx.total_bits(), make_rng(1))
    p = str(tmp_path / "ct.npz")
    ser.save_ciphertext(p, ct)
    ct2 = ser.load_ciphertext(p)
    assert ct2.logp == ct.logp and ct2.logq == ct.logq
    np.testing.assert_array_equal(
        np.asarray(ct.c0.data), np.asarray(ct2.c0.data)
    )
    out = enc.decode(eng.decrypt(ct2, sk))
    np.testing.assert_allclose(out[: len(vals)], vals, atol=1e-3)


def test_key_roundtrips(tmp_path, setup):
    ctx, eng, sk, pk, rlk, rotk, enc = setup
    ser.save_secret_key(str(tmp_path / "sk.npz"), sk)
    sk2 = ser.load_secret_key(str(tmp_path / "sk.npz"))
    np.testing.assert_array_equal(
        np.asarray(sk.poly.data), np.asarray(sk2.poly.data)
    )
    ser.save_public_key(str(tmp_path / "pk.npz"), pk)
    pk2 = ser.load_public_key(str(tmp_path / "pk.npz"))
    np.testing.assert_array_equal(np.asarray(pk.a.data), np.asarray(pk2.a.data))

    ser.save_relin_key(str(tmp_path / "rlk.npz"), rlk)
    rlk2 = ser.load_relin_key(str(tmp_path / "rlk.npz"))
    assert rlk2.digit_size == rlk.digit_size
    assert rlk2.ext_ctx.moduli == rlk.ext_ctx.moduli
    np.testing.assert_array_equal(np.asarray(rlk.b), np.asarray(rlk2.b))

    ser.save_rotation_key(str(tmp_path / "rot.npz"), rotk)
    rot2 = ser.load_rotation_key(str(tmp_path / "rot.npz"))
    assert rot2.rotation == rotk.rotation

    # loaded relin key still relinearizes correctly end-to-end
    vals = np.linspace(0.1, 0.9, ctx.degree // 2)
    ct = eng.encrypt(enc.encode(vals, ctx), pk2, ctx.total_bits(), make_rng(2))
    prod = eng.rescale_ciphertext(eng.mul_ciphertexts_gadget(ct, ct, rlk2))
    out = enc.decode(eng.decrypt(prod, sk2.reduce_to(prod.ctx)))
    np.testing.assert_allclose(out[: len(vals)], vals**2, atol=1e-3)


def test_mod_switch(setup):
    ctx, eng, sk, pk, rlk, rotk, enc = setup
    vals = np.linspace(-0.5, 0.5, ctx.degree // 2)
    ct = eng.encrypt(enc.encode(vals, ctx), pk, ctx.total_bits(), make_rng(3))
    sw = ct.mod_switch(1)
    assert sw.level == ct.level - 1
    assert sw.logp == ct.logp
    assert sw.logq == ct.logq - ctx.moduli[-1].bit_length()
    out = enc.decode(eng.decrypt(sw, sk.reduce_to(sw.ctx)))
    np.testing.assert_allclose(out[: len(vals)], vals, atol=1e-3)
    with pytest.raises(ValueError):
        ct.mod_switch(ctx.num_channels)


def test_build_modulus_chain():
    plan = build_modulus_chain(1024, scale_bits=30, depth=3, first_bits=40)
    assert len(plan.moduli) == 4
    assert plan.moduli[0].bit_length() == 40
    for p in plan.moduli[1:]:
        assert abs(p - (1 << 30)) < (1 << 22)  # scale-matched
        assert p % (2 * 1024) == 1  # NTT-friendly
    assert len(set(plan.moduli)) == 4
    # chain is usable end-to-end
    ctx = CkksContext.build(plan.moduli, 1024)
    assert ctx.num_channels == 4

    with pytest.raises(ValueError):
        build_modulus_chain(
            1024, scale_bits=30, depth=10, first_bits=60,
            enforce_security=True,
        )
    assert MAX_LOGQP_128[1024] == 27


def test_op_counts():
    assert ntt_butterfly_count(16, 1) == 8 * 4
    c = mult_op_counts(1 << 14, 8, 4)
    assert c["channel_ntts"] == 8 + 2 * 12 + 2 * 12 + 2 * 8
    assert c["butterflies"] == (1 << 13) * 14 * c["channel_ntts"]


def test_stopwatch():
    sw = Stopwatch()
    with sw.lap():
        sum(range(1000))
    assert sw.best >= 0.0


def test_conjugation_key_roundtrip(tmp_path):
    import numpy as np

    from toy_heaan_ckks_tpu import (
        CkksContext, CkksEngine, CkksParams, generate_primes,
    )
    from toy_heaan_ckks_tpu.math.sampling import make_rng
    from toy_heaan_ckks_tpu.utils.serialization import (
        load_conjugation_key,
        save_conjugation_key,
    )

    degree = 16
    ctx = CkksContext.build(generate_primes(30, 2, degree), degree)
    eng = CkksEngine(ctx, CkksParams(3.2, 8, 30))
    rng = make_rng(3)
    sk = eng.generate_secret_key(rng)
    cjk = eng.generate_conjugation_key(sk, rng)
    p = str(tmp_path / "cjk.npz")
    save_conjugation_key(p, cjk)
    back = load_conjugation_key(p)
    np.testing.assert_array_equal(np.asarray(back.a), np.asarray(cjk.a))
    np.testing.assert_array_equal(np.asarray(back.b), np.asarray(cjk.b))
    assert back.ext_ctx.moduli == cjk.ext_ctx.moduli
    assert back.digit_size == cjk.digit_size


def test_ciphertext_batching_roundtrip_and_batched_mul():
    """stack -> batched fused multiply -> unstack decodes like the
    per-ciphertext engine path."""
    import numpy as np

    from toy_heaan_ckks_tpu import (
        CkksContext, CkksEncoder, CkksEngine, CkksParams, generate_primes,
    )
    from toy_heaan_ckks_tpu.math.sampling import make_rng
    from toy_heaan_ckks_tpu.parallel.sharded import batched_mul_relin_rescale
    from toy_heaan_ckks_tpu.utils.batching import (
        stack_ciphertexts,
        unstack_ciphertexts,
    )

    degree = 64
    ctx = CkksContext.build(generate_primes(30, 4, degree), degree)
    eng = CkksEngine(ctx, CkksParams(3.2, degree // 2, 30))
    rng = make_rng(31)
    sk = eng.generate_secret_key(rng)
    pk = eng.generate_public_key(rng=rng, sk=sk)
    rlk = eng.generate_gadget_relin_key(sk, rng)
    enc = CkksEncoder(degree, 30)
    vals = [np.linspace(0.1, 0.9, degree // 2) * (i + 1) / 3 for i in range(3)]
    cts = [
        eng.encrypt(enc.encode(v, ctx), pk, ctx.total_bits(), rng)
        for v in vals
    ]
    c0, c1 = stack_ciphertexts(cts)
    o0, o1 = batched_mul_relin_rescale(
        (c0, c1), (c0, c1), rlk, ctx, ctx.drop_last(1)
    )
    q_last = ctx.moduli[-1]
    outs = unstack_ciphertexts(
        o0, o1, ctx.drop_last(1),
        logp=2 * 30 - q_last.bit_length(),
        logq=cts[0].logq - q_last.bit_length(),
        scale=cts[0].true_scale ** 2 / q_last,
    )
    sk_red = sk.reduce_to(ctx.drop_last(1))
    for v, ct in zip(vals, outs):
        got = enc.decode(CkksEngine.decrypt(ct, sk_red))
        np.testing.assert_allclose(got, v * v, atol=1e-4)

    # mixed bookkeeping is rejected
    import dataclasses
    import pytest

    from toy_heaan_ckks_tpu.errors import CkksError

    bad = dataclasses.replace(cts[1], logp=cts[1].logp + 1)
    with pytest.raises(CkksError):
        stack_ciphertexts([cts[0], bad])


def test_compressed_gadget_key_roundtrip(tmp_path):
    """Seeded key compression: a file written with compress=True omits the
    uniform ``a`` stack, is roughly half the size, and loads to a key with
    a bit-identical ``a`` (regenerated from the stored seed)."""
    import os

    import numpy as np

    from toy_heaan_ckks_tpu import (
        CkksContext,
        CkksEngine,
        CkksParams,
        generate_primes,
    )
    from toy_heaan_ckks_tpu.math.sampling import make_rng
    from toy_heaan_ckks_tpu.utils import serialization as ser

    degree = 64
    ctx = CkksContext.build(generate_primes(30, 4, degree), degree)
    eng = CkksEngine(ctx, CkksParams(3.2, degree // 2, 30))
    rng = make_rng(31)
    sk = eng.generate_secret_key(rng)
    rlk = eng.generate_gadget_relin_key(sk, rng, digit_size=2)
    rotk = eng.generate_gadget_rotation_key(sk, 1, rng, digit_size=2)

    full = tmp_path / "rlk_full.npz"
    small = tmp_path / "rlk_seed.npz"
    ser.save_relin_key(str(full), rlk)
    ser.save_relin_key(str(small), rlk, compress=True)
    # uniform a is incompressible noise -> the seeded file is ~half
    assert os.path.getsize(small) < 0.6 * os.path.getsize(full)

    back = ser.load_relin_key(str(small))
    np.testing.assert_array_equal(np.asarray(back.a), np.asarray(rlk.a))
    np.testing.assert_array_equal(np.asarray(back.b), np.asarray(rlk.b))
    assert back.a_seed == rlk.a_seed

    rp = tmp_path / "rot_seed.npz"
    ser.save_rotation_key(str(rp), rotk, compress=True)
    rot_back = ser.load_rotation_key(str(rp))
    np.testing.assert_array_equal(np.asarray(rot_back.a), np.asarray(rotk.a))
    assert rot_back.rotation == rotk.rotation


def test_noise_diagnostics():
    """Measured coefficient noise of a fresh encryption is small and
    grows through a multiply; slot precision shrinks correspondingly;
    budget_report tracks level bookkeeping."""
    import numpy as np

    from toy_heaan_ckks_tpu import (
        CkksContext,
        CkksEncoder,
        CkksEngine,
        CkksParams,
        generate_primes,
    )
    from toy_heaan_ckks_tpu.math.sampling import make_rng
    from toy_heaan_ckks_tpu.utils.noise import (
        budget_report,
        coefficient_noise_bits,
        slot_precision_bits,
    )

    degree, scale = 64, 30
    ctx = CkksContext.build(generate_primes(30, 4, degree), degree)
    eng = CkksEngine(ctx, CkksParams(3.2, 8, scale))
    rng = make_rng(3)
    sk = eng.generate_secret_key(rng)
    pk = eng.generate_public_key(sk, rng)
    rlk = eng.generate_gadget_relin_key(sk, rng)
    enc = CkksEncoder(degree, scale)

    a = np.linspace(-0.5, 0.5, degree // 2)
    pt = enc.encode(a, ctx)
    ct = eng.encrypt(pt, pk, ctx.total_bits(), rng)

    fresh_bits = coefficient_noise_bits(ct, sk, pt)
    # fresh noise ~ sigma * sqrt(hw * N): far below the 2^30 scale,
    # far above zero
    assert 2 < fresh_bits < 20

    prec_fresh = slot_precision_bits(ct, sk, enc, a.astype(complex))
    assert prec_fresh > 12  # ~1e-4 or better at Delta = 2^30

    ct2 = eng.rescale_ciphertext(eng.mul_ciphertexts_gadget(ct, ct, rlk))
    prec_mul = slot_precision_bits(ct2, sk, enc, (a * a).astype(complex))
    assert prec_mul > 8
    assert prec_mul < prec_fresh + 1  # precision cannot improve

    rep = budget_report(ct2, sk, enc, (a * a).astype(complex))
    assert rep["level"] == ctx.num_channels - 1
    assert rep["levels_remaining"] == ctx.num_channels - 2
    assert abs(rep["slot_precision_bits"] - prec_mul) < 1e-9
