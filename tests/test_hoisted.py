"""Hoisted rotations: one gadget decomposition, many rotation keys.

The decomposition commutes with automorphisms only up to per-digit
multiples of Q_t (the approximate-basis-extension overflow changes under
the automorphism's sign flips), so hoisted outputs are NOT residue-equal
to ``rotate_ciphertext`` — but those Q_t multiples vanish against the
key's P*T_t*s' plaintext, leaving the same key-switch-noise-level result.
The contract here is therefore decode accuracy: each hoisted rotation
decodes to the rotated slots within the rotation-noise bound, and agrees
with the per-rotation path to key-switch noise.
"""

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
from toy_heaan_ckks_tpu.models.algorithms import sum_slots_hoisted


def _setup(degree=64, count=4, bits=30, digit_size=1):
    ctx = CkksContext.build(generate_primes(bits, count, degree), degree)
    eng = CkksEngine(ctx, CkksParams(3.2, degree // 2, bits))
    rng = make_rng(17)
    sk = eng.generate_secret_key(rng)
    pk = eng.generate_public_key(sk, rng)
    return ctx, eng, sk, pk, rng


@pytest.mark.parametrize("digit_size", [1, 2])
def test_hoisted_matches_per_rotation_bit_exact(digit_size):
    degree = 64
    ctx, eng, sk, pk, rng = _setup(degree=degree, digit_size=digit_size)
    specials = None
    rotks = []
    for k in (1, 3, 7):
        rotk = eng.generate_gadget_rotation_key(
            sk, k, rng, digit_size=digit_size
        )
        if specials is None:
            specials = tuple(rotk.ext_ctx.moduli[ctx.num_channels:])
        else:
            # hoisting requires a shared extended basis across keys
            from toy_heaan_ckks_tpu.keys import RnsGadgetRotationKey

            rotk = RnsGadgetRotationKey.generate(
                sk, k, float(np.sqrt(3.2)), ctx, rng,
                specials=specials, digit_size=digit_size,
            )
        rotks.append(rotk)

    enc = CkksEncoder(degree, 30)
    a = np.linspace(0.1, 0.9, degree // 2)
    ct = eng.encrypt(enc.encode(a, ctx), pk, ctx.total_bits(), rng)

    hoisted = CkksEngine.rotate_hoisted(ct, rotks)
    for rotk, got in zip(rotks, hoisted):
        ref = CkksEngine.rotate_ciphertext(ct, rotk)
        out = enc.decode(CkksEngine.decrypt(got, sk))
        ref_out = enc.decode(CkksEngine.decrypt(ref, sk))
        np.testing.assert_allclose(
            out, np.roll(a, -rotk.rotation), atol=1e-4
        )
        # the two paths agree to key-switch noise
        np.testing.assert_allclose(out, ref_out, atol=1e-5)


@pytest.mark.parametrize("digit_size", [1, 2])
def test_rotate_sum_hoisted_matches_rotation_sum(digit_size):
    """Double-hoisted sum (one shared mod-down) vs summing the
    per-rotation hoisted outputs: same value to key-switch noise."""
    degree = 64
    ctx, eng, sk, pk, rng = _setup(degree=degree, digit_size=digit_size)
    from toy_heaan_ckks_tpu.keys import RnsGadgetRotationKey

    specials = None
    rotks = []
    for k in (1, 2, 5):
        if specials is None:
            rk = eng.generate_gadget_rotation_key(
                sk, k, rng, digit_size=digit_size
            )
            specials = tuple(rk.ext_ctx.moduli[ctx.num_channels:])
        else:
            rk = RnsGadgetRotationKey.generate(
                sk, k, float(np.sqrt(3.2)), ctx, rng,
                specials=specials, digit_size=digit_size,
            )
        rotks.append(rk)

    enc = CkksEncoder(degree, 30)
    a = np.linspace(-0.4, 0.8, degree // 2)
    ct = eng.encrypt(enc.encode(a, ctx), pk, ctx.total_bits(), rng)

    summed = CkksEngine.rotate_sum_hoisted(ct, rotks)
    out = enc.decode(CkksEngine.decrypt(summed, sk))

    expect = sum(np.roll(a, -k.rotation) for k in rotks)
    np.testing.assert_allclose(out[: len(a)], expect, atol=1e-3)

    ref_cts = CkksEngine.rotate_hoisted(ct, rotks)
    acc = ref_cts[0]
    for r in ref_cts[1:]:
        acc = CkksEngine.add_ciphertexts(acc, r)
    ref = enc.decode(CkksEngine.decrypt(acc, sk))
    np.testing.assert_allclose(out[: len(a)], ref[: len(a)], atol=1e-5)


def test_rotate_weighted_sum_hoisted_matvec():
    """Double-hoisted diagonal-method weighted sum: one decomposition,
    one mod-down, plaintext weights applied in the extended basis."""
    degree = 64
    slots = degree // 2
    ctx, eng, sk, pk, rng = _setup(degree=degree)
    from toy_heaan_ckks_tpu.keys import RnsGadgetRotationKey

    offsets = (1, 2, 3)
    specials = None
    rotks = []
    for k in offsets:
        if specials is None:
            rk = eng.generate_gadget_rotation_key(sk, k, rng)
            specials = tuple(rk.ext_ctx.moduli[ctx.num_channels:])
        else:
            rk = RnsGadgetRotationKey.generate(
                sk, k, float(np.sqrt(3.2)), ctx, rng, specials=specials
            )
        rotks.append(rk)

    enc = CkksEncoder(degree, 30)
    m_rng = np.random.default_rng(5)
    x = m_rng.uniform(-1.0, 1.0, slots)
    diags = [m_rng.uniform(-0.5, 0.5, slots) for _ in offsets]
    ct = eng.encrypt(enc.encode(x, ctx), pk, ctx.total_bits(), rng)

    pts = [enc.encode(d, rotks[0].ext_ctx) for d in diags]
    out_ct = CkksEngine.rotate_weighted_sum_hoisted(ct, rotks, pts)
    out_ct = CkksEngine.rescale_ciphertext(out_ct)
    out = enc.decode(
        CkksEngine.decrypt(out_ct, sk.reduce_to(out_ct.ctx))
    )[:slots]

    expect = sum(d * np.roll(x, -k) for d, k in zip(diags, offsets))
    np.testing.assert_allclose(out, expect, atol=1e-3)


def test_sum_slots_hoisted_decodes_to_slot_sum():
    degree = 64
    slots = degree // 2
    ctx, eng, sk, pk, rng = _setup(degree=degree)
    enc = CkksEncoder(degree, 30)
    a = np.linspace(0.0, 1.0, slots)
    ct = eng.encrypt(enc.encode(a, ctx), pk, ctx.total_bits(), rng)

    specials = None
    rotks = []
    from toy_heaan_ckks_tpu.keys import RnsGadgetRotationKey

    for k in range(1, slots):
        if specials is None:
            rk = eng.generate_gadget_rotation_key(sk, k, rng)
            specials = tuple(rk.ext_ctx.moduli[ctx.num_channels:])
        else:
            rk = RnsGadgetRotationKey.generate(
                sk, k, float(np.sqrt(3.2)), ctx, rng, specials=specials
            )
        rotks.append(rk)

    out_ct = sum_slots_hoisted(ct, rotks)
    out = enc.decode(CkksEngine.decrypt(out_ct, sk))[:slots]
    np.testing.assert_allclose(out, np.full(slots, a.sum()), atol=1e-3)
