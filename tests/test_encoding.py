"""Encoding tests: FFT path vs Vandermonde oracle, roundtrips, golden bounds.

Mirrors the reference's encoder tests (src/encoding/ckks_encoder.rs:161-228,
special_fft.rs:244-340) plus the encode_decode example's accuracy contract
(examples/encode_decode.rs: roundtrip error <~ 2/Delta)."""

import numpy as np
import pytest

from toy_heaan_ckks_tpu.context import CkksContext
from toy_heaan_ckks_tpu.encoding import embedding as emb
from toy_heaan_ckks_tpu.encoding.encoder import CkksEncoder
from toy_heaan_ckks_tpu.math.primes import generate_primes


@pytest.fixture(scope="module")
def ctx16():
    return CkksContext.build(generate_primes(31, 3, 16), 16)


def test_conjugate_slot_symmetry():
    vals = np.array([1.0 + 0.5j, -0.25 + 0.75j, 0.0 - 1.0j])
    slots = emb.build_conjugate_slots(vals, 8)
    assert slots[0] == vals[0] and slots[7] == np.conj(vals[0])
    assert slots[1] == vals[1] and slots[6] == np.conj(vals[1])
    assert slots[2] == vals[2] and slots[5] == np.conj(vals[2])
    assert slots[3] == 0 and slots[4] == 0
    with pytest.raises(ValueError):
        emb.build_conjugate_slots(np.zeros(5), 8)


def test_j_exponents_cover_all_odd_residues():
    for n in (8, 16, 64):
        exps = emb.j_exponents(n)
        assert sorted(exps) == list(range(1, 2 * n, 2))


def test_vandermonde_roundtrip():
    n = 8
    coeffs = np.arange(n) / 7.0 - 1j * np.arange(n) / 11.0
    slots = emb.special_dft(coeffs, n)
    rec = emb.special_idft(slots, n)
    np.testing.assert_allclose(rec, coeffs, atol=1e-9)


@pytest.mark.parametrize("n", [8, 16, 64, 256])
def test_fft_path_matches_vandermonde(n):
    rng = np.random.default_rng(3)
    coeffs = rng.normal(size=n) + 1j * rng.normal(size=n)
    np.testing.assert_allclose(
        emb.embed_decode(coeffs, n), emb.special_dft(coeffs, n), atol=1e-6 * n
    )
    slots = rng.normal(size=n) + 1j * rng.normal(size=n)
    np.testing.assert_allclose(
        emb.embed_encode(slots, n), emb.special_idft(slots, n), atol=1e-6 * n
    )


def test_encode_decode_roundtrip_real(ctx16):
    enc = CkksEncoder(16, 30)
    values = np.array([1.5, -2.0, 3.25, 0.5])
    pt = enc.encode(values, ctx16)
    out = enc.decode(pt)
    assert len(out) == 4
    # reference contract: error <~ 2/Delta (examples/encode_decode.rs:154-161)
    assert np.max(np.abs(out - values)) < 2 / 2.0**30


def test_encode_decode_roundtrip_complex(ctx16):
    enc = CkksEncoder(16, 30)
    values = np.array([1.0 + 0.5j, -0.5 + 0.25j])
    pt = enc.encode_complex(values, ctx16)
    out = enc.decode_complex(pt)
    np.testing.assert_allclose(out, values, atol=1e-8)


def test_encode_pi_error_scales_with_delta(ctx16):
    # examples/encode_decode.rs:127-149 — err ~ 1/Delta across scale sweep
    for bits in (10, 20, 30):
        enc = CkksEncoder(16, bits)
        pt = enc.encode([np.pi], ctx16)
        out = enc.decode(pt)
        assert abs(out[0] - np.pi) < 4 / 2.0**bits


def test_encode_rejects_too_many(ctx16):
    enc = CkksEncoder(16, 10)
    with pytest.raises(ValueError):
        enc.encode(np.zeros(9), ctx16)
    assert enc.max_slots == 8


def test_decode_uses_plaintext_scale(ctx16):
    # decode must use pt.scale_bits, not the encoder's current scale
    enc30 = CkksEncoder(16, 30)
    pt = enc30.encode([1.0], ctx16)
    enc10 = CkksEncoder(16, 10)
    out = enc10.decode(pt)
    assert abs(out[0] - 1.0) < 1e-8


def test_full_slot_encode_large_degree():
    n = 1024
    ctx = CkksContext.build(generate_primes(62, 2, n), n)
    enc = CkksEncoder(n, 62)
    rng = np.random.default_rng(99)
    vals = rng.uniform(-0.9, 0.9, size=n // 2)
    pt = enc.encode(vals, ctx)
    out = enc.decode(pt)
    assert np.max(np.abs(out - vals)) < 1e-9


def test_native_encode_path_bit_identical():
    """The native reduce_coeffs fast path must produce the same residues
    as the exact object-int oracle (reference encode hot loop,
    ckks_encoder.rs:101-122)."""
    import numpy as np

    from toy_heaan_ckks_tpu import CkksContext, CkksEncoder, generate_primes
    from toy_heaan_ckks_tpu.ops.poly import Poly
    import toy_heaan_ckks_tpu.native as native

    if not native.available():
        import pytest

        pytest.skip("native runtime unavailable")
    degree = 256
    ctx = CkksContext.build(generate_primes(31, 4, degree), degree)
    rounded = np.round(
        np.random.default_rng(0).normal(0, 2**30, degree)
    )
    fast = CkksEncoder._rounded_to_poly(rounded, ctx)
    exact = Poly.from_coeffs(
        np.array([int(c) for c in rounded], dtype=object), ctx
    )
    np.testing.assert_array_equal(
        np.asarray(fast.data), np.asarray(exact.data)
    )


def test_native_decode_path_matches_exact():
    """native crt_to_double == exact big-int CRT then float division."""
    import numpy as np

    from toy_heaan_ckks_tpu import CkksContext, CkksEncoder, generate_primes
    from toy_heaan_ckks_tpu.ops.poly import Poly
    from toy_heaan_ckks_tpu.math.sampling import make_rng
    import toy_heaan_ckks_tpu.native as native

    if not native.available():
        import pytest

        pytest.skip("native runtime unavailable")
    degree = 256
    ctx = CkksContext.build(generate_primes(31, 4, degree), degree)
    p = Poly.sample_uniform(ctx, make_rng(3))
    delta = 2.0**30
    fast = CkksEncoder._centered_over_scale(p, delta)
    exact = np.asarray(
        [float(x) for x in p.to_coeffs()], dtype=np.float64
    ) / delta
    np.testing.assert_allclose(fast, exact, rtol=1e-12)
