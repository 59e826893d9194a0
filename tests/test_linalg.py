"""Public encrypted matrix-vector API (models/linalg.py).

A dense complex matrix applied to an encrypted vector must match the
plain product within CKKS noise, on both the dense double-hoisted path
and the BSGS path, costing exactly one level.
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
from toy_heaan_ckks_tpu.keys import KeyLadder
from toy_heaan_ckks_tpu.math.sampling import make_rng
from toy_heaan_ckks_tpu.models.linalg import (
    MatvecKeys,
    encrypted_matvec,
    matrix_diagonals,
)

DEGREE = 64
SLOTS = DEGREE // 2
SCALE = 31


def test_matrix_diagonals():
    m = np.arange(16, dtype=float).reshape(4, 4)
    d = matrix_diagonals(m)
    assert len(d) == 4
    np.testing.assert_array_equal(d[0], np.diag(m))
    np.testing.assert_array_equal(d[1], [m[0, 1], m[1, 2], m[2, 3], m[3, 0]])


@pytest.mark.parametrize("giant", [None, 8, "auto"])
def test_encrypted_matvec_matches_plain(giant):
    full = CkksContext.build(generate_primes(SCALE, 3, DEGREE), DEGREE)
    params = CkksParams(3.2, 4, SCALE)
    eng = CkksEngine(full, params)
    rng = make_rng(29)
    sk = eng.generate_secret_key(rng)
    pk = eng.generate_public_key(sk, rng)
    ladder = KeyLadder(full, sk, 3.2, rng, lazy=True)
    keys = MatvecKeys(ladder, params, rng)
    enc = CkksEncoder(DEGREE, SCALE)

    rng2 = np.random.default_rng(4)
    m = rng2.uniform(-0.2, 0.2, (SLOTS, SLOTS)) + 1j * rng2.uniform(
        -0.2, 0.2, (SLOTS, SLOTS)
    )
    v = rng2.uniform(-0.5, 0.5, SLOTS) + 1j * rng2.uniform(-0.5, 0.5, SLOTS)

    ct = eng.encrypt(enc.encode_complex(v, full), pk, full.total_bits(), rng)
    out = encrypted_matvec(ct, m, keys, enc, giant=giant)
    assert out.level == ct.level - 1  # exactly one level

    got = enc.decode_complex(
        CkksEngine.decrypt(out, sk.reduce_to(out.ctx))
    )[:SLOTS]
    np.testing.assert_allclose(got, m @ v, atol=3e-4)


def _matmul_setup(levels: int, degree: int = 128, scale: int = 30,
                  seed: int = 37):
    full = CkksContext.build(generate_primes(scale, levels, degree), degree)
    params = CkksParams(3.2, 8, scale)
    eng = CkksEngine(full, params)
    rng = make_rng(seed)
    sk = eng.generate_secret_key(rng)
    pk = eng.generate_public_key(sk, rng)
    ladder = KeyLadder(full, sk, 3.2, rng, lazy=True)
    keys = MatvecKeys(ladder, params, rng)
    enc = CkksEncoder(degree, scale)
    return full, eng, rng, sk, pk, keys, enc


def test_encrypted_matmul_matches_plain():
    """JKLS d x d product, both operands encrypted (d=8, N=128):
    decode(matmul(Enc A, Enc B)) ~= A @ B, costing exactly 3 levels."""
    from toy_heaan_ckks_tpu.models.linalg import encrypted_matmul

    full, eng, rng, sk, pk, keys, enc = _matmul_setup(5)
    d = 8
    rng2 = np.random.default_rng(11)
    a = rng2.uniform(-1, 1, (d, d)) / np.sqrt(d)
    b = rng2.uniform(-1, 1, (d, d)) / np.sqrt(d)

    ca = eng.encrypt(
        enc.encode(a.reshape(-1), full), pk, full.total_bits(), rng
    )
    cb = eng.encrypt(
        enc.encode(b.reshape(-1), full), pk, full.total_bits(), rng
    )
    out = encrypted_matmul(ca, cb, keys, enc)
    assert out.level == ca.level - 3  # JKLS depth
    got = enc.decode(
        CkksEngine.decrypt(out, sk.reduce_to(out.ctx))
    )[: d * d].real.reshape(d, d)
    np.testing.assert_allclose(got, a @ b, atol=2e-3)


def test_encrypted_transpose():
    from toy_heaan_ckks_tpu.models.linalg import encrypted_transpose

    full, eng, rng, sk, pk, keys, enc = _matmul_setup(3)
    d = 8
    a = np.random.default_rng(13).uniform(-1, 1, (d, d))
    ca = eng.encrypt(
        enc.encode(a.reshape(-1), full), pk, full.total_bits(), rng
    )
    out = encrypted_transpose(ca, keys, enc)
    assert out.level == ca.level - 1
    got = enc.decode(
        CkksEngine.decrypt(out, sk.reduce_to(out.ctx))
    )[: d * d].real.reshape(d, d)
    np.testing.assert_allclose(got, a.T, atol=3e-4)


def test_encrypted_matmul_rejects_non_square_packing():
    """N/2 = 32 is not a perfect square -> typed error."""
    from toy_heaan_ckks_tpu.errors import CkksError
    from toy_heaan_ckks_tpu.models.linalg import encrypted_matmul

    full, eng, rng, sk, pk, keys, enc = _matmul_setup(
        2, degree=64, scale=31
    )
    ct = eng.encrypt(
        enc.encode(np.zeros(32), full), pk, full.total_bits(), rng
    )
    with pytest.raises(CkksError):
        encrypted_matmul(ct, ct, keys, enc)


def test_encrypted_matvec_rejects_wrong_shape():
    full = CkksContext.build(generate_primes(SCALE, 2, DEGREE), DEGREE)
    params = CkksParams(3.2, 4, SCALE)
    eng = CkksEngine(full, params)
    rng = make_rng(31)
    sk = eng.generate_secret_key(rng)
    pk = eng.generate_public_key(sk, rng)
    ladder = KeyLadder(full, sk, 3.2, rng, lazy=True)
    keys = MatvecKeys(ladder, params, rng)
    enc = CkksEncoder(DEGREE, SCALE)
    ct = eng.encrypt(
        enc.encode(np.zeros(SLOTS), full), pk, full.total_bits(), rng
    )
    with pytest.raises(ValueError):
        encrypted_matvec(ct, np.zeros((4, 4)), keys, enc)
