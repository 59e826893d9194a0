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
