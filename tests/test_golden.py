"""Golden-data tests: HEAAN ground truth from the reference's data/ JSONs.

The reference ships imported HEAAN context/encode goldens that its own Rust
never loads (SURVEY.md §2.3: data/golden_context_small.json,
data/golden_encode_light.json — intended ground truth). The literal values
asserted here are transcribed from those files.
"""

import numpy as np

from toy_heaan_ckks_tpu import CkksContext, CkksEncoder, generate_primes
from toy_heaan_ckks_tpu.encoding.embedding import j_exponents

# data/golden_context_small.json (N=32, M=64): rotGroup = powers of 5 mod M
GOLDEN_ROT_GROUP_N32 = [
    1, 5, 25, 61, 49, 53, 9, 45, 33, 37, 57, 29, 17, 21, 41, 13,
]

# data/golden_context_small.json: ksiPows[k] = e^{2*pi*i*k/M}, spot values
GOLDEN_KSI_POWS_N32 = {
    0: (1.0, 0.0),
    1: (0.9951847266721969, 0.0980171403295606),
    2: (0.9807852804032304, 0.19509032201612825),
    3: (0.9569403357322088, 0.29028467725446233),
    4: (0.9238795325112867, 0.3826834323650898),
    5: (0.881921264348355, 0.47139673682599764),
}


def test_rot_group_matches_golden():
    """Our J-ordered slot exponents equal HEAAN's rotGroup (first half)."""
    exps = j_exponents(32)
    assert list(exps[:16]) == GOLDEN_ROT_GROUP_N32


def test_ksi_pows_match_golden():
    """psi^k (psi = e^{i pi/N}) equals HEAAN's ksiPows table."""
    n = 32
    for k, (re, im) in GOLDEN_KSI_POWS_N32.items():
        z = np.exp(1j * np.pi * k / n)
        assert abs(z.real - re) < 1e-12 and abs(z.imag - im) < 1e-12


def test_sparse_encode_gap_pattern():
    """Golden encode property (data/golden_encode_light.json): encoding 8
    values into a large ring touches only gap-strided coefficients, 15-16
    nonzero among N (gap-based indexing; our subring convention puts them
    at multiples of N/16)."""
    degree = 8192
    ctx = CkksContext.build(generate_primes(31, 3, degree), degree)
    enc = CkksEncoder(degree, 30)
    values = np.arange(8, dtype=float)
    pt = enc.encode_sparse(values, ctx)
    coeffs = pt.poly.to_coeffs()
    nz = np.nonzero(coeffs)[0]
    gap = degree // 16
    assert len(nz) <= 16
    assert all(int(i) % gap == 0 for i in nz)
    # constant coefficient = round(mean * Delta): golden value 3.5 * 2^30
    assert int(coeffs[0]) == round(values.mean() * 2.0**30) == 3758096384


def test_sparse_roundtrip_and_replication():
    degree = 256
    ctx = CkksContext.build(generate_primes(30, 3, degree), degree)
    enc = CkksEncoder(degree, 30)
    values = np.array([0.5, -1.25, 2.0, 0.125])
    pt = enc.encode_sparse(values, ctx)
    out = enc.decode(pt)
    np.testing.assert_allclose(out, values, atol=1e-6)
    # full-width reading shows the 4 values cyclically repeated
    full = Pt = type(pt)(poly=pt.poly, scale_bits=pt.scale_bits,
                         slots=degree // 2)
    wide = enc.decode(full)
    np.testing.assert_allclose(wide, np.tile(values, degree // 8), atol=1e-6)


def test_sparse_matches_dense_for_full_slots():
    """encode_sparse with N/2 slots degenerates to the dense encoder."""
    degree = 64
    ctx = CkksContext.build(generate_primes(30, 2, degree), degree)
    enc = CkksEncoder(degree, 26)
    values = np.linspace(-1, 1, degree // 2)
    a = enc.encode_sparse(values, ctx).poly.to_coeffs()
    b = enc.encode(values, ctx).poly.to_coeffs()
    assert all(int(x) == int(y) for x, y in zip(a, b))
