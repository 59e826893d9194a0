"""CKKS encoder/decoder: float slot values <-> RNS plaintext polynomials.

Parity with the reference encoder (reference: src/encoding/ckks_encoder.rs:
32-157): encode scales by Delta = 2^scale_bits, builds the conjugate-
symmetric slot vector, applies the inverse canonical embedding, rounds the
(real) coefficients to integers and CRT-encodes them; decode CRT-
reconstructs centered coefficients, applies the forward embedding and
unscales by the *plaintext's own* scale_bits. At most N/2 values.

Encode/decode are host-side (client-side in FHE terms): the embedding runs
in float64 (TPUs have no f64) and the CRT step is exact big-int math. The
embedding itself is the O(N log N) FFT path, not the reference's O(N^2)
Vandermonde loop.
"""

from __future__ import annotations

import numpy as np

from ..context import CkksContext
from ..ops.poly import Poly
from ..types import Plaintext
from .embedding import build_conjugate_slots, embed_decode, embed_encode


class CkksEncoder:
    def __init__(self, degree: int, scale_bits: int):
        from ..errors import EncodingError, InvalidDegree

        if degree & (degree - 1) or degree < 2:
            raise InvalidDegree("CkksEncoder: degree must be a power of two")
        if scale_bits <= 0:
            raise EncodingError("CkksEncoder: scale_bits must be positive")
        self.degree = degree
        self.scale_bits = scale_bits

    @property
    def scale_factor(self) -> float:
        return float(2.0 ** self.scale_bits)

    @property
    def max_slots(self) -> int:
        return self.degree // 2

    # ── encoding ─────────────────────────────────────────────────────────

    def encode(self, values, ctx: CkksContext) -> Plaintext:
        """Encode real values (one per complex slot, imaginary = 0)."""
        values = np.asarray(values, dtype=np.float64)
        return self._encode_inner(
            values.astype(np.complex128) * self.scale_factor, len(values), ctx
        )

    def encode_complex(self, values, ctx: CkksContext) -> Plaintext:
        values = np.asarray(values, dtype=np.complex128)
        return self._encode_inner(values * self.scale_factor, len(values), ctx)

    def _encode_inner(self, scaled, slots: int, ctx: CkksContext) -> Plaintext:
        from ..errors import EncodingError

        if len(scaled) > self.max_slots:
            raise EncodingError(
                f"encode: {len(scaled)} values exceed max slots {self.max_slots}"
            )
        if ctx.degree != self.degree:
            raise EncodingError("encode: context degree mismatch")
        slot_vec = build_conjugate_slots(scaled, self.degree)
        coeffs = embed_encode(slot_vec, self.degree)
        rounded = np.round(coeffs.real)
        poly = self._rounded_to_poly(rounded, ctx)
        return Plaintext(
            poly=poly, scale_bits=self.scale_bits, slots=slots
        )

    @staticmethod
    def _rounded_to_poly(rounded: np.ndarray, ctx: CkksContext) -> Poly:
        """Rounded float coefficients -> RNS Poly.

        Fast path (native C++ residue reduction, vectorised int64 — the
        reference's encode hot loop, ckks_encoder.rs:101-122): engaged
        when every coefficient fits int64. Falls back to the exact
        object-int path otherwise (the oracle; bit-identical residues)."""
        from .. import native

        if native.available() and np.all(np.abs(rounded) < 2**62):
            res = native.reduce_coeffs(
                rounded.astype(np.int64), list(ctx.moduli)
            )
            return Poly.from_residues_u64(res, ctx)
        int_coeffs = np.array([int(c) for c in rounded], dtype=object)
        return Poly.from_coeffs(int_coeffs, ctx)

    # ── sparse (gap) packing ─────────────────────────────────────────────

    def encode_sparse(self, values, ctx: CkksContext) -> Plaintext:
        """Sparse packing: n < N/2 slots via the subring map X -> X^gap.

        The n values are encoded in the degree-2n mini-ring and the mini
        coefficients are spread at stride gap = N/(2n), so at most 2n
        coefficients of the degree-N polynomial are nonzero — the
        "gap-based indexing" of the HEAAN golden data
        (reference: data/golden_encode_light.json, coefficient_pattern).
        Because 5^j mod 4n walks the mini-ring's root order, the full-width
        slot reading of a sparse plaintext is the n values cyclically
        repeated N/(2n) times; decoding with pt.slots = n recovers exactly
        the inputs. Compatible with every homomorphic op (the subring is
        closed under add/mul/automorphism).
        """
        values = np.asarray(values, dtype=np.complex128)
        n_slots = values.shape[-1]
        if n_slots & (n_slots - 1) or n_slots < 1:
            raise ValueError("encode_sparse: slot count must be a power of two")
        if 2 * n_slots > self.degree:
            raise ValueError("encode_sparse: too many slots for this degree")
        mini_deg = 2 * n_slots
        gap = self.degree // mini_deg
        slot_vec = build_conjugate_slots(
            values * self.scale_factor, mini_deg
        )
        mini_coeffs = embed_encode(slot_vec, mini_deg)
        int_coeffs = np.zeros(self.degree, dtype=object)
        for i, c in enumerate(np.round(mini_coeffs.real)):
            int_coeffs[i * gap] = int(c)
        return Plaintext(
            poly=Poly.from_coeffs(int_coeffs, ctx),
            scale_bits=self.scale_bits,
            slots=n_slots,
        )

    # ── decoding ─────────────────────────────────────────────────────────

    def decode(self, pt: Plaintext) -> np.ndarray:
        return self.decode_complex(pt).real

    def decode_complex(self, pt: Plaintext) -> np.ndarray:
        delta = pt.true_scale
        scaled = self._centered_over_scale(pt.poly, delta)
        slot_vec = embed_decode(scaled, self.degree)
        return slot_vec[: pt.slots]

    @staticmethod
    def _centered_over_scale(poly: Poly, delta: float) -> np.ndarray:
        """Centered coefficients / delta as float64.

        Fast path: native multiword CRT straight to double (the
        reference's decode hot loop, ckks_encoder.rs:129-156, without the
        Python big-int round trip). Fallback: exact big-int CRT then
        float conversion — the oracle (identical up to the final float64
        rounding, which the fast path performs in the same order)."""
        from .. import native
        from ..ops import modular as mm

        coeff = poly.to_coeff_domain()
        if native.available():
            plain = np.asarray(mm.from_mont(coeff.data, poly.ctx.chain))
            res64 = plain[..., 0, :].astype(np.uint64) | (
                plain[..., 1, :].astype(np.uint64) << np.uint64(32)
            )
            return native.crt_to_double(res64, list(poly.ctx.moduli), delta)
        int_coeffs = coeff.to_coeffs()
        return np.asarray(
            [float(x) for x in int_coeffs], dtype=np.float64
        ) / delta
