"""RNS polynomial layer: functional kernels + a light ``Poly`` wrapper.

The reference's central datatype is ``RnsPoly`` — per-channel u64 arrays, an
Arc'd basis and an ``in_ntt_domain`` flag, mutated in place (reference:
src/rings/backends/rns_ntt/poly.rs:16-250). Here the equivalent is a dense
uint32 limb array of shape (L, 2, N) in Montgomery form plus a pure-function
kernel set; ``Poly`` is an immutable convenience wrapper. Polynomials are
kept resident in NTT domain by the engine (the reference stores ciphertexts
in coefficient domain and pays 3 NTTs per multiply — see SURVEY.md §3.2);
coefficient domain appears only at encode/decode, rescale, and automorphism
boundaries.
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np
import jax
import jax.numpy as jnp

from ..context import CkksContext
from ..math import sampling
from ..math.crt import reconstruct_centered
from . import modular as mm
from . import ntt_pallas
from .ntt import forward_ntt, inverse_ntt


def _on_tpu() -> bool:
    if os.environ.get("CKKS_DISABLE_PALLAS"):
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def _use_pallas(ctx: CkksContext) -> bool:
    """Small-prime fused Pallas kernel eligibility (TPU backends).

    The staged jnp path remains the oracle (and the CPU path);
    CKKS_DISABLE_PALLAS=1 forces it everywhere.
    """
    return _on_tpu() and ntt_pallas.supported(ctx.degree, ctx.chain.small)


def _use_pallas_fused(ctx: CkksContext) -> bool:
    """Fused composite (key-switch / mod-down / fused-mult) eligibility.

    N <= 2^15 runs the composites' in-kernel NTT stages on fully expanded
    twiddle planes; N = 2^16 switches those stages to the factored
    row x lane twiddle form (one extra Harvey multiply per deep stage) so
    the working set still fits VMEM."""
    return _use_pallas(ctx) and ctx.degree <= (1 << 16)


def _use_pallas_wide(ctx: CkksContext) -> bool:
    """Wide-prime (2-limb) fused Pallas kernel eligibility."""
    from . import ntt_pallas_wide

    return (
        _on_tpu()
        and not ntt_pallas.supported(ctx.degree, ctx.chain.small)
        and ntt_pallas_wide.supported_wide(ctx.degree, ctx.moduli)
    )


def _use_pallas_wide_fused(ctx: CkksContext) -> bool:
    """Wide fused composite eligibility.

    N <= 2^14 runs the composites' in-kernel NTT stages on fully expanded
    2-limb twiddle planes; above that they switch to the factored
    row x lane twiddle form so the working set still fits VMEM."""
    return _use_pallas_wide(ctx) and ctx.degree <= (1 << 16)

# ── Functional kernels (jitted; data = uint32 (..., L, 2, N) Montgomery) ────


@jax.jit
def add(a, b, ctx: CkksContext):
    return mm.add_mod(a, b, ctx.chain)


@jax.jit
def sub(a, b, ctx: CkksContext):
    return mm.sub_mod(a, b, ctx.chain)


@jax.jit
def neg(a, ctx: CkksContext):
    return mm.neg_mod(a, ctx.chain)


@jax.jit
def mul_pointwise(a, b, ctx: CkksContext):
    """Pointwise product — negacyclic poly product when both in NTT domain."""
    return mm.mont_mul(a, b, ctx.chain)


@jax.jit
def to_ntt(a, ctx: CkksContext):
    if _use_pallas(ctx):
        return ntt_pallas.ntt_pallas(a, ctx.moduli, ctx.degree, inverse=False)
    if _use_pallas_wide(ctx):
        from .ntt_pallas_wide import ntt_pallas_wide

        return ntt_pallas_wide(a, ctx.moduli, ctx.degree, inverse=False)
    return forward_ntt(a, ctx.ntt, ctx.chain)


@jax.jit
def to_coeff(a, ctx: CkksContext):
    if _use_pallas(ctx):
        return ntt_pallas.ntt_pallas(a, ctx.moduli, ctx.degree, inverse=True)
    if _use_pallas_wide(ctx):
        from .ntt_pallas_wide import ntt_pallas_wide

        return ntt_pallas_wide(a, ctx.moduli, ctx.degree, inverse=True)
    return inverse_ntt(a, ctx.ntt, ctx.chain)


@jax.jit
def rescale(a, ctx: CkksContext):
    """Exact RNS rescale: drop q_last, divide by it. Coeff-domain in/out.

    new[i][j] = (c[i][j] - c[L-1][j] mod q_i) * q_last^{-1} mod q_i
    (parity: reference poly.rs:187-228; exact integer division, no floats).
    Input shape (..., L, 2, N) -> output (..., L-1, 2, N).
    """
    num = a.shape[-3]
    if num < 2:
        raise ValueError("rescale: need at least two channels")
    child = ctx.chain.drop_last(1)
    last_chain = _chain_slice(ctx.chain, num - 1, num)

    last = a[..., num - 1 : num, :, :]
    plain_last = mm.from_mont(last, last_chain)  # plain x in [0, q_last)
    bcast = jnp.broadcast_to(
        plain_last, a.shape[:-3] + (num - 1,) + a.shape[-2:]
    )
    mont_x = mm.to_mont(bcast, child)  # Montgomery form of x mod q_i
    diff = mm.sub_mod(a[..., : num - 1, :, :], mont_x, child)
    return mm.mont_mul(diff, ctx.qlast_inv, child)


@jax.jit
def rescale_ntt(a, ctx: CkksContext):
    """Exact RNS rescale with NTT-domain input AND output.

    Bit-exact equal to ``to_ntt(rescale(to_coeff(a)))`` but ~2x cheaper:
    only the dropped channel is inverse-transformed (the rescale correction
    polynomial x = c_last has integer coefficients, so NTT_i(x mod q_i) is
    computed directly per kept channel) — 1 + (L-1) channel-NTTs instead of
    L + (L-1). Input (..., L, 2, N) -> output (..., L-1, 2, N).
    """
    num = a.shape[-3]
    if num < 2:
        raise ValueError("rescale_ntt: need at least two channels")
    child_ctx = ctx.drop_last(1)
    last_ctx = ctx.slice_channels(num - 1, num)

    last = a[..., num - 1 : num, :, :]
    last_coeff = to_coeff(last, last_ctx)
    plain_last = mm.from_mont(last_coeff, last_ctx.chain)
    bcast = jnp.broadcast_to(
        plain_last, a.shape[:-3] + (num - 1,) + a.shape[-2:]
    )
    x_ntt = to_ntt(mm.to_mont(bcast, child_ctx.chain), child_ctx)
    diff = mm.sub_mod(a[..., : num - 1, :, :], x_ntt, child_ctx.chain)
    return mm.mont_mul(diff, ctx.qlast_inv, child_ctx.chain)


def mod_drop_last(a, count: int = 1):
    keep = a.shape[-3] - count
    if keep < 1:
        raise ValueError("mod_drop_last: cannot drop all channels")
    return a[..., :keep, :, :]


@jax.jit
def automorphism(a, src, negate, ctx: CkksContext):
    """X -> X^e on coefficient-domain data via precomputed gather table.

    out[..., j] = +/- a[..., src[j]]; ``src``/``negate`` come from
    ``ctx.automorphism_table(e)``.
    """
    gathered = jnp.take(a, src, axis=-1)
    negated = mm.neg_mod(gathered, ctx.chain)
    return jnp.where(negate, negated, gathered)


def _chain_slice(chain: mm.ModulusChain, start: int, stop: int) -> mm.ModulusChain:
    return mm.ModulusChain(
        moduli=chain.moduli[start:stop],
        q=chain.q[start:stop],
        qinv=chain.qinv[start:stop],
        r2=chain.r2[start:stop],
        rmod=chain.rmod[start:stop],
        one_mont=chain.one_mont[start:stop],
        small=chain.small,
    )


# ── Host <-> device conversion ───────────────────────────────────────────────


def encode_coeffs_to_device(coeffs, ctx: CkksContext) -> jnp.ndarray:
    """Signed integer coefficients (exact) -> Montgomery residues on device.

    Parity: RnsPoly::from_coeffs (reference poly.rs:49-67) — rem_euclid per
    channel — plus the Montgomery conversion that is our storage format.
    """
    from ..math.crt import to_residues

    coeffs = np.asarray(coeffs, dtype=object)
    if coeffs.shape[-1] != ctx.degree:
        raise ValueError(
            f"expected {ctx.degree} coefficients, got {coeffs.shape[-1]}"
        )
    if coeffs.ndim == 1:
        res = to_residues(coeffs, list(ctx.moduli))
    else:
        res = np.empty((ctx.num_channels,) + coeffs.shape, dtype=object)
        for i, q in enumerate(ctx.moduli):
            res[i] = coeffs % q
    packed = jnp.asarray(mm.pack_residues(res))
    return mm.to_mont(packed, ctx.chain)


def decode_device_to_coeffs(data, ctx: CkksContext) -> np.ndarray:
    """Montgomery residues (coeff domain) -> centered exact ints (host).

    CRT reconstruction is exact with arbitrary-precision ints — no u128
    ceiling (the reference requires Q < 2^128, basis.rs:153-157).
    """
    plain = np.asarray(mm.from_mont(data, ctx.chain))
    residues = mm.unpack_residues(plain)
    return reconstruct_centered(residues, list(ctx.moduli))


# ── Poly wrapper ─────────────────────────────────────────────────────────────


@dataclasses.dataclass(frozen=True, eq=False)
class Poly:
    """Immutable RNS polynomial bound to a context.

    ``data``: uint32 (L, 2, N) Montgomery-form residues.
    ``ntt_domain``: True when data is in NTT (tree) order.
    """

    data: jnp.ndarray
    ctx: CkksContext
    ntt_domain: bool

    # ── constructors ─────────────────────────────────────────────────────

    @staticmethod
    def zero(ctx: CkksContext, ntt_domain: bool = False) -> "Poly":
        shape = (ctx.num_channels, 2, ctx.degree)
        return Poly(jnp.zeros(shape, dtype=jnp.uint32), ctx, ntt_domain)

    @staticmethod
    def from_coeffs(coeffs, ctx: CkksContext) -> "Poly":
        return Poly(encode_coeffs_to_device(coeffs, ctx), ctx, False)

    @staticmethod
    def from_residues(residues, ctx: CkksContext, ntt_domain: bool = False) -> "Poly":
        """Plain (non-Montgomery) residue matrix (L, N) -> Poly."""
        packed = jnp.asarray(mm.pack_residues(np.asarray(residues, dtype=object)))
        return Poly(mm.to_mont(packed, ctx.chain), ctx, ntt_domain)

    @staticmethod
    def from_residues_u64(
        residues: np.ndarray, ctx: CkksContext, ntt_domain: bool = False
    ) -> "Poly":
        """Plain uint64 residue matrix (L, N) -> Poly (vectorised packing;
        bit-identical to ``from_residues`` on the same values)."""
        res = np.ascontiguousarray(residues, dtype=np.uint64)
        lo = (res & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        hi = (res >> np.uint64(32)).astype(np.uint32)
        packed = jnp.asarray(np.stack([lo, hi], axis=-2))
        return Poly(mm.to_mont(packed, ctx.chain), ctx, ntt_domain)

    # ── samplers (host RNG; deterministic via seeded numpy Generator) ────

    @staticmethod
    def sample_uniform(ctx: CkksContext, rng: np.random.Generator) -> "Poly":
        res = np.empty((ctx.num_channels, ctx.degree), dtype=object)
        for i, q in enumerate(ctx.moduli):
            res[i] = sampling.uniform_coefficients(ctx.degree, q, rng).astype(object)
        return Poly.from_residues(res, ctx)

    @staticmethod
    def sample_gaussian(
        ctx: CkksContext, std_dev: float, rng: np.random.Generator
    ) -> "Poly":
        coeffs = sampling.gaussian_coefficients(ctx.degree, std_dev, rng)
        return Poly.from_coeffs(coeffs.astype(object), ctx)

    @staticmethod
    def sample_tribits(
        ctx: CkksContext, hamming_weight: int, rng: np.random.Generator
    ) -> "Poly":
        coeffs = sampling.ternary_coefficients(ctx.degree, hamming_weight, rng)
        return Poly.from_coeffs(coeffs.astype(object), ctx)

    # ── domain conversion ────────────────────────────────────────────────

    def to_ntt_domain(self) -> "Poly":
        if self.ntt_domain:
            return self
        return Poly(to_ntt(self.data, self.ctx), self.ctx, True)

    def to_coeff_domain(self) -> "Poly":
        if not self.ntt_domain:
            return self
        return Poly(to_coeff(self.data, self.ctx), self.ctx, False)

    # ── arithmetic ───────────────────────────────────────────────────────

    def _check(self, other: "Poly"):
        if self.ctx is not other.ctx:
            if self.ctx.moduli != other.ctx.moduli or self.ctx.degree != other.ctx.degree:
                from ..errors import ChannelCountMismatch

                raise ChannelCountMismatch("Poly context mismatch")
        if self.ntt_domain != other.ntt_domain:
            from ..errors import CkksError

            raise CkksError("Poly domain mismatch")

    def __add__(self, other: "Poly") -> "Poly":
        self._check(other)
        return Poly(add(self.data, other.data, self.ctx), self.ctx, self.ntt_domain)

    def __sub__(self, other: "Poly") -> "Poly":
        self._check(other)
        return Poly(sub(self.data, other.data, self.ctx), self.ctx, self.ntt_domain)

    def __neg__(self) -> "Poly":
        return Poly(neg(self.data, self.ctx), self.ctx, self.ntt_domain)

    def __mul__(self, other: "Poly") -> "Poly":
        """Negacyclic polynomial product.

        NTT-domain operands multiply pointwise (O(N L)); coefficient-domain
        operands are transformed, multiplied, and transformed back — same
        dual behavior as the reference MulAssign (poly.rs:277-330).
        """
        self._check(other)
        if self.ntt_domain:
            return Poly(
                mul_pointwise(self.data, other.data, self.ctx), self.ctx, True
            )
        a = to_ntt(self.data, self.ctx)
        b = to_ntt(other.data, self.ctx)
        c = mul_pointwise(a, b, self.ctx)
        return Poly(to_coeff(c, self.ctx), self.ctx, False)

    # ── level ops ────────────────────────────────────────────────────────

    def rescale(self) -> "Poly":
        coeff = self.to_coeff_domain()
        child_ctx = self.ctx.drop_last(1)
        return Poly(rescale(coeff.data, self.ctx), child_ctx, False)

    def rescale_ntt(self) -> "Poly":
        """Rescale staying resident in NTT domain (bit-exact with
        ``rescale().to_ntt_domain()``, ~2x fewer channel-NTTs)."""
        ntt = self.to_ntt_domain()
        child_ctx = self.ctx.drop_last(1)
        return Poly(rescale_ntt(ntt.data, self.ctx), child_ctx, True)

    def mod_drop_last(self, count: int = 1) -> "Poly":
        child_ctx = self.ctx.drop_last(count)
        return Poly(mod_drop_last(self.data, count), child_ctx, self.ntt_domain)

    # ── automorphisms ────────────────────────────────────────────────────

    def automorphism(self, exponent: int) -> "Poly":
        """X -> X^e. NTT-domain inputs stay NTT-resident: there the
        automorphism is a pure slot permutation (no negation, no domain
        round trip) — see CkksContext.automorphism_table_ntt."""
        two_n = 2 * self.ctx.degree
        e = exponent % two_n
        if e == 1:
            return self
        if self.ntt_domain:
            perm = self.ctx.automorphism_table_ntt(e)
            return Poly(jnp.take(self.data, perm, axis=-1), self.ctx, True)
        src, negate = self.ctx.automorphism_table(e)
        return Poly(
            automorphism(self.data, src, negate, self.ctx), self.ctx, False
        )

    def rotate_slots(self, k: int) -> "Poly":
        """Rotate plaintext slots left by k via the root-5 automorphism
        X -> X^{5^k mod 2N} (reference poly.rs:543-569 for k >= 0).

        Negative k is the exact inverse rotation: since ord(5) = N/2 mod 2N
        and there are N/2 slots, k is reduced mod N/2 so 5^k is always the
        true inverse power. (Departure: the reference composes the positive
        automorphism with conjugation for k < 0, a path its own tests only
        check for "does not panic" — poly.rs:932-942; that composition does
        not implement inverse rotation, so we use the correct one.)
        """
        half = self.ctx.degree // 2
        two_n = 2 * self.ctx.degree
        exponent = pow(5, k % half, two_n)
        return self.automorphism(exponent)

    def conjugate(self) -> "Poly":
        """Complex-conjugate the slots: X -> X^{2N-1}."""
        return self.automorphism(2 * self.ctx.degree - 1)

    # ── export ───────────────────────────────────────────────────────────

    def to_coeffs(self) -> np.ndarray:
        """Centered exact integer coefficients (host, object array)."""
        coeff = self.to_coeff_domain()
        return decode_device_to_coeffs(coeff.data, self.ctx)

    def residues(self) -> np.ndarray:
        """Plain (non-Montgomery) residues as an exact (L, N) object array."""
        plain = np.asarray(mm.from_mont(self.data, self.ctx.chain))
        return mm.unpack_residues(plain)
