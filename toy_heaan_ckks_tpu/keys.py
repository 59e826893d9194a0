"""RLWE key material: secret/public keys and gadget relin/rotation keys.

Parity with the reference key layer (reference: src/keys/*.rs and
src/crypto/engine.rs:206-399):

- SecretKey: ternary poly with exactly ``hamming_weight`` nonzeros.
- PublicKey: a <- uniform, b = -(a*s) + e, so b + a*s ~ e.
- RelinearizationKey / RotationKey: legacy single-pair variants
  (b = -(a*s) + e + s^2, resp. + s(X^{5^k})).
- Gadget keys: one (a_i, b_i) RLWE pair per RNS channel with
  b_i + a_i*s ~ e_i * s', where e_i is the CRT indicator of channel i and
  s' is s^2 (relin) or the rotated secret (rotation).

TPU-native departures: gadget key pairs are stored as dense stacked arrays
(digit, L, 2, N) resident in NTT domain, so the whole key-switch inner
product runs as batched pointwise multiplies and a tree reduction without
any per-digit host loop. A ``KeyLadder`` precomputes per-level keys up
front, replacing the reference examples' per-level key regeneration idiom
(SURVEY.md §2.2 "Level management idiom").
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from .context import CkksContext
from .math import sampling
from .math.primes import get_first_prime_down
from .ops import modular as mm
from .ops.poly import Poly


@dataclasses.dataclass(frozen=True, eq=False)
class SecretKeyParams:
    hamming_weight: int

    def validate(self, degree: int):
        if not (0 <= self.hamming_weight <= degree):
            raise ValueError(
                f"hamming weight {self.hamming_weight} exceeds degree {degree}"
            )


@dataclasses.dataclass(frozen=True, eq=False)
class SecretKey:
    poly: Poly  # ternary secret, NTT domain
    coeffs: np.ndarray | None = None  # host copy of the ternary coefficients

    @staticmethod
    def generate(
        params: SecretKeyParams, ctx: CkksContext, rng: np.random.Generator
    ) -> "SecretKey":
        params.validate(ctx.degree)
        coeffs = sampling.ternary_coefficients(
            ctx.degree, params.hamming_weight, rng
        )
        s = Poly.from_coeffs(coeffs.astype(object), ctx)
        return SecretKey(poly=s.to_ntt_domain(), coeffs=coeffs)

    def reduce_to(self, ctx: CkksContext) -> "SecretKey":
        """Truncate RNS channels to ``ctx`` (valid: channel truncation
        commutes with the channel-local NTT). Parity with the examples'
        reduce_sk idiom (reference tests/integration_mul.rs:56-65)."""
        drop = self.poly.ctx.num_channels - ctx.num_channels
        if drop < 0:
            raise ValueError("reduce_to: target context has more channels")
        if drop == 0:
            return self
        return SecretKey(poly=self.poly.mod_drop_last(drop), coeffs=self.coeffs)

    def extend_to(self, ext_ctx: CkksContext) -> Poly:
        """The secret as a poly over an *extended* modulus chain (used by
        special-prime key switching). Requires the host coefficient copy."""
        if self.coeffs is None:
            raise ValueError("extend_to: secret key lacks host coefficients")
        return Poly.from_coeffs(
            np.asarray(self.coeffs, dtype=object), ext_ctx
        ).to_ntt_domain()


@dataclasses.dataclass(frozen=True, eq=False)
class PublicKey:
    a: Poly  # NTT domain
    b: Poly  # NTT domain

    @staticmethod
    def generate(
        sk: SecretKey, std_dev: float, ctx: CkksContext, rng: np.random.Generator
    ) -> "PublicKey":
        a = Poly.sample_uniform(ctx, rng).to_ntt_domain()
        e = Poly.sample_gaussian(ctx, std_dev, rng).to_ntt_domain()
        b = -(a * sk.poly) + e
        return PublicKey(a=a, b=b)


@dataclasses.dataclass(frozen=True, eq=False)
class RelinearizationKey:
    """Legacy single-pair relin key: b = -(a*s) + e + s^2
    (reference: src/keys/relin_key.rs:5-100)."""

    a: Poly
    b: Poly

    @staticmethod
    def generate(
        sk: SecretKey, std_dev: float, ctx: CkksContext, rng: np.random.Generator
    ) -> "RelinearizationKey":
        a = Poly.sample_uniform(ctx, rng).to_ntt_domain()
        e = Poly.sample_gaussian(ctx, std_dev, rng).to_ntt_domain()
        s_sq = sk.poly * sk.poly
        b = -(a * sk.poly) + e + s_sq
        return RelinearizationKey(a=a, b=b)


@dataclasses.dataclass(frozen=True, eq=False)
class RotationKey:
    """Legacy single-pair rotation key: b = -(a*s) + e + s(X^{5^k})
    (reference: src/keys/rotation_key.rs:6-82)."""

    a: Poly
    b: Poly
    rotation: int

    @staticmethod
    def generate(
        sk: SecretKey,
        rotation: int,
        std_dev: float,
        ctx: CkksContext,
        rng: np.random.Generator,
    ) -> "RotationKey":
        a = Poly.sample_uniform(ctx, rng).to_ntt_domain()
        e = Poly.sample_gaussian(ctx, std_dev, rng).to_ntt_domain()
        s_k = sk.poly.rotate_slots(rotation).to_ntt_domain()
        b = -(a * sk.poly) + e + s_k
        return RotationKey(a=a, b=b, rotation=rotation)


# ── Gadget keys: per-RNS-channel digits + special-prime modulus raising ──────
#
# The reference's gadget keys satisfy b_i + a_i s ~ e_i * t (mod Q) and are
# applied directly at modulus Q (engine.rs:206-228). That leaves key-switch
# noise ~ L*sqrt(N)*sigma*q_i, which only decodes cleanly when Delta >> q_i
# (the rotation_demo trick) and makes rotations unusable under the
# SCALE = prime-bits rule required for mul+rescale — the reason the
# reference's std_dev pipeline remained an unimplemented scaffold.
#
# We instead implement the production-standard **special-prime (hybrid)
# key switch** that the reference's own parameter doctrine describes
# (specs/parameters.md "special prime"): keys live over the raised modulus
# Q*P with b_i + a_i s = err_i + P * e_i * t (mod QP); after the digit
# inner product the result is exactly divided by P (one RNS rescale), so
# the key-switch noise shrinks to ~ L*sqrt(N)*sigma*(q/P) ~ L*sqrt(N)*sigma.
# Why the digit identity survives the raise: sum_i alpha_i(d) e_i = d + Q*r
# as integers, and P * t * Q * r == 0 (mod QP).


def default_special_prime(ctx: CkksContext) -> int:
    """Pick an NTT-friendly special prime P ~ max(q_i), distinct from the
    chain.

    For "small" chains (all primes < 2^31) P is kept below 2^31 so the
    raised chain stays on the fast 32-bit Montgomery path; otherwise P gets
    one extra bit up to the 63-bit Montgomery budget."""
    bits = max(m.bit_length() for m in ctx.moduli)
    if ctx.chain.small:
        bound, min_bits = 1 << 31, bits
    else:
        bound, min_bits = 1 << min(63, bits + 1), bits
    p = get_first_prime_down(bound, ctx.degree)
    while p is not None and (p in ctx.moduli or p.bit_length() < min_bits):
        p = get_first_prime_down(p, ctx.degree)
    if p is None:
        raise ValueError("no special prime available for this chain")
    return p


def _mont_const_per_channel(values, moduli, rbits: int) -> jnp.ndarray:
    """Per-channel scalar constants in Montgomery form -> (L, 2, 1)."""
    vals = [(int(v) << rbits) % int(q) for v, q in zip(values, moduli)]
    lo = np.array([v & 0xFFFFFFFF for v in vals], dtype=np.uint32)
    hi = np.array([(v >> 32) & 0xFFFFFFFF for v in vals], dtype=np.uint32)
    return jnp.asarray(np.stack([lo, hi], axis=1)[:, :, None])


def _gadget_pairs(
    sk: SecretKey,
    target: Poly,
    std_dev: float,
    ctx: CkksContext,
    rng: np.random.Generator,
    special: int,
):
    """Build stacked hybrid gadget pairs encoding ``target``.

    Digit i's plaintext over QP is P * e_i * t: channel i holds
    (P mod q_i) * t_i, every other channel (including P's) is zero. Channel
    masking commutes with the channel-local NTT, so the mask is applied
    directly on NTT-domain data. Returns (a, b, ext_ctx) with a/b uint32
    stacks of shape (L, L+1, 2, N) in NTT domain.
    """
    L = ctx.num_channels
    ext_ctx = CkksContext.build(ctx.moduli + (special,), ctx.degree)
    s_ext = sk.extend_to(ext_ctx)

    # (P mod q_j) * t_j on the base channels, in Montgomery form
    p_mod = _mont_const_per_channel(
        [special % q for q in ctx.moduli], ctx.moduli, ctx.chain.radix_bits
    )
    t_ntt = target.to_ntt_domain().data  # (L, 2, N)
    t_scaled = mm.mont_mul(t_ntt, p_mod, ctx.chain)

    # embed into L+1 channels (P channel = 0), then digit-mask
    zeros_p = jnp.zeros((1, 2, ctx.degree), dtype=jnp.uint32)
    t_ext = jnp.concatenate([t_scaled, zeros_p], axis=0)  # (L+1, 2, N)
    eye = jnp.equal(
        jnp.arange(L)[:, None], jnp.arange(L + 1)[None, :]
    )[:, :, None, None]
    plain = jnp.where(eye, t_ext[None, :, :, :], 0).astype(jnp.uint32)

    a_list, b_list = [], []
    for _ in range(L):
        a_i = Poly.sample_uniform(ext_ctx, rng).to_ntt_domain()
        e_i = Poly.sample_gaussian(ext_ctx, std_dev, rng).to_ntt_domain()
        b_i = -(a_i * s_ext) + e_i
        a_list.append(a_i.data)
        b_list.append(b_i.data)
    a_stack = jnp.stack(a_list)  # (L, L+1, 2, N)
    b_stack = mm.add_mod(jnp.stack(b_list), plain, ext_ctx.chain)
    return a_stack, b_stack, ext_ctx


@dataclasses.dataclass(frozen=True, eq=False)
class RnsGadgetRelinKey:
    """Gadget relinearization key: digit i encodes P * e_i * s^2 over QP.

    a/b: uint32 (L, L+1, 2, N) NTT-domain stacks
    (digit, channel incl. special, limb, coeff).
    """

    a: jnp.ndarray
    b: jnp.ndarray
    ctx: CkksContext
    ext_ctx: CkksContext
    special: int

    @staticmethod
    def generate(
        sk: SecretKey,
        std_dev: float,
        ctx: CkksContext,
        rng: np.random.Generator,
        special: int | None = None,
    ) -> "RnsGadgetRelinKey":
        special = special or default_special_prime(ctx)
        s_sq = sk.poly * sk.poly  # NTT domain
        a, b, ext_ctx = _gadget_pairs(sk, s_sq, std_dev, ctx, rng, special)
        return RnsGadgetRelinKey(
            a=a, b=b, ctx=ctx, ext_ctx=ext_ctx, special=special
        )


@dataclasses.dataclass(frozen=True, eq=False)
class RnsGadgetRotationKey:
    """Gadget rotation key: digit i encodes P * e_i * s(X^{5^k}) over QP."""

    a: jnp.ndarray
    b: jnp.ndarray
    rotation: int
    ctx: CkksContext
    ext_ctx: CkksContext
    special: int

    @staticmethod
    def generate(
        sk: SecretKey,
        rotation: int,
        std_dev: float,
        ctx: CkksContext,
        rng: np.random.Generator,
        special: int | None = None,
    ) -> "RnsGadgetRotationKey":
        special = special or default_special_prime(ctx)
        s_k = sk.poly.rotate_slots(rotation)
        a, b, ext_ctx = _gadget_pairs(sk, s_k, std_dev, ctx, rng, special)
        return RnsGadgetRotationKey(
            a=a, b=b, rotation=rotation, ctx=ctx, ext_ctx=ext_ctx,
            special=special,
        )


@dataclasses.dataclass(frozen=True, eq=False)
class LevelKeys:
    """Key material specialised to one RNS level."""

    ctx: CkksContext
    sk: SecretKey
    pk: PublicKey
    rlk: RnsGadgetRelinKey
    rot: dict  # rotation offset -> RnsGadgetRotationKey


class KeyLadder:
    """Per-level key ladder generated once up front.

    The reference's examples re-derive a truncated secret key and regenerate
    pk/rlk after every rescale (reference examples/horner_chain.rs:233-239,
    tests/integration_mul.rs:191-204). A ladder built at keygen time is the
    idiomatic replacement (SURVEY.md §5 checkpoint/resume note): level l's
    secret key is the channel-truncated master secret, and fresh pk/rlk/rotk
    pairs are sampled per level.
    """

    def __init__(
        self,
        master_ctx: CkksContext,
        sk: SecretKey,
        error_variance: float,
        rng: np.random.Generator,
        rotations: tuple = (),
        min_level: int = 1,
    ):
        self.levels: dict[int, LevelKeys] = {}
        std = float(error_variance) ** 0.5
        ctx = master_ctx
        while ctx.num_channels >= max(1, min_level):
            sk_l = sk.reduce_to(ctx)
            pk_l = PublicKey.generate(sk_l, 3.2, ctx, rng)
            rlk_l = (
                RnsGadgetRelinKey.generate(sk_l, std, ctx, rng)
                if ctx.num_channels >= 1
                else None
            )
            rot_l = {
                r: RnsGadgetRotationKey.generate(sk_l, r, std, ctx, rng)
                for r in rotations
            }
            self.levels[ctx.num_channels] = LevelKeys(
                ctx=ctx, sk=sk_l, pk=pk_l, rlk=rlk_l, rot=rot_l
            )
            if ctx.num_channels == 1:
                break
            ctx = ctx.drop_last(1)

    def at_level(self, num_channels: int) -> LevelKeys:
        return self.levels[num_channels]

    def for_ctx(self, ctx: CkksContext) -> LevelKeys:
        return self.levels[ctx.num_channels]
