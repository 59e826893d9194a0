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

    @staticmethod
    def generate(
        params: SecretKeyParams, ctx: CkksContext, rng: np.random.Generator
    ) -> "SecretKey":
        params.validate(ctx.degree)
        s = Poly.sample_tribits(ctx, params.hamming_weight, rng)
        return SecretKey(poly=s.to_ntt_domain())

    def reduce_to(self, ctx: CkksContext) -> "SecretKey":
        """Truncate RNS channels to ``ctx`` (valid: channel truncation
        commutes with the channel-local NTT). Parity with the examples'
        reduce_sk idiom (reference tests/integration_mul.rs:56-65)."""
        drop = self.poly.ctx.num_channels - ctx.num_channels
        if drop < 0:
            raise ValueError("reduce_to: target context has more channels")
        if drop == 0:
            return self
        return SecretKey(poly=self.poly.mod_drop_last(drop))


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


# ── Gadget keys (per-RNS-channel decomposition) ──────────────────────────────


def _gadget_pairs(
    sk: SecretKey,
    target: Poly,
    std_dev: float,
    ctx: CkksContext,
    rng: np.random.Generator,
):
    """Build stacked gadget pairs encoding ``target`` (NTT domain).

    For each digit i: plaintext e_i * target (channel i = target's channel i,
    other channels 0), a_i <- uniform, b_i = -(a_i s) + err_i + e_i*target.
    Returns (a_stack, b_stack) uint32 arrays of shape (L, L, 2, N), NTT
    domain (parity: reference engine.rs:288-335; here the CRT-indicator
    masking is a single where() over the stacked digit axis because the
    channel-local NTT commutes with channel masking).
    """
    L = ctx.num_channels
    t_ntt = target.to_ntt_domain().data  # (L, 2, N)

    # digit-masked plaintexts: plain[i, j] = t_ntt[j] if j == i else 0
    eye = jnp.equal(
        jnp.arange(L)[:, None], jnp.arange(L)[None, :]
    )[:, :, None, None]
    plain = jnp.where(eye, t_ntt[None, :, :, :], 0).astype(jnp.uint32)

    a_list, b_list = [], []
    for _ in range(L):
        a_i = Poly.sample_uniform(ctx, rng).to_ntt_domain()
        e_i = Poly.sample_gaussian(ctx, std_dev, rng).to_ntt_domain()
        b_i = -(a_i * sk.poly) + e_i
        a_list.append(a_i.data)
        b_list.append(b_i.data)
    a_stack = jnp.stack(a_list)  # (L, L, 2, N)
    b_stack = mm.add_mod(jnp.stack(b_list), plain, ctx.chain)
    return a_stack, b_stack


@dataclasses.dataclass(frozen=True, eq=False)
class RnsGadgetRelinKey:
    """Gadget relinearization key: digit i encodes e_i * s^2.

    a/b: uint32 (L, L, 2, N) NTT-domain stacks (digit, channel, limb, coeff).
    """

    a: jnp.ndarray
    b: jnp.ndarray
    ctx: CkksContext

    @staticmethod
    def generate(
        sk: SecretKey, std_dev: float, ctx: CkksContext, rng: np.random.Generator
    ) -> "RnsGadgetRelinKey":
        s_sq = sk.poly * sk.poly  # NTT domain
        a, b = _gadget_pairs(sk, s_sq, std_dev, ctx, rng)
        return RnsGadgetRelinKey(a=a, b=b, ctx=ctx)


@dataclasses.dataclass(frozen=True, eq=False)
class RnsGadgetRotationKey:
    """Gadget rotation key: digit i encodes e_i * s(X^{5^k})."""

    a: jnp.ndarray
    b: jnp.ndarray
    rotation: int
    ctx: CkksContext

    @staticmethod
    def generate(
        sk: SecretKey,
        rotation: int,
        std_dev: float,
        ctx: CkksContext,
        rng: np.random.Generator,
    ) -> "RnsGadgetRotationKey":
        s_k = sk.poly.rotate_slots(rotation)
        a, b = _gadget_pairs(sk, s_k, std_dev, ctx, rng)
        return RnsGadgetRotationKey(a=a, b=b, rotation=rotation, ctx=ctx)
