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


def default_special_primes(ctx: CkksContext, count: int = 1) -> tuple[int, ...]:
    """Pick ``count`` NTT-friendly special primes ~ max(q_i), distinct from
    the chain (and each other).

    For "small" chains (all primes < 2^31) the specials stay below 2^31 so
    the raised chain keeps the fast 32-bit Montgomery path; otherwise they
    get one extra bit up to the 63-bit Montgomery budget."""
    bits = max(m.bit_length() for m in ctx.moduli)
    if ctx.chain.small and bits <= 30:
        # keep the raised chain under 2^30 so the lazy-reduction NTT
        # kernels stay eligible; specials may be marginally below max(q)
        # (P ~ Q_t, the few lost bits are absorbed by the noise budget)
        bound, min_bits = 1 << 30, bits - 1
    elif ctx.chain.small:
        bound, min_bits = 1 << 31, bits
    else:
        bound, min_bits = 1 << min(63, bits + 1), bits
    out: list[int] = []
    p = get_first_prime_down(bound, ctx.degree)
    while p is not None and len(out) < count:
        if p not in ctx.moduli and p.bit_length() >= min_bits:
            out.append(p)
        p = get_first_prime_down(p, ctx.degree)
    if len(out) < count:
        raise ValueError("not enough special primes available for this chain")
    return tuple(out)


def default_special_prime(ctx: CkksContext) -> int:
    return default_special_primes(ctx, 1)[0]


def digit_groups(num_channels: int, digit_size: int) -> tuple[tuple[int, ...], ...]:
    """Contiguous RNS-channel groups of size <= digit_size (the hybrid
    key-switch decomposition digits; digit_size=1 is the reference's
    per-channel gadget, engine.rs:505-528)."""
    if digit_size < 1:
        raise ValueError("digit_size must be >= 1")
    return tuple(
        tuple(range(lo, min(lo + digit_size, num_channels)))
        for lo in range(0, num_channels, digit_size)
    )


def dec_inv_ints(moduli, digit_size: int) -> tuple:
    """Plain (Qhat_{t,k})^{-1} mod q_k per base channel, under the
    ``digit_groups`` decomposition (Qhat_{t,k} = prod of digit t's other
    moduli). Single source of truth for the hybrid key-switch
    decomposition constants — both ``engine._switch_plan``'s packer and
    the fused fold paths (``ops/small_fast.py``, ``ops/wide_fast.py``)
    derive from here, so the digit grouping can never drift between them.
    """
    moduli = tuple(int(m) for m in moduli)
    out = [0] * len(moduli)
    for grp in digit_groups(len(moduli), min(digit_size, len(moduli))):
        for k in grp:
            qhat = 1
            for k2 in grp:
                if k2 != k:
                    qhat *= moduli[k2]
            out[k] = pow(qhat % moduli[k], -1, moduli[k])
    return tuple(out)


def sp_inv_ints(special_moduli) -> tuple:
    """Plain (Phat_m)^{-1} mod p_m per special channel
    (Phat_m = P / p_m, P = prod of the special primes) — the mod-down
    base-conversion constants, shared like ``dec_inv_ints``."""
    specials = tuple(int(m) for m in special_moduli)
    p_total = 1
    for p in specials:
        p_total *= p
    return tuple(pow((p_total // pm) % pm, -1, pm) for pm in specials)


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
    specials: tuple[int, ...],
    digit_size: int = 1,
):
    """Build stacked hybrid gadget pairs encoding ``target``.

    The base chain is partitioned into D = ceil(L/digit_size) digits (the
    reference's gadget is the digit_size=1 case, one digit per RNS channel —
    engine.rs:505-528). Digit t's plaintext over QP is P * T_t * target,
    where T_t is the CRT indicator of the digit's prime group (T_t = 1 mod
    each q_k in group t, 0 mod the others); since T_t mod q_j is 0/1, the
    plaintext is simply (P mod q_j) * t_j on the group's channels and zero
    elsewhere (the P*T_t term vanishes mod every special prime because P
    divides it). Channel masking commutes with the channel-local NTT.

    Returns (a, b, ext_ctx): uint32 stacks of shape (D, L+g', 2, N) in NTT
    domain, g' = len(specials).
    """
    L = ctx.num_channels
    groups = digit_groups(L, digit_size)
    ext_ctx = CkksContext.build(ctx.moduli + tuple(specials), ctx.degree)
    s_ext = sk.extend_to(ext_ctx)
    p_total = 1
    for p in specials:
        p_total *= p

    # (P mod q_j) * t_j on the base channels, in Montgomery form
    p_mod = _mont_const_per_channel(
        [p_total % q for q in ctx.moduli], ctx.moduli, ctx.chain.radix_bits
    )
    t_ntt = target.to_ntt_domain().data  # (L, 2, N)
    t_scaled = mm.mont_mul(t_ntt, p_mod, ctx.chain)

    # embed into L+g' channels (special channels = 0), then group-mask
    zeros_p = jnp.zeros((len(specials), 2, ctx.degree), dtype=jnp.uint32)
    t_ext = jnp.concatenate([t_scaled, zeros_p], axis=0)  # (E, 2, N)
    group_of = np.full(L + len(specials), -1, dtype=np.int64)
    for t, grp in enumerate(groups):
        for k in grp:
            group_of[k] = t
    mask = jnp.equal(
        jnp.arange(len(groups))[:, None], jnp.asarray(group_of)[None, :]
    )[:, :, None, None]
    plain = jnp.where(mask, t_ext[None, :, :, :], 0).astype(jnp.uint32)

    # The uniform ``a`` halves come from a dedicated seed drawn from the
    # caller's rng, so a key can be serialized as (b, a_seed) and the a
    # stack regenerated on load — half the key bytes at rest/in flight
    # (the public-seed compression every production FHE library ships;
    # the reference stores full pairs, engine.rs:288-335).
    a_seed = int(rng.integers(0, 2**63))
    a_stack = regenerate_gadget_a(ext_ctx, len(groups), a_seed)
    b_list = []
    for t in range(len(groups)):
        a_i = Poly(a_stack[t], ext_ctx, True)
        e_i = Poly.sample_gaussian(ext_ctx, std_dev, rng).to_ntt_domain()
        b_i = -(a_i * s_ext) + e_i
        b_list.append(b_i.data)
    b_stack = mm.add_mod(jnp.stack(b_list), plain, ext_ctx.chain)
    return a_stack, b_stack, ext_ctx, a_seed


def regenerate_gadget_a(ext_ctx: CkksContext, num_digits: int,
                        a_seed: int) -> jnp.ndarray:
    """Re-derive a gadget key's uniform ``a`` stack (D, E, 2, N) from its
    compression seed — bit-identical to the stack built at generation."""
    from .math.sampling import make_rng

    a_rng = make_rng(a_seed)
    return jnp.stack([
        Poly.sample_uniform(ext_ctx, a_rng).to_ntt_domain().data
        for _ in range(num_digits)
    ])


def _resolve_specials(
    ctx: CkksContext,
    special: int | None,
    specials: tuple[int, ...] | None,
    digit_size: int,
) -> tuple[int, ...]:
    if specials is not None:
        return tuple(int(p) for p in specials)
    if special is not None:
        return (int(special),)
    groups = digit_groups(ctx.num_channels, digit_size)
    return default_special_primes(ctx, max(len(g) for g in groups))


@dataclasses.dataclass(frozen=True, eq=False)
class RnsGadgetRelinKey:
    """Gadget relinearization key: digit t encodes P * T_t * s^2 over QP.

    a/b: uint32 (D, L+g', 2, N) NTT-domain stacks
    (digit, channel incl. specials, limb, coeff). ``digit_size`` channels
    per digit; the number of special primes g' equals the digit size, so
    key-switch noise stays ~ the digit_size=1 level while the dominant
    decomposition cost drops from L*(L+1) to D*(L+g') channel-NTTs.
    """

    a: jnp.ndarray
    b: jnp.ndarray
    ctx: CkksContext
    ext_ctx: CkksContext
    special: int  # product of the special primes
    digit_size: int = 1
    a_seed: int | None = None  # compression seed for the uniform a stack

    @staticmethod
    def generate(
        sk: SecretKey,
        std_dev: float,
        ctx: CkksContext,
        rng: np.random.Generator,
        special: int | None = None,
        specials: tuple[int, ...] | None = None,
        digit_size: int = 1,
    ) -> "RnsGadgetRelinKey":
        sp = _resolve_specials(ctx, special, specials, digit_size)
        s_sq = sk.poly * sk.poly  # NTT domain
        a, b, ext_ctx, a_seed = _gadget_pairs(
            sk, s_sq, std_dev, ctx, rng, sp, digit_size
        )
        p_total = 1
        for p in sp:
            p_total *= p
        return RnsGadgetRelinKey(
            a=a, b=b, ctx=ctx, ext_ctx=ext_ctx, special=p_total,
            digit_size=digit_size, a_seed=a_seed,
        )


@dataclasses.dataclass(frozen=True, eq=False)
class RnsGadgetRotationKey:
    """Gadget rotation key: digit t encodes P * T_t * s(X^{5^k}) over QP."""

    a: jnp.ndarray
    b: jnp.ndarray
    rotation: int
    ctx: CkksContext
    ext_ctx: CkksContext
    special: int  # product of the special primes
    digit_size: int = 1
    a_seed: int | None = None  # compression seed for the uniform a stack
    # inverse-permuted key planes for hoisted rotation, built once on
    # first use (dict contents are mutable; the dataclass stays frozen)
    hoist_cache: dict = dataclasses.field(default_factory=dict, repr=False)

    @staticmethod
    def generate(
        sk: SecretKey,
        rotation: int,
        std_dev: float,
        ctx: CkksContext,
        rng: np.random.Generator,
        special: int | None = None,
        specials: tuple[int, ...] | None = None,
        digit_size: int = 1,
    ) -> "RnsGadgetRotationKey":
        sp = _resolve_specials(ctx, special, specials, digit_size)
        s_k = sk.poly.rotate_slots(rotation)
        a, b, ext_ctx, a_seed = _gadget_pairs(
            sk, s_k, std_dev, ctx, rng, sp, digit_size
        )
        p_total = 1
        for p in sp:
            p_total *= p
        return RnsGadgetRotationKey(
            a=a, b=b, rotation=rotation, ctx=ctx, ext_ctx=ext_ctx,
            special=p_total, digit_size=digit_size, a_seed=a_seed,
        )


@dataclasses.dataclass(frozen=True, eq=False)
class RnsGadgetConjugationKey:
    """Gadget key for slot conjugation: digit t encodes P * T_t * s(X^{2N-1}).

    Completes the automorphism group surface (the reference exposes only
    the root-5 rotations, poly.rs:543-569; conjugation X -> X^{2N-1} is
    the remaining coset — needed e.g. to extract real parts
    homomorphically: Re(x) = (x + conj(x)) / 2).
    """

    a: jnp.ndarray
    b: jnp.ndarray
    ctx: CkksContext
    ext_ctx: CkksContext
    special: int
    digit_size: int = 1
    a_seed: int | None = None  # compression seed for the uniform a stack

    @staticmethod
    def generate(
        sk: SecretKey,
        std_dev: float,
        ctx: CkksContext,
        rng: np.random.Generator,
        special: int | None = None,
        specials: tuple[int, ...] | None = None,
        digit_size: int = 1,
    ) -> "RnsGadgetConjugationKey":
        sp = _resolve_specials(ctx, special, specials, digit_size)
        s_conj = sk.poly.conjugate()
        a, b, ext_ctx, a_seed = _gadget_pairs(
            sk, s_conj, std_dev, ctx, rng, sp, digit_size
        )
        p_total = 1
        for p in sp:
            p_total *= p
        return RnsGadgetConjugationKey(
            a=a, b=b, ctx=ctx, ext_ctx=ext_ctx, special=p_total,
            digit_size=digit_size, a_seed=a_seed,
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
    """Per-level key ladder (eager or lazy).

    The reference's examples re-derive a truncated secret key and regenerate
    pk/rlk after every rescale (reference examples/horner_chain.rs:233-239,
    tests/integration_mul.rs:191-204). A ladder built at keygen time is the
    idiomatic replacement (SURVEY.md §5 checkpoint/resume note): level l's
    secret key is the channel-truncated master secret, and fresh pk/rlk/rotk
    pairs are sampled per level.

    Key material is ~ D*(L+g')*2*N*8 bytes per level; ``lazy=True`` defers
    each level's generation to its first ``at_level`` call (a pipeline that
    only ever visits a few levels pays only for those), and
    ``memory_bytes()`` reports the device bytes currently held.
    """

    def __init__(
        self,
        master_ctx: CkksContext,
        sk: SecretKey,
        error_variance: float,
        rng: np.random.Generator,
        rotations: tuple = (),
        min_level: int = 1,
        lazy: bool = False,
        digit_size: int = 1,
    ):
        self.levels: dict[int, LevelKeys] = {}
        self._std = float(error_variance) ** 0.5
        self._sk = sk
        self._rng = rng
        self._rotations = tuple(rotations)
        self.digit_size = digit_size
        self._min_level = max(1, min_level)
        self._ctxs: dict[int, CkksContext] = {}
        ctx = master_ctx
        while ctx.num_channels >= self._min_level:
            self._ctxs[ctx.num_channels] = ctx
            if ctx.num_channels == 1:
                break
            ctx = ctx.drop_last(1)
        if not lazy:
            for lvl in sorted(self._ctxs, reverse=True):
                self._generate(lvl)

    def _generate(self, num_channels: int) -> LevelKeys:
        ctx = self._ctxs[num_channels]
        sk_l = self._sk.reduce_to(ctx)
        pk_l = PublicKey.generate(sk_l, 3.2, ctx, self._rng)
        rlk_l = RnsGadgetRelinKey.generate(
            sk_l, self._std, ctx, self._rng, digit_size=self.digit_size
        )
        rot_l = {
            r: RnsGadgetRotationKey.generate(
                sk_l, r, self._std, ctx, self._rng,
                digit_size=self.digit_size,
            )
            for r in self._rotations
        }
        keys = LevelKeys(ctx=ctx, sk=sk_l, pk=pk_l, rlk=rlk_l, rot=rot_l)
        self.levels[num_channels] = keys
        return keys

    def at_level(self, num_channels: int) -> LevelKeys:
        keys = self.levels.get(num_channels)
        if keys is None:
            if num_channels not in self._ctxs:
                raise KeyError(
                    f"KeyLadder has no level {num_channels} "
                    f"(min_level={self._min_level})"
                )
            keys = self._generate(num_channels)
        return keys

    def for_ctx(self, ctx: CkksContext) -> LevelKeys:
        return self.at_level(ctx.num_channels)

    def memory_bytes(self) -> int:
        """Device bytes held by generated key material (keys only; the
        shared contexts/twiddles are not counted)."""
        total = 0
        for keys in self.levels.values():
            arrs = [keys.pk.a.data, keys.pk.b.data, keys.sk.poly.data]
            if keys.rlk is not None:
                arrs += [keys.rlk.a, keys.rlk.b]
            for rk in keys.rot.values():
                arrs += [rk.a, rk.b]
            total += sum(int(np.prod(a.shape)) * 4 for a in arrs)
        return total
