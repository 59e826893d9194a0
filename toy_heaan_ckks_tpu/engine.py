"""CkksEngine: the user-facing homomorphic crypto API.

Behavioral parity with the reference engine (reference: src/crypto/
engine.rs:13-540): keygen, encrypt/decrypt, homomorphic add, multiply with
RNS-gadget relinearization, exact rescale, and slot rotation with gadget
key switching; HEAAN-style logp/logq bookkeeping on every ciphertext.

TPU-native departures:
- Ciphertexts are resident in **NTT domain**; every ct x ct multiply is a
  pointwise pass, not 3 NTTs (the reference stores coefficient-domain
  ciphertexts and pays 12 + 6L NTTs per gadget multiply — SURVEY.md §3.3;
  here a gadget multiply costs L+5 batched NTT passes).
- The gadget decomposition runs as one batched (digit, channel) tensor op
  and a tree reduction, all inside a single jit: XLA fuses the Montgomery
  chains between stages.
- The noise-sigma conventions of the reference are preserved exactly,
  including its quirks: encrypt noise sigma = params.error_variance (3.2),
  public-key sigma hard-coded 3.2, gadget-key sigma = sqrt(error_variance)
  (reference engine.rs:57, :79, :92-93 — naming audit pending upstream,
  README.md:159-160).
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp

from .context import CkksContext
from .keys import (
    PublicKey,
    RelinearizationKey,
    RnsGadgetRelinKey,
    RnsGadgetRotationKey,
    RotationKey,
    SecretKey,
    SecretKeyParams,
)
from .ops import modular as mm
from .ops import poly as pops
from .ops.poly import Poly
from .types import Ciphertext, Plaintext


@dataclasses.dataclass(frozen=True)
class CkksParams:
    error_variance: float = 3.2
    hamming_weight: int = 0
    scale_bits: int = 30


def _mod_sum(stack: jnp.ndarray, chain, axis: int = -4) -> jnp.ndarray:
    """Modular tree-reduction over the digit axis (lead-dim polymorphic)."""
    sl = functools.partial(jax.lax.slice_in_dim, stack, axis=axis)
    n = stack.shape[axis]
    while n > 1:
        half = n // 2
        paired = mm.add_mod(sl(0, half), sl(half, 2 * half), chain)
        if n % 2:
            paired = jnp.concatenate([paired, sl(2 * half, n)], axis=axis)
        stack = paired
        sl = functools.partial(jax.lax.slice_in_dim, stack, axis=axis)
        n = stack.shape[axis]
    return jnp.squeeze(stack, axis=axis)


@jax.jit
def _gadget_key_switch(d_ntt, key_a, key_b, ctx: CkksContext, ext_ctx: CkksContext):
    """Hybrid RNS gadget key switch of an NTT-domain poly ``d`` over Q.

    alpha_i(d) broadcasts channel i's plain coefficient residues to every
    channel of the *raised* modulus QP (the reference's decomposition,
    engine.rs:505-528, extended with the special prime); the digit inner
    products (sum_i alpha_i * b_i, sum_i alpha_i * a_i) accumulate in NTT
    domain over QP and are then exactly divided by P (one RNS rescale),
    shrinking key-switch noise by 1/P. Costs 1+2 inverse + (L+2) forward
    batched NTT passes, all fused under one jit.
    """
    L = d_ntt.shape[-3]
    ext_ch = key_a.shape[-3]
    d_coeff = pops.to_coeff(d_ntt, ctx)
    plain = mm.from_mont(d_coeff, ctx.chain)
    ext_shape = plain.shape[:-3] + (L, ext_ch) + plain.shape[-2:]
    alpha_plain = jnp.broadcast_to(jnp.expand_dims(plain, -3), ext_shape)
    alpha = mm.to_mont(alpha_plain, ext_ctx.chain)  # Mont_j(d_i mod q_j)
    alpha_ntt = pops.to_ntt(alpha, ext_ctx)
    ks0 = _mod_sum(mm.mont_mul(alpha_ntt, key_b, ext_ctx.chain), ext_ctx.chain)
    ks1 = _mod_sum(mm.mont_mul(alpha_ntt, key_a, ext_ctx.chain), ext_ctx.chain)
    # divide by the special prime: QP -> Q, exact RNS rescale (NTT domain)
    return pops.rescale_ntt(ks0, ext_ctx), pops.rescale_ntt(ks1, ext_ctx)


@jax.jit
def _mul_gadget_core(c0, c1, d0, d1, key_a, key_b, ctx: CkksContext, ext_ctx: CkksContext):
    """Fused tensor product + gadget relinearization (all NTT domain)."""
    t0 = mm.mont_mul(c0, d0, ctx.chain)
    t1 = mm.add_mod(
        mm.mont_mul(c0, d1, ctx.chain),
        mm.mont_mul(c1, d0, ctx.chain),
        ctx.chain,
    )
    t2 = mm.mont_mul(c1, d1, ctx.chain)
    ks0, ks1 = _gadget_key_switch(t2, key_a, key_b, ctx, ext_ctx)
    return mm.add_mod(t0, ks0, ctx.chain), mm.add_mod(t1, ks1, ctx.chain)


class CkksEngine:
    """Homomorphic engine bound to a context + parameter set."""

    def __init__(self, context: CkksContext, params: CkksParams):
        self.context = context
        self.params = params

    @staticmethod
    def builder() -> "CkksEngineBuilder":
        return CkksEngineBuilder()

    # ── key generation ───────────────────────────────────────────────────

    def generate_secret_key(self, rng: np.random.Generator) -> SecretKey:
        return SecretKey.generate(
            SecretKeyParams(self.params.hamming_weight), self.context, rng
        )

    def generate_public_key(
        self, sk: SecretKey, rng: np.random.Generator
    ) -> PublicKey:
        # sigma hard-coded 3.2, parity with reference engine.rs:57
        return PublicKey.generate(sk, 3.2, self.context, rng)

    def generate_relinearization_key(
        self, sk: SecretKey, rng: np.random.Generator
    ) -> RelinearizationKey:
        return RelinearizationKey.generate(
            sk, float(np.sqrt(self.params.error_variance)), self.context, rng
        )

    def generate_rotation_key(
        self, sk: SecretKey, rotation: int, rng: np.random.Generator
    ) -> RotationKey:
        return RotationKey.generate(
            sk,
            rotation,
            float(np.sqrt(self.params.error_variance)),
            self.context,
            rng,
        )

    def generate_gadget_relin_key(
        self, sk: SecretKey, rng: np.random.Generator
    ) -> RnsGadgetRelinKey:
        return RnsGadgetRelinKey.generate(
            sk, float(np.sqrt(self.params.error_variance)), self.context, rng
        )

    def generate_gadget_rotation_key(
        self, sk: SecretKey, rotation: int, rng: np.random.Generator
    ) -> RnsGadgetRotationKey:
        return RnsGadgetRotationKey.generate(
            sk,
            rotation,
            float(np.sqrt(self.params.error_variance)),
            self.context,
            rng,
        )

    # ── encryption / decryption ──────────────────────────────────────────

    def encrypt(
        self,
        plaintext: Plaintext,
        public_key: PublicKey,
        logq: int,
        rng: np.random.Generator,
    ) -> Ciphertext:
        ctx = self.context
        u = Poly.sample_tribits(ctx, self.params.hamming_weight, rng).to_ntt_domain()
        # Parity quirk: the reference passes error_variance directly as the
        # sampler's std-dev at encrypt time (engine.rs:92-93).
        e0 = Poly.sample_gaussian(ctx, self.params.error_variance, rng).to_ntt_domain()
        e1 = Poly.sample_gaussian(ctx, self.params.error_variance, rng).to_ntt_domain()
        m = plaintext.poly.to_ntt_domain()
        c0 = public_key.b * u + e0 + m
        c1 = public_key.a * u + e1
        return Ciphertext(c0=c0, c1=c1, logp=plaintext.scale_bits, logq=logq)

    @staticmethod
    def decrypt(ciphertext: Ciphertext, secret_key: SecretKey) -> Plaintext:
        m = ciphertext.c1.to_ntt_domain() * secret_key.poly + ciphertext.c0.to_ntt_domain()
        return Plaintext(
            poly=m,
            scale_bits=ciphertext.logp,
            slots=ciphertext.ctx.degree // 2,
        )

    # ── level-free homomorphic ops ───────────────────────────────────────

    @staticmethod
    def add_ciphertexts(ct1: Ciphertext, ct2: Ciphertext) -> Ciphertext:
        assert ct1.logp == ct2.logp, "logp mismatch in addition"
        assert ct1.logq == ct2.logq, "logq mismatch in addition"
        return Ciphertext(
            c0=ct1.c0 + ct2.c0,
            c1=ct1.c1 + ct2.c1,
            logp=ct1.logp,
            logq=ct1.logq,
        )

    @staticmethod
    def neg_ciphertext(ct: Ciphertext) -> Ciphertext:
        return Ciphertext(c0=-ct.c0, c1=-ct.c1, logp=ct.logp, logq=ct.logq)

    @staticmethod
    def sub_ciphertexts(ct1: Ciphertext, ct2: Ciphertext) -> Ciphertext:
        assert ct1.logp == ct2.logp, "logp mismatch in subtraction"
        assert ct1.logq == ct2.logq, "logq mismatch in subtraction"
        return Ciphertext(
            c0=ct1.c0 - ct2.c0,
            c1=ct1.c1 - ct2.c1,
            logp=ct1.logp,
            logq=ct1.logq,
        )

    # ── multiplication ───────────────────────────────────────────────────

    @staticmethod
    def mul_ciphertexts(
        ct1: Ciphertext, ct2: Ciphertext, relin_key: RelinearizationKey
    ) -> Ciphertext:
        """Legacy single-pair relinearization (reference engine.rs:153-203).

        Noise grows with |d2| * q; kept for API parity — prefer
        ``mul_ciphertexts_gadget``.
        """
        assert ct1.logq == ct2.logq, "logq mismatch in multiplication"
        a0, a1 = ct1.c0.to_ntt_domain(), ct1.c1.to_ntt_domain()
        b0, b1 = ct2.c0.to_ntt_domain(), ct2.c1.to_ntt_domain()
        d0 = a0 * b0
        d1 = a0 * b1 + a1 * b0
        d2 = a1 * b1
        c0 = d0 + relin_key.b * d2
        c1 = d1 + relin_key.a * d2
        return Ciphertext(
            c0=c0, c1=c1, logp=ct1.logp + ct2.logp, logq=ct1.logq
        )

    @staticmethod
    def mul_ciphertexts_gadget(
        ct1: Ciphertext, ct2: Ciphertext, rlk: RnsGadgetRelinKey
    ) -> Ciphertext:
        """Tensor product + RNS gadget relinearization
        (reference engine.rs:473-539). Output logp = logp1 + logp2."""
        assert ct1.logq == ct2.logq, "logq mismatch in gadget multiplication"
        ctx = ct1.ctx
        c0, c1 = _mul_gadget_core(
            ct1.c0.to_ntt_domain().data,
            ct1.c1.to_ntt_domain().data,
            ct2.c0.to_ntt_domain().data,
            ct2.c1.to_ntt_domain().data,
            rlk.a,
            rlk.b,
            ctx,
            rlk.ext_ctx,
        )
        return Ciphertext(
            c0=Poly(c0, ctx, True),
            c1=Poly(c1, ctx, True),
            logp=ct1.logp + ct2.logp,
            logq=ct1.logq,
        )

    # ── rescale ──────────────────────────────────────────────────────────

    @staticmethod
    def rescale_ciphertext(ct: Ciphertext) -> Ciphertext:
        """Drop q_last and divide by it; logp/logq -= bit_length(q_last)
        (reference engine.rs:255-282 — the +1 in bit_length matters)."""
        q_last = ct.ctx.moduli[-1]
        bits_dropped = q_last.bit_length()
        c0 = ct.c0.rescale_ntt()
        c1 = ct.c1.rescale_ntt()
        return Ciphertext(
            c0=c0,
            c1=c1,
            logp=ct.logp - bits_dropped,
            logq=ct.logq - bits_dropped,
        )

    # ── rotation ─────────────────────────────────────────────────────────

    @staticmethod
    def rotate_ciphertext(
        ct: Ciphertext, rotk: RnsGadgetRotationKey
    ) -> Ciphertext:
        """Slot rotation via automorphism + gadget key switch
        (reference engine.rs:401-463). Level-free."""
        ctx = ct.ctx
        c0_rot = ct.c0.rotate_slots(rotk.rotation)
        c1_rot = ct.c1.rotate_slots(rotk.rotation)
        ks0, ks1 = _gadget_key_switch(
            c1_rot.to_ntt_domain().data, rotk.a, rotk.b, ctx, rotk.ext_ctx
        )
        c0_new = c0_rot.to_ntt_domain() + Poly(ks0, ctx, True)
        return Ciphertext(
            c0=c0_new,
            c1=Poly(ks1, ctx, True),
            logp=ct.logp,
            logq=ct.logq,
        )

    # ── plaintext multiplication (extensions required by specs/ctx.md) ───

    @staticmethod
    def mul_plain(ct: Ciphertext, pt: Plaintext) -> Ciphertext:
        """ct x plaintext (no relinearization needed). logp adds."""
        p = pt.poly.to_ntt_domain()
        return Ciphertext(
            c0=ct.c0.to_ntt_domain() * p,
            c1=ct.c1.to_ntt_domain() * p,
            logp=ct.logp + pt.scale_bits,
            logq=ct.logq,
        )

    def mul_plain_scalar(self, ct: Ciphertext, scalar: float) -> Ciphertext:
        """Multiply every slot by a scalar: encode round(scalar * Delta) as
        the constant polynomial and multiply (specs/ctx.md item 2).
        Follow with rescale_ciphertext to restore logp."""
        ctx = ct.ctx
        delta = 2.0 ** self.params.scale_bits
        coeffs = np.zeros(ctx.degree, dtype=object)
        coeffs[0] = int(round(scalar * delta))
        pt = Plaintext(
            poly=Poly.from_coeffs(coeffs, ctx),
            scale_bits=self.params.scale_bits,
            slots=ctx.degree // 2,
        )
        return self.mul_plain(ct, pt)

    @staticmethod
    def add_plain(ct: Ciphertext, pt: Plaintext) -> Ciphertext:
        assert ct.logp == pt.scale_bits, "scale mismatch in add_plain"
        return Ciphertext(
            c0=ct.c0.to_ntt_domain() + pt.poly.to_ntt_domain(),
            c1=ct.c1,
            logp=ct.logp,
            logq=ct.logq,
        )


class CkksEngineBuilder:
    """Engine builder with the reference's defaults
    (reference: src/crypto/builder.rs:6-57): sigma^2 = 3.2, hw = N/2."""

    def __init__(self):
        self._error_variance = 3.2
        self._hamming_weight: int | None = None
        self._scale_bits = 30

    def error_variance(self, v: float) -> "CkksEngineBuilder":
        self._error_variance = v
        return self

    def hamming_weight(self, hw: int) -> "CkksEngineBuilder":
        self._hamming_weight = hw
        return self

    def scale_bits(self, bits: int) -> "CkksEngineBuilder":
        self._scale_bits = bits
        return self

    def build_rns(self, degree: int, moduli) -> CkksEngine:
        ctx = CkksContext.build(moduli, degree)
        hw = self._hamming_weight if self._hamming_weight is not None else degree // 2
        return CkksEngine(
            ctx,
            CkksParams(
                error_variance=self._error_variance,
                hamming_weight=hw,
                scale_bits=self._scale_bits,
            ),
        )
