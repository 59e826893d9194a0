"""Vectorised modular arithmetic over an RNS modulus chain.

Every residue channel i holds values mod q_i for an NTT-friendly prime
q_i < 2^63. On device, residues are stored in **Montgomery form**
(x -> x * 2^64 mod q) as uint32 (lo, hi) limb pairs, so a modular multiply
is a single Montgomery REDC built from 16-bit half-word products — no u128,
no divisions, no data-dependent control flow. Addition/subtraction are
Montgomery-invariant.

Replaces the reference's u128-widening ``mul_mod``/branchy ``add_mod``
(reference: src/rings/backends/rns_ntt/poly.rs:629-653) with a fused,
branch-free formulation XLA vectorises across the full (L, N) residue plane.

Cross-channel motions (gadget decomposition, rescale) need *plain* values:
  - from Montgomery:  plain = mont_mul(x, 1)
  - reduce any u64 x mod q: mont_mul(x, R mod q)      (one REDC)
  - any u64 x into Montgomery form: mont_mul(x, R^2 mod q)
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from .u64 import (
    add64,
    add128,
    geq64,
    mul64_128,
    mullo64,
    select64,
    sub64,
    umul32,
)

R = 1 << 64


def _split_u64_np(values) -> tuple[np.ndarray, np.ndarray]:
    arr = [int(v) for v in values]
    lo = np.array([v & 0xFFFFFFFF for v in arr], dtype=np.uint32)
    hi = np.array([(v >> 32) & 0xFFFFFFFF for v in arr], dtype=np.uint32)
    return lo, hi


@dataclasses.dataclass(frozen=True, eq=False)
class ModulusChain:
    """Precomputed per-channel Montgomery constants for an RNS prime chain.

    Device arrays have shape (L, 2, 1): channel axis, u64 limb axis, and a
    broadcast axis against the coefficient dimension N. The chain is part of
    the jittable pytree (constants are traced arrays, so one compiled program
    serves any chain of the same length).

    Two Montgomery radices are supported, selected statically per chain:
    - R = 2^64 (generic, any primes < 2^63)
    - R = 2^32 ("small" fast path when every prime < 2^31): one REDC costs
      ~9 half-word multiplies instead of ~48, and the hi limbs stay zero.
    """

    moduli: tuple[int, ...]  # host-side exact values
    q: jnp.ndarray  # (L, 2, 1) uint32
    qinv: jnp.ndarray  # -q^{-1} mod R
    r2: jnp.ndarray  # R^2 mod q      (x -> Montgomery form)
    rmod: jnp.ndarray  # R mod q      (reduce any value < 2^64 mod q)
    one_mont: jnp.ndarray  # Montgomery form of 1 (= R mod q)
    small: bool  # True -> R = 2^32 fast path

    @staticmethod
    def build(moduli, small: bool | None = None) -> "ModulusChain":
        """``small=None`` picks the radix automatically; passing an explicit
        value forces it — required when deriving a chain for a SLICE of an
        existing chain's data, which must keep the parent's Montgomery
        radix (a 2^64-form residue is NOT a 2^32-form residue)."""
        from ..errors import EmptyBasis, NonNttFriendlyModulus

        moduli = tuple(int(m) for m in moduli)
        if not moduli:
            raise EmptyBasis("modulus chain must contain at least one prime")
        for m in moduli:
            if m % 2 == 0 or m >= (1 << 63):
                raise NonNttFriendlyModulus(
                    f"modulus {m} must be odd and < 2^63"
                )
        if small is None:
            small = all(m < (1 << 31) for m in moduli)
        elif small and not all(m < (1 << 31) for m in moduli):
            raise ValueError("small radix requires all moduli < 2^31")
        radix = (1 << 32) if small else R
        qinv = [(-pow(m, -1, radix)) % radix for m in moduli]
        r2 = [(radix * radix) % m for m in moduli]
        rmod = [radix % m for m in moduli]

        def pack(vals):
            lo, hi = _split_u64_np(vals)
            return jnp.asarray(
                np.stack([lo, hi], axis=1)[:, :, None]
            )  # (L, 2, 1)

        return ModulusChain(
            moduli=moduli,
            q=pack(moduli),
            qinv=pack(qinv),
            r2=pack(r2),
            rmod=pack(rmod),
            one_mont=pack(rmod),
            small=small,
        )

    @property
    def radix_bits(self) -> int:
        return 32 if self.small else 64

    def __len__(self) -> int:
        return len(self.moduli)

    def drop_last(self, count: int = 1) -> "ModulusChain":
        from ..errors import InvalidModDrop

        if count >= len(self.moduli):
            raise InvalidModDrop("drop_last: cannot drop all channels")
        keep = len(self.moduli) - count
        return ModulusChain(
            moduli=self.moduli[:keep],
            q=self.q[:keep],
            qinv=self.qinv[:keep],
            r2=self.r2[:keep],
            rmod=self.rmod[:keep],
            one_mont=self.one_mont[:keep],
            small=self.small,
        )

    def total_bits(self) -> int:
        """Sum of floor(log2 q_i) — parity with RnsBasis::total_bits
        (reference: src/rings/backends/rns_ntt/basis.rs:140-145)."""
        return sum(m.bit_length() - 1 for m in self.moduli)


def _pair(x: jnp.ndarray):
    """View a stacked (..., 2, N) limb array as a (lo, hi) tuple."""
    return x[..., 0, :], x[..., 1, :]


def _stack(pair) -> jnp.ndarray:
    return jnp.stack(pair, axis=-2)


def mont_mul_pair(a, b, q, qinv, small: bool = False):
    """Montgomery product on (lo, hi) pairs: returns a*b*R^{-1} mod q.

    Generic path (R = 2^64): b < q; a < 2^64 (a may exceed q — used for
    reductions). Small path (R = 2^32, primes < 2^31): both operands must
    have zero hi limbs (a < 2^32, b < q < 2^31). Output in [0, q).
    """
    if small:
        t_lo, t_hi = umul32(a[0], b[0])
        m = t_lo * qinv[0]  # mod 2^32 (wrapping)
        mq_lo, mq_hi = umul32(m, q[0])
        s = add64((t_lo, t_hi), (mq_lo, mq_hi))  # < 2^63 + 2^63: no overflow
        res = s[1]  # (t + m*q) >> 32, < 2q < 2^32
        res = jnp.where(res >= q[0], res - q[0], res)
        return res, jnp.zeros_like(res)
    t = mul64_128(a, b)
    m = mullo64((t[0], t[1]), qinv)
    mq = mul64_128(m, q)
    s = add128(t, mq)
    res = (s[2], s[3])
    return select64(geq64(res, q), sub64(res, q), res)


def add_mod_pair(a, b, q):
    s = add64(a, b)
    return select64(geq64(s, q), sub64(s, q), s)


def sub_mod_pair(a, b, q):
    # a - b mod q, both in [0, q)
    d = sub64(a, b)
    dq = add64(d, q)
    return select64(geq64(a, b), d, dq)


def neg_mod_pair(a, q):
    nz = (a[0] != 0) | (a[1] != 0)
    d = sub64(q, a)
    return (
        jnp.where(nz, d[0], jnp.zeros_like(a[0])),
        jnp.where(nz, d[1], jnp.zeros_like(a[1])),
    )


# ── Stacked-array wrappers (poly layer convention: (..., L, 2, N)) ────────────


def mont_mul(a: jnp.ndarray, b: jnp.ndarray, chain: ModulusChain) -> jnp.ndarray:
    return _stack(
        mont_mul_pair(
            _pair(a), _pair(b), _pair(chain.q), _pair(chain.qinv), chain.small
        )
    )


def add_mod(a: jnp.ndarray, b: jnp.ndarray, chain: ModulusChain) -> jnp.ndarray:
    return _stack(add_mod_pair(_pair(a), _pair(b), _pair(chain.q)))


def sub_mod(a: jnp.ndarray, b: jnp.ndarray, chain: ModulusChain) -> jnp.ndarray:
    return _stack(sub_mod_pair(_pair(a), _pair(b), _pair(chain.q)))


def neg_mod(a: jnp.ndarray, chain: ModulusChain) -> jnp.ndarray:
    return _stack(neg_mod_pair(_pair(a), _pair(chain.q)))


def to_mont(a: jnp.ndarray, chain: ModulusChain) -> jnp.ndarray:
    """Plain residues -> Montgomery form, reduced.

    Generic chains accept any u64 input; small chains require inputs with
    zero hi limbs (always true for residues of <2^31 primes)."""
    return _stack(
        mont_mul_pair(
            _pair(a), _pair(chain.r2), _pair(chain.q), _pair(chain.qinv),
            chain.small,
        )
    )


def from_mont(a: jnp.ndarray, chain: ModulusChain) -> jnp.ndarray:
    """Montgomery form -> plain residues in [0, q)."""
    one = (jnp.ones_like(a[..., 0, :]), jnp.zeros_like(a[..., 1, :]))
    return _stack(
        mont_mul_pair(
            _pair(a), one, _pair(chain.q), _pair(chain.qinv), chain.small
        )
    )


def reduce_u64(a: jnp.ndarray, chain: ModulusChain) -> jnp.ndarray:
    """Reduce arbitrary plain u64 values mod each channel's q (plain out)."""
    ap = _pair(a)
    q, qinv = _pair(chain.q), _pair(chain.qinv)
    if chain.small:
        # x = hi*2^32 + lo: hi*2^32 mod q = mont32(hi, R^2 mod q),
        # lo mod q = mont32(lo, R mod q); sum the two.
        zeros = jnp.zeros_like(ap[0])
        lo_red = mont_mul_pair(
            (ap[0], zeros), _pair(chain.rmod), q, qinv, True
        )
        hi_red = mont_mul_pair(
            (ap[1], zeros), _pair(chain.r2), q, qinv, True
        )
        return _stack(add_mod_pair(lo_red, hi_red, q))
    return _stack(mont_mul_pair(ap, _pair(chain.rmod), q, qinv))


# ── Host <-> device residue packing ──────────────────────────────────────────


def pack_residues(res: np.ndarray) -> np.ndarray:
    """Object/uint64 residue matrix (L, N) -> uint32 limb array (L, 2, N)."""
    res = np.asarray(res, dtype=object)
    lo = (res & 0xFFFFFFFF).astype(np.uint32)
    hi = (res >> 32).astype(np.uint32)
    return np.stack([lo, hi], axis=-2)


def unpack_residues(limbs: np.ndarray) -> np.ndarray:
    """uint32 limb array (..., 2, N) -> object array of exact ints (..., N)."""
    limbs = np.asarray(limbs)
    lo = limbs[..., 0, :].astype(object)
    hi = limbs[..., 1, :].astype(object)
    return lo + (hi << 32)
