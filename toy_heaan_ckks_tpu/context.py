"""CkksContext: the static parameter pytree for one RNS level.

Replaces the reference's Arc<RnsBasis> identity checks and per-object
``in_ntt_domain`` flags (reference: src/rings/backends/rns_ntt/basis.rs,
poly.rs:16-30) with an immutable context pytree: moduli chain constants,
NTT twiddle tables and rescale constants are jit-time data, and dropping a
level produces a fresh (cached) context with L-1 channels. Shapes are
static per level, so XLA compiles one program per level — the idiomatic
answer to "dynamic level count vs jit" (SURVEY.md §7 hard parts).
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp

from .ops.modular import ModulusChain
from .ops.ntt import NttTables

jax.tree_util.register_dataclass(
    ModulusChain,
    data_fields=["q", "qinv", "r2", "rmod", "one_mont"],
    meta_fields=["moduli", "small"],
)

jax.tree_util.register_dataclass(
    NttTables,
    data_fields=["fwd", "inv", "n_inv"],
    meta_fields=["degree", "psi"],
)


def _mont_pack(
    values_per_channel: list[int], moduli: list[int], rbits: int
) -> jnp.ndarray:
    """Per-channel scalars -> (L, 2, 1) uint32 Montgomery-form constants."""
    vals = [(v << rbits) % q for v, q in zip(values_per_channel, moduli)]
    lo = np.array([v & 0xFFFFFFFF for v in vals], dtype=np.uint32)
    hi = np.array([(v >> 32) & 0xFFFFFFFF for v in vals], dtype=np.uint32)
    return jnp.asarray(np.stack([lo, hi], axis=1)[:, :, None])


@dataclasses.dataclass(frozen=True, eq=False)
class CkksContext:
    """All static data needed to operate on polynomials at one RNS level."""

    degree: int
    moduli: tuple[int, ...]
    chain: ModulusChain
    ntt: NttTables
    # Montgomery form of q_last^{-1} mod q_i for i < L-1: shape (L-1, 2, 1).
    # Used by the exact RNS rescale (drop q_last, divide by it).
    qlast_inv: jnp.ndarray

    @staticmethod
    @functools.lru_cache(maxsize=128)
    def _build_cached(
        moduli: tuple[int, ...], degree: int, small: bool | None = None
    ) -> "CkksContext":
        # Contexts may be (cache-)built while tracing (e.g. rescale_ntt
        # derives the dropped channel's context inside jit): force eager
        # array creation so the cache never captures tracers.
        with jax.ensure_compile_time_eval():
            return CkksContext._build_eager(moduli, degree, small)

    @staticmethod
    def _build_eager(
        moduli: tuple[int, ...], degree: int, small: bool | None = None
    ) -> "CkksContext":
        chain = ModulusChain.build(moduli, small)
        ntt = NttTables.build(chain, degree)
        if len(moduli) >= 2:
            q_last = moduli[-1]
            inv = [pow(q_last % q, -1, q) for q in moduli[:-1]]
            qlast_inv = _mont_pack(inv, list(moduli[:-1]), chain.radix_bits)
        else:
            qlast_inv = jnp.zeros((0, 2, 1), dtype=jnp.uint32)
        return CkksContext(
            degree=degree,
            moduli=moduli,
            chain=chain,
            ntt=ntt,
            qlast_inv=qlast_inv,
        )

    @staticmethod
    def build(
        moduli, degree: int, small: bool | None = None
    ) -> "CkksContext":
        """Build a context for ``moduli`` (NTT-friendly primes) at ``degree``.

        ``small`` forces the Montgomery radix (see ModulusChain.build);
        derived contexts for channel slices of existing data MUST inherit
        the parent's radix."""
        return CkksContext._build_cached(
            tuple(int(m) for m in moduli), degree, small
        )

    # ── level management ─────────────────────────────────────────────────

    @property
    def num_channels(self) -> int:
        return len(self.moduli)

    def drop_last(self, count: int = 1) -> "CkksContext":
        from .errors import InvalidModDrop

        if count >= len(self.moduli):
            raise InvalidModDrop("drop_last: cannot drop all channels")
        # inherit the radix: child data is a slice of this chain's residues
        return CkksContext.build(
            self.moduli[:-count], self.degree, self.chain.small
        )

    def slice_channels(self, start: int, stop: int) -> "CkksContext":
        """Context for a contiguous channel slice, same Montgomery radix."""
        return CkksContext.build(
            self.moduli[start:stop], self.degree, self.chain.small
        )

    def total_bits(self) -> int:
        return self.chain.total_bits()

    # ── host-side automorphism tables (cached per exponent) ──────────────

    @functools.lru_cache(maxsize=256)
    def automorphism_table(self, exponent: int):
        """(src_index[int32 N], negate[bool N]) for X -> X^exponent.

        out[j] = (-1)^{negate[j]} * in[src[j]]; coefficient-domain only.
        Parity: reference poly.rs:482-541 (forward scatter formulation;
        here inverted into a gather for TPU-friendliness).
        """
        n = self.degree
        two_n = 2 * n
        e = exponent % two_n
        if e % 2 == 0:
            raise ValueError("automorphism exponent must be odd")
        src = np.empty(n, dtype=np.int32)
        neg = np.empty(n, dtype=bool)
        for i in range(n):
            jf = (i * e) % two_n
            j = jf % n
            src[j] = i
            neg[j] = jf >= n
        return jnp.asarray(src), jnp.asarray(neg)

    @functools.lru_cache(maxsize=256)
    def automorphism_table_ntt(self, exponent: int):
        """NTT-domain automorphism: a pure slot permutation (no negation).

        Slot k of the tree-ordered NTT holds p(psi^{E_k}); sigma_e(p)
        evaluates there as p(psi^{e*E_k}) — another slot of the same NTT
        (the odd residues mod 2N are closed under multiplication by odd
        e). out[k] = in[perm[k]]. Avoids the reference's
        coefficient-domain round trip (poly.rs:482-541: 2 NTT passes per
        component per rotation) entirely.
        """
        from .ops.ntt import tree_leaf_exponents

        n = self.degree
        two_n = 2 * n
        e = exponent % two_n
        if e % 2 == 0:
            raise ValueError("automorphism exponent must be odd")
        exps = tree_leaf_exponents(n)
        idx_of = {v: i for i, v in enumerate(exps)}
        perm = np.fromiter(
            (idx_of[(e * v) % two_n] for v in exps), dtype=np.int32, count=n
        )
        return jnp.asarray(perm)


jax.tree_util.register_dataclass(
    CkksContext,
    data_fields=["chain", "ntt", "qlast_inv"],
    meta_fields=["degree", "moduli"],
)
