"""Negacyclic NTT over Z_q[X]/(X^N + 1), vectorised for TPU.

Design (TPU-first, not a port):

The reference implements bit-reverse-permute + Cooley-Tukey with a separate
psi pre-twist/post-untwist pass (reference: src/rings/backends/rns_ntt/
poly.rs:574-625, basis.rs:5-84). Explicit bit-reversal and twisting are
gather-heavy and memory-bound on TPU, so instead we use the CRT-tree
("tournament") formulation with the twist merged into the stage twiddles:

    X^N + 1 = X^N - psi^N splits recursively as
    (X^t - psi^e) -> (X^{t/2} - psi^{e/2}) x (X^{t/2} - psi^{e/2 + N})

Each stage is one elementwise pass over the full (L, N) residue plane:
a reshape, one Montgomery multiply, one modular add and one subtract — no
permutations at all. The forward transform emits evaluations in tree order
(a fixed bit-reversal-like order); the inverse consumes exactly that order
and emits natural-order coefficients. Pointwise multiplication in tree
order equals negacyclic convolution, so ciphertexts can live in NTT domain
permanently and the order never needs to be materialised.

All data is in Montgomery form; twiddle tables are precomputed host-side
with exact integers and stored in Montgomery form, one (L, 2, m) array per
stage.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax.numpy as jnp

from ..math.primes import find_primitive_root
from .modular import (
    ModulusChain,
    add_mod_pair,
    mont_mul_pair,
    sub_mod_pair,
)


def _mont(v: int, q: int, rbits: int) -> int:
    return (v << rbits) % q


def _pack_stage(values_per_channel: list[list[int]]) -> jnp.ndarray:
    """[[channel twiddles]] -> (L, 2, m) uint32 array."""
    arr = np.asarray(values_per_channel, dtype=object)  # (L, m)
    lo = (arr & 0xFFFFFFFF).astype(np.uint32)
    hi = (arr >> 32).astype(np.uint32)
    return jnp.asarray(np.stack([lo, hi], axis=1))


def tree_exponent_stages(degree: int) -> list[list[int]]:
    """Per-stage twiddle exponents e (twiddle = psi^e), tree order."""
    stages = []
    d = [degree]
    while len(d) < degree:
        stages.append([x // 2 for x in d])
        d = [e for x in d for e in (x // 2, (x // 2 + degree) % (2 * degree))]
    return stages


@functools.lru_cache(maxsize=64)
def tree_leaf_exponents(degree: int) -> tuple[int, ...]:
    """Tree-order evaluation exponents: NTT slot k holds p(psi^{E_k}).

    The CRT tree splits (X^t - psi^e) into (X^{t/2} - psi^{e/2}) x
    (X^{t/2} - psi^{e/2 + N}); the leaves, in emission order, are the
    evaluation points of the tree-ordered NTT domain.
    """
    d = [degree]
    while len(d) < degree:
        d = [e for x in d for e in (x // 2, (x // 2 + degree) % (2 * degree))]
    return tuple(d)


@dataclasses.dataclass(frozen=True, eq=False)
class NttTables:
    """Precomputed per-channel NTT twiddles (Montgomery form) for one chain."""

    degree: int
    fwd: tuple[jnp.ndarray, ...]  # stage s: (L, 2, 2**s)
    inv: tuple[jnp.ndarray, ...]  # same indexing (used in reverse order)
    n_inv: jnp.ndarray  # (L, 2, 1) Montgomery form of N^{-1}
    psi: tuple[int, ...]  # host-side primitive 2N-th roots, per channel

    @staticmethod
    @functools.lru_cache(maxsize=64)
    def _build_cached(
        moduli: tuple[int, ...], degree: int, rbits: int
    ) -> "NttTables":
        two_n = 2 * degree
        psis = tuple(find_primitive_root(q, two_n) for q in moduli)
        stages_e = tree_exponent_stages(degree)

        fwd, inv = [], []
        for exps in stages_e:
            fwd_stage, inv_stage = [], []
            for q, psi in zip(moduli, psis):
                fwd_stage.append([_mont(pow(psi, e, q), q, rbits) for e in exps])
                inv_stage.append(
                    [_mont(pow(psi, two_n - e, q), q, rbits) for e in exps]
                )
            fwd.append(_pack_stage(fwd_stage))
            inv.append(_pack_stage(inv_stage))

        n_inv = _pack_stage(
            [[_mont(pow(degree, -1, q), q, rbits)] for q in moduli]
        )
        return NttTables(
            degree=degree,
            fwd=tuple(fwd),
            inv=tuple(inv),
            n_inv=n_inv,
            psi=psis,
        )

    @staticmethod
    def build(chain: ModulusChain, degree: int) -> "NttTables":
        from ..errors import InvalidDegree, NonNttFriendlyModulus

        if degree & (degree - 1) or degree < 2:
            raise InvalidDegree("NTT degree must be a power of two >= 2")
        for q in chain.moduli:
            if (q - 1) % (2 * degree) != 0:
                raise NonNttFriendlyModulus(
                    f"modulus {q} is not NTT-friendly for degree {degree}"
                )
        return NttTables._build_cached(chain.moduli, degree, chain.radix_bits)

    def level(self, num_channels: int) -> "NttTables":
        return NttTables(
            degree=self.degree,
            fwd=tuple(s[:num_channels] for s in self.fwd),
            inv=tuple(s[:num_channels] for s in self.inv),
            n_inv=self.n_inv[:num_channels],
            psi=self.psi[:num_channels],
        )


def _qpair(chain: ModulusChain, extra_dims: int):
    """Channel constants broadcast against (..., L, extra_dims..., t)."""
    shape = (-1,) + (1,) * extra_dims

    def reshape(x):
        return x.reshape(shape)

    q = (reshape(chain.q[:, 0, 0]), reshape(chain.q[:, 1, 0]))
    qinv = (reshape(chain.qinv[:, 0, 0]), reshape(chain.qinv[:, 1, 0]))
    return q, qinv


def forward_ntt(data: jnp.ndarray, tables: NttTables, chain: ModulusChain):
    """Coefficient domain (natural order) -> NTT domain (tree order).

    ``data``: uint32 (..., L, 2, N) in Montgomery form. Pure function.
    """
    n = tables.degree
    lead = data.shape[:-3]
    L = data.shape[-3]
    lo = data[..., 0, :].reshape(*lead, L, 1, n)
    hi = data[..., 1, :].reshape(*lead, L, 1, n)
    q, qinv = _qpair(chain, 2)

    m, t = 1, n
    for s, tw in enumerate(tables.fwd):
        half = t // 2
        lo4 = lo.reshape(*lead, L, m, 2, half)
        hi4 = hi.reshape(*lead, L, m, 2, half)
        u = (lo4[..., 0, :], hi4[..., 0, :])
        v_in = (lo4[..., 1, :], hi4[..., 1, :])
        w = (tw[:, 0, :, None], tw[:, 1, :, None])  # (L, m, 1)
        v = mont_mul_pair(v_in, w, q, qinv, chain.small)
        c0 = add_mod_pair(u, v, q)
        c1 = sub_mod_pair(u, v, q)
        lo = jnp.stack([c0[0], c1[0]], axis=-2).reshape(*lead, L, 2 * m, half)
        hi = jnp.stack([c0[1], c1[1]], axis=-2).reshape(*lead, L, 2 * m, half)
        m, t = 2 * m, half

    out = jnp.stack(
        [lo.reshape(*lead, L, n), hi.reshape(*lead, L, n)], axis=-2
    )
    return out


def inverse_ntt(data: jnp.ndarray, tables: NttTables, chain: ModulusChain):
    """NTT domain (tree order) -> coefficient domain (natural order)."""
    n = tables.degree
    lead = data.shape[:-3]
    L = data.shape[-3]
    lo = data[..., 0, :].reshape(*lead, L, n, 1)
    hi = data[..., 1, :].reshape(*lead, L, n, 1)
    q, qinv = _qpair(chain, 2)

    m, t = n, 1
    for s in reversed(range(len(tables.inv))):
        tw = tables.inv[s]
        m //= 2
        lo4 = lo.reshape(*lead, L, m, 2, t)
        hi4 = hi.reshape(*lead, L, m, 2, t)
        c0 = (lo4[..., 0, :], hi4[..., 0, :])
        c1 = (lo4[..., 1, :], hi4[..., 1, :])
        u = add_mod_pair(c0, c1, q)
        d = sub_mod_pair(c0, c1, q)
        w = (tw[:, 0, :, None], tw[:, 1, :, None])  # (L, m, 1)
        v = mont_mul_pair(d, w, q, qinv, chain.small)
        lo = jnp.concatenate([u[0], v[0]], axis=-1)
        hi = jnp.concatenate([u[1], v[1]], axis=-1)
        t *= 2

    lo = lo.reshape(*lead, L, n)
    hi = hi.reshape(*lead, L, n)
    q, qinv = _qpair(chain, 1)
    ninv = (tables.n_inv[:, 0, :], tables.n_inv[:, 1, :])  # (L, 1)
    res = mont_mul_pair((lo, hi), ninv, q, qinv, chain.small)
    return jnp.stack(res, axis=-2)
