"""Bridging single-ciphertext engine objects and batched array kernels.

The engine API (reference parity) operates on one Ciphertext at a time;
the TPU-native hot path (parallel/sharded.py, bench.py) runs on stacked
uint32 arrays with a leading batch axis. These helpers convert between
the two, validating that every ciphertext in a batch shares the basis,
domain and scale bookkeeping.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.poly import Poly
from ..types import Ciphertext


def stack_ciphertexts(cts) -> tuple[jnp.ndarray, jnp.ndarray]:
    """[Ciphertext] -> (c0, c1) uint32 (B, L, 2, N) NTT-domain stacks.

    All ciphertexts must share moduli, logp/logq and true scale (a batch
    is one SIMD program; mixed bookkeeping would decode wrong)."""
    from ..errors import CkksError

    cts = list(cts)
    if not cts:
        raise CkksError("stack_ciphertexts: empty batch")
    head = cts[0]
    for ct in cts[1:]:
        if ct.ctx.moduli != head.ctx.moduli:
            raise CkksError("stack_ciphertexts: mixed bases in batch")
        if ct.logp != head.logp or ct.logq != head.logq:
            raise CkksError("stack_ciphertexts: mixed logp/logq in batch")
        if abs(ct.true_scale - head.true_scale) > 1e-9 * head.true_scale:
            raise CkksError("stack_ciphertexts: mixed scales in batch")
    c0 = jnp.stack([ct.c0.to_ntt_domain().data for ct in cts])
    c1 = jnp.stack([ct.c1.to_ntt_domain().data for ct in cts])
    return c0, c1


def unstack_ciphertexts(c0, c1, ctx, logp: int, logq: int,
                        scale: float | None = None) -> list[Ciphertext]:
    """(B, L, 2, N) NTT-domain stacks -> [Ciphertext] with the given
    bookkeeping (e.g. after a batched multiply: logp summed, logq and
    scale adjusted by the rescale)."""
    return [
        Ciphertext(
            c0=Poly(c0[i], ctx, True),
            c1=Poly(c1[i], ctx, True),
            logp=logp,
            logq=logq,
            scale=scale,
        )
        for i in range(c0.shape[0])
    ]
