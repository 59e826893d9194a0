"""Coefficient-sharded fused multiply + relinearize + rescale.

Scales the ring degree N across chips: every polynomial plane keeps its
coefficient (NTT-slot) axis sharded over the mesh's ``coeff`` axis for
the WHOLE composite — the tensor products, gadget decomposition, digit
inner products, and the combined P*q_last mod-down are all pointwise per
coefficient (they shard trivially under GSPMD), while the channel-NTTs
run as the distributed butterfly network of ``coeff_ntt.py`` (ppermute
or async-remote-DMA cross-stages + a fused local Pallas tail per shard).

This is the composite the reference runs as
``mul_ciphertexts_gadget`` + ``rescale`` (src/crypto/engine.rs:473-539,
:255-282) — here over a ring too large for one chip. Keys shard on the
same axis: NTT-domain key planes are pointwise operands, so each chip
holds only its N/P slice of the key material.

Bit-exactness: identical modular arithmetic to
``parallel/sharded.py:_mul_relin_rescale_arrays`` (the generic branch),
so residues match the single-chip composite uint32-for-uint32 — the
SURVEY.md §7 stage-10 gate, extended from the standalone NTT to the full
engine composite.

Small-prime chains (q < 2^31), lo-plane data (..., L, N).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..context import CkksContext
from ..engine import _combined_down_consts, _switch_plan
from ..ops.small_fast import add_lo, mont_mul_lo, sub_lo
from .coeff_ntt import build_coeff_sharded_ntt

__all__ = ["build_mul_relin_rescale_coeff"]


def _lo_col(col) -> jnp.ndarray:
    """(..., 2, 1) limb column constant -> (..., 1) lo view (jnp)."""
    return jnp.asarray(col)[..., 0, :]


def build_mul_relin_rescale_coeff(
    mesh: Mesh,
    ctx: CkksContext,
    ext_ctx: CkksContext,
    digit_size: int = 1,
    axis: str = "coeff",
    use_pallas: bool | None = None,
    interpret: bool = False,
    remote_dma: bool = False,
):
    """Build fn(c0a, c1a, c0b, c1b, key_a_lo, key_b_lo) -> (out0, out1).

    Data: uint32 lo planes — ciphertext components (..., L, N) NTT
    domain, keys (D, E, N); outputs (..., L-1, N). All N axes sharded on
    ``mesh[axis]``. ``use_pallas``/``interpret``/``remote_dma`` forward
    to the sharded-NTT builder (tests run ppermute + jnp stages on the
    CPU mesh; on TPU the local tail is the fused Pallas kernel).
    """
    small = all(int(m) < (1 << 31) for m in ext_ctx.moduli)
    if not small:
        raise NotImplementedError(
            "coefficient-sharded composite is small-chain only (q < 2^31)"
        )
    moduli = tuple(int(m) for m in ctx.moduli)
    ext_moduli = tuple(int(m) for m in ext_ctx.moduli)
    L = len(moduli)
    E = len(ext_moduli)
    Lc = L - 1
    n = ctx.degree

    plan = _switch_plan(moduli, ext_moduli, digit_size)
    p_mont, down_plan = _combined_down_consts(moduli, ext_moduli)
    D, g = plan.num_digits, plan.digit_size

    ntt_kw = dict(
        use_pallas=use_pallas, interpret=interpret, remote_dma=remote_dma
    )
    intt_base = build_coeff_sharded_ntt(
        mesh, moduli, n, inverse=True, axis=axis, **ntt_kw
    )
    ntt_ext = build_coeff_sharded_ntt(
        mesh, ext_moduli, n, inverse=False, axis=axis, **ntt_kw
    )
    dropped = ext_moduli[Lc:]  # (q_last, specials...)
    intt_dropped = build_coeff_sharded_ntt(
        mesh, dropped, n, inverse=True, axis=axis, **ntt_kw
    )
    ntt_child = build_coeff_sharded_ntt(
        mesh, moduli[:Lc], n, inverse=False, axis=axis, **ntt_kw
    )

    # lo views of the plan constants (replicated jit constants)
    with jax.ensure_compile_time_eval():
        q_ext = _lo_col(ext_ctx.chain.q)
        qinv_ext = _lo_col(ext_ctx.chain.qinv)
        q_base, qinv_base = q_ext[:L], qinv_ext[:L]
        q_child, qinv_child = q_ext[:Lc], qinv_ext[:Lc]
        dec_inv = _lo_col(plan.dec_inv)  # (L, 1)
        ext_c = _lo_col(plan.ext_c)  # (D, g, E, 1)
        sp_inv_dn = _lo_col(down_plan.sp_inv)  # (E - Lc, 1)
        phat_c_dn = _lo_col(down_plan.phat_c)  # (E - Lc, Lc, 1)
        p_inv_dn = _lo_col(down_plan.p_inv)  # (Lc, 1)
        p_mont_lo = _lo_col(p_mont)  # (L, 1)
        q_drop = q_ext[Lc:]
        qinv_drop = qinv_ext[Lc:]

    def accumulate(t2, key_a, key_b):
        """Hybrid gadget key switch accumulators over QP (NTT domain)."""
        d_coeff = intt_base(t2)  # Montgomery coefficient domain
        y = mont_mul_lo(d_coeff, dec_inv, q_base, qinv_base)  # plain
        pad = D * g - L
        if pad:
            zshape = y.shape[:-2] + (pad,) + y.shape[-1:]
            y = jnp.concatenate(
                [y, jnp.zeros(zshape, dtype=y.dtype)], axis=-2
            )
        yg = y.reshape(y.shape[:-2] + (D, g) + y.shape[-1:])
        acc = None
        for k in range(g):
            # (..., D, 1, N) x (D, E, 1) -> (..., D, E, N)
            term = mont_mul_lo(
                yg[..., :, k : k + 1, :], ext_c[:, k], q_ext, qinv_ext
            )
            acc = term if acc is None else add_lo(acc, term, q_ext)
        alpha = ntt_ext(acc)  # (..., D, E, N)
        ks0 = ks1 = None
        for d_i in range(D):
            t0 = mont_mul_lo(alpha[..., d_i, :, :], key_b[d_i], q_ext,
                             qinv_ext)
            t1 = mont_mul_lo(alpha[..., d_i, :, :], key_a[d_i], q_ext,
                             qinv_ext)
            ks0 = t0 if ks0 is None else add_lo(ks0, t0, q_ext)
            ks1 = t1 if ks1 is None else add_lo(ks1, t1, q_ext)
        return ks0, ks1

    def combine(t, ks):
        """(t * P + ks) / (P * q_last) -> child basis (fused mod-down)."""
        t_p = mont_mul_lo(t, p_mont_lo, q_base, qinv_base)
        head = add_lo(t_p, ks[..., :L, :], q_base)
        x = jnp.concatenate([head, ks[..., L:, :]], axis=-2)  # (..., E, N)
        x_sp = x[..., Lc:, :]  # dropped channels (q_last, specials)
        yhat = mont_mul_lo(
            intt_dropped(x_sp), sp_inv_dn, q_drop, qinv_drop
        )  # plain
        acc = None
        G = E - Lc
        for m in range(G):
            term = mont_mul_lo(
                yhat[..., m : m + 1, :], phat_c_dn[m], q_child, qinv_child
            )
            acc = term if acc is None else add_lo(acc, term, q_child)
        ext_ntt = ntt_child(acc)
        diff = sub_lo(x[..., :Lc, :], ext_ntt, q_child)
        return mont_mul_lo(diff, p_inv_dn, q_child, qinv_child)

    data_s = NamedSharding(mesh, P(None, None, axis))
    key_s = NamedSharding(mesh, P(None, None, axis))
    out_s = NamedSharding(mesh, P(None, None, axis))

    @functools.partial(
        jax.jit,
        in_shardings=(data_s,) * 4 + (key_s, key_s),
        out_shardings=(out_s, out_s),
    )
    def fn(c0a, c1a, c0b, c1b, key_a, key_b):
        t0 = mont_mul_lo(c0a, c0b, q_base, qinv_base)
        t1 = add_lo(
            mont_mul_lo(c0a, c1b, q_base, qinv_base),
            mont_mul_lo(c1a, c0b, q_base, qinv_base),
            q_base,
        )
        t2 = mont_mul_lo(c1a, c1b, q_base, qinv_base)
        ks0, ks1 = accumulate(t2, key_a, key_b)
        return combine(t0, ks0), combine(t1, ks1)

    return fn
