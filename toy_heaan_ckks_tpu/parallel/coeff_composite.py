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

Small-prime chains (q < 2^31) use lo-plane data (..., L, N); wide
chains (q < 2^62) use full limb arrays (..., L, 2, N) with the generic
Montgomery ops (``_build_wide``). ``build_rotate_coeff`` adds the
coefficient-sharded rotation (sharded automorphism + gadget key
switch).
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

__all__ = ["build_mul_relin_rescale_coeff", "build_rotate_coeff"]


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
        return _build_wide(
            mesh, ctx, ext_ctx, digit_size, axis,
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


def build_rotate_coeff(
    mesh: Mesh,
    ctx: CkksContext,
    ext_ctx: CkksContext,
    perm,
    digit_size: int = 1,
    axis: str = "coeff",
):
    """Coefficient-sharded rotation: automorphism + gadget key switch.

    The NTT-domain automorphism is a GLOBAL permutation of the sharded
    N axis — each shard's outputs gather from other shards. It is
    expressed as a plain ``jnp.take`` with a replicated index table
    inside the GSPMD-jitted program: XLA lowers the displaced reads to
    the appropriate collectives over the mesh axis (visible in the
    compiled HLO; tools/scaling_model.py counts the bytes). The gadget
    key switch that follows is the same sharded decompose / key-product
    / P-mod-down pipeline as the fused multiply, minus the rescale
    (rotation is level-free, reference engine.rs:401-463).

    Small chains: fn(c0, c1, key_a, key_b) on lo planes (..., L, N),
    keys (D, E, N); wide chains: full limb arrays (..., L, 2, N) /
    (D, E, 2, N). Outputs match ``CkksEngine.rotate_ciphertext``'s
    residues bit-for-bit (tested on the 8-device CPU mesh).
    """
    small = all(int(m) < (1 << 31) for m in ext_ctx.moduli)
    moduli = tuple(int(m) for m in ctx.moduli)
    ext_moduli = tuple(int(m) for m in ext_ctx.moduli)
    L = len(moduli)
    E = len(ext_moduli)
    n = ctx.degree
    plan = _switch_plan(moduli, ext_moduli, digit_size)
    D, g = plan.num_digits, plan.digit_size
    perm = jnp.asarray(perm, dtype=jnp.int32)

    if small:
        ntt_kw = {}
        intt_base = build_coeff_sharded_ntt(
            mesh, moduli, n, inverse=True, axis=axis, **ntt_kw
        )
        ntt_ext = build_coeff_sharded_ntt(
            mesh, ext_moduli, n, inverse=False, axis=axis, **ntt_kw
        )
        specials = ext_moduli[L:]
        intt_sp = build_coeff_sharded_ntt(
            mesh, specials, n, inverse=True, axis=axis, **ntt_kw
        )
        ntt_base = build_coeff_sharded_ntt(
            mesh, moduli, n, inverse=False, axis=axis, **ntt_kw
        )
        with jax.ensure_compile_time_eval():
            q_ext = _lo_col(ext_ctx.chain.q)
            qinv_ext = _lo_col(ext_ctx.chain.qinv)
            q_base, qinv_base = q_ext[:L], qinv_ext[:L]
            dec_inv = _lo_col(plan.dec_inv)
            ext_c = _lo_col(plan.ext_c)
            sp_inv = _lo_col(plan.sp_inv)
            phat_c = _lo_col(plan.phat_c)
            p_inv = _lo_col(plan.p_inv)
            q_sp = q_ext[L:]
            qinv_sp = qinv_ext[L:]

        def key_switch(d_ntt, key_a, key_b):
            d_coeff = intt_base(d_ntt)
            y = mont_mul_lo(d_coeff, dec_inv, q_base, qinv_base)
            pad = D * g - L
            if pad:
                zshape = y.shape[:-2] + (pad,) + y.shape[-1:]
                y = jnp.concatenate(
                    [y, jnp.zeros(zshape, dtype=y.dtype)], axis=-2
                )
            yg = y.reshape(y.shape[:-2] + (D, g) + y.shape[-1:])
            acc = None
            for k in range(g):
                term = mont_mul_lo(
                    yg[..., :, k : k + 1, :], ext_c[:, k], q_ext, qinv_ext
                )
                acc = term if acc is None else add_lo(acc, term, q_ext)
            alpha = ntt_ext(acc)
            ks0 = ks1 = None
            for d_i in range(D):
                t0 = mont_mul_lo(alpha[..., d_i, :, :], key_b[d_i],
                                 q_ext, qinv_ext)
                t1 = mont_mul_lo(alpha[..., d_i, :, :], key_a[d_i],
                                 q_ext, qinv_ext)
                ks0 = t0 if ks0 is None else add_lo(ks0, t0, q_ext)
                ks1 = t1 if ks1 is None else add_lo(ks1, t1, q_ext)
            return mod_down(ks0), mod_down(ks1)

        def mod_down(x):
            """Divide by P (specials) only: QP -> Q, level-free."""
            x_sp = x[..., L:, :]
            yhat = mont_mul_lo(intt_sp(x_sp), sp_inv, q_sp, qinv_sp)
            acc = None
            for m in range(E - L):
                term = mont_mul_lo(
                    yhat[..., m : m + 1, :], phat_c[m], q_base, qinv_base
                )
                acc = term if acc is None else add_lo(acc, term, q_base)
            ext_ntt = ntt_base(acc)
            diff = sub_lo(x[..., :L, :], ext_ntt, q_base)
            return mont_mul_lo(diff, p_inv, q_base, qinv_base)

        data_s = NamedSharding(mesh, P(None, None, axis))

        @functools.partial(
            jax.jit,
            in_shardings=(data_s,) * 4,
            out_shardings=(data_s, data_s),
        )
        def fn(c0, c1, key_a, key_b):
            c0_rot = jnp.take(c0, perm, axis=-1)
            c1_rot = jnp.take(c1, perm, axis=-1)
            ks0, ks1 = key_switch(c1_rot, key_a, key_b)
            return add_lo(c0_rot, ks0, q_base), ks1

        return fn

    # wide chains: full limb arrays with the generic modular ops
    from ..ops import modular as mm
    from .coeff_ntt import build_coeff_sharded_ntt_wide

    intt_base = build_coeff_sharded_ntt_wide(
        mesh, moduli, n, inverse=True, axis=axis
    )
    ntt_ext = build_coeff_sharded_ntt_wide(
        mesh, ext_moduli, n, inverse=False, axis=axis
    )
    specials = ext_moduli[L:]
    intt_sp = build_coeff_sharded_ntt_wide(
        mesh, specials, n, inverse=True, axis=axis
    )
    ntt_base = build_coeff_sharded_ntt_wide(
        mesh, moduli, n, inverse=False, axis=axis
    )
    base_ch = ctx.chain
    ext_ch = ext_ctx.chain
    sp_ch = ext_ctx.slice_channels(L, E).chain

    def key_switch_w(d_ntt, key_a, key_b):
        d_coeff = intt_base(d_ntt)
        y = mm.mont_mul(d_coeff, plan.dec_inv, base_ch)
        pad = D * g - L
        if pad:
            zshape = y.shape[:-3] + (pad,) + y.shape[-2:]
            y = jnp.concatenate(
                [y, jnp.zeros(zshape, dtype=y.dtype)], axis=-3
            )
        yg = y.reshape(y.shape[:-3] + (D, g) + y.shape[-2:])
        acc = None
        for k in range(g):
            term = mm.mont_mul(
                yg[..., :, k : k + 1, :, :], plan.ext_c[:, k], ext_ch
            )
            acc = term if acc is None else mm.add_mod(acc, term, ext_ch)
        alpha = ntt_ext(acc)
        ks0 = ks1 = None
        for d_i in range(D):
            t0 = mm.mont_mul(alpha[..., d_i, :, :, :], key_b[d_i], ext_ch)
            t1 = mm.mont_mul(alpha[..., d_i, :, :, :], key_a[d_i], ext_ch)
            ks0 = t0 if ks0 is None else mm.add_mod(ks0, t0, ext_ch)
            ks1 = t1 if ks1 is None else mm.add_mod(ks1, t1, ext_ch)
        return mod_down_w(ks0), mod_down_w(ks1)

    def mod_down_w(x):
        x_sp = x[..., L:, :, :]
        yhat = mm.mont_mul(intt_sp(x_sp), plan.sp_inv, sp_ch)
        acc = None
        for m in range(E - L):
            term = mm.mont_mul(
                yhat[..., m : m + 1, :, :], plan.phat_c[m], base_ch
            )
            acc = term if acc is None else mm.add_mod(acc, term, base_ch)
        ext_ntt = ntt_base(acc)
        diff = mm.sub_mod(x[..., :L, :, :], ext_ntt, base_ch)
        return mm.mont_mul(diff, plan.p_inv, base_ch)

    data_s = NamedSharding(mesh, P(None, None, None, axis))

    @functools.partial(
        jax.jit,
        in_shardings=(data_s,) * 4,
        out_shardings=(data_s, data_s),
    )
    def fn(c0, c1, key_a, key_b):
        c0_rot = jnp.take(c0, perm, axis=-1)
        c1_rot = jnp.take(c1, perm, axis=-1)
        ks0, ks1 = key_switch_w(c1_rot, key_a, key_b)
        return mm.add_mod(c0_rot, ks0, base_ch), ks1

    return fn


def _build_wide(mesh: Mesh, ctx: CkksContext, ext_ctx: CkksContext,
                digit_size: int, axis: str):
    """Wide-chain (q < 2^62) coefficient-sharded composite.

    Same composite structure as the lo-plane build above, but on full
    2-limb arrays (..., L, 2, N) with the generic modular ops
    (ops/modular.py, Montgomery R=2^64) — pointwise stages shard
    trivially under GSPMD; channel-NTTs run as the wide distributed
    butterfly (``build_coeff_sharded_ntt_wide``: ppermute cross-stages +
    jnp limb-pair Harvey local stages). Lifts the round-4 small-chain
    restriction so the reference's heavy-prime configs
    (tests/integration_mul.rs:47-51 62-bit, examples/horner_chain.rs:65
    7x61-bit) ride the ring-degree scaling axis. Bit-exact with the
    single-chip wide composite (tested on the 8-device CPU mesh).

    fn(c0a, c1a, c0b, c1b, key_a, key_b): data (..., L, 2, N), keys
    (D, E, 2, N); outputs (..., L-1, 2, N); all N axes sharded.
    """
    from ..ops import modular as mm
    from .coeff_ntt import build_coeff_sharded_ntt_wide

    moduli = tuple(int(m) for m in ctx.moduli)
    ext_moduli = tuple(int(m) for m in ext_ctx.moduli)
    L = len(moduli)
    E = len(ext_moduli)
    Lc = L - 1
    n = ctx.degree

    plan = _switch_plan(moduli, ext_moduli, digit_size)
    p_mont, down_plan = _combined_down_consts(moduli, ext_moduli)
    D, g = plan.num_digits, plan.digit_size

    intt_base = build_coeff_sharded_ntt_wide(
        mesh, moduli, n, inverse=True, axis=axis
    )
    ntt_ext = build_coeff_sharded_ntt_wide(
        mesh, ext_moduli, n, inverse=False, axis=axis
    )
    dropped = ext_moduli[Lc:]  # (q_last, specials...)
    intt_dropped = build_coeff_sharded_ntt_wide(
        mesh, dropped, n, inverse=True, axis=axis
    )
    ntt_child = build_coeff_sharded_ntt_wide(
        mesh, moduli[:Lc], n, inverse=False, axis=axis
    )

    base_ch = ctx.chain
    ext_ch = ext_ctx.chain
    child_ch = ctx.drop_last(1).chain
    drop_ch = ext_ctx.slice_channels(Lc, E).chain

    def accumulate(t2, key_a, key_b):
        d_coeff = intt_base(t2)
        y = mm.mont_mul(d_coeff, plan.dec_inv, base_ch)  # plain
        pad = D * g - L
        if pad:
            zshape = y.shape[:-3] + (pad,) + y.shape[-2:]
            y = jnp.concatenate(
                [y, jnp.zeros(zshape, dtype=y.dtype)], axis=-3
            )
        yg = y.reshape(y.shape[:-3] + (D, g) + y.shape[-2:])
        acc = None
        for k in range(g):
            term = mm.mont_mul(
                yg[..., :, k : k + 1, :, :], plan.ext_c[:, k], ext_ch
            )
            acc = term if acc is None else mm.add_mod(acc, term, ext_ch)
        alpha = ntt_ext(acc)  # (..., D, E, 2, N)
        ks0 = ks1 = None
        for d_i in range(D):
            t0 = mm.mont_mul(alpha[..., d_i, :, :, :], key_b[d_i], ext_ch)
            t1 = mm.mont_mul(alpha[..., d_i, :, :, :], key_a[d_i], ext_ch)
            ks0 = t0 if ks0 is None else mm.add_mod(ks0, t0, ext_ch)
            ks1 = t1 if ks1 is None else mm.add_mod(ks1, t1, ext_ch)
        return ks0, ks1

    def combine(t, ks):
        t_p = mm.mont_mul(t, p_mont, base_ch)
        head = mm.add_mod(t_p, ks[..., :L, :, :], base_ch)
        x = jnp.concatenate([head, ks[..., L:, :, :]], axis=-3)
        x_sp = x[..., Lc:, :, :]
        yhat = mm.mont_mul(intt_dropped(x_sp), down_plan.sp_inv, drop_ch)
        acc = None
        for m_i in range(E - Lc):
            term = mm.mont_mul(
                yhat[..., m_i : m_i + 1, :, :], down_plan.phat_c[m_i],
                child_ch,
            )
            acc = term if acc is None else mm.add_mod(acc, term, child_ch)
        ext_ntt = ntt_child(acc)
        diff = mm.sub_mod(x[..., :Lc, :, :], ext_ntt, child_ch)
        return mm.mont_mul(diff, down_plan.p_inv, child_ch)

    data_s = NamedSharding(mesh, P(None, None, None, axis))
    key_s = NamedSharding(mesh, P(None, None, None, axis))

    @functools.partial(
        jax.jit,
        in_shardings=(data_s,) * 4 + (key_s, key_s),
        out_shardings=(data_s, data_s),
    )
    def fn(c0a, c1a, c0b, c1b, key_a, key_b):
        t0 = mm.mont_mul(c0a, c0b, base_ch)
        t1 = mm.add_mod(
            mm.mont_mul(c0a, c1b, base_ch),
            mm.mont_mul(c1a, c0b, base_ch),
            base_ch,
        )
        t2 = mm.mont_mul(c1a, c1b, base_ch)
        ks0, ks1 = accumulate(t2, key_a, key_b)
        return combine(t0, ks0), combine(t1, ks1)

    return fn
