"""Fused RNS mod-down (+ combine) as one Pallas TPU kernel (small chains).

Computes, per kept channel j, entirely in VMEM:

    ext_j  = sum_m  yhat_m * (Phat_m * R mod q_j)      [Harvey, plain->Mont]
    ExtN   = forward NTT(ext_j)                        [all stages in VMEM]
    head_j = t_j * (P mod q_j) + ks_j                  [optional t term]
    out_j  = (head_j - ExtN) * (P^{-1} mod q_j)        [Harvey by constant]

replacing the jnp path's ~8 materialised elementwise passes per component
(extension accumulate, t*P, add, sub, P^{-1}) plus separate kernel
dispatches. Every multiply is a Harvey multiply by a per-channel constant
— no Montgomery REDC needed. Bit-exact with ops/small_fast.mod_down_lo.

``yhat`` (plain values of the dropped channels, already multiplied by
(Phat_m)^{-1} mod p_m) is produced by the inverse-NTT kernel with custom
final constants (see ``inv_ntt_to_yhat``), folding that multiply in too.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ntt_pallas import (
    _auto_pair,
    _harvey_mul,
    _layout,
    _ntt_factored_call,
    _planes_cached,
    _planes_factored_cached,
    _ntt_planes_call,
    _sub_mod,
    _add_mod,
    _fwd_stages_tw,
    _fwd_stages_tw_multi,
    _tw_from_factors,
    _tw_from_planes,
    _use_factored,
    lazy_ok,
)


@functools.lru_cache(maxsize=128)
def _down_consts(child_moduli: tuple, dropped_moduli: tuple, degree: int,
                 t_scale: int = 0):
    """Host tables: per (dropped m, kept j) extension weights and the
    per-channel constants; plus the inverse-NTT final constants that emit
    yhat directly. ``t_scale`` is the integer multiplier applied to the
    optional t term (for the fused relin+rescale it is the special-prime
    product P, NOT the full dropped product P*q_last that is divided out);
    0 means no t term."""
    n = degree
    p_total = 1
    for p in dropped_moduli:
        p_total *= p
    G = len(dropped_moduli)
    L = len(child_moduli)

    def shoup(w, q):
        return (w << 32) // q

    c = np.zeros((G, L), dtype=np.uint32)
    cs = np.zeros((G, L), dtype=np.uint32)
    for m, pm in enumerate(dropped_moduli):
        phat = p_total // pm
        for j, qj in enumerate(child_moduli):
            w = (phat << 32) % qj  # Phat * R mod q_j : plain yhat -> Mont
            c[m, j] = w
            cs[m, j] = shoup(w, qj)

    pmod = np.zeros((L, 1), dtype=np.uint32)
    pmod_s = np.zeros((L, 1), dtype=np.uint32)
    pinv = np.zeros((L, 1), dtype=np.uint32)
    pinv_s = np.zeros((L, 1), dtype=np.uint32)
    for j, qj in enumerate(child_moduli):
        w3 = t_scale % qj  # Mont(t) -> Mont(t * t_scale)
        pmod[j, 0] = w3
        pmod_s[j, 0] = shoup(w3, qj)
        w2 = pow(p_total % qj, -1, qj)  # Mont(v) -> Mont(v * P^{-1})
        pinv[j, 0] = w2
        pinv_s[j, 0] = shoup(w2, qj)

    # inverse-NTT final constants emitting plain yhat = c * (Phat_m)^{-1}:
    # the pre-final accumulator is Mont(c * N), so multiply by
    # N^{-1} * (Phat_m)^{-1} * R^{-1} mod p_m (one Harvey).
    yfin = np.zeros((G, 1), dtype=np.uint32)
    yfin_s = np.zeros((G, 1), dtype=np.uint32)
    for m, pm in enumerate(dropped_moduli):
        phat = p_total // pm
        w = (
            pow(n, -1, pm)
            * pow(phat % pm, -1, pm)
            * pow(1 << 32, -1, pm)
        ) % pm
        yfin[m, 0] = w
        yfin_s[m, 0] = shoup(w, pm)

    q_child = np.array([[q] for q in child_moduli], dtype=np.uint32)
    return c, cs, pmod, pmod_s, pinv, pinv_s, yfin, yfin_s, q_child


def inv_ntt_to_yhat(x_dropped_lo, dropped_moduli: tuple,
                    child_moduli: tuple, degree: int,
                    interpret: bool = False):
    """Inverse NTT of the dropped channels emitting PLAIN yhat directly
    (the (Phat_m)^{-1} multiply is folded into the kernel's final scaling).
    x: (..., G, N) Montgomery NTT-domain lo planes."""
    consts = _down_consts(
        tuple(child_moduli), tuple(dropped_moduli), degree
    )
    yfin, yfin_s = consts[6], consts[7]
    if _use_factored(degree):
        tabs = _planes_factored_cached(tuple(dropped_moduli), degree)
        irw, irwp, ilw, ilwp, q = tabs[4], tabs[5], tabs[6], tabs[7], tabs[8]
        return _ntt_factored_call(
            x_dropped_lo, irw, irwp, ilw, ilwp, q, yfin, yfin_s,
            degree=degree, inverse=True, interpret=interpret,
            lazy=lazy_ok(dropped_moduli),
        )
    _, _, inv_w, inv_wp, q, _, _ = _planes_cached(
        tuple(dropped_moduli), degree
    )
    return _ntt_planes_call(
        x_dropped_lo, inv_w, inv_wp, q, yfin, yfin_s,
        degree=degree, inverse=True, interpret=interpret,
        lazy=lazy_ok(dropped_moduli),
    )


def _md_core(q_ref, c_ref, cs_ref, pm_ref, pms_ref, pi_ref, pis_ref,
             yhat_ref, head_ref, t_ref, tw_refs, o_ref,
             n: int, r: int, c: int, n_dropped: int, lazy: bool,
             factored: bool, pair: int):
    if factored:
        get_tw = _tw_from_factors(*tw_refs, n, r, c)
    else:
        get_tw = _tw_from_planes(*tw_refs, r, c)
    j = pl.program_id(0)
    q = q_ref[j, 0]
    exts = []
    for p in range(pair):
        ext = None
        for m in range(n_dropped):
            term = _harvey_mul(yhat_ref[p, m], c_ref[m, j], cs_ref[m, j], q)
            ext = term if ext is None else _add_mod(ext, term, q)
        exts.append(ext)
    # pair independent NTT chains per grid step (latency-bound stages)
    exts = _fwd_stages_tw_multi(exts, get_tw, q, n, r, c, lazy)
    for p in range(pair):
        head = head_ref[p, 0]
        if t_ref is not None:
            tp = _harvey_mul(t_ref[p, 0], pm_ref[j, 0], pms_ref[j, 0], q)
            head = _add_mod(head, tp, q)
        diff = _sub_mod(head, exts[p], q)
        o_ref[p, 0] = _harvey_mul(diff, pi_ref[j, 0], pis_ref[j, 0], q)


def _md_kernel_no_t(q_ref, c_ref, cs_ref, pm_ref, pms_ref, pi_ref, pis_ref,
                    yhat_ref, head_ref, *rest,
                    n, r, c, n_dropped, lazy, factored, pair):
    *tw_refs, o_ref = rest
    _md_core(q_ref, c_ref, cs_ref, pm_ref, pms_ref, pi_ref, pis_ref,
             yhat_ref, head_ref, None, tw_refs, o_ref,
             n, r, c, n_dropped, lazy, factored, pair)


def _md_kernel_t(q_ref, c_ref, cs_ref, pm_ref, pms_ref, pi_ref, pis_ref,
                 yhat_ref, head_ref, t_ref, *rest,
                 n, r, c, n_dropped, lazy, factored, pair):
    *tw_refs, o_ref = rest
    _md_core(q_ref, c_ref, cs_ref, pm_ref, pms_ref, pi_ref, pis_ref,
             yhat_ref, head_ref, t_ref, tw_refs, o_ref,
             n, r, c, n_dropped, lazy, factored, pair)


@functools.partial(
    jax.jit,
    static_argnames=(
        "child_moduli", "dropped_moduli", "degree", "interpret", "t_scale"
    ),
)
def mod_down_combine_pallas(yhat, ks, t=None, *, child_moduli: tuple,
                            dropped_moduli: tuple, degree: int,
                            interpret: bool = False, t_scale: int = 0):
    """out_j = ((t_j * t_scale if t) + ks_j - NTT(ext_j)) * P^{-1}.

    yhat: (..., G, N) plain; ks/t: (..., L', N) Montgomery NTT lo planes.
    P = prod(dropped_moduli). Returns (..., L', N).
    """
    n = degree
    r, cdim = _layout(n)
    G = len(dropped_moduli)
    Lc = len(child_moduli)
    lead = ks.shape[:-2]
    y = yhat.reshape(-1, G, r, cdim)
    k = ks.reshape(-1, Lc, r, cdim)
    outer = y.shape[0]
    s_count = n.bit_length() - 1

    (c, cs, pmod, pmod_s, pinv, pinv_s, _, _, q_child) = _down_consts(
        tuple(child_moduli), tuple(dropped_moduli), degree, t_scale
    )
    factored = _use_factored(degree)

    has_t = t is not None
    # pair-scaled planes per item: yhat (G) + head + t? + ext temp + out;
    # fixed: the expanded forward-twiddle planes (2*S, absent factored)
    pair = _auto_pair(
        outer, n, G + 3 + (1 if has_t else 0),
        fixed_planes=0 if factored else 2 * s_count,
    )
    kernel = functools.partial(
        _md_kernel_t if has_t else _md_kernel_no_t,
        n=n, r=r, c=cdim, n_dropped=G, lazy=lazy_ok(child_moduli),
        factored=factored, pair=pair,
    )

    smem = lambda shape: pl.BlockSpec(
        shape, lambda j, o: (0, 0), memory_space=pltpu.SMEM
    )
    data = lambda nch: pl.BlockSpec(
        (pair, nch, r, cdim), lambda j, o: (o, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    per_ch = lambda: pl.BlockSpec(
        (pair, 1, r, cdim), lambda j, o: (o, j, 0, 0),
        memory_space=pltpu.VMEM,
    )
    plane = lambda: pl.BlockSpec(
        (1, s_count, r, cdim), lambda j, o: (j, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    fac = lambda dim: pl.BlockSpec(
        (1, s_count, dim), lambda j, o: (j, 0, 0), memory_space=pltpu.VMEM
    )
    in_specs = [
        smem(q_child.shape), smem(c.shape), smem(cs.shape),
        smem(pmod.shape), smem(pmod_s.shape),
        smem(pinv.shape), smem(pinv_s.shape),
        data(G), per_ch(),
    ]
    args = [q_child, c, cs, pmod, pmod_s, pinv, pinv_s, y, k]
    if has_t:
        in_specs.append(per_ch())
        args.append(t.reshape(-1, Lc, r, cdim))
    if factored:
        frw, frwp, flw, flwp = _planes_factored_cached(
            tuple(child_moduli), degree
        )[:4]
        in_specs += [fac(r), fac(r), fac(cdim), fac(cdim)]
        args += [frw, frwp, flw, flwp]
    else:
        fwd_w, fwd_wp = _planes_cached(tuple(child_moduli), degree)[:2]
        in_specs += [plane(), plane()]
        args += [fwd_w.reshape(Lc, s_count, r, cdim),
                 fwd_wp.reshape(Lc, s_count, r, cdim)]

    out = pl.pallas_call(
        kernel,
        grid=(Lc, outer // pair),
        in_specs=in_specs,
        out_specs=per_ch(),
        out_shape=jax.ShapeDtypeStruct((outer, Lc, r, cdim), jnp.uint32),
        interpret=interpret,
    )(*args)
    return out.reshape(*lead, Lc, n)
