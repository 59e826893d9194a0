"""Fused hybrid gadget key-switch + mod-down Pallas kernels, WIDE chains.

Two-limb (uint32 lo/hi) variants of ops/keyswitch_pallas.py and
ops/moddown_pallas.py for prime chains with 2^31 <= q < 2^63 — the
reference's heavyweight configurations (40/61/62-bit chains:
tests/integration_mul.rs:47-51, examples/horner_chain.rs:65). Round 1 ran
these with only the NTT accelerated; everything else fell back to the
staged jnp path, leaving horner_chain at minutes per multiply.

Same fusion shape as the small-prime kernels:

  accumulate:  per (ext channel j, batch element) grid step, for each
               digit t: alpha_t = sum_k yhat_k * (Qhat_tk * 2^64 mod q_j)
               [Harvey64] -> forward NTT in VMEM -> REDC64 against the key
               -> accumulate; the alpha tensor never exists in HBM.
  mod-down:    ext_j = sum_m yhat_m * (Phat_m * 2^64 mod q_j) -> NTT ->
               head = ks_j (+ t_j * t_scale) -> (head - ext) * P^{-1}.

All multiplies by per-channel constants are Harvey64 (Shoup radix 2^64);
the key inner product is a full Montgomery REDC (R = 2^64). Bit-exact with
the generic jnp path (engine._gadget_accumulate / _mod_down_ntt):
identical modular sums, canonical [0, q) representatives throughout.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ntt_pallas import _butterfly_args, _layout, _shift
from .ntt_pallas_wide import (
    _add_mod64,
    _fwd_stage_lazy64,
    _harvey64,
    _inv_stage_lazy64,
    _planes_cached_wide,
    _planes_factored_cached_wide,
    _reduce_4q_q64,
    _sub_mod64,
    _tw_from_factors_wide,
    _tw_from_planes_wide,
    _tw_mul64,
    _use_factored_wide,
    lazy_ok_wide,
)
from .u64 import add64
from .u64 import add128, geq64, mul64_128, mullo64, select64, sub64


def _redc64(a, b, q, qinv):
    """Full Montgomery product a*b*2^{-64} mod q on u64 pairs (both
    operands variable; out in [0, q))."""
    t = mul64_128(a, b)
    m = mullo64((t[0], t[1]), qinv)
    mq = mul64_128(m, q)
    s = add128(t, mq)
    res = (s[2], s[3])
    return select64(geq64(res, q), sub64(res, q), res)


def _split2(v: int):
    return v & 0xFFFFFFFF, (v >> 32) & 0xFFFFFFFF


def _shoup64(w: int, q: int) -> int:
    return (w << 64) // q


def _fwd_stages_wide(x, get_tw, q, n: int, r: int, c: int,
                     lazy: bool = False):
    """All forward butterfly stages on a VMEM-resident 2-limb plane.

    ``get_tw(s)`` yields the stage twiddle as an (rw, rwp, lw, lwp) tuple
    of limb pairs (lw None -> single Harvey64) — expanded planes and
    factored row x lane forms drive identical butterfly arithmetic.
    Output canonical [0, q) (into the key REDC / combine subtract)."""
    two_q = add64(q, q)
    for s in range(n.bit_length() - 1):
        d = n >> (s + 1)
        axis, amount, mask = _butterfly_args(n, r, c, d)
        if lazy:
            x = _fwd_stage_lazy64(x, get_tw(s), q, two_q, axis, amount, mask)
            continue
        shift2 = lambda v, a: (_shift(v[0], a, axis), _shift(v[1], a, axis))
        v_at_u = shift2(x, amount)
        u_at_v = shift2(x, -amount)
        operand = select64(mask, v_at_u, x)
        wv = _tw_mul64(operand, get_tw(s), q)
        x = select64(mask, _add_mod64(x, wv, q), _sub_mod64(u_at_v, wv, q))
    if lazy:
        x = _reduce_4q_q64(x, q, two_q)
    return x


@functools.lru_cache(maxsize=64)
def _switch_consts_wide(base_moduli: tuple, ext_moduli: tuple,
                        digit_size: int):
    """Host tables (2-limb) for the in-kernel basis extension.

    c[k, j]  = (Qhat_{t(k),k} * 2^64) mod q_j  (plain yhat -> Montgomery
               alpha term in one Harvey64)
    cs[k, j] = floor(c * 2^64 / q_j)
    Returned as separate lo/hi uint32 (dg, E) arrays (SMEM rank limit),
    plus per-ext-channel q and -q^{-1} mod 2^64 pairs (E, 2).
    """
    from ..keys import digit_groups

    L = len(base_moduli)
    E = len(ext_moduli)
    digit_size = min(digit_size, L)
    groups = digit_groups(L, digit_size)
    num_digits = len(groups)
    dg = num_digits * digit_size

    c_lo = np.zeros((dg, E), dtype=np.uint32)
    c_hi = np.zeros((dg, E), dtype=np.uint32)
    cs_lo = np.zeros((dg, E), dtype=np.uint32)
    cs_hi = np.zeros((dg, E), dtype=np.uint32)
    for t, grp in enumerate(groups):
        for gi, k in enumerate(grp):
            qhat = 1
            for k2 in grp:
                if k2 != k:
                    qhat *= base_moduli[k2]
            for j, qj in enumerate(ext_moduli):
                w = (qhat << 64) % qj
                ws = _shoup64(w, qj)
                kk = t * digit_size + gi
                c_lo[kk, j], c_hi[kk, j] = _split2(w)
                cs_lo[kk, j], cs_hi[kk, j] = _split2(ws)
    q = np.array([_split2(m) for m in ext_moduli], dtype=np.uint32)
    qinv = np.array(
        [_split2((-pow(m, -1, 1 << 64)) % (1 << 64)) for m in ext_moduli],
        dtype=np.uint32,
    )
    return c_lo, c_hi, cs_lo, cs_hi, q, qinv, digit_size


def _ks_kernel_wide(q_ref, qinv_ref, clo_ref, chi_ref, cslo_ref, cshi_ref,
                    y_ref, *rest,
                    n: int, r: int, c: int, num_digits: int,
                    digit_size: int, num_base: int, factored: bool,
                    lazy: bool, j_offset: int = 0):
    if factored:
        (rw_ref, rwp_ref, lw_ref, lwp_ref, ka_ref, kb_ref,
         o0_ref, o1_ref) = rest
        get_tw = _tw_from_factors_wide(
            rw_ref, rwp_ref, lw_ref, lwp_ref, n, r, c
        )
    else:
        w_ref, wp_ref, ka_ref, kb_ref, o0_ref, o1_ref = rest
        get_tw = _tw_from_planes_wide(w_ref, wp_ref, r, c)
    j = pl.program_id(0) + j_offset
    q = (q_ref[j, 0], q_ref[j, 1])
    qinv = (qinv_ref[j, 0], qinv_ref[j, 1])
    zero = jnp.zeros((r, c), jnp.uint32)
    acc0 = (zero, zero)
    acc1 = (zero, zero)
    for t in range(num_digits):
        x = None
        for gi in range(digit_size):
            k = t * digit_size + gi
            if k >= num_base:
                break
            yk = (y_ref[0, k, 0], y_ref[0, k, 1])
            cw = (clo_ref[k, j], chi_ref[k, j])
            cwp = (cslo_ref[k, j], cshi_ref[k, j])
            term = _harvey64(yk, cw, cwp, q)
            x = term if x is None else _add_mod64(x, term, q)
        x = _fwd_stages_wide(x, get_tw, q, n, r, c, lazy)
        kb = (kb_ref[t, 0, 0], kb_ref[t, 0, 1])
        ka = (ka_ref[t, 0, 0], ka_ref[t, 0, 1])
        acc0 = _add_mod64(acc0, _redc64(x, kb, q, qinv), q)
        acc1 = _add_mod64(acc1, _redc64(x, ka, q, qinv), q)
    o0_ref[0, 0, 0], o0_ref[0, 0, 1] = acc0
    o1_ref[0, 0, 0], o1_ref[0, 0, 1] = acc1


def _ks_kernel_wide_base(q_ref, qinv_ref, clo_ref, chi_ref, cslo_ref,
                         cshi_ref, y_ref, d_ref, *rest,
                         n: int, r: int, c: int, num_digits: int,
                         digit_size: int, num_base: int, factored: bool,
                         lazy: bool):
    """Wide accumulate over BASE channels with the skip-own-tower
    shortcut (see keyswitch_pallas._ks_kernel_base): digit ``j //
    digit_size``'s raised NTT in channel j is bit-identical to the
    NTT-resident input plane d_ref, so only ``num_digits - 1`` forward
    NTTs run per grid step."""
    if factored:
        (rw_ref, rwp_ref, lw_ref, lwp_ref, ka_ref, kb_ref,
         o0_ref, o1_ref) = rest
        get_tw = _tw_from_factors_wide(
            rw_ref, rwp_ref, lw_ref, lwp_ref, n, r, c
        )
    else:
        w_ref, wp_ref, ka_ref, kb_ref, o0_ref, o1_ref = rest
        get_tw = _tw_from_planes_wide(w_ref, wp_ref, r, c)
    j = pl.program_id(0)
    q = (q_ref[j, 0], q_ref[j, 1])
    qinv = (qinv_ref[j, 0], qinv_ref[j, 1])
    own = j // digit_size

    def sel_plane(ref, idx):
        out = (ref[0, 0, 0], ref[0, 0, 1])
        for t in range(1, num_digits):
            hit = idx == t
            out = (jnp.where(hit, ref[t, 0, 0], out[0]),
                   jnp.where(hit, ref[t, 0, 1], out[1]))
        return out

    d = (d_ref[0, 0, 0], d_ref[0, 0, 1])
    acc0 = _redc64(d, sel_plane(kb_ref, own), q, qinv)
    acc1 = _redc64(d, sel_plane(ka_ref, own), q, qinv)
    if num_digits > 1:
        terms = []
        for k in range(num_base):
            yk = (y_ref[0, k, 0], y_ref[0, k, 1])
            cw = (clo_ref[k, j], chi_ref[k, j])
            cwp = (cslo_ref[k, j], cshi_ref[k, j])
            terms.append(_harvey64(yk, cw, cwp, q))
        zero = jnp.zeros((r, c), jnp.uint32)
        zz = (zero, zero)
        for tp in range(num_digits - 1):
            td = jnp.where(tp < own, tp, tp + 1)
            x = None
            for k in range(num_base):
                term = select64(k // digit_size == td, terms[k], zz)
                x = term if x is None else _add_mod64(x, term, q)
            x = _fwd_stages_wide(x, get_tw, q, n, r, c, lazy)
            acc0 = _add_mod64(
                acc0, _redc64(x, sel_plane(kb_ref, td), q, qinv), q
            )
            acc1 = _add_mod64(
                acc1, _redc64(x, sel_plane(ka_ref, td), q, qinv), q
            )
    o0_ref[0, 0, 0], o0_ref[0, 0, 1] = acc0
    o1_ref[0, 0, 0], o1_ref[0, 0, 1] = acc1


@functools.partial(
    jax.jit,
    static_argnames=(
        "base_moduli", "ext_moduli", "degree", "digit_size", "interpret"
    ),
)
def gadget_accumulate_pallas_wide(y_plain, key_a, key_b, *,
                                  base_moduli: tuple, ext_moduli: tuple,
                                  degree: int, digit_size: int = 1,
                                  interpret: bool = False,
                                  d_ntt=None):
    """Fused decompose + raise + NTT + key inner product (wide chains).

    y_plain: uint32 (..., L, 2, N) plain coeff-domain yhat values.
    key_a/key_b: uint32 (D, E, 2, N) Montgomery NTT-domain key stacks.
    d_ntt: optional uint32 (..., L, 2, N) NTT-domain Montgomery limb
    planes of the switched polynomial; when given, the base channels run
    the skip-own-tower kernel (L of the E*D forward NTTs replaced by
    direct key products — bit-exact).
    Returns (ks0, ks1): uint32 (..., E, 2, N) Montgomery NTT-domain digit
    inner products over QP (before the P mod-down).
    """
    n = degree
    r, c = _layout(n)
    L = y_plain.shape[-3]
    D, E = key_a.shape[0], key_a.shape[1]
    lead = y_plain.shape[:-3]
    y = y_plain.reshape(-1, L, 2, r, c)
    outer = y.shape[0]
    s_count = n.bit_length() - 1

    c_lo, c_hi, cs_lo, cs_hi, q, qinv, digit_size = _switch_consts_wide(
        tuple(base_moduli), tuple(ext_moduli), digit_size
    )
    if D != -(-L // digit_size):
        raise ValueError("key digit count does not match digit_size")
    factored = _use_factored_wide(n)

    ka = key_a.reshape(D, E, 2, r, c)
    kb = key_b.reshape(D, E, 2, r, c)

    common = dict(
        n=n, r=r, c=c, num_digits=D, digit_size=digit_size, num_base=L,
        factored=factored, lazy=lazy_ok_wide(ext_moduli),
    )
    smem = lambda shape: pl.BlockSpec(
        shape, lambda j, o: (0,) * len(shape), memory_space=pltpu.SMEM
    )
    plane = lambda off: pl.BlockSpec(
        (1, s_count, 2, r, c), lambda j, o: (j + off, 0, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    fac = lambda dim, off: pl.BlockSpec(
        (1, s_count, 2, dim), lambda j, o: (j + off, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    key_spec = lambda off: pl.BlockSpec(
        (D, 1, 2, r, c), lambda j, o: (0, j + off, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    y_spec = pl.BlockSpec(
        (1, L, 2, r, c), lambda j, o: (o, 0, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (1, 1, 2, r, c), lambda j, o: (o, j, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    if factored:
        frw, frwp, flw, flwp = _planes_factored_cached_wide(
            tuple(ext_moduli), n
        )[:4]
        tw_specs = lambda off: [fac(r, off), fac(r, off), fac(c, off),
                                fac(c, off)]
        tw_args = [frw, frwp, flw, flwp]
    else:
        fwd_w, fwd_wp = _planes_cached_wide(tuple(ext_moduli), n)[:2]
        tw_specs = lambda off: [plane(off), plane(off)]
        tw_args = [fwd_w.reshape(E, s_count, 2, r, c),
                   fwd_wp.reshape(E, s_count, 2, r, c)]

    def call(kernel, n_ch: int, off: int, extra_specs, extra_args):
        return pl.pallas_call(
            kernel,
            grid=(n_ch, outer),
            in_specs=[
                smem(q.shape), smem(qinv.shape),
                smem(c_lo.shape), smem(c_hi.shape),
                smem(cs_lo.shape), smem(cs_hi.shape),
                y_spec, *extra_specs, *tw_specs(off),
                key_spec(off), key_spec(off),
            ],
            out_specs=(out_spec, out_spec),
            out_shape=(
                jax.ShapeDtypeStruct((outer, n_ch, 2, r, c), jnp.uint32),
                jax.ShapeDtypeStruct((outer, n_ch, 2, r, c), jnp.uint32),
            ),
            interpret=interpret,
        )(q, qinv, c_lo, c_hi, cs_lo, cs_hi, y, *extra_args, *tw_args,
          ka, kb)

    if d_ntt is None:
        ks0, ks1 = call(
            functools.partial(_ks_kernel_wide, **common), E, 0, [], []
        )
    else:
        d = d_ntt.reshape(-1, L, 2, r, c)
        d_spec = pl.BlockSpec(
            (1, 1, 2, r, c), lambda j, o: (o, j, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        b0, b1 = call(
            functools.partial(_ks_kernel_wide_base, **common), L, 0,
            [d_spec], [d],
        )
        s0, s1 = call(
            functools.partial(_ks_kernel_wide, **common, j_offset=L),
            E - L, L, [], [],
        )
        ks0 = jnp.concatenate([b0, s0], axis=1)
        ks1 = jnp.concatenate([b1, s1], axis=1)

    def finish(x):
        return x.reshape(*lead, E, 2, n)

    return finish(ks0), finish(ks1)


# ── fused mod-down (+ combine), wide chains ─────────────────────────────────


@functools.lru_cache(maxsize=128)
def _down_consts_wide(child_moduli: tuple, dropped_moduli: tuple,
                      degree: int, t_scale: int = 0):
    """2-limb host tables mirroring moddown_pallas._down_consts; all
    constants returned as separate lo/hi uint32 arrays."""
    n = degree
    p_total = 1
    for p in dropped_moduli:
        p_total *= p
    G = len(dropped_moduli)
    L = len(child_moduli)

    def pair_tab(shape):
        return np.zeros(shape, dtype=np.uint32), np.zeros(shape, np.uint32)

    c_lo, c_hi = pair_tab((G, L))
    cs_lo, cs_hi = pair_tab((G, L))
    for m, pm in enumerate(dropped_moduli):
        phat = p_total // pm
        for j, qj in enumerate(child_moduli):
            w = (phat << 64) % qj
            c_lo[m, j], c_hi[m, j] = _split2(w)
            cs_lo[m, j], cs_hi[m, j] = _split2(_shoup64(w, qj))

    pmod = np.zeros((L, 2), dtype=np.uint32)
    pmod_s = np.zeros((L, 2), dtype=np.uint32)
    pinv = np.zeros((L, 2), dtype=np.uint32)
    pinv_s = np.zeros((L, 2), dtype=np.uint32)
    for j, qj in enumerate(child_moduli):
        w3 = t_scale % qj
        pmod[j] = _split2(w3)
        pmod_s[j] = _split2(_shoup64(w3, qj))
        w2 = pow(p_total % qj, -1, qj)
        pinv[j] = _split2(w2)
        pinv_s[j] = _split2(_shoup64(w2, qj))

    # inverse-NTT final constants emitting plain yhat (see moddown_pallas):
    # pre-final accumulator is Mont(c*N) with R = 2^64.
    yfin = np.zeros((G, 2), dtype=np.uint32)
    yfin_s = np.zeros((G, 2), dtype=np.uint32)
    for m, pm in enumerate(dropped_moduli):
        phat = p_total // pm
        w = (
            pow(n, -1, pm) * pow(phat % pm, -1, pm) * pow(1 << 64, -1, pm)
        ) % pm
        yfin[m] = _split2(w)
        yfin_s[m] = _split2(_shoup64(w, pm))

    q_child = np.array([_split2(q) for q in child_moduli], dtype=np.uint32)
    return (c_lo, c_hi, cs_lo, cs_hi, pmod, pmod_s, pinv, pinv_s,
            yfin, yfin_s, q_child)


def _inv_yhat_kernel_wide(q_ref, fin_ref, finp_ref, x_ref, *rest,
                          n: int, r: int, c: int, factored: bool,
                          lazy: bool):
    """Inverse NTT emitting plain yhat (final constant folded in)."""
    if factored:
        rw_ref, rwp_ref, lw_ref, lwp_ref, o_ref = rest
        get_tw = _tw_from_factors_wide(
            rw_ref, rwp_ref, lw_ref, lwp_ref, n, r, c
        )
    else:
        w_ref, wp_ref, o_ref = rest
        get_tw = _tw_from_planes_wide(w_ref, wp_ref, r, c)
    ch = pl.program_id(0)
    q = (q_ref[ch, 0], q_ref[ch, 1])
    two_q = add64(q, q)
    x = (x_ref[0, 0, 0], x_ref[0, 0, 1])
    s_count = n.bit_length() - 1
    for s in range(s_count - 1, -1, -1):
        d = n >> (s + 1)
        axis, amount, mask = _butterfly_args(n, r, c, d)
        if lazy:
            x = _inv_stage_lazy64(x, get_tw(s), q, two_q, axis, amount, mask)
            continue
        shift2 = lambda v, a: (_shift(v[0], a, axis), _shift(v[1], a, axis))
        v_at_u = shift2(x, amount)
        u_at_v = shift2(x, -amount)
        total = _add_mod64(x, v_at_u, q)
        diff = _sub_mod64(u_at_v, x, q)
        wv = _tw_mul64(diff, get_tw(s), q)
        x = select64(mask, total, wv)
    fin = (fin_ref[ch, 0], fin_ref[ch, 1])
    finp = (finp_ref[ch, 0], finp_ref[ch, 1])
    x = _harvey64(x, fin, finp, q)
    o_ref[0, 0, 0], o_ref[0, 0, 1] = x


@functools.partial(
    jax.jit,
    static_argnames=("dropped_moduli", "child_moduli", "degree", "interpret"),
)
def inv_ntt_to_yhat_wide(x_dropped, dropped_moduli: tuple,
                         child_moduli: tuple, degree: int,
                         interpret: bool = False):
    """Inverse NTT of the dropped channels emitting PLAIN yhat directly.
    x: (..., G, 2, N) Montgomery NTT-domain limb data."""
    consts = _down_consts_wide(
        tuple(child_moduli), tuple(dropped_moduli), degree
    )
    yfin, yfin_s = consts[8], consts[9]
    return _inv_fold_call_wide(
        x_dropped, tuple(dropped_moduli), degree, yfin, yfin_s, interpret
    )


@functools.lru_cache(maxsize=128)
def _fold_consts_wide(moduli: tuple, degree: int, post: tuple):
    """Folded inverse-NTT final constants (R = 2^64): one Harvey by
    N^{-1} * post_k * R^{-1} mod q_k emits mont_mul(iNTT(x), post)."""
    fin = np.zeros((len(moduli), 2), dtype=np.uint32)
    fin_s = np.zeros((len(moduli), 2), dtype=np.uint32)
    for k, q in enumerate(moduli):
        w = (
            pow(degree, -1, q) * (post[k] % q) * pow(1 << 64, -1, q)
        ) % q
        fin[k] = _split2(w)
        fin_s[k] = _split2(_shoup64(w, q))
    return fin, fin_s


@functools.partial(
    jax.jit, static_argnames=("moduli", "degree", "post", "interpret")
)
def inv_ntt_fold_wide(x, moduli: tuple, degree: int, post: tuple,
                      interpret: bool = False):
    """Wide inverse NTT with plain per-channel post-factors folded into
    the final constant: bit-exact with
    ``mont_mul(ntt_pallas_wide(x, inverse=True), post)`` in one kernel.
    Jitted (static config) so eager callers don't rebuild the pallas_call
    per invocation, matching the sibling entry points."""
    moduli = tuple(int(m) for m in moduli)
    fin, fin_s = _fold_consts_wide(
        moduli, degree, tuple(int(p) for p in post)
    )
    return _inv_fold_call_wide(x, moduli, degree, fin, fin_s, interpret)


def _inv_fold_call_wide(x_dropped, dropped_moduli: tuple, degree: int,
                        yfin, yfin_s, interpret: bool = False):
    factored = _use_factored_wide(degree)
    n = degree
    r, c = _layout(n)
    G = len(dropped_moduli)
    lead = x_dropped.shape[:-3]
    x = x_dropped.reshape(-1, G, 2, r, c)
    outer = x.shape[0]
    s_count = n.bit_length() - 1

    kernel = functools.partial(
        _inv_yhat_kernel_wide, n=n, r=r, c=c, factored=factored,
        lazy=lazy_ok_wide(dropped_moduli),
    )
    smem = lambda shape: pl.BlockSpec(
        shape, lambda ch, o: (0, 0), memory_space=pltpu.SMEM
    )
    data_spec = lambda: pl.BlockSpec(
        (1, 1, 2, r, c), lambda ch, o: (o, ch, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    plane = lambda: pl.BlockSpec(
        (1, s_count, 2, r, c), lambda ch, o: (ch, 0, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    fac = lambda dim: pl.BlockSpec(
        (1, s_count, 2, dim), lambda ch, o: (ch, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    if factored:
        tabs = _planes_factored_cached_wide(tuple(dropped_moduli), degree)
        irw, irwp, ilw, ilwp, q = (tabs[4], tabs[5], tabs[6], tabs[7],
                                   tabs[8])
        tw_specs = [fac(r), fac(r), fac(c), fac(c)]
        tw_args = [irw, irwp, ilw, ilwp]
    else:
        _, _, inv_w, inv_wp, q, _, _ = _planes_cached_wide(
            tuple(dropped_moduli), degree
        )
        tw_specs = [plane(), plane()]
        tw_args = [inv_w.reshape(G, s_count, 2, r, c),
                   inv_wp.reshape(G, s_count, 2, r, c)]
    out = pl.pallas_call(
        kernel,
        grid=(G, outer),
        in_specs=[smem(q.shape), smem(yfin.shape), smem(yfin_s.shape),
                  data_spec(), *tw_specs],
        out_specs=data_spec(),
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.uint32),
        interpret=interpret,
    )(q, yfin, yfin_s, x, *tw_args)
    return out.reshape(*lead, G, 2, n)


def _md_core_wide(q_ref, clo_ref, chi_ref, cslo_ref, cshi_ref,
                  pm_ref, pms_ref, pi_ref, pis_ref,
                  yhat_ref, head_ref, t_ref, tw_refs, o_ref,
                  n: int, r: int, c: int, n_dropped: int, factored: bool,
                  lazy: bool):
    if factored:
        get_tw = _tw_from_factors_wide(*tw_refs, n, r, c)
    else:
        get_tw = _tw_from_planes_wide(*tw_refs, r, c)
    j = pl.program_id(0)
    q = (q_ref[j, 0], q_ref[j, 1])
    ext = None
    for m in range(n_dropped):
        ym = (yhat_ref[0, m, 0], yhat_ref[0, m, 1])
        cw = (clo_ref[m, j], chi_ref[m, j])
        cwp = (cslo_ref[m, j], cshi_ref[m, j])
        term = _harvey64(ym, cw, cwp, q)
        ext = term if ext is None else _add_mod64(ext, term, q)
    ext = _fwd_stages_wide(ext, get_tw, q, n, r, c, lazy)
    head = (head_ref[0, 0, 0], head_ref[0, 0, 1])
    if t_ref is not None:
        tv = (t_ref[0, 0, 0], t_ref[0, 0, 1])
        tp = _harvey64(
            tv, (pm_ref[j, 0], pm_ref[j, 1]), (pms_ref[j, 0], pms_ref[j, 1]),
            q,
        )
        head = _add_mod64(head, tp, q)
    diff = _sub_mod64(head, ext, q)
    out = _harvey64(
        diff, (pi_ref[j, 0], pi_ref[j, 1]), (pis_ref[j, 0], pis_ref[j, 1]), q
    )
    o_ref[0, 0, 0], o_ref[0, 0, 1] = out


def _md_kernel_wide_no_t(q_ref, clo, chi, cslo, cshi, pm, pms, pi, pis,
                         yhat_ref, head_ref, *rest,
                         n, r, c, n_dropped, factored, lazy):
    *tw_refs, o_ref = rest
    _md_core_wide(q_ref, clo, chi, cslo, cshi, pm, pms, pi, pis,
                  yhat_ref, head_ref, None, tw_refs, o_ref,
                  n, r, c, n_dropped, factored, lazy)


def _md_kernel_wide_t(q_ref, clo, chi, cslo, cshi, pm, pms, pi, pis,
                      yhat_ref, head_ref, t_ref, *rest,
                      n, r, c, n_dropped, factored, lazy):
    *tw_refs, o_ref = rest
    _md_core_wide(q_ref, clo, chi, cslo, cshi, pm, pms, pi, pis,
                  yhat_ref, head_ref, t_ref, tw_refs, o_ref,
                  n, r, c, n_dropped, factored, lazy)


@functools.partial(
    jax.jit,
    static_argnames=(
        "child_moduli", "dropped_moduli", "degree", "interpret", "t_scale"
    ),
)
def mod_down_combine_pallas_wide(yhat, ks, t=None, *, child_moduli: tuple,
                                 dropped_moduli: tuple, degree: int,
                                 interpret: bool = False, t_scale: int = 0):
    """out_j = ((t_j * t_scale if t) + ks_j - NTT(ext_j)) * P^{-1} (wide).

    yhat: (..., G, 2, N) plain; ks/t: (..., L', 2, N) Montgomery NTT limb
    data. P = prod(dropped_moduli). Returns (..., L', 2, N).
    """
    n = degree
    r, cdim = _layout(n)
    G = len(dropped_moduli)
    Lc = len(child_moduli)
    lead = ks.shape[:-3]
    y = yhat.reshape(-1, G, 2, r, cdim)
    k = ks.reshape(-1, Lc, 2, r, cdim)
    outer = y.shape[0]
    s_count = n.bit_length() - 1

    (c_lo, c_hi, cs_lo, cs_hi, pmod, pmod_s, pinv, pinv_s, _, _,
     q_child) = _down_consts_wide(
        tuple(child_moduli), tuple(dropped_moduli), degree, t_scale
    )
    factored = _use_factored_wide(degree)

    has_t = t is not None
    kernel = functools.partial(
        _md_kernel_wide_t if has_t else _md_kernel_wide_no_t,
        n=n, r=r, c=cdim, n_dropped=G, factored=factored,
        lazy=lazy_ok_wide(child_moduli),
    )
    smem = lambda shape: pl.BlockSpec(
        shape, lambda j, o: (0, 0), memory_space=pltpu.SMEM
    )
    data = lambda nch: pl.BlockSpec(
        (1, nch, 2, r, cdim), lambda j, o: (o, 0, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    per_ch = lambda: pl.BlockSpec(
        (1, 1, 2, r, cdim), lambda j, o: (o, j, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    plane = lambda: pl.BlockSpec(
        (1, s_count, 2, r, cdim), lambda j, o: (j, 0, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    in_specs = [
        smem(q_child.shape), smem(c_lo.shape), smem(c_hi.shape),
        smem(cs_lo.shape), smem(cs_hi.shape),
        smem(pmod.shape), smem(pmod_s.shape),
        smem(pinv.shape), smem(pinv_s.shape),
        data(G), per_ch(),
    ]
    args = [q_child, c_lo, c_hi, cs_lo, cs_hi, pmod, pmod_s, pinv, pinv_s,
            y, k]
    if has_t:
        in_specs.append(per_ch())
        args.append(t.reshape(-1, Lc, 2, r, cdim))
    fac = lambda dim: pl.BlockSpec(
        (1, s_count, 2, dim), lambda j, o: (j, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    if factored:
        frw, frwp, flw, flwp = _planes_factored_cached_wide(
            tuple(child_moduli), degree
        )[:4]
        in_specs += [fac(r), fac(r), fac(cdim), fac(cdim)]
        args += [frw, frwp, flw, flwp]
    else:
        fwd_w, fwd_wp = _planes_cached_wide(tuple(child_moduli), degree)[:2]
        in_specs += [plane(), plane()]
        args += [fwd_w.reshape(Lc, s_count, 2, r, cdim),
                 fwd_wp.reshape(Lc, s_count, 2, r, cdim)]

    out = pl.pallas_call(
        kernel,
        grid=(Lc, outer),
        in_specs=in_specs,
        out_specs=per_ch(),
        out_shape=jax.ShapeDtypeStruct((outer, Lc, 2, r, cdim), jnp.uint32),
        interpret=interpret,
    )(*args)
    return out.reshape(*lead, Lc, 2, n)
