"""Fused hybrid gadget key-switch accumulation as one Pallas TPU kernel.

The jnp path materialises the full decomposition tensor alpha
(batch, D digits, E channels, N) in HBM, NTTs it, multiplies by the key
and tree-reduces — several full-size HBM round trips (reference semantics:
src/crypto/engine.rs:505-528 generalised to digit groups). This kernel
fuses the whole chain per (ext channel j, batch element) grid step:

    for each digit t:
        alpha_t = sum_{k in group t} yhat_k * (Qhat_tk * R mod q_j)   [Harvey]
        alpha_t = forward NTT (all stages in VMEM)
        ks0 += alpha_t * key_b[t, j];  ks1 += alpha_t * key_a[t, j]   [REDC]

so the alpha tensor never exists in memory: HBM traffic is yhat in, two
accumulated planes out, with twiddles and key planes fetched once per
channel (grid is (channel, outer) with outer innermost).

Small-prime chains only (q < 2^31, single u32 limb); exact parity with the
jnp path (modular sums are order-independent).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ntt_pallas import (
    _add_mod,
    _auto_pair,
    _fwd_stages_tw_multi,
    _harvey_mul,
    _layout,
    _planes_cached,
    _planes_factored_cached,
    _tw_from_factors,
    _tw_from_planes,
    _use_factored,
    lazy_ok,
)


def _umul32(a, b):
    """Full 32x32 -> 64 product from 16-bit halves. Returns (lo, hi)."""
    a0 = a & 0xFFFF
    a1 = a >> 16
    b0 = b & 0xFFFF
    b1 = b >> 16
    ll = a0 * b0
    lh = a0 * b1
    hl = a1 * b0
    t = (ll >> 16) + (lh & 0xFFFF) + (hl & 0xFFFF)
    lo = (ll & 0xFFFF) | ((t & 0xFFFF) << 16)
    hi = a1 * b1 + (lh >> 16) + (hl >> 16) + (t >> 16)
    return lo, hi


def _mont_redc(a, b, q, qinv):
    """Montgomery product a*b*R^{-1} mod q (R=2^32), both operands variable."""
    t_lo, t_hi = _umul32(a, b)
    m = t_lo * qinv
    mq_lo, mq_hi = _umul32(m, q)
    s_lo = t_lo + mq_lo
    carry = (s_lo < t_lo).astype(jnp.uint32)
    res = t_hi + mq_hi + carry  # < 2q
    return jnp.where(res >= q, res - q, res)


@functools.lru_cache(maxsize=64)
def _switch_consts(base_moduli: tuple, ext_moduli: tuple, digit_size: int):
    """Host tables for the in-kernel basis extension (plain, not traced).

    c[k, j]   = (Qhat_{t(k),k} * 2^32) mod q_j   (Harvey weight: maps the
                plain yhat_k straight to Montgomery form of its alpha term)
    cs[k, j]  = Shoup companion floor(c * 2^32 / q_j)
    Plus per-ext-channel q and -q^{-1} mod 2^32 for the key REDC.
    Keyed by the key's stored ``digit_size`` (never inferred from the digit
    count — ceil(L/D) does not round-trip every valid digit_size).
    """
    from ..keys import digit_groups

    L = len(base_moduli)
    E = len(ext_moduli)
    digit_size = min(digit_size, L)
    groups = digit_groups(L, digit_size)
    num_digits = len(groups)
    dg = num_digits * digit_size

    c = np.zeros((dg, E), dtype=np.uint32)
    cs = np.zeros((dg, E), dtype=np.uint32)
    for t, grp in enumerate(groups):
        for gi, k in enumerate(grp):
            qhat = 1
            for k2 in grp:
                if k2 != k:
                    qhat *= base_moduli[k2]
            for j, qj in enumerate(ext_moduli):
                w = (qhat << 32) % qj
                c[t * digit_size + gi, j] = w
                cs[t * digit_size + gi, j] = (w << 32) // qj
    q = np.array([[m] for m in ext_moduli], dtype=np.uint32)
    qinv = np.array(
        [[(-pow(m, -1, 1 << 32)) % (1 << 32)] for m in ext_moduli],
        dtype=np.uint32,
    )
    return c, cs, q, qinv, digit_size


def _ks_kernel(q_ref, qinv_ref, c_ref, cs_ref, y_ref, *rest,
               n: int, r: int, c: int, num_digits: int,
               digit_size: int, num_base: int, lazy: bool, factored: bool,
               pair: int = 1, j_offset: int = 0):
    if factored:
        rw_ref, rwp_ref, lw_ref, lwp_ref, ka_ref, kb_ref, o0_ref, o1_ref = (
            rest
        )
        get_tw = _tw_from_factors(rw_ref, rwp_ref, lw_ref, lwp_ref, n, r, c)
    else:
        w_ref, wp_ref, ka_ref, kb_ref, o0_ref, o1_ref = rest
        get_tw = _tw_from_planes(w_ref, wp_ref, r, c)
    j = pl.program_id(0) + j_offset
    q = q_ref[j, 0]
    qinv = qinv_ref[j, 0]
    acc0 = [jnp.zeros((r, c), jnp.uint32) for _ in range(pair)]
    acc1 = [jnp.zeros((r, c), jnp.uint32) for _ in range(pair)]
    for t in range(num_digits):
        xs = []
        for p in range(pair):
            x = None
            for gi in range(digit_size):
                k = t * digit_size + gi
                if k >= num_base:
                    break
                term = _harvey_mul(
                    y_ref[p, k], c_ref[k, j], cs_ref[k, j], q
                )
                x = term if x is None else _add_mod(x, term, q)
            xs.append(x)
        # pair independent NTT chains (latency-bound serial stages)
        xs = _fwd_stages_tw_multi(xs, get_tw, q, n, r, c, lazy)
        for p in range(pair):
            acc0[p] = _add_mod(
                acc0[p], _mont_redc(xs[p], kb_ref[t, 0], q, qinv), q
            )
            acc1[p] = _add_mod(
                acc1[p], _mont_redc(xs[p], ka_ref[t, 0], q, qinv), q
            )
    for p in range(pair):
        o0_ref[p, 0] = acc0[p]
        o1_ref[p, 0] = acc1[p]


def _ks_kernel_base(q_ref, qinv_ref, c_ref, cs_ref, y_ref, d_ref, *rest,
                    n: int, r: int, c: int, num_digits: int,
                    digit_size: int, num_base: int, lazy: bool,
                    factored: bool, pair: int = 1):
    """Key-switch accumulation over the BASE channels (j < L), with the
    skip-own-tower shortcut: for digit t's own-group channel j, the raised
    digit is congruent to the switched polynomial d itself (the k != j
    terms of the digit raise all carry q_j as a factor), so its forward
    NTT is bit-identical to the NTT-resident input plane d_ref — one of
    the ``num_digits`` per-channel NTTs is replaced by a key multiply on
    d directly. Modular sums commute, so the result is bit-exact with
    ``_ks_kernel``.
    """
    if factored:
        rw_ref, rwp_ref, lw_ref, lwp_ref, ka_ref, kb_ref, o0_ref, o1_ref = (
            rest
        )
        get_tw = _tw_from_factors(rw_ref, rwp_ref, lw_ref, lwp_ref, n, r, c)
    else:
        w_ref, wp_ref, ka_ref, kb_ref, o0_ref, o1_ref = rest
        get_tw = _tw_from_planes(w_ref, wp_ref, r, c)
    j = pl.program_id(0)
    q = q_ref[j, 0]
    qinv = qinv_ref[j, 0]
    own = j // digit_size  # this channel's digit (dynamic scalar)

    def sel_plane(ref, idx):
        out = ref[0, 0]
        for t in range(1, num_digits):
            out = jnp.where(idx == t, ref[t, 0], out)
        return out

    acc0 = [
        _mont_redc(d_ref[p, 0], sel_plane(kb_ref, own), q, qinv)
        for p in range(pair)
    ]
    acc1 = [
        _mont_redc(d_ref[p, 0], sel_plane(ka_ref, own), q, qinv)
        for p in range(pair)
    ]
    if num_digits > 1:
        terms = [
            [
                _harvey_mul(y_ref[p, k], c_ref[k, j], cs_ref[k, j], q)
                for k in range(num_base)
            ]
            for p in range(pair)
        ]
        zero = jnp.zeros((r, c), jnp.uint32)
        for tp in range(num_digits - 1):
            td = jnp.where(tp < own, tp, tp + 1)  # tp-th non-own digit
            xs = []
            for p in range(pair):
                x = None
                for k in range(num_base):
                    term = jnp.where(
                        k // digit_size == td, terms[p][k], zero
                    )
                    x = term if x is None else _add_mod(x, term, q)
                xs.append(x)
            xs = _fwd_stages_tw_multi(xs, get_tw, q, n, r, c, lazy)
            for p in range(pair):
                acc0[p] = _add_mod(
                    acc0[p],
                    _mont_redc(xs[p], sel_plane(kb_ref, td), q, qinv), q,
                )
                acc1[p] = _add_mod(
                    acc1[p],
                    _mont_redc(xs[p], sel_plane(ka_ref, td), q, qinv), q,
                )
    for p in range(pair):
        o0_ref[p, 0] = acc0[p]
        o1_ref[p, 0] = acc1[p]


@functools.partial(
    jax.jit,
    static_argnames=(
        "base_moduli", "ext_moduli", "degree", "digit_size", "interpret",
        "stack_limbs",
    ),
)
def gadget_accumulate_pallas(y_plain, key_a, key_b, *,
                             base_moduli: tuple, ext_moduli: tuple,
                             degree: int, digit_size: int = 1,
                             interpret: bool = False,
                             stack_limbs: bool = True,
                             d_ntt=None):
    """Fused decompose + raise + NTT + key inner product (small chains).

    y_plain: uint32 (..., L, N) plain coeff-domain yhat values (already
             multiplied by the digit-local CRT inverses).
    key_a/key_b: uint32 (D, E, 2, N) Montgomery NTT-domain key stacks.
    digit_size: the key's stored decomposition width (D must equal
             len(digit_groups(L, digit_size))).
    d_ntt: optional uint32 (..., L, N) NTT-domain Montgomery lo planes of
             the polynomial being switched (whose inverse NTT produced
             y_plain). When given, the base channels take the
             skip-own-tower path (``_ks_kernel_base``): L of the E*D
             per-element forward NTTs are replaced by direct key products
             on these already-transformed planes — bit-exact, the raised
             own-group digit IS the input polynomial mod its own primes.
    Returns (ks0, ks1): uint32 (..., E, 2, N) Montgomery NTT-domain digit
    inner products over QP (before the P mod-down).
    """
    n = degree
    r, c = _layout(n)
    L = y_plain.shape[-2]
    D, E = key_a.shape[0], key_a.shape[1]
    lead = y_plain.shape[:-2]
    y = y_plain.reshape(-1, L, r, c)
    outer = y.shape[0]
    s_count = n.bit_length() - 1

    cst, cst_s, q, qinv, digit_size = _switch_consts(
        tuple(base_moduli), tuple(ext_moduli), digit_size
    )
    if D != -(-L // digit_size):
        raise ValueError("key digit count does not match digit_size")
    factored = _use_factored(n)

    ka = key_a[..., 0, :].reshape(D, E, r, c)
    kb = key_b[..., 0, :].reshape(D, E, r, c)

    # pair-scaled planes per item: y (L) + d (1) + 2 outs + temps (~L+D);
    # fixed per-grid-step blocks: expanded twiddle planes (2*S, absent on
    # the factored layout) + key blocks (2*D)
    fixed = (0 if factored else 2 * s_count) + 2 * D
    pair = _auto_pair(outer, n, 2 * L + D + 3, fixed_planes=fixed)

    smem = lambda shape: pl.BlockSpec(
        shape, lambda j, o: (0, 0), memory_space=pltpu.SMEM
    )
    plane = lambda off: pl.BlockSpec(
        (1, s_count, r, c), lambda j, o: (j + off, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    fac = lambda dim, off: pl.BlockSpec(
        (1, s_count, dim), lambda j, o: (j + off, 0, 0),
        memory_space=pltpu.VMEM,
    )
    key_spec = lambda off: pl.BlockSpec(
        (D, 1, r, c), lambda j, o: (0, j + off, 0, 0),
        memory_space=pltpu.VMEM,
    )
    y_spec = pl.BlockSpec(
        (pair, L, r, c), lambda j, o: (o, 0, 0, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (pair, 1, r, c), lambda j, o: (o, j, 0, 0), memory_space=pltpu.VMEM
    )
    if factored:
        frw, frwp, flw, flwp = _planes_factored_cached(
            tuple(ext_moduli), n
        )[:4]
        tw_specs = lambda off: [fac(r, off), fac(r, off), fac(c, off),
                                fac(c, off)]
        tw_args = [frw, frwp, flw, flwp]
    else:
        fwd_w, fwd_wp = _planes_cached(tuple(ext_moduli), n)[:2]
        tw_specs = lambda off: [plane(off), plane(off)]
        tw_args = [fwd_w.reshape(E, s_count, r, c),
                   fwd_wp.reshape(E, s_count, r, c)]

    common = dict(
        n=n, r=r, c=c, num_digits=D, digit_size=digit_size, num_base=L,
        lazy=lazy_ok(ext_moduli), factored=factored, pair=pair,
    )

    def call(kernel, n_ch: int, off: int, extra_specs, extra_args):
        return pl.pallas_call(
            kernel,
            grid=(n_ch, outer // pair),
            in_specs=[
                smem((E, 1)), smem((E, 1)),
                smem(cst.shape), smem(cst_s.shape),
                y_spec, *extra_specs, *tw_specs(off),
                key_spec(off), key_spec(off),
            ],
            out_specs=(out_spec, out_spec),
            out_shape=(
                jax.ShapeDtypeStruct((outer, n_ch, r, c), jnp.uint32),
                jax.ShapeDtypeStruct((outer, n_ch, r, c), jnp.uint32),
            ),
            interpret=interpret,
        )(q, qinv, cst, cst_s, y, *extra_args, *tw_args, ka, kb)

    if d_ntt is None:
        ks0, ks1 = call(
            functools.partial(_ks_kernel, **common), E, 0, [], []
        )
    else:
        d = d_ntt.reshape(-1, L, r, c)
        d_spec = pl.BlockSpec(
            (pair, 1, r, c), lambda j, o: (o, j, 0, 0),
            memory_space=pltpu.VMEM,
        )
        b0, b1 = call(
            functools.partial(_ks_kernel_base, **common), L, 0,
            [d_spec], [d],
        )
        s0, s1 = call(
            functools.partial(_ks_kernel, **common, j_offset=L),
            E - L, L, [], [],
        )
        # XLA folds the slice-of-concat consumers back to the operands,
        # so the concatenated stack is not materialised on the hot path
        ks0 = jnp.concatenate([b0, s0], axis=1)
        ks1 = jnp.concatenate([b1, s1], axis=1)

    def finish(x):
        x = x.reshape(*lead, E, n)
        if stack_limbs:
            return jnp.stack([x, jnp.zeros_like(x)], axis=-2)
        return x

    return finish(ks0), finish(ks1)
