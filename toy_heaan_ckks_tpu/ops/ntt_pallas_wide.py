"""Fused Pallas NTT for WIDE prime chains (2^31 <= q < 2^63, 2-limb).

Same design as ntt_pallas.py (all stages on a VMEM-resident plane,
in-place distance-d butterflies via static shifts, Harvey/Shoup twiddle
multiplication) but every value is a (lo, hi) uint32 limb pair and the
Shoup radix is 2^64: wp = floor(w * 2^64 / q),
r = lo64(x*w) - lo64(hi64(x*wp) * q), r in [0, 2q), one 64-bit
conditional subtract. Covers the reference's heavy configurations
(40/61/62-bit chains: tests/integration_mul.rs, examples/horner_chain.rs)
that the small-prime kernel cannot.

Data layout: per channel, a (2, R, C) block (limb axis leading so both
planes stay (R, C)-tiled). Bit-exact with the staged jnp path
(ops/ntt.py) — same canonical [0, q) representatives.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ntt_pallas import _auto_pair, _butterfly_args, _layout, _shift
from .u64 import add64, geq64, mul64_128, mullo64, select64, sub64


def supported_wide(degree: int, moduli) -> bool:
    """Power-of-two N in [2^10, 2^16]; any odd q < 2^63.

    N <= 2^14 uses fully expanded per-stage twiddle planes (2x the small
    kernel's footprint, so the VMEM cap sits one octave lower); above that
    the factored row x lane twiddle kernel takes over."""
    return (
        1024 <= degree <= (1 << 16)
        and degree & (degree - 1) == 0
        and all(int(m) < (1 << 63) for m in moduli)
    )


def _use_factored_wide(degree: int) -> bool:
    return degree > (1 << 14)


@functools.lru_cache(maxsize=64)
def _planes_cached_wide(moduli: tuple[int, ...], degree: int):
    """Expanded twiddle planes as limb pairs: w and wp = floor(w*2^64/q).

    Returns (fwd_w, fwd_wp, inv_w, inv_wp, q, ninv, ninvp):
    planes uint32 (L, S, 2, N); q/ninv/ninvp uint32 (L, 2).
    """
    from ..math.primes import find_primitive_root
    from .ntt import tree_exponent_stages

    n = degree
    two_n = 2 * n
    stages_e = tree_exponent_stages(n)
    s_count = len(stages_e)
    L = len(moduli)

    def split(v):
        return v & 0xFFFFFFFF, (v >> 32) & 0xFFFFFFFF

    def shoup(w, q):
        return (w << 64) // q

    fwd_w = np.empty((L, s_count, 2, n), dtype=np.uint32)
    fwd_wp = np.empty_like(fwd_w)
    inv_w = np.empty_like(fwd_w)
    inv_wp = np.empty_like(fwd_w)
    for li, q in enumerate(moduli):
        psi = find_primitive_root(q, two_n)
        for s, exps in enumerate(stages_e):
            rep = n // len(exps)

            def fill(dst_w, dst_wp, vals):
                for limb in range(2):
                    dst_w[li, s, limb] = np.repeat(
                        np.array([split(v)[limb] for v in vals],
                                 dtype=np.uint32), rep)
                    dst_wp[li, s, limb] = np.repeat(
                        np.array([split(shoup(v, q))[limb] for v in vals],
                                 dtype=np.uint32), rep)

            fill(fwd_w, fwd_wp, [pow(psi, e, q) for e in exps])
            fill(inv_w, inv_wp, [pow(psi, two_n - e, q) for e in exps])

    pack2 = lambda vals: np.array(
        [split(int(v)) for v in vals], dtype=np.uint32
    )  # (L, 2)
    q_arr = pack2(moduli)
    ninv = pack2([pow(n, -1, q) for q in moduli])
    ninvp = pack2([shoup(pow(n, -1, q), q) for q in moduli])
    return fwd_w, fwd_wp, inv_w, inv_wp, q_arr, ninv, ninvp


def lazy_ok_wide(moduli) -> bool:
    """Harvey lazy reduction on the 2-limb path needs the [0, 4q) stage
    invariant to fit u64: all q < 2^62 (every 40/61/62-bit config)."""
    return all(int(m) < (1 << 62) for m in moduli)


def _harvey64(x, w, wp, q):
    """(x * w) mod q on u64 pairs: x any u64, w < q < 2^63. Out in [0, q)."""
    p = mul64_128(x, wp)
    h = (p[2], p[3])  # floor(x * wp / 2^64)
    t1 = mullo64(x, w)
    t2 = mullo64(h, q)
    r = sub64(t1, t2)  # in [0, 2q), 2q < 2^64
    return select64(geq64(r, q), sub64(r, q), r)


def _harvey64_lazy(x, w, wp, q):
    """Harvey modmul WITHOUT the final reduction: output in [0, 2q)."""
    p = mul64_128(x, wp)
    h = (p[2], p[3])
    return sub64(mullo64(x, w), mullo64(h, q))


def _add_mod64(a, b, q):
    s = add64(a, b)
    return select64(geq64(s, q), sub64(s, q), s)


def _sub_mod64(a, b, q):
    d = sub64(a, b)
    return select64(geq64(a, b), d, add64(d, q))


def _reduce_2q64(x, two_q):
    """Conditional subtract of 2q: [0, 4q) -> [0, 2q)."""
    return select64(geq64(x, two_q), sub64(x, two_q), x)


def _reduce_4q_q64(x, q, two_q):
    """[0, 4q) -> canonical [0, q)."""
    x = _reduce_2q64(x, two_q)
    return select64(geq64(x, q), sub64(x, q), x)


def _fwd_stage_lazy64(x, tw, q, two_q, axis: int, amount: int, mask):
    """Forward butterfly, Harvey-lazy on u64 pairs: [0, 4q) invariant,
    q < 2^62. Only the 'u' operand of the add/sub is conditionally
    brought below 2q; the twiddle multiply accepts any u64."""
    xr = _reduce_2q64(x, two_q)  # < 2q
    shift2 = lambda v, a: (_shift(v[0], a, axis), _shift(v[1], a, axis))
    v_at_u = shift2(x, amount)  # partner (unreduced)
    u_at_v = shift2(xr, -amount)  # reduced u at v positions
    operand = select64(mask, v_at_u, x)
    t = _tw_mul64(operand, tw, q, lazy=True)  # < 2q
    return select64(
        mask, add64(xr, t), sub64(add64(u_at_v, two_q), t)
    )  # < 4q


def _inv_stage_lazy64(x, tw, q, two_q, axis: int, amount: int, mask):
    """Inverse (GS) butterfly, Harvey-lazy: [0, 2q) invariant."""
    shift2 = lambda v, a: (_shift(v[0], a, axis), _shift(v[1], a, axis))
    v_at_u = shift2(x, amount)
    u_at_v = shift2(x, -amount)
    total = _reduce_2q64(add64(x, v_at_u), two_q)  # < 2q
    diff = sub64(add64(u_at_v, two_q), x)  # < 4q
    t = _tw_mul64(diff, tw, q, lazy=True)  # < 2q
    return select64(mask, total, t)


def _ntt_kernel_wide(q_ref, ninv_ref, ninvp_ref, x_ref, w_ref, wp_ref, o_ref,
                     *, n: int, r: int, c: int, inverse: bool, lazy: bool,
                     pair: int = 1):
    """``pair`` > 1 processes that many independent limb-pair planes per
    grid step (same twiddles) — the serial stage chain on one plane is
    latency-bound, so independent dependency chains interleave."""
    ch = pl.program_id(0)
    q = (q_ref[ch, 0], q_ref[ch, 1])
    two_q = add64(q, q)
    xs = [(x_ref[p, 0, 0], x_ref[p, 0, 1]) for p in range(pair)]
    s_count = n.bit_length() - 1
    stage_order = range(s_count - 1, -1, -1) if inverse else range(s_count)
    for s in stage_order:
        d = n >> (s + 1)
        axis, amount, mask = _butterfly_args(n, r, c, d)
        w = (w_ref[0, s, 0], w_ref[0, s, 1])
        wp = (wp_ref[0, s, 0], wp_ref[0, s, 1])
        tw = (w, wp, None, None)

        def stage(x):
            if lazy:
                return (_inv_stage_lazy64 if inverse else
                        _fwd_stage_lazy64)(x, tw, q, two_q, axis, amount,
                                           mask)
            shift2 = lambda v, a: (
                _shift(v[0], a, axis), _shift(v[1], a, axis)
            )
            v_at_u = shift2(x, amount)
            u_at_v = shift2(x, -amount)
            if inverse:
                total = _add_mod64(x, v_at_u, q)
                diff = _sub_mod64(u_at_v, x, q)
                wv = _harvey64(diff, w, wp, q)
                return select64(mask, total, wv)
            operand = select64(mask, v_at_u, x)
            wv = _harvey64(operand, w, wp, q)
            return select64(
                mask, _add_mod64(x, wv, q), _sub_mod64(u_at_v, wv, q)
            )

        xs = [stage(x) for x in xs]
    for p in range(pair):
        x = xs[p]
        if inverse:
            # lazy stages keep [0, 2q); the full Harvey multiply by N^{-1}
            # canonicalises to [0, q) in both modes
            ninv = (ninv_ref[ch, 0], ninv_ref[ch, 1])
            ninvp = (ninvp_ref[ch, 0], ninvp_ref[ch, 1])
            x = _harvey64(x, ninv, ninvp, q)
        elif lazy:
            x = _reduce_4q_q64(x, q, two_q)
        o_ref[p, 0, 0] = x[0]
        o_ref[p, 0, 1] = x[1]


# ── factored row x lane twiddles (N > 2^14; see ntt_pallas.py for the
#    additive exponent-split derivation) ────────────────────────────────────


@functools.lru_cache(maxsize=32)
def _planes_factored_cached_wide(moduli: tuple[int, ...], degree: int):
    """Factored per-stage twiddles as limb pairs.

    Returns (fwd_rw, fwd_rwp, fwd_lw, fwd_lwp, inv_rw, inv_rwp, inv_lw,
    inv_lwp, q, ninv, ninvp): row factors uint32 (L, S, 2, R), lane
    factors (L, S, 2, C) (identity rows for stages with rep >= C).
    """
    from ..math.primes import find_primitive_root
    from .ntt import tree_exponent_stages

    n = degree
    two_n = 2 * n
    r_dim, c_dim = _layout(n)
    stages_e = tree_exponent_stages(n)
    S = len(stages_e)
    L = len(moduli)

    def split(v):
        return v & 0xFFFFFFFF, (v >> 32) & 0xFFFFFFFF

    def shoup(w, q):
        return (w << 64) // q

    shp_r, shp_c = (L, S, 2, r_dim), (L, S, 2, c_dim)
    fwd_rw = np.zeros(shp_r, np.uint32)
    fwd_rwp = np.zeros(shp_r, np.uint32)
    inv_rw = np.zeros(shp_r, np.uint32)
    inv_rwp = np.zeros(shp_r, np.uint32)
    fwd_lw = np.zeros(shp_c, np.uint32)
    fwd_lwp = np.zeros(shp_c, np.uint32)
    inv_lw = np.zeros(shp_c, np.uint32)
    inv_lwp = np.zeros(shp_c, np.uint32)
    # identity lanes: w = 1, wp = floor(2^64 / q)
    for li, q in enumerate(moduli):
        one_p = shoup(1, q)
        for limb in range(2):
            fwd_lw[li, :, limb] = split(1)[limb]
            fwd_lwp[li, :, limb] = split(one_p)[limb]
            inv_lw[li, :, limb] = split(1)[limb]
            inv_lwp[li, :, limb] = split(one_p)[limb]

    for li, q in enumerate(moduli):
        psi = find_primitive_root(q, two_n)
        for s, exps in enumerate(stages_e):
            rep = n >> s

            def fill(dst_w, dst_wp, es):
                ws = [pow(psi, e % two_n, q) for e in es]
                for limb in range(2):
                    dst_w[li, s, limb] = np.array(
                        [split(w)[limb] for w in ws], dtype=np.uint32
                    )
                    dst_wp[li, s, limb] = np.array(
                        [split(shoup(w, q))[limb] for w in ws],
                        dtype=np.uint32,
                    )

            if rep >= c_dim:
                rows_per_group = rep // c_dim
                row_e = [exps[r // rows_per_group] for r in range(r_dim)]
                fill(fwd_rw, fwd_rwp, row_e)
                fill(inv_rw, inv_rwp, [two_n - e for e in row_e])
            else:
                k = (c_dim // rep).bit_length() - 1
                row_e = [exps[r << k] for r in range(r_dim)]
                lane_e = [
                    (exps[c // rep] - exps[0]) % two_n for c in range(c_dim)
                ]
                fill(fwd_rw, fwd_rwp, row_e)
                fill(inv_rw, inv_rwp, [two_n - e for e in row_e])
                fill(fwd_lw, fwd_lwp, lane_e)
                fill(inv_lw, inv_lwp, [(two_n - e) % two_n for e in lane_e])

    pack2 = lambda vals: np.array(
        [split(int(v)) for v in vals], dtype=np.uint32
    )
    q_arr = pack2(moduli)
    ninv = pack2([pow(n, -1, q) for q in moduli])
    ninvp = pack2([shoup(pow(n, -1, q), q) for q in moduli])
    return (fwd_rw, fwd_rwp, fwd_lw, fwd_lwp, inv_rw, inv_rwp, inv_lw,
            inv_lwp, q_arr, ninv, ninvp)


def _tw_mul64(x, tw, q, lazy: bool = False):
    """Multiply u64 pairs by a (possibly factored) twiddle. Output in
    [0, 2q) when ``lazy`` (final conditional subtract skipped), canonical
    [0, q) otherwise."""
    rw, rwp, lw, lwp = tw
    if lw is None:
        return (_harvey64_lazy if lazy else _harvey64)(x, rw, rwp, q)
    t = _harvey64(x, rw, rwp, q)
    return (_harvey64_lazy if lazy else _harvey64)(t, lw, lwp, q)


def _tw_from_planes_wide(w_ref, wp_ref, r: int, c: int):
    """Stage-twiddle callback over expanded (1, S, 2, r, c) plane refs."""
    return lambda s: (
        (w_ref[0, s, 0].reshape(r, c), w_ref[0, s, 1].reshape(r, c)),
        (wp_ref[0, s, 0].reshape(r, c), wp_ref[0, s, 1].reshape(r, c)),
        None, None,
    )


def _tw_from_factors_wide(rw_ref, rwp_ref, lw_ref, lwp_ref, n: int, r: int,
                          c: int):
    """Stage-twiddle callback over factored (1, S, 2, R)/(1, S, 2, C)
    limb-pair refs."""

    def get(s):
        rep = n >> s
        rw = (rw_ref[0, s, 0].reshape(r, 1), rw_ref[0, s, 1].reshape(r, 1))
        rwp = (rwp_ref[0, s, 0].reshape(r, 1),
               rwp_ref[0, s, 1].reshape(r, 1))
        if rep >= c:
            return (rw, rwp, None, None)
        lw = (lw_ref[0, s, 0].reshape(1, c), lw_ref[0, s, 1].reshape(1, c))
        lwp = (lwp_ref[0, s, 0].reshape(1, c),
               lwp_ref[0, s, 1].reshape(1, c))
        return (rw, rwp, lw, lwp)

    return get


def _ntt_kernel_fac_wide(q_ref, ninv_ref, ninvp_ref, x_ref, rw_ref, rwp_ref,
                         lw_ref, lwp_ref, o_ref,
                         *, n: int, r: int, c: int, inverse: bool,
                         lazy: bool, pair: int = 1):
    ch = pl.program_id(0)
    q = (q_ref[ch, 0], q_ref[ch, 1])
    two_q = add64(q, q)
    xs = [(x_ref[p, 0, 0], x_ref[p, 0, 1]) for p in range(pair)]
    get_tw = _tw_from_factors_wide(rw_ref, rwp_ref, lw_ref, lwp_ref, n, r, c)
    s_count = n.bit_length() - 1
    stage_order = range(s_count - 1, -1, -1) if inverse else range(s_count)
    for s in stage_order:
        d = n >> (s + 1)
        axis, amount, mask = _butterfly_args(n, r, c, d)
        tw = get_tw(s)

        def stage(x):
            if lazy:
                return (_inv_stage_lazy64 if inverse else
                        _fwd_stage_lazy64)(x, tw, q, two_q, axis, amount,
                                           mask)
            shift2 = lambda v, a: (
                _shift(v[0], a, axis), _shift(v[1], a, axis)
            )
            v_at_u = shift2(x, amount)
            u_at_v = shift2(x, -amount)
            if inverse:
                total = _add_mod64(x, v_at_u, q)
                diff = _sub_mod64(u_at_v, x, q)
                wv = _tw_mul64(diff, tw, q)
                return select64(mask, total, wv)
            operand = select64(mask, v_at_u, x)
            wv = _tw_mul64(operand, tw, q)
            return select64(
                mask, _add_mod64(x, wv, q), _sub_mod64(u_at_v, wv, q)
            )

        xs = [stage(x) for x in xs]
    for p in range(pair):
        x = xs[p]
        if inverse:
            ninv = (ninv_ref[ch, 0], ninv_ref[ch, 1])
            ninvp = (ninvp_ref[ch, 0], ninvp_ref[ch, 1])
            x = _harvey64(x, ninv, ninvp, q)
        elif lazy:
            x = _reduce_4q_q64(x, q, two_q)
        o_ref[p, 0, 0] = x[0]
        o_ref[p, 0, 1] = x[1]


@functools.partial(
    jax.jit, static_argnames=("moduli", "degree", "inverse", "interpret")
)
def _ntt_factored_wide(data, moduli: tuple, degree: int, inverse: bool,
                       interpret: bool = False):
    moduli = tuple(int(m) for m in moduli)
    tabs = _planes_factored_cached_wide(moduli, degree)
    (fwd_rw, fwd_rwp, fwd_lw, fwd_lwp, inv_rw, inv_rwp, inv_lw, inv_lwp,
     q, ninv, ninvp) = tabs
    rw, rwp, lw, lwp = (
        (inv_rw, inv_rwp, inv_lw, inv_lwp) if inverse
        else (fwd_rw, fwd_rwp, fwd_lw, fwd_lwp)
    )
    n = degree
    r, c = _layout(n)
    lead = data.shape[:-3]
    L = data.shape[-3]
    x = data.reshape(-1, L, 2, r, c)
    outer = x.shape[0]
    s_count = n.bit_length() - 1
    # 2-limb planes: ~12 u32 planes of live state per item (in+out+stage
    # temporaries, two limbs each); factored twiddles are negligible
    pair = _auto_pair(outer, n, 12, env="CKKS_NTT_PAIR", fixed_planes=0)

    kernel = functools.partial(
        _ntt_kernel_fac_wide, n=n, r=r, c=c, inverse=inverse,
        lazy=lazy_ok_wide(moduli), pair=pair,
    )
    smem = lambda: pl.BlockSpec(
        (L, 2), lambda ch, o: (0, 0), memory_space=pltpu.SMEM
    )
    data_spec = lambda: pl.BlockSpec(
        (pair, 1, 2, r, c), lambda ch, o: (o, ch, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    fac_spec = lambda dim: pl.BlockSpec(
        (1, s_count, 2, dim), lambda ch, o: (ch, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        kernel,
        grid=(L, outer // pair),
        in_specs=[
            smem(), smem(), smem(),
            data_spec(),
            fac_spec(r), fac_spec(r), fac_spec(c), fac_spec(c),
        ],
        out_specs=data_spec(),
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.uint32),
        interpret=interpret,
    )(q, ninv, ninvp, x, rw, rwp, lw, lwp)
    return out.reshape(*lead, L, 2, n)


@functools.partial(
    jax.jit, static_argnames=("moduli", "degree", "inverse", "interpret")
)
def ntt_pallas_wide(data, moduli: tuple, degree: int, inverse: bool,
                    interpret: bool = False):
    """Drop-in NTT on (..., L, 2, N) uint32 limb data (generic chains).
    N > 2^14 routes to the factored row x lane twiddle kernel."""
    moduli = tuple(int(m) for m in moduli)
    if _use_factored_wide(degree):
        return _ntt_factored_wide(
            data, moduli, degree, inverse, interpret=interpret
        )
    fwd_w, fwd_wp, inv_w, inv_wp, q, ninv, ninvp = _planes_cached_wide(
        moduli, degree
    )
    w_pl, wp_pl = (inv_w, inv_wp) if inverse else (fwd_w, fwd_wp)

    n = degree
    r, c = _layout(n)
    lead = data.shape[:-3]
    L = data.shape[-3]
    x = data.reshape(-1, L, 2, r, c)
    outer = x.shape[0]
    s_count = n.bit_length() - 1
    # ~12 live u32 planes per 2-limb item; the expanded per-channel
    # twiddle block is a FIXED per-grid-step cost: (w, wp) x 2 limbs x
    # S stages of u32 planes (see _auto_pair's double-buffer model)
    pair = _auto_pair(
        outer, n, 12, env="CKKS_NTT_PAIR", fixed_planes=4 * s_count
    )

    kernel = functools.partial(
        _ntt_kernel_wide, n=n, r=r, c=c, inverse=inverse,
        lazy=lazy_ok_wide(moduli), pair=pair,
    )
    smem = lambda: pl.BlockSpec(
        (L, 2), lambda ch, o: (0, 0), memory_space=pltpu.SMEM
    )
    data_spec = lambda: pl.BlockSpec(
        (pair, 1, 2, r, c), lambda ch, o: (o, ch, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    plane_spec = lambda: pl.BlockSpec(
        (1, s_count, 2, r, c), lambda ch, o: (ch, 0, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        kernel,
        grid=(L, outer // pair),
        in_specs=[
            smem(),
            smem(),
            smem(),
            data_spec(),
            plane_spec(),
            plane_spec(),
        ],
        out_specs=data_spec(),
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.uint32),
        interpret=interpret,
    )(q, ninv, ninvp, x, w_pl.reshape(L, s_count, 2, r, c),
      wp_pl.reshape(L, s_count, 2, r, c))
    return out.reshape(*lead, L, 2, n)
