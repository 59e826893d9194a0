"""Fused negacyclic NTT as a single Pallas TPU kernel (small-prime path).

The staged jnp NTT in ``ntt.py`` materialises the full (L, N) residue plane
in HBM between every one of the log2(N) stages. This kernel instead loads
one channel's coefficient plane into VMEM once, runs *all* stages in
registers/VMEM, and writes the result once — cutting HBM traffic by ~log2(N).

Formulation
-----------
Both directions of the CRT-tree NTT (see ntt.py) are sequences of in-place
distance-d butterflies on the flat array: at stage with distance d, element
p pairs with p ^ d inside groups of 2d, and the group's twiddle w is constant
across the group:

    forward (d = N/2 ... 1):   out[u] = x[u] + w*x[v];  out[v] = x[u] - w*x[v]
    inverse (d = 1 ... N/2):   out[u] = x[u] + x[v];    out[v] = (x[u] - x[v])*w

With coefficients laid out as an (R, C) matrix (p = r*C + c, C a multiple of
128 lanes), a distance-d butterfly needs only a *static circular shift*:
  - d >= C: partner is d//C rows away  -> shift along the sublane axis
  - d <  C: partner is d lanes away    -> shift along the lane axis
so every stage is two shifts, one Montgomery multiply, one add, one subtract
and a select — no reshapes, no gathers, no bit-reversal (reference keeps an
explicit bit_reverse_permute + twist pass, src/rings/backends/rns_ntt/
poly.rs:574-625; that formulation is gather-heavy and was rejected for TPU).

Twiddles are pre-expanded host-side to one full (N,)-plane per stage
(stage s has 2^s distinct values, each repeated N/2^s times), stacked as a
(L, S, N) array. The grid is (channel, outer) with ``outer`` innermost, so
the per-channel twiddle block is fetched into VMEM once and reused across
every polynomial of that channel (batch elements, gadget digits).

This kernel covers chains with all primes < 2^31 (Montgomery radix 2^32,
single u32 limb) — the default configuration. Wider chains fall back to the
staged jnp path.
"""

from __future__ import annotations

import os
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_MASK16 = 0xFFFF


def _layout(n: int) -> tuple[int, int]:
    """(rows, cols) 2D layout for an N-point plane; cols multiple of 128."""
    c = _LANES
    while n // c > 512 and c < 1024:
        c *= 2
    return n // c, c


def supported(degree: int, small: bool) -> bool:
    """Small chains, power-of-two N in [2^10, 2^16].

    N <= 2^15 uses fully expanded per-stage twiddle planes; N = 2^16 uses
    the factored row x lane twiddle kernel (the expanded planes exceed
    VMEM there — per stage the (N,) plane splits into a (R,) row factor
    and a (C,) lane factor whose product is the plane, costing one extra
    Harvey multiply per deep-stage butterfly)."""
    return (
        small
        and 1024 <= degree <= (1 << 16)
        and degree & (degree - 1) == 0
    )


def _use_factored(degree: int) -> bool:
    return degree > (1 << 15)


# ── host-side twiddle plane expansion ────────────────────────────────────────


@functools.lru_cache(maxsize=64)
def _planes_cached(moduli: tuple[int, ...], degree: int):
    """Expanded per-stage twiddle planes for Harvey/Shoup multiplication.

    Twiddles are stored as *plain* values w plus their Shoup precomputation
    w' = floor(w * 2^32 / q); multiplying Montgomery-form data by a plain
    constant keeps the data in Montgomery form, so the NTT is transparent to
    the rest of the (Montgomery-resident) pipeline and bit-exact against the
    staged jnp path. The inverse's final N^{-1} scaling is a separate
    elementwise pass with its own (n_inv, n_inv') pair.

    Returns (fwd_w, fwd_wp, inv_w, inv_wp, q, ninv, ninvp): planes are
    uint32 (L, S, N); q/ninv/ninvp are uint32 (L, 1).
    """
    from ..math.primes import find_primitive_root
    from .ntt import tree_exponent_stages

    n = degree
    two_n = 2 * n
    stages_e = tree_exponent_stages(n)
    s_count = len(stages_e)
    L = len(moduli)

    def shoup(w: int, q: int) -> int:
        return (w << 32) // q

    fwd_w = np.empty((L, s_count, n), dtype=np.uint32)
    fwd_wp = np.empty((L, s_count, n), dtype=np.uint32)
    inv_w = np.empty((L, s_count, n), dtype=np.uint32)
    inv_wp = np.empty((L, s_count, n), dtype=np.uint32)
    for li, q in enumerate(moduli):
        psi = find_primitive_root(q, two_n)
        for s, exps in enumerate(stages_e):
            rep = n // len(exps)

            def fill(dst_w, dst_wp, vals):
                ws = np.array(vals, dtype=np.uint64)
                wps = np.array([shoup(int(w), q) for w in vals],
                               dtype=np.uint64)
                dst_w[li, s] = np.repeat(ws, rep).astype(np.uint32)
                dst_wp[li, s] = np.repeat(wps, rep).astype(np.uint32)

            fill(fwd_w, fwd_wp, [pow(psi, e, q) for e in exps])
            fill(inv_w, inv_wp, [pow(psi, two_n - e, q) for e in exps])

    q_arr = np.array([[q] for q in moduli], dtype=np.uint32)
    ninv_arr = np.array(
        [[pow(n, -1, q)] for q in moduli], dtype=np.uint32
    )
    ninvp_arr = np.array(
        [[shoup(pow(n, -1, q), q)] for q in moduli], dtype=np.uint32
    )
    # numpy (not jnp) so the lru_cache never captures traced constants
    return fwd_w, fwd_wp, inv_w, inv_wp, q_arr, ninv_arr, ninvp_arr


# ── kernel building blocks (single u32 limb, q < 2^31) ──────────────────────


def _umul32_hi(a, b):
    """High 32 bits of the 32x32 product, from 16-bit halves."""
    a0 = a & _MASK16
    a1 = a >> 16
    b0 = b & _MASK16
    b1 = b >> 16
    lh = a0 * b1
    hl = a1 * b0
    t = ((a0 * b0) >> 16) + (lh & _MASK16) + (hl & _MASK16)
    return a1 * b1 + (lh >> 16) + (hl >> 16) + (t >> 16)


def _harvey_mul(x, w, wp, q):
    """x * w mod q via Shoup precomputation wp = floor(w * 2^32 / q).

    Valid for any x < 2^32, w < q < 2^31 (Harvey's lazy modmul); the
    conditional subtract brings the [0, 2q) intermediate into [0, q).
    """
    h = _umul32_hi(x, wp)
    r = x * w - h * q  # wrapping u32; in [0, 2q)
    return jnp.where(r >= q, r - q, r)


def _harvey_mul_lazy(x, w, wp, q):
    """Harvey modmul WITHOUT the final reduction: output in [0, 2q)."""
    h = _umul32_hi(x, wp)
    return x * w - h * q


def _add_mod(a, b, q):
    s = a + b
    return jnp.where(s >= q, s - q, s)


def _sub_mod(a, b, q):
    return jnp.where(a >= b, a - b, a + q - b)


# Experiment knob: CKKS_SHIFT_CONCAT in {"", "rows", "lanes", "both"}
# replaces pltpu.roll with a concatenate-of-slices formulation on the
# named axes (read once at import; kernels compile per-process).
_SHIFT_CONCAT = os.environ.get("CKKS_SHIFT_CONCAT", "")

# Movement formulation: "roll" (two opposite circular shifts per stage)
# or "swap" (sublane-axis stages use ONE partner swap — the p <-> p^d
# exchange is a half-roll of a reshaped (r/2d, 2d, c) view, and one
# array serves both butterfly sides). Read once at import.
_NTT_MOVE = os.environ.get("CKKS_NTT_MOVE", "roll")


def _shift(x, amount: int, axis: int, use_roll: bool | None = None):
    """Static circular shift: element i of the output = x[i + amount]."""
    if use_roll is None:
        name = "rows" if axis == 0 else "lanes"
        use_roll = _SHIFT_CONCAT not in (name, "both")
    if use_roll:
        size = x.shape[axis]
        return pltpu.roll(x, (-amount) % size, axis)
    if axis == 0:
        return jnp.concatenate([x[amount:], x[:amount]], axis=0)
    return jnp.concatenate([x[:, amount:], x[:, :amount]], axis=1)


def _swap_rows(x, dr: int):
    """Partner swap p <-> p XOR dr along the sublane axis: ONE block move.

    Groups of 2*dr rows swap their halves — a half-roll of the reshaped
    (r/(2 dr), 2 dr, c) view (leading-axis reshapes are free; the concat
    is a sublane copy). The swapped array carries the partner value at
    BOTH butterfly sides, replacing the two opposite-direction rolls of
    the roll formulation."""
    r, c = x.shape
    x3 = x.reshape(r // (2 * dr), 2 * dr, c)
    s3 = pltpu.roll(x3, dr, 1)
    return s3.reshape(r, c)


def _partners(x_fwd, x_back, axis: int, amount: int):
    """(partner_at_u, partner_at_v) for a distance-``amount`` butterfly.

    Roll mode: two opposite circular shifts (x_fwd feeds the u-side
    multiply operand, x_back the v-side add/sub operand). Swap mode,
    sublane axis only: one ``_swap_rows`` of x_back serves both sides —
    the u-side operand is then the *reduced* partner, which is the same
    value mod q (any u32 is a valid Harvey input), so the kernel's final
    canonical output is unchanged."""
    if axis == 0 and _NTT_MOVE == "swap":
        s = _swap_rows(x_back, amount)
        return s, s
    return _shift(x_fwd, amount, axis), _shift(x_back, -amount, axis)


def _mask_u(r: int, c: int, d: int):
    """True at butterfly 'u' positions for distance d in an (r, c) layout."""
    if d >= c:
        dr = d // c
        rows = jax.lax.broadcasted_iota(jnp.int32, (r, c), 0)
        return (rows % (2 * dr)) < dr
    cols = jax.lax.broadcasted_iota(jnp.int32, (r, c), 1)
    return (cols % (2 * d)) < d


def _butterfly_args(n: int, r: int, c: int, d: int):
    axis = 0 if d >= c else 1
    amount = d // c if d >= c else d
    return axis, amount, _mask_u(r, c, d)


def _fwd_stage_lazy(x, w, wp, q, axis: int, amount: int, mask):
    """Forward butterfly, Harvey-lazy: [0, 4q) invariant, q < 2^30.

    The partner value feeding the twiddle multiply may be unreduced (any
    u32 is a valid Harvey input); only the 'u' operand of the add/sub is
    conditionally brought below 2q, so each stage costs one conditional
    subtract instead of three.
    """
    xr = jnp.where(x >= 2 * q, x - 2 * q, x)  # < 2q
    v_at_u, u_at_v = _partners(x, xr, axis, amount)
    operand = jnp.where(mask, v_at_u, x)
    t = _harvey_mul_lazy(operand, w, wp, q)  # < 2q
    return jnp.where(mask, xr + t, u_at_v + 2 * q - t)  # < 4q


def _inv_stage_lazy(x, w, wp, q, axis: int, amount: int, mask):
    """Inverse (GS) butterfly, Harvey-lazy: [0, 2q) invariant."""
    v_at_u, u_at_v = _partners(x, x, axis, amount)
    total = x + v_at_u  # < 4q at u positions
    total = jnp.where(total >= 2 * q, total - 2 * q, total)
    diff = u_at_v + 2 * q - x  # < 4q at v positions
    t = _harvey_mul_lazy(diff, w, wp, q)  # < 2q
    return jnp.where(mask, total, t)


def _reduce_2q_q(x, q):
    """[0, 4q) -> canonical [0, q)."""
    x = jnp.where(x >= 2 * q, x - 2 * q, x)
    return jnp.where(x >= q, x - q, x)


# ── factored row x lane twiddles (N > 2^15: expanded planes exceed VMEM) ─────
#
# Stage s repeats each of its 2^s twiddles over a group of rep = N/2^s
# consecutive positions. In the (R, C) layout, when rep >= C the twiddle is
# a function of the row alone -> an (R,) column factor. When rep < C the
# group index g splits as (r << k) | (c // rep) with 2^k = C/rep, and the
# CRT-tree exponents satisfy the additive split
#     e[(r << k) | g_lo] == e[r << k] + e[g_lo] - e[0]   (mod 2N)
# so the twiddle plane is an outer product of an (R,) row factor
# psi^{e[r<<k]} and a (C,) lane factor psi^{e[c//rep]-e[0]} — one extra
# Harvey multiply per deep-stage butterfly instead of an (N,) plane.


def _tw_mul(x, tw, q, lazy: bool):
    """Multiply by a (possibly factored) twiddle. tw = (rw, rwp, lw, lwp);
    lw None -> single Harvey by the row factor. Output [0, 2q) when lazy,
    canonical [0, q) otherwise. x may be any u32 (Harvey domain)."""
    rw, rwp, lw, lwp = tw
    if lw is None:
        return _harvey_mul_lazy(x, rw, rwp, q) if lazy else _harvey_mul(
            x, rw, rwp, q
        )
    t = _harvey_mul(x, rw, rwp, q)
    return _harvey_mul_lazy(t, lw, lwp, q) if lazy else _harvey_mul(
        t, lw, lwp, q
    )


def _fwd_stage_lazy_tw(x, tw, q, axis: int, amount: int, mask):
    """Forward butterfly with factored-twiddle support ([0, 4q) lazy)."""
    xr = jnp.where(x >= 2 * q, x - 2 * q, x)  # < 2q
    v_at_u, u_at_v = _partners(x, xr, axis, amount)
    operand = jnp.where(mask, v_at_u, x)
    t = _tw_mul(operand, tw, q, lazy=True)  # < 2q
    return jnp.where(mask, xr + t, u_at_v + 2 * q - t)  # < 4q


def _inv_stage_lazy_tw(x, tw, q, axis: int, amount: int, mask):
    """Inverse (GS) butterfly with factored-twiddle support ([0, 2q))."""
    v_at_u, u_at_v = _partners(x, x, axis, amount)
    total = x + v_at_u
    total = jnp.where(total >= 2 * q, total - 2 * q, total)
    diff = u_at_v + 2 * q - x  # < 4q
    t = _tw_mul(diff, tw, q, lazy=True)  # < 2q
    return jnp.where(mask, total, t)


def _fwd_stages_tw_multi(xs, tw_for_stage, q, n: int, r: int, c: int,
                         lazy: bool):
    """All forward butterfly stages on MANY VMEM-resident planes.

    ``tw_for_stage(s)`` returns the stage's twiddle as a ``(rw, rwp, lw,
    lwp)`` tuple (``lw is None`` -> single Harvey by ``rw``, which may be a
    full (r, c) plane or an (r, 1) row factor). Shared by the fused
    key-switch and mod-down kernels so both the expanded-plane (N <= 2^15)
    and factored row x lane (N = 2^16) twiddle forms drive the same
    butterfly arithmetic. Stage-outer, plane-inner: the planes are
    independent dependency chains the scheduler interleaves (the serial
    stage chain on one plane is latency-bound). Output canonical [0, q).
    """
    for s in range(n.bit_length() - 1):
        d = n >> (s + 1)
        axis, amount, mask = _butterfly_args(n, r, c, d)
        tw = tw_for_stage(s)
        if lazy:
            xs = [
                _fwd_stage_lazy_tw(x, tw, q, axis, amount, mask) for x in xs
            ]
            continue

        def plain(x):
            v_at_u, u_at_v = _partners(x, x, axis, amount)
            operand = jnp.where(mask, v_at_u, x)
            wv = _tw_mul(operand, tw, q, lazy=False)
            return jnp.where(
                mask, _add_mod(x, wv, q), _sub_mod(u_at_v, wv, q)
            )

        xs = [plain(x) for x in xs]
    if lazy:
        xs = [_reduce_2q_q(x, q) for x in xs]  # canonical for consumers
    return xs


def _fwd_stages_tw(x, tw_for_stage, q, n: int, r: int, c: int, lazy: bool):
    """Single-plane wrapper of ``_fwd_stages_tw_multi``."""
    return _fwd_stages_tw_multi([x], tw_for_stage, q, n, r, c, lazy)[0]


def _auto_pair(outer: int, degree: int, planes_per_item: int,
               env: str = "CKKS_FUSED_PAIR", fixed_planes: int = 0) -> int:
    """Items-per-grid-step pairing for the fused composite kernels.

    Largest p in {4, 2, 1} dividing ``outer`` whose TOTAL scoped-VMEM
    footprint fits: Mosaic stacks every VMEM operand block double-buffered
    (grid pipelining), so the model is

        2 * (fixed_planes + p * planes_per_item) * N * 4  <=  ~15 MB

    against the 16 MB scoped-VMEM limit. ``fixed_planes`` counts the
    per-grid-step blocks that do NOT scale with p (expanded twiddle
    planes, key blocks); ``planes_per_item`` the per-item data planes and
    stage temporaries. Round-4 regression pinned by this model: the
    key-switch kernel at N=2^15, digit_size=1 (fixed = 2*15 twiddle +
    2*4 key planes) overflowed at pair=2 with the old per-item-only 6 MB
    budget — 18.29 M scoped vs the 16 M limit, exactly the ~2x
    double-buffer factor this accounts for. The budget is calibrated so
    every previously-working pairing is preserved (2^14 ds4 key-switch
    pair=4 models at 14.5 M and runs; the N=2^16 factored composite
    stays at pair=1). The pairing itself is the
    latency-bound-stage-chain optimisation (measured ~10%/channel-NTT at
    pair=4, N=2^14). ``env`` overrides (0/1 disables)."""
    v = os.environ.get(env)
    if v:
        p = int(v)
        return p if p >= 1 and outer % p == 0 else 1
    budget = (148 << 20) // 10  # 14.8 MB: 1.2 MB headroom under the limit
    plane = degree * 4
    for p in (4, 2):
        if (
            outer % p == 0
            and 2 * (fixed_planes + p * planes_per_item) * plane <= budget
        ):
            return p
    return 1


def _tw_from_planes(w_ref, wp_ref, r: int, c: int):
    """Stage-twiddle callback over expanded (1, S, r, c) plane refs."""
    return lambda s: (
        w_ref[0, s].reshape(r, c), wp_ref[0, s].reshape(r, c), None, None
    )


def _tw_from_factors(rw_ref, rwp_ref, lw_ref, lwp_ref, n: int, r: int,
                     c: int):
    """Stage-twiddle callback over factored (1, S, R)/(1, S, C) refs."""

    def get(s):
        rep = n >> s
        rw = rw_ref[0, s].reshape(r, 1)
        rwp = rwp_ref[0, s].reshape(r, 1)
        if rep >= c:
            return (rw, rwp, None, None)
        return (rw, rwp, lw_ref[0, s].reshape(1, c),
                lwp_ref[0, s].reshape(1, c))

    return get


@functools.lru_cache(maxsize=32)
def _planes_factored_cached(moduli: tuple[int, ...], degree: int):
    """Factored per-stage twiddles + Shoup companions.

    Returns (fwd_rw, fwd_rwp, fwd_lw, fwd_lwp, inv_rw, inv_rwp, inv_lw,
    inv_lwp, q, ninv, ninvp): row factors uint32 (L, S, R), lane factors
    uint32 (L, S, C) (identity rows for stages with rep >= C).
    """
    from ..math.primes import find_primitive_root
    from .ntt import tree_exponent_stages

    n = degree
    two_n = 2 * n
    r_dim, c_dim = _layout(n)
    stages_e = tree_exponent_stages(n)
    S = len(stages_e)
    L = len(moduli)

    def shoup(w: int, q: int) -> int:
        return (w << 32) // q

    shp_r, shp_c = (L, S, r_dim), (L, S, c_dim)
    fwd_rw = np.empty(shp_r, np.uint32)
    fwd_rwp = np.empty(shp_r, np.uint32)
    inv_rw = np.empty(shp_r, np.uint32)
    inv_rwp = np.empty(shp_r, np.uint32)
    fwd_lw = np.ones(shp_c, np.uint32)
    fwd_lwp = np.zeros(shp_c, np.uint32)
    inv_lw = np.ones(shp_c, np.uint32)
    inv_lwp = np.zeros(shp_c, np.uint32)
    for li, q in enumerate(moduli):
        psi = find_primitive_root(q, two_n)
        for s, exps in enumerate(stages_e):
            rep = n >> s

            def fill(dst_w, dst_wp, idx, es):
                vals = np.array([pow(psi, e % two_n, q) for e in es],
                                dtype=np.uint64)
                wps = np.array([shoup(int(w), q) for w in vals],
                               dtype=np.uint64)
                dst_w[li, s] = vals[idx].astype(np.uint32)
                dst_wp[li, s] = wps[idx].astype(np.uint32)

            if rep >= c_dim:
                rows_per_group = rep // c_dim
                ridx = np.arange(r_dim) // rows_per_group
                fill(fwd_rw, fwd_rwp, ridx, exps)
                fill(inv_rw, inv_rwp, ridx, [two_n - e for e in exps])
            else:
                k = (c_dim // rep).bit_length() - 1
                ridx = np.arange(r_dim)
                row_e = [exps[r << k] for r in range(r_dim)]
                lane_e = [
                    (exps[c // rep] - exps[0]) % two_n for c in range(c_dim)
                ]
                fill(fwd_rw, fwd_rwp, ridx, row_e)
                fill(inv_rw, inv_rwp, ridx, [two_n - e for e in row_e])
                cidx = np.arange(c_dim)
                fill(fwd_lw, fwd_lwp, cidx, lane_e)
                fill(inv_lw, inv_lwp, cidx,
                     [(two_n - e) % two_n for e in lane_e])

    q_arr = np.array([[q] for q in moduli], dtype=np.uint32)
    ninv_arr = np.array([[pow(n, -1, q)] for q in moduli], dtype=np.uint32)
    ninvp_arr = np.array(
        [[shoup(pow(n, -1, q), q)] for q in moduli], dtype=np.uint32
    )
    return (fwd_rw, fwd_rwp, fwd_lw, fwd_lwp, inv_rw, inv_rwp, inv_lw,
            inv_lwp, q_arr, ninv_arr, ninvp_arr)


def _ntt_kernel_fac(q_ref, ninv_ref, ninvp_ref, x_ref, rw_ref, rwp_ref,
                    lw_ref, lwp_ref, o_ref,
                    *, n: int, r: int, c: int, inverse: bool, lazy: bool,
                    pair: int = 1):
    ch = pl.program_id(0)
    q = q_ref[ch, 0]
    xs = [x_ref[p, 0] for p in range(pair)]
    s_count = n.bit_length() - 1
    stage_order = range(s_count - 1, -1, -1) if inverse else range(s_count)
    for s in stage_order:
        d = n >> (s + 1)
        axis, amount, mask = _butterfly_args(n, r, c, d)
        rep = n >> s
        rw = rw_ref[0, s].reshape(r, 1)
        rwp = rwp_ref[0, s].reshape(r, 1)
        if rep >= c:
            tw = (rw, rwp, None, None)
        else:
            tw = (rw, rwp, lw_ref[0, s].reshape(1, c),
                  lwp_ref[0, s].reshape(1, c))

        def stage(x):
            if lazy:
                return (_inv_stage_lazy_tw if inverse else
                        _fwd_stage_lazy_tw)(x, tw, q, axis, amount, mask)
            v_at_u, u_at_v = _partners(x, x, axis, amount)
            if inverse:
                total = _add_mod(x, v_at_u, q)
                diff = _sub_mod(u_at_v, x, q)
                return jnp.where(
                    mask, total, _tw_mul(diff, tw, q, lazy=False)
                )
            operand = jnp.where(mask, v_at_u, x)
            wv = _tw_mul(operand, tw, q, lazy=False)
            return jnp.where(
                mask, _add_mod(x, wv, q), _sub_mod(u_at_v, wv, q)
            )

        xs = [stage(x) for x in xs]
    for p in range(pair):
        x = xs[p]
        if inverse:
            x = _harvey_mul(x, ninv_ref[ch, 0], ninvp_ref[ch, 0], q)
        elif lazy:
            x = _reduce_2q_q(x, q)
        o_ref[p, 0] = x


def _ntt_kernel(q_ref, ninv_ref, ninvp_ref, x_ref, w_ref, wp_ref, o_ref,
                *, n: int, r: int, c: int, inverse: bool, lazy: bool,
                pair: int = 1):
    """``pair`` > 1 processes that many independent planes per grid step
    (same twiddles), giving the compiler independent dependency chains to
    interleave — the 14 serial stages are latency-bound on one plane."""
    ch = pl.program_id(0)
    q = q_ref[ch, 0]
    xs = [x_ref[p, 0] for p in range(pair)]
    s_count = n.bit_length() - 1
    stage_order = range(s_count - 1, -1, -1) if inverse else range(s_count)
    for s in stage_order:
        d = n >> (s + 1)
        axis, amount, mask = _butterfly_args(n, r, c, d)
        w = w_ref[0, s].reshape(r, c)
        wp = wp_ref[0, s].reshape(r, c)

        def stage(x):
            if lazy and inverse:
                return _inv_stage_lazy(x, w, wp, q, axis, amount, mask)
            if lazy:
                return _fwd_stage_lazy(x, w, wp, q, axis, amount, mask)
            v_at_u, u_at_v = _partners(x, x, axis, amount)
            if inverse:
                total = _add_mod(x, v_at_u, q)  # at u: x[u] + x[v]
                diff = _sub_mod(u_at_v, x, q)  # at v: x[u] - x[v]
                return jnp.where(mask, total, _harvey_mul(diff, w, wp, q))
            operand = jnp.where(mask, v_at_u, x)  # x[v] everywhere
            wv = _harvey_mul(operand, w, wp, q)
            return jnp.where(
                mask, _add_mod(x, wv, q), _sub_mod(u_at_v, wv, q)
            )

        xs = [stage(x) for x in xs]
    for p in range(pair):
        x = xs[p]
        if inverse:
            # lazy stages keep [0, 2q); the full Harvey multiply by N^{-1}
            # canonicalises to [0, q) in both modes
            x = _harvey_mul(x, ninv_ref[ch, 0], ninvp_ref[ch, 0], q)
        elif lazy:
            x = _reduce_2q_q(x, q)
        o_ref[p, 0] = x


# ── pallas_call wrapper ──────────────────────────────────────────────────────


@functools.partial(
    jax.jit, static_argnames=("degree", "inverse", "interpret", "lazy")
)
def _ntt_planes_call(lo, w_planes, wp_planes, q, ninv, ninvp, *, degree: int,
                     inverse: bool, interpret: bool = False,
                     lazy: bool = False):
    """lo: uint32 (..., L, N) Montgomery residues -> same shape/order."""
    n = degree
    r, c = _layout(n)
    lead = lo.shape[:-2]
    L = lo.shape[-2]
    x = lo.reshape(-1, L, r, c)
    outer = x.shape[0]
    s_count = n.bit_length() - 1
    # multi-plane grid steps: the 14 serial stages on one plane are
    # latency-bound; independent planes give the scheduler parallel
    # dependency chains (measured ~10% per-channel-NTT win at pair=4,
    # N=2^14; 8/16 regress on VMEM pressure)
    pair_env = os.environ.get("CKKS_NTT_PAIR")
    if pair_env:
        pair = int(pair_env)
    else:
        pair = 4 if outer % 4 == 0 else (2 if outer % 2 == 0 else 1)
    if pair < 1 or outer % pair:
        pair = 1

    kernel = functools.partial(
        _ntt_kernel, n=n, r=r, c=c, inverse=inverse, lazy=lazy, pair=pair
    )
    smem = lambda: pl.BlockSpec(
        (L, 1), lambda ch, o: (0, 0), memory_space=pltpu.SMEM
    )
    data_spec = lambda: pl.BlockSpec(
        (pair, 1, r, c), lambda ch, o: (o, ch, 0, 0),
        memory_space=pltpu.VMEM,
    )
    plane_spec = lambda: pl.BlockSpec(
        (1, s_count, r, c),
        lambda ch, o: (ch, 0, 0, 0),
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
    )(
        q,
        ninv,
        ninvp,
        x,
        w_planes.reshape(L, s_count, r, c),
        wp_planes.reshape(L, s_count, r, c),
    )
    return out.reshape(*lead, L, n)


@functools.partial(
    jax.jit, static_argnames=("degree", "inverse", "interpret", "lazy")
)
def _ntt_factored_call(lo, rw, rwp, lw, lwp, q, ninv, ninvp, *, degree: int,
                       inverse: bool, interpret: bool = False,
                       lazy: bool = False):
    """Factored-twiddle NTT call: lo uint32 (..., L, N) -> same shape."""
    n = degree
    r, c = _layout(n)
    lead = lo.shape[:-2]
    L = lo.shape[-2]
    x = lo.reshape(-1, L, r, c)
    outer = x.shape[0]
    s_count = n.bit_length() - 1
    # multi-plane grid steps, same latency-bound-stage-chain argument as
    # _ntt_planes_call; factored twiddles are tiny, so only the data planes
    # and stage temporaries (~6 planes/item) count against VMEM
    pair = _auto_pair(outer, n, 6, env="CKKS_NTT_PAIR")

    kernel = functools.partial(
        _ntt_kernel_fac, n=n, r=r, c=c, inverse=inverse, lazy=lazy,
        pair=pair,
    )
    smem = lambda: pl.BlockSpec(
        (L, 1), lambda ch, o: (0, 0), memory_space=pltpu.SMEM
    )
    data_spec = lambda: pl.BlockSpec(
        (pair, 1, r, c), lambda ch, o: (o, ch, 0, 0),
        memory_space=pltpu.VMEM,
    )
    fac_spec = lambda dim: pl.BlockSpec(
        (1, s_count, dim), lambda ch, o: (ch, 0, 0),
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
    return out.reshape(*lead, L, n)


def ntt_pallas(data: jnp.ndarray, moduli: tuple[int, ...], degree: int,
               inverse: bool, interpret: bool = False) -> jnp.ndarray:
    """Drop-in NTT on (..., L, 2, N) uint32 limb data (hi limbs zero).

    Semantics identical to ``ntt.forward_ntt`` / ``ntt.inverse_ntt`` for
    small chains: Montgomery-form residues, tree-order NTT domain.
    N > 2^15 routes to the factored row x lane twiddle kernel.
    """
    lo = data[..., 0, :]
    if _use_factored(degree):
        tabs = _planes_factored_cached(tuple(moduli), degree)
        (fwd_rw, fwd_rwp, fwd_lw, fwd_lwp, inv_rw, inv_rwp, inv_lw,
         inv_lwp, q, ninv, ninvp) = tabs
        rw, rwp, lw, lwp = (
            (inv_rw, inv_rwp, inv_lw, inv_lwp) if inverse
            else (fwd_rw, fwd_rwp, fwd_lw, fwd_lwp)
        )
        out_lo = _ntt_factored_call(
            lo, rw, rwp, lw, lwp, q, ninv, ninvp,
            degree=degree, inverse=inverse, interpret=interpret,
            lazy=lazy_ok(moduli),
        )
        return jnp.stack([out_lo, jnp.zeros_like(out_lo)], axis=-2)
    fwd_w, fwd_wp, inv_w, inv_wp, q, ninv, ninvp = _planes_cached(
        tuple(moduli), degree
    )
    w_planes, wp_planes = (inv_w, inv_wp) if inverse else (fwd_w, fwd_wp)
    out_lo = _ntt_planes_call(
        lo, w_planes, wp_planes, q, ninv, ninvp,
        degree=degree, inverse=inverse, interpret=interpret,
        lazy=lazy_ok(moduli),
    )
    return jnp.stack([out_lo, jnp.zeros_like(out_lo)], axis=-2)


def lazy_ok(moduli) -> bool:
    """Harvey lazy reduction needs 4q < 2^32 for every modulus."""
    return all(int(m) < (1 << 30) for m in moduli)
