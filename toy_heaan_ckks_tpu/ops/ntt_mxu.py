"""MXU (systolic-array) formulation of the tree-order negacyclic NTT.

The fused butterfly kernels (ops/ntt_pallas.py) are movement-bound: the
two `pltpu.roll`s per stage are ~60% of kernel time and the VPU
arithmetic the rest, while the MXU sits idle. This module re-expresses
the SAME transform (identical uint32 tree-order outputs) as a 4-step
factorization whose heavy lifting is two modular matrix products that
run on the MXU:

    view x as (R, C), N = R*C                      [row-major]
    A    = Wr @ x          (contract rows)          <- MXU
    B    = A (.) T         (Harvey, plain consts)   <- VPU
    out  = B @ Wc^T        (contract lanes)         <- MXU

This is exact because the tree-order evaluation exponents factor: with
E_j the leaf exponent of slot j (ops/ntt.py:tree_leaf_exponents) and
j = j1*C + j2,

    E_j * C  mod 2N   depends only on j1            -> Wr[j1, n1]
    E_j - E_{j2}      depends only on j1 (mod 2N)   -> T[j1, n2], Wc[j2, n2]

(verified at table-build time for every degree). The reference computes
the same transform as scalar Cooley-Tukey butterflies
(src/rings/backends/rns_ntt/poly.rs:593-615); here the stages collapse
into dense matmuls — the TPU-native shape of the computation.

Modular matmul on the MXU: residues and twiddle matrices are split into
8-bit limbs held in bf16 (exact: limbs <= 255, products <= 65025, f32
accumulation over <=512 terms stays under 2^25 < 2^24? no — see below).
The limb products P_s = sum_{i+j=s} W_i @ X_j are exact f32 integers
(each dot is <= K * 255^2; K <= 512 keeps it < 2^25, exactly
representable in f32), converted to uint32 and folded as

    acc64 = sum_s P_s * (2^{8s} * R mod q)          (u64, < 2^61)
    A     = REDC(acc64)                             (Montgomery, R=2^32)

so the matmul keeps operands in Montgomery form end-to-end. No floats
carry rounding error anywhere: every f32 value is an exact integer, and
the tests pin uint32 equality against ops/ntt.py.

Small-prime chains only (q < 2^31). Inverse transform: the same three
steps transposed, with N^{-1} (and optionally the fold ``post`` factors
of ops/small_fast.inv_ntt_fold) folded into the final matrix constants.

MEASURED (round 3, real chip, N=2^14, L=8x31b, batch=32, marginal-loop
method — do NOT redo):
  - butterfly kernel (ops/ntt_pallas.py): 1.15 us/channel-NTT
  - this kernel (ntt_mxu_pallas):          1.8 us  (pair 1/2/4 alike)
  - matmul+cast portion alone:             0.52 us (bf16) / 0.48 (int8)
  => the limb-fold + REDC VPU chain (~1.3 us) dominates, not the MXU;
  an optimal 3-word double-REDC fold would still land ~1.25 us. The
  roll-based butterfly kernel therefore remains the default; this module
  stays as a correct, tested, opt-in alternative (CKKS_NTT_MXU=1) — its
  2-dot critical path may win for latency-bound unbatched dispatches,
  and it is the starting point if a future chip ships faster u32 VPU
  multiplies or a native modular-reduction path.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .ntt import tree_leaf_exponents
from .ntt_pallas import _layout
from .u64 import umul32

_LIMBS = 4  # 8-bit limbs per uint32 residue


def supported_mxu(degree: int, moduli) -> bool:
    small = all(int(m) < (1 << 31) for m in moduli)
    r, c = _layout(degree)
    # f32 exactness: a single limb dot accumulates K*255^2 < 2^24
    # -> K <= 256; partial sums P_s add up to 4 dots -> keep K <= 256
    return (
        small
        and degree == r * c
        and (degree & (degree - 1)) == 0
        and max(r, c) <= 256
        and min(r, c) >= 8
    )


def _limb_split(m: np.ndarray) -> np.ndarray:
    """uint32 (..., a, b) -> bf16 (LIMBS, ..., a, b) 8-bit limbs."""
    out = np.empty((_LIMBS,) + m.shape, np.float32)
    for i in range(_LIMBS):
        out[i] = ((m >> (8 * i)) & 0xFF).astype(np.float32)
    return jnp.asarray(out, dtype=jnp.bfloat16)


def _shoup(w: np.ndarray, q: np.ndarray) -> np.ndarray:
    return ((w.astype(object) << 32) // q.astype(object)).astype(np.uint32)


@functools.lru_cache(maxsize=64)
def _mxu_tables(moduli: tuple, degree: int, inverse: bool,
                post: tuple | None):
    """Per-channel 4-step tables.

    Returns (w_first, w_second, t_plane, t_shoup, rs, q, qinv) where
    w_first: bf16 (LIMBS, L, K, K) left matrix limbs, w_second likewise,
    t_plane/t_shoup: uint32 (L, R, C) Harvey mid-correction, rs: uint32
    (L, 7) fold constants 2^{8s}*R mod q, q/qinv: (L, 1, 1).
    """
    n = degree
    two_n = 2 * n
    r, c = _layout(n)
    L = len(moduli)
    e = np.array(tree_leaf_exponents(n), dtype=np.int64).reshape(r, c)

    g = (e[:, 0] * c) % two_n          # Wr exponent per j1 (cond 1)
    delta = (e[:, 0] - e[0, 0]) % two_n  # T exponent per j1 (cond 2)
    h = e[0, :] % two_n                # Wc exponent per j2
    # exactness guards (hold for every power-of-two degree; cheap)
    assert np.all((e * c) % two_n == ((e[:, :1] * c) % two_n))
    assert np.all((e - e[0:1, :]) % two_n == ((e[:, :1] - e[0, 0]) % two_n))

    wr = np.zeros((L, r, r), np.uint32)
    wc = np.zeros((L, c, c), np.uint32)
    t = np.zeros((L, r, c), np.uint32)
    rs = np.zeros((L, 2 * _LIMBS - 1), np.uint32)
    q_col = np.zeros((L, 1, 1), np.uint32)
    qinv_col = np.zeros((L, 1, 1), np.uint32)
    from ..math.primes import find_primitive_root

    for k, qk in enumerate(int(m) for m in moduli):
        psi = find_primitive_root(qk, two_n)
        pw = np.ones(two_n, dtype=object)
        for i in range(1, two_n):
            pw[i] = pw[i - 1] * psi % qk
        if not inverse:
            n1 = np.arange(r)
            wr[k] = pw[(g[:, None] * n1[None, :]) % two_n].astype(np.uint32)
            n2 = np.arange(c)
            wc[k] = pw[(h[:, None] * n2[None, :]) % two_n].astype(np.uint32)
            t[k] = pw[(delta[:, None] * np.arange(c)[None, :]) % two_n
                      ].astype(np.uint32)
        else:
            # x[n1,n2] = N^{-1} sum_{j1} psi^{-g(j1) n1} T*[j1,n2]
            #            (sum_{j2} psi^{-h(j2) n2} out[j1,j2])
            # first matmul contracts j2 (lane axis) with Wc*;
            # second contracts j1 (row axis) with Wr*; N^{-1} (and the
            # optional fold ``post``) are folded into Wr*.
            # post != None matches inv_ntt_fold's PLAIN output (it folds
            # a mont_mul by plain ``post``, dividing by R); post == None
            # stays Montgomery like ntt_lo(inverse=True)
            ninv = pow(n, -1, qk)
            fold = ninv
            if post is not None:
                fold = fold * (int(post[k]) % qk) % qk
                fold = fold * pow(1 << 32, -1, qk) % qk
            # wc indexed [n2, j2] for the contraction over j2
            j2 = np.arange(c)
            wc[k] = pw[(-h[None, :] * j2[:, None]) % two_n].astype(np.uint32)
            wr_plain = pw[(-g[None, :] * np.arange(r)[:, None]) % two_n]
            wr[k] = (wr_plain * fold % qk).astype(np.uint32)
            t[k] = pw[(-delta[:, None] * np.arange(c)[None, :]) % two_n
                      ].astype(np.uint32)
        for s in range(2 * _LIMBS - 1):
            rs[k, s] = (1 << (8 * s + 32)) % qk
        q_col[k, 0, 0] = qk
        qinv_col[k, 0, 0] = (-pow(qk, -1, 1 << 32)) % (1 << 32)

    qv = np.array([int(m) for m in moduli], np.uint32)
    if not inverse:
        w_first, w_second = wr, wc
        # forward: step1 contracts n1 (rows) with Wr[j1, n1];
        # step2 contracts n2 (lanes) with Wc[j2, n2]
    else:
        w_first, w_second = wc, wr
    t_sh = np.zeros_like(t)
    for k in range(L):
        t_sh[k] = _shoup(t[k], np.uint32(qv[k]))
    # lru-cached jnp constants must not capture tracers on a first call
    # under jit (see CkksContext._build_cached)
    with jax.ensure_compile_time_eval():
        return (
            _limb_split(w_first),
            _limb_split(w_second),
            jnp.asarray(t),
            jnp.asarray(t_sh),
            jnp.asarray(rs),
            jnp.asarray(q_col),
            jnp.asarray(qinv_col),
        )


def _fold_redc(p16, rs, q, qinv):
    """(16, ..., R, C) exact-f32 limb dots -> uint32 Montgomery residues.

    p16[i*LIMBS+j] is the (data limb i) x (matrix limb j) dot; fold into
    acc64 = sum_s P_s * rs[s] (s = i + j), then one REDC. Each dot is an
    exact f32 integer (< 2^24); the per-s sums are taken AFTER the u32
    cast — a 3- or 4-term sum can exceed 2^24 and would round in f32.
    """
    lo = None
    hi = None
    for s in range(2 * _LIMBS - 1):
        ps_u = None
        for i in range(_LIMBS):
            j = s - i
            if 0 <= j < _LIMBS:
                term = p16[i * _LIMBS + j].astype(jnp.uint32)
                ps_u = term if ps_u is None else ps_u + term
        tl, th = umul32(ps_u, rs[s])
        if lo is None:
            lo, hi = tl, th
        else:
            lo = lo + tl
            hi = hi + th + (lo < tl).astype(jnp.uint32)
    # REDC: m = lo * qinv mod 2^32; out = (acc + m*q) >> 32
    m = lo * qinv
    mql, mqh = umul32(m, q)
    s_lo = lo + mql
    carry = (s_lo < lo).astype(jnp.uint32)
    res = hi + mqh + carry
    return jnp.where(res >= q, res - q, res)


def _harvey_plain(x, w, wp, q):
    """Harvey multiply by plain constant w (Shoup wp), out in [0, q)."""
    hi = umul32(wp, x)[1]
    r = w * x - hi * q
    return jnp.where(r >= q, r - q, r)


def _mm_limbs(w_limbs, x, contract_rows: bool, rs, q, qinv):
    """Modular matmul of uint32 data x (..., L, R, C) by per-channel
    limb matrices w_limbs (LIMBS, L, K, K), contracting the row axis
    (R) or the lane axis (C)."""
    xl = [(x >> (8 * i)).astype(jnp.uint8).astype(jnp.bfloat16)
          for i in range(_LIMBS)]
    outs = []
    for i in range(_LIMBS):
        for j in range(_LIMBS):
            if contract_rows:
                # out[..., l, r', c] = sum_r W[l, r', r] * x[..., l, r, c]
                o = jnp.einsum(
                    "lab,...lbc->...lac", w_limbs[j], xl[i],
                    preferred_element_type=jnp.float32,
                )
            else:
                # out[..., l, r, c'] = sum_c W[l, c', c] * x[..., l, r, c]
                o = jnp.einsum(
                    "lab,...lcb->...lca", w_limbs[j], xl[i],
                    preferred_element_type=jnp.float32,
                )
            outs.append(o)
    return _fold_redc(outs, rs.T[:, :, None, None], q, qinv)


@functools.partial(
    jax.jit,
    static_argnames=("moduli", "degree", "inverse", "post"),
)
def ntt_mxu(x_lo, moduli: tuple, degree: int, inverse: bool,
            post: tuple | None = None):
    """Tree-order negacyclic NTT via MXU matmuls.

    x_lo: uint32 (..., L, N) Montgomery lo planes -> same shape, bit
    exact with ops/ntt.py (and ops/small_fast.inv_ntt_fold when ``post``
    is given with inverse=True).
    """
    moduli = tuple(int(m) for m in moduli)
    r, c = _layout(degree)
    (w1, w2, t, t_sh, rs, q, qinv) = _mxu_tables(
        moduli, degree, inverse, post
    )
    lead = x_lo.shape[:-1]
    x = x_lo.reshape(*lead, r, c)
    q3 = q[:, :, :]
    if not inverse:
        a = _mm_limbs(w1, x, True, rs, q3, qinv)     # Wr contract rows
        b = _harvey_plain(a, t, t_sh, q3)            # mid twiddle
        out = _mm_limbs(w2, b, False, rs, q3, qinv)  # Wc contract lanes
    else:
        a = _mm_limbs(w1, x, False, rs, q3, qinv)    # Wc* contract j2
        b = _harvey_plain(a, t, t_sh, q3)
        out = _mm_limbs(w2, b, True, rs, q3, qinv)   # Wr* (N^-1, post)
    return out.reshape(*lead, degree)


# ── fused Pallas kernel (all three steps in VMEM, dots on the MXU) ──────────

from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402


def _limb_bf16(x):
    """uint32 (r, c) -> list of 4 bf16 (r, c) 8-bit limb planes.

    Mosaic has no direct u32->bf16 cast; go u32 -> i32 -> f32 -> bf16
    (exact: masked values are <= 255)."""
    return [
        ((x >> (8 * i)) & jnp.uint32(0xFF))
        .astype(jnp.int32)
        .astype(jnp.float32)
        .astype(jnp.bfloat16)
        for i in range(_LIMBS)
    ]


def _dot_fold(x, w_ref, rs_ref, ch, q, qinv, contract_rows: bool):
    """One modular matmul: limb dots on the MXU, per-s u32 fold + REDC
    on the VPU, all operands VMEM-resident."""
    xl = _limb_bf16(x)
    lo = None
    hi = None
    for s in range(2 * _LIMBS - 1):
        ps = None
        for i in range(_LIMBS):
            j = s - i
            if not (0 <= j < _LIMBS):
                continue
            wj = w_ref[0, j]
            if contract_rows:
                d = jax.lax.dot_general(
                    wj, xl[i], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            else:
                d = jax.lax.dot_general(
                    xl[i], wj, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            # Mosaic: no f32->u32 cast; hop through i32 (values < 2^24)
            du = d.astype(jnp.int32).astype(jnp.uint32)
            ps = du if ps is None else ps + du
        tl, th = umul32(ps, rs_ref[ch, s])
        if lo is None:
            lo, hi = tl, th
        else:
            lo = lo + tl
            hi = hi + th + (lo < tl).astype(jnp.uint32)
    m = lo * qinv
    mql, mqh = umul32(m, q)
    s_lo = lo + mql
    carry = (s_lo < lo).astype(jnp.uint32)
    res = hi + mqh + carry
    return jnp.where(res >= q, res - q, res)


def _mxu_kernel(q_ref, qinv_ref, rs_ref, x_ref, w1_ref, w2_ref, t_ref,
                ts_ref, o_ref, *, inverse: bool, pair: int):
    ch = pl.program_id(0)
    q = q_ref[ch, 0]
    qinv = qinv_ref[ch, 0]
    for p in range(pair):
        x = x_ref[p, 0]
        # forward: contract rows (Wr) then lanes (Wc);
        # inverse: contract lanes (Wc*) then rows (Wr*, N^-1/post folded)
        a = _dot_fold(x, w1_ref, rs_ref, ch, q, qinv,
                      contract_rows=not inverse)
        b = _harvey_plain(a, t_ref[0], ts_ref[0], q)
        o_ref[p, 0] = _dot_fold(b, w2_ref, rs_ref, ch, q, qinv,
                                contract_rows=inverse)


@functools.partial(
    jax.jit,
    static_argnames=("moduli", "degree", "inverse", "post", "interpret"),
)
def ntt_mxu_pallas(x_lo, moduli: tuple, degree: int, inverse: bool,
                   post: tuple | None = None, interpret: bool = False):
    """Fused Pallas MXU NTT: bit-exact with ``ntt_mxu`` (and so with
    ops/ntt.py), with all three steps in VMEM and the limb dots on the
    systolic array."""
    moduli = tuple(int(m) for m in moduli)
    r, c = _layout(degree)
    L = len(moduli)
    (w1, w2, t, t_sh, rs, q, qinv) = _mxu_tables(
        moduli, degree, inverse, post
    )
    # kernel tables: bf16 (L, LIMBS, K, K); smem consts (L, x)
    with jax.ensure_compile_time_eval():
        w1k = jnp.transpose(w1, (1, 0, 2, 3))
        w2k = jnp.transpose(w2, (1, 0, 2, 3))
        q_s = jnp.asarray(np.asarray(q)[:, 0, :])       # (L, 1)
        qinv_s = jnp.asarray(np.asarray(qinv)[:, 0, :])  # (L, 1)
        rs_s = jnp.asarray(np.asarray(rs))               # (L, 7)

    lead = x_lo.shape[:-2]
    x = x_lo.reshape(-1, L, r, c)
    outer = x.shape[0]
    from .ntt_pallas import _auto_pair

    # fixed per-grid-step blocks: the (128, 128) twiddle matrices and
    # per-channel consts — a handful of planes, independent of pair
    pair = _auto_pair(outer, degree, 8, env="CKKS_MXU_PAIR", fixed_planes=4)

    kernel = functools.partial(_mxu_kernel, inverse=inverse, pair=pair)
    smem = lambda shape: pl.BlockSpec(
        shape, lambda ch, o: (0, 0), memory_space=pltpu.SMEM
    )
    data = lambda: pl.BlockSpec(
        (pair, 1, r, c), lambda ch, o: (o, ch, 0, 0),
        memory_space=pltpu.VMEM,
    )
    wspec = lambda k: pl.BlockSpec(
        (1, _LIMBS, k, k), lambda ch, o: (ch, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    tspec = lambda: pl.BlockSpec(
        (1, r, c), lambda ch, o: (ch, 0, 0), memory_space=pltpu.VMEM
    )
    k1 = r if not inverse else c
    k2 = c if not inverse else r
    out = pl.pallas_call(
        kernel,
        grid=(L, outer // pair),
        in_specs=[
            smem(q_s.shape), smem(qinv_s.shape), smem(rs_s.shape),
            data(), wspec(k1), wspec(k2), tspec(), tspec(),
        ],
        out_specs=data(),
        out_shape=jax.ShapeDtypeStruct((outer, L, r, c), jnp.uint32),
        interpret=interpret,
    )(q_s, qinv_s, rs_s, x, w1k, w2k, t, t_sh)
    return out.reshape(*lead, L, degree)
