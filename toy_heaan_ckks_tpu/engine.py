"""CkksEngine: the user-facing homomorphic crypto API.

Behavioral parity with the reference engine (reference: src/crypto/
engine.rs:13-540): keygen, encrypt/decrypt, homomorphic add, multiply with
RNS-gadget relinearization, exact rescale, and slot rotation with gadget
key switching; HEAAN-style logp/logq bookkeeping on every ciphertext.

TPU-native departures:
- Ciphertexts are resident in **NTT domain**; every ct x ct multiply is a
  pointwise pass, not 3 NTTs (the reference stores coefficient-domain
  ciphertexts and pays 12 + 6L NTTs per gadget multiply — SURVEY.md §3.3;
  here a gadget multiply costs L+5 batched NTT passes).
- The gadget decomposition runs as one batched (digit, channel) tensor op
  and a tree reduction, all inside a single jit: XLA fuses the Montgomery
  chains between stages.
- The noise-sigma conventions of the reference are preserved exactly,
  including its quirks: encrypt noise sigma = params.error_variance (3.2),
  public-key sigma hard-coded 3.2, gadget-key sigma = sqrt(error_variance)
  (reference engine.rs:57, :79, :92-93 — naming audit pending upstream,
  README.md:159-160).
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp

from .context import CkksContext
from .keys import (
    PublicKey,
    RelinearizationKey,
    RnsGadgetRelinKey,
    RnsGadgetRotationKey,
    RotationKey,
    SecretKey,
    SecretKeyParams,
)
from .ops import modular as mm
from .ops import poly as pops
from .ops.poly import Poly
from .types import Ciphertext, Plaintext

# Relative tolerance for adding/subtracting operands whose exact tracked
# scales differ (see CkksEngine._check_scale_match). Shared by the
# model-level circuits: funceval._combine self-heals (spends a level
# re-equalising scales) exactly when this would trip, and
# models/linalg.encrypted_matmul validates operands against it.
SCALE_MATCH_TOL = 1e-2


@dataclasses.dataclass(frozen=True)
class CkksParams:
    error_variance: float = 3.2
    hamming_weight: int = 0
    scale_bits: int = 30


def _mod_sum(stack: jnp.ndarray, chain, axis: int = -4) -> jnp.ndarray:
    """Modular tree-reduction over the digit axis (lead-dim polymorphic)."""
    sl = functools.partial(jax.lax.slice_in_dim, stack, axis=axis)
    n = stack.shape[axis]
    while n > 1:
        half = n // 2
        paired = mm.add_mod(sl(0, half), sl(half, 2 * half), chain)
        if n % 2:
            paired = jnp.concatenate([paired, sl(2 * half, n)], axis=axis)
        stack = paired
        sl = functools.partial(jax.lax.slice_in_dim, stack, axis=axis)
        n = stack.shape[axis]
    return jnp.squeeze(stack, axis=axis)


@dataclasses.dataclass(frozen=True, eq=False)
class _SwitchPlan:
    """Precomputed constants for one hybrid key-switch configuration.

    Decomposition digit t covers prime group G_t (size <= g); its RNS
    decomposition is the approximate basis extension
        y_k    = d_k * (Qhat_tk)^{-1} mod q_k          (Qhat_tk = Q_t / q_k)
        alpha_t[j] = sum_{k in G_t} y_k * (Qhat_tk mod q_j)
    which equals (d mod Q_t) + u*Q_t as an integer (u < g); the u*Q_t
    overflow vanishes modulo Q because Q_t * T_t == 0 (mod Q). The final
    division by P = prod(specials) is the same extension applied to the
    special channels. digit_size=1 reduces to the reference's exact
    per-channel broadcast (engine.rs:505-528).
    """

    digit_size: int
    num_digits: int
    dec_inv: jnp.ndarray  # (L, 2, 1)  plain (Qhat_tk)^{-1} mod q_k
    ext_c: jnp.ndarray  # (D, g, E, 2, 1)  (Qhat_tk * R^2) mod q_j (0-padded)
    sp_inv: jnp.ndarray  # (g', 2, 1) plain (Phat_m)^{-1} mod p_m
    phat_c: jnp.ndarray  # (g', L, 2, 1)  (Phat_m * R^2) mod q_j
    p_inv: jnp.ndarray  # (L, 2, 1)  Montgomery(P^{-1} mod q_j)


jax.tree_util.register_dataclass(
    _SwitchPlan,
    data_fields=["dec_inv", "ext_c", "sp_inv", "phat_c", "p_inv"],
    meta_fields=["digit_size", "num_digits"],
)


def _pack_u64_cols(vals) -> np.ndarray:
    """List/array of ints < 2^64 -> uint32 (..., 2, 1) limb columns."""
    arr = np.asarray(vals, dtype=object)
    lo = (arr & 0xFFFFFFFF).astype(np.uint32)
    hi = (arr >> 32).astype(np.uint32)
    return np.stack([lo, hi], axis=-1)[..., None]


@functools.lru_cache(maxsize=128)
def _switch_plan(
    base_moduli: tuple[int, ...], ext_moduli: tuple[int, ...], digit_size: int
) -> _SwitchPlan:
    """Plan keyed by the key's stored ``digit_size`` (NOT inferred from the
    digit count: ceil(L/num_digits) does not round-trip every valid
    digit_size — e.g. digit_size=5 at L=8 gives groups (5,3) but
    ceil(8/2)=4 would decompose (4,4) and silently corrupt)."""
    from .keys import digit_groups

    L = len(base_moduli)
    E = len(ext_moduli)
    gp = E - L
    specials = ext_moduli[L:]
    digit_size = min(digit_size, L)
    groups = digit_groups(L, digit_size)
    num_digits = len(groups)
    small = all(m < (1 << 31) for m in ext_moduli)
    rbits = 32 if small else 64
    r2 = {q: pow(1 << rbits, 2, q) for q in ext_moduli}

    from .keys import dec_inv_ints, sp_inv_ints

    # dec_inv / sp_inv come from the shared host-int helpers (keys.py) so
    # the fused lo-plane fold paths and this packer can never drift
    dec_inv = np.array(dec_inv_ints(base_moduli, digit_size), dtype=object)
    ext_c = np.zeros((num_digits, digit_size, E), dtype=object)
    for t, grp in enumerate(groups):
        for gi, k in enumerate(grp):
            qhat = 1
            for k2 in grp:
                if k2 != k:
                    qhat *= base_moduli[k2]
            for j, qj in enumerate(ext_moduli):
                ext_c[t, gi, j] = (qhat % qj) * r2[qj] % qj

    p_total = 1
    for p in specials:
        p_total *= p
    sp_inv = np.array(sp_inv_ints(specials), dtype=object)
    phat_c = np.zeros((gp, L), dtype=object)
    for m, pm in enumerate(specials):
        phat = p_total // pm
        for j, qj in enumerate(base_moduli):
            phat_c[m, j] = (phat % qj) * r2[qj] % qj
    p_inv = [
        (pow(p_total % qj, -1, qj) << rbits) % qj for qj in base_moduli
    ]

    with jax.ensure_compile_time_eval():
        return _SwitchPlan(
            digit_size=digit_size,
            num_digits=num_digits,
            dec_inv=jnp.asarray(_pack_u64_cols(dec_inv)),
            ext_c=jnp.asarray(_pack_u64_cols(ext_c)),
            sp_inv=jnp.asarray(_pack_u64_cols(sp_inv)),
            phat_c=jnp.asarray(_pack_u64_cols(phat_c)),
            p_inv=jnp.asarray(_pack_u64_cols(p_inv)),
        )


@functools.lru_cache(maxsize=128)
def _combined_down_consts(base_moduli: tuple[int, ...],
                          ext_moduli: tuple[int, ...]):
    """Constants for the fused relin+rescale division by P * q_last.

    The tensor terms t0/t1 (over Q) are scaled by P = prod(specials) so
    they share the key-switch accumulator's scale; the sum is then divided
    by P * q_last in ONE RNS mod-down to the child basis — saving a full
    separate rescale (2 * L channel-NTTs per multiply). Returns
    (p_mont, down_plan): Montgomery(P mod q_j) columns (L, 2, 1) over the
    base channels, and the mod-down plan for base' = moduli[:-1] with
    dropped channels (q_last, specials...) — which is exactly the tail of
    the extended chain's channel order.
    """
    L = len(base_moduli)
    specials = ext_moduli[L:]
    p_total = 1
    for p in specials:
        p_total *= p
    small = all(m < (1 << 31) for m in ext_moduli)
    rbits = 32 if small else 64
    p_mont = [((p_total % q) << rbits) % q for q in base_moduli]
    down_plan = _switch_plan(
        base_moduli[:-1], ext_moduli, max(1, len(base_moduli) - 1)
    )
    with jax.ensure_compile_time_eval():
        return jnp.asarray(_pack_u64_cols(p_mont)), down_plan


def _mod_down_ntt(x, ctx: CkksContext, ext_ctx: CkksContext, plan: _SwitchPlan):
    """Divide an NTT-domain poly over QP by P = prod(specials): QP -> Q.

    Approximate basis extension of the special channels (exact when there
    is a single special prime — then it is precisely ``rescale_ntt``); the
    extension overflow adds |error| <= g' to each coefficient, negligible
    against the key-switch noise it accompanies.
    """
    L = len(ctx.moduli)
    E = x.shape[-3]
    gp = E - L
    sp_ctx = ext_ctx.slice_channels(L, E)
    x_sp = pops.to_coeff(x[..., L:, :, :], sp_ctx)
    yhat = mm.mont_mul(x_sp, plan.sp_inv, sp_ctx.chain)  # plain, < p_m
    acc = None
    for m in range(gp):
        term = mm.mont_mul(
            yhat[..., m : m + 1, :, :], plan.phat_c[m], ctx.chain
        )
        acc = term if acc is None else mm.add_mod(acc, term, ctx.chain)
    ext_ntt = pops.to_ntt(acc, ctx)
    diff = mm.sub_mod(x[..., :L, :, :], ext_ntt, ctx.chain)
    return mm.mont_mul(diff, plan.p_inv, ctx.chain)


def _check_key_compat(ctx: CkksContext, key_a, digit_size: int):
    """Trace-time validation: the key's digit layout must match the
    ciphertext basis (a full-level key on a rescaled ciphertext, or a plan
    digit grouping that disagrees with the key's, silently corrupts)."""
    from .errors import ChannelCountMismatch
    from .keys import digit_groups

    L = len(ctx.moduli)
    groups = digit_groups(L, min(digit_size, L))
    if len(groups) != key_a.shape[-4]:
        raise ChannelCountMismatch(
            f"gadget key has {key_a.shape[-4]} digits but the ciphertext "
            f"basis (L={L}) with digit_size={digit_size} needs "
            f"{len(groups)} — use a key generated at this level "
            f"(e.g. KeyLadder.at_level({L}))"
        )


@functools.partial(jax.jit, static_argnames=("digit_size",))
def _gadget_key_switch(d_ntt, key_a, key_b, ctx: CkksContext,
                       ext_ctx: CkksContext, digit_size: int):
    """Hybrid RNS gadget key switch of an NTT-domain poly ``d`` over Q.

    Decomposes d into D digits (contiguous RNS prime groups — the
    reference's per-channel decomposition, engine.rs:505-528, generalised
    to digit groups), raises each digit to the modulus QP by approximate
    basis extension, accumulates the digit inner products against the key
    in NTT domain over QP, and exactly divides by P (one batched RNS
    mod-down), shrinking key-switch noise by 1/P. Dominant cost: D*(L+g')
    forward channel-NTTs (vs the reference's O(L^2) with 3x NTT passes).
    ``digit_size`` is the key's stored decomposition width.
    """
    _check_key_compat(ctx, key_a, digit_size)
    plan = _switch_plan(ctx.moduli, ext_ctx.moduli, digit_size)

    if pops._use_pallas_fused(ext_ctx):
        from .ops import small_fast as sf

        ks0, ks1 = sf.key_switch_lo(
            d_ntt[..., 0, :], key_a, key_b, ctx, ext_ctx, plan
        )
        stack = lambda x: jnp.stack([x, jnp.zeros_like(x)], axis=-2)
        return stack(ks0), stack(ks1)

    if pops._use_pallas_wide_fused(ext_ctx):
        from .ops import wide_fast as wf

        return wf.key_switch_wide(d_ntt, key_a, key_b, ctx, ext_ctx, plan)

    ks0, ks1 = _gadget_accumulate(d_ntt, key_a, key_b, ctx, ext_ctx, plan)
    return (
        _mod_down_ntt(ks0, ctx, ext_ctx, plan),
        _mod_down_ntt(ks1, ctx, ext_ctx, plan),
    )


def _decompose_alpha(d_ntt, ctx: CkksContext, ext_ctx: CkksContext,
                     plan: _SwitchPlan):
    """NTT-domain digit decomposition raised over QP: (..., D, E, 2, N).

    The expensive half of the gadget key switch (L inverse + D*E forward
    channel-NTTs); the cheap half is the key inner product + mod-down.
    Splitting the two enables rotation hoisting (compute alpha once, apply
    many rotation keys — the decomposition commutes with automorphisms)."""
    L = d_ntt.shape[-3]
    D = plan.num_digits
    g = plan.digit_size

    d_coeff = pops.to_coeff(d_ntt, ctx)
    y = mm.mont_mul(d_coeff, plan.dec_inv, ctx.chain)  # plain y_k in [0,q_k)

    pad = D * g - L
    if pad:
        zshape = y.shape[:-3] + (pad,) + y.shape[-2:]
        y = jnp.concatenate(
            [y, jnp.zeros(zshape, dtype=y.dtype)], axis=-3
        )
    yg = y.reshape(y.shape[:-3] + (D, g) + y.shape[-2:])

    acc = None
    for k in range(g):
        # (..., D, 1, 2, N) x (D, 1?, E, 2, 1) -> (..., D, E, 2, N)
        term = mm.mont_mul(
            yg[..., :, k : k + 1, :, :], plan.ext_c[:, k], ext_ctx.chain
        )
        acc = term if acc is None else mm.add_mod(acc, term, ext_ctx.chain)

    return pops.to_ntt(acc, ext_ctx)


def _gadget_accumulate(d_ntt, key_a, key_b, ctx: CkksContext,
                       ext_ctx: CkksContext, plan: _SwitchPlan):
    """Digit inner products over QP (NTT domain), before the P mod-down."""
    alpha_ntt = _decompose_alpha(d_ntt, ctx, ext_ctx, plan)
    ks0 = _mod_sum(mm.mont_mul(alpha_ntt, key_b, ext_ctx.chain), ext_ctx.chain)
    ks1 = _mod_sum(mm.mont_mul(alpha_ntt, key_a, ext_ctx.chain), ext_ctx.chain)
    return ks0, ks1


def _mod_down_dispatch(x, ctx: CkksContext, ext_ctx: CkksContext,
                       plan: _SwitchPlan):
    """P mod-down routed through the fused Pallas kernels when eligible."""
    L = len(ctx.moduli)
    if pops._use_pallas_fused(ext_ctx):
        from .ops import small_fast as sf

        lo = sf.mod_down_lo(x[..., 0, :], ctx, ext_ctx, plan)
        return jnp.stack([lo, jnp.zeros_like(lo)], axis=-2)
    if pops._use_pallas_wide_fused(ext_ctx):
        from .ops.keyswitch_pallas_wide import (
            inv_ntt_to_yhat_wide,
            mod_down_combine_pallas_wide,
        )

        specials = ext_ctx.moduli[L:]
        yhat = inv_ntt_to_yhat_wide(
            x[..., L:, :, :], specials, ctx.moduli, ctx.degree
        )
        return mod_down_combine_pallas_wide(
            yhat, x[..., :L, :, :], None,
            child_moduli=ctx.moduli, dropped_moduli=specials,
            degree=ctx.degree,
        )
    return _mod_down_ntt(x, ctx, ext_ctx, plan)


@functools.partial(jax.jit, static_argnames=("digit_size",))
def _hoisted_rotate_core(c0, c1, perms, keys_a_inv, keys_b_inv,
                         ctx: CkksContext, ext_ctx: CkksContext,
                         digit_size: int):
    """Hoisted rotations: ONE gadget decomposition of c1, many keys.

    Standard HEAAN hoisting, with the permutations moved OFF the hot
    path: since perm(a) * k == perm(a * perm^{-1}(k)) pointwise and the P
    mod-down commutes with NTT-domain automorphisms (up to the documented
    <= g' approximate-extension error), the digit inner product runs
    against PRE-PERMUTED keys (perm_i^{-1} applied once at key prep,
    cached on the key object) and each rotation pays exactly ONE output
    gather of (L, 2, N) — instead of gathering the full (D, E, 2, N)
    alpha tensor per rotation. Per-rotation chip cost: the pointwise key
    product, the P mod-down (g' inverse + L forward channel-NTTs), and
    one slot gather — vs the reference's full per-rotation key switch
    (decomposition + key switch, engine.rs:429-452).

    perms: int32 (m, N) FORWARD NTT-domain permutations (applied to the
    combined output); keys_*_inv: (m, D, E, 2, N) inverse-permuted keys.
    Returns (out0, out1): (m, L, 2, N) stacked rotated ciphertexts.
    """
    _check_key_compat(ctx, keys_a_inv[0], digit_size)
    plan = _switch_plan(ctx.moduli, ext_ctx.moduli, digit_size)
    alpha_ntt = _decompose_alpha(c1, ctx, ext_ctx, plan)

    if pops._use_pallas_fused(ext_ctx):
        # small chains: single-limb planes halve every elementwise pass
        # and gather (hi limbs are identically zero)
        from .ops import small_fast as sf

        lo = lambda x: x[..., 0, :]
        q, qinv = ext_ctx.chain.q[:, 0], ext_ctx.chain.qinv[:, 0]
        a_lo = lo(alpha_ntt)
        p0 = sf.mont_mul_lo(a_lo, lo(keys_b_inv), q, qinv)
        p1 = sf.mont_mul_lo(a_lo, lo(keys_a_inv), q, qinv)
        red = lambda p: functools.reduce(
            lambda x, y: sf.add_lo(x, y, q), [p[:, t] for t in range(p.shape[1])]
        )
        ks0 = sf.mod_down_lo(red(p0), ctx, ext_ctx, plan)
        ks1 = sf.mod_down_lo(red(p1), ctx, ext_ctx, plan)
        qb = ctx.chain.q[:, 0]
        s0 = sf.add_lo(jnp.broadcast_to(lo(c0), ks0.shape), ks0, qb)
        take = lambda x: jnp.stack(
            [jnp.take(x[i], perms[i], axis=-1)
             for i in range(perms.shape[0])]
        )
        stack2 = lambda x: jnp.stack([x, jnp.zeros_like(x)], axis=-2)
        return stack2(take(s0)), stack2(take(ks1))

    # alpha broadcasts over the rotation axis m; no gather here
    ks0 = _mod_sum(
        mm.mont_mul(alpha_ntt, keys_b_inv, ext_ctx.chain), ext_ctx.chain
    )
    ks1 = _mod_sum(
        mm.mont_mul(alpha_ntt, keys_a_inv, ext_ctx.chain), ext_ctx.chain
    )
    ks0 = _mod_down_dispatch(ks0, ctx, ext_ctx, plan)
    ks1 = _mod_down_dispatch(ks1, ctx, ext_ctx, plan)
    # one output gather per rotation: perm_i(c0 + ks0_i), perm_i(ks1_i).
    # Per-rotation jnp.take with a shared (N,) index vector — an order of
    # magnitude faster on TPU than one batched take_along_axis (measured
    # 9.7 vs 0.66 G elems/s).
    s0 = mm.add_mod(jnp.broadcast_to(c0, ks0.shape), ks0, ctx.chain)
    out0 = jnp.stack(
        [jnp.take(s0[i], perms[i], axis=-1) for i in range(perms.shape[0])]
    )
    out1 = jnp.stack(
        [jnp.take(ks1[i], perms[i], axis=-1) for i in range(perms.shape[0])]
    )
    return out0, out1


@functools.partial(jax.jit, static_argnames=("digit_size",))
def _hoisted_rotate_sum_core(c0, c1, perms, keys_a_inv, keys_b_inv,
                             ctx: CkksContext, ext_ctx: CkksContext,
                             digit_size: int, weights=None):
    """Double-hoisted rotation sum: sum_i w_i * rot_i(ct) with ONE gadget
    decomposition AND ONE P mod-down.

    Extends ``_hoisted_rotate_core``: the per-rotation mod-down commutes
    with NTT-domain automorphisms and distributes over the sum, so the
    per-rotation accumulators stay in the extended basis QP, the
    permutation gathers apply there, and a single mod-down divides the
    whole sum by P — collapsing the (g' + L) * 2 channel-NTTs *per
    rotation* into one shared pass (the Lattigo/Halevi-Shoup
    "double hoisting" refinement). c0's contribution is folded in as
    c0 * P on the base channels, so moddown(sum) = sum_i perm_i(c0) +
    moddown(sum_i perm_i(ks0_i)) exactly. The reference performs a full
    key switch per rotation (engine.rs:429-452).

    perms: int32 (m, N) forward NTT-domain permutations; keys_*_inv:
    (m, D, E, 2, N) inverse-permuted keys. ``weights`` (optional):
    (m, E, 2, N) Montgomery NTT-domain plaintext planes over the
    EXTENDED basis — each rotation's output is pointwise-multiplied by
    its weight before the sum (the diagonal-method matrix-vector
    product, one mod-down for the whole product). Returns (out0, out1):
    single summed ciphertext components (L, 2, N).
    """
    _check_key_compat(ctx, keys_a_inv[0], digit_size)
    plan = _switch_plan(ctx.moduli, ext_ctx.moduli, digit_size)
    alpha_ntt = _decompose_alpha(c1, ctx, ext_ctx, plan)
    p_mont = _combined_down_consts(ctx.moduli, ext_ctx.moduli)[0]
    L = c0.shape[-3]
    m = perms.shape[0]

    if pops._use_pallas_fused(ext_ctx):
        from .ops import small_fast as sf

        lo = lambda x: x[..., 0, :]
        qe, qeinv = ext_ctx.chain.q[:, 0], ext_ctx.chain.qinv[:, 0]
        a_lo = lo(alpha_ntt)
        p0 = sf.mont_mul_lo(a_lo, lo(keys_b_inv), qe, qeinv)  # (m,D,E,N)
        p1 = sf.mont_mul_lo(a_lo, lo(keys_a_inv), qe, qeinv)
        red = lambda p: functools.reduce(
            lambda x, y: sf.add_lo(x, y, qe),
            [p[:, t] for t in range(p.shape[1])],
        )
        ks0, ks1 = red(p0), red(p1)  # (m, E, N)
        c0p = sf.mont_mul_lo(lo(c0), lo(p_mont), qe[:L], qeinv[:L])
        ks0 = ks0.at[..., :L, :].set(
            sf.add_lo(ks0[..., :L, :], c0p, qe[:L])
        )

        def gsum(ks):
            out = None
            for i in range(m):
                g = jnp.take(ks[i], perms[i], axis=-1)
                if weights is not None:
                    g = sf.mont_mul_lo(g, lo(weights[i]), qe, qeinv)
                out = g if out is None else sf.add_lo(out, g, qe)
            return out

        o0 = sf.mod_down_lo(gsum(ks0), ctx, ext_ctx, plan)
        o1 = sf.mod_down_lo(gsum(ks1), ctx, ext_ctx, plan)
        stack2 = lambda x: jnp.stack([x, jnp.zeros_like(x)], axis=-2)
        return stack2(o0), stack2(o1)

    ks0 = _mod_sum(
        mm.mont_mul(alpha_ntt, keys_b_inv, ext_ctx.chain), ext_ctx.chain
    )
    ks1 = _mod_sum(
        mm.mont_mul(alpha_ntt, keys_a_inv, ext_ctx.chain), ext_ctx.chain
    )
    c0p = mm.mont_mul(c0, p_mont, ctx.chain)
    ks0 = ks0.at[..., :L, :, :].set(
        mm.add_mod(ks0[..., :L, :, :], c0p, ctx.chain)
    )

    def gsum(ks):
        out = None
        for i in range(m):
            g = jnp.take(ks[i], perms[i], axis=-1)
            if weights is not None:
                g = mm.mont_mul(g, weights[i], ext_ctx.chain)
            out = g if out is None else mm.add_mod(out, g, ext_ctx.chain)
        return out

    o0 = _mod_down_dispatch(gsum(ks0), ctx, ext_ctx, plan)
    o1 = _mod_down_dispatch(gsum(ks1), ctx, ext_ctx, plan)
    return o0, o1


@functools.partial(jax.jit, static_argnames=("digit_size",))
def _mul_gadget_core(c0, c1, d0, d1, key_a, key_b, ctx: CkksContext,
                     ext_ctx: CkksContext, digit_size: int):
    """Fused tensor product + gadget relinearization (all NTT domain)."""
    t0 = mm.mont_mul(c0, d0, ctx.chain)
    t1 = mm.add_mod(
        mm.mont_mul(c0, d1, ctx.chain),
        mm.mont_mul(c1, d0, ctx.chain),
        ctx.chain,
    )
    t2 = mm.mont_mul(c1, d1, ctx.chain)
    ks0, ks1 = _gadget_key_switch(
        t2, key_a, key_b, ctx, ext_ctx, digit_size=digit_size
    )
    return mm.add_mod(t0, ks0, ctx.chain), mm.add_mod(t1, ks1, ctx.chain)


@functools.partial(jax.jit, static_argnames=("digit_size",))
def _square_gadget_core(c0, c1, key_a, key_b, ctx: CkksContext,
                        ext_ctx: CkksContext, digit_size: int):
    """Squaring variant of ``_mul_gadget_core``: t1 = 2*c0*c1 computed as
    one product + one modular double — bit-identical to the general
    path's mont_mul(c0,c1) + mont_mul(c1,c0) (commutative, same
    canonical residues)."""
    t0 = mm.mont_mul(c0, c0, ctx.chain)
    cross = mm.mont_mul(c0, c1, ctx.chain)
    t1 = mm.add_mod(cross, cross, ctx.chain)
    t2 = mm.mont_mul(c1, c1, ctx.chain)
    ks0, ks1 = _gadget_key_switch(
        t2, key_a, key_b, ctx, ext_ctx, digit_size=digit_size
    )
    return mm.add_mod(t0, ks0, ctx.chain), mm.add_mod(t1, ks1, ctx.chain)


class CkksEngine:
    """Homomorphic engine bound to a context + parameter set."""

    def __init__(self, context: CkksContext, params: CkksParams):
        self.context = context
        self.params = params

    @staticmethod
    def builder() -> "CkksEngineBuilder":
        return CkksEngineBuilder()

    # ── key generation ───────────────────────────────────────────────────

    def generate_secret_key(self, rng: np.random.Generator) -> SecretKey:
        return SecretKey.generate(
            SecretKeyParams(self.params.hamming_weight), self.context, rng
        )

    def generate_public_key(
        self, sk: SecretKey, rng: np.random.Generator
    ) -> PublicKey:
        # sigma hard-coded 3.2, parity with reference engine.rs:57
        return PublicKey.generate(sk, 3.2, self.context, rng)

    def generate_relinearization_key(
        self, sk: SecretKey, rng: np.random.Generator
    ) -> RelinearizationKey:
        return RelinearizationKey.generate(
            sk, float(np.sqrt(self.params.error_variance)), self.context, rng
        )

    def generate_rotation_key(
        self, sk: SecretKey, rotation: int, rng: np.random.Generator
    ) -> RotationKey:
        return RotationKey.generate(
            sk,
            rotation,
            float(np.sqrt(self.params.error_variance)),
            self.context,
            rng,
        )

    def generate_gadget_relin_key(
        self, sk: SecretKey, rng: np.random.Generator, digit_size: int = 1
    ) -> RnsGadgetRelinKey:
        return RnsGadgetRelinKey.generate(
            sk,
            float(np.sqrt(self.params.error_variance)),
            self.context,
            rng,
            digit_size=digit_size,
        )

    def generate_gadget_rotation_key(
        self,
        sk: SecretKey,
        rotation: int,
        rng: np.random.Generator,
        digit_size: int = 1,
    ) -> RnsGadgetRotationKey:
        return RnsGadgetRotationKey.generate(
            sk,
            rotation,
            float(np.sqrt(self.params.error_variance)),
            self.context,
            rng,
            digit_size=digit_size,
        )

    # ── encryption / decryption ──────────────────────────────────────────

    def encrypt(
        self,
        plaintext: Plaintext,
        public_key: PublicKey,
        logq: int,
        rng: np.random.Generator,
    ) -> Ciphertext:
        ctx = self.context
        u = Poly.sample_tribits(ctx, self.params.hamming_weight, rng).to_ntt_domain()
        # Parity quirk: the reference passes error_variance directly as the
        # sampler's std-dev at encrypt time (engine.rs:92-93).
        e0 = Poly.sample_gaussian(ctx, self.params.error_variance, rng).to_ntt_domain()
        e1 = Poly.sample_gaussian(ctx, self.params.error_variance, rng).to_ntt_domain()
        m = plaintext.poly.to_ntt_domain()
        c0 = public_key.b * u + e0 + m
        c1 = public_key.a * u + e1
        return Ciphertext(
            c0=c0, c1=c1, logp=plaintext.scale_bits, logq=logq,
            scale=plaintext.true_scale,
        )

    @staticmethod
    def decrypt(ciphertext: Ciphertext, secret_key: SecretKey) -> Plaintext:
        m = ciphertext.c1.to_ntt_domain() * secret_key.poly + ciphertext.c0.to_ntt_domain()
        return Plaintext(
            poly=m,
            scale_bits=ciphertext.logp,
            slots=ciphertext.ctx.degree // 2,
            scale=ciphertext.true_scale,
        )

    # ── level-free homomorphic ops ───────────────────────────────────────

    @staticmethod
    def _check_scale_match(s1: float, s2: float, op: str):
        """SEAL-style scale check: two operands may share integer logp yet
        carry different true scales (a rescaled ct vs a fresh encryption);
        summing them silently adopts one scale. The 1% tolerance admits the
        reference's fresh-operand-at-level idiom (per-rescale drift
        (2^bits - q_last)/q_last ~ 1e-4, tests/integration_mul.rs:279-334)
        while rejecting genuine mismatches (unrescaled Delta^2 vs Delta)."""
        from .errors import CkksError

        if abs(s1 - s2) > SCALE_MATCH_TOL * max(abs(s1), abs(s2)):
            raise CkksError(
                f"true-scale mismatch in {op}: {s1!r} vs {s2!r} — rescale "
                f"or mul_plain_scalar one operand to match scales first"
            )

    @staticmethod
    def add_ciphertexts(ct1: Ciphertext, ct2: Ciphertext) -> Ciphertext:
        assert ct1.logp == ct2.logp, "logp mismatch in addition"
        assert ct1.logq == ct2.logq, "logq mismatch in addition"
        CkksEngine._check_scale_match(
            ct1.true_scale, ct2.true_scale, "add_ciphertexts"
        )
        return Ciphertext(
            c0=ct1.c0 + ct2.c0,
            c1=ct1.c1 + ct2.c1,
            logp=ct1.logp,
            logq=ct1.logq,
            scale=ct1.scale,
        )

    @staticmethod
    def neg_ciphertext(ct: Ciphertext) -> Ciphertext:
        return Ciphertext(
            c0=-ct.c0, c1=-ct.c1, logp=ct.logp, logq=ct.logq, scale=ct.scale
        )

    @staticmethod
    def sub_ciphertexts(ct1: Ciphertext, ct2: Ciphertext) -> Ciphertext:
        assert ct1.logp == ct2.logp, "logp mismatch in subtraction"
        assert ct1.logq == ct2.logq, "logq mismatch in subtraction"
        CkksEngine._check_scale_match(
            ct1.true_scale, ct2.true_scale, "sub_ciphertexts"
        )
        return Ciphertext(
            c0=ct1.c0 - ct2.c0,
            c1=ct1.c1 - ct2.c1,
            logp=ct1.logp,
            logq=ct1.logq,
            scale=ct1.scale,
        )

    # ── multiplication ───────────────────────────────────────────────────

    @staticmethod
    def mul_ciphertexts(
        ct1: Ciphertext, ct2: Ciphertext, relin_key: RelinearizationKey
    ) -> Ciphertext:
        """Legacy single-pair relinearization (reference engine.rs:153-203).

        Noise grows with |d2| * q; kept for API parity — prefer
        ``mul_ciphertexts_gadget``.
        """
        assert ct1.logq == ct2.logq, "logq mismatch in multiplication"
        a0, a1 = ct1.c0.to_ntt_domain(), ct1.c1.to_ntt_domain()
        b0, b1 = ct2.c0.to_ntt_domain(), ct2.c1.to_ntt_domain()
        d0 = a0 * b0
        d1 = a0 * b1 + a1 * b0
        d2 = a1 * b1
        c0 = d0 + relin_key.b * d2
        c1 = d1 + relin_key.a * d2
        return Ciphertext(
            c0=c0, c1=c1, logp=ct1.logp + ct2.logp, logq=ct1.logq,
            scale=ct1.true_scale * ct2.true_scale,
        )

    @staticmethod
    def mul_ciphertexts_gadget(
        ct1: Ciphertext, ct2: Ciphertext, rlk: RnsGadgetRelinKey
    ) -> Ciphertext:
        """Tensor product + RNS gadget relinearization
        (reference engine.rs:473-539). Output logp = logp1 + logp2."""
        assert ct1.logq == ct2.logq, "logq mismatch in gadget multiplication"
        ctx = ct1.ctx
        c0, c1 = _mul_gadget_core(
            ct1.c0.to_ntt_domain().data,
            ct1.c1.to_ntt_domain().data,
            ct2.c0.to_ntt_domain().data,
            ct2.c1.to_ntt_domain().data,
            rlk.a,
            rlk.b,
            ctx,
            rlk.ext_ctx,
            digit_size=rlk.digit_size,
        )
        return Ciphertext(
            c0=Poly(c0, ctx, True),
            c1=Poly(c1, ctx, True),
            logp=ct1.logp + ct2.logp,
            logq=ct1.logq,
            scale=ct1.true_scale * ct2.true_scale,
        )

    @staticmethod
    def mul_rescale(
        ct1: Ciphertext, ct2: Ciphertext, rlk: RnsGadgetRelinKey
    ) -> Ciphertext:
        """Fused multiply + relinearize + rescale: ONE division by
        P * q_last instead of the sequential P mod-down followed by the
        q_last rescale — 2L fewer channel-NTTs per multiply than
        ``rescale_ciphertext(mul_ciphertexts_gadget(...))``, identical to
        it up to the O(1) rounding the rescale already carries
        (test_fused_mult pins both). This is the engine-surface form of
        the batched composite the benchmark measures
        (parallel/sharded.py:_mul_relin_rescale_arrays)."""
        assert ct1.logq == ct2.logq, "logq mismatch in gadget multiplication"
        from .parallel.sharded import _mul_relin_rescale_arrays

        ctx = ct1.ctx
        child = ctx.drop_last(1)
        o0, o1 = _mul_relin_rescale_arrays(
            ct1.c0.to_ntt_domain().data,
            ct1.c1.to_ntt_domain().data,
            ct2.c0.to_ntt_domain().data,
            ct2.c1.to_ntt_domain().data,
            rlk.a,
            rlk.b,
            ctx,
            rlk.ext_ctx,
            child,
            digit_size=rlk.digit_size,
        )
        q_last = ctx.moduli[-1]
        bits_dropped = q_last.bit_length()
        return Ciphertext(
            c0=Poly(o0, child, True),
            c1=Poly(o1, child, True),
            logp=ct1.logp + ct2.logp - bits_dropped,
            logq=ct1.logq - bits_dropped,
            scale=ct1.true_scale * ct2.true_scale / q_last,
        )

    @staticmethod
    def square_ciphertext(
        ct: Ciphertext, rlk: RnsGadgetRelinKey
    ) -> Ciphertext:
        """ct * ct with the squaring shortcut: t1 = 2*c0*c1 saves one of
        the four tensor-product pointwise multiplies (standard library
        surface — SEAL/OpenFHE EvalSquare; the reference squares via the
        generic multiply, examples/std_dev_8.rs). Identical residues to
        ``mul_ciphertexts_gadget(ct, ct, rlk)``."""
        ctx = ct.ctx
        c0, c1 = _square_gadget_core(
            ct.c0.to_ntt_domain().data,
            ct.c1.to_ntt_domain().data,
            rlk.a,
            rlk.b,
            ctx,
            rlk.ext_ctx,
            digit_size=rlk.digit_size,
        )
        return Ciphertext(
            c0=Poly(c0, ctx, True),
            c1=Poly(c1, ctx, True),
            logp=2 * ct.logp,
            logq=ct.logq,
            scale=ct.true_scale * ct.true_scale,
        )

    # ── rescale ──────────────────────────────────────────────────────────

    @staticmethod
    def rescale_ciphertext(ct: Ciphertext) -> Ciphertext:
        """Drop q_last and divide by it; logp/logq -= bit_length(q_last)
        (reference engine.rs:255-282 — the +1 in bit_length matters)."""
        q_last = ct.ctx.moduli[-1]
        bits_dropped = q_last.bit_length()
        c0 = ct.c0.rescale_ntt()
        c1 = ct.c1.rescale_ntt()
        return Ciphertext(
            c0=c0,
            c1=c1,
            logp=ct.logp - bits_dropped,
            logq=ct.logq - bits_dropped,
            scale=ct.true_scale / q_last,
        )

    # ── rotation ─────────────────────────────────────────────────────────

    @staticmethod
    def rotate_ciphertext(
        ct: Ciphertext, rotk: RnsGadgetRotationKey
    ) -> Ciphertext:
        """Slot rotation via automorphism + gadget key switch
        (reference engine.rs:401-463). Level-free."""
        ctx = ct.ctx
        c0_rot = ct.c0.rotate_slots(rotk.rotation)
        c1_rot = ct.c1.rotate_slots(rotk.rotation)
        ks0, ks1 = _gadget_key_switch(
            c1_rot.to_ntt_domain().data, rotk.a, rotk.b, ctx, rotk.ext_ctx,
            digit_size=rotk.digit_size,
        )
        c0_new = c0_rot.to_ntt_domain() + Poly(ks0, ctx, True)
        return Ciphertext(
            c0=c0_new,
            c1=Poly(ks1, ctx, True),
            logp=ct.logp,
            logq=ct.logq,
            scale=ct.scale,
        )

    def generate_conjugation_key(
        self, sk: SecretKey, rng: np.random.Generator, digit_size: int = 1
    ):
        from .keys import RnsGadgetConjugationKey

        return RnsGadgetConjugationKey.generate(
            sk,
            float(np.sqrt(self.params.error_variance)),
            self.context,
            rng,
            digit_size=digit_size,
        )

    @staticmethod
    def conjugate_ciphertext(ct: Ciphertext, cjk) -> Ciphertext:
        """Complex-conjugate every slot: automorphism X -> X^{2N-1} +
        gadget key switch. Level-free. Enables homomorphic real/imag
        extraction: Re(x) = (x + conj(x))/2."""
        ctx = ct.ctx
        c0_c = ct.c0.conjugate()
        c1_c = ct.c1.conjugate()
        ks0, ks1 = _gadget_key_switch(
            c1_c.to_ntt_domain().data, cjk.a, cjk.b, ctx, cjk.ext_ctx,
            digit_size=cjk.digit_size,
        )
        c0_new = c0_c.to_ntt_domain() + Poly(ks0, ctx, True)
        return Ciphertext(
            c0=c0_new,
            c1=Poly(ks1, ctx, True),
            logp=ct.logp,
            logq=ct.logq,
            scale=ct.scale,
        )

    @staticmethod
    def _hoist_prep(ct: Ciphertext, rotks):
        """Shared hoisting prep: forward NTT-domain permutations and
        inverse-permuted key stacks (cached on each key object). All keys
        must share the extended basis and digit_size."""
        ext_ctx = rotks[0].ext_ctx
        ds = rotks[0].digit_size
        for k in rotks[1:]:
            if k.ext_ctx.moduli != ext_ctx.moduli or k.digit_size != ds:
                from .errors import CkksError

                raise CkksError(
                    "hoisted rotation: keys must share ext basis + "
                    "digit_size"
                )
        ctx = ct.ctx
        half = ctx.degree // 2
        two_n = 2 * ctx.degree
        perms = jnp.stack(
            [
                ctx.automorphism_table_ntt(pow(5, k.rotation % half, two_n))
                for k in rotks
            ]
        )

        def inv_keys(k):
            cached = k.hoist_cache.get("inv")
            if cached is None:
                e = pow(5, k.rotation % half, two_n)
                inv_perm = ctx.automorphism_table_ntt(pow(e, -1, two_n))
                cached = (
                    jnp.take(k.a, inv_perm, axis=-1),
                    jnp.take(k.b, inv_perm, axis=-1),
                )
                k.hoist_cache["inv"] = cached
            return cached

        pairs = [inv_keys(k) for k in rotks]
        keys_a = jnp.stack([p[0] for p in pairs])
        keys_b = jnp.stack([p[1] for p in pairs])
        return perms, keys_a, keys_b, ext_ctx, ds

    @staticmethod
    def rotate_hoisted(
        ct: Ciphertext, rotks
    ) -> list[Ciphertext]:
        """Rotate one ciphertext by MANY offsets with a single hoisted
        gadget decomposition (see ``_hoisted_rotate_core``). All keys must
        share the extended basis and digit_size. Returns outputs in the
        order of ``rotks``."""
        rotks = list(rotks)
        if not rotks:
            return []
        ctx = ct.ctx
        perms, keys_a, keys_b, ext_ctx, ds = CkksEngine._hoist_prep(
            ct, rotks
        )
        out0, out1 = _hoisted_rotate_core(
            ct.c0.to_ntt_domain().data,
            ct.c1.to_ntt_domain().data,
            perms, keys_a, keys_b, ctx, ext_ctx, digit_size=ds,
        )
        return [
            Ciphertext(
                c0=Poly(out0[i], ctx, True),
                c1=Poly(out1[i], ctx, True),
                logp=ct.logp,
                logq=ct.logq,
                scale=ct.scale,
            )
            for i in range(len(rotks))
        ]

    @staticmethod
    def rotate_sum_hoisted(ct: Ciphertext, rotks) -> Ciphertext:
        """sum_i rotate(ct, k_i) with ONE gadget decomposition and ONE
        P mod-down (double hoisting — see ``_hoisted_rotate_sum_core``).
        Per-rotation cost collapses to a pointwise key product plus one
        extended-basis slot gather. Decode-equal to summing
        ``rotate_hoisted`` outputs within key-switch noise."""
        rotks = list(rotks)
        if not rotks:
            raise ValueError("rotate_sum_hoisted: need at least one key")
        ctx = ct.ctx
        perms, keys_a, keys_b, ext_ctx, ds = CkksEngine._hoist_prep(
            ct, rotks
        )
        out0, out1 = _hoisted_rotate_sum_core(
            ct.c0.to_ntt_domain().data,
            ct.c1.to_ntt_domain().data,
            perms, keys_a, keys_b, ctx, ext_ctx, digit_size=ds,
        )
        return Ciphertext(
            c0=Poly(out0, ctx, True),
            c1=Poly(out1, ctx, True),
            logp=ct.logp,
            logq=ct.logq,
            scale=ct.scale,
        )

    @staticmethod
    def rotate_weighted_sum_hoisted(
        ct: Ciphertext, rotks, pts_ext
    ) -> Ciphertext:
        """sum_i pt_i * rotate(ct, k_i) with ONE gadget decomposition and
        ONE P mod-down — the double-hoisted diagonal-method matrix-vector
        product. ``pts_ext``: one Plaintext per key, encoded over the
        keys' EXTENDED basis (``encoder.encode(diag, rotk.ext_ctx)``) so
        the weight multiply can happen before the shared mod-down; all
        must share scale_bits. Follow with ``rescale_ciphertext`` as for
        ``mul_plain``."""
        from .errors import CkksError

        rotks = list(rotks)
        pts_ext = list(pts_ext)
        if not rotks or len(rotks) != len(pts_ext):
            raise ValueError(
                "rotate_weighted_sum_hoisted: need one plaintext per key"
            )
        ctx = ct.ctx
        perms, keys_a, keys_b, ext_ctx, ds = CkksEngine._hoist_prep(
            ct, rotks
        )
        sb = pts_ext[0].scale_bits
        for pt in pts_ext:
            if pt.poly.ctx.moduli != ext_ctx.moduli:
                raise CkksError(
                    "rotate_weighted_sum_hoisted: plaintexts must be "
                    "encoded over the keys' extended basis"
                )
            if pt.scale_bits != sb:
                raise CkksError(
                    "rotate_weighted_sum_hoisted: plaintext scales differ"
                )
        weights = jnp.stack(
            [pt.poly.to_ntt_domain().data for pt in pts_ext]
        )
        out0, out1 = _hoisted_rotate_sum_core(
            ct.c0.to_ntt_domain().data,
            ct.c1.to_ntt_domain().data,
            perms, keys_a, keys_b, ctx, ext_ctx, digit_size=ds,
            weights=weights,
        )
        pt_scale = pts_ext[0].true_scale
        return Ciphertext(
            c0=Poly(out0, ctx, True),
            c1=Poly(out1, ctx, True),
            logp=ct.logp + sb,
            logq=ct.logq,
            scale=ct.true_scale * pt_scale,
        )

    # ── plaintext multiplication (extensions required by specs/ctx.md) ───

    @staticmethod
    def mul_plain(ct: Ciphertext, pt: Plaintext) -> Ciphertext:
        """ct x plaintext (no relinearization needed). logp adds."""
        p = pt.poly.to_ntt_domain()
        return Ciphertext(
            c0=ct.c0.to_ntt_domain() * p,
            c1=ct.c1.to_ntt_domain() * p,
            logp=ct.logp + pt.scale_bits,
            logq=ct.logq,
            scale=ct.true_scale * pt.true_scale,
        )

    def mul_plain_scalar(self, ct: Ciphertext, scalar: float) -> Ciphertext:
        """Multiply every slot by a scalar: encode round(scalar * Delta) as
        the constant polynomial and multiply (specs/ctx.md item 2).
        Follow with rescale_ciphertext to restore logp."""
        ctx = ct.ctx
        delta = 2.0 ** self.params.scale_bits
        coeffs = np.zeros(ctx.degree, dtype=object)
        coeffs[0] = int(round(scalar * delta))
        pt = Plaintext(
            poly=Poly.from_coeffs(coeffs, ctx),
            scale_bits=self.params.scale_bits,
            slots=ctx.degree // 2,
        )
        return self.mul_plain(ct, pt)

    @staticmethod
    def add_plain(ct: Ciphertext, pt: Plaintext) -> Ciphertext:
        assert ct.logp == pt.scale_bits, "scale mismatch in add_plain"
        CkksEngine._check_scale_match(
            ct.true_scale, pt.true_scale, "add_plain"
        )
        return Ciphertext(
            c0=ct.c0.to_ntt_domain() + pt.poly.to_ntt_domain(),
            c1=ct.c1,
            logp=ct.logp,
            logq=ct.logq,
            scale=ct.scale,
        )


class CkksEngineBuilder:
    """Engine builder with the reference's defaults
    (reference: src/crypto/builder.rs:6-57): sigma^2 = 3.2, hw = N/2."""

    def __init__(self):
        self._error_variance = 3.2
        self._hamming_weight: int | None = None
        self._scale_bits = 30

    def error_variance(self, v: float) -> "CkksEngineBuilder":
        self._error_variance = v
        return self

    def hamming_weight(self, hw: int) -> "CkksEngineBuilder":
        self._hamming_weight = hw
        return self

    def scale_bits(self, bits: int) -> "CkksEngineBuilder":
        self._scale_bits = bits
        return self

    def build_rns(self, degree: int, moduli) -> CkksEngine:
        ctx = CkksContext.build(moduli, degree)
        hw = self._hamming_weight if self._hamming_weight is not None else degree // 2
        return CkksEngine(
            ctx,
            CkksParams(
                error_variance=self._error_variance,
                hamming_weight=hw,
                scale_bits=self._scale_bits,
            ),
        )
