"""Sharded + batched homomorphic step functions.

Builds jitted, GSPMD-sharded versions of the engine's core composites:
batched ct x ct multiply with gadget relinearization and rescale, and
batched rotation. The batch axis is data parallelism; the RNS channel axis
is tensor parallelism. XLA inserts the collectives (an all-gather of the
plain d2 residues for the gadget decomposition; a broadcast of the dropped
channel for rescale) over ICI.

Bit-exactness: sharded execution performs the same exact integer
arithmetic, so residues match the single-device run bit-for-bit — the gate
required by SURVEY.md §7 stage 10.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..context import CkksContext
from ..engine import _gadget_key_switch
from ..ops import poly as pops
from .mesh import ct_spec, key_spec

__all__ = ["build_mul_relin_rescale", "build_rotate", "batched_mul_relin_rescale"]


def _mul_relin_rescale_arrays(c0a, c1a, c0b, c1b, key_a, key_b,
                              ctx: CkksContext, ext_ctx: CkksContext,
                              child_ctx: CkksContext, digit_size: int = 1):
    """One fused (batched) multiply + relinearize + rescale on raw arrays.

    Input/output: uint32 (B, L, 2, N) NTT-domain Montgomery residues
    (output has L-1 channels). All stages are lead-dim polymorphic, so the
    batch flows through as a leading axis — no vmap (vmap over pallas_call
    fragments the NTT grid and defeats its per-channel twiddle reuse).

    The relinearization mod-down and the ciphertext rescale are FUSED into
    one division by P * q_last: the tensor terms are scaled by P (pointwise)
    and added to the raw key-switch accumulators, then a single RNS
    mod-down drops (q_last, specials...) — 2L fewer channel-NTTs per
    multiply than the sequential engine path, identical up to the O(1)
    rounding the rescale already carries.

    Small-prime chains on TPU take the single-limb fast composite
    (ops/small_fast.py): limbs are stripped once at entry and re-stacked at
    exit, bit-exact with this generic path.
    """
    from ..engine import (
        _combined_down_consts,
        _gadget_accumulate,
        _mod_down_ntt,
        _switch_plan,
    )
    from ..ops import modular as mm

    from ..engine import _check_key_compat

    _check_key_compat(ctx, key_a, digit_size)
    if pops._use_pallas_fused(ext_ctx):
        from ..ops import small_fast as sf

        plan = _switch_plan(ctx.moduli, ext_ctx.moduli, digit_size)
        o0, o1 = sf.mul_relin_rescale_lo(
            c0a[..., 0, :], c1a[..., 0, :], c0b[..., 0, :], c1b[..., 0, :],
            key_a, key_b, ctx, ext_ctx, plan,
        )
        stack = lambda x: jnp.stack([x, jnp.zeros_like(x)], axis=-2)
        return stack(o0), stack(o1)

    if pops._use_pallas_wide_fused(ext_ctx):
        from ..ops import wide_fast as wf

        plan = _switch_plan(ctx.moduli, ext_ctx.moduli, digit_size)
        return wf.mul_relin_rescale_wide(
            c0a, c1a, c0b, c1b, key_a, key_b, ctx, ext_ctx, plan
        )

    L = ctx.num_channels
    plan = _switch_plan(ctx.moduli, ext_ctx.moduli, digit_size)
    p_mont, down_plan = _combined_down_consts(ctx.moduli, ext_ctx.moduli)

    t0 = mm.mont_mul(c0a, c0b, ctx.chain)
    t1 = mm.add_mod(
        mm.mont_mul(c0a, c1b, ctx.chain),
        mm.mont_mul(c1a, c0b, ctx.chain),
        ctx.chain,
    )
    t2 = mm.mont_mul(c1a, c1b, ctx.chain)
    ks0, ks1 = _gadget_accumulate(t2, key_a, key_b, ctx, ext_ctx, plan)

    def combine(t, ks):
        t_p = mm.mont_mul(t, p_mont, ctx.chain)
        head = mm.add_mod(t_p, ks[..., :L, :, :], ctx.chain)
        x = jnp.concatenate([head, ks[..., L:, :, :]], axis=-3)
        return _mod_down_ntt(x, child_ctx, ext_ctx, down_plan)

    return combine(t0, ks0), combine(t1, ks1)


def batched_mul_relin_rescale(ct_batch_a, ct_batch_b, rlk, ctx, child_ctx):
    """Convenience unsharded batched step (for tests and the benchmark)."""
    return _mul_relin_rescale_arrays(
        *ct_batch_a, *ct_batch_b, rlk.a, rlk.b, ctx, rlk.ext_ctx, child_ctx,
        digit_size=rlk.digit_size,
    )


def build_mul_relin_rescale(mesh, ctx: CkksContext, ext_ctx: CkksContext,
                            digit_size: int = 1):
    """Jitted sharded batched multiply+relin+rescale over a (batch, channel)
    mesh. Returns fn(c0a, c1a, c0b, c1b, key_a, key_b) -> (c0, c1).
    ``digit_size`` must be the key's stored decomposition width."""
    from .mesh import ct_spec_for, key_spec_for
    from ..keys import digit_groups

    child_ctx = ctx.drop_last(1)
    L = ctx.num_channels
    data_s = ct_spec_for(mesh, L)
    key_s = key_spec_for(mesh, len(digit_groups(L, min(digit_size, L))))
    out_s = ct_spec_for(mesh, L - 1)

    fn = functools.partial(
        _mul_relin_rescale_arrays,
        ctx=ctx,
        ext_ctx=ext_ctx,
        child_ctx=child_ctx,
        digit_size=digit_size,
    )
    # shape-aware specs: channel/digit axes shard only when divisible
    # (JAX requires divisibility; awkward ratios replicate the offending
    # axis — tested in test_sharding_edge.py)
    return jax.jit(
        fn,
        in_shardings=(data_s, data_s, data_s, data_s, key_s, key_s),
        out_shardings=(out_s, out_s),
    )


def build_rotate(mesh, ctx: CkksContext, ext_ctx: CkksContext, perm,
                 digit_size: int = 1):
    """Jitted sharded batched rotation (automorphism + gadget key switch).

    ``perm``: NTT-domain automorphism permutation for the key's rotation
    offset (ctx.automorphism_table_ntt(5^k mod 2N)) — a pure slot gather,
    no coefficient-domain round trip.
    """
    data_s = ct_spec(mesh)
    key_s = key_spec(mesh)

    def fn(c0, c1, key_a, key_b):
        from ..ops import modular as mm

        c0_rot = jnp.take(c0, perm, axis=-1)
        c1_rot = jnp.take(c1, perm, axis=-1)
        ks0, ks1 = _gadget_key_switch(
            c1_rot, key_a, key_b, ctx, ext_ctx, digit_size=digit_size
        )
        return mm.add_mod(c0_rot, ks0, ctx.chain), ks1

    return jax.jit(
        fn,
        in_shardings=(data_s, data_s, key_s, key_s),
        out_shardings=(data_s, data_s),
    )
