"""Coefficient-axis sharded negacyclic NTT (ring degree N across chips).

Scaling axis: ring degree. When one chip's VMEM/HBM can't hold the
coefficient plane (or latency must shrink), the N axis is sharded over a
mesh axis and the NTT runs as a distributed butterfly network
(SURVEY.md §2.4 "Coefficient-block parallelism": the reference's
Cooley-Tukey stage structure, src/rings/backends/rns_ntt/poly.rs:593-615,
re-expressed as collective exchanges).

Structure: with P shards of S = N/P contiguous coefficients, the in-place
distance-d butterfly stages split cleanly:

  - d >= S (first log2(P) stages): the partner element lives exactly
    d/S shards away at the same local offset -> one ``ppermute`` per
    direction over the mesh axis (ICI neighbor traffic, no all-to-all);
    the butterfly mask/twiddle are uniform per shard.
  - d <  S (remaining stages): butterfly groups are 2d <= S wide and
    aligned, so they never straddle a shard boundary -> purely local.

Twiddle planes are the same expanded per-stage (L, S_stages, N) tables as
the fused Pallas kernel, sharded on N alongside the data, so the stage
body is uniform code. Results are bit-exact with the single-chip kernel
(identical in-place layout, identical modular arithmetic).

Small-prime chains (q < 2^31, lo-plane data (..., L, N)); the jnp stage
body runs under ``shard_map`` and compiles on any backend (tests use an
8-device CPU mesh; on TPU the local stages could further delegate to the
Pallas kernel).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.ntt_pallas import (
    _add_mod,
    _harvey_mul,
    _planes_cached,
    _sub_mod,
)


def _stage_body(x, w, wp, q, d: int, g_base, inverse: bool):
    """One distance-d butterfly stage on a local slab (..., L, S)."""
    s_len = x.shape[-1]
    local = jax.lax.broadcasted_iota(jnp.int32, (1, s_len), 1)[0]
    g_idx = g_base + local  # global coefficient indices of this slab
    mask = (g_idx % (2 * d)) < d

    if d < s_len:
        v_at_u = jnp.roll(x, -d, axis=-1)
        u_at_v = jnp.roll(x, d, axis=-1)
    else:
        # cross-shard: partner is d // s_len shards away, same offset
        shift = d // s_len
        axis = "coeff"
        n_sh = jax.lax.axis_size(axis)
        fwd = [((i + shift) % n_sh, i) for i in range(n_sh)]
        bwd = [((i - shift) % n_sh, i) for i in range(n_sh)]
        v_at_u = jax.lax.ppermute(x, axis, perm=fwd)
        u_at_v = jax.lax.ppermute(x, axis, perm=bwd)

    if inverse:
        total = _add_mod(x, v_at_u, q)
        diff = _sub_mod(u_at_v, x, q)
        return jnp.where(mask, total, _harvey_mul(diff, w, wp, q))
    operand = jnp.where(mask, v_at_u, x)
    wv = _harvey_mul(operand, w, wp, q)
    return jnp.where(mask, _add_mod(x, wv, q), _sub_mod(u_at_v, wv, q))


def build_coeff_sharded_ntt(mesh: Mesh, moduli: tuple, degree: int,
                            inverse: bool, axis: str = "coeff"):
    """Jitted NTT over lo planes (..., L, N) with N sharded on ``axis``.

    Returns fn(x) -> same shape/sharding; bit-exact with the single-chip
    tree NTT (ops/ntt_pallas semantics).
    """
    moduli = tuple(int(m) for m in moduli)
    n = degree
    fwd_w, fwd_wp, inv_w, inv_wp, q_arr, ninv, ninvp = _planes_cached(
        moduli, n
    )
    w_planes, wp_planes = (inv_w, inv_wp) if inverse else (fwd_w, fwd_wp)

    s_count = n.bit_length() - 1
    n_sh = mesh.shape[axis]
    if n % n_sh or (n // n_sh) & ((n // n_sh) - 1):
        raise ValueError("coefficient shards must be a power-of-two size")

    q_col = np.asarray(q_arr)  # (L, 1), replicated closure constant

    def local_fn(x, w, wp):
        # x: (B, L, S) local slab; w/wp: (L, stages, S) local twiddles
        p = jax.lax.axis_index(axis)
        s_len = x.shape[-1]
        g_base = (p * s_len).astype(jnp.int32)
        stage_order = (
            range(s_count - 1, -1, -1) if inverse else range(s_count)
        )
        for s in stage_order:
            d = n >> (s + 1)
            x = _stage_body(x, w[:, s], wp[:, s], q_col, d, g_base, inverse)
        if inverse:
            x = _harvey_mul(x, ninv, ninvp, q_col)
        return x

    from jax import shard_map

    smap = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(
            P(None, None, axis),
            P(None, None, axis),
            P(None, None, axis),
        ),
        out_specs=P(None, None, axis),
    )

    w_dev = jax.device_put(
        jnp.asarray(w_planes), NamedSharding(mesh, P(None, None, axis))
    )
    wp_dev = jax.device_put(
        jnp.asarray(wp_planes), NamedSharding(mesh, P(None, None, axis))
    )

    @jax.jit
    def fn(x):
        lead = x.shape[:-2]
        L = x.shape[-2]
        x3 = x.reshape(-1, L, n)
        out = smap(x3, w_dev, wp_dev)
        return out.reshape(*lead, L, n)

    return fn
