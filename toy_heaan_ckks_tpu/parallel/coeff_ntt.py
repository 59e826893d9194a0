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

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.ntt_pallas import (
    _add_mod,
    _butterfly_args,
    _harvey_mul,
    _layout,
    _planes_cached,
    _shift,
    _sub_mod,
)


def _tail_kernel(q_ref, x_ref, w_ref, wp_ref, o_ref,
                 *, n: int, r: int, c: int, s0: int, s_count: int,
                 inverse: bool):
    """Fused local stages (s in [s0, s_count)) on a VMEM-resident slab.

    The slab holds S = n / 2^{s0_cross} contiguous coefficients; every
    stage in the range has distance d < S with aligned groups, so the
    butterflies never leave the slab and the stage body is identical to
    the single-chip fused kernel's, just with this shard's twiddle
    slices. Canonical [0, q) in and out (the jnp cross-shard stages on
    either side expect canonical residues).
    """
    ch = pl.program_id(0)
    q = q_ref[ch, 0]
    x = x_ref[0, 0]
    stage_order = (
        range(s_count - 1, s0 - 1, -1) if inverse else range(s0, s_count)
    )
    for s in stage_order:
        d = n >> (s + 1)
        axis, amount, mask = _butterfly_args(n, r, c, d)
        w = w_ref[0, s - s0].reshape(r, c)
        wp = wp_ref[0, s - s0].reshape(r, c)
        v_at_u = _shift(x, amount, axis)
        u_at_v = _shift(x, -amount, axis)
        if inverse:
            total = _add_mod(x, v_at_u, q)
            diff = _sub_mod(u_at_v, x, q)
            x = jnp.where(mask, total, _harvey_mul(diff, w, wp, q))
        else:
            operand = jnp.where(mask, v_at_u, x)
            wv = _harvey_mul(operand, w, wp, q)
            x = jnp.where(mask, _add_mod(x, wv, q), _sub_mod(u_at_v, wv, q))
    o_ref[0, 0] = x


@functools.partial(
    jax.jit,
    static_argnames=("n", "s0", "s_count", "inverse", "interpret"),
)
def _local_tail_pallas(x, w_slab, wp_slab, q_col, *, n: int, s0: int,
                       s_count: int, inverse: bool, interpret: bool):
    """x: (B, L, S) local slab; w/wp_slab: (L, tail, S) local twiddles."""
    B, L, S = x.shape
    r, c = _layout(S)
    tail = s_count - s0
    x4 = x.reshape(B, L, r, c)

    kernel = functools.partial(
        _tail_kernel, n=n, r=r, c=c, s0=s0, s_count=s_count, inverse=inverse
    )
    smem = lambda: pl.BlockSpec(
        (L, 1), lambda ch, o: (0, 0), memory_space=pltpu.SMEM
    )
    data_spec = lambda: pl.BlockSpec(
        (1, 1, r, c), lambda ch, o: (o, ch, 0, 0), memory_space=pltpu.VMEM
    )
    plane_spec = lambda: pl.BlockSpec(
        (1, tail, r, c), lambda ch, o: (ch, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        kernel,
        grid=(L, B),
        in_specs=[smem(), data_spec(), plane_spec(), plane_spec()],
        out_specs=data_spec(),
        out_shape=jax.ShapeDtypeStruct(x4.shape, jnp.uint32),
        interpret=interpret,
    )(q_col, x4, w_slab.reshape(L, tail, r, c),
      wp_slab.reshape(L, tail, r, c))
    return out.reshape(B, L, S)


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


def _cross_stage_remote_kernel(x_ref, w_ref, wp_ref, q_ref, o_ref,
                               partner_buf, send_sem, recv_sem,
                               *, shift: int, axis: str, inverse: bool):
    """ONE cross-shard butterfly stage via Pallas async remote DMA.

    The butterfly pairs shard my_id with my_id ^ shift (aligned
    power-of-two groups), so each device sends its whole slab to its
    partner and receives the partner's — a bidirectional exchange whose
    transfer overlaps the local twiddle multiply setup (pattern:
    SNIPPETS.md item [1] / pallas distributed docs). The d >= S stage has
    no intra-slab mask: the entire slab is the u or v side of its group.
    """
    my_id = jax.lax.axis_index(axis)
    partner = my_id ^ shift
    copy = pltpu.make_async_remote_copy(
        src_ref=x_ref,
        dst_ref=partner_buf,
        send_sem=send_sem,
        recv_sem=recv_sem,
        device_id=partner,
        device_id_type=pltpu.DeviceIdType.LOGICAL,
    )
    copy.start()
    copy.wait()
    x = x_ref[...]
    v = partner_buf[...]
    w = w_ref[...]
    wp = wp_ref[...]
    q = q_ref[...]
    is_u = (my_id & shift) == 0
    if inverse:
        # GS: out_u = x_u + x_v ; out_v = (x_u - x_v) * w
        u_out = _add_mod(x, v, q)
        v_out = _harvey_mul(_sub_mod(v, x, q), w, wp, q)
    else:
        # CT: out_u = x_u + w*x_v ; out_v = x_u - w*x_v
        u_out = _add_mod(x, _harvey_mul(v, w, wp, q), q)
        v_out = _sub_mod(v, _harvey_mul(x, w, wp, q), q)
    o_ref[...] = jnp.where(is_u, u_out, v_out)


def _cross_stage_remote(x, w, wp, q3, *, shift: int, axis: str,
                        inverse: bool, interpret: bool):
    """x: (B, L, S) local slab; w/wp: (L, S) stage twiddle slices."""
    B, L, S = x.shape
    kernel = functools.partial(
        _cross_stage_remote_kernel, shift=shift, axis=axis, inverse=inverse
    )
    return pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, L, S), jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((B, L, S), jnp.uint32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(collective_id=13),
    )(x, w, wp, q3)


def _pair(x):
    """(..., 2, S) limb array -> (lo, hi) u64-pair tuple."""
    return x[..., 0, :], x[..., 1, :]


def _unpair(p):
    return jnp.stack([p[0], p[1]], axis=-2)


def _stage_body_wide(x, w, wp, q2, d: int, g_base, axis: str,
                     inverse: bool):
    """One distance-d butterfly stage on a wide local slab (..., L, 2, S).

    2-limb Harvey-Shoup arithmetic (ops/ntt_pallas_wide helpers on u64
    limb pairs), canonical [0, q) in and out per stage — the same
    in-place formulation as the small ``_stage_body``, so residues are
    bit-exact with the single-chip wide kernel/oracle."""
    from ..ops.ntt_pallas_wide import _add_mod64, _harvey64, _sub_mod64
    from ..ops.u64 import select64

    s_len = x.shape[-1]
    local = jax.lax.broadcasted_iota(jnp.int32, (1, s_len), 1)[0]
    g_idx = g_base + local
    mask = (g_idx % (2 * d)) < d

    if d < s_len:
        v_at_u = jnp.roll(x, -d, axis=-1)
        u_at_v = jnp.roll(x, d, axis=-1)
    else:
        # cross-shard: every shard is entirely the u or the v side of
        # its group (d is a multiple of the slab size), so ONE
        # symmetric XOR-partner exchange serves both butterfly roles —
        # partner holds x_v on u shards and x_u on v shards, exactly
        # the operand each side consumes (the mask discards the other
        # arm). One collective per stage instead of two ring ppermutes;
        # two independent in-flight ppermutes also deadlock
        # nondeterministically on the forced-host multi-device CPU
        # backend (observed in round 5), which this sidesteps.
        shift = d // s_len
        n_sh = jax.lax.axis_size(axis)
        pairs = [(i ^ shift, i) for i in range(n_sh)]
        partner = jax.lax.ppermute(x, axis, perm=pairs)
        v_at_u = u_at_v = partner

    px, pv, pu = _pair(x), _pair(v_at_u), _pair(u_at_v)
    pw, pwp = _pair(w), _pair(wp)
    q = (q2[:, 0, None], q2[:, 1, None])
    if inverse:
        total = _add_mod64(px, pv, q)
        t = _harvey64(_sub_mod64(pu, px, q), pw, pwp, q)
        return _unpair(select64(mask, total, t))
    operand = select64(mask, pv, px)
    t = _harvey64(operand, pw, pwp, q)
    return _unpair(
        select64(mask, _add_mod64(px, t, q), _sub_mod64(pu, t, q))
    )


def build_coeff_sharded_ntt_wide(mesh: Mesh, moduli: tuple, degree: int,
                                 inverse: bool, axis: str = "coeff"):
    """Coefficient-sharded NTT for WIDE chains (q < 2^62, 2-limb data).

    fn(x): (..., L, 2, N) uint32 Montgomery limb pairs with N sharded on
    ``mesh[axis]`` -> same shape/sharding, bit-exact with the
    single-chip wide kernel (ops/ntt_pallas_wide) and the jnp oracle.
    Cross-shard stages (d >= slab) are ppermute pairs exactly like the
    small path; local stages run as jnp limb-pair Harvey butterflies
    under shard_map (no Pallas local tail yet — the wide tail kernel is
    a follow-up; this builder is the correctness + comm-pattern path the
    multichip dryrun exercises)."""
    from ..ops.ntt_pallas_wide import _harvey64, _planes_cached_wide
    from ..ops.poly import _on_tpu  # noqa: F401 (parity with small)

    moduli = tuple(int(m) for m in moduli)
    n = degree
    fwd_w, fwd_wp, inv_w, inv_wp, q_arr, ninv, ninvp = _planes_cached_wide(
        moduli, n
    )
    w_planes, wp_planes = (inv_w, inv_wp) if inverse else (fwd_w, fwd_wp)

    s_count = n.bit_length() - 1
    n_sh = mesh.shape[axis]
    if n % n_sh or (n // n_sh) & ((n // n_sh) - 1):
        raise ValueError("coefficient shards must be a power-of-two size")

    # numpy closures (inlined as literals at trace time, like the small
    # builder's q_col) — a jnp.asarray here would be COMMITTED to device
    # 0 and force cross-device transfers into every shard's program
    q2 = np.asarray(q_arr)  # (L, 2)
    ninv2 = np.asarray(ninv)
    ninvp2 = np.asarray(ninvp)

    def local_fn(x, w, wp):
        # x: (B, L, 2, S); w/wp: (L, S_stages, 2, S) local twiddles
        p = jax.lax.axis_index(axis)
        s_len = x.shape[-1]
        g_base = (p * s_len).astype(jnp.int32)
        for s in (range(s_count - 1, -1, -1) if inverse
                  else range(s_count)):
            d = n >> (s + 1)
            x = _stage_body_wide(
                x, w[:, s], wp[:, s], q2, d, g_base, axis, inverse
            )
            # materialize between stages: without this, the SPMD CPU
            # pipeline fuses the whole stage chain into one expression
            # and re-evaluates shared subterms per consumer — measured
            # ~6x runtime PER STAGE (2.4s at 3 stages, 15s at 4,
            # unbounded at 5+) on the 8-virtual-device mesh. The
            # barrier restores linear cost; each stage is a full-slab
            # pass anyway, so materializing it is the intended schedule
            x = jax.lax.optimization_barrier(x)
        if inverse:
            from ..ops.u64 import select64  # noqa: F401

            px = _pair(x)
            q = (q2[:, 0, None], q2[:, 1, None])
            nv = (ninv2[:, 0, None], ninv2[:, 1, None])
            nvp = (ninvp2[:, 0, None], ninvp2[:, 1, None])
            x = _unpair(_harvey64(px, nv, nvp, q))
        return x

    from jax import shard_map

    smap = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(
            P(None, None, None, axis),
            P(None, None, None, axis),
            P(None, None, None, axis),
        ),
        out_specs=P(None, None, None, axis),
        check_vma=False,
    )

    w_dev = jax.device_put(
        jnp.asarray(w_planes),
        NamedSharding(mesh, P(None, None, None, axis)),
    )
    wp_dev = jax.device_put(
        jnp.asarray(wp_planes),
        NamedSharding(mesh, P(None, None, None, axis)),
    )

    @jax.jit
    def fn(x):
        lead = x.shape[:-3]
        L = x.shape[-3]
        x4 = x.reshape(-1, L, 2, n)
        out = smap(x4, w_dev, wp_dev)
        return out.reshape(*lead, L, 2, n)

    return fn


def build_coeff_sharded_ntt(mesh: Mesh, moduli: tuple, degree: int,
                            inverse: bool, axis: str = "coeff",
                            use_pallas: bool | None = None,
                            interpret: bool = False,
                            remote_dma: bool = False):
    """Jitted NTT over lo planes (..., L, N) with N sharded on ``axis``.

    Returns fn(x) -> same shape/sharding; bit-exact with the single-chip
    tree NTT (ops/ntt_pallas semantics). The cross-shard stages
    (d >= slab size, one ppermute pair each) run as jnp under shard_map;
    the local stages (d < slab) run as ONE fused Pallas kernel per shard
    when ``use_pallas`` (defaults to True on TPU backends) — without it a
    multi-chip run would forfeit the single-chip fused-kernel win, paying
    log2(S) HBM round trips per channel plane. ``remote_dma`` swaps each
    cross-shard ppermute pair for the Pallas async-remote-copy exchange
    kernel (one bidirectional slab DMA per stage).
    """
    from ..ops.poly import _on_tpu

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
    s_local = n // n_sh
    cross = max(0, n_sh.bit_length() - 1)  # stages with d >= s_local
    if use_pallas is None:
        use_pallas = _on_tpu() and s_local >= 128

    q_col = np.asarray(q_arr)  # (L, 1), replicated closure constant

    def local_fn(x, w, wp):
        # x: (B, L, S) local slab; w/wp: (L, stages, S) local twiddles
        p = jax.lax.axis_index(axis)
        s_len = x.shape[-1]
        g_base = (p * s_len).astype(jnp.int32)

        def jnp_stages(x, lo, hi):
            for s in (range(hi - 1, lo - 1, -1) if inverse
                      else range(lo, hi)):
                d = n >> (s + 1)
                if remote_dma and d >= s_len:
                    x = _cross_stage_remote(
                        x, w[:, s], wp[:, s], q_col,
                        shift=d // s_len, axis=axis, inverse=inverse,
                        interpret=interpret,
                    )
                else:
                    x = _stage_body(
                        x, w[:, s], wp[:, s], q_col, d, g_base, inverse
                    )
            return x

        if use_pallas and cross < s_count:
            tail = lambda x: _local_tail_pallas(
                x, w[:, cross:], wp[:, cross:], q_col,
                n=n, s0=cross, s_count=s_count, inverse=inverse,
                interpret=interpret,
            )
            if inverse:
                x = tail(x)
                x = jnp_stages(x, 0, cross)
            else:
                x = jnp_stages(x, 0, cross)
                x = tail(x)
        else:
            x = jnp_stages(x, 0, s_count)
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
        # pallas_call outputs carry no varying-mesh-axis annotation
        check_vma=False,
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
