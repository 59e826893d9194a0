"""Device-mesh construction and sharding specs for CKKS workloads.

The natural parallel axes of RNS-CKKS (SURVEY.md §2.4):

- ``channel``: RNS residue channels are embarrassingly parallel for NTT,
  add and pointwise multiply (the reference's per-channel loops,
  poly.rs:140-147). This is the tensor-parallel axis; the only collectives
  it induces are the all-gather of plain residues inside the gadget
  decomposition and the broadcast of the dropped channel during rescale.
- ``batch``: independent ciphertexts (the data-parallel axis; the
  reference processes one ct at a time, e.g. rotation_stress.rs:68-77).

Sharded execution uses GSPMD: ops are jitted with NamedSharding
annotations and XLA inserts the all-gathers over ICI. Residue-plane layout
is (batch, L, 2, N) with L sharded on ``channel`` and N left unsharded
(the NTT stays chip-local; coefficient-axis sharding via a 4-step NTT with
all_to_all is the planned follow-up for huge N).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_ckks_mesh(
    n_devices: int | None = None,
    batch: int = 1,
    devices=None,
) -> Mesh:
    """Build a (batch, channel) mesh over ``n_devices`` devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if batch < 1 or n_devices % batch:
        raise ValueError("batch axis size must divide device count")
    arr = np.array(devices[:n_devices]).reshape(batch, n_devices // batch)
    return Mesh(arr, axis_names=("batch", "channel"))


def make_multihost_mesh(
    hosts: int | None = None,
    chips_per_host: int | None = None,
    batch_per_host: int = 1,
    devices=None,
) -> Mesh:
    """(host, batch, channel) mesh for multi-host (DCN + ICI) topologies.

    Axis placement doctrine (SURVEY.md §2.4 "Communication backend",
    specs: DCN for multi-host):

    - ``host`` (outermost, rides DCN): ONLY the batch/data-parallel axis.
      Independent ciphertexts never communicate, so the slow inter-host
      fabric carries zero traffic during homomorphic ops; hosts exchange
      data only at input distribution / output collection.
    - ``batch``/``channel`` (within a host, ride ICI): as in
      ``make_ckks_mesh`` — channel-sharded NTT/pointwise with the gadget
      digit psum and the rescale broadcast of the dropped channel as the
      only intra-host collectives.

    Rescale-broadcast plan over DCN (documented; single-host hardware here
    cannot execute it): if the channel axis were ever split across hosts,
    the dropped channel's inverse-NTT'd plane (N * 4 bytes) must reach
    every other channel shard. The layout above avoids that by
    construction; a future channel-over-DCN variant should instead
    (a) replicate q_last's shard on every host (its plane is read-only
    after the multiply), or (b) pipeline the broadcast behind the next
    multiply's tensor product, which needs no cross-channel data.
    Until multi-host hardware is reachable, this function only validates
    shapes and returns the mesh; jit/GSPMD handle the rest unchanged.
    """
    if devices is None:
        devices = jax.devices()
    if hosts is None:
        hosts = max(1, jax.process_count())
    if chips_per_host is None:
        chips_per_host = len(devices) // hosts
    total = hosts * chips_per_host
    if total > len(devices):
        raise ValueError(
            f"need {total} devices for {hosts} hosts x {chips_per_host}, "
            f"have {len(devices)}"
        )
    if batch_per_host < 1 or chips_per_host % batch_per_host:
        raise ValueError("batch_per_host must divide chips_per_host")
    arr = np.array(devices[:total]).reshape(
        hosts, batch_per_host, chips_per_host // batch_per_host
    )
    return Mesh(arr, axis_names=("host", "batch", "channel"))


def ct_spec_mh(mesh: Mesh, batched: bool = True) -> NamedSharding:
    """Ciphertext spec on a (host, batch, channel) mesh: the batch axis is
    sharded over host x batch (data parallel on both fabrics), channels
    over the intra-host channel axis."""
    if batched:
        return NamedSharding(mesh, P(("host", "batch"), "channel", None, None))
    return NamedSharding(mesh, P("channel", None, None))


def key_spec_mh(mesh: Mesh) -> NamedSharding:
    """Gadget keys on a (host, batch, channel) mesh: digit axis over the
    intra-host channel axis, replicated across hosts (keys are read-only;
    replication keeps the digit psum on ICI)."""
    return NamedSharding(mesh, P("channel", None, None, None))


def ct_spec(mesh: Mesh, batched: bool = True) -> NamedSharding:
    """Sharding for ciphertext residue planes (B, L, 2, N) / (L, 2, N)."""
    if batched:
        return NamedSharding(mesh, P("batch", "channel", None, None))
    return NamedSharding(mesh, P("channel", None, None))


def key_spec(mesh: Mesh) -> NamedSharding:
    """Sharding for gadget key stacks (digit, L+1, 2, N): shard the digit
    axis over the ``channel`` mesh axis (digit count == L == channel count).

    With digits sharded, each device forms its local alpha_i * key_i
    products and the digit-sum becomes a psum over ICI — the
    "gadget-decomposition reduction" collective of SURVEY.md §2.4. The
    raised channel axis (L+1, indivisible) stays local."""
    return NamedSharding(mesh, P("channel", None, None, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def ct_spec_for(mesh: Mesh, num_channels: int,
                batched: bool = True) -> NamedSharding:
    """Shape-aware ciphertext sharding: channel-sharded when the channel
    count divides the mesh axis, otherwise replicated on that axis (JAX
    NamedShardings require divisibility; replication is the honest
    fallback for awkward L / axis ratios — e.g. the L-1 channels after a
    rescale on an L-wide axis)."""
    if num_channels % mesh.shape["channel"] == 0:
        return ct_spec(mesh, batched)
    if batched:
        return NamedSharding(mesh, P("batch", None, None, None))
    return NamedSharding(mesh, P(None, None, None))


def key_spec_for(mesh: Mesh, num_digits: int) -> NamedSharding:
    """Shape-aware gadget-key sharding: digit-axis sharded when the digit
    count divides the channel axis (the psum-over-digits collective),
    otherwise replicated (e.g. digit_size>1 keys whose D < axis)."""
    if num_digits % mesh.shape["channel"] == 0:
        return key_spec(mesh)
    return NamedSharding(mesh, P(None, None, None, None))
