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
