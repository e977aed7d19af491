"""Mesh construction and sharding-spec helpers.

Replaces the reference's NCCL/DeepSpeed process-group plumbing
(train_ddp_spawn.py:159-162, configs/train-v01.yaml:178) with a
`jax.sharding.Mesh`. All collectives are inserted by XLA from the sharding
annotations; there is no hand-written communication anywhere in the framework.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_DEFAULT_MESH: Optional[Mesh] = None


def make_mesh(
    data: int = -1,
    tensor: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, tensor) mesh over the available devices.

    data=-1 means "all remaining devices". The data axis should map to the
    slower links last (DCN across hosts), which `jax.devices()` order already
    guarantees for TPU slices: ICI-adjacent devices are contiguous.
    """
    devices = list(devices if devices is not None else jax.devices())
    if data == -1:
        if len(devices) % tensor:
            raise ValueError(
                f"{len(devices)} devices not divisible by tensor={tensor}"
            )
        data = len(devices) // tensor
    devs = np.asarray(devices[: data * tensor]).reshape(data, tensor)
    return Mesh(devs, axis_names=("data", "tensor"))


def get_mesh(n_devices: Optional[int] = None) -> Mesh:
    """Process-wide default mesh (lazily built, data-parallel only)."""
    global _DEFAULT_MESH
    if _DEFAULT_MESH is None or (
        n_devices is not None and _DEFAULT_MESH.devices.size != n_devices
    ):
        devs = jax.devices()[:n_devices] if n_devices else None
        _DEFAULT_MESH = make_mesh(devices=devs)
    return _DEFAULT_MESH


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) axis over "data"."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def zero_partition_spec(tree, mesh: Mesh, axis: str = "data"):
    """ZeRO-style PartitionSpecs for an optimizer-state (or grads) pytree.

    Each leaf is sharded along its largest dimension divisible by the mesh
    axis size; leaves with no divisible dimension stay replicated. Matches
    DeepSpeed ZeRO-2's flat sharding of Adam moments (train-v01.yaml:178)
    without the flattening: XLA reduce-scatters grads into shard owners.
    """
    n = mesh.shape[axis]

    def spec_for(leaf):
        shape = getattr(leaf, "shape", ())
        if n == 1 or not shape:
            return P()
        order = sorted(range(len(shape)), key=lambda i: -shape[i])
        for i in order:
            if shape[i] % n == 0 and shape[i] >= n:
                return P(*[axis if j == i else None for j in range(len(shape))])
        return P()

    return jax.tree.map(spec_for, tree)


def named_shardings(specs, mesh: Mesh):
    """PartitionSpec pytree → NamedSharding pytree."""
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s),
        specs,
        is_leaf=lambda s: isinstance(s, P),
    )
