"""Device-mesh helpers: the DP analog (batch/channel sharding).

The reference scales throughput by calling its thread-shareable plan from
many CPU threads (/root/reference/include/pffft/pffft.h:102-106).  The TPU
equivalent is sharding the batch axis of one jitted call over a mesh and
letting XLA run every shard in parallel — no collectives on the FFT path at
all (each transform is independent).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "batch_sharding", "shard_batch"]


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Tuple[str, ...] = ("data",),
    shape: Optional[Tuple[int, ...]] = None,
) -> Mesh:
    """Build a mesh over the first ``n_devices`` available devices.

    Default is a 1-D ``('data',)`` mesh of all devices; pass ``shape`` and
    ``axis_names`` for 2-D (e.g. ``('data', 'seq')``) layouts.  On real TPU
    hardware jax orders devices so neighboring mesh coordinates ride ICI.
    """

    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    devs = devs[:n_devices]
    if shape is None:
        shape = (len(devs),) + (1,) * (len(axis_names) - 1)
    arr = np.asarray(devs).reshape(shape)
    return Mesh(arr, axis_names)


def batch_sharding(mesh: Mesh, ndim: int, axis: int = 0, mesh_axis: Optional[str] = None) -> NamedSharding:
    """NamedSharding that splits array axis ``axis`` over one mesh axis."""

    if mesh_axis is None:
        mesh_axis = mesh.axis_names[0]
    spec = [None] * ndim
    spec[axis] = mesh_axis
    return NamedSharding(mesh, P(*spec))


def shard_batch(x: jax.Array, mesh: Mesh, axis: int = 0, mesh_axis: Optional[str] = None) -> jax.Array:
    """Place ``x`` with its ``axis`` sharded over the mesh (DP placement)."""

    return jax.device_put(x, batch_sharding(mesh, x.ndim, axis, mesh_axis))
