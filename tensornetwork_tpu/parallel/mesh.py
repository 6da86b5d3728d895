"""Device-mesh construction and sharding helpers.

The reference library has no multi-device execution of any kind
(SURVEY §2.10); this module is the communication-backend component the
TPU-native framework adds: named meshes over ICI/DCN, `NamedSharding`
layouts for the batch (DP-analog), bond (TP-analog) and chain (SP-analog)
axes, with XLA inserting the collectives.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    shape: Union[Tuple[int, ...], Sequence[int]],
    axis_names: Sequence[str] = ("data", "model"),
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a named device mesh.

    ``shape`` entries of -1 are inferred from the device count.  Uses
    ``mesh_utils.create_device_mesh`` so the mapping respects the physical
    ICI topology when running on a real slice.
    """
    devices = list(devices if devices is not None else jax.devices())
    shape = list(shape)
    n = len(devices)
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1]))
        shape[shape.index(-1)] = n // known
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {tuple(shape)} does not match "
                         f"{n} devices")
    if len(shape) != len(axis_names):
        raise ValueError("axis_names must match mesh rank")
    dev_array = mesh_utils.create_device_mesh(tuple(shape), devices=devices)
    return Mesh(dev_array, tuple(axis_names))


def batch_spec(mesh: Mesh, batch_axis: str = "data",
               ndim: int = 5) -> NamedSharding:
    """Sharding for a stacked batch of MPS instances: the leading (batch)
    axis is split across ``batch_axis``, everything else replicated."""
    return NamedSharding(mesh, P(batch_axis, *([None] * (ndim - 1))))


def shard_array(x, mesh: Mesh, spec: P):
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicate(x, mesh: Mesh):
    return jax.device_put(x, NamedSharding(mesh, P()))
