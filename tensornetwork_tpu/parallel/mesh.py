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


# ---------------------------------------------------------------------------
# Multi-host ownership (SURVEY §2.10.5): process bring-up + DCN/ICI-aware
# hybrid meshes.  The reference has no distributed runtime at all; here the
# framework owns `jax.distributed.initialize()` and the host/chip mesh
# layout so solvers only ever see named axes.
# ---------------------------------------------------------------------------

_DISTRIBUTED_INITIALIZED = False


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None,
                           local_device_ids=None) -> bool:
    """Bring up the multi-process JAX runtime (one process per host).

    Safe to call unconditionally: a single-process environment (no
    coordinator configured anywhere) is left untouched and ``False`` is
    returned.  On TPU pods the arguments are auto-detected from the
    environment, so ``initialize_distributed()`` with no arguments is the
    whole multi-host bring-up."""
    global _DISTRIBUTED_INITIALIZED
    if _DISTRIBUTED_INITIALIZED:
        return True
    import os
    workers = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    multi_worker = len([w for w in workers.split(",") if w.strip()]) > 1
    has_cfg = (coordinator_address is not None
               or os.environ.get("JAX_COORDINATOR_ADDRESS")
               or os.environ.get("COORDINATOR_ADDRESS")
               or multi_worker
               or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"))
    if not has_cfg:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id,
        local_device_ids=local_device_ids)
    _DISTRIBUTED_INITIALIZED = True
    return True


def make_hybrid_mesh(
    ici_shape: Tuple[int, ...],
    dcn_shape: Tuple[int, ...],
    axis_names: Sequence[str],
    devices: Optional[Sequence] = None,
) -> Mesh:
    """DCN x ICI mesh: the leading ``dcn_shape`` axes partition across
    hosts/slices (slow network — put the batch/data axis here), the
    trailing ``ici_shape`` axes partition inside a slice (fast
    interconnect — bond/chain axes).  ``axis_names`` names the dcn axes
    first, then the ici axes.

    Uses ``mesh_utils.create_hybrid_device_mesh`` when devices span
    multiple processes; in a single-process environment (tests, one chip)
    the same layout is emulated by splitting the device list evenly, so
    sharding code is identical either way."""
    devices = list(devices if devices is not None else jax.devices())
    if len(dcn_shape) + len(ici_shape) != len(axis_names):
        raise ValueError("axis_names must cover dcn + ici axes")
    n_needed = int(np.prod(dcn_shape, dtype=np.int64)) * int(
        np.prod(ici_shape, dtype=np.int64))
    if n_needed != len(devices):
        raise ValueError(f"mesh {tuple(dcn_shape)}x{tuple(ici_shape)} "
                         f"needs {n_needed} devices, got {len(devices)}")
    n_procs = len({d.process_index for d in devices})
    if n_procs > 1:
        dev_array = mesh_utils.create_hybrid_device_mesh(
            tuple(ici_shape), tuple(dcn_shape), devices=devices)
    else:
        # single-process emulation: contiguous blocks play the role of
        # slices (the layout seen by sharding code is identical)
        dev_array = np.asarray(devices).reshape(
            tuple(dcn_shape) + tuple(ici_shape))
    return Mesh(dev_array, tuple(axis_names))


def pod_layout(n_hosts: Optional[int] = None,
               devices: Optional[Sequence] = None) -> Mesh:
    """Recommended pod mesh for the solver suite: ``("host", "model")`` —
    instance/batch (DP) sharding over the DCN ``host`` axis, bond/chain
    (TP/SP) sharding over the ICI ``model`` axis within each host."""
    devices = list(devices if devices is not None else jax.devices())
    if n_hosts is None:
        n_hosts = max(len({d.process_index for d in devices}), 1)
    per_host = len(devices) // n_hosts
    if n_hosts * per_host != len(devices):
        raise ValueError(f"{len(devices)} devices do not split over "
                         f"{n_hosts} hosts")
    return make_hybrid_mesh((per_host,), (n_hosts,), ("host", "model"),
                            devices=devices)
