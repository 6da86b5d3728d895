"""Intra-contraction (bond-dimension) sharding — the TP analog.

For a *single* chain whose bond dimension chi is too large for one chip
(the regime of the DMRG-on-TPU-pods literature), the contraction itself
is sharded: the MPS stack and the environments are laid out with their
chi axes split over a ``model`` mesh axis via ``NamedSharding``, the
sweep is jitted unchanged, and XLA partitions every dot_general and
inserts the all-reduces over ICI (SURVEY §2.10.4).  No communication
code is written by hand — the sharding annotations *are* the parallel
program.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tensornetwork_tpu.models import dmrg as _dmrg
from tensornetwork_tpu.models.mpo import MPO


def shard_mps_for_tp(As, mesh: Mesh, axis: str = "model"):
    """Shard the right-bond chi axis of the stacked MPS over ``axis``.

    The left-bond axis stays replicated so QR panels remain local; XLA
    re-shards intermediates as needed."""
    return jax.device_put(
        As, NamedSharding(mesh, P(None, None, None, axis)))


def replicate_mpo(mpo: MPO, mesh: Mesh) -> MPO:
    spec = NamedSharding(mesh, P())
    return MPO(jax.device_put(mpo.Ws, spec), jax.device_put(mpo.vL, spec),
               jax.device_put(mpo.vR, spec))


class TPShardedDMRG:
    """One large-chi DMRG instance with bond axes sharded over the mesh."""

    def __init__(self, As, mpo: MPO, mesh: Mesh, axis: str = "model",
                 num_krylov_vecs: int = 10):
        self.mesh = mesh
        self.axis = axis
        self.As = shard_mps_for_tp(jnp.asarray(As), mesh, axis)
        self.mpo = replicate_mpo(mpo, mesh)
        self.num_krylov_vecs = num_krylov_vecs
        self.energies = []

    def run_one_site(self, num_sweeps: int = 4, tol: float = 1e-10
                     ) -> float:
        e_prev = None
        with self.mesh:
            for _ in range(num_sweeps):
                res = _dmrg.one_site_sweep(
                    self.As, self.mpo.Ws, self.mpo.vL, self.mpo.vR,
                    num_krylov_vecs=self.num_krylov_vecs)
                # keep the output in the TP layout
                self.As = jax.device_put(
                    res.As,
                    NamedSharding(self.mesh, P(None, None, None,
                                               self.axis)))
                e = float(res.energy)
                self.energies.append(e)
                if e_prev is not None and abs(e - e_prev) < tol:
                    break
                e_prev = e
        return self.energies[-1]
