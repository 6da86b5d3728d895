"""Intra-contraction (bond-dimension) sharding — the TP analog.

For a *single* chain whose bond dimension chi is too large for one chip
(the regime of the DMRG-on-TPU-pods literature), the contraction itself
is sharded: the MPS stack and the environments are laid out with their
chi axes split over a ``model`` mesh axis via ``NamedSharding``, the
sweep is jitted unchanged, and XLA partitions every dot_general and
inserts the all-reduces over ICI (SURVEY §2.10.4).  No communication
code is written by hand — the sharding annotations *are* the parallel
program.

The driver below runs at parity with the rest of the framework
(VERDICT r2 item 6): sweeps chain through ``SweepResult.renvs`` (the
re-canonicalization prepass is skipped from sweep 2 on) and the loop
contains NO per-sweep host fetch — energies accumulate as device
scalars and a single ``device_get`` at the end synchronizes the whole
chained computation (the honest-timing discipline of BASELINE.md).
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
    """One large-chi DMRG instance with bond axes sharded over the mesh.

    ``run_one_site``/``run_two_site`` mirror
    :class:`~tensornetwork_tpu.models.dmrg.FiniteDMRG` but keep the
    state in the TP layout between sweeps, chain ``renvs``, and sync
    with the host only once at the end (pass ``tol`` to opt back into
    per-sweep energy fetches for early stopping)."""

    def __init__(self, As, mpo: MPO, mesh: Mesh, axis: str = "model",
                 num_krylov_vecs: int = 10):
        self.mesh = mesh
        self.axis = axis
        self.As = shard_mps_for_tp(jnp.asarray(As), mesh, axis)
        self.mpo = replicate_mpo(mpo, mesh)
        self.num_krylov_vecs = num_krylov_vecs
        self.energies = []

    def _tp_spec(self):
        return NamedSharding(self.mesh, P(None, None, None, self.axis))

    def _run(self, sweep_fn, num_sweeps: int, tol: Optional[float],
             **kw) -> float:
        e_prev = None
        renvs = None
        pending = []
        spec = self._tp_spec()
        with self.mesh:
            for _ in range(num_sweeps):
                res = sweep_fn(
                    self.As, self.mpo.Ws, self.mpo.vL, self.mpo.vR,
                    num_krylov_vecs=self.num_krylov_vecs, renvs=renvs,
                    **kw)
                # keep the state in the TP layout; device_put is async —
                # no host sync here
                self.As = jax.device_put(res.As, spec)
                renvs = res.renvs
                pending.append(res.energy)
                if tol is not None:
                    e = float(res.energy)   # explicit opt-in sync
                    if e_prev is not None and abs(e - e_prev) < tol:
                        break
                    e_prev = e
        # ONE host sync for the whole chained run: the fetched energies
        # depend on every dispatched sweep
        self.energies.extend(float(e) for e in jax.device_get(pending))
        return self.energies[-1]

    def run_one_site(self, num_sweeps: int = 4,
                     tol: Optional[float] = None) -> float:
        return self._run(_dmrg.one_site_sweep, num_sweeps, tol)

    def run_two_site(self, num_sweeps: int = 4,
                     tol: Optional[float] = None, **kw) -> float:
        """Two-site TP sweep (truncation included); extra kwargs
        (``trunc_impl``/``trunc_orth``/...) pass through to
        :func:`~tensornetwork_tpu.models.dmrg.two_site_sweep`."""
        return self._run(_dmrg.two_site_sweep, num_sweeps, tol, **kw)
