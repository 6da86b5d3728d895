"""Checkpoint / resume for solver state.

The reference can snapshot networks to HDF5 but never persists *solver*
state — ``BaseMPS.save`` is ``NotImplementedError`` (reference
``base_mps.py:235-236``) and DMRG sweeps cannot resume.  Here the whole
solver state (MPS stack, MPO, energies, sweep cursor, RNG key) is one
pytree checkpointed with orbax — restart-safe long runs, as the build
plan requires (SURVEY §5)."""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def save_dmrg_state(path: str, dmrg, sweep: int = 0,
                    rng_key: Optional[jax.Array] = None) -> None:
    """Persist a FiniteDMRG (or BatchedDMRG) solver state."""
    state = {
        "As": np.asarray(jax.device_get(dmrg.As)),
        "Ws": np.asarray(jax.device_get(dmrg.mpo.Ws)),
        "vL": np.asarray(jax.device_get(dmrg.mpo.vL)),
        "vR": np.asarray(jax.device_get(dmrg.mpo.vR)),
        "energies": np.asarray(dmrg.energies or [0.0]),
        "sweep": np.asarray(sweep),
    }
    if rng_key is not None:
        state["rng_key"] = np.asarray(jax.device_get(rng_key))
    _checkpointer().save(os.path.abspath(path), state, force=True)


def load_dmrg_state(path: str) -> Dict[str, Any]:
    """Load the raw state dict; reconstruct a solver with
    ``restore_dmrg``."""
    return _checkpointer().restore(os.path.abspath(path))


def restore_dmrg(path: str):
    """Rebuild a FiniteDMRG from a checkpoint."""
    from tensornetwork_tpu.models.dmrg import FiniteDMRG
    from tensornetwork_tpu.models.mpo import MPO
    import jax.numpy as jnp
    state = load_dmrg_state(path)
    mpo = MPO(jnp.asarray(state["Ws"]), jnp.asarray(state["vL"]),
              jnp.asarray(state["vR"]))
    dmrg = FiniteDMRG(jnp.asarray(state["As"]), mpo)
    dmrg.energies = list(np.asarray(state["energies"]).reshape(-1))
    return dmrg, int(state["sweep"])


def save_pytree(path: str, tree: Any) -> None:
    """Generic pytree checkpoint (orbax)."""
    _checkpointer().save(os.path.abspath(path), tree, force=True)


def load_pytree(path: str) -> Any:
    return _checkpointer().restore(os.path.abspath(path))
