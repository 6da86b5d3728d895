"""Trotterized real-time evolution: exact state vs TEBD-MPS (reference
analog: ``examples/wavefunctions``)."""
import os
import sys

if not os.environ.get("TN_TPU"):
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

sys.path.insert(0, ".")

import jax.numpy as jnp
import numpy as np

from tensornetwork_tpu.models import FiniteMPS, tebd


def main(N=8, dt=0.02, steps=25):
    X = np.array([[0.0, 1.0], [1.0, 0.0]])
    Z = np.diag([1.0, -1.0])
    I = np.eye(2)
    h2 = -np.kron(X, X) - 0.5 * (np.kron(Z, I) + np.kron(I, Z))
    psi0 = np.zeros((2,) * N)
    psi0[(0,) * N] = 1.0
    psi_t = tebd.evolve_exact(jnp.asarray(psi0), h2, dt, steps)

    chi = 16
    As = np.zeros((N, chi, 2, chi)); As[:, 0, 0, 0] = 1.0
    mps = FiniteMPS(jnp.asarray(As), canonicalize=False)
    tebd.evolve_mps(mps, h2, dt, steps, max_singular_values=chi)
    blk = np.array(mps.to_dense())[0, ..., 0]
    blk /= np.linalg.norm(blk)
    fid = abs(np.vdot(blk.ravel(), np.asarray(psi_t).ravel()))
    print(f"TEBD vs exact fidelity after t={dt * steps:.2f}: {fid:.6f}")
    return fid


if __name__ == "__main__":
    main()
