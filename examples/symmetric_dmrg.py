"""U(1)-symmetric two-site DMRG on the XXZ chain (reference analog:
``examples/dmrg/symmetric_dmrg.py``)."""
import os
import sys

if not os.environ.get("TN_TPU"):
    import jax
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, ".")

from tensornetwork_tpu.models.symmetric_dmrg import (
    SymmetricFiniteDMRG, u1_xxz_mpo, half_filled_mps)


def main(N=16, chi=32, sweeps=6):
    mpo = u1_xxz_mpo(Jz=1.0, Jxy=1.0, Bz=0.0, N=N)
    mps = half_filled_mps(N, chi, seed=0)
    dmrg = SymmetricFiniteDMRG(mps, mpo)
    e = dmrg.run_two_site(max_bond_dim=chi, num_sweeps=sweeps,
                          num_krylov_vecs=20, verbose=1)
    print(f"U(1) XXZ N={N} chi={chi}: E = {e:.12f}")
    return e


if __name__ == "__main__":
    main()
