"""One-site DMRG on the transverse-field Ising chain — the headline
compiled-sweep workload (reference analog: ``examples/dmrg``)."""
import os
import sys
import time

if not os.environ.get("TN_TPU"):
    import jax
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, ".")

import jax
import numpy as np

from tensornetwork_tpu.models import FiniteTFI, FiniteDMRG
from tensornetwork_tpu.models.dmrg import random_mps_stack


def main(N=32, chi=64, sweeps=6):
    mpo = FiniteTFI(Jx=1.0, Bz=1.0, N=N, dtype=jax.numpy.float64
                    if jax.config.jax_enable_x64 else jax.numpy.float32)
    mps = random_mps_stack(jax.random.PRNGKey(0), N, chi,
                           dtype=mpo.Ws.dtype)
    dmrg = FiniteDMRG(mps, mpo)
    t0 = time.perf_counter()
    e = dmrg.run_one_site(num_sweeps=sweeps, num_krylov_vecs=10, verbose=1)
    dt = time.perf_counter() - t0
    print(f"E = {e:.12f}  ({sweeps} sweeps in {dt:.2f}s)")
    return e


if __name__ == "__main__":
    main()
