"""Scale-invariant binary MERA for the critical Ising model (reference
analog: ``examples/simple_mera/simple_mera.py``)."""
import os
import sys

if not os.environ.get("TN_TPU"):
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

sys.path.insert(0, ".")

import numpy as np

from tensornetwork_tpu.models import mera


def main(num_layers=3, iterations=120):
    h3 = mera.blocked_ising_hamiltonian()
    state = mera.initialize_mera(4, num_layers=num_layers)
    state, e = mera.optimize_mera(h3, state, num_iterations=iterations)
    per_spin = e / 2.0
    print(f"MERA E/spin = {per_spin:.6f}  (exact -4/pi = "
          f"{-4 / np.pi:.6f})")
    return per_spin


if __name__ == "__main__":
    main()
