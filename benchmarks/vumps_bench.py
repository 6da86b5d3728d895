#!/usr/bin/env python
"""VUMPS throughput on one chip: iterations/s vs chi for the critical TFI
chain (exact thermodynamic energy density -4/pi).

Run on the real TPU (no JAX_PLATFORMS override); records the numbers
quoted in BASELINE.md.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks._timing import bracket, warmup


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import importlib
    from tensornetwork_tpu.models.mpo import FiniteTFI
    # models/__init__ re-exports the `vumps` *function*, shadowing the
    # module attribute — fetch the module itself
    V = importlib.import_module("tensornetwork_tpu.models.vumps")

    dtype = jnp.float32
    log(f"devices: {jax.devices()}")
    warmup()

    W = FiniteTFI(Jx=1.0, Bz=1.0, N=4, dtype=dtype).Ws[1]
    lams = V.mpo_diagonal_coefficients(W)
    exact = -4.0 / np.pi

    for chi in (64, 128):
        state = V.random_vumps_state(jax.random.PRNGKey(0), chi, 2, dtype)
        t0 = time.perf_counter()
        state, e, err, LW, RW, _ = V.vumps_iteration(state, W, lams)
        jax.block_until_ready(state.AC)
        compile_s = time.perf_counter() - t0
        # converge first so the timed iterations are steady-state
        for it in range(30):
            state, e, err, LW, RW, _ = V.vumps_iteration(state, W, lams)
        jax.block_until_ready(state.AC)
        k = 10
        # honest timing anchor: e depends on the whole chained iteration
        with bracket(lambda: e) as b:
            for _ in range(k):
                state, e, err, LW, RW, _ = V.vumps_iteration(state, W, lams)
        e, err = float(e), float(err)
        rate = k / b.seconds
        log(f"chi={chi}: {rate:.1f} iterations/s (compile {compile_s:.0f}s), "
            f"e = {e:.8f} (exact {exact:.8f}, delta {e - exact:.2e}), "
            f"|AC-AL C| = {err:.2e}")


if __name__ == "__main__":
    main()
