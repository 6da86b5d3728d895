#!/usr/bin/env python
"""Headline benchmark: one-site DMRG sweeps/s, TFI N=32 chi=64.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: google/TensorNetwork v0.4.6 (numpy backend — its fastest CPU
path for this config), measured in this container on 2026-08-17:
FiniteDMRG.run_one_site, TFI N=32, chi=64, num_krylov_vecs=10 →
0.26 s/sweep = 3.85 sweeps/s (see BASELINE.md).  vs_baseline is the
speedup of this framework's compiled sweep over that number.
"""
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_SWEEPS_PER_S = 3.85
REFERENCE_ENERGY = -40.384313161218365  # reference converged E, same config


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def main():
    from tensornetwork_tpu.models import FiniteTFI
    from tensornetwork_tpu.models.dmrg import one_site_sweep, random_mps_stack

    N, chi, m = 32, 64, 10
    dtype = jnp.float32
    log(f"devices: {jax.devices()}")
    mpo = FiniteTFI(Jx=1.0, Bz=1.0, N=N, dtype=dtype)
    As = random_mps_stack(jax.random.PRNGKey(0), N, chi, 2, dtype)

    # warm-up: compile + first device->host transfer (slow on tunneled envs)
    t0 = time.perf_counter()
    res = one_site_sweep(As, mpo.Ws, mpo.vL, mpo.vR, num_krylov_vecs=m)
    As = res.As
    e0 = float(res.energy)
    log(f"warmup (compile + transfer): {time.perf_counter() - t0:.1f}s, "
        f"E after sweep 1 = {e0:.8f}")

    k = 10
    t0 = time.perf_counter()
    for _ in range(k):
        res = one_site_sweep(As, mpo.Ws, mpo.vL, mpo.vR, num_krylov_vecs=m)
        As = res.As
    jax.block_until_ready(As)
    dt = time.perf_counter() - t0
    sweeps_per_s = k / dt
    e_final = float(res.energy)
    log(f"{k} sweeps in {dt:.3f}s -> {sweeps_per_s:.2f} sweeps/s; "
        f"E = {e_final:.6f} (reference converged: {REFERENCE_ENERGY:.6f}, "
        f"delta = {e_final - REFERENCE_ENERGY:.2e})")

    print(json.dumps({
        "metric": "dmrg_tfi_n32_chi64_sweeps_per_s",
        "value": round(sweeps_per_s, 3),
        "unit": "sweeps/s",
        "vs_baseline": round(sweeps_per_s / REFERENCE_SWEEPS_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
