#!/usr/bin/env python
"""SP (chain-distributed) axis at scale (VERDICT r4 item 6).

Two measurements on the virtual CPU mesh:
1. comm table — collective bytes per outer iteration across
   (block count P) x (chi), from compiled HLO (the same structural
   proxy the TP/EP axes carry in BASELINE.md);
2. accuracy table — converged-energy delta of the exact
   (num_colors = P, sequential Gauss-Seidel wave) vs the approximate
   2-color (red/black) mode against the single-device sweep energy.

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       JAX_PLATFORMS=cpu python benchmarks/sp_scaling.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from benchmarks.weak_scaling import collective_stats


def log(*a):
    print(*a, flush=True)


def comm_table():
    from tensornetwork_tpu.models import FiniteTFI
    from tensornetwork_tpu.models.dmrg import random_mps_stack
    from tensornetwork_tpu.parallel.mesh import make_mesh
    from tensornetwork_tpu.parallel.sweep import DistributedDMRG

    dtype = jnp.float32
    log("| P (blocks) | chi | N | collectives/iteration | MB/iteration |")
    log("|---|---|---|---|---|")
    for P in (2, 4, 8):
        for chi in (32, 128):
            mesh = make_mesh((P,), ("sp",),
                             devices=jax.devices()[:P])
            N = 4 * P
            As = random_mps_stack(jax.random.PRNGKey(0), N, chi, 2, dtype)
            mpo = FiniteTFI(Jx=1.0, Bz=1.0, N=N, dtype=dtype)
            d = DistributedDMRG(As, mpo, mesh, num_krylov_vecs=10)
            txt = d._step.lower(d.As, d.Ws, d.vL,
                                d.vR).compile().as_text()
            counts, nbytes = collective_stats(txt)
            log(f"| {P} | {chi} | {N} | {dict(counts)} "
                f"| {nbytes / 1e6:.2f} |")


def accuracy_table():
    from tensornetwork_tpu.models import FiniteTFI
    from tensornetwork_tpu.models.dmrg import (one_site_sweep,
                                               random_mps_stack)
    from tensornetwork_tpu.parallel.mesh import make_mesh
    from tensornetwork_tpu.parallel.sweep import DistributedDMRG

    dtype = jnp.float32
    P, chi, N = 8, 32, 32
    mpo = FiniteTFI(Jx=1.0, Bz=1.0, N=N, dtype=dtype)
    As0 = random_mps_stack(jax.random.PRNGKey(0), N, chi, 2, dtype)
    # single-device reference energy at the same chi
    res = one_site_sweep(As0, mpo.Ws, mpo.vL, mpo.vR, num_krylov_vecs=10)
    for _ in range(11):
        res = one_site_sweep(res.As, mpo.Ws, mpo.vL, mpo.vR,
                             num_krylov_vecs=10, renvs=res.renvs)
    e_ref = float(res.energy)
    log(f"\nsingle-device reference (N={N} chi={chi}): E = {e_ref:.8f}")
    mesh = make_mesh((P,), ("sp",), devices=jax.devices()[:P])
    log("| mode | iterations | E | E - ref |")
    log("|---|---|---|---|")
    for colors, iters in ((P, 12), (2, 12), (2, 40)):
        d = DistributedDMRG(As0, mpo, mesh, num_krylov_vecs=10,
                            num_colors=colors)
        e = d.run(num_iterations=iters, tol=0.0)
        e_exact_state = d.energy()
        mode = "exact (P colors)" if colors == P else "red/black (2)"
        log(f"| {mode} | {iters} | {e_exact_state:.8f} "
            f"| {e_exact_state - e_ref:+.2e} |")


def main():
    log(f"devices: {len(jax.devices())}")
    comm_table()
    accuracy_table()


if __name__ == "__main__":
    main()
