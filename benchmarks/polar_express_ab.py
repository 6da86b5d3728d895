#!/usr/bin/env python
"""On-chip A/B: fixed-hybrid ns_polar vs LP-scheduled ns_polar_express
gauges (round 5).  Floor + rate on the batched B=256 chi=64 sweep and
the chi=512/1024 single-instance sweeps."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks._timing import warmup, bracket

REF_E = -40.384313161218365


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def single(chi, impl, n_conv, n_timed, m=10):
    from tensornetwork_tpu.models import FiniteTFI
    from tensornetwork_tpu.models.dmrg import one_site_sweep, \
        random_mps_stack
    N = 32
    mpo = FiniteTFI(Jx=1.0, Bz=1.0, N=N, dtype=jnp.float32)
    As = random_mps_stack(jax.random.PRNGKey(0), N, chi, 2, jnp.float32)
    res = one_site_sweep(As, mpo.Ws, mpo.vL, mpo.vR, num_krylov_vecs=m,
                         qr_impl=impl)
    jax.device_get(res.energy)
    res = one_site_sweep(res.As, mpo.Ws, mpo.vL, mpo.vR,
                         num_krylov_vecs=m, qr_impl=impl,
                         renvs=res.renvs)
    jax.device_get(res.energy)
    As, rv = res.As, res.renvs
    with bracket(lambda: res.energy) as b:
        for _ in range(n_conv + n_timed):
            res = one_site_sweep(As, mpo.Ws, mpo.vL, mpo.vR,
                                 num_krylov_vecs=m, qr_impl=impl,
                                 renvs=rv)
            As, rv = res.As, res.renvs
    # separate timing pass after convergence
    with bracket(lambda: res.energy) as b:
        for _ in range(n_timed):
            res = one_site_sweep(As, mpo.Ws, mpo.vL, mpo.vR,
                                 num_krylov_vecs=m, qr_impl=impl,
                                 renvs=rv)
            As, rv = res.As, res.renvs
    e = float(jax.device_get(res.energy))
    log(f"  chi={chi} {impl}: {n_timed / b.seconds:.2f} sweeps/s, "
        f"E-ref {e - REF_E:+.2e}")


def batched(impl, sweeps=12):
    from tensornetwork_tpu.models import FiniteTFI
    from tensornetwork_tpu.models.dmrg import random_mps_stack
    from tensornetwork_tpu.parallel.batch import batched_one_site_sweep
    B, N, chi, msz = 256, 32, 64, 10
    mpo = FiniteTFI(Jx=1.0, Bz=1.0, N=N, dtype=jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(1), B)
    As = jnp.stack([random_mps_stack(k, N, chi, 2, jnp.float32)
                    for k in keys])
    rv = None
    res = None
    for _ in range(3):   # compile + warm both traces
        res = batched_one_site_sweep(As, mpo.Ws, mpo.vL, mpo.vR,
                                     num_krylov_vecs=msz, qr_impl=impl,
                                     renvs=rv)
        As, rv = res.As, res.renvs
    jax.device_get(res.energy)
    t0 = time.perf_counter()
    for _ in range(sweeps):
        res = batched_one_site_sweep(As, mpo.Ws, mpo.vL, mpo.vR,
                                     num_krylov_vecs=msz, qr_impl=impl,
                                     renvs=rv)
        As, rv = res.As, res.renvs
    e = np.asarray(jax.device_get(res.energy), np.float64)
    dt = (time.perf_counter() - t0) / sweeps
    log(f"  batched B={B} {impl}: {B / dt:.0f} inst-sweeps/s, mean "
        f"E-ref {e.mean() - REF_E:+.2e}, max |dev| "
        f"{np.abs(e - REF_E).max():.1e}")


def main():
    log(f"devices: {jax.devices()}")
    warmup()
    for impl in ("polar", "polar_express"):
        batched(impl)
    for chi, nc, nt in ((512, 16, 8), (1024, 6, 4)):
        for impl in ("polar", "polar_express"):
            single(chi, impl, nc, nt)


if __name__ == "__main__":
    main()
