#!/usr/bin/env python
"""One-process TPU session: two-site long-run stability at the new
default (trunc_orth='polar') + single-instance chi-scaling with the
two-pass fused Lanczos (VERDICT r1 item 3), honest device_get timing."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp
import numpy as np

REF_E = -40.384313161218365


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def two_site_longrun():
    from tensornetwork_tpu.models import FiniteTFI
    from tensornetwork_tpu.models.dmrg import random_mps_stack
    from tensornetwork_tpu.parallel.batch import batched_two_site_sweep

    B, N, chi, m = 256, 32, 64, 10
    mpo = FiniteTFI(Jx=1.0, Bz=1.0, N=N, dtype=jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(1), B)
    As = jnp.stack([random_mps_stack(k, N, chi, 2, jnp.float32)
                    for k in keys])
    rv = None
    times = []
    for sweep in range(15):
        t0 = time.perf_counter()
        res = batched_two_site_sweep(As, mpo.Ws, mpo.vL, mpo.vR,
                                     num_krylov_vecs=m,
                                     trunc_impl="subspace", renvs=rv)
        As, rv = res.As, res.renvs
        e = np.asarray(jax.device_get(res.energy), np.float64)
        times.append(time.perf_counter() - t0)
        if sweep % 3 == 0 or sweep == 14:
            log(f"  sweep {sweep:2d}: {times[-1]:6.2f}s  "
                f"mean E-ref {e.mean() - REF_E:+.2e}  "
                f"max dev {np.abs(e - REF_E).max():.2e}")
    steady = float(np.mean(times[3:]))
    log(f"two-site DEFAULT longrun (B={B} chi={chi}): "
        f"{steady * 1e3:.0f} ms/sweep = {B / steady:.0f} inst-sweeps/s; "
        f"floor stable over 15 sweeps")


def chi_scaling():
    from tensornetwork_tpu.models import FiniteTFI
    from tensornetwork_tpu.models.dmrg import (one_site_sweep,
                                               random_mps_stack)
    from tensornetwork_tpu.utils.profiling import dmrg_sweep_flops

    N, m = 32, 10
    mpo = FiniteTFI(Jx=1.0, Bz=1.0, N=N, dtype=jnp.float32)
    for chi in (128, 256, 512):
        As = random_mps_stack(jax.random.PRNGKey(0), N, chi, 2,
                              jnp.float32)
        t0 = time.perf_counter()
        res = one_site_sweep(As, mpo.Ws, mpo.vL, mpo.vR,
                             num_krylov_vecs=m)
        _ = float(res.energy)
        compile_s = time.perf_counter() - t0
        As = res.As
        res = one_site_sweep(As, mpo.Ws, mpo.vL, mpo.vR,
                             num_krylov_vecs=m, renvs=res.renvs)
        _ = float(res.energy)
        As, rv = res.As, res.renvs
        iters = 5 if chi < 512 else 3
        t0 = time.perf_counter()
        for _ in range(iters):
            res = one_site_sweep(As, mpo.Ws, mpo.vL, mpo.vR,
                                 num_krylov_vecs=m, renvs=rv)
            As, rv = res.As, res.renvs
        # single end-sync: the energy depends on the whole chained loop,
        # and a scalar fetch costs ~10-30 ms RTT — per-sweep fetches
        # would distort fast configs
        _ = float(res.energy)
        dt = (time.perf_counter() - t0) / iters
        fl = dmrg_sweep_flops(N, chi, 2, 3, m)
        log(f"chi={chi:4d}: {1 / dt:7.2f} sweeps/s ({dt * 1e3:8.1f} ms, "
            f"~{fl / dt / 1e12:6.2f} TFLOP/s, compile {compile_s:.0f}s, "
            f"E={float(res.energy):.4f})")


def qr_single_probe():
    """Single-matrix (non-batched) QR quality on chip — the batched path
    measured ~1.6e-3 orthogonality error (session_a)."""
    key = jax.random.PRNGKey(0)
    for rank in (4, 64):
        a = jax.random.normal(key, (128, rank), jnp.float32)
        b = jax.random.normal(key, (rank, 64), jnp.float32)

        @jax.jit
        def probe(a, b):
            q, _ = jnp.linalg.qr(a @ b)
            g = q.T @ q
            return jnp.max(jnp.abs(g - jnp.eye(64, dtype=jnp.float32)))

        err = float(jax.device_get(probe(a, b)))
        log(f"single QR (128,64) rank={rank:3d}: ||Q^T Q - I|| = "
            f"{err:.2e}")


def main():
    log(f"devices: {jax.devices()}")
    jax.device_get(jnp.ones(4))
    log("warm")
    qr_single_probe()
    two_site_longrun()
    chi_scaling()


if __name__ == "__main__":
    main()
