#!/usr/bin/env python
"""Single-instance gauge A/B on chip (VERDICT r4 item 4).

The single-instance one-site floor sits at -9e-5 while batched sweeps
(polar gauges) converge at +2.3e-5; CLAUDE.md attributes the gap to the
backend's low-quality f32 QR ("likely reflects") — the single-instance
gauge default is "householder" for latency.  This measures the
hypothesis: A/B householder vs ns_polar gauge shifts on the
single-instance one-site path at chi=64/256/512, floor + sweeps/s,
honest end-sync timing.  Writes a markdown table to stderr.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks._timing import warmup, bracket

REF_E = -40.384313161218365  # N=32 critical TFI, chi=64 reference value


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run_case(chi, qr_impl, n_converge, n_timed, m=10):
    from tensornetwork_tpu.models import FiniteTFI
    from tensornetwork_tpu.models.dmrg import one_site_sweep, \
        random_mps_stack

    N = 32
    mpo = FiniteTFI(Jx=1.0, Bz=1.0, N=N, dtype=jnp.float32)
    As = random_mps_stack(jax.random.PRNGKey(0), N, chi, 2, jnp.float32)
    # compile both traces (renvs=None and chained)
    t0 = time.perf_counter()
    res = one_site_sweep(As, mpo.Ws, mpo.vL, mpo.vR, num_krylov_vecs=m,
                         qr_impl=qr_impl)
    jax.device_get(res.energy)
    res = one_site_sweep(res.As, mpo.Ws, mpo.vL, mpo.vR,
                         num_krylov_vecs=m, qr_impl=qr_impl,
                         renvs=res.renvs)
    jax.device_get(res.energy)
    log(f"  [chi={chi} {qr_impl}] compiled in "
        f"{time.perf_counter() - t0:.0f}s")
    As, rv = res.As, res.renvs
    # converge (chained, one end sync)
    with bracket(lambda: res.energy) as b:
        for _ in range(n_converge):
            res = one_site_sweep(As, mpo.Ws, mpo.vL, mpo.vR,
                                 num_krylov_vecs=m, qr_impl=qr_impl,
                                 renvs=rv)
            As, rv = res.As, res.renvs
    e_conv = float(jax.device_get(res.energy))
    # timed steady-state
    with bracket(lambda: res.energy) as b:
        for _ in range(n_timed):
            res = one_site_sweep(As, mpo.Ws, mpo.vL, mpo.vR,
                                 num_krylov_vecs=m, qr_impl=qr_impl,
                                 renvs=rv)
            As, rv = res.As, res.renvs
    rate = n_timed / b.seconds
    e_final = float(jax.device_get(res.energy))
    log(f"  [chi={chi} {qr_impl}] {rate:.2f} sweeps/s, "
        f"E-ref after converge {e_conv - REF_E:+.2e}, "
        f"final {e_final - REF_E:+.2e}")
    return rate, e_final - REF_E


def main():
    log(f"devices: {jax.devices()}")
    warmup()
    rows = []
    for chi, n_conv, n_timed in ((64, 60, 30), (256, 30, 10),
                                 (512, 16, 6)):
        for impl in ("householder", "polar"):
            rate, floor = run_case(chi, impl, n_conv, n_timed)
            rows.append((chi, impl, rate, floor))
    log("\n| chi | gauge | sweeps/s | E - ref |")
    log("|---|---|---|---|")
    for chi, impl, rate, floor in rows:
        log(f"| {chi} | {impl} | {rate:.2f} | {floor:+.2e} |")


if __name__ == "__main__":
    main()
