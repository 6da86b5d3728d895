#!/usr/bin/env python
"""On-chip validation + timing of the doubly-chunked streamed-matvec
Lanczos tier (VERDICT r3 item 1): two-site chi=512 and one-site
chi=1024.  Run on the real TPU.

Phases:
1. chi=512 two-site: streamed2 kernel vs the XLA three-term oracle
   (correctness), then chained solve timing kernel-vs-XLA;
2. full two-site sweep at chi=512 (subspace/polar truncation) —
   sweeps/s + analytic TF on the matvec chain;
3. chi=1024 one-site: correctness + chained solve timing, full sweep.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks._timing import bracket, timed_scalar, warmup


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sym_env(rng, B, chi, M):
    L = jnp.asarray(rng.standard_normal((B, chi, M, chi)),
                    jnp.float32) / np.sqrt(chi)
    return (L + L.transpose(0, 3, 2, 1)) / 2


def two_site_phase(args):
    from tensornetwork_tpu.ops import kernels, krylov
    chi, d, M, m = args.chi2, 2, 3, args.m2
    nt = d * d
    rng = np.random.default_rng(0)
    L = sym_env(rng, 1, chi, M)
    R = sym_env(rng, 1, chi, M)
    W1 = jnp.asarray(rng.standard_normal((M, M, d, d)), jnp.float32)
    W1 = (W1 + W1.transpose(1, 0, 3, 2)) / 2
    W2 = jnp.asarray(rng.standard_normal((M, M, d, d)), jnp.float32)
    W2 = (W2 + W2.transpose(1, 0, 3, 2)) / 2
    th0 = jnp.asarray(rng.standard_normal((1, chi, d, d, chi)),
                      jnp.float32)
    plan = kernels.streamed_matvec_plan(chi, nt, M)
    log(f"2s chi={chi}: plan (K, K2) = {plan}")
    try:
        ev_s, y_s = kernels.fused_lanczos_ground_state_2s_streamed(
            L, W1, W2, R, th0, m, ritz_method="eigh", plan=plan,
            precision=jax.lax.Precision.HIGHEST)
        jax.device_get(ev_s)
    except Exception as e:
        log(f"2S STREAMED KERNEL FAILED ON CHIP: {type(e).__name__}: "
            f"{str(e)[:500]}")
        return

    def mv2(x):
        with jax.default_matmul_precision("highest"):
            return jnp.einsum("awc,wmst,mvuz,atzb,bvd->csud", L[0], W1,
                              W2, x, R[0], optimize="auto")

    ev_o, _ = krylov.eigsh_lanczos(mv2, th0[0], num_krylov_vecs=m,
                                   numeig=1, ritz_method="eigh",
                                   reorthogonalize=False)
    log(f"2s correctness: streamed2 ev {float(ev_s[0]):.8f} vs XLA "
        f"{float(ev_o[0]):.8f} (delta {abs(float(ev_s[0]-ev_o[0])):.2e})")

    @jax.jit
    def chain_k(x):
        def body(v, _):
            ev, y = kernels.fused_lanczos_ground_state_2s_streamed(
                L, W1, W2, R, v, m, ritz_method="eigh", plan=plan,
                precision=jax.lax.Precision.HIGHEST)
            return y, ev
        y, evs = jax.lax.scan(body, x, None, length=args.iters)
        return jnp.sum(evs) + jnp.sum(jnp.abs(y)) * 0

    @jax.jit
    def chain_x(x):
        def body(v, _):
            with jax.default_matmul_precision("highest"):
                ev, ys = krylov.eigsh_lanczos(
                    mv2, v[0], num_krylov_vecs=m, numeig=1,
                    ritz_method="eigh", reorthogonalize=False)
            return ys[0][None], ev[0]
        y, evs = jax.lax.scan(body, x, None, length=args.iters)
        return jnp.sum(evs) + jnp.sum(jnp.abs(y)) * 0

    gem_flops = args.iters * m * 4 * M * nt * chi**3
    for name, fn in (("2s streamed2 kernel", chain_k),
                     ("2s xla lanczos     ", chain_x)):
        dt = timed_scalar(fn, th0, iters=3)
        log(f"{name}: {dt / args.iters * 1e3:7.2f} ms/solve "
            f"({gem_flops / dt / 1e12:5.1f} TF on the matvec GEMMs)")

    # --- full two-site sweep at chi=512 ---
    from tensornetwork_tpu.models import FiniteTFI
    from tensornetwork_tpu.models.dmrg import (random_mps_stack,
                                               two_site_sweep)
    N = args.N
    mpo = FiniteTFI(Jx=1.0, Bz=1.0, N=N, dtype=jnp.float32)
    As = random_mps_stack(jax.random.PRNGKey(0), N, chi, 2, jnp.float32)
    tw = dict(num_krylov_vecs=m, trunc_impl="subspace", trunc_iters=2,
              trunc_orth="polar")
    t0 = time.time()
    res = two_site_sweep(As, mpo.Ws, mpo.vL, mpo.vR, **tw)
    jax.device_get(res.energy)
    log(f"2s sweep chi={chi}: first sweep (compile) {time.time()-t0:.0f}s")
    res = two_site_sweep(res.As, mpo.Ws, mpo.vL, mpo.vR, renvs=res.renvs,
                         **tw)
    jax.device_get(res.energy)
    As, renvs = res.As, res.renvs
    n_sw = args.sweeps
    with bracket(lambda: res.energy) as b:
        for _ in range(n_sw):
            res = two_site_sweep(As, mpo.Ws, mpo.vL, mpo.vR, renvs=renvs,
                                 **tw)
            As, renvs = res.As, res.renvs
    dt = b.seconds / n_sw
    # analytic matvec-chain FLOPs: (N-1) bonds, m matvecs each
    fl = (N - 1) * m * 4 * M * nt * chi**3
    log(f"2s sweep chi={chi}: {1/dt:6.2f} sweeps/s ({dt*1e3:8.1f} ms; "
        f"matvec-chain ~{fl/dt/1e12:5.2f} TF; E={float(res.energy):.4f}, "
        f"terr={float(res.trunc_err):.2e})")


def one_site_phase(args):
    from tensornetwork_tpu.ops import kernels, krylov
    chi, d, M, m = args.chi1, 2, 3, args.m1
    rng = np.random.default_rng(1)
    L = sym_env(rng, 1, chi, M)
    R = sym_env(rng, 1, chi, M)
    W = jnp.asarray(rng.standard_normal((M, M, d, d)), jnp.float32)
    W = (W + W.transpose(1, 0, 3, 2)) / 2
    x0 = jnp.asarray(rng.standard_normal((1, chi, d, chi)), jnp.float32)
    plan = kernels.streamed_matvec_plan(chi, d, M)
    log(f"1s chi={chi}: plan (K, K2) = {plan}")
    try:
        ev_s, y_s = kernels.fused_lanczos_ground_state_streamed2(
            L, W, R, x0, m, ritz_method="eigh", plan=plan,
            precision=jax.lax.Precision.HIGHEST)
        jax.device_get(ev_s)
    except Exception as e:
        log(f"1S STREAMED2 KERNEL FAILED ON CHIP: {type(e).__name__}: "
            f"{str(e)[:500]}")
        return

    def mv(x):
        with jax.default_matmul_precision("highest"):
            return jnp.einsum("awc,wvst,atb,bvd->csd", L[0], W, x, R[0],
                              optimize="auto")

    ev_o, _ = krylov.eigsh_lanczos(mv, x0[0], num_krylov_vecs=m,
                                   numeig=1, ritz_method="eigh",
                                   reorthogonalize=False)
    log(f"1s correctness: streamed2 ev {float(ev_s[0]):.8f} vs XLA "
        f"{float(ev_o[0]):.8f} (delta {abs(float(ev_s[0]-ev_o[0])):.2e})")

    @jax.jit
    def chain_k(x):
        def body(v, _):
            ev, y = kernels.fused_lanczos_ground_state_streamed2(
                L, W, R, v, m, ritz_method="eigh", plan=plan,
                precision=jax.lax.Precision.HIGHEST)
            return y, ev
        y, evs = jax.lax.scan(body, x, None, length=args.iters)
        return jnp.sum(evs) + jnp.sum(jnp.abs(y)) * 0

    @jax.jit
    def chain_x(x):
        def body(v, _):
            with jax.default_matmul_precision("highest"):
                ev, ys = krylov.eigsh_lanczos(
                    mv, v[0], num_krylov_vecs=m, numeig=1,
                    ritz_method="eigh", reorthogonalize=False)
            return ys[0][None], ev[0]
        y, evs = jax.lax.scan(body, x, None, length=args.iters)
        return jnp.sum(evs) + jnp.sum(jnp.abs(y)) * 0

    gem_flops = args.iters * m * 4 * M * d * chi**3
    for name, fn in (("1s streamed2 kernel", chain_k),
                     ("1s xla lanczos     ", chain_x)):
        dt = timed_scalar(fn, x0, iters=3)
        log(f"{name}: {dt / args.iters * 1e3:7.2f} ms/solve "
            f"({gem_flops / dt / 1e12:5.1f} TF on the matvec GEMMs)")

    # --- full one-site sweep at chi=1024 (tier auto-engages) ---
    from tensornetwork_tpu.models import FiniteTFI
    from tensornetwork_tpu.models.dmrg import (one_site_sweep,
                                               random_mps_stack)
    from tensornetwork_tpu.utils.profiling import dmrg_sweep_flops
    N = args.N
    mpo = FiniteTFI(Jx=1.0, Bz=1.0, N=N, dtype=jnp.float32)
    As = random_mps_stack(jax.random.PRNGKey(0), N, chi, 2, jnp.float32)
    t0 = time.time()
    res = one_site_sweep(As, mpo.Ws, mpo.vL, mpo.vR, num_krylov_vecs=m)
    jax.device_get(res.energy)
    log(f"1s sweep chi={chi}: first sweep (compile) {time.time()-t0:.0f}s")
    res = one_site_sweep(res.As, mpo.Ws, mpo.vL, mpo.vR,
                         num_krylov_vecs=m, renvs=res.renvs)
    jax.device_get(res.energy)
    As, renvs = res.As, res.renvs
    n_sw = args.sweeps
    with bracket(lambda: res.energy) as b:
        for _ in range(n_sw):
            res = one_site_sweep(As, mpo.Ws, mpo.vL, mpo.vR,
                                 num_krylov_vecs=m, renvs=renvs)
            As, renvs = res.As, res.renvs
    dt = b.seconds / n_sw
    fl = dmrg_sweep_flops(N, chi, 2, M, m)
    log(f"1s sweep chi={chi}: {1/dt:6.2f} sweeps/s ({dt*1e3:8.1f} ms, "
        f"~{fl/dt/1e12:5.2f} TFLOP/s; E={float(res.energy):.4f})")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chi2", type=int, default=512)
    ap.add_argument("--m2", type=int, default=6)
    ap.add_argument("--chi1", type=int, default=1024)
    ap.add_argument("--m1", type=int, default=10)
    ap.add_argument("--N", type=int, default=32)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--sweeps", type=int, default=5)
    ap.add_argument("--phase", choices=["2s", "1s", "all"], default="all")
    args = ap.parse_args()
    log(f"devices: {jax.devices()}")
    warmup()
    log("warm")
    if args.phase in ("2s", "all"):
        two_site_phase(args)
    if args.phase in ("1s", "all"):
        one_site_phase(args)


if __name__ == "__main__":
    main()
