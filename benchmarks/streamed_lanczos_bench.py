#!/usr/bin/env python
"""On-chip validation + timing of the chi-chunked streamed Lanczos
kernel (VERDICT r2 item 1).  Run on the real TPU.

Phases:
1. correctness at chi=512: streamed kernel vs the XLA masked-matmul
   Lanczos oracle (same plain three-term semantics);
2. Lanczos-stage timing: chained solves inside one jit,
   device_get-anchored (benchmarks/_timing.py);
3. full one-site sweep rate at chi=256/512 via dmrg_scaling's path
   (one_site_sweep auto-selects the streamed tier at chi=512).
"""
import argparse
import functools
import os
import sys

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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chi", type=int, default=512)
    ap.add_argument("--m", type=int, default=10)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--skip-sweep", action="store_true")
    ap.add_argument("--K", type=int, default=None)
    args = ap.parse_args()
    from tensornetwork_tpu.ops import kernels, krylov

    chi, d, M, m = args.chi, 2, 3, args.m
    log(f"devices: {jax.devices()}")
    warmup()
    log("warm")

    rng = np.random.default_rng(0)
    L = sym_env(rng, 1, chi, M)
    R = sym_env(rng, 1, chi, M)
    W = jnp.asarray(rng.standard_normal((M, M, d, d)), jnp.float32)
    W = (W + W.transpose(1, 0, 3, 2)) / 2
    x0 = jnp.asarray(rng.standard_normal((1, chi, d, chi)), jnp.float32)

    K = args.K or kernels.streamed_chunk_count(chi, d, M)
    log(f"chi={chi}: streamed chunk count K={K}")

    # --- correctness vs the XLA Lanczos oracle ---
    try:
        ev_s, y_s = kernels.fused_lanczos_ground_state_streamed(
            L, W, R, x0, m, ritz_method="eigh", n_chunks=K,
            precision=jax.lax.Precision.HIGHEST)
        jax.device_get(ev_s)
    except Exception as e:
        log(f"STREAMED KERNEL FAILED ON CHIP: {type(e).__name__}: "
            f"{str(e)[:500]}")
        return

    def mv(x):
        with jax.default_matmul_precision("highest"):
            return jnp.einsum("awc,wvst,atb,bvd->csd", L[0], W, x, R[0],
                              optimize="auto")

    ev_o, y_o = krylov.eigsh_lanczos(mv, x0[0], num_krylov_vecs=m,
                                     numeig=1, ritz_method="eigh",
                                     reorthogonalize=False)
    log(f"correctness: streamed ev {float(ev_s[0]):.8f} vs XLA oracle "
        f"{float(ev_o[0]):.8f} (delta {abs(float(ev_s[0] - ev_o[0])):.2e})")

    # --- chained solve timing (Lanczos stage only) ---
    @jax.jit
    def chain_streamed(x):
        def body(v, _):
            ev, y = kernels.fused_lanczos_ground_state_streamed(
                L, W, R, v, m, ritz_method="power", n_chunks=K,
                precision=jax.lax.Precision.HIGHEST)
            return y, ev
        y, evs = jax.lax.scan(body, x, None, length=args.iters)
        return jnp.sum(evs) + jnp.sum(jnp.abs(y)) * 0

    @jax.jit
    def chain_xla(x):
        def body(v, _):
            with jax.default_matmul_precision("highest"):
                ev, ys = krylov.eigsh_lanczos(
                    lambda z: jnp.einsum("awc,wvst,atb,bvd->csd",
                                         L[0], W, z, R[0],
                                         optimize="auto"),
                    v[0], num_krylov_vecs=m, numeig=1,
                    ritz_method="power", reorthogonalize=False)
            return ys[0][None], ev[0]
        y, evs = jax.lax.scan(body, x, None, length=args.iters)
        return jnp.sum(evs) + jnp.sum(jnp.abs(y)) * 0

    gem_flops = args.iters * m * 2 * M * d * 2 * chi**3
    for name, fn in (("streamed kernel", chain_streamed),
                     ("xla lanczos   ", chain_xla)):
        dt = timed_scalar(fn, x0, iters=3)
        per_solve = dt / args.iters * 1e3
        tf = gem_flops / dt / 1e12
        log(f"{name}: {per_solve:7.2f} ms/solve  ({tf:5.1f} TF on the "
            f"matvec GEMMs)")

    if args.skip_sweep:
        return

    # --- full sweep rate ---
    from tensornetwork_tpu.models import FiniteTFI
    from tensornetwork_tpu.models.dmrg import (one_site_sweep,
                                               random_mps_stack)
    from tensornetwork_tpu.utils.profiling import dmrg_sweep_flops
    N = 32
    mpo = FiniteTFI(Jx=1.0, Bz=1.0, N=N, dtype=jnp.float32)
    for c in (256, chi):
        As = random_mps_stack(jax.random.PRNGKey(0), N, c, 2, jnp.float32)
        res = one_site_sweep(As, mpo.Ws, mpo.vL, mpo.vR,
                             num_krylov_vecs=m)
        jax.device_get(res.energy)   # compile + sync
        # the renvs!=None call is a SEPARATE jit trace — warm it too
        res = one_site_sweep(res.As, mpo.Ws, mpo.vL, mpo.vR,
                             num_krylov_vecs=m, renvs=res.renvs)
        jax.device_get(res.energy)
        As = res.As
        renvs = res.renvs
        n_sw = 5
        with bracket(lambda: res.energy) as b:
            for _ in range(n_sw):
                res = one_site_sweep(As, mpo.Ws, mpo.vL, mpo.vR,
                                     num_krylov_vecs=m, renvs=renvs)
                As, renvs = res.As, res.renvs
        dt = b.seconds / n_sw
        fl = dmrg_sweep_flops(N, c, 2, 3, m)
        log(f"sweep chi={c}: {1 / dt:6.2f} sweeps/s  "
            f"({dt * 1e3:7.1f} ms, ~{fl / dt / 1e12:5.2f} TFLOP/s)")


if __name__ == "__main__":
    main()
