#!/usr/bin/env python
"""One-session TPU A/B for VERDICT r1 items 1+2.

Timing methodology: `jax.block_until_ready` has been observed to silently
return early on the tunneled backend mid-process (saw "12000 TF"), so
every timing here is bracketed by `jax.device_get` of a scalar reduction
of the result — the only synchronization that is trustworthy end-to-end.

Sections:
1. chi=128 transfer-chain variants (xla / loop / rows), bf16, with
   on-chip correctness vs the f32 XLA oracle.
2. two-site batched DMRG (B=256, chi=64, m=10): full chained sweeps for
   orth in {qr, polar+qr, polar} x iters in {4, 2}; reports steady-state
   inst-sweeps/s and the converged-energy floor vs the reference value.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp
import numpy as np

MEASURED_PEAK_TF = 122.0
REF_E = -40.384313161218365  # reference converged E, TFI N=32 chi=64


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed(fn, *args, iters=3):
    """fn must return a SCALAR (or tiny) array; sync via device_get."""
    jax.device_get(fn(*args))          # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jax.device_get(fn(*args))
    return (time.perf_counter() - t0) / iters, out


def section_chain():
    from tensornetwork_tpu.ops.kernels import transfer_chain
    B, N, chi, d, R = 256, 32, 128, 2, 8
    flops = R * B * N * d * 4 * chi ** 3
    key = jax.random.PRNGKey(0)

    @jax.jit
    def make(key):
        A = jax.random.normal(key, (B, N, chi, d, chi), jnp.float32)
        A = A / np.sqrt(d * chi)
        E0 = jnp.broadcast_to(jnp.eye(chi, dtype=jnp.float32),
                              (B, chi, chi))
        return A, E0

    A32, E0 = make(key)
    A16 = A32.astype(jnp.bfloat16)

    # on-chip correctness: single chain application, f32 oracle
    ref = jax.device_get(jax.jit(lambda A, E: transfer_chain(
        A, E, impl="xla", precision=jax.lax.Precision.HIGHEST))(A32, E0))
    for variant in ("loop", "rows"):
        out = jax.device_get(jax.jit(functools.partial(
            transfer_chain, impl="pallas", variant=variant, tile_b=16,
            precision=jax.lax.Precision.HIGHEST))(A32, E0))
        err = np.max(np.abs(out - ref)) / np.max(np.abs(ref))
        log(f"on-chip correctness {variant:5s}: rel err {err:.2e}")

    configs = [("xla", None, None)] + [
        (impl, v, t) for impl, v, t in (
            ("pallas", "loop", 8), ("pallas", "loop", 16),
            ("pallas", "rows", 8), ("pallas", "rows", 16),
            ("pallas", "rows", 32))]
    for impl, variant, tile in configs:
        kw = {} if impl == "xla" else {"variant": variant, "tile_b": tile}
        run1 = functools.partial(transfer_chain, impl=impl, **kw)

        @jax.jit
        def run(A, E0):
            def body(i, E):
                return run1(A, E.astype(jnp.bfloat16)).astype(jnp.float32)
            E = jax.lax.fori_loop(0, R, body, E0)
            return jnp.sum(jnp.abs(E))

        try:
            dt, _ = timed(run, A16, E0.astype(jnp.float32), iters=5)
            tf = flops / dt / 1e12
            name = impl if impl == "xla" else f"{variant} t{tile}"
            log(f"chain chi=128 bf16 {name:9s}: {dt * 1e3:7.2f} ms  "
                f"{tf:6.1f} TF  ({tf / MEASURED_PEAK_TF * 100:4.1f}% "
                f"of measured 122 TF peak)")
        except Exception as e:
            log(f"chain {impl}/{variant}/{tile}: FAILED "
                f"{type(e).__name__}: {str(e)[:160]}")


def section_two_site():
    from tensornetwork_tpu.models import FiniteTFI
    from tensornetwork_tpu.models.dmrg import random_mps_stack
    from tensornetwork_tpu.parallel.batch import batched_two_site_sweep

    B, N, chi, m = 256, 32, 64, 10
    mpo = FiniteTFI(Jx=1.0, Bz=1.0, N=N, dtype=jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(1), B)
    As0 = jnp.stack([random_mps_stack(k, N, chi, 2, jnp.float32)
                     for k in keys])

    for orth, iters in (("qr", 4), ("polar+qr", 4), ("polar+qr", 2),
                        ("polar", 4)):
        As, rv = As0, None
        times = []
        t_compile = time.perf_counter()
        for sweep in range(10):
            t0 = time.perf_counter()
            res = batched_two_site_sweep(
                As, mpo.Ws, mpo.vL, mpo.vR, num_krylov_vecs=m,
                trunc_impl="subspace", trunc_iters=iters, trunc_orth=orth,
                renvs=rv)
            As, rv = res.As, res.renvs
            e_mean = float(jnp.mean(res.energy))  # device_get = sync
            dt = time.perf_counter() - t0
            times.append(dt)
            if sweep < 2:
                log(f"  [{orth} i{iters}] sweep {sweep}: {dt:.1f}s "
                    f"(compile) E={e_mean:.6f}")
        steady = np.mean(times[3:])
        en = np.asarray(jax.device_get(res.energy), np.float64)
        terr = float(jnp.mean(res.trunc_err))
        log(f"two-site B={B} chi={chi} orth={orth:9s} iters={iters}: "
            f"{steady * 1e3:7.0f} ms/sweep = {B / steady:5.0f} "
            f"inst-sweeps/s; mean E-ref = {en.mean() - REF_E:+.2e} "
            f"(max dev {np.abs(en - REF_E).max():.2e}), "
            f"trunc_err {terr:.1e}, total {time.perf_counter() - t_compile:.0f}s")


def main():
    log(f"devices: {jax.devices()}")
    jax.device_get(jnp.ones(4))
    log("warm")
    if "--skip-chain" not in sys.argv:
        section_chain()
    if "--skip-two-site" not in sys.argv:
        section_two_site()


if __name__ == "__main__":
    main()
