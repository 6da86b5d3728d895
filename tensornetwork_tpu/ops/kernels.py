"""Pallas TPU kernels for the hot contraction paths.

The batched one-site DMRG effective-hamiltonian matvec
``y = L·W·x·R`` is the flop carrier of the compiled sweep.  This kernel
decomposes the matvec into ``2·M·d`` chi×chi GEMMs per instance executed
back-to-back in VMEM (no HBM roundtrips between stages), with the small
MPO couplings applied as scalar-weighted accumulations from SMEM.

Index conventions match :mod:`tensornetwork_tpu.models.dmrg`:
  L[a, w, c]   W[w, v, s, t]   R[b, v, d]   x[a, t, b]  ->  y[c, s, d]

Per instance, for every (w, t):  P_wt = L_w^T @ x_t   (chi x chi GEMM)
then for every (s, v):           Q_vs = sum_wt W[w,v,s,t] P_wt  (VPU)
and                              y_s += Q_vs @ R_v    (chi x chi GEMM).

Status (measured on TPU v5e, 2026-08-18, grid-per-instance variant):

* Correctness: the kernel COMPILES CORRECTLY through the remote Mosaic
  toolchain with the batch dimension mapped onto the *grid* (one program
  per instance) — max rel err 1.7e-7 vs the f32-highest XLA oracle.  An
  earlier variant that looped over instances with ``jax.lax.fori_loop``
  inside one program miscompiled remotely (correct only under
  ``interpret=True``); the grid structure dodges that path entirely.
* Performance: the *single-matvec* kernel is at parity with XLA's fused
  batched einsum across shapes (chi=64 B=256: 2.5 vs 2.0 TF; chi=128
  B=64: 5.2 vs 5.3; chi=256 B=16: 10.8 vs 9.9, default precision,
  dispatch-amortized) — GEMM-shape-bound, XLA schedules single matvecs
  as well as the hand pipeline.  The *whole-Lanczos-step* kernel
  (:func:`make_fused_lanczos`) is where fusion pays: all m matvecs +
  the three-term recurrence stay in VMEM, beating the XLA Lanczos chain
  1.48x at identical HIGHEST precision (B=256, chi=64, m=10; 2026-08-19)
  and lifting the full batched DMRG sweep 434 -> 585 inst-sweeps/s.
  It is the batched-sweep default on TPU
  (``parallel.batch.batched_one_site_sweep``).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_heff_matvec(chi: int, d: int, M: int, tile_b: int = 1,
                     accum_dtype=jnp.float32, interpret: bool = False,
                     precision=None):
    """Build the fused batched matvec for static (chi, d, M).

    Returns ``f(Lt, W, Rt, xt) -> y`` on kernel-layout operands (see
    :func:`prepare_operands`):
      Lt: (B, M, chi, chi)   [w, c, a]
      W:  (M, M, d, d)       (scalar couplings, SMEM)
      Rt: (B, M, chi, chi)   [v, b, d]
      xt: (B, d, chi, chi)   [t, a, b]
      y:  (B, d, chi, chi)   [s, c, d]

    The batch rides the Pallas grid (``tile_b`` instances per program;
    default 1).  ``precision`` is forwarded to the in-kernel dots — pass
    ``jax.lax.Precision.HIGHEST`` for f32-exact results (3-pass bf16
    emulation, like the sweep's forced-highest einsums).
    """

    def kernel(W_ref, Lt_ref, Rt_ref, x_ref, y_ref):
        dot = lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            precision=precision, preferred_element_type=accum_dtype)
        for i in range(tile_b):
            # stage 1: P[w][t] = L_w^T(@c,a) . x_t(a,b)  -> (c, b)
            P = [[dot(Lt_ref[i, w], x_ref[i, t])
                  for t in range(d)] for w in range(M)]
            # stages 2+3: y_s = sum_v (sum_wt W[w,v,s,t] P[w][t]) @ R_v
            for s in range(d):
                acc = None
                for v in range(M):
                    Q = None
                    for w in range(M):
                        for t in range(d):
                            term = W_ref[w, v, s, t] * P[w][t]
                            Q = term if Q is None else Q + term
                    contrib = dot(Q, Rt_ref[i, v])
                    acc = contrib if acc is None else acc + contrib
                y_ref[i, s] = acc.astype(y_ref.dtype)

    @jax.jit
    def f(Lt, W, Rt, xt):
        B = xt.shape[0]
        if B % tile_b != 0:
            raise ValueError(f"batch {B} not divisible by tile {tile_b}")
        grid = (B // tile_b,)

        def bs(lead, shape):
            return pl.BlockSpec(
                (tile_b, lead) + shape,
                lambda i: (i, 0) + (0,) * len(shape),
                memory_space=pltpu.VMEM)

        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((M, M, d, d), lambda i: (0, 0, 0, 0),
                             memory_space=pltpu.SMEM),
                bs(M, (chi, chi)),
                bs(M, (chi, chi)),
                bs(d, (chi, chi)),
            ],
            out_specs=bs(d, (chi, chi)),
            out_shape=jax.ShapeDtypeStruct((B, d, chi, chi), xt.dtype),
            interpret=interpret,
        )(W, Lt, Rt, xt)

    return f


def prepare_operands(L, W, R, x):
    """Solver layout -> kernel layout.

    L: (B, a, w, c) -> (B, w, c, a)
    R: (B, b, v, d) -> (B, v, b, d)
    x: (B, a, t, b) -> (B, t, a, b)
    W unchanged (read as scalars from SMEM).
    """
    Lt = L.transpose(0, 2, 3, 1)
    Rt = R.transpose(0, 2, 1, 3)
    xt = x.transpose(0, 2, 1, 3)
    return Lt, W, Rt, xt


def finalize_output(y):
    """Kernel layout (B, s, c, d) -> solver layout (B, c, s, d)."""
    return y.transpose(0, 2, 1, 3)


def make_fused_lanczos(chi: int, d: int, M: int, m: int,
                       delta: float = 1e-8,
                       accum_dtype=jnp.float32, interpret: bool = False,
                       precision=None, tile_b: int = 1):
    """Whole-Lanczos-step kernel: all ``m`` H_eff matvecs of one site's
    local eigensolve run back-to-back inside one program, with L, R and
    every Krylov vector resident in VMEM (no HBM roundtrips between
    iterations).  One instance per grid program (the batch rides the
    grid — the remote-Mosaic-safe structure, see module docstring).

    Returns ``f(Lt, W, Rt, x0) -> (V, ab)`` on kernel-layout operands
    (:func:`prepare_operands`):
      Lt: (B, M, chi, chi)  W: (M, M, d, d)  Rt: (B, M, chi, chi)
      x0: (B, d, chi, chi)
      V:  (B, m, d, chi, chi)  — orthonormal Krylov basis rows
      ab: (B, 2, m) f32        — ab[:,0] = alphas, ab[:,1,:-1] = betas

    Semantics match :func:`tensornetwork_tpu.ops.krylov.
    lanczos_factorization` with ``reorthogonalize=False`` (the batched
    DMRG default): plain three-term recurrence, invariant-subspace
    breakdown masked with +1e10 diagonal sentinels.  The small
    tridiagonal Ritz solve happens *outside* (a per-instance scalar
    chain would serialize across the sequential grid programs; vmapped
    XLA handles the (B, m, m) solve in ~1 ms).

    ``tile_b > 1`` packs several instances into one grid program with
    PHASED issue: each Lanczos step runs stage 1 for every instance,
    then stage 2 for every instance, then the (VPU) recurrences — so
    consecutive MXU ops belong to different instances and systolic
    fill/drain overlaps within a dependency step (the transfer-chain
    "rows" trick applied to the Lanczos).
    """
    LARGE = 1e10

    def kernel(W_ref, Lt_ref, Rt_ref, x_ref, V_ref, ab_ref):
        dot = lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            precision=precision, preferred_element_type=accum_dtype)

        def matvec_stage1(i, v):
            # v: list of d (chi, chi) values in layout [a, b] per t.
            return [[dot(Lt_ref[i, w], v[t]) for t in range(d)]
                    for w in range(M)]

        def matvec_stage2(i, P):
            y = []
            for s in range(d):
                acc = None
                for vv in range(M):
                    Q = None
                    for w in range(M):
                        for t in range(d):
                            term = W_ref[w, vv, s, t] * P[w][t]
                            Q = term if Q is None else Q + term
                    contrib = dot(Q, Rt_ref[i, vv])
                    acc = contrib if acc is None else acc + contrib
                y.append(acc)
            return y

        vdot = lambda a, b: sum(jnp.sum(a[t] * b[t]) for t in range(d))

        v, v_prev, beta_prev, alive = [], [], [], []
        for i in range(tile_b):
            x0 = [x_ref[i, t].astype(accum_dtype) for t in range(d)]
            nrm = jnp.sqrt(vdot(x0, x0))
            inv = jnp.where(nrm > delta,
                            1.0 / jnp.where(nrm > 0, nrm, 1.0), 0.0)
            v.append([x0[t] * inv for t in range(d)])
            v_prev.append([jnp.zeros_like(x0[t]) for t in range(d)])
            beta_prev.append(jnp.zeros((), accum_dtype))
            alive.append(nrm > delta)
        for j in range(m):
            for i in range(tile_b):
                for t in range(d):
                    V_ref[i, j, t] = v[i][t].astype(V_ref.dtype)
            # phase A: every instance's stage-1 GEMMs (independent)
            P_all = [matvec_stage1(i, v[i]) for i in range(tile_b)]
            # phase B: every instance's stage-2 GEMMs
            w_all = [matvec_stage2(i, P_all[i]) for i in range(tile_b)]
            # phase C: the (VPU) three-term recurrences
            for i in range(tile_b):
                w = w_all[i]
                alpha = vdot(v[i], w)
                ab_ref[i, 0, j] = jnp.where(alive[i], alpha, LARGE)
                w = [w[t] - alpha * v[i][t] - beta_prev[i] * v_prev[i][t]
                     for t in range(d)]
                beta = jnp.sqrt(vdot(w, w))
                alive_next = jnp.logical_and(alive[i], beta > delta)
                if j < m - 1:
                    ab_ref[i, 1, j] = jnp.where(alive_next, beta, 0.0)
                inv = jnp.where(beta > delta,
                                1.0 / jnp.where(beta > 0, beta, 1.0), 0.0)
                keep = alive_next.astype(accum_dtype)
                v_prev[i] = v[i]
                v[i] = [w[t] * inv * keep for t in range(d)]
                beta_prev[i] = jnp.where(alive_next, beta, 0.0)
                alive[i] = alive_next
        for i in range(tile_b):
            ab_ref[i, 1, m - 1] = 0.0

    @jax.jit
    def f(Lt, W, Rt, x0):
        B = x0.shape[0]
        if B % tile_b != 0:
            raise ValueError(f"batch {B} not divisible by tile {tile_b}")
        grid = (B // tile_b,)

        def bs(lead, shape):
            return pl.BlockSpec(
                (tile_b, lead) + shape,
                lambda i: (i, 0) + (0,) * len(shape),
                memory_space=pltpu.VMEM)

        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((M, M, d, d), lambda i: (0, 0, 0, 0),
                             memory_space=pltpu.SMEM),
                bs(M, (chi, chi)),
                bs(M, (chi, chi)),
                bs(d, (chi, chi)),
            ],
            out_specs=[
                pl.BlockSpec((tile_b, m, d, chi, chi),
                             lambda i: (i, 0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_b, 2, m), lambda i: (i, 0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, m, d, chi, chi), x0.dtype),
                jax.ShapeDtypeStruct((B, 2, m), accum_dtype),
            ],
            interpret=interpret,
        )(W, Lt, Rt, x0)

    return f


def make_fused_lanczos_2pass(chi: int, d: int, M: int, m: int,
                             delta: float = 1e-8,
                             accum_dtype=jnp.float32,
                             interpret: bool = False,
                             precision=None):
    """Large-chi whole-Lanczos kernels WITHOUT Krylov-basis storage
    (VERDICT r1 item 3: the single-pass kernel's ``m·d·chi²`` basis
    exceeds VMEM at chi=512).  Classic two-pass Lanczos:

      pass 1 (``fact``): three-term recurrence, emits only (alphas,
        betas) — VMEM holds L, R and ~4 working tiles, independent of m;
      pass 2 (``replay``): bitwise-identical recurrence (same matvec
        ops, coefficients read back from pass 1) accumulating the Ritz
        vector ``y = sum_j weights[j] · v_j`` on the fly.

    2x the matvec cost of the single-pass kernel, but the footprint
    drops from ``(2M + d(m+4))·chi²`` to ``(2M + ~5d)·chi²`` floats.
    """
    LARGE = 1e10

    def _matvec(W_ref, Lt_ref, Rt_ref, dot):
        def matvec(v):
            P = [[dot(Lt_ref[0, w], v[t]) for t in range(d)]
                 for w in range(M)]
            y = []
            for s in range(d):
                acc = None
                for vv in range(M):
                    Q = None
                    for w in range(M):
                        for t in range(d):
                            term = W_ref[w, vv, s, t] * P[w][t]
                            Q = term if Q is None else Q + term
                    contrib = dot(Q, Rt_ref[0, vv])
                    acc = contrib if acc is None else acc + contrib
                y.append(acc)
            return y
        return matvec

    def fact_kernel(W_ref, Lt_ref, Rt_ref, x_ref, ab_ref):
        dot = lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            precision=precision, preferred_element_type=accum_dtype)
        matvec = _matvec(W_ref, Lt_ref, Rt_ref, dot)
        vdot = lambda a, b: sum(jnp.sum(a[t] * b[t]) for t in range(d))
        x0 = [x_ref[0, t].astype(accum_dtype) for t in range(d)]
        nrm = jnp.sqrt(vdot(x0, x0))
        inv = jnp.where(nrm > delta, 1.0 / jnp.where(nrm > 0, nrm, 1.0),
                        0.0)
        v = [x0[t] * inv for t in range(d)]
        v_prev = [jnp.zeros_like(v[t]) for t in range(d)]
        beta_prev = jnp.zeros((), accum_dtype)
        alive = nrm > delta
        for j in range(m):
            w = matvec(v)
            alpha = vdot(v, w)
            ab_ref[0, 0, j] = jnp.where(alive, alpha, LARGE)
            w = [w[t] - alpha * v[t] - beta_prev * v_prev[t]
                 for t in range(d)]
            beta = jnp.sqrt(vdot(w, w))
            alive_next = jnp.logical_and(alive, beta > delta)
            if j < m - 1:
                ab_ref[0, 1, j] = jnp.where(alive_next, beta, 0.0)
            inv = jnp.where(beta > delta,
                            1.0 / jnp.where(beta > 0, beta, 1.0), 0.0)
            keep = alive_next.astype(accum_dtype)
            v_prev = v
            v = [w[t] * inv * keep for t in range(d)]
            beta_prev = jnp.where(alive_next, beta, 0.0)
            alive = alive_next
        ab_ref[0, 1, m - 1] = 0.0

    def replay_kernel(W_ref, wt_ref, ab_ref, Lt_ref, Rt_ref, x_ref,
                      y_ref):
        dot = lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            precision=precision, preferred_element_type=accum_dtype)
        matvec = _matvec(W_ref, Lt_ref, Rt_ref, dot)
        vdot = lambda a, b: sum(jnp.sum(a[t] * b[t]) for t in range(d))
        x0 = [x_ref[0, t].astype(accum_dtype) for t in range(d)]
        nrm = jnp.sqrt(vdot(x0, x0))
        inv = jnp.where(nrm > delta, 1.0 / jnp.where(nrm > 0, nrm, 1.0),
                        0.0)
        v = [x0[t] * inv for t in range(d)]
        v_prev = [jnp.zeros_like(v[t]) for t in range(d)]
        y = [jnp.zeros_like(v[t]) for t in range(d)]
        for j in range(m):
            wj = wt_ref[0, j]
            y = [y[t] + wj * v[t] for t in range(d)]
            if j == m - 1:
                break
            w = matvec(v)
            alpha = ab_ref[0, 0, j]
            # dead-step sentinel (+LARGE) never reaches the arithmetic:
            # its v is all-zero, so alpha*v = 0 regardless — but clamp
            # anyway to keep inf/nan out of the multiply
            alpha = jnp.where(jnp.abs(alpha) >= LARGE, 0.0, alpha)
            beta_prev = ab_ref[0, 1, jnp.maximum(j - 1, 0)] * (
                1.0 if j > 0 else 0.0)
            w = [w[t] - alpha * v[t] - beta_prev * v_prev[t]
                 for t in range(d)]
            beta = ab_ref[0, 1, j]
            inv = jnp.where(beta > delta,
                            1.0 / jnp.where(beta > 0, beta, 1.0), 0.0)
            v_prev = v
            v = [w[t] * inv for t in range(d)]
        for t in range(d):
            y_ref[0, t] = y[t].astype(y_ref.dtype)

    def bs(lead, shape):
        return pl.BlockSpec(
            (1, lead) + shape,
            lambda i: (i, 0) + (0,) * len(shape),
            memory_space=pltpu.VMEM)

    @jax.jit
    def fact(Lt, W, Rt, x0):
        B = x0.shape[0]
        return pl.pallas_call(
            fact_kernel,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((M, M, d, d), lambda i: (0, 0, 0, 0),
                             memory_space=pltpu.SMEM),
                bs(M, (chi, chi)),
                bs(M, (chi, chi)),
                bs(d, (chi, chi)),
            ],
            out_specs=pl.BlockSpec((1, 2, m), lambda i: (i, 0, 0),
                                   memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((B, 2, m), accum_dtype),
            interpret=interpret,
        )(W, Lt, Rt, x0)

    @jax.jit
    def replay(Lt, W, Rt, x0, weights, ab):
        B = x0.shape[0]
        return pl.pallas_call(
            replay_kernel,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((M, M, d, d), lambda i: (0, 0, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, m), lambda i: (i, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 2, m), lambda i: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                bs(M, (chi, chi)),
                bs(M, (chi, chi)),
                bs(d, (chi, chi)),
            ],
            out_specs=bs(d, (chi, chi)),
            out_shape=jax.ShapeDtypeStruct((B, d, chi, chi), x0.dtype),
            interpret=interpret,
        )(W, weights, ab, Lt, Rt, x0)

    return fact, replay


def make_fused_lanczos_streamed(chi: int, d: int, M: int, m: int,
                                n_chunks: int = 4,
                                delta: float = 1e-8,
                                accum_dtype=jnp.float32,
                                interpret: bool = False,
                                precision=None):
    """Large-chi whole-Lanczos kernel with the chi axis CHUNKED over a
    third grid dimension (VERDICT r2 item 1: at chi=512 both the
    single-pass basis (35 MB) and the two-pass working set (18.9 MB)
    exceed the ~16 MB VMEM, so the fused path could never engage and the
    XLA path runs dependent-op-latency-bound at ~41 us/GEMM layer).

    Memory plan (per grid program, tiles of chi*chi f32 = chi^2*4 B):

    * resident in VMEM scratch: the three recurrence vectors
      ``v, v_prev, w`` (d tiles each) + the chunked stage-1 intermediate
      ``P`` (M*d chunk-tiles);
    * resident inputs: ``Rt`` (M tiles; its block index ignores the j/k
      grid axes, so Mosaic keeps ONE buffer) and the start vector
      ``v0`` (d tiles);
    * streamed: ``Lt`` arrives in c-chunks (block index follows k,
      double-buffered DMA overlaps the GEMMs), and the Krylov basis
      ``V`` leaves chunk-by-chunk as an OUTPUT — it never resides on
      chip, which is what removes the single-pass kernel's m*d*chi^2
      wall.

    Total ~ (2M + 3d + d)*chi^2*4 + (M*d + M)*chi^2*4/K: 14.5 MB at
    chi=512, M=3, d=2, K=4 — and unlike the two-pass variant the matvec
    count stays 1x.  The K chunk GEMMs of each stage are independent,
    so consecutive grid steps overlap systolic fill/drain even at B=1 —
    the "parallel work per dependency step" the fusion rule demands
    (BASELINE.md), which batch provided at small chi and chunking
    provides here.

    Grid ``(B, m, K)``; per (j, k): stage 1 computes
    ``P[w,t][c-chunk, b] = Lt[w][c-chunk, :] @ v[t]``, stage 2
    accumulates ``w[s][c-chunk, :] = sum_v (sum_wt W*P) @ Rt[v]`` and the
    chunk's alpha contribution; ``V[j]``'s chunk is emitted; at
    ``k == K-1`` the three-term update, beta, and the basis rotation run
    on the resident full tiles.  Semantics identical to
    :func:`make_fused_lanczos` (plain three-term recurrence, +1e10 dead
    sentinels); returns the same ``(V, ab)``.
    """
    LARGE = 1e10
    if chi % n_chunks:
        raise ValueError(f"chi={chi} not divisible by n_chunks={n_chunks}")
    cs = chi // n_chunks
    K = n_chunks

    def kernel(W_ref, Rt_ref, x0_ref, Lc_ref, V_ref, ab_ref,
               v_scr, vp_scr, w_scr, P_scr, st_scr):
        # st_scr (SMEM f32): [0]=alpha_acc, [1]=beta_prev, [2]=alive
        j = pl.program_id(1)
        k = pl.program_id(2)
        dot = lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            precision=precision, preferred_element_type=accum_dtype)

        @pl.when(jnp.logical_and(j == 0, k == 0))
        def _():
            x0 = x0_ref[0].astype(accum_dtype)          # (d, chi, chi)
            nrm = jnp.sqrt(jnp.sum(x0 * x0))
            inv = jnp.where(nrm > delta,
                            1.0 / jnp.where(nrm > 0, nrm, 1.0), 0.0)
            v_scr[...] = x0 * inv
            vp_scr[...] = jnp.zeros_like(x0)
            st_scr[1] = jnp.zeros((), accum_dtype)
            st_scr[2] = (nrm > delta).astype(accum_dtype)

        @pl.when(k == 0)
        def _():
            st_scr[0] = jnp.zeros((), accum_dtype)

        # emit this chunk of the CURRENT basis vector
        for t in range(d):
            V_ref[0, 0, t] = v_scr[t, pl.ds(k * cs, cs), :].astype(
                V_ref.dtype)

        # stage 1: P[w, t] = Lt[w][c-chunk, :] @ v[t]      (cs, chi)
        for w_i in range(M):
            for t in range(d):
                P_scr[w_i, t] = dot(Lc_ref[0, w_i], v_scr[t])
        # stage 2: w[s][c-chunk, :] = sum_v (sum_wt W[w,v,s,t] P) @ Rt[v]
        alpha_part = jnp.zeros((), accum_dtype)
        for s in range(d):
            acc = None
            for v_i in range(M):
                Q = None
                for w_i in range(M):
                    for t in range(d):
                        term = W_ref[w_i, v_i, s, t] * P_scr[w_i, t]
                        Q = term if Q is None else Q + term
                contrib = dot(Q, Rt_ref[0, v_i])
                acc = contrib if acc is None else acc + contrib
            w_scr[s, pl.ds(k * cs, cs), :] = acc
            alpha_part = alpha_part + jnp.sum(
                v_scr[s, pl.ds(k * cs, cs), :] * acc)
        st_scr[0] = st_scr[0] + alpha_part

        @pl.when(k == K - 1)
        def _():
            alive = st_scr[2] > 0.5
            alpha = st_scr[0]
            ab_ref[0, 0, j] = jnp.where(alive, alpha, LARGE)
            wv = (w_scr[...] - alpha * v_scr[...]
                  - st_scr[1] * vp_scr[...])
            beta = jnp.sqrt(jnp.sum(wv * wv))
            alive_next = jnp.logical_and(alive, beta > delta)
            if m > 1:
                @pl.when(j < m - 1)
                def _():
                    ab_ref[0, 1, j] = jnp.where(alive_next, beta, 0.0)
            @pl.when(j == m - 1)
            def _():
                ab_ref[0, 1, m - 1] = jnp.zeros((), accum_dtype)
            inv = jnp.where(beta > delta,
                            1.0 / jnp.where(beta > 0, beta, 1.0), 0.0)
            keep = alive_next.astype(accum_dtype)
            vp_scr[...] = v_scr[...]
            v_scr[...] = wv * inv * keep
            st_scr[1] = jnp.where(alive_next, beta,
                                  jnp.zeros((), accum_dtype))
            st_scr[2] = alive_next.astype(accum_dtype)

    @jax.jit
    def f(Lt, W, Rt, x0):
        B = x0.shape[0]
        grid = (B, m, K)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((M, M, d, d), lambda i, j, k: (0, 0, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, M, chi, chi),
                             lambda i, j, k: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, d, chi, chi),
                             lambda i, j, k: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, M, cs, chi),
                             lambda i, j, k: (i, 0, k, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, d, cs, chi),
                             lambda i, j, k: (i, j, 0, k, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2, m), lambda i, j, k: (i, 0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, m, d, chi, chi), x0.dtype),
                jax.ShapeDtypeStruct((B, 2, m), accum_dtype),
            ],
            scratch_shapes=[
                pltpu.VMEM((d, chi, chi), accum_dtype),   # v
                pltpu.VMEM((d, chi, chi), accum_dtype),   # v_prev
                pltpu.VMEM((d, chi, chi), accum_dtype),   # w
                pltpu.VMEM((M, d, cs, chi), accum_dtype),  # P chunk
                pltpu.SMEM((3,), accum_dtype),            # alpha/beta/alive
            ],
            interpret=interpret,
        )(W, Rt, x0, Lt)

    return f


def streamed_chunk_count(chi: int, d: int, M: int,
                         budget_bytes: Optional[int] = None
                         ) -> Optional[int]:
    """Delegates to the single VMEM admission authority
    (:func:`tensornetwork_tpu.ops.vmem.streamed_chunk_count`); kept here
    for call-site compatibility."""
    from tensornetwork_tpu.ops import vmem
    return vmem.streamed_chunk_count(chi, d, M, budget_bytes)


def fused_lanczos_ground_state_streamed(L, W, R, x0, num_krylov_vecs: int,
                                        ritz_method: str = "power",
                                        power_iters: int = 60,
                                        delta: float = 1e-8,
                                        n_chunks: Optional[int] = None,
                                        interpret: bool = False,
                                        precision=None):
    """Batched ground-state Lanczos via the chi-chunked streamed kernel
    (:func:`make_fused_lanczos_streamed`) — the large-chi tier of
    :func:`fused_lanczos_ground_state` (same solver-layout operands and
    return convention)."""
    from tensornetwork_tpu.ops import krylov

    B, chi, _, _ = L.shape
    d = x0.shape[2]
    M = W.shape[0]
    m = num_krylov_vecs
    accum = x0.dtype if x0.dtype == jnp.float64 else jnp.float32
    if n_chunks is None:
        n_chunks = streamed_chunk_count(chi, d, M)
        if n_chunks is None:
            raise ValueError(
                f"no streamed-kernel chunking fits VMEM at chi={chi}")
    Lt, W_, Rt, xt = prepare_operands(L, W, R, x0)
    fs = make_fused_lanczos_streamed(chi, d, M, m, n_chunks=n_chunks,
                                     delta=delta, accum_dtype=accum,
                                     interpret=interpret,
                                     precision=precision)
    V, ab = fs(Lt, W_.astype(accum), Rt, xt)
    alphas, betas = ab[:, 0, :], ab[:, 1, : m - 1]
    evals, weights = jax.vmap(
        lambda al, be: krylov.tridiag_ritz(al, be, ritz_method,
                                           power_iters))(alphas, betas)
    y = jnp.einsum("Bm,Bmtab->Btab", weights.astype(V.dtype), V)
    nrm = jnp.sqrt(jnp.sum(y * y, axis=(1, 2, 3), keepdims=True))
    y = y / jnp.where(nrm > delta, nrm, 1.0)
    return evals, y.transpose(0, 2, 1, 3)


def fused_lanczos_ground_state(L, W, R, x0, num_krylov_vecs: int,
                               ritz_method: str = "power",
                               power_iters: int = 60,
                               delta: float = 1e-8,
                               interpret: bool = False,
                               precision=None,
                               two_pass: bool = False,
                               tile_b: int = 1):
    """Batched ground-state Lanczos via the fused kernel.

    Solver-layout operands (batched): L (B,a,M,c), W (M,M,d,d),
    R (B,b,M,d), x0 (B,a,t,b).  Returns ``(evals (B,), evecs
    (B,a,t,b))`` — the smallest Ritz pair per instance, matching
    ``krylov.eigsh_lanczos(..., numeig=1, reorthogonalize=False)``.
    """
    from tensornetwork_tpu.ops import krylov

    B, chi, _, _ = L.shape
    d = x0.shape[2]
    M = W.shape[0]
    m = num_krylov_vecs
    # accumulate in the input dtype when it is wider than f32 (f64 runs
    # only off-TPU / in interpret mode; the chip path is f32)
    accum = x0.dtype if x0.dtype == jnp.float64 else jnp.float32
    Lt, W_, Rt, xt = prepare_operands(L, W, R, x0)
    if two_pass:
        fact, replay = make_fused_lanczos_2pass(
            chi, d, M, m, delta=delta, accum_dtype=accum,
            interpret=interpret, precision=precision)
        ab = fact(Lt, W_, Rt, xt)
        alphas, betas = ab[:, 0, :], ab[:, 1, : m - 1]
        evals, weights = jax.vmap(
            lambda al, be: krylov.tridiag_ritz(al, be, ritz_method,
                                               power_iters))(alphas,
                                                             betas)
        y = replay(Lt, W_, Rt, xt, weights.astype(accum), ab)
    else:
        fl = make_fused_lanczos(chi, d, M, m, delta=delta,
                                accum_dtype=accum,
                                interpret=interpret, precision=precision,
                                tile_b=tile_b)
        V, ab = fl(Lt, W_, Rt, xt)
        alphas, betas = ab[:, 0, :], ab[:, 1, : m - 1]
        evals, weights = jax.vmap(
            lambda al, be: krylov.tridiag_ritz(al, be, ritz_method,
                                               power_iters))(alphas,
                                                             betas)
        y = jnp.einsum("Bm,Bmtab->Btab", weights.astype(V.dtype), V)
    nrm = jnp.sqrt(jnp.sum(y * y, axis=(1, 2, 3), keepdims=True))
    y = y / jnp.where(nrm > delta, nrm, 1.0)
    # kernel layout [t, a, b] -> solver layout [a, t, b]
    return evals, y.transpose(0, 2, 1, 3)


def fused_lanczos_ground_state_2s(L, W1, W2, R, x0, num_krylov_vecs: int,
                                  ritz_method: str = "power",
                                  power_iters: int = 60,
                                  delta: float = 1e-8,
                                  interpret: bool = False,
                                  precision=None, tile_b: int = 1):
    """Two-site variant of :func:`fused_lanczos_ground_state`.

    The whole-Lanczos kernel is generic in the number of physical tiles:
    the two-site effective Hamiltonian ``L·W1·W2·R`` is the same
    ``sum_{w,v} L_w^T · x · R_v`` sandwich with ``nt = d*d`` tiles and
    the MPO pair pre-fused into a coupling tensor
    ``C[w,v,(s,u),(t,z)] = sum_m W1[w,m,s,t] W2[m,v,u,z]`` (SMEM
    scalars).  Operands: L (B,a,M,c), W1/W2 (M,M,d,d), R (B,b,M,d),
    x0 (B,a,t,z,b).  Returns ``(evals (B,), evecs (B,a,t,z,b))``.
    """
    from tensornetwork_tpu.ops import krylov

    B, chi, M, _ = L.shape
    d = W1.shape[2]
    nt = d * d
    m = num_krylov_vecs
    # the MPO pre-fusion contraction must run at the kernel's precision:
    # at DEFAULT it executes in bf16 on TPU and poisons every coupling
    # scalar (~1e-3 rel — measured on chip via the streamed wrapper)
    C = jnp.einsum("wmst,mvuz->wvsutz", W1, W2,
                   precision=precision).reshape(M, M, nt, nt)
    accum = x0.dtype if x0.dtype == jnp.float64 else jnp.float32
    Lt = L.transpose(0, 2, 3, 1)
    Rt = R.transpose(0, 2, 1, 3)
    xt = x0.reshape(B, chi, nt, chi).transpose(0, 2, 1, 3)
    fl = make_fused_lanczos(chi, nt, M, m, delta=delta,
                            accum_dtype=accum,
                            interpret=interpret, precision=precision,
                            tile_b=tile_b)
    V, ab = fl(Lt, C.astype(accum), Rt, xt)
    alphas, betas = ab[:, 0, :], ab[:, 1, : m - 1]
    evals, weights = jax.vmap(
        lambda al, be: krylov.tridiag_ritz(al, be, ritz_method,
                                           power_iters))(alphas, betas)
    y = jnp.einsum("Bm,Bmtab->Btab", weights.astype(V.dtype), V)
    nrm = jnp.sqrt(jnp.sum(y * y, axis=(1, 2, 3), keepdims=True))
    y = y / jnp.where(nrm > delta, nrm, 1.0)
    return evals, y.transpose(0, 2, 1, 3).reshape(B, chi, d, d, chi)


# (rho, sigma, kappa) -> tau sign table for the triple product of three
# complex factors L.x.R: component tau of (a+ib)(c+id)(e+if).
# G8[rho, sigma, kappa, tau]
_SC_TRIPLE_SIGNS = np.zeros((2, 2, 2, 2))
for _r in range(2):
    for _s in range(2):
        for _k in range(2):
            _n_im = _r + _s + _k
            _tau = _n_im % 2
            _sign = -1.0 if (_n_im // 2) % 2 else 1.0
            _SC_TRIPLE_SIGNS[_r, _s, _k, _tau] = _sign


def _realify_sandwich_operands(L_sc, W, R_sc, x_sc):
    """Realify SC operands of the H_eff sandwich for the generic fused
    kernel: complex Lanczos == real three-term Lanczos of the realified
    operator (Hermitian H has real tridiagonal coefficients, so the
    recurrence never leaves the realified span).

    Index doubling: w' = 2w+rho, v' = 2v+kappa, t' = 2t+sigma; the
    coupling W'[(w,rho),(v,kappa),(s,tau),(t,sigma)] =
    W[w,v,s,t] * sign(tau; rho,sigma,kappa) encodes the complex triple
    product.  Returns kernel-layout (Lt', W', Rt', xt') plus (chi, 2d,
    2M)."""
    B, chi, M, _ = L_sc.re.shape
    d = x_sc.re.shape[2]
    # (B, a, M, c) -> (B, a, 2M, c) with w' = 2w + rho
    Lp = jnp.stack([L_sc.re, L_sc.im], axis=3).reshape(B, chi, 2 * M, chi)
    Rp = jnp.stack([R_sc.re, R_sc.im], axis=3).reshape(B, chi, 2 * M, chi)
    xp = jnp.stack([x_sc.re, x_sc.im], axis=3).reshape(B, chi, 2 * d, chi)
    g = jnp.asarray(_SC_TRIPLE_SIGNS, W.dtype)     # (rho,sigma,kappa,tau)
    # W'[w,rho, v,kappa, s,tau, t,sigma] = W[w,v,s,t] * g[rho,sigma,kappa,tau]
    Wp = (W[:, None, :, None, :, None, :, None]
          * g.transpose(0, 2, 3, 1)[None, :, None, :, None, :, None, :])
    Wp = Wp.reshape(2 * M, 2 * M, 2 * d, 2 * d)
    Lt, Wp, Rt, xt = prepare_operands(Lp, Wp, Rp, xp)
    return Lt, Wp, Rt, xt, chi, 2 * d, 2 * M


def fused_lanczos_factorization_sc(L_sc, W, R_sc, x0_sc,
                                   num_krylov_vecs: int,
                                   delta: float = 1e-8,
                                   interpret: bool = False,
                                   precision=None):
    """Fused whole-Lanczos factorization of the split-complex H_eff.

    Operands: SC L (B,a,M,c), real W (M,M,d,d), SC R (B,b,M,d),
    SC x0 (B,a,t,b).  Returns ``(V, alphas, betas)`` with ``V`` an SC of
    shape (B, m, chi, d, chi) (solver layout) and real tridiagonal
    coefficients (B, m) / (B, m-1) — semantics of
    :func:`tensornetwork_tpu.ops.krylov.lanczos_factorization_sc`
    without reorthogonalization.
    """
    from tensornetwork_tpu.ops import split_complex as sc

    m = num_krylov_vecs
    Lt, Wp, Rt, xt, chi, d2, M2 = _realify_sandwich_operands(
        L_sc, W, R_sc, x0_sc)
    accum = xt.dtype if xt.dtype == jnp.float64 else jnp.float32
    delta = max(delta, 50 * float(jnp.finfo(accum).eps))  # see expm note
    fl = make_fused_lanczos(chi, d2, M2, m, delta=delta,
                            accum_dtype=accum,
                            interpret=interpret, precision=precision)
    Vp, ab = fl(Lt, Wp, Rt, xt)
    # Vp: (B, m, 2d, chi, chi) kernel layout [t'](a, b), t' = 2t+sigma
    B = Vp.shape[0]
    d = d2 // 2
    Vp = Vp.reshape(B, m, d, 2, chi, chi)
    # back to solver layout (B, m, a, t, b)
    V_re = Vp[:, :, :, 0].transpose(0, 1, 3, 2, 4)
    V_im = Vp[:, :, :, 1].transpose(0, 1, 3, 2, 4)
    alphas, betas = ab[:, 0, :], ab[:, 1, : m - 1]
    return sc.SC(V_re, V_im), alphas, betas


def expm_multiply_fused_sc(L_sc, W, R_sc, v_sc, coeff,
                           num_krylov_vecs: int,
                           delta: float = 1e-8,
                           interpret: bool = False,
                           precision=None):
    """Batched ``exp(coeff*H_eff) @ v`` on split-complex states via the
    fused Lanczos kernel (``coeff`` complex/SC/real scalar — real-time
    evolution is ``coeff = -1j*dt``).  Operands as in
    :func:`fused_lanczos_factorization_sc`; returns an SC (B,a,t,b).
    Semantics of :func:`tensornetwork_tpu.ops.krylov.
    expm_multiply_lanczos_sc` (norm-preserving up to projection error),
    with the plain three-term recurrence."""
    from tensornetwork_tpu.ops import split_complex as sc

    m = num_krylov_vecs
    nrm = jnp.sqrt(jnp.sum(v_sc.re**2, axis=(1, 2, 3))
                   + jnp.sum(v_sc.im**2, axis=(1, 2, 3)))  # (B,)
    V, alphas, betas = fused_lanczos_factorization_sc(
        L_sc, W, R_sc, v_sc, m, delta=delta, interpret=interpret,
        precision=precision)
    alphas = jnp.where(jnp.abs(alphas) >= 1e9,
                       alphas[:, :1], alphas)

    if isinstance(coeff, sc.SC):
        cr, ci = coeff.re, coeff.im
    elif isinstance(coeff, complex):
        cr = jnp.asarray(coeff.real, alphas.dtype)
        ci = jnp.asarray(coeff.imag, alphas.dtype)
    else:
        carr = jnp.asarray(coeff)
        if jnp.iscomplexobj(carr):
            cr, ci = jnp.real(carr), jnp.imag(carr)
        else:
            cr, ci = carr, jnp.zeros_like(carr)

    def small_weights(al, be):
        T = jnp.diag(al) + jnp.diag(be, 1) + jnp.diag(be, -1)
        evals, evecs = jnp.linalg.eigh(T)
        amp = jnp.exp(cr * evals)
        wr = evecs @ (amp * jnp.cos(ci * evals) * evecs[0, :])
        wi = evecs @ (amp * jnp.sin(ci * evals) * evecs[0, :])
        return wr, wi

    wr, wi = jax.vmap(small_weights)(alphas, betas)
    yr = (jnp.einsum("Bm,Bmatb->Batb", wr, V.re)
          - jnp.einsum("Bm,Bmatb->Batb", wi, V.im))
    yi = (jnp.einsum("Bm,Bmatb->Batb", wr, V.im)
          + jnp.einsum("Bm,Bmatb->Batb", wi, V.re))
    s = nrm[:, None, None, None]
    return sc.SC(yr * s, yi * s)


def expm_multiply_fused(L, W, R, v, coeff, num_krylov_vecs: int,
                        delta: float = 1e-8, interpret: bool = False,
                        precision=None):
    """Batched ``exp(coeff*H_eff) @ v`` on real states via the fused
    Lanczos kernel (``coeff`` a real scalar — imaginary-time evolution).
    Operands: L (B,a,M,c), W (M,M,d,d), R (B,b,M,d), v (B,a,t,b).
    Plain-three-term analog of :func:`tensornetwork_tpu.ops.krylov.
    expm_multiply_lanczos`."""
    from tensornetwork_tpu.ops import krylov  # noqa: F401  (parity docs)

    m = num_krylov_vecs
    nrm = jnp.sqrt(jnp.sum(v * v, axis=(1, 2, 3)))
    Lt, W_, Rt, xt = prepare_operands(L, W, R, v)
    B, chi = v.shape[0], v.shape[1]
    d = v.shape[2]
    M = W.shape[0]
    accum = v.dtype if v.dtype == jnp.float64 else jnp.float32
    # breakdown tolerance must sit above the accumulation noise floor:
    # plain three-term betas bottom out at ~1e-6 in f32 — continuing on
    # noise feeds garbage Ritz directions into the exponential weights
    delta = max(delta, 50 * float(jnp.finfo(accum).eps))
    fl = make_fused_lanczos(chi, d, M, m, delta=delta,
                            accum_dtype=accum,
                            interpret=interpret, precision=precision)
    V, ab = fl(Lt, W_, Rt, xt)
    alphas, betas = ab[:, 0, :], ab[:, 1, : m - 1]
    alphas = jnp.where(jnp.abs(alphas) >= 1e9, alphas[:, :1], alphas)
    coeff = jnp.asarray(coeff)

    def small_weights(al, be):
        T = jnp.diag(al) + jnp.diag(be, 1) + jnp.diag(be, -1)
        evals, evecs = jnp.linalg.eigh(T)
        return evecs @ (jnp.exp(coeff * evals) * evecs[0, :])

    w = jax.vmap(small_weights)(alphas, betas)
    y = jnp.einsum("Bm,Bmtab->Btab", w.astype(V.dtype), V)
    # kernel layout [t](a,b) -> solver layout (a,t,b)
    return y.transpose(0, 2, 1, 3) * nrm[:, None, None, None]


def make_fused_gauge_env(chi: int, d: int, M: int,
                         quintic_iters: int = 14, cubic_iters: int = 7,
                         accum_dtype=jnp.float32,
                         interpret: bool = False, precision=None):
    """Fused site epilogue: Newton-Schulz polar gauge shift + MPO
    environment growth, entirely in VMEM (one grid program per
    instance).  The polar iterations operate on the full (d*chi, chi)
    panel (single large GEMMs, matching XLA's schedule) while X stays
    resident in VMEM across all iterations.

    Kernel-layout operands (per instance):
      W: (M, M, d, d) SMEM couplings
      E: (M, chi, chi) env tiles [w](edge_in, edge_out)
      A: (d*chi, chi) panel, rows s-major: row (s*chi + edge_in)
    Outputs:
      Q: (d*chi, chi) isometric panel (same row order)
      P: (chi, chi) residual factor, A = Q·P
      Enew: (M, chi, chi) grown env tiles [v](new_in, new_out)

    One kernel serves both sweep directions — the wrappers transpose
    operands and permute W so the in-kernel pattern is identical.
    """
    a_c, b_c, c_c = 3.4445, -4.7750, 2.0315  # quintic coefficients

    def kernel(W_ref, E_ref, A_ref, Q_ref, P_ref, Enew_ref):
        dot = lambda x, y: jax.lax.dot_general(
            x, y, (((1,), (0,)), ((), ())),
            precision=precision, preferred_element_type=accum_dtype)
        dotT = lambda x, y: jax.lax.dot_general(  # contract dim0 of both
            x, y, (((0,), (0,)), ((), ())),
            precision=precision, preferred_element_type=accum_dtype)

        A = A_ref[0].astype(accum_dtype)          # (d*chi, chi)
        nrm2 = jnp.sum(A * A)
        inv = 1.0 / (jnp.sqrt(nrm2) * 1.01 + 1e-30)
        X = A * inv
        for _ in range(quintic_iters):
            G = dotT(X, X)
            Mx = b_c * G + c_c * dot(G, G)
            X = a_c * X + dot(X, Mx)
        for _ in range(cubic_iters):
            G = dotT(X, X)
            X = 1.5 * X - 0.5 * dot(X, G)
        Q_ref[0] = X.astype(Q_ref.dtype)
        P_ref[0] = dotT(X, A).astype(P_ref.dtype)
        # env growth on per-physical slices of the converged panel:
        # U[w][t] = X_t^T E_w ; acc[v][s] = sum_wt W.U ;
        # Enew[v] = sum_s acc[v][s] . X_s
        Xs = [X[s * chi:(s + 1) * chi, :] for s in range(d)]
        U = [[dotT(Xs[t], E_ref[0, w]) for t in range(d)]
             for w in range(M)]
        for v in range(M):
            acc_v = None
            for s in range(d):
                Qv = None
                for w in range(M):
                    for t in range(d):
                        term = W_ref[w, v, s, t] * U[w][t]
                        Qv = term if Qv is None else Qv + term
                contrib = dot(Qv, Xs[s])
                acc_v = contrib if acc_v is None else acc_v + contrib
            Enew_ref[0, v] = acc_v.astype(Enew_ref.dtype)

    @jax.jit
    def f(W, E, A):
        B = A.shape[0]

        def bs(lead, shape):
            return pl.BlockSpec(
                (1, lead) + shape,
                lambda i: (i, 0) + (0,) * len(shape),
                memory_space=pltpu.VMEM)

        return pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((M, M, d, d), lambda i: (0, 0, 0, 0),
                             memory_space=pltpu.SMEM),
                bs(M, (chi, chi)),
                pl.BlockSpec((1, d * chi, chi), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, d * chi, chi), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, chi, chi), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                bs(M, (chi, chi)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, d * chi, chi), A.dtype),
                jax.ShapeDtypeStruct((B, chi, chi), A.dtype),
                jax.ShapeDtypeStruct((B, M, chi, chi), A.dtype),
            ],
            interpret=interpret,
        )(W, E, A)

    return f


def fused_gauge_env_left(L, W, A, quintic_iters: int = 14,
                         cubic_iters: int = 7, interpret: bool = False,
                         precision=None):
    """Batched left-moving epilogue: ``A = Q·Rm`` (left-isometric Q) +
    ``Lnew = update_left(L, Q, W)``.  Solver layouts: L (B,a,M,c),
    W (M,M,s,t), A (B,a,s,b).  Returns (Q (B,a,s,r), Rm (B,r,b),
    Lnew (B,r,M,p))."""
    B, chi, M, _ = L.shape
    d = A.shape[2]
    accum = A.dtype if A.dtype == jnp.float64 else jnp.float32
    fk = make_fused_gauge_env(chi, d, M, quintic_iters, cubic_iters,
                              accum_dtype=accum,
                              interpret=interpret, precision=precision)
    E = L.transpose(0, 2, 1, 3)                      # [w](a, c)
    Ap = A.transpose(0, 2, 1, 3).reshape(B, d * chi, chi)  # rows (s, a)
    Qp, P, Enew = fk(W, E, Ap)
    Q = Qp.reshape(B, d, chi, chi).transpose(0, 2, 1, 3)   # (B, a, s, r)
    Lnew = Enew.transpose(0, 2, 1, 3)                # (B, r, M, p)
    return Q, P, Lnew


def fused_gauge_env_right(R, W, A, quintic_iters: int = 14,
                          cubic_iters: int = 7, interpret: bool = False,
                          precision=None):
    """Batched right-moving epilogue: ``A = Lm·Q`` (right-isometric Q) +
    ``Rnew = update_right(R, Q, W)``.  Solver layouts: R (B,b,M,d),
    W (M,M,s,t), A (B,a,s,b).  Returns (Q (B,l,s,b), Lm (B,a,l),
    Rnew (B,l,M,p))."""
    B, chi, M, _ = R.shape
    d = A.shape[2]
    accum = A.dtype if A.dtype == jnp.float64 else jnp.float32
    fk = make_fused_gauge_env(chi, d, M, quintic_iters, cubic_iters,
                              accum_dtype=accum,
                              interpret=interpret, precision=precision)
    E = R.transpose(0, 2, 1, 3)                      # [v](b, d)
    Ap = A.transpose(0, 2, 3, 1).reshape(B, d * chi, chi)  # rows (t, b)
    # kernel coupling convention is [summed_env, out_env, bra, ket];
    # update_right sums over v and emits w, so only the bond pair swaps
    Weff = W.transpose(1, 0, 2, 3)
    Qp, P, Enew = fk(Weff, E, Ap)
    Q = Qp.reshape(B, d, chi, chi).transpose(0, 3, 1, 2)   # (B, l, t, b)
    Lm = P.transpose(0, 2, 1)                        # (l, a) -> (a, l)
    Rnew = Enew.transpose(0, 2, 1, 3)                # (B, l, M, p)
    return Q, Lm, Rnew


def heff_matvec_reference(L, W, R, x):
    """XLA einsum reference of the same contraction (batched).
    Argument order (L, W, R, x); L[a,w,c], W[w,v,s,t], R[b,v,d],
    x[a,t,b] -> y[c,s,d]."""
    return jnp.einsum("Bawc,wvst,Batb,Bbvd->Bcsd", L, W, x, R,
                      optimize="auto")


# ---------------------------------------------------------------------------
# Batched MPS transfer-matrix chain (the MXU-utilization headline op)
# ---------------------------------------------------------------------------


def make_transfer_chain(chi: int, d: int, n_sites: int, tile_b: int = 8,
                        accum_dtype=jnp.float32, interpret: bool = False,
                        precision=None, variant: str = "loop"):
    """Whole-chain MPS transfer contraction: for each instance,
    ``E <- sum_{a,c,s} E[a,c] A_n[a,s,b] A_n[c,s,p]`` applied over all
    ``n_sites`` sites, with the environment resident in VMEM for the whole
    chain and the site tensors streamed from HBM (grid = batch-blocks x
    sites; the carried E lives in a scratch that persists across the
    sequential site steps).

    Why a kernel: the per-site batched contraction alone is
    HBM-bandwidth-bound (arithmetic intensity ~chi/2 FLOP/byte at f32 —
    44 TFLOP/s measured at chi=128 IS its roofline).  Keeping E on-chip
    and reading each A tile exactly once doubles intensity per GEMM and
    removes the E roundtrips: the chain becomes MXU-bound.

    Operand layout (prepare with :func:`transfer_chain` below):
      A:  (B, n_sites, d, chi, chi)   [s](a, b) matrices
      E0: (B, chi, chi)               [a, c]
    Returns E_N (B, chi, chi) in ``accum_dtype``.

    Real dtypes only (complex is unsupported on the target backend; for
    split-complex states use 3 real chains via Karatsuba).
    """

    def kernel(A_ref, E0_ref, out_ref, E_scr):
        n = pl.program_id(1)
        in_dtype = A_ref.dtype

        @pl.when(n == 0)
        def _():
            E_scr[...] = E0_ref[...].astype(accum_dtype)

        if variant == "dg":
            # NEGATIVE RESULT (2026-08-20, remote Mosaic): batched
            # dot_general inside the kernel fails to lower ('tpu.matmul'
            # op Not implemented: lhs batch).  Kept for interpret-mode
            # reference only; use "loop" or "rows" on hardware.
            Eb = E_scr[...].astype(in_dtype)          # (i, a, c)
            A = A_ref[:, 0]                           # (i, s, a, b)
            Y = jax.lax.dot_general(
                Eb, A, (((1,), (2,)), ((0,), (0,))),
                precision=precision,
                preferred_element_type=accum_dtype)   # (i, c, s, b)
            E2 = jax.lax.dot_general(
                Y.astype(in_dtype), A, (((1, 2), (2, 1)), ((0,), (0,))),
                precision=precision,
                preferred_element_type=accum_dtype)   # (i, b, p)
            E_scr[...] = E2
        elif variant == "rows":
            # A arrives row-stacked: A2[(s, a), b] (d*chi, chi).  Stage 1
            # still needs d separate chi^3 GEMMs (contraction over a only)
            # but stage 2 contracts over the fused (s, c) axis as ONE
            # GEMM of depth d*chi — half the stage-2 weight loads and a
            # 2x-deeper systolic accumulation.  The two stages are issued
            # PHASED across the tile (all stage-1 GEMMs for every
            # instance, then all stage-2): consecutive MXU ops are then
            # independent, so systolic fill/drain overlaps — the
            # instance-major order serializes on each instance's
            # 2-dependent-GEMM chain instead (measured 2026-08-20).
            dotT = lambda a, b: jax.lax.dot_general(
                a, b, (((0,), (0,)), ((), ())),
                precision=precision, preferred_element_type=accum_dtype)
            Y2s = []
            for i in range(tile_b):
                Eb = E_scr[i].astype(in_dtype)
                A2 = A_ref[i, 0]                      # (d*chi, chi)
                Ys = [dotT(Eb, A2[s * chi:(s + 1) * chi])  # (c, b)
                      for s in range(d)]
                Y2s.append(jnp.concatenate(Ys, axis=0).astype(in_dtype))
            for i in range(tile_b):
                E_scr[i] = dotT(Y2s[i], A_ref[i, 0])  # (b, p)
        else:
            dotT = lambda a, b: jax.lax.dot_general(
                a, b, (((0,), (0,)), ((), ())),
                precision=precision, preferred_element_type=accum_dtype)
            Ys = [[dotT(E_scr[i].astype(in_dtype), A_ref[i, 0, s])
                   for s in range(d)] for i in range(tile_b)]
            for i in range(tile_b):
                acc = None
                for s in range(d):
                    contrib = dotT(Ys[i][s].astype(in_dtype),
                                   A_ref[i, 0, s])    # (b, p)
                    acc = contrib if acc is None else acc + contrib
                E_scr[i] = acc

        @pl.when(n == n_sites - 1)
        def _():
            out_ref[...] = E_scr[...].astype(out_ref.dtype)

    @jax.jit
    def f(A, E0):
        B = A.shape[0]
        if B % tile_b != 0:
            raise ValueError(f"batch {B} not divisible by tile {tile_b}")
        grid = (B // tile_b, n_sites)
        if variant == "rows":
            a_spec = pl.BlockSpec((tile_b, 1, d * chi, chi),
                                  lambda i, n: (i, n, 0, 0),
                                  memory_space=pltpu.VMEM)
        else:
            a_spec = pl.BlockSpec((tile_b, 1, d, chi, chi),
                                  lambda i, n: (i, n, 0, 0, 0),
                                  memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                a_spec,
                pl.BlockSpec((tile_b, chi, chi), lambda i, n: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile_b, chi, chi),
                                   lambda i, n: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, chi, chi), accum_dtype),
            scratch_shapes=[pltpu.VMEM((tile_b, chi, chi), accum_dtype)],
            interpret=interpret,
        )(A, E0)

    return f


def transfer_chain_xla(As, E0, precision=None):
    """XLA reference of the same chain (batched ``lax.scan`` over sites).
    As: (B, N, a, s, b) solver layout; E0: (B, a, c)."""
    def step(E, A_n):
        E2 = jnp.einsum("Bac,Basb,Bcsp->Bbp", E, A_n, A_n,
                        optimize="auto", precision=precision)
        return E2, None
    E, _ = jax.lax.scan(step, E0, As.transpose(1, 0, 2, 3, 4))
    return E


def transfer_chain(As, E0, impl: str = "pallas", tile_b: int = 8,
                   interpret: bool = False, precision=None,
                   variant: str = "loop", accum_dtype=jnp.float32):
    """Batched MPS norm/overlap environment over a whole chain.

    As: (B, N, chi, d, chi) stacked MPS (solver layout), E0: (B, chi, chi).
    ``impl="pallas"`` keeps E in VMEM across all sites (MXU-bound);
    ``impl="xla"`` is the scan-of-einsum reference.  ``variant="dg"``
    issues each dependency layer as one batched dot_general."""
    B, N, chi, d, _ = As.shape
    if impl == "xla":
        return transfer_chain_xla(As, E0, precision=precision)
    if variant == "dg" and not interpret and jax.default_backend() == "tpu":
        # remote Mosaic cannot lower batched in-kernel dot_general
        # ('tpu.matmul' lhs batch unimplemented) — fail with a clear
        # message instead of an opaque Mosaic error (ADVICE r2)
        raise ValueError(
            "transfer_chain variant='dg' does not lower on TPU hardware "
            "(in-kernel batched dot_general unsupported by Mosaic); use "
            "variant='loop' or 'rows', or pass interpret=True")
    if variant == "rows":
        # row-stacked layout A2[(s, a), b]
        Ak = jnp.transpose(As, (0, 1, 3, 2, 4)).reshape(B, N, d * chi, chi)
    else:
        Ak = jnp.transpose(As, (0, 1, 3, 2, 4))   # (B, N, s, a, b)
    tile_b = min(tile_b, B)
    while B % tile_b:
        tile_b -= 1
    fk = make_transfer_chain(chi, d, N, tile_b=tile_b,
                             interpret=interpret, precision=precision,
                             variant=variant, accum_dtype=accum_dtype)
    return fk(Ak, E0)


# ---------------------------------------------------------------------------
# Doubly-chunked streamed matvec + XLA-recurrence Lanczos (round 4):
# the large-chi tier for TWO-SITE solves (theta tiles are (chi*d)^2) and
# for chi=1024 one-site, where even the r3 streamed kernel's resident
# recurrence vectors (3*nt tiles) no longer fit VMEM.  VERDICT r3 item 1.
# ---------------------------------------------------------------------------


def make_streamed_matvec(chi: int, nt: int, M: int, n_chunks: int,
                         n_chunks2: int = 1,
                         accum_dtype=jnp.float32,
                         interpret: bool = False,
                         precision=None):
    """One H_eff matvec with BOTH bond axes chunked over the grid.

    The r3 streamed whole-Lanczos kernel keeps the three recurrence
    vectors resident (3*nt chi-tiles) — 12 tiles for two-site (nt=d^2)
    or chi=1024, which no VMEM plan admits.  This kernel fuses only the
    matvec (the FLOP carrier) and streams everything chunk-wise; the
    cheap three-term recurrence runs in XLA between kernel calls, all
    inside one jit (the extra HBM traffic is ~2 state-sizes per step —
    tens of microseconds against a ~ms matvec at these shapes).

    Grid ``(B, K, K2)``: the output row axis (c) is chunked K-ways, the
    output column axis (d) K2-ways.  Per program: at ``k2 == 0`` the
    stage-1 GEMMs run for this c-chunk and are immediately folded
    through the MPO couplings into ``Q[v, s] (cs, chi)`` scratch (the
    P intermediate is never materialized — saves M*nt chunk-tiles); per
    k2, stage 2 is the pure GEMM ``y[s] += Q[v,s] @ R[v][:, d-chunk]``.
    The Rayleigh quotient ``alpha = <x, y>`` accumulates in SMEM so the
    XLA glue does not need a separate reduction pass over y.

    Returns ``f(Lt, C, Rt, x) -> (y, alpha)`` on kernel-layout operands:
      Lt: (B, M, chi, chi) [w][c, a]   C: (M, M, nt, nt) couplings
      Rt: (B, M, chi, chi) [v][b, d]   x: (B, nt, chi, chi) [t][a, b]
      y:  (B, nt, chi, chi) [s][c, d]  alpha: (B,)
    """
    if chi % n_chunks or chi % n_chunks2:
        raise ValueError(f"chi={chi} not divisible by chunk counts "
                         f"({n_chunks}, {n_chunks2})")
    cs = chi // n_chunks
    ds = chi // n_chunks2
    K, K2 = n_chunks, n_chunks2

    def kernel(C_ref, x_ref, Lc_ref, Rc_ref, y_ref, alpha_ref, Q_scr):
        k = pl.program_id(1)
        k2 = pl.program_id(2)
        dot = lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            precision=precision, preferred_element_type=accum_dtype)

        @pl.when(jnp.logical_and(k == 0, k2 == 0))
        def _():
            alpha_ref[0, 0] = jnp.zeros((), accum_dtype)

        @pl.when(k2 == 0)
        def _():
            # stage 1 + coupling fold: Q[v, s] = sum_wt C[w,v,s,t] *
            # (L[w][c-chunk, :] @ x[t])
            for w_i in range(M):
                for t in range(nt):
                    tmp = dot(Lc_ref[0, w_i], x_ref[0, t])
                    for v_i in range(M):
                        for s in range(nt):
                            c = C_ref[w_i, v_i, s, t]
                            if w_i == 0 and t == 0:
                                Q_scr[v_i, s] = c * tmp
                            else:
                                Q_scr[v_i, s] = Q_scr[v_i, s] + c * tmp

        apart = jnp.zeros((), accum_dtype)
        for s in range(nt):
            acc = None
            for v_i in range(M):
                contrib = dot(Q_scr[v_i, s], Rc_ref[0, v_i])
                acc = contrib if acc is None else acc + contrib
            y_ref[0, s] = acc.astype(y_ref.dtype)
            apart = apart + jnp.sum(
                x_ref[0, s, pl.ds(k * cs, cs), pl.ds(k2 * ds, ds)] * acc)
        alpha_ref[0, 0] = alpha_ref[0, 0] + apart

    @jax.jit
    def f(Lt, C, Rt, x):
        B = x.shape[0]
        grid = (B, K, K2)
        y, alpha = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((M, M, nt, nt), lambda i, k, k2: (0,) * 4,
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, nt, chi, chi),
                             lambda i, k, k2: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, M, cs, chi),
                             lambda i, k, k2: (i, 0, k, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, M, chi, ds),
                             lambda i, k, k2: (i, 0, 0, k2),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, nt, cs, ds),
                             lambda i, k, k2: (i, 0, k, k2),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda i, k, k2: (i, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, nt, chi, chi), accum_dtype),
                jax.ShapeDtypeStruct((B, 1), accum_dtype),
            ],
            scratch_shapes=[
                pltpu.VMEM((M, nt, cs, chi), accum_dtype),  # Q
            ],
            interpret=interpret,
        )(C, x, Lt, Rt)
        return y, alpha[:, 0]

    return f


def streamed_matvec_plan(chi: int, nt: int, M: int,
                         budget_bytes: Optional[int] = None):
    """Delegates to the single VMEM admission authority
    (:func:`tensornetwork_tpu.ops.vmem.streamed_matvec_plan`); kept here
    for call-site compatibility."""
    from tensornetwork_tpu.ops import vmem
    return vmem.streamed_matvec_plan(chi, nt, M, budget_bytes)


def make_streamed_matvec_xl(chi: int, nt: int, M: int, n_chunks: int,
                            n_chunks3: int, n_chunks2: int,
                            accum_dtype=jnp.float32,
                            interpret: bool = False,
                            precision=None):
    """One H_eff matvec with ALL THREE axes chunked — the chi=1024
    TWO-SITE tier (VERDICT r4 item 2a), where the state x alone is
    nt*chi^2*4 = 16 MB and :func:`make_streamed_matvec`'s x-resident
    plan cannot exist.

    Two cooperating kernels inside one jit, with the coupling-folded
    stage-1 result Q[v, s] (chi, chi per (v, s)) staged through HBM:

    * kernel A — grid ``(B, K, K3)``: for output-row chunk k,
      accumulate ``Q[v, s][c-chunk, :] += sum_wt C[w,v,s,t] *
      (L[w][c-chunk, a-chunk] @ x[t][a-chunk, :])`` over contraction
      chunks k3 (the Q block is revisited across k3 and initialized at
      k3 == 0 — x is streamed in a-chunks, never resident).
    * kernel B — grid ``(B, K, K2)``: the pure GEMM epilogue
      ``y[s][c-chunk, d-chunk] = sum_v Q[v, s][c-chunk, :] @
      R[v][:, d-chunk]`` plus the SMEM-accumulated Rayleigh quotient
      ``alpha = <x, y>``.

    The extra HBM round trip is the Q stage (M*nt chi-tiles, 48 MB at
    chi=1024 — ~0.12 ms against a ~2.3 ms matvec at 22.9 TF).

    Operands/returns as :func:`make_streamed_matvec`:
      ``f(Lt, C, Rt, x) -> (y, alpha)``.
    """
    if chi % n_chunks or chi % n_chunks2 or chi % n_chunks3:
        raise ValueError(f"chi={chi} not divisible by chunk counts "
                         f"({n_chunks}, {n_chunks3}, {n_chunks2})")
    cs = chi // n_chunks
    as_ = chi // n_chunks3
    ds = chi // n_chunks2
    K, K3, K2 = n_chunks, n_chunks3, n_chunks2

    def kernel_a(C_ref, x_ref, Lc_ref, Q_ref):
        k3 = pl.program_id(2)
        dot = lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            precision=precision, preferred_element_type=accum_dtype)
        for w_i in range(M):
            for t in range(nt):
                tmp = dot(Lc_ref[0, w_i], x_ref[0, t])
                for v_i in range(M):
                    for s in range(nt):
                        c = C_ref[w_i, v_i, s, t]
                        first = w_i == 0 and t == 0
                        if first:
                            # first contribution of this k3 pass:
                            # overwrite at k3 == 0, else accumulate
                            # onto the revisited block
                            @pl.when(k3 == 0)
                            def _(v_i=v_i, s=s, tmp=tmp, c=c):
                                Q_ref[0, v_i, s] = c * tmp

                            @pl.when(k3 > 0)
                            def _(v_i=v_i, s=s, tmp=tmp, c=c):
                                Q_ref[0, v_i, s] = Q_ref[0, v_i, s] + c * tmp
                        else:
                            Q_ref[0, v_i, s] = Q_ref[0, v_i, s] + c * tmp

    def kernel_b(x_ref, Q_ref, Rc_ref, y_ref, alpha_ref):
        k = pl.program_id(1)
        k2 = pl.program_id(2)
        dot = lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            precision=precision, preferred_element_type=accum_dtype)

        @pl.when(jnp.logical_and(k == 0, k2 == 0))
        def _():
            alpha_ref[0, 0] = jnp.zeros((), accum_dtype)

        apart = jnp.zeros((), accum_dtype)
        for s in range(nt):
            acc = None
            for v_i in range(M):
                contrib = dot(Q_ref[0, v_i, s], Rc_ref[0, v_i])
                acc = contrib if acc is None else acc + contrib
            y_ref[0, s] = acc.astype(y_ref.dtype)
            apart = apart + jnp.sum(x_ref[0, s] * acc)
        alpha_ref[0, 0] = alpha_ref[0, 0] + apart

    @jax.jit
    def f(Lt, C, Rt, x):
        B = x.shape[0]
        Q = pl.pallas_call(
            kernel_a,
            grid=(B, K, K3),
            in_specs=[
                pl.BlockSpec((M, M, nt, nt), lambda i, k, k3: (0,) * 4,
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, nt, as_, chi),
                             lambda i, k, k3: (i, 0, k3, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, M, cs, as_),
                             lambda i, k, k3: (i, 0, k, k3),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, M, nt, cs, chi),
                                   lambda i, k, k3: (i, 0, 0, k, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, M, nt, chi, chi),
                                           accum_dtype),
            interpret=interpret,
        )(C, x, Lt)
        y, alpha = pl.pallas_call(
            kernel_b,
            grid=(B, K, K2),
            in_specs=[
                pl.BlockSpec((1, nt, cs, ds),
                             lambda i, k, k2: (i, 0, k, k2),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, M, nt, cs, chi),
                             lambda i, k, k2: (i, 0, 0, k, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, M, chi, ds),
                             lambda i, k, k2: (i, 0, 0, k2),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, nt, cs, ds),
                             lambda i, k, k2: (i, 0, k, k2),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda i, k, k2: (i, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, nt, chi, chi), accum_dtype),
                jax.ShapeDtypeStruct((B, 1), accum_dtype),
            ],
            interpret=interpret,
        )(x, Q, Rt)
        return y, alpha[:, 0]

    return f


def _streamed_lanczos_core(Lt, C, Rt, xt, m, K, K2,
                           delta, ritz_method, power_iters,
                           interpret, precision, K3=None):
    """Plain three-term Lanczos with the matvec in the doubly-chunked
    kernel (or, with ``K3``, the three-level-chunked XL kernel) and the
    recurrence in XLA (one jit).  Operands in kernel layout; returns
    ``(evals (B,), y (B, nt, chi, chi))`` (kernel layout).  Breakdown
    semantics match :func:`make_fused_lanczos` (+1e10 dead sentinels,
    zeroed dead betas/vectors)."""
    from tensornetwork_tpu.ops import krylov

    LARGE = 1e10
    B, nt, chi, _ = xt.shape
    M = C.shape[0]
    accum = xt.dtype if xt.dtype == jnp.float64 else jnp.float32
    if K3 is None:
        mvk = make_streamed_matvec(chi, nt, M, K, K2, accum_dtype=accum,
                                   interpret=interpret,
                                   precision=precision)
    else:
        mvk = make_streamed_matvec_xl(chi, nt, M, K, K3, K2,
                                      accum_dtype=accum,
                                      interpret=interpret,
                                      precision=precision)
    x0 = xt.astype(accum)
    C = C.astype(accum)
    nrm = jnp.sqrt(jnp.sum(x0 * x0, axis=(1, 2, 3), keepdims=True))
    alive0 = nrm[:, 0, 0, 0] > delta
    v0 = jnp.where(nrm > delta,
                   x0 / jnp.where(nrm > 0, nrm, 1.0), 0.0)
    zeros_B = jnp.zeros((B,), accum)

    def body(carry, _):
        v, vp, beta_prev, alive = carry
        w, alpha = mvk(Lt, C, Rt, v)
        alpha_out = jnp.where(alive, alpha, LARGE)
        wv = (w - alpha[:, None, None, None] * v
              - beta_prev[:, None, None, None] * vp)
        beta = jnp.sqrt(jnp.sum(wv * wv, axis=(1, 2, 3)))
        alive_next = jnp.logical_and(alive, beta > delta)
        inv = jnp.where(beta > delta,
                        1.0 / jnp.where(beta > 0, beta, 1.0), 0.0)
        vn = wv * (inv * alive_next.astype(accum))[:, None, None, None]
        beta_out = jnp.where(alive_next, beta, 0.0)
        return (vn, v, beta_out, alive_next), (v, alpha_out, beta_out)

    init = (v0, jnp.zeros_like(v0), zeros_B, alive0)
    _, (V, alphas, betas) = jax.lax.scan(body, init, None, length=m)
    # V: (m, B, nt, chi, chi); alphas/betas: (m, B)
    alphas = alphas.T
    betas = betas.T[:, : m - 1] if m > 1 else alphas[:, :0]
    evals, weights = jax.vmap(
        lambda al, be: krylov.tridiag_ritz(al, be, ritz_method,
                                           power_iters))(alphas, betas)
    y = jnp.einsum("Bm,mBtab->Btab", weights.astype(V.dtype), V)
    ynrm = jnp.sqrt(jnp.sum(y * y, axis=(1, 2, 3), keepdims=True))
    y = y / jnp.where(ynrm > delta, ynrm, 1.0)
    return evals, y


def fused_lanczos_ground_state_streamed2(L, W, R, x0,
                                         num_krylov_vecs: int,
                                         ritz_method: str = "eigh",
                                         power_iters: int = 60,
                                         delta: float = 1e-8,
                                         plan=None,
                                         interpret: bool = False,
                                         precision=None):
    """One-site ground-state Lanczos via the doubly-chunked matvec
    kernel — the chi=1024 tier (solver-layout operands and return
    convention of :func:`fused_lanczos_ground_state`)."""
    B, chi, _, _ = L.shape
    d = x0.shape[2]
    M = W.shape[0]
    if plan is None:
        plan = streamed_matvec_plan(chi, d, M)
    if plan is None:
        from tensornetwork_tpu.ops import vmem
        plan = vmem.streamed_matvec_xl_plan(chi, d, M)
        if plan is None:
            raise ValueError(
                f"no streamed-matvec chunking fits VMEM at chi={chi}")
    Lt, W_, Rt, xt = prepare_operands(L, W, R, x0)
    if len(plan) == 3:
        # three-level-chunked XL tier (chi=2048 one-site: the state
        # itself exceeds VMEM)
        K, K3, K2 = plan
        evals, y = _streamed_lanczos_core(
            Lt, W_, Rt, xt, num_krylov_vecs, K, K2, delta,
            ritz_method, power_iters, interpret, precision, K3=K3)
    else:
        evals, y = _streamed_lanczos_core(
            Lt, W_, Rt, xt, num_krylov_vecs, plan[0], plan[1], delta,
            ritz_method, power_iters, interpret, precision)
    return evals, y.transpose(0, 2, 1, 3)


def fused_lanczos_ground_state_2s_streamed(L, W1, W2, R, x0,
                                           num_krylov_vecs: int,
                                           ritz_method: str = "eigh",
                                           power_iters: int = 60,
                                           delta: float = 1e-8,
                                           plan=None,
                                           interpret: bool = False,
                                           precision=None):
    """Two-site ground-state Lanczos via the doubly-chunked matvec
    kernel — the large-chi two-site tier (VERDICT r3 item 1a: theta
    tiles are (chi*d)^2, so the resident-recurrence streamed kernel
    never fits; here only x stays resident).  Operands and returns as
    :func:`fused_lanczos_ground_state_2s`."""
    B, chi, M, _ = L.shape
    d = W1.shape[2]
    nt = d * d
    if plan is None:
        plan = streamed_matvec_plan(chi, nt, M)
    if plan is None:
        from tensornetwork_tpu.ops import vmem
        plan = vmem.streamed_matvec_xl_plan(chi, nt, M)
        if plan is None:
            raise ValueError(
                f"no streamed-matvec chunking fits VMEM at chi={chi} "
                f"(two-site)")
    # precision on the pre-fusion contraction: see
    # fused_lanczos_ground_state_2s
    C = jnp.einsum("wmst,mvuz->wvsutz", W1, W2,
                   precision=precision).reshape(M, M, nt, nt)
    Lt = L.transpose(0, 2, 3, 1)
    Rt = R.transpose(0, 2, 1, 3)
    xt = x0.reshape(B, chi, nt, chi).transpose(0, 2, 1, 3)
    if len(plan) == 3:
        # three-level-chunked XL tier (chi=1024 two-site: x streamed,
        # Q staged through HBM)
        K, K3, K2 = plan
        evals, y = _streamed_lanczos_core(
            Lt, C, Rt, xt, num_krylov_vecs, K, K2, delta,
            ritz_method, power_iters, interpret, precision, K3=K3)
    else:
        evals, y = _streamed_lanczos_core(
            Lt, C, Rt, xt, num_krylov_vecs, plan[0], plan[1], delta,
            ritz_method, power_iters, interpret, precision)
    return evals, y.transpose(0, 2, 1, 3).reshape(B, chi, d, d, chi)
