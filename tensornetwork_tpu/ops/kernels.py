"""Pallas TPU kernels for the hot contraction paths.

The batched one-site DMRG effective-hamiltonian matvec
``y = L·W·x·R`` is the flop carrier of the compiled sweep.  XLA lowers it
to per-instance batched GEMMs with tiny M/K/N (chi = 64-128), which run
at ~1 TFLOP/s on a v5e; this kernel decomposes the matvec into
``2·M·d`` chi×chi GEMMs per instance executed back-to-back in VMEM (no
HBM roundtrips between stages), with the small MPO couplings applied as
scalar-weighted accumulations from SMEM.

Index conventions match :mod:`tensornetwork_tpu.models.dmrg`:
  L[a, w, c]   W[w, v, s, t]   R[b, v, d]   x[a, t, b]  ->  y[c, s, d]

Per instance, for every (w, t):  P_wt = L_w^T @ x_t   (chi x chi GEMM)
then for every (s, v):           Q_vs = sum_wt W[w,v,s,t] P_wt  (VPU)
and                              y_s += Q_vs @ R_v    (chi x chi GEMM).

Status (measured on TPU v5e, 2026-08-17): at chi=64 the contraction is
*GEMM-shape bound*, not memory bound — XLA's batched einsum and this
kernel both reach ~1.0-1.3 TFLOP/s because 64x64x64 GEMMs fill at most a
quarter of the 128x128 MXU and per-GEMM overhead dominates.  The kernel
is therefore NOT wired into the default DMRG path; it is kept (with
interpret-mode tests) as the starting point for chi >= 128 tiles, where
the same structure maps onto full MXU tiles.  Note also that the remote
Mosaic toolchain in this environment miscompiles the fori_loop variant
(correct under ``interpret=True``); prefer interpret mode for validation.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_heff_matvec(chi: int, d: int, M: int, tile_b: int = 8,
                     accum_dtype=jnp.float32, interpret: bool = False):
    """Build the fused batched matvec for static (chi, d, M).

    Returns ``f(Lt, W, Rt, xt) -> y`` on kernel-layout operands (see
    :func:`prepare_operands`):
      Lt: (B, M, chi, chi)   [w, c, a]
      W:  (M, M, d, d)       (scalar couplings, SMEM)
      Rt: (B, M, chi, chi)   [v, b, d]
      xt: (B, d, chi, chi)   [t, a, b]
      y:  (B, d, chi, chi)   [s, c, d]
    """

    def kernel(W_ref, Lt_ref, Rt_ref, x_ref, y_ref):
        def body(i, _):
            # stage 1: P[w][t] = L_w^T(@c,a) . x_t(a,b)  -> (c, b)
            P = [[jnp.dot(Lt_ref[i, w], x_ref[i, t],
                          preferred_element_type=accum_dtype)
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
                    contrib = jnp.dot(Q, Rt_ref[i, v],
                                      preferred_element_type=accum_dtype)
                    acc = contrib if acc is None else acc + contrib
                y_ref[i, s] = acc.astype(y_ref.dtype)
            return 0

        jax.lax.fori_loop(0, x_ref.shape[0], body, 0)

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


def heff_matvec_reference(L, W, R, x):
    """XLA einsum reference of the same contraction (batched).
    Argument order (L, W, R, x); L[a,w,c], W[w,v,s,t], R[b,v,d],
    x[a,t,b] -> y[c,s,d]."""
    return jnp.einsum("Bawc,wvst,Batb,Bbvd->Bcsd", L, W, x, R,
                      optimize="auto")
