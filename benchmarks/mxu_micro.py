#!/usr/bin/env python
"""Pure MXU issue-rate probe: chained GEMMs of one shape inside ONE
pallas program, operands resident in VMEM — no HBM traffic, no grid
overhead, honest device_get timing.

Establishes the per-matmul-shape ceiling ladder that explains the
chi=128 transfer-chain cap: a single 128-tile matmul engages ~1 MXU
(~31 TF of the chip's ~110 TF honest peak); only larger M/N/K tiles
fan out across MXUs.
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_chain_kernel(M, K, N, reps, P=1, dtype=jnp.bfloat16):
    """`P` independent chains of GEMM pairs: x_p (M,K) @ b (K,N) folded
    back via c (N,K).  2*reps*P GEMMs per program; P-way ILP between
    dependent steps (P=1 measures raw dependent-GEMM latency, P=16
    matches the transfer-chain kernel's tile structure)."""

    def kernel(x_ref, b_ref, c_ref, o_ref):
        dot = lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        xs = [x_ref[p] for p in range(P)]
        for _ in range(reps):
            ys = [dot(x, b_ref[...]).astype(dtype) for x in xs]   # (M,N)
            xs = [dot(y, c_ref[...]).astype(dtype) for y in ys]   # (M,K)
        for p in range(P):
            o_ref[p] = xs[p]

    @jax.jit
    def f(x, b, c):
        out = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((P, M, K), dtype),
        )(x, b, c)
        return jnp.sum(jnp.abs(out.astype(jnp.float32)))

    return f


def main():
    log(f"devices: {jax.devices()}")
    jax.device_get(jnp.ones(4))
    log("warm")
    for (M, K, N, P, reps) in (
            (128, 128, 128, 1, 300), (128, 128, 128, 4, 150),
            (128, 128, 128, 8, 100), (128, 128, 128, 16, 60),
            (128, 128, 256, 8, 100), (128, 128, 512, 8, 60),
            (128, 256, 256, 8, 60), (256, 256, 256, 8, 60),
            (256, 256, 512, 4, 60), (512, 512, 512, 4, 30),
            (512, 512, 1024, 2, 30)):
        key = jax.random.PRNGKey(0)
        x = (jax.random.normal(key, (P, M, K), jnp.float32)
             / np.sqrt(K)).astype(jnp.bfloat16)
        b = (jax.random.normal(key, (K, N), jnp.float32)
             / np.sqrt(K)).astype(jnp.bfloat16)
        c = (jax.random.normal(key, (N, K), jnp.float32)
             / np.sqrt(N)).astype(jnp.bfloat16)
        try:
            f = make_chain_kernel(M, K, N, reps, P=P)
            jax.device_get(f(x, b, c))
            t0 = time.perf_counter()
            iters = 3
            for _ in range(iters):
                jax.device_get(f(x, b, c))
            dt = (time.perf_counter() - t0) / iters
            flops = P * reps * 2 * (M * K * N + M * N * K)
            log(f"({M:4d},{K:4d})x({K:4d},{N:4d}) P={P:2d}: "
                f"{flops / dt / 1e12:6.1f} TF")
        except Exception as e:
            log(f"({M},{K})x({K},{N}) P={P}: FAILED {type(e).__name__}: "
                f"{str(e)[:120]}")


if __name__ == "__main__":
    main()
