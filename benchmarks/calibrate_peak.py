#!/usr/bin/env python
"""Honest MXU calibration through the tunnel (2026-08-20).

`jax.block_until_ready` has been observed to return early on this
backend even after the transfer-path warm-up, which corrupted several
earlier BASELINE numbers (saw 12000 "TF").  Every measurement here
keeps all iterations inside ONE jit and is synchronized by
`jax.device_get` of a scalar reduction — the only trustworthy sync.

Reports:
1. chip bf16 GEMM peak (dependent chain of big square GEMMs);
2. the transfer-contraction op-mix ceilings: batched 128-size GEMMs,
   dependent (chained) and independent (accumulated), in pure XLA —
   the denominator for any chi=128 MFU claim.
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

from benchmarks._timing import timed_scalar, warmup


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def big_gemm_peak():
    for n, R in ((4096, 32), (8192, 8)):
        key = jax.random.PRNGKey(0)
        a = jax.random.normal(key, (n, n), jnp.bfloat16)
        b = jax.random.normal(key, (n, n), jnp.bfloat16)

        @jax.jit
        def chain(a, b):
            def body(x, _):
                y = (x @ b).astype(jnp.bfloat16)
                return y, ()
            x, _ = jax.lax.scan(body, a, None, length=R)
            return jnp.sum(jnp.abs(x.astype(jnp.float32)))

        dt = timed_scalar(chain, a, b)
        tf = 2 * R * n ** 3 / dt / 1e12
        log(f"big GEMM {n}^3 bf16 x{R} (dependent): {tf:6.1f} TF")


def batched_small(dep: bool):
    """(G, M, K) @ (G, K, N) batched bf16 GEMMs, chained (dep) or
    independent (acc into carry)."""
    for (G, M, K, N_, R) in ((512, 128, 128, 128, 64),
                             (1024, 128, 128, 128, 64),
                             (512, 128, 256, 128, 64),
                             (256, 128, 128, 256, 64),
                             (128, 256, 256, 256, 64),
                             (32, 512, 512, 512, 64),
                             (64, 512, 512, 512, 32),
                             (256, 512, 512, 512, 16),
                             (8, 512, 512, 512, 64),
                             (16, 1024, 1024, 1024, 16)):
        key = jax.random.PRNGKey(1)
        a = (jax.random.normal(key, (G, M, K), jnp.float32)
             / np.sqrt(K)).astype(jnp.bfloat16)
        b = (jax.random.normal(key, (G, K, N_), jnp.float32)
             / np.sqrt(K)).astype(jnp.bfloat16)

        if dep:
            if M != N_ or M != K:
                continue

            @jax.jit
            def run(a, b):
                def body(x, _):
                    y = jax.lax.dot_general(
                        x, b, (((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32)
                    return y.astype(jnp.bfloat16), ()
                x, _ = jax.lax.scan(body, a, None, length=R)
                return jnp.sum(jnp.abs(x.astype(jnp.float32)))
        else:

            # accumulate the ARRAY, not a scalar: a full reduction per
            # layer costs more VPU time than the GEMMs themselves and
            # would swamp the measurement
            @jax.jit
            def run(a, b):
                def body(acc, _):
                    y = jax.lax.dot_general(
                        a, b, (((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.bfloat16)
                    return acc + y, ()
                acc0 = jnp.zeros((G, M, N_), jnp.bfloat16)
                acc, _ = jax.lax.scan(body, acc0, None, length=R)
                return jnp.sum(jnp.abs(acc.astype(jnp.float32)))

        dt = timed_scalar(run, a, b)
        tf = 2 * R * G * M * K * N_ / dt / 1e12
        log(f"batched {'dep  ' if dep else 'indep'} "
            f"({G:4d},{M},{K})x({K},{N_}) x{R}: {tf:6.1f} TF")


def f32_highest_512():
    """f32 HIGHEST-precision caps for the 512 shape class — the
    currency the DMRG sweeps are measured in (analytic f32 FLOPs at
    forced-highest matmuls)."""
    for (G, R, dep) in ((8, 64, True), (32, 64, True), (8, 64, False),
                        (64, 32, False)):
        n = 512
        key = jax.random.PRNGKey(2)
        a = jax.random.normal(key, (G, n, n), jnp.float32) / np.sqrt(n)
        b = jax.random.normal(key, (G, n, n), jnp.float32) / np.sqrt(n)

        if dep:
            @jax.jit
            def run(a, b):
                def body(x, _):
                    y = jax.lax.dot_general(
                        x, b, (((2,), (1,)), ((0,), (0,))),
                        precision=jax.lax.Precision.HIGHEST)
                    return y, ()
                x, _ = jax.lax.scan(body, a, None, length=R)
                return jnp.sum(jnp.abs(x))
        else:
            @jax.jit
            def run(a, b):
                def body(acc, _):
                    y = jax.lax.dot_general(
                        a, b, (((2,), (1,)), ((0,), (0,))),
                        precision=jax.lax.Precision.HIGHEST)
                    return acc + y, ()
                acc, _ = jax.lax.scan(body, jnp.zeros_like(a), None,
                                      length=R)
                return jnp.sum(jnp.abs(acc))

        dt = timed_scalar(run, a, b)
        tf = 2 * R * G * n**3 / dt / 1e12
        log(f"f32-highest ({G:3d},512,512)x(512,512) "
            f"{'dep  ' if dep else 'indep'} x{R}: {tf:6.1f} TF")


def main():
    log(f"devices: {jax.devices()}")
    warmup()
    log("warm")
    if "--f32-512-only" in sys.argv:
        f32_highest_512()
        return
    big_gemm_peak()
    batched_small(dep=False)
    batched_small(dep=True)
    f32_highest_512()


if __name__ == "__main__":
    main()
