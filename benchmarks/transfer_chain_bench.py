#!/usr/bin/env python
"""MXU-utilization benchmark: batched chi=128 MPS transfer contractions.

Measures the whole-chain Pallas kernel (E resident in VMEM) against the
XLA scan reference, in bf16 and f32, and reports TFLOP/s + MFU vs the
chip's measured 122 TF bf16 GEMM peak (BASELINE.md).  Operands are
generated on device (no tunnel upload); R chain applications are chained
inside one jit so dispatch latency is amortized.
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

MEASURED_PEAK_TF = 122.0   # 8192^3 bf16 GEMM on this chip (BASELINE.md)
NOMINAL_PEAK_TF = 197.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from tensornetwork_tpu.ops.kernels import transfer_chain

    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=256)
    ap.add_argument("--N", type=int, default=32)
    ap.add_argument("--chi", type=int, default=128)
    ap.add_argument("--R", type=int, default=8)
    args = ap.parse_args()
    B, N, chi, d, R = args.B, args.N, args.chi, 2, args.R

    log(f"devices: {jax.devices()}")
    jax.device_get(jnp.ones(4))

    flops = R * B * N * d * 4 * chi ** 3
    log(f"config B={B} N={N} chi={chi} R={R}: "
        f"{flops / 1e12:.2f} TFLOP/dispatch")

    @functools.partial(jax.jit, static_argnums=(1,))
    def make(key, dtype):
        A = jax.random.normal(key, (B, N, chi, d, chi), jnp.float32)
        A = (A / np.sqrt(d * chi)).astype(dtype)
        E0 = jnp.broadcast_to(jnp.eye(chi, dtype=jnp.float32), (B, chi, chi))
        return A, E0.astype(dtype)

    oracle = None
    for name, dtype, tile_b in (("f32", jnp.float32, 8),
                                ("bf16 tile8", jnp.bfloat16, 8),
                                ("bf16 tile16", jnp.bfloat16, 16),
                                ("bf16 tile32", jnp.bfloat16, 32)):
        A, E0 = make(jax.random.PRNGKey(0), dtype)
        jax.block_until_ready(A)
        for impl in ("xla", "pallas"):
            try:
                run1 = functools.partial(transfer_chain, impl=impl,
                                         tile_b=tile_b)

                @jax.jit
                def run(A, E0):
                    def body(i, E):
                        return run1(A, E.astype(dtype)).astype(jnp.float32)
                    return jax.lax.fori_loop(0, R, body, E0.astype(
                        jnp.float32))

                def sync(o):
                    # honest sync (see CLAUDE.md: bare block_until_ready
                    # can return early on this backend)
                    jax.device_get(jnp.ravel(o)[0])

                t0 = time.perf_counter()
                out = run(A, E0)
                sync(out)
                compile_s = time.perf_counter() - t0
                k = 5
                t0 = time.perf_counter()
                for _ in range(k):
                    out = run(A, E0)
                sync(out)
                dt = (time.perf_counter() - t0) / k
                tf = flops / dt / 1e12
                o = np.asarray(jax.device_get(out), np.float64)
                if oracle is None:
                    oracle = o
                    err = 0.0
                else:
                    err = np.max(np.abs(o - oracle)) / np.max(
                        np.abs(oracle))
                log(f"{name:12s} {impl:6s}: {dt * 1e3:7.2f} ms  "
                    f"{tf:6.1f} TF  "
                    f"MFU {tf / MEASURED_PEAK_TF * 100:4.1f}% measured / "
                    f"{tf / NOMINAL_PEAK_TF * 100:4.1f}% nominal  "
                    f"(compile {compile_s:.0f}s, rel err {err:.1e})")
            except Exception as e:
                log(f"{name:12s} {impl:6s}: FAILED {type(e).__name__}: "
                    f"{str(e)[:300]}")


if __name__ == "__main__":
    main()
