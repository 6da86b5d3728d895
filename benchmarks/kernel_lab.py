#!/usr/bin/env python
"""One-process TPU kernel lab (each process pays a multi-minute tunnel
warmup, so every experiment runs in ONE session):

1. practical MXU ceiling for the chain's GEMM shapes (batched bf16
   dot_general chains in pure XLA, data resident);
2. transfer-chain kernel variants (loop vs batched-dot_general, f32 vs
   bf16 carry, tile sizes) at chi=128 and chi=256;
3. two-site sweep stage profile (imported from two_site_profile.main).
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

MEASURED_PEAK_TF = 122.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_dispatch(fn, *args, iters=5):
    # honest sync: fetch one element of the last output — bare
    # block_until_ready can return early on this backend (CLAUDE.md);
    # the single device executes dispatches in order, so the last
    # completing implies all completed
    def sync(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        jax.device_get(jnp.ravel(leaf)[0])

    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


def gemm_ceiling_independent():
    """NON-chained (fully independent) batched GEMMs at the chain's
    shapes: the per-shape MXU ceiling with zero dependency stalls —
    the honest denominator for the transfer-chain kernel's MFU."""
    for (G, M, K, N_) in ((4096, 128, 128, 128), (2048, 128, 128, 256),
                          (2048, 128, 256, 128), (1024, 128, 256, 256),
                          (512, 256, 256, 256), (64, 512, 512, 512)):
        key = jax.random.PRNGKey(0)
        a = jax.random.normal(key, (G, M, K), jnp.bfloat16)
        b = jax.random.normal(key, (G, K, N_), jnp.bfloat16)

        @jax.jit
        def one(a, b):
            return jax.lax.dot_general(
                a, b, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)

        dt = bench_dispatch(one, a, b, iters=20)
        flops = 2 * G * M * K * N_
        tf = flops / dt / 1e12
        log(f"GEMM indep ({G:4d},{M},{K})x({K},{N_}): {tf:6.1f} TF "
            f"({tf / MEASURED_PEAK_TF * 100:4.1f}% of measured peak)")


def gemm_ceiling():
    """Chained batched GEMMs of the transfer-chain shapes: the practical
    per-shape MXU ceiling (pure XLA, no kernel)."""
    for (G, M, K, N_) in ((32, 128, 128, 256), (32, 128, 256, 128),
                          (64, 128, 128, 256), (16, 256, 256, 512),
                          (8, 512, 512, 1024), (1, 2048, 2048, 2048)):
        key = jax.random.PRNGKey(0)
        a = jax.random.normal(key, (G, M, K), jnp.bfloat16)
        b = jax.random.normal(key, (G, K, N_), jnp.bfloat16)
        R = 200

        @jax.jit
        def chain(a, b):
            def body(x, _):
                y = jax.lax.dot_general(
                    x, b, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                # fold back to (G, M, K) so the chain has a fixed shape
                y = y.astype(jnp.bfloat16)
                x2 = jax.lax.dot_general(
                    y, b, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32).astype(
                    jnp.bfloat16)
                return x2, None
            x, _ = jax.lax.scan(body, a, None, length=R)
            return x

        dt = bench_dispatch(chain, a, b, iters=3)
        flops = 2 * R * (2 * G * M * K * N_)
        tf = flops / dt / 1e12
        log(f"GEMM ceiling ({G:3d},{M},{K})x({K},{N_}): {tf:6.1f} TF "
            f"({tf / MEASURED_PEAK_TF * 100:4.1f}% of measured peak)")


def chain_variants():
    from tensornetwork_tpu.ops.kernels import transfer_chain
    for chi, B, N in ((128, 256, 16), (256, 64, 16)):
        d = 2
        R = 8

        @functools.partial(jax.jit, static_argnums=(1,))
        def make(key, dtype):
            A = jax.random.normal(key, (B, N, chi, d, chi), jnp.float32)
            A = (A / np.sqrt(d * chi)).astype(dtype)
            E0 = jnp.broadcast_to(jnp.eye(chi, dtype=jnp.float32),
                                  (B, chi, chi))
            return A, E0.astype(dtype)

        A, E0 = make(jax.random.PRNGKey(0), jnp.bfloat16)
        jax.block_until_ready(A)
        flops = R * B * N * d * 4 * chi ** 3
        for variant, tile_b, acc in (("loop", 8, jnp.float32),
                                     ("loop", 16, jnp.float32),
                                     ("rows", 8, jnp.float32),
                                     ("rows", 16, jnp.float32),
                                     ("rows", 32, jnp.float32),
                                     ("rows", 4, jnp.float32)):
            if chi >= 256 and tile_b > 16:
                continue
            try:
                run1 = functools.partial(
                    transfer_chain, impl="pallas", tile_b=tile_b,
                    variant=variant, accum_dtype=acc)

                @jax.jit
                def run(A, E0):
                    def body(i, E):
                        return run1(A, E.astype(jnp.bfloat16)).astype(
                            jnp.float32)
                    return jax.lax.fori_loop(0, R, body,
                                             E0.astype(jnp.float32))

                dt = bench_dispatch(run, A, E0, iters=4)
                tf = flops / dt / 1e12
                log(f"chain chi={chi} {variant:4s} tile={tile_b:2d} "
                    f"acc={'bf16' if acc == jnp.bfloat16 else 'f32'}: "
                    f"{dt * 1e3:7.2f} ms  {tf:6.1f} TF  "
                    f"({tf / MEASURED_PEAK_TF * 100:4.1f}% measured peak)")
            except Exception as e:
                log(f"chain chi={chi} {variant} tile={tile_b}: FAILED "
                    f"{type(e).__name__}: {str(e)[:160]}")


def main():
    log(f"devices: {jax.devices()}")
    jax.device_get(jnp.ones(4))
    log("warm")
    if "--indep" in sys.argv:
        gemm_ceiling_independent()
    if "--chained" in sys.argv:
        gemm_ceiling()
    chain_variants()
    if "--two-site" in sys.argv:
        sys.argv = ["two_site_profile.py", "256", "64"]
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "two_site_profile.py")
        src = open(path).read()
        src = src.replace('if __name__ == "__main__":', 'if True:')
        g = {"__name__": "two_site_profile_lab", "__file__": path}
        exec(compile(src, path, "exec"), g)


if __name__ == "__main__":
    main()
