#!/usr/bin/env python
"""On-chip plan sweep for the three-level-chunked XL matvec kernel
(chi=1024 two-site).  Tries admissible-looking (K, K3, K2) triples
around the model's pick and reports ms + TF per plan; exactness checked
against the XLA oracle at every plan."""
import os
import sys
import time
import functools

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks._timing import warmup


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from tensornetwork_tpu.ops import kernels
    chi, nt, M, m = 1024, 4, 3, 6
    rng = np.random.default_rng(0)
    Lt = jnp.asarray(rng.standard_normal((1, M, chi, chi)), jnp.float32)
    Rt = jnp.asarray(rng.standard_normal((1, M, chi, chi)), jnp.float32)
    C = jnp.asarray(rng.standard_normal((M, M, nt, nt)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((1, nt, chi, chi)), jnp.float32)
    x = x / jnp.linalg.norm(x)
    log(f"devices: {jax.devices()}")
    warmup()

    @jax.jit
    def oracle(Lt, C, Rt, x):
        with jax.default_matmul_precision("highest"):
            y = jnp.einsum("Bwca,Btab,wvst,Bvbd->Bscd", Lt, x, C, Rt,
                           optimize="auto")
            return y
    y0 = oracle(Lt, C, Rt, x)
    ref = jnp.max(jnp.abs(y0))

    plans = [(16, 4, 4), (16, 8, 4), (16, 4, 8), (8, 8, 8), (16, 8, 8),
             (32, 4, 4), (16, 2, 4), (8, 4, 8), (8, 8, 4), (32, 8, 8)]
    flops = 2 * M * nt * 2 * chi**3
    results = []
    for plan in plans:
        try:
            f = kernels.make_streamed_matvec_xl(
                chi, nt, M, *plan, precision=jax.lax.Precision.HIGHEST)

            @functools.partial(jax.jit, static_argnames=("n",))
            def chain(Lt, C, Rt, x, n):
                def body(v, _):
                    y, a = f(Lt, C, Rt, v)
                    nr = jnp.sqrt(jnp.sum(y * y))
                    return y / jnp.where(nr > 0, nr, 1.0), a
                v, als = jax.lax.scan(body, x, None, length=n)
                return jnp.sum(v * v) + jnp.sum(als)

            t0 = time.perf_counter()
            y, _ = f(Lt, C, Rt, x)
            err = float(jax.device_get(jnp.max(jnp.abs(y - y0)) / ref))
            compile_s = time.perf_counter() - t0
            if err > 1e-5:
                log(f"plan {plan}: WRONG (rel {err:.1e})")
                continue
            n = 20
            jax.device_get(chain(Lt, C, Rt, x, n=n))
            t0 = time.perf_counter()
            jax.device_get(chain(Lt, C, Rt, x, n=n))
            dt = (time.perf_counter() - t0) / n
            log(f"plan {plan}: {dt * 1e3:.2f} ms = "
                f"{flops / dt / 1e12:.1f} TF  (compile {compile_s:.0f}s, "
                f"rel err {err:.1e})")
            results.append((dt, plan))
        except Exception as e:
            log(f"plan {plan}: FAILED {type(e).__name__}: "
                f"{str(e)[:120]}")
    if results:
        results.sort()
        log(f"best: {results[0][1]} at {results[0][0] * 1e3:.2f} ms")


if __name__ == "__main__":
    main()
