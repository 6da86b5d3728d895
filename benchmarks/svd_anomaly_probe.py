#!/usr/bin/env python
"""Root-cause probe for the in-sweep masked-SVD anomaly (VERDICT r3
item 6).

BASELINE.md records: the batched (256,128,128) truncated SVD costs
~218 ms per call in isolation, and the two-site batched sweep with
``trunc_impl="svd"`` measures ~68 s/sweep — ~5x more than the ~57
per-bond calls explain, and 350x the isolated truncation CHAIN.  This
script times the SAME svd_masked op while adding the sweep's context
elements one at a time:

  A. bare:            jit(vmap(svd_masked))                 x1 call
  B. highest:         A under default_matmul_precision("highest")
  C. scan:            A inside lax.scan over 31 bonds
  D. scan+highest:    C under highest         <- the sweep's context
  E. scan+highest+einsum glue (theta build + normalize like body_lr)

Each timing is device_get-bracketed (benchmarks/_timing.py).
"""
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks._timing import warmup, timed_scalar
from tensornetwork_tpu.ops.decompositions import svd_masked


def main():
    B, chi, d = int(os.environ.get("B", 256)), 64, 2
    m = chi * d
    scan_len = 31
    warmup()
    rng = np.random.default_rng(0)
    th = jnp.asarray(rng.standard_normal((B, m, m)), jnp.float32)

    def one(thb):
        r = jax.vmap(lambda x: svd_masked(x, chi))(thb)
        return (jnp.sum(jnp.abs(r.u)) + jnp.sum(r.s)
                + jnp.sum(jnp.abs(r.vh)) + jnp.sum(r.trunc_sq_norm))

    @jax.jit
    def probe_a(thb):
        return one(thb)

    @jax.jit
    def probe_b(thb):
        with jax.default_matmul_precision("highest"):
            return one(thb)

    def scan_body(mode):
        def body(carry, _):
            # chain: perturb carry so XLA cannot hoist the SVD
            r = jax.vmap(lambda x: svd_masked(x, chi))(carry)
            nxt = carry + 1e-6 * (r.u @ r.vh)
            return nxt, jnp.sum(r.s)
        def run(thb):
            def go():
                out, ss = jax.lax.scan(body, thb, None, length=scan_len)
                return jnp.sum(jnp.abs(out)) + jnp.sum(ss)
            if mode == "highest":
                with jax.default_matmul_precision("highest"):
                    return go()
            return go()
        return jax.jit(run)

    probe_c = scan_body("default")
    probe_d = scan_body("highest")

    @jax.jit
    def probe_e(thb, pend, anext):
        # body_lr-like glue at highest: theta einsum + normalize + svd
        with jax.default_matmul_precision("highest"):
            def body(carry, _):
                p, acc = carry
                theta = jnp.einsum("zasb,zbtc->zastc", p, anext)
                nrm = jnp.sqrt(jnp.sum(theta**2, axis=(1, 2, 3, 4),
                                       keepdims=False))
                theta = theta / nrm[:, None, None, None, None]
                th2 = theta.reshape(B, m, m)
                r = jax.vmap(lambda x: svd_masked(x, chi))(th2)
                U = r.u.reshape(B, chi, d, chi)
                SV = (r.s[:, :, None] * r.vh).reshape(B, chi, d, chi)
                return (SV, acc + jnp.sum(r.s)), None
            (pf, acc), _ = jax.lax.scan(body, (pend, 0.0), None,
                                        length=scan_len)
            return jnp.sum(jnp.abs(pf)) + acc

    pend = jnp.asarray(rng.standard_normal((B, chi, d, chi)), jnp.float32)
    anext = jnp.asarray(rng.standard_normal((B, chi, d, chi)),
                        jnp.float32)

    rows = [
        ("A bare vmap svd (1 call)", lambda: timed_scalar(probe_a, th)),
        ("B highest (1 call)", lambda: timed_scalar(probe_b, th)),
        ("C scan x31 default", lambda: timed_scalar(probe_c, th,
                                                    iters=1)),
        ("D scan x31 highest", lambda: timed_scalar(probe_d, th,
                                                    iters=1)),
        ("E scan x31 highest + glue", lambda: timed_scalar(
            probe_e, th, pend, anext, iters=1)),
    ]
    for name, fn in rows:
        t = fn()
        print(f"{name}: {t*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
