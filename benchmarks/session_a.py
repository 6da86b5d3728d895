#!/usr/bin/env python
"""One-process TPU session: rank-deficient QR probe + honest MXU
calibration + phased transfer-chain variants (each process pays a
multi-minute tunnel warmup, so experiments share one session)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def qr_probe():
    """Batched TPU QR on rank-deficient panels: the root cause of the
    two-site blowups (edge-bond thetas have rank <= d^2)."""
    key = jax.random.PRNGKey(0)
    for rank in (4, 32, 64):
        a = jax.random.normal(key, (8, 128, rank), jnp.float32)
        b = jax.random.normal(key, (8, rank, 64), jnp.float32)

        @jax.jit
        def probe(a, b):
            y = a @ b                     # (8, 128, 64), rank <= rank
            q, _ = jnp.linalg.qr(y)
            g = jnp.swapaxes(q, -1, -2) @ q
            eye = jnp.eye(64, dtype=jnp.float32)
            return jnp.max(jnp.abs(g - eye)), jnp.max(jnp.abs(q))

        err, qmax = jax.device_get(probe(a, b))
        log(f"batched QR (8,128,64) rank={rank:3d}: "
            f"||Q^T Q - I|| = {err:.2e}, max|Q| = {qmax:.2e}")
        # exact zero columns
        y0 = jnp.concatenate(
            [jax.random.normal(key, (8, 128, 4), jnp.float32),
             jnp.zeros((8, 128, 60), jnp.float32)], axis=-1)

    @jax.jit
    def probe0(y):
        q, _ = jnp.linalg.qr(y)
        g = jnp.swapaxes(q, -1, -2) @ q
        return (jnp.max(jnp.abs(g - jnp.eye(64, dtype=jnp.float32))),
                jnp.max(jnp.abs(q)), jnp.sum(jnp.isnan(q)))

    err, qmax, nnan = jax.device_get(probe0(y0))
    log(f"batched QR exact-zero cols:  ||Q^T Q - I|| = {err:.2e}, "
        f"max|Q| = {qmax:.2e}, NaNs = {int(nnan)}")


def main():
    log(f"devices: {jax.devices()}")
    jax.device_get(jnp.ones(4))
    log("warm")
    if "--skip-qr" not in sys.argv:
        qr_probe()
    import calibrate_peak
    if "--skip-peak" not in sys.argv:
        calibrate_peak.big_gemm_peak()
    calibrate_peak.batched_small(dep=False)
    calibrate_peak.batched_small(dep=True)
    import two_site_ab
    two_site_ab.section_chain()


if __name__ == "__main__":
    main()
