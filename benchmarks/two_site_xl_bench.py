#!/usr/bin/env python
"""chi=1024 TWO-SITE on one chip via the three-level-chunked XL matvec
kernel (VERDICT r4 item 2a).

Validates the XL kernel against the XLA matvec oracle on chip, then
measures the full two-site sweep (N=32 TFI, m=6, subspace/polar
truncation, chained, honest end-sync).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks._timing import warmup, bracket

REF_E = -40.384313161218365


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def validate_matvec(chi=1024, nt=4, M=3):
    from tensornetwork_tpu.ops import kernels, vmem
    plan = vmem.streamed_matvec_xl_plan(chi, nt, M)
    log(f"XL plan at chi={chi}: {plan}")
    rng = np.random.default_rng(0)
    Lt = jnp.asarray(rng.standard_normal((1, M, chi, chi)), jnp.float32)
    Rt = jnp.asarray(rng.standard_normal((1, M, chi, chi)), jnp.float32)
    C = jnp.asarray(rng.standard_normal((M, M, nt, nt)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((1, nt, chi, chi)), jnp.float32)
    x = x / jnp.linalg.norm(x)
    f = kernels.make_streamed_matvec_xl(
        chi, nt, M, *plan, precision=jax.lax.Precision.HIGHEST)
    t0 = time.perf_counter()
    y, alpha = f(Lt, C, Rt, x)
    s = jax.device_get(jnp.sum(jnp.abs(y)) + jnp.abs(alpha[0]))
    log(f"XL kernel compiled+ran in {time.perf_counter() - t0:.0f}s "
        f"(checksum {float(s):.4e})")

    @jax.jit
    def oracle(Lt, C, Rt, x):
        with jax.default_matmul_precision("highest"):
            y = jnp.einsum("Bwca,Btab,wvst,Bvbd->Bscd", Lt, x, C, Rt,
                           optimize="auto")
            return y, jnp.sum(x * y, axis=(1, 2, 3))

    y0, a0 = oracle(Lt, C, Rt, x)
    err = float(jax.device_get(
        jnp.max(jnp.abs(y - y0)) / jnp.max(jnp.abs(y0))))
    aerr = float(jax.device_get(jnp.abs(alpha[0] - a0[0])
                                / jnp.abs(a0[0])))
    log(f"XL vs XLA oracle on chip: rel y err {err:.2e}, "
        f"alpha rel err {aerr:.2e}")
    assert err < 1e-5 and aerr < 1e-5

    # matvec timing (chained: y feeds back in, end-sync)
    import functools

    @functools.partial(jax.jit, static_argnames=("n",))
    def chain(Lt, C, Rt, x, n):
        def body(v, _):
            y, a = f(Lt, C, Rt, v)
            nr = jnp.sqrt(jnp.sum(y * y))
            return y / jnp.where(nr > 0, nr, 1.0), a
        v, als = jax.lax.scan(body, x, None, length=n)
        return jnp.sum(v * v) + jnp.sum(als)

    n = 20
    jax.device_get(chain(Lt, C, Rt, x, n=n))
    t0 = time.perf_counter()
    jax.device_get(chain(Lt, C, Rt, x, n=n))
    dt = (time.perf_counter() - t0) / n
    flops = 2 * M * nt * 2 * chi**3  # stage 1 + stage 2 GEMMs
    log(f"XL matvec: {dt * 1e3:.2f} ms -> "
        f"{flops / dt / 1e12:.1f} TF on matvec GEMMs")

    t0 = time.perf_counter()
    jax.device_get(jnp.sum(jnp.abs(oracle(Lt, C, Rt, x)[0])))
    jax.device_get(jnp.sum(jnp.abs(oracle(Lt, C, Rt, x)[0])))
    dt_x = time.perf_counter() - t0
    log(f"XLA oracle matvec: ~{dt_x / 2 * 1e3:.2f} ms per call "
        f"(dispatch-inclusive)")


def sweep(chi=1024, m=6, n_sweeps=4):
    from tensornetwork_tpu.models import FiniteTFI
    from tensornetwork_tpu.models.dmrg import two_site_sweep, \
        random_mps_stack

    N = 32
    mpo = FiniteTFI(Jx=1.0, Bz=1.0, N=N, dtype=jnp.float32)
    As = random_mps_stack(jax.random.PRNGKey(0), N, chi, 2, jnp.float32)
    t0 = time.perf_counter()
    res = two_site_sweep(As, mpo.Ws, mpo.vL, mpo.vR, num_krylov_vecs=m,
                         trunc_impl="subspace", trunc_iters=2,
                         trunc_orth="polar")
    jax.device_get(res.energy)
    log(f"2s chi={chi} first sweep (incl compile): "
        f"{time.perf_counter() - t0:.0f}s, E={float(res.energy):.4f}")
    res = two_site_sweep(res.As, mpo.Ws, mpo.vL, mpo.vR,
                         num_krylov_vecs=m, trunc_impl="subspace",
                         trunc_iters=2, trunc_orth="polar",
                         renvs=res.renvs)
    jax.device_get(res.energy)
    As, rv = res.As, res.renvs
    with bracket(lambda: res.energy) as b:
        for _ in range(n_sweeps):
            res = two_site_sweep(As, mpo.Ws, mpo.vL, mpo.vR,
                                 num_krylov_vecs=m,
                                 trunc_impl="subspace", trunc_iters=2,
                                 trunc_orth="polar", renvs=rv)
            As, rv = res.As, res.renvs
    e = float(jax.device_get(res.energy))
    terr = float(jax.device_get(res.trunc_err))
    log(f"2s chi={chi}: {n_sweeps / b.seconds:.3f} sweeps/s "
        f"({b.seconds / n_sweeps * 1e3:.0f} ms/sweep), "
        f"E-ref {e - REF_E:+.2e}, terr {terr:.1e}")


def main():
    log(f"devices: {jax.devices()}")
    warmup()
    validate_matvec()
    sweep()


if __name__ == "__main__":
    main()
