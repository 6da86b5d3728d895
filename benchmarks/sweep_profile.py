"""Decompose the batched one-site DMRG sweep cost on the real chip.

Times each pipeline stage in isolation, chained inside one jit (the
per-dispatch tunnel latency is ~1-3 ms, so sub-ms stages must be
amortized).  Per sweep there are S = 2*(N-1) site steps; each step is
one Lanczos solve (m matvecs + tridiag Ritz) + one gauge shift + one env
update.  Comparing the sum of isolated stages to the measured full sweep
shows how much is lost to scheduling/glue.

Usage: python benchmarks/sweep_profile.py [B] [chi]
"""
import sys
import time

import jax
import jax.numpy as jnp

from tensornetwork_tpu.models import FiniteTFI
from tensornetwork_tpu.models import dmrg as D
from tensornetwork_tpu.ops import krylov
from tensornetwork_tpu.parallel.batch import batched_one_site_sweep


def _sync(out):
    # honest sync: fetch one element — bare block_until_ready can return
    # early on this backend (CLAUDE.md 2026-08-20)
    leaf = jax.tree_util.tree_leaves(out)[0]
    jax.device_get(jnp.ravel(leaf)[0])


def bench(fn, *args, iters=3):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    chi = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    N, d, m = 32, 2, 10
    S = 2 * (N - 1)  # site steps per sweep
    dtype = jnp.float32
    print(f"B={B} chi={chi} N={N} m={m} ({S} site steps/sweep)")
    jax.device_get(jnp.ones(4))  # warm the transfer path

    mpo = FiniteTFI(Jx=1.0, Bz=1.0, N=N, dtype=dtype)
    W = jnp.asarray(mpo.Ws[N // 2])
    M = W.shape[0]
    key = jax.random.PRNGKey(0)
    kL, kR, kx = jax.random.split(key, 3)
    L = jax.random.normal(kL, (B, chi, M, chi), dtype)
    L = (L + L.transpose(0, 3, 2, 1)) / 2
    R = jax.random.normal(kR, (B, chi, M, chi), dtype)
    R = (R + R.transpose(0, 3, 2, 1)) / 2
    x = jax.random.normal(kx, (B, chi, d, chi), dtype)
    x = x / jnp.linalg.norm(x.reshape(B, -1), axis=1)[:, None, None, None]

    # --- stage: matvec (S*m per sweep) ---
    @jax.jit
    def matvec_chain(L, W, R, x):
        with jax.default_matmul_precision("highest"):
            def body(x, _):
                y = jax.vmap(lambda l, r, v: D._matvec_1s(l, W, r, v))(
                    L, R, x)
                n = jnp.linalg.norm(y.reshape(B, -1), axis=1)
                y = y / n[:, None, None, None]
                return y, None
            x, _ = jax.lax.scan(body, x, None, length=S * m)
        return x

    t = bench(matvec_chain, L, W, R, x)
    flops = 2 * 2 * M * d * chi**3 * B * S * m  # 2 GEMM stages/matvec
    print(f"matvec x{S * m}:          {t * 1e3:8.1f} ms/sweep-equiv "
          f"({flops / t / 1e12:.1f} TFLOP/s)")

    # --- stage: full Lanczos solve (S per sweep) ---
    def lanczos_solve(L, W, R, x, ritz, reorth):
        with jax.default_matmul_precision("highest"):
            def one(l, r, v):
                mv = lambda z: D._matvec_1s(l, W, r, z)
                evals, evecs = krylov.eigsh_lanczos(
                    mv, v, num_krylov_vecs=m, numeig=1,
                    ritz_method=ritz, reorthogonalize=reorth)
                return evecs[0]
            def body(x, _):
                return jax.vmap(one)(L, R, x), None
            x, _ = jax.lax.scan(body, x, None, length=S)
        return x

    jl = jax.jit(lanczos_solve, static_argnames=("ritz", "reorth"))
    for ritz, reorth in (("power", False), ("power", True),
                         ("eigh", False)):
        t = bench(jl, L, W, R, x, ritz, reorth)
        print(f"lanczos({ritz},reorth={int(reorth)}) x{S}: "
              f"{t * 1e3:8.1f} ms/sweep-equiv")

    # --- stage: gauge shift (S per sweep) ---
    def gauge_chain(x, impl):
        def body(x, _):
            def one(v):
                q, _ = D._qr_shift_right(v, impl=impl)
                return q
            return jax.vmap(one)(x), None
        x, _ = jax.lax.scan(body, x, None, length=S)
        return x

    jg = jax.jit(gauge_chain, static_argnames=("impl",))
    for impl in ("polar", "householder"):
        t = bench(jg, x, impl)
        print(f"gauge({impl}) x{S}:    {t * 1e3:8.1f} ms/sweep-equiv")

    # --- stage: env update (S per sweep) ---
    @jax.jit
    def env_chain(L, W, x):
        with jax.default_matmul_precision("highest"):
            def body(L, _):
                Ln = jax.vmap(lambda l, a: D._update_left(l, a, W))(L, x)
                n = jnp.linalg.norm(Ln.reshape(B, -1), axis=1)
                return Ln / n[:, None, None, None], None
            L, _ = jax.lax.scan(body, L, None, length=S)
        return L

    t = bench(env_chain, L, W, x)
    print(f"env update x{S}:       {t * 1e3:8.1f} ms/sweep-equiv")

    # --- full sweep ---
    As_b = jnp.stack([D.random_mps_stack(k, N, chi, d, dtype)
                      for k in jax.random.split(jax.random.PRNGKey(1), B)])
    def full(As_b):
        return batched_one_site_sweep(As_b, mpo.Ws, mpo.vL, mpo.vR,
                                      num_krylov_vecs=m)
    res = full(As_b)
    _sync(res.As)
    As_b = res.As
    t0 = time.perf_counter()
    k = 3
    for _ in range(k):
        res = full(As_b)
        As_b = res.As
    _sync(res.energy)   # depends on the whole chained computation
    t = (time.perf_counter() - t0) / k
    print(f"FULL batched sweep:    {t * 1e3:8.1f} ms "
          f"({B / t:.0f} inst-sweeps/s)")


if __name__ == "__main__":
    main()
