"""Decompose the batched TWO-site DMRG sweep cost on the real chip
(VERDICT r1 item 2: close the 5x gap to one-site — target >=300
inst-sweeps/s at B=256 chi=64; report the stage table in BASELINE.md).

Per sweep there are S = 2*(N-1) bond steps; each step is: theta build,
one two-site Lanczos solve (m matvecs of the 2-MPO H_eff), one rank-chi
truncation (subspace iteration or masked SVD), one env update.

Usage: python benchmarks/two_site_profile.py [B] [chi]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from tensornetwork_tpu.models import FiniteTFI
from tensornetwork_tpu.models import dmrg as D
from tensornetwork_tpu.ops import krylov
from tensornetwork_tpu.ops.decompositions import subspace_truncate, svd_masked
from tensornetwork_tpu.parallel.batch import batched_two_site_sweep


def _sync(out):
    # honest sync: fetch one element (depends on the whole computation);
    # bare block_until_ready can return early on this backend (CLAUDE.md)
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
    S = 2 * (N - 1)
    dtype = jnp.float32
    print(f"two-site B={B} chi={chi} N={N} m={m} ({S} bond steps/sweep)",
          flush=True)
    jax.device_get(jnp.ones(4))

    mpo = FiniteTFI(Jx=1.0, Bz=1.0, N=N, dtype=dtype)
    W = jnp.asarray(mpo.Ws[N // 2])
    M = W.shape[0]
    key = jax.random.PRNGKey(0)
    kL, kR, kx, kq = jax.random.split(key, 4)
    L = jax.random.normal(kL, (B, chi, M, chi), dtype)
    L = (L + L.transpose(0, 3, 2, 1)) / 2
    R = jax.random.normal(kR, (B, chi, M, chi), dtype)
    R = (R + R.transpose(0, 3, 2, 1)) / 2
    th = jax.random.normal(kx, (B, chi, d, d, chi), dtype)
    th = th / jnp.linalg.norm(th.reshape(B, -1), axis=1)[:, None, None,
                                                         None, None]
    q0 = jax.random.normal(kq, (B, chi * d, chi), dtype)

    # --- stage: two-site matvec chain (S*m per sweep) ---
    @jax.jit
    def matvec_chain(L, R, th):
        with jax.default_matmul_precision("highest"):
            def body(x, _):
                y = jax.vmap(lambda l, r, v: D._matvec_2s(l, W, W, r, v))(
                    L, R, x)
                n = jnp.linalg.norm(y.reshape(B, -1), axis=1)
                y = y / n[:, None, None, None, None]
                return y, None
            x, _ = jax.lax.scan(body, th, None, length=S * m)
        return x

    t = bench(matvec_chain, L, R, th)
    # 2-site matvec: L·x (M d chi^3), W couplings, x·R — count the two
    # big GEMM stages + middle
    flops = 2 * M * d * d * chi**3 * 3 * B * S * m
    print(f"matvec x{S * m}:        {t * 1e3:8.1f} ms/sweep-equiv "
          f"(~{flops / t / 1e12:.1f} TFLOP/s)", flush=True)

    # --- stage: full Lanczos solve (S per sweep), xla vs fused ---
    for impl in ("xla", "fused"):
        def solve_chain(L, R, th):
            with jax.default_matmul_precision("highest"):
                def body(x, _):
                    E0, y = jax.vmap(
                        lambda l, r, v: D._local_solve_2s(
                            l, W, W, r, v, m, "power", False, None,
                            impl, False))(L, R, x)
                    return y, None
                x, _ = jax.lax.scan(body, th, None, length=S)
            return x
        try:
            t = bench(jax.jit(solve_chain), L, R, th)
            print(f"lanczos[{impl:5s}] x{S}:  {t * 1e3:8.1f} "
                  f"ms/sweep-equiv", flush=True)
        except Exception as e:
            print(f"lanczos[{impl}] FAILED: {str(e)[:150]}", flush=True)

    # --- stage: truncation (S per sweep) ---
    thm = th.reshape(B, chi * d, d * chi)

    @jax.jit
    def trunc_subspace_chain(thm, q0):
        with jax.default_matmul_precision("highest"):
            def body(carry, _):
                thm, q0 = carry
                st = jax.vmap(lambda a, q: subspace_truncate(
                    a, chi, q0=q, iters=4))(thm, q0)
                return (thm, st.q), None
            carry, _ = jax.lax.scan(body, (thm, q0), None, length=S)
        return carry[1]

    t = bench(trunc_subspace_chain, thm, q0)
    print(f"trunc[subspace] x{S}: {t * 1e3:8.1f} ms/sweep-equiv",
          flush=True)

    @jax.jit
    def trunc_svd_chain(thm):
        # consume u AND vh — returning only s lets XLA dead-code the
        # singular-vector computation and report a fantasy cost
        with jax.default_matmul_precision("highest"):
            def body(thm, _):
                res = jax.vmap(lambda a: svd_masked(
                    a, max_singular_values=chi))(thm)
                probe = (jnp.sum(res.u[:, 0, :] ** 2, axis=1)
                         + jnp.sum(res.vh[:, :, 0] ** 2, axis=1)
                         + res.s[:, 0])
                return thm, probe
            _, ss = jax.lax.scan(body, thm, None, length=S)
        return ss

    t = bench(trunc_svd_chain, thm)
    print(f"trunc[svd] x{S}:      {t * 1e3:8.1f} ms/sweep-equiv",
          flush=True)

    # --- stage: env update (S per sweep) ---
    A = jax.random.normal(kq, (B, chi, d, chi), dtype)

    @jax.jit
    def env_chain(L, A):
        with jax.default_matmul_precision("highest"):
            def body(L, _):
                Ln = jax.vmap(lambda l, a: D._update_left(l, a, W))(L, A)
                n = jnp.linalg.norm(Ln.reshape(B, -1), axis=1)
                Ln = Ln / n[:, None, None, None]
                return Ln, None
            L, _ = jax.lax.scan(body, L, None, length=S)
        return L

    t = bench(env_chain, L, A)
    print(f"env update x{S}:      {t * 1e3:8.1f} ms/sweep-equiv",
          flush=True)

    # --- full sweeps for reference ---
    keys = jax.random.split(jax.random.PRNGKey(1), B)
    As_b = jnp.stack([D.random_mps_stack(k, N, chi, d, dtype)
                      for k in keys])
    for trunc_impl in ("subspace", "svd"):
        res = batched_two_site_sweep(As_b, mpo.Ws, mpo.vL, mpo.vR,
                                     num_krylov_vecs=m,
                                     trunc_impl=trunc_impl)
        _sync(res.As)
        t0 = time.perf_counter()
        k = 3
        As_c = res.As
        for _ in range(k):
            res = batched_two_site_sweep(As_c, mpo.Ws, mpo.vL, mpo.vR,
                                         num_krylov_vecs=m,
                                         trunc_impl=trunc_impl)
            As_c = res.As
        _sync(res.energy)   # depends on the chained computation
        dt = (time.perf_counter() - t0) / k
        print(f"full two-site sweep[{trunc_impl}]: {dt * 1e3:8.1f} ms "
              f"= {B / dt:.0f} inst-sweeps/s", flush=True)


if __name__ == "__main__":
    main()
