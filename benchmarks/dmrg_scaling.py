"""Single-instance DMRG sweep rate vs bond dimension on one chip.

Usage: python benchmarks/dmrg_scaling.py [--chis 32,64,128,256] [--N 32]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chis", default="32,64,128,256")
    ap.add_argument("--N", type=int, default=32)
    ap.add_argument("--m", type=int, default=10)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()
    import jax
    import jax.numpy as jnp
    from benchmarks._timing import bracket, warmup
    from tensornetwork_tpu.models import FiniteTFI
    from tensornetwork_tpu.models.dmrg import (one_site_sweep,
                                               random_mps_stack)
    from tensornetwork_tpu.utils.profiling import dmrg_sweep_flops

    dtype = jnp.float32
    print(f"device: {jax.devices()[0]}", flush=True)
    # initialize the transfer path: on tunneled platforms
    # block_until_ready is a no-op until the first device_get completes
    warmup()
    mpo = FiniteTFI(Jx=1.0, Bz=1.0, N=args.N, dtype=dtype)
    for chi in [int(c) for c in args.chis.split(",")]:
        As = random_mps_stack(jax.random.PRNGKey(0), args.N, chi, 2, dtype)
        t0 = time.perf_counter()
        res = one_site_sweep(As, mpo.Ws, mpo.vL, mpo.vR,
                             num_krylov_vecs=args.m)
        jax.block_until_ready(res.As)
        compile_s = time.perf_counter() - t0
        As = res.As
        with bracket(lambda: res.energy) as b:
            for _ in range(args.iters):
                res = one_site_sweep(As, mpo.Ws, mpo.vL, mpo.vR,
                                     num_krylov_vecs=args.m)
                As = res.As
        dt = b.seconds / args.iters
        fl = dmrg_sweep_flops(args.N, chi, 2, 3, args.m)
        print(f"chi={chi:5d}: {1 / dt:8.2f} sweeps/s "
              f"({dt * 1e3:8.1f} ms/sweep, ~{fl / dt / 1e12:6.2f} TFLOP/s, "
              f"compile {compile_s:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
