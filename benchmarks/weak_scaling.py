"""Weak-scaling harness: batched DMRG, fixed instances per device.

BASELINE target: >=85% weak-scaling efficiency 1 -> 4 hosts.  With one
real chip in this environment, the harness demonstrates methodology on
the virtual CPU mesh (`--cpu`, default when fewer than 2 accelerators are
attached) and runs unchanged on a real slice: the batch axis is sharded
over the mesh and instances never communicate, so the only losses are
collective-free launch overheads.

Usage:  python benchmarks/weak_scaling.py [--cpu] [--per-device 8]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--per-device", type=int, default=8)
    ap.add_argument("--N", type=int, default=32)
    ap.add_argument("--chi", type=int, default=64)
    ap.add_argument("--sweeps", type=int, default=3)
    args = ap.parse_args()

    if args.cpu:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_force_host_platform_device_count=8")
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from tensornetwork_tpu.models import FiniteTFI
    from tensornetwork_tpu.models.dmrg import random_mps_stack
    from tensornetwork_tpu.parallel.mesh import make_mesh, batch_spec
    from tensornetwork_tpu.parallel.batch import batched_one_site_sweep

    n_dev = len(jax.devices())
    dtype = jnp.float32
    mpo = FiniteTFI(Jx=1.0, Bz=1.0, N=args.N, dtype=dtype)
    jax.device_get(jnp.ones(4))  # warm transfer path

    results = []
    P = 1
    while P <= n_dev:
        B = args.per_device * P
        mesh = make_mesh((P,), ("data",), devices=jax.devices()[:P])
        keys = jax.random.split(jax.random.PRNGKey(0), B)
        As = jnp.stack([random_mps_stack(k, args.N, args.chi, 2, dtype)
                        for k in keys])
        As = jax.device_put(As, batch_spec(mesh, "data", As.ndim))
        repl = jax.sharding.NamedSharding(mesh,
                                          jax.sharding.PartitionSpec())
        Ws = jax.device_put(mpo.Ws, repl)
        vL = jax.device_put(mpo.vL, repl)
        vR = jax.device_put(mpo.vR, repl)
        with mesh:
            res = batched_one_site_sweep(As, Ws, vL, vR,
                                         num_krylov_vecs=10)
            jax.block_until_ready(res.As)  # compile
            As_c = res.As
            t0 = time.perf_counter()
            for _ in range(args.sweeps):
                res = batched_one_site_sweep(As_c, Ws, vL, vR,
                                             num_krylov_vecs=10)
                As_c = res.As
            jax.block_until_ready(As_c)
        dt = (time.perf_counter() - t0) / args.sweeps
        rate = B / dt
        results.append((P, B, rate))
        print(f"devices={P:2d} batch={B:4d}: {rate:9.1f} "
              f"instance-sweeps/s", flush=True)
        P *= 2
    base = results[0][2]
    for P, B, rate in results[1:]:
        eff = rate / (base * P) * 100
        print(f"weak-scaling efficiency {results[0][0]}->{P} devices: "
              f"{eff:.0f}%")
    if args.cpu:
        print("(virtual CPU devices share host cores: efficiencies above "
              "reflect host oversubscription, not interconnect scaling — "
              "run on a real slice for meaningful numbers)")


if __name__ == "__main__":
    main()
