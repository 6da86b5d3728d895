#!/usr/bin/env python
"""Cold first-sweep compile wall of the batched U(1) DMRG at chi=1024
N=16 (VERDICT r1 item 6: target < 120 s cold; measured 457 s on
2026-08-18 before program dedupe).

Run on the real TPU.  Reports: unique compiled programs, first-sweep
wall time (compile-dominated), steady-state sweep time.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--N", type=int, default=16)
    ap.add_argument("--chi", type=int, default=1024)
    ap.add_argument("--B", type=int, default=8)
    ap.add_argument("--m", type=int, default=10)
    ap.add_argument("--precompile", action="store_true",
                    help="threaded AOT precompile before the first sweep")
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--export-dir", default=None,
                    help="serialized-trace artifact dir: exports after "
                    "the run if empty, loads before the run if populated "
                    "(VERDICT r2 item 3; pair with the persistent "
                    "compilation cache for the full effect)")
    ap.add_argument("--persistent-cache", action="store_true",
                    help="enable the persistent XLA compilation cache "
                    "(the compiled-binary half of the cold-start wall)")
    ap.add_argument("--export-workers", type=int, default=1,
                    help=">1: fan the trace+export across processes "
                    "(VERDICT r3 item 7 — tracing is GIL-bound)")
    args = ap.parse_args()
    if args.persistent_cache:
        from tensornetwork_tpu.config import (
            enable_persistent_compilation_cache)
        enable_persistent_compilation_cache()

    from tensornetwork_tpu.blocksparse.batched import (
        random_data_batch, uniform_skeleton_mps)
    from tensornetwork_tpu.models.symmetric_dmrg import u1_xxz_mpo
    from tensornetwork_tpu.models.symmetric_dmrg_batched import (
        BatchedSymmetricDMRG)

    log(f"devices: {jax.devices()}")
    jax.device_get(jnp.ones(4))
    log("transfer path warm")

    t0 = time.perf_counter()
    skel = uniform_skeleton_mps(args.N, args.chi, dtype=np.float32)
    data = random_data_batch(skel, args.B, seed=1)
    mpo = u1_xxz_mpo(1.0, 1.0, 0.0, args.N)
    dmrg = BatchedSymmetricDMRG(skel, data, mpo,
                                num_krylov_vecs=args.m)
    log(f"setup (skeletons + env skeletons): "
        f"{time.perf_counter() - t0:.1f}s")

    if args.export_dir:
        have = (os.path.isdir(args.export_dir)
                and any(f.endswith(".shlo")
                        for f in os.listdir(args.export_dir)))
        if not have:
            # first process: serialize the traces BEFORE running, then
            # load them back — the run below then compiles exactly the
            # deserialized modules, so the persistent compilation cache
            # is populated under the SAME keys every later process uses
            # (compiling the original jits instead would warm the wrong
            # cache entries; measured 2026-08-21)
            t0 = time.perf_counter()
            if args.export_workers > 1:
                n = dmrg.export_programs_parallel(
                    args.export_dir, workers=args.export_workers)
            else:
                n = dmrg.export_programs(args.export_dir)
            log(f"exported {n} serialized traces in "
                f"{time.perf_counter() - t0:.1f}s "
                f"({args.export_workers} workers)")
        t0 = time.perf_counter()
        n = dmrg.load_programs(args.export_dir)
        log(f"loaded {n} serialized traces in "
            f"{time.perf_counter() - t0:.1f}s (tracing skipped)")
    if args.precompile:
        t0 = time.perf_counter()
        dmrg.precompile(max_workers=args.workers, verbose=1)
        log(f"threaded precompile: {time.perf_counter() - t0:.1f}s "
            f"({args.workers} workers)")
    t0 = time.perf_counter()
    es = dmrg.run_one_site(num_sweeps=1, tol=0)
    first = time.perf_counter() - t0
    n_prog = len(dmrg._programs) + len(dmrg._canon_programs)
    log(f"first sweep (cold compile): {first:.1f}s; "
        f"unique programs: {len(dmrg._programs)} site + "
        f"{len(dmrg._canon_programs)} canon")
    # second sweep absorbs the loaded-program second-trace wave; third
    # is the true steady state
    t0 = time.perf_counter()
    es = dmrg.run_one_site(num_sweeps=1, tol=0)
    log(f"second sweep: {time.perf_counter() - t0:.2f}s")
    t0 = time.perf_counter()
    es = dmrg.run_one_site(num_sweeps=1, tol=0)
    log(f"steady-state sweep: {time.perf_counter() - t0:.2f}s; "
        f"E mean {np.mean(dmrg.energies[-1]):.6f}")


if __name__ == "__main__":
    main()
