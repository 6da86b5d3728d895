"""Disorder-averaged U(1) DMRG: many realizations in one compiled sweep.

The flagship block-sparse configuration (BASELINE.md: chi=1024 x 1k
realizations) in miniature: every disorder realization of a random-bond
XXZ chain shares one charge skeleton, so the whole ensemble sweeps
on-device as batched sector GEMMs
(:class:`tensornetwork_tpu.models.symmetric_dmrg_batched.BatchedSymmetricDMRG`).
The reference library would run each realization through its serial
python sector loop (reference ``block_sparse/blocksparsetensor.py:1094``).

Run:  python examples/disorder_study.py [--chi 64] [--B 16] [--N 12]
"""
import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def main(N: int = 12, chi: int = 64, B: int = 16, num_sweeps: int = 6,
         seed: int = 0, verbose: int = 1):
    from tensornetwork_tpu.blocksparse.batched import (
        random_data_batch, uniform_skeleton_mps)
    from tensornetwork_tpu.models.symmetric_dmrg import u1_xxz_mpo
    from tensornetwork_tpu.models.symmetric_dmrg_batched import (
        BatchedSymmetricDMRG)

    rng = np.random.default_rng(seed)
    # random-bond disorder: per-realization Jz couplings in [0.5, 1.5];
    # the MPO charge structure is coupling-independent, so the data
    # stacks on the batch axis
    skel = uniform_skeleton_mps(N, chi, dtype=np.float32)
    data = random_data_batch(skel, B, seed=seed)
    Jzs = rng.uniform(0.5, 1.5, size=B)
    mpos = [u1_xxz_mpo(float(jz), 1.0, 0.0, N) for jz in Jzs]
    mpo_data = [jnp.stack([jnp.asarray(mpos[b][i].data) for b in range(B)])
                for i in range(N)]

    dmrg = BatchedSymmetricDMRG(skel, data, mpos[0], mpo_data=mpo_data,
                                num_krylov_vecs=10)
    t0 = time.perf_counter()
    es = dmrg.run_one_site(num_sweeps=num_sweeps, verbose=verbose)
    dt = time.perf_counter() - t0
    if verbose:
        print(f"\n{B} realizations x {num_sweeps} sweeps in {dt:.1f} s")
        print(f"disorder-averaged E: {es.mean():.6f} +- {es.std():.6f}")
        print(f"per-realization: {np.array2string(es, precision=4)}")
    return es


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--N", type=int, default=12)
    p.add_argument("--chi", type=int, default=64)
    p.add_argument("--B", type=int, default=16)
    p.add_argument("--sweeps", type=int, default=6)
    args = p.parse_args()
    main(args.N, args.chi, args.B, args.sweeps)
