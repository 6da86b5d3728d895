"""EP-distributed batched U(1) DMRG with serialized-trace cold starts.

Round-3 showcase (no reference analog — the reference is single-device
and single-realization): a batch of XXZ disorder realizations sharing
one charge skeleton runs one-site DMRG with every contraction's charge
sectors SHARDED over the device mesh (`ep_mesh=`: per-device sector
slices, one psum per contraction), and the per-(site, direction)
programs round-trip through `jax.export` serialized traces so a second
process skips retracing entirely (BASELINE.md: 42.7 s cold start at
chi=1024 vs 181.5 s without the artifacts).

Run on the virtual 8-device CPU mesh:

    python examples/distributed_symmetric_dmrg.py
"""
import os
import sys

if not os.environ.get("TN_TPU"):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")
    import jax
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, ".")

import jax
import numpy as np

from tensornetwork_tpu.blocksparse.batched import (random_data_batch,
                                                   uniform_skeleton_mps)
from tensornetwork_tpu.models.symmetric_dmrg import u1_xxz_mpo
from tensornetwork_tpu.models.symmetric_dmrg_batched import (
    BatchedSymmetricDMRG)
from tensornetwork_tpu.parallel.mesh import make_mesh


def main(N=8, chi=16, B=4, sweeps=3, export_dir=None):
    skel = uniform_skeleton_mps(N, chi, dtype=np.float32)
    mpo = u1_xxz_mpo(1.0, 1.0, 0.0, N)
    data = random_data_batch(skel, B, seed=0)

    # single-device reference run
    ref = BatchedSymmetricDMRG(skel, [d.copy() for d in data], mpo,
                               num_krylov_vecs=10)
    if export_dir:
        n = ref.export_programs(export_dir)
        print(f"exported {n} serialized traces -> {export_dir}")
        ref.load_programs(export_dir)
    es_ref = ref.run_one_site(num_sweeps=sweeps)
    print(f"single-device: E mean {es_ref.mean():.8f} "
          f"span [{es_ref.min():.6f}, {es_ref.max():.6f}]")

    # capacity-EP: charge sectors sharded over all devices AND env
    # stacks stored sharded (per-device env HBM = total/ndev; env
    # chains emit zero psum bytes — round 5).  Building a third solver
    # variant in this process trips the documented in-process XLA-CPU
    # compiler flake, so the replicated-EP variant is exercised by
    # tests/test_ep_capacity.py instead.
    mesh = make_mesh((len(jax.devices()),), ("ep",))
    ep = BatchedSymmetricDMRG(skel, [d.copy() for d in data], mpo,
                              num_krylov_vecs=10, ep_mesh=mesh,
                              ep_capacity=True)
    es_ep = ep.run_one_site(num_sweeps=sweeps)
    print(f"capacity-EP ({mesh.shape['ep']} devices, env stacks "
          f"sharded): E mean {es_ep.mean():.8f} "
          f"(max dev vs single-device "
          f"{np.abs(es_ep - es_ref).max():.2e})")
    return es_ep


if __name__ == "__main__":
    main(export_dir=sys.argv[1] if len(sys.argv) > 1 else None)
