#!/usr/bin/env python
"""Communication volume of the EP (sector-sharded) symmetric DMRG sweep.

Round-3 model (per-contraction executor): every contraction reassembles
its full output with a psum — the m=10 Lanczos chain paid a
full-INTERMEDIATE psum per matvec stage (257.5 MB/sweep at chi=1024
N=16 B=8; BASELINE.md).  Round-4 model (fused chain executor,
`jax_engine.make_chain_executor`, VERDICT r3 item 2): dependency
components are device-assigned so stages 2..n are device-local and the
only collective is ONE psum of the final (site-tensor-sized) output per
matvec / env-growth chain.  This script computes BOTH payloads and the
reduction factor.  Pure host metadata; no devices needed.

Usage: python benchmarks/ep_comm_volume.py [--N 16] [--chi 1024] [--B 8]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--N", type=int, default=16)
    ap.add_argument("--chi", type=int, default=1024)
    ap.add_argument("--B", type=int, default=8)
    ap.add_argument("--m", type=int, default=10)
    args = ap.parse_args()
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from tensornetwork_tpu.blocksparse.batched import (
        uniform_skeleton_mps, _bond_matrix_skeleton)
    from tensornetwork_tpu.blocksparse import jax_engine as JE
    from tensornetwork_tpu.models.symmetric_dmrg import u1_xxz_mpo
    from tensornetwork_tpu.models import symmetric_dmrg as SD

    N, chi, B, m = args.N, args.chi, args.B, args.m
    skel = uniform_skeleton_mps(N, chi, dtype=np.float32)
    mpo = u1_xxz_mpo(1.0, 1.0, 0.0, N)

    # environment skeletons (as BatchedSymmetricDMRG builds them)
    from tensornetwork_tpu.models.symmetric_dmrg_batched import (
        _boundary_left_skel, _boundary_right_skel)
    Lsk = [None] * (N + 1)
    Rsk = [None] * (N + 1)
    Lsk[0] = _boundary_left_skel(np.float32)
    Rsk[N] = _boundary_right_skel(skel[-1].flat_charges[-1], np.float32)
    for k in range(N):
        Lsk[k + 1] = SD._add_left(Lsk[k], skel[k], mpo[k])
    for k in range(N - 1, -1, -1):
        Rsk[k] = SD._add_right(Rsk[k + 1], skel[k], mpo[k])

    def out_nnz(s1, s2, axes1, axes2):
        plan = JE._build_plan(s1, s2, axes1, axes2)
        return (0 if plan["scalar"] else plan["out"]["nnz"]), plan

    total_old = 0
    total_new = 0
    mps_nnz = sum(t.data.shape[0] for t in skel)
    for site in range(N):
        for direction in ("right", "left"):
            if direction == "right" and site == N - 1:
                continue
            if direction == "left" and site == 0:
                continue
            A, W = skel[site], mpo[site]
            L, R = Lsk[site], Rsk[site + 1]
            # matvec chain: L·x, ·W, ·R — old: one psum each, m times;
            # new (fused chain): one psum of the final y only
            n1, p1 = out_nnz(L, A, [0], [0])
            t1 = _skel_of(p1)
            n2, p2 = out_nnz(t1, W, [0, 2], [0, 3])
            t2 = _skel_of(p2)
            n3, _ = out_nnz(t2, R, [1, 2], [0, 1])
            site_old = m * (n1 + n2 + n3)
            site_new = m * n3
            # absorb (single contraction, unchanged) + env growth chain
            bond = _bond_matrix_skeleton(
                A.flat_charges[2 if direction == "right" else 0],
                np.float32)
            nxt = skel[site + 1 if direction == "right" else site - 1]
            if direction == "right":
                na, _ = out_nnz(bond, nxt, [1], [0])
            else:
                na, _ = out_nnz(nxt, bond, [2], [0])
            n_env = Lsk[site + 1].data.shape[0] if direction == "right" \
                else Rsk[site].data.shape[0]
            site_old += na + (n1 + n2 + A.data.shape[0])
            site_new += na + n_env
            total_old += site_old
            total_new += site_new
    print(f"config N={N} chi={chi} B={B} m={m}")
    print(f"MPS nnz total: {mps_nnz} ({mps_nnz * 4 / 1e6:.2f} MB f32 "
          f"per realization)")
    for name, total in (("per-contraction (r3)", total_old),
                        ("fused chain (r4)", total_new)):
        payload = total * 4 * B      # f32, per realization batch
        print(f"EP psum payload per one-site sweep [{name}]: "
              f"{payload / 1e6:.1f} MB logical "
              f"(= {total * 4 / 1e6:.2f} MB per realization, "
              f"{total / mps_nnz:.0f}x the MPS nnz)")
    print(f"reduction: {total_old / total_new:.1f}x "
          f"(ring all-reduce wire cost ~2x(n-1)/n of payload per device)")

    # --- round-5 capacity-EP accounting (sharded env storage):
    # env chains emit NO psum — outputs reduce-scatter into the sharded
    # layout (wire = half an all-reduce) and consumers all-gather the
    # current bond's envs transiently (the other half).  The matvec
    # psum is unchanged; absorb runs replicated (0 collective).
    psum_cap = 0
    rs_cap = 0
    ag_cap = 0
    for site in range(N):
        for direction in ("right", "left"):
            if direction == "right" and site == N - 1:
                continue
            if direction == "left" and site == 0:
                continue
            A, W = skel[site], mpo[site]
            L, R = Lsk[site], Rsk[site + 1]
            n1, p1 = out_nnz(L, A, [0], [0])
            t1 = _skel_of(p1)
            n2, p2 = out_nnz(t1, W, [0, 2], [0, 3])
            t2 = _skel_of(p2)
            n3, _ = out_nnz(t2, R, [1, 2], [0, 1])
            psum_cap += m * n3
            n_env = Lsk[site + 1].data.shape[0] if direction == "right" \
                else Rsk[site].data.shape[0]
            rs_cap += n_env
            ag_cap += L.data.shape[0] + R.data.shape[0]
    env_stack = (sum(s.data.shape[0] for s in Lsk if s is not None)
                 + sum(s.data.shape[0] for s in Rsk if s is not None))
    print(f"capacity-EP (r5) per one-site sweep: "
          f"psum {psum_cap * 4 * B / 1e6:.1f} MB (matvec only — env "
          f"chains contribute 0 psum bytes), "
          f"reduce-scatter {rs_cap * 4 * B / 1e6:.1f} MB, "
          f"all-gather {ag_cap * 4 * B / 1e6:.1f} MB logical")
    print(f"stored env stacks: {env_stack * 4 * B / 1e6:.1f} MB total "
          f"-> {env_stack * 4 * B / 8 / 1e6:.2f} MB per device on 8 "
          f"devices (replicated EP held the full stack on every device)")

    # --- two-site sweep: 4-stage matvec chain on theta ---
    t_old = 0
    t_new = 0
    for bond in range(N - 1):
        A, Bt = skel[bond], skel[bond + 1]
        W1, W2 = mpo[bond], mpo[bond + 1]
        L, R = Lsk[bond], Rsk[bond + 2]
        nth, pth = out_nnz(A, Bt, [2], [0])
        th = _skel_of(pth)
        n1, p1 = out_nnz(L, th, [0], [0])
        t1 = _skel_of(p1)
        n2, p2 = out_nnz(t1, W1, [0, 2], [0, 3])
        t2 = _skel_of(p2)
        n3, p3 = out_nnz(t2, W2, [3, 1], [0, 3])
        t3 = _skel_of(p3)
        n4, _ = out_nnz(t3, R, [1, 3], [0, 1])
        # both directions visit each bond once per full sweep
        t_old += 2 * (nth + m * (n1 + n2 + n3 + n4))
        t_new += 2 * (nth + m * n4)
    for name, total in (("per-contraction (r3)", t_old),
                        ("fused chain (r4)", t_new)):
        print(f"EP psum payload per TWO-site sweep [{name}]: "
              f"{total * 4 * B / 1e6:.1f} MB logical")
    print(f"two-site reduction: {t_old / t_new:.1f}x "
          f"(theta assembly + split/env terms excluded on both sides)")


def _skel_of(plan):
    from tensornetwork_tpu.blocksparse.batched import _skel_of_plan_out
    return _skel_of_plan_out(plan)


if __name__ == "__main__":
    main()
