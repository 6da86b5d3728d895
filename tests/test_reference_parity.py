"""Direct parity tests against the reference library itself.

These import google/TensorNetwork v0.4.6 from /root/reference (numpy
backend) and compare results on identical inputs — the strongest form of
the oracle strategy.  Skipped when the reference is unavailable.
"""
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/reference")
ref_tn = pytest.importorskip("tensornetwork")

import tensornetwork_tpu as tn
from tensornetwork_tpu.models import FiniteTFI, FiniteXXZ, FiniteDMRG
from tensornetwork_tpu.models.dmrg import random_mps_stack


def test_ncon_parity(rng):
    tensors = [rng.standard_normal((4, 5, 3)),
               rng.standard_normal((5, 6)),
               rng.standard_normal((3, 6, 2))]
    labels = [(-1, 1, 2), (1, 3), (2, 3, -2)]
    ours = np.asarray(tn.ncon(tensors, labels))
    theirs = ref_tn.ncon(tensors, labels, backend="numpy")
    np.testing.assert_allclose(ours, theirs, rtol=1e-10)


def test_ncon_batch_label_parity(rng):
    a = rng.standard_normal((7, 3, 5))
    b = rng.standard_normal((7, 5, 4))
    labels = [(-1, -2, 1), (-1, 1, -3)]
    ours = np.asarray(tn.ncon([a, b], labels))
    theirs = ref_tn.ncon([a, b], labels, backend="numpy")
    np.testing.assert_allclose(ours, theirs, rtol=1e-10)


def test_contractor_parity(rng):
    def build(module):
        nodes = [module.Node(ts[i]) for i in range(4)]
        for i in range(3):
            nodes[i][1] ^ nodes[i + 1][0]
        return nodes
    ts = [rng.standard_normal((5, 5)) for _ in range(4)]
    ours_nodes = build(tn)
    ours = tn.contractors.greedy(
        ours_nodes, output_edge_order=[ours_nodes[0][0], ours_nodes[3][1]])
    ref_nodes = [ref_tn.Node(t, backend="numpy") for t in ts]
    for i in range(3):
        ref_nodes[i][1] ^ ref_nodes[i + 1][0]
    theirs = ref_tn.contractors.greedy(
        ref_nodes, output_edge_order=[ref_nodes[0][0], ref_nodes[3][1]])
    np.testing.assert_allclose(np.asarray(ours.tensor),
                               np.asarray(theirs.tensor), rtol=1e-10)


def test_split_node_truncation_parity(rng):
    t = rng.standard_normal((8, 8))
    ours_node = tn.Node(t)
    u1, v1, rest1 = tn.split_node(ours_node, [ours_node[0]],
                                  [ours_node[1]], max_singular_values=3)
    ref_node = ref_tn.Node(t, backend="numpy")
    u2, v2, rest2 = ref_tn.split_node(ref_node, [ref_node[0]],
                                      [ref_node[1]],
                                      max_singular_values=3)
    # same truncated spectrum (signs of singular vectors may differ)
    np.testing.assert_allclose(np.sort(np.abs(np.asarray(rest1))),
                               np.sort(np.abs(np.asarray(rest2.tensor)
                                              if hasattr(rest2, "tensor")
                                              else rest2)), rtol=1e-10)
    recon1 = np.asarray(u1.tensor) @ np.asarray(v1.tensor)
    recon2 = np.asarray(u2.tensor) @ np.asarray(v2.tensor)
    np.testing.assert_allclose(recon1, recon2, atol=1e-10)


def test_dmrg_energy_parity():
    # same model, both libraries from independent random starts: the
    # converged ground energies must agree
    N, chi = 12, 32
    e_ours = FiniteDMRG(
        random_mps_stack(__import__("jax").random.PRNGKey(0), N, chi),
        FiniteTFI(Jx=1.0, Bz=1.0, N=N)).run_one_site(
            num_sweeps=8, num_krylov_vecs=20)
    mpo = ref_tn.FiniteTFI(np.ones(N - 1), np.ones(N), np.float64,
                           backend="numpy")
    mps = ref_tn.FiniteMPS.random([2] * N, [chi] * (N - 1),
                                  dtype=np.float64, backend="numpy")
    dmrg = ref_tn.FiniteDMRG(mps, mpo)
    e_ref = dmrg.run_one_site(num_sweeps=8, num_krylov_vecs=20, verbose=0)
    np.testing.assert_allclose(e_ours, float(e_ref), rtol=1e-9)


def test_xxz_dmrg_energy_parity():
    N, chi = 10, 24
    e_ours = FiniteDMRG(
        random_mps_stack(__import__("jax").random.PRNGKey(1), N, chi),
        FiniteXXZ(Jz=1.0, Jxy=1.0, Bz=0.0, N=N)).run_one_site(
            num_sweeps=10, num_krylov_vecs=20)
    mpo = ref_tn.FiniteXXZ(np.ones(N - 1), np.ones(N - 1), np.zeros(N),
                           np.float64, backend="numpy")
    mps = ref_tn.FiniteMPS.random([2] * N, [chi] * (N - 1),
                                  dtype=np.float64, backend="numpy")
    dmrg = ref_tn.FiniteDMRG(mps, mpo)
    e_ref = dmrg.run_one_site(num_sweeps=10, num_krylov_vecs=20, verbose=0)
    np.testing.assert_allclose(e_ours, float(e_ref), rtol=1e-8)


def test_blocksparse_tensordot_parity(rng):
    ref_bs = pytest.importorskip("tensornetwork.block_sparse")
    from tensornetwork_tpu.blocksparse import (
        U1Charge, Index, BlockSparseTensor, tensordot)
    charges = [rng.integers(-2, 3, d) for d in (5, 6, 6, 4)]
    # ours
    a = BlockSparseTensor.fromdense(
        [Index(U1Charge(charges[0]), False),
         Index(U1Charge(charges[1]), True)],
        np.zeros((5, 6)))
    # build identical random dense data through the reference
    ri1 = ref_bs.Index(ref_bs.U1Charge(charges[0]), False)
    ri2 = ref_bs.Index(ref_bs.U1Charge(charges[1]), True)
    ri3 = ref_bs.Index(ref_bs.U1Charge(charges[1]), False)
    ri4 = ref_bs.Index(ref_bs.U1Charge(charges[3]), True)
    ra = ref_bs.randn([ri1, ri2], dtype=np.float64)
    rb = ref_bs.randn([ri3, ri4], dtype=np.float64)
    dense_a = ra.todense()
    dense_b = rb.todense()
    oa = BlockSparseTensor.fromdense(
        [Index(U1Charge(charges[0]), False),
         Index(U1Charge(charges[1]), True)], dense_a)
    ob = BlockSparseTensor.fromdense(
        [Index(U1Charge(charges[1]), False),
         Index(U1Charge(charges[3]), True)], dense_b)
    ours = tensordot(oa, ob, [[1], [0]]).todense()
    theirs = ref_bs.tensordot(ra, rb, [[1], [0]]).todense()
    np.testing.assert_allclose(ours, theirs, atol=1e-12)


def test_quantum_parity(rng):
    from tensornetwork.quantum import quantum as ref_q
    from tensornetwork_tpu.quantum import QuOperator, QuVector
    a = rng.standard_normal((2, 3, 2, 3))
    psi = rng.standard_normal((2, 3))
    ours_op = QuOperator.from_tensor(a, [0, 1], [2, 3])
    ref_op = ref_q.QuOperator.from_tensor(
        ref_tn.Node(a, backend="numpy").tensor if False else a,
        [0, 1], [2, 3])
    np.testing.assert_allclose(np.asarray(ours_op.trace().eval()),
                               np.asarray(ref_op.trace().eval()),
                               rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(ours_op.partial_trace([1]).eval()),
        np.asarray(ref_op.partial_trace([1]).eval()), rtol=1e-10)
    ours_v = QuVector.from_tensor(psi)
    ref_v = ref_q.QuVector.from_tensor(psi)
    np.testing.assert_allclose(
        np.asarray((ours_v.adjoint() @ ours_v).eval()),
        np.asarray((ref_v.adjoint() @ ref_v).eval()), rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(ours_v.reduced_density([1]).eval()),
        np.asarray(ref_v.reduced_density([1]).eval()), rtol=1e-10)


def test_from_topology_parity(rng):
    A = rng.standard_normal((3, 4))
    B = rng.standard_normal((4, 5))
    ours = tn.from_topology("ab,bc", [A, B])
    theirs = ref_tn.from_topology("ab,bc", [A, B], backend="numpy")
    o = tn.contractors.greedy(ours, output_edge_order=[ours[0][0],
                                                       ours[1][1]])
    t = ref_tn.contractors.greedy(theirs,
                                  output_edge_order=[theirs[0][0],
                                                     theirs[1][1]])
    np.testing.assert_allclose(np.asarray(o.tensor),
                               np.asarray(t.tensor), rtol=1e-10)


def test_truncated_svd_semantics_parity(rng):
    # max_truncation_error tail semantics must match the reference exactly
    from tensornetwork_tpu.ops.decompositions import svd as our_svd
    from tensornetwork.backends.numpy.numpy_backend import NumPyBackend
    backend = NumPyBackend()
    t = rng.standard_normal((10, 12))
    for kwargs in ({"max_singular_values": 4},
                   {"max_truncation_error": 0.5},
                   {"max_truncation_error": 0.1, "relative": True},
                   {"max_singular_values": 6,
                    "max_truncation_error": 0.8}):
        u1, s1, v1, rest1 = our_svd(t, pivot_axis=1, **kwargs)
        u2, s2, v2, rest2 = backend.svd(t, pivot_axis=1,
                                        **{k.replace("error", "error"): v
                                           for k, v in kwargs.items()})
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                                   rtol=1e-10, err_msg=str(kwargs))
        np.testing.assert_allclose(
            np.sort(np.abs(np.asarray(rest1))),
            np.sort(np.abs(np.asarray(rest2))), rtol=1e-10,
            err_msg=str(kwargs))
