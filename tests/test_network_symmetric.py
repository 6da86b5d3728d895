"""Symmetric (BlockSparseTensor) tensors through the Node-graph API.

Scenario port of the reference's symmetric graph-core suites
(``tests/split_node_symmetric_test.py`` and
``tests/tensornetwork_symmetric_test.py``, VERDICT r3 item 4b): the SAME
Node/Edge/split_node surface that serves dense arrays must serve
charge-conserving tensors, verified against ``todense()`` oracles over
multiple charge types.
"""
import numpy as np
import pytest

from tensornetwork_tpu.blocksparse import (BlockSparseTensor, Index,
                                           U1Charge, Z2Charge, randn)
from tensornetwork_tpu.blocksparse import tensor as bst
from tensornetwork_tpu.core.network import (
    Node, contract, contract_between, flatten_edges,
    flatten_edges_between, get_shared_edges, outer_product)
from tensornetwork_tpu.core.operations import (
    contract_trace_edges, copy, split_node, split_node_full_svd,
    split_node_qr, split_node_rq)

CHARGE_MAKERS = {
    "u1": lambda rng, d: U1Charge(rng.integers(-2, 3, d)),
    "z2": lambda rng, d: Z2Charge(rng.integers(0, 2, d)),
    "u1xu1": lambda rng, d: (U1Charge(rng.integers(-1, 2, d))
                             @ U1Charge(rng.integers(-1, 2, d))),
}


def _dense_of(val):
    if isinstance(val, BlockSparseTensor):
        return val.todense()
    return np.asarray(val)


def _rand_bst(rng, kind, dims, flows, seed):
    mk = CHARGE_MAKERS[kind]
    idxs = [Index(mk(rng, d), f) for d, f in zip(dims, flows)]
    return randn(idxs, seed=seed)


@pytest.fixture(params=list(CHARGE_MAKERS))
def kind(request):
    return request.param


def test_node_holds_blocksparse(kind, rng):
    t = _rand_bst(rng, kind, (6, 5), (False, True), 1)
    node = Node(t, name="bs", axis_names=["l", "r"])
    assert node.shape == (6, 5)
    assert isinstance(node.tensor, BlockSparseTensor)
    assert node.get_rank() == 2


def test_at_operator(kind, rng):
    a = _rand_bst(rng, kind, (6, 5), (False, True), 2)
    b_idx = [i.copy().flip_flow() for i in a.sparse_shape[1:]]
    b = randn([b_idx[0],
               Index(a.sparse_shape[0].charges, True)], seed=3)
    na, nb = Node(a), Node(b)
    na[1] ^ nb[0]
    out = na @ nb
    oracle = a.todense() @ b.todense()
    np.testing.assert_allclose(out.tensor.todense(), oracle, atol=1e-12)


def test_small_matmul_all_kinds(kind, rng):
    a = _rand_bst(rng, kind, (7, 6), (False, True), 4)
    b = randn([a.sparse_shape[1].copy().flip_flow(),
               a.sparse_shape[0].copy().flip_flow()], seed=5)
    na, nb = Node(a), Node(b)
    na[1] ^ nb[0]
    na[0] ^ nb[1]
    out = contract_between(na, nb)
    oracle = np.tensordot(a.todense(), b.todense(), [[1, 0], [0, 1]])
    np.testing.assert_allclose(
        _dense_of(out.tensor).reshape(oracle.shape), oracle, atol=1e-12)


def test_double_trace(kind, rng):
    mk = CHARGE_MAKERS[kind]
    c1, c2 = mk(rng, 4), mk(rng, 5)
    t = randn([Index(c1, False), Index(c2, False),
               Index(c1, True), Index(c2, True)], seed=6)
    node = Node(t)
    node[0] ^ node[2]
    node[1] ^ node[3]
    out = contract_trace_edges(node)
    oracle = np.trace(np.trace(t.todense(), axis1=0, axis2=2))
    val = out.tensor
    if isinstance(val, BlockSparseTensor):
        val = val.todense()
    np.testing.assert_allclose(np.asarray(val).reshape(()), oracle,
                               atol=1e-12)


def test_node2_contract_trace(kind, rng):
    # trace pair on one operand + a shared edge to the other
    mk = CHARGE_MAKERS[kind]
    c1, c2 = mk(rng, 4), mk(rng, 5)
    a = randn([Index(c1, False), Index(c1, True), Index(c2, False)],
              seed=7)
    b = randn([Index(c2, True)], seed=8)
    na, nb = Node(a), Node(b)
    na[0] ^ na[1]
    na[2] ^ nb[0]
    traced = contract_trace_edges(na)
    out = traced @ nb
    oracle = np.einsum("iik,k->", a.todense(), b.todense())
    val = out.tensor
    if isinstance(val, BlockSparseTensor):
        val = val.todense()
    np.testing.assert_allclose(np.asarray(val).reshape(()), oracle,
                               atol=1e-12)


def test_network_copy_reordered(kind, rng):
    a = _rand_bst(rng, kind, (5, 6, 4), (False, True, False), 9)
    b = randn([a.sparse_shape[1].copy().flip_flow(),
               a.sparse_shape[2].copy().flip_flow(),
               a.sparse_shape[0].copy().flip_flow()], seed=10)
    na, nb = Node(a), Node(b)
    na[1] ^ nb[0]
    na[2] ^ nb[1]
    na[0] ^ nb[2]
    mapping, _ = copy([na, nb])
    out = mapping[na] @ mapping[nb]
    oracle = np.tensordot(a.todense(), b.todense(),
                          [[1, 2, 0], [0, 1, 2]])
    val = out.tensor
    if isinstance(val, BlockSparseTensor):
        val = val.todense()
    np.testing.assert_allclose(np.asarray(val).reshape(()), oracle,
                               atol=1e-12)


def test_reorder_axes_matches_dense_transpose(kind, rng):
    t = _rand_bst(rng, kind, (4, 5, 3), (False, True, True), 11)
    node = Node(t)
    node.reorder_axes([2, 0, 1])
    np.testing.assert_allclose(node.tensor.todense(),
                               t.todense().transpose(2, 0, 1), atol=1e-12)


def test_flatten_edges_between_consistent_result(kind, rng):
    a = _rand_bst(rng, kind, (4, 5, 3), (False, True, False), 12)
    b = randn([a.sparse_shape[0].copy().flip_flow(),
               a.sparse_shape[1].copy().flip_flow(),
               a.sparse_shape[2].copy().flip_flow()], seed=13)
    oracle = np.tensordot(a.todense(), b.todense(),
                          [[0, 1, 2], [0, 1, 2]])
    na, nb = Node(a), Node(b)
    na[0] ^ nb[0]
    na[1] ^ nb[1]
    na[2] ^ nb[2]
    flatten_edges_between(na, nb)
    assert len(get_shared_edges(na, nb)) == 1
    out = na @ nb
    val = out.tensor
    if isinstance(val, BlockSparseTensor):
        val = val.todense()
    np.testing.assert_allclose(np.asarray(val).reshape(()), oracle,
                               atol=1e-12)


def test_split_node(kind, rng):
    t = _rand_bst(rng, kind, (5, 4, 6), (False, True, False), 14)
    node = Node(t)
    dense = t.todense().copy()
    left, right, s_rest = split_node(node, node.edges[:2],
                                     node.edges[2:])
    assert s_rest.shape == (0,)
    rec = contract_between(left, right)
    np.testing.assert_allclose(rec.tensor.todense(), dense, atol=1e-10)


def test_split_node_mixed_order(kind, rng):
    # split with a non-contiguous leg partition (reference
    # test_split_node_mixed_order)
    t = _rand_bst(rng, kind, (4, 5, 3, 4), (False, True, False, True),
                  15)
    node = Node(t)
    dense = t.todense().copy()
    left_edges = [node.edges[0], node.edges[2]]
    right_edges = [node.edges[1], node.edges[3]]
    left, right, _ = split_node(node, left_edges, right_edges)
    rec = contract_between(
        left, right,
        output_edge_order=[left.edges[0], right.edges[1],
                           left.edges[1], right.edges[2]])
    np.testing.assert_allclose(rec.tensor.todense(), dense, atol=1e-10)


def test_split_node_truncation_matches_blocksparse_svd(kind, rng):
    mk = CHARGE_MAKERS[kind]
    c = mk(rng, 8)
    t = randn([Index(c, False), Index(c.copy(), True)], seed=16)
    node = Node(t)
    k = 4
    left, right, s_rest = split_node(node, node.edges[:1],
                                     node.edges[1:],
                                     max_singular_values=k)
    from tensornetwork_tpu.blocksparse.linalg import truncated_svd
    U0, S0, V0, s_rest0 = truncated_svd(t, max_singular_values=k)
    np.testing.assert_allclose(np.sort(s_rest), np.sort(s_rest0),
                               atol=1e-10)
    rec = contract_between(left, right).tensor.todense()
    from tensornetwork_tpu.blocksparse.linalg import diag as bs_diag
    rec0 = bst.tensordot(bst.tensordot(U0, bs_diag(S0), [[1], [0]]),
                         V0, [[1], [0]]).todense()
    np.testing.assert_allclose(rec, rec0, atol=1e-10)


def test_svd_consistency(kind, rng):
    # U·S·V† == U·sqrt(S) · sqrt(S)·V† == original (reference
    # test_svd_consistency); same charge on both sides guarantees
    # populated sectors for every charge type
    mk = CHARGE_MAKERS[kind]
    c = mk(rng, 6)
    t = randn([Index(c, False), Index(c.copy(), True)], seed=17)
    node = Node(t)
    dense = t.todense().copy()
    u, s, vh, _ = split_node_full_svd(node, node.edges[:1],
                                      node.edges[1:])
    rec = contract_between(contract_between(u, s), vh)
    np.testing.assert_allclose(rec.tensor.todense(), dense, atol=1e-10)


def test_split_node_qr_isometry_and_reconstruction(kind, rng):
    t = _rand_bst(rng, kind, (5, 4, 6), (False, True, False), 18)
    node = Node(t)
    dense = t.todense().copy()
    q, r = split_node_qr(node, node.edges[:2], node.edges[2:])
    rec = contract_between(q, r)
    np.testing.assert_allclose(rec.tensor.todense(), dense, atol=1e-10)
    qm = q.tensor.reshape((20, q.tensor.shape[-1])).todense()
    np.testing.assert_allclose(qm.T @ qm, np.eye(qm.shape[1]),
                               atol=1e-10)


def test_split_node_rq_isometry_and_reconstruction(kind, rng):
    t = _rand_bst(rng, kind, (5, 4, 6), (False, True, False), 19)
    node = Node(t)
    dense = t.todense().copy()
    r, q = split_node_rq(node, node.edges[:1], node.edges[1:])
    rec = contract_between(r, q)
    np.testing.assert_allclose(rec.tensor.todense(), dense, atol=1e-10)
    qm = q.tensor.reshape((q.tensor.shape[0], 24)).todense()
    np.testing.assert_allclose(qm @ qm.T, np.eye(qm.shape[0]),
                               atol=1e-10)


def test_outer_product_blocksparse(kind, rng):
    a = _rand_bst(rng, kind, (4,), (False,), 20)
    b = _rand_bst(rng, kind, (5,), (True,), 21)
    na, nb = Node(a), Node(b)
    out = outer_product(na, nb)
    np.testing.assert_allclose(out.tensor.todense(),
                               np.outer(a.todense(), b.todense()),
                               atol=1e-12)


def test_conjugate_copy(kind, rng):
    t = _rand_bst(rng, kind, (4, 5), (False, True), 22)
    node = Node(t)
    c = node.copy(conjugate=True)
    np.testing.assert_allclose(c.tensor.todense(),
                               np.conj(t.todense()), atol=1e-12)


def test_mixed_dense_blocksparse_contraction_raises(rng):
    t = _rand_bst(rng, "u1", (4, 5), (False, True), 23)
    a = Node(t)
    b = Node(np.ones((5, 4)))
    a[1] ^ b[0]
    with pytest.raises(TypeError):
        a @ b


def test_ncon_graph_equivalence(kind, rng):
    # the ncon path and the Node-graph path must produce the same
    # contraction on BlockSparseTensors
    from tensornetwork_tpu.ops.ncon import ncon
    a = _rand_bst(rng, kind, (5, 6), (False, True), 24)
    b = randn([a.sparse_shape[1].copy().flip_flow(),
               Index(CHARGE_MAKERS[kind](rng, 4), True)], seed=25)
    via_ncon = ncon([a, b], [(-1, 1), (1, -2)])
    na, nb = Node(a), Node(b)
    na[1] ^ nb[0]
    via_graph = (na @ nb).tensor
    np.testing.assert_allclose(via_ncon.todense(), via_graph.todense(),
                               atol=1e-12)
