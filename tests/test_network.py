"""Graph-core tests vs numpy oracles (reference strategy:
``tensornetwork/tests/network_components_free_test.py``)."""
import jax.numpy as jnp
import numpy as np
import pytest

import tensornetwork_tpu as tn


def test_connect_and_contract(rng):
    a = tn.Node(rng.standard_normal((3, 4)), name="a")
    b = tn.Node(rng.standard_normal((4, 5)), name="b")
    e = a[1] ^ b[0]
    c = tn.contract(e)
    np.testing.assert_allclose(np.asarray(c.tensor),
                               np.asarray(a.tensor) @ np.asarray(b.tensor),
                               rtol=1e-10)
    assert len(c.edges) == 2


def test_matmul_operator(rng):
    a = tn.Node(rng.standard_normal((3, 4)))
    b = tn.Node(rng.standard_normal((4, 5)))
    a[1] ^ b[0]
    c = a @ b
    np.testing.assert_allclose(np.asarray(c.tensor),
                               np.asarray(a.tensor) @ np.asarray(b.tensor),
                               rtol=1e-10)


def test_trace_edge_contract(rng):
    t = rng.standard_normal((4, 3, 4))
    a = tn.Node(t)
    e = a[0] ^ a[2]
    c = tn.contract(e)
    np.testing.assert_allclose(np.asarray(c.tensor),
                               np.einsum("iai->a", t), rtol=1e-10)


def test_contract_between_multiple_shared(rng):
    t1 = rng.standard_normal((3, 4, 5))
    t2 = rng.standard_normal((4, 3, 6))
    a, b = tn.Node(t1), tn.Node(t2)
    a[0] ^ b[1]
    a[1] ^ b[0]
    c = tn.contract_between(a, b)
    np.testing.assert_allclose(np.asarray(c.tensor),
                               np.einsum("abk,bam->km", t1, t2), rtol=1e-10)


def test_contract_single_edge_leaves_trace(rng):
    t1 = rng.standard_normal((3, 4))
    t2 = rng.standard_normal((4, 3))
    a, b = tn.Node(t1), tn.Node(t2)
    e1 = a[1] ^ b[0]
    e2 = a[0] ^ b[1]
    c = tn.contract(e1)
    # remaining shared edge became a trace edge on c
    assert any(e.is_trace() for e in c.edges)
    out = tn.contract_between(c, c)
    np.testing.assert_allclose(float(out.tensor),
                               np.einsum("ab,ba->", t1, t2), rtol=1e-10)


def test_outer_product(rng):
    a = tn.Node(rng.standard_normal((2, 3)))
    b = tn.Node(rng.standard_normal((4,)))
    c = tn.outer_product(a, b)
    assert c.shape == (2, 3, 4)


def test_connect_dim_mismatch(rng):
    a = tn.Node(rng.standard_normal((3, 4)))
    b = tn.Node(rng.standard_normal((5, 6)))
    with pytest.raises(ValueError):
        a[1] ^ b[0]


def test_disconnect(rng):
    a = tn.Node(rng.standard_normal((3,)))
    b = tn.Node(rng.standard_normal((3,)))
    e = a[0] ^ b[0]
    e1, e2 = tn.disconnect(e)
    assert e1.is_dangling() and e2.is_dangling()
    assert a[0] is e1 and b[0] is e2


def test_reorder_edges(rng):
    t = rng.standard_normal((2, 3, 4))
    a = tn.Node(t)
    e0, e1, e2 = a[0], a[1], a[2]
    a.reorder_edges([e2, e0, e1])
    assert a.shape == (4, 2, 3)
    np.testing.assert_allclose(np.asarray(a.tensor),
                               np.transpose(t, (2, 0, 1)), rtol=1e-12)
    assert a[0] is e2 and a[1] is e0 and a[2] is e1


def test_flatten_edges_between(rng):
    t1 = rng.standard_normal((3, 4, 5))
    t2 = rng.standard_normal((4, 3, 6))
    a, b = tn.Node(t1), tn.Node(t2)
    a[0] ^ b[1]
    a[1] ^ b[0]
    e = tn.flatten_edges_between(a, b)
    assert e.dimension == 12
    c = tn.contract(e)
    np.testing.assert_allclose(np.asarray(c.tensor),
                               np.einsum("abk,bam->km", t1, t2), rtol=1e-10)


def test_split_edge(rng):
    t1 = rng.standard_normal((6, 5))
    t2 = rng.standard_normal((6, 4))
    a, b = tn.Node(t1), tn.Node(t2)
    e = a[0] ^ b[0]
    edges = tn.split_edge(e, (2, 3))
    assert len(edges) == 2
    c = tn.contract_between(a, b)
    np.testing.assert_allclose(np.asarray(c.tensor),
                               np.einsum("ab,am->bm", t1, t2), rtol=1e-10)


def test_slice_edge(rng):
    t1 = rng.standard_normal((6, 5))
    t2 = rng.standard_normal((6, 4))
    a, b = tn.Node(t1), tn.Node(t2)
    e = a[0] ^ b[0]
    tn.slice_edge(e, 1, 3)
    c = tn.contract(e)
    np.testing.assert_allclose(np.asarray(c.tensor),
                               np.einsum("ab,am->bm", t1[1:4], t2[1:4]),
                               rtol=1e-10)


def test_copy_node_star_contraction(rng):
    # COPY node of rank 3 joining three vectors = generalized diagonal sum
    vs = [rng.standard_normal(4) for _ in range(3)]
    nodes = [tn.Node(v) for v in vs]
    cn = tn.CopyNode(rank=3, dimension=4)
    for i in range(3):
        nodes[i][0] ^ cn[i]
    result = tn.contract_copy_node(cn)
    np.testing.assert_allclose(float(result.tensor),
                               np.sum(vs[0] * vs[1] * vs[2]), rtol=1e-10)


def test_copy_node_tensor():
    cn = tn.CopyNode(rank=2, dimension=3)
    np.testing.assert_allclose(np.asarray(cn.tensor), np.eye(3), rtol=1e-12)


def test_node_arithmetic(rng):
    a = tn.Node(rng.standard_normal((2, 2)))
    b = tn.Node(rng.standard_normal((2, 2)))
    np.testing.assert_allclose(np.asarray((a + b).tensor),
                               np.asarray(a.tensor) + np.asarray(b.tensor))
    np.testing.assert_allclose(np.asarray((a * 2.0).tensor),
                               np.asarray(a.tensor) * 2)


def test_reachable_and_check(rng):
    a = tn.Node(rng.standard_normal((2, 2)))
    b = tn.Node(rng.standard_normal((2, 2)))
    c = tn.Node(rng.standard_normal((2, 2)))
    a[1] ^ b[0]
    assert tn.reachable(a) == {a, b}
    tn.check_correct([a, b])
    with pytest.raises(ValueError):
        tn.check_connected([a, b, c])


def test_copy_subnetwork(rng):
    a = tn.Node(rng.standard_normal((3, 4)), name="a")
    b = tn.Node(rng.standard_normal((4, 5)), name="b")
    e = a[1] ^ b[0]
    node_map, edge_map = tn.copy([a, b])
    assert node_map[a] is not a
    assert not edge_map[e].is_dangling()
    # conjugate copy
    ca = tn.Node(rng.standard_normal((2,)) + 1j * rng.standard_normal((2,)))
    cmap, _ = tn.copy([ca], conjugate=True)
    np.testing.assert_allclose(np.asarray(cmap[ca].tensor),
                               np.conj(np.asarray(ca.tensor)))


def test_split_node_svd(rng):
    t = rng.standard_normal((4, 5, 6))
    a = tn.Node(t)
    e0, e1, e2 = a[0], a[1], a[2]
    left, right, s_rest = tn.split_node(a, [e0, e1], [e2])
    merged = tn.contract_between(left, right)
    merged.reorder_edges([e0, e1, e2])
    np.testing.assert_allclose(np.asarray(merged.tensor), t, atol=1e-10)


def test_split_node_truncated(rng):
    t = rng.standard_normal((8, 8))
    a = tn.Node(t)
    left, right, s_rest = tn.split_node(a, [a[0]], [a[1]],
                                        max_singular_values=3)
    assert left.shape == (8, 3)
    assert right.shape == (3, 8)
    assert s_rest.shape == (5,)


def test_split_node_qr_rq(rng):
    t = rng.standard_normal((4, 5, 6))
    a = tn.Node(t)
    e0, e1, e2 = a[0], a[1], a[2]
    q, r = tn.split_node_qr(a, [e0, e1], [e2])
    merged = tn.contract_between(q, r)
    merged.reorder_edges([e0, e1, e2])
    np.testing.assert_allclose(np.asarray(merged.tensor), t, atol=1e-10)

    a2 = tn.Node(t)
    f0, f1, f2 = a2[0], a2[1], a2[2]
    r2, q2 = tn.split_node_rq(a2, [f0], [f1, f2])
    merged2 = tn.contract_between(r2, q2)
    merged2.reorder_edges([f0, f1, f2])
    np.testing.assert_allclose(np.asarray(merged2.tensor), t, atol=1e-10)


def test_split_node_full_svd(rng):
    t = rng.standard_normal((6, 6))
    a = tn.Node(t)
    e0, e1 = a[0], a[1]
    u, s, vh, _ = tn.split_node_full_svd(a, [e0], [e1])
    m = tn.contract_between(tn.contract_between(u, s), vh)
    m.reorder_edges([e0, e1])
    np.testing.assert_allclose(np.asarray(m.tensor), t, atol=1e-10)


def test_json_roundtrip(rng):
    a = tn.Node(rng.standard_normal((3, 4)), name="a")
    b = tn.Node(rng.standard_normal((4, 5)), name="b")
    e = a[1] ^ b[0]
    e.set_name("bond")
    s = tn.nodes_to_json([a, b], edge_binding={"the_bond": e})
    nodes, bindings = tn.nodes_from_json(s)
    assert [n.name for n in nodes] == ["a", "b"]
    assert len(bindings["the_bond"]) == 1
    c = tn.contract(bindings["the_bond"][0])
    np.testing.assert_allclose(np.asarray(c.tensor),
                               np.asarray(a.tensor) @ np.asarray(b.tensor),
                               rtol=1e-10)


def test_node_collection(rng):
    collected = []
    with tn.NodeCollection(collected):
        a = tn.Node(rng.standard_normal((2,)))
        b = tn.Node(rng.standard_normal((2,)))
    assert collected == [a, b]


def test_reduced_density(rng):
    # 3-qubit state, trace out qubit 2 -> 2-qubit density matrix
    psi = rng.standard_normal((2, 2, 2))
    psi /= np.linalg.norm(psi)
    node = tn.Node(psi)
    node_map, edge_map = tn.reduced_density([node[2]])
    rho_net = tn.contractors.greedy(
        list(tn.reachable(node)),
        output_edge_order=[node[0], node[1],
                           node_map[node][0], node_map[node][1]])
    rho = np.asarray(rho_net.tensor).reshape(4, 4)
    oracle = np.einsum("abk,cdk->abcd", psi, psi).reshape(4, 4)
    np.testing.assert_allclose(rho, oracle, atol=1e-10)


def test_copy_node_copy_preserves_type():
    cn = tn.CopyNode(rank=3, dimension=2, name="c")
    c2 = cn.copy()
    assert isinstance(c2, tn.CopyNode)
    assert c2._tensor is None  # still lazy


def test_reorder_edges_trace_raises(rng):
    a = tn.Node(rng.standard_normal((2, 3, 2)))
    a[0] ^ a[2]
    with pytest.raises(ValueError):
        a.reorder_edges([a[1], a[0], a[2]])


def test_json_boundary_edge_either_orientation(rng):
    inside = tn.Node(rng.standard_normal((3,)), name="in")
    outside = tn.Node(rng.standard_normal((3,)), name="out")
    # edge created with the OUTSIDE node as node1
    tn.connect(outside[0], inside[0])
    s = tn.nodes_to_json([inside])
    nodes, _ = tn.nodes_from_json(s)
    assert nodes[0].edges[0].is_dangling()


def test_quantum_identity_elimination_after_composition(rng):
    # CopyNode type now survives copying, so identities are eliminated
    from tensornetwork_tpu.quantum import identity, QuOperator
    a = rng.standard_normal((2, 2))
    op = QuOperator.from_tensor(a, [0], [1])
    composed = op @ identity([2]) @ identity([2])
    np.testing.assert_allclose(np.asarray(composed.eval()), a, rtol=1e-10)
    # after contract(), the rank-2 copy nodes were spliced out
    assert not any(isinstance(n, tn.CopyNode) for n in composed.nodes)


def test_get_neighbors():
    # reference ``network_operations.py:823`` semantics: deduplicated,
    # excludes self (even via trace edges)
    import numpy as np
    import tensornetwork_tpu as tn
    a = tn.Node(np.ones((2, 2, 2, 2)), name="a")
    b = tn.Node(np.ones((2, 2)), name="b")
    c = tn.Node(np.ones((2,)), name="c")
    a[0] ^ b[0]
    a[1] ^ b[1]       # second edge to the same neighbor -> dedup
    a[2] ^ a[3]       # trace edge -> ignored
    b_neighbors = tn.get_neighbors(b)
    assert b_neighbors == [a]
    assert tn.get_neighbors(a) == [b]
    assert tn.get_neighbors(c) == []


def test_outer_product_final_nodes():
    import numpy as np
    import pytest
    import tensornetwork_tpu as tn
    a = tn.Node(np.random.default_rng(0).standard_normal((2, 3)))
    b = tn.Node(np.random.default_rng(1).standard_normal((4,)))
    out = tn.outer_product_final_nodes([a, b], a.edges + b.edges)
    assert out.shape == (2, 3, 4)
    np.testing.assert_allclose(
        np.asarray(out.tensor),
        np.einsum("ij,k->ijk", np.asarray(a.tensor), np.asarray(b.tensor)))
    # non-dangling edge -> error
    c = tn.Node(np.ones((2, 2)))
    d = tn.Node(np.ones((2,)))
    c[0] ^ d[0]
    with pytest.raises(ValueError):
        tn.outer_product_final_nodes([c], c.edges)
