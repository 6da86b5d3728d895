"""Contractor tests (reference strategy:
``contractors/opt_einsum_paths/path_contractors_test.py`` and
``custom_path_solvers/*_test.py``)."""
import numpy as np
import pytest

import tensornetwork_tpu as tn
from tensornetwork_tpu.contractors import custom_path_solvers as cps
from tensornetwork_tpu.contractors import path_contractors
from tensornetwork_tpu.core.network import Node


def _chain(rng, n=6, d=4):
    nodes = [tn.Node(rng.standard_normal((d, d))) for _ in range(n)]
    for i in range(n - 1):
        nodes[i][1] ^ nodes[i + 1][0]
    oracle = np.linalg.multi_dot([np.asarray(x.tensor) for x in nodes])
    return nodes, oracle, (nodes[0][0], nodes[-1][1])


@pytest.mark.parametrize("contractor",
                         ["auto", "greedy", "optimal", "branch"])
def test_contractors_on_chain(rng, contractor):
    nodes, oracle, (eo0, eo1) = _chain(rng)
    fn = getattr(tn.contractors, contractor)
    out = fn(nodes, output_edge_order=[eo0, eo1])
    np.testing.assert_allclose(np.asarray(out.tensor), oracle, rtol=1e-8)


def test_contract_path_and_path_solver(rng):
    nodes, oracle, (eo0, eo1) = _chain(rng)
    path = tn.contractors.path_solver("greedy", nodes)
    out = tn.contractors.contract_path(path, nodes,
                                       output_edge_order=[eo0, eo1])
    np.testing.assert_allclose(np.asarray(out.tensor), oracle, rtol=1e-8)


def test_custom_contractor(rng):
    import opt_einsum
    nodes, oracle, (eo0, eo1) = _chain(rng, n=4)
    out = tn.contractors.custom(nodes, opt_einsum.paths.optimal,
                                output_edge_order=[eo0, eo1])
    np.testing.assert_allclose(np.asarray(out.tensor), oracle, rtol=1e-8)


def test_auto_single_node_with_trace(rng):
    t = rng.standard_normal((3, 4, 3))
    a = tn.Node(t)
    a[0] ^ a[2]
    out = tn.contractors.auto([a], output_edge_order=[a[1]])
    np.testing.assert_allclose(np.asarray(out.tensor),
                               np.einsum("iai->a", t), rtol=1e-10)


def test_bucket_contractor_sat_style(rng):
    # counting network: sum_x v1[x] v2[x] v3[x] via one COPY node
    vs = [rng.standard_normal(5) for _ in range(3)]
    nodes = [tn.Node(v) for v in vs]
    cn = tn.CopyNode(rank=3, dimension=5)
    for i, nd in enumerate(nodes):
        nd[0] ^ cn[i]
    remaining = tn.contractors.bucket(nodes + [cn], [cn])
    assert len(remaining) == 1
    np.testing.assert_allclose(float(remaining[0].tensor),
                               np.sum(vs[0] * vs[1] * vs[2]), rtol=1e-10)


# -- custom path solvers -----------------------------------------------------


def test_greedy_solvers_on_chain():
    # 4-tensor chain with bond dims 10: adjacency in log10
    n = 4
    log_adj = np.zeros((n, n))
    for i in range(n - 1):
        log_adj[i, i + 1] = log_adj[i + 1, i] = 1.0  # bond dim 10
    log_adj[0, 0] = 1.0   # open edge on first
    log_adj[n - 1, n - 1] = 1.0
    for solver in (cps.greedy_size_solve, cps.greedy_cost_solve):
        order, cost = solver(log_adj)
        assert order.shape == (2, n - 1)
        # chain contraction cost: each step is 10^3 -> total 3*10^3
        np.testing.assert_allclose(10 ** cost, 3000.0, rtol=1e-8)


def test_full_solve_matches_greedy_on_easy_case():
    n = 4
    log_adj = np.zeros((n, n))
    for i in range(n - 1):
        log_adj[i, i + 1] = log_adj[i + 1, i] = 1.0
    log_adj[0, 0] = 1.0
    log_adj[n - 1, n - 1] = 1.0
    order, cost, is_optimal = cps.full_solve_complete(log_adj)
    assert is_optimal
    _, greedy_cost = cps.greedy_cost_solve(log_adj)
    assert cost <= greedy_cost + 1e-12


def test_full_solve_beats_bad_greedy():
    # star network where greedy-by-cost is suboptimal: optimal must be <=
    n = 4
    rng = np.random.default_rng(0)
    log_adj = np.zeros((n, n))
    log_adj[0, 1] = log_adj[1, 0] = 2.0
    log_adj[1, 2] = log_adj[2, 1] = 1.0
    log_adj[2, 3] = log_adj[3, 2] = 2.0
    log_adj[0, 0] = 0.5
    log_adj[3, 3] = 0.5
    order, cost, is_optimal = cps.full_solve_complete(log_adj)
    assert is_optimal
    for solver in (cps.greedy_size_solve, cps.greedy_cost_solve):
        _, gcost = solver(log_adj)
        assert cost <= gcost + 1e-12


def test_ncon_solver_end_to_end(rng):
    tensors = [rng.standard_normal((8, 2)),
               rng.standard_normal((8, 2, 4)),
               rng.standard_normal((4, 2))]
    labels = [(1, -1), (1, -2, 2), (2, -3)]
    con_order, cost, is_optimal = cps.ncon_solver(tensors, labels)
    assert sorted(con_order.tolist()) == [1, 2]
    out = tn.ncon(tensors, labels, con_order=con_order.tolist())
    oracle = np.einsum("ba,bcd,de->ace", *tensors)
    np.testing.assert_allclose(np.asarray(out), oracle, rtol=1e-10)
    # cost check agrees with the plan's FLOP model
    c = cps.ncon_cost_check(tensors, labels, con_order.tolist())
    assert c > 0


def test_ncon_to_adj():
    tensors = [np.ones((10, 100)), np.ones((100, 10))]
    labels = [(-1, 1), (1, -2)]
    adj = cps.ncon_to_adj(tensors, labels)
    np.testing.assert_allclose(adj[0, 1], 2.0)   # shared dim 100
    np.testing.assert_allclose(adj[0, 0], 1.0)   # open dim 10


# ---------------------------------------------------------------------------
# Native (C++) exact-optimal scheduler
# ---------------------------------------------------------------------------


def test_native_solver_available():
    from tensornetwork_tpu import native
    assert native.available(), "C++ path solver must build in this env"


def test_native_full_solve_matches_python_bnb(rng):
    """Native DP >= as good as the Python branch-and-bound, and the
    returned order replays to the claimed cost."""
    from tensornetwork_tpu.contractors.custom_path_solvers import (
        full_solve_complete, _pair_cost, _contract_rows, _log10_sum)

    def replay(A, order):
        costs, adj = [], A.copy()
        for (i, j) in order.T:
            costs.append(_pair_cost(adj, i, j))
            adj = _contract_rows(adj, int(i), int(j))
        return _log10_sum(costs)

    for trial in range(6):
        n = int(rng.integers(4, 8))
        A = np.zeros((n, n))
        for i in range(1, n):
            j = int(rng.integers(0, i))
            A[i, j] = A[j, i] = np.log10(float(rng.integers(2, 32)))
        o1, c1, opt1 = full_solve_complete(A)            # native
        o2, c2, _ = full_solve_complete(A, cost_bound=1e9)  # python bnb
        assert opt1
        assert abs(replay(A, o1) - c1) < 1e-9
        assert c1 <= c2 + 1e-9


def test_native_solver_large_network():
    """n=14 exact solve completes fast (Python B&B cannot reach n=10)."""
    import time
    rng2 = np.random.default_rng(7)
    n = 14
    A = np.zeros((n, n))
    for i in range(1, n):
        j = int(rng2.integers(0, i))
        A[i, j] = A[j, i] = np.log10(float(rng2.integers(2, 64)))
    from tensornetwork_tpu.contractors.custom_path_solvers import (
        full_solve_complete)
    t0 = time.perf_counter()
    o, c, opt = full_solve_complete(A)
    assert opt and time.perf_counter() - t0 < 30
    assert o.shape == (2, n - 1)


def test_native_optimal_path_via_contractor(rng):
    """The auto contractor produces correct results through the native
    path on a 6-node ring with unequal bond dims (where greedy can be
    suboptimal but any valid path must be exact)."""
    import tensornetwork_tpu as tn
    from tensornetwork_tpu.contractors import auto
    n = 6
    dims = [2, 3, 4, 2, 5, 3]
    tensors = [rng.standard_normal((dims[i], dims[(i + 1) % n]))
               for i in range(n)]
    nodes = [tn.Node(t) for t in tensors]
    for i in range(n):
        tn.connect(nodes[i][1], nodes[(i + 1) % n][0])
    out = auto(nodes)
    oracle = np.trace(np.linalg.multi_dot(tensors))
    np.testing.assert_allclose(float(np.asarray(out.tensor)), oracle,
                               rtol=1e-6)


def test_native_path_respects_opt_einsum_convention():
    from tensornetwork_tpu.ops.paths import native_optimal_path
    import opt_einsum
    # chain a-b-c-d: native path must be usable by opt_einsum machinery
    input_sets = [{"a", "b"}, {"b", "c"}, {"c", "d"}, {"d", "e"}]
    output_set = {"a", "e"}
    size_dict = {"a": 2, "b": 50, "c": 2, "d": 50, "e": 2}
    path = native_optimal_path(input_sets, output_set, size_dict)
    assert path is not None and len(path) == 3
    # replaying the path must keep indices in range at every step
    cur = len(input_sets)
    for (i, j) in path:
        assert 0 <= i < j < cur
        cur -= 1


# ---------------------------------------------------------------------------
# Reference scenario ports (behavioral, re-written): contractor corner
# cases from /root/reference/tensornetwork/contractors/opt_einsum_paths/
# path_contractors_node_test.py (VERDICT r4 item 5).
# ---------------------------------------------------------------------------

_ALGS = [path_contractors.optimal, path_contractors.branch,
         path_contractors.greedy, path_contractors.auto]
_ALG_IDS = ["optimal", "branch", "greedy", "auto"]


@pytest.mark.parametrize("alg", _ALGS, ids=_ALG_IDS)
def test_ref_sanity_network(alg):
    # reference test_sanity_check: 4-node network -> (13,) output
    a = Node(np.eye(2))
    b = Node(np.ones((2, 7, 11)))
    c = Node(np.ones((7, 11, 13, 2)))
    d = Node(np.eye(13))
    a[0] ^ b[0]
    b[1] ^ c[0]
    b[2] ^ c[1]
    c[2] ^ d[1]
    c[3] ^ a[1]
    out = alg([a, b, c, d])
    assert out.shape == (13,)


@pytest.mark.parametrize("alg", _ALGS, ids=_ALG_IDS)
def test_ref_trace_edge_network(alg):
    # reference test_trace_edge: network with a trace edge -> ones * 32
    a = Node(np.ones((2, 2, 2, 2, 2)))
    b = Node(np.ones((2, 2, 2)))
    c = Node(np.ones((2, 2, 2)))
    a[0] ^ a[1]
    a[2] ^ b[0]
    a[3] ^ c[0]
    b[1] ^ c[1]
    b[2] ^ c[2]
    out = alg([a, b, c])
    np.testing.assert_allclose(np.asarray(out.tensor), np.ones(2) * 32.0)


@pytest.mark.parametrize("alg", _ALGS, ids=_ALG_IDS)
def test_ref_subgraph_contraction(alg):
    # reference test_subgraph_contraction: contract a subset, then finish
    a_t = np.arange(4).reshape((2, 2)).astype(np.float64)
    b_t = a_t + 10
    c_t = a_t + 20
    a, b, c = Node(a_t), Node(b_t), Node(c_t)
    a[0] ^ b[1]
    c[1] ^ b[0]
    remaining = [c[0], a[1]]
    result = alg({a, b}, [b[0], a[1]])
    np.testing.assert_allclose(np.asarray(result.tensor), b_t @ a_t)
    final = (c @ result).reorder_edges(remaining)
    np.testing.assert_allclose(np.asarray(final.tensor), c_t @ b_t @ a_t)


@pytest.mark.parametrize("alg", _ALGS, ids=_ALG_IDS)
def test_ref_multiple_partial_contractions(alg):
    a_t = np.arange(4).reshape((2, 2)).astype(np.float64)
    b_t, c_t, d_t = a_t + 10, a_t + 20, a_t + 30
    a, b, c, d = Node(a_t), Node(b_t), Node(c_t), Node(d_t)
    a[1] ^ b[0]
    b[1] ^ c[0]
    c[1] ^ d[0]
    d[1] ^ a[0]
    ab = alg({a, b}, [a[0], b[1]])
    np.testing.assert_allclose(np.asarray(ab.tensor), a_t @ b_t)
    cd = alg({c, d}, [c[0], d[1]])
    np.testing.assert_allclose(np.asarray(cd.tensor), c_t @ d_t)
    result = alg({ab, cd})
    np.testing.assert_allclose(np.asarray(result.tensor),
                               np.trace(a_t @ b_t @ c_t @ d_t))


@pytest.mark.parametrize("alg", _ALGS, ids=_ALG_IDS)
def test_ref_single_node_reorder(alg):
    a = Node(np.arange(4).reshape((2, 2)).astype(np.float64))
    expected = [a[1], a[0]]
    result = alg({a}, expected)
    assert result.edges == expected
    np.testing.assert_allclose(np.asarray(result.tensor),
                               np.arange(4).reshape((2, 2)).T)


@pytest.mark.parametrize("alg", _ALGS, ids=_ALG_IDS)
def test_ref_ignore_edge_order(alg):
    a = Node(np.ones((1, 1, 1)))
    b = Node(np.ones((1, 1, 1, 2, 3)))
    a[0] ^ b[0]
    a[1] ^ b[1]
    a[2] ^ b[2]
    e0, e1 = b[3], b[4]
    out = alg({a, b}, ignore_edge_order=True)
    assert set(out.edges) == {e0, e1}
    # and with an (ignored) explicit order
    a2 = Node(np.ones((1, 1, 1)))
    b2 = Node(np.ones((1, 1, 1, 2, 3)))
    a2[0] ^ b2[0]
    a2[1] ^ b2[1]
    a2[2] ^ b2[2]
    out2 = alg({a2, b2}, [b2[4], b2[3]], ignore_edge_order=True)
    assert set(out2.edges) == {b2[3], b2[4]}


@pytest.mark.parametrize("alg", _ALGS, ids=_ALG_IDS)
def test_ref_disconnected_network(alg):
    # reference test_disconnected_network: 3 disconnected pairs + chain
    ns = [Node(np.eye(2)) for _ in range(7)]
    a, b, c, d, e, f, g = ns
    a[1] ^ b[0]
    c[0] ^ d[1]
    e[0] ^ f[0]
    g[0] ^ f[1]
    final_edges = [a[0], b[1], c[1], d[0], e[1], g[1]]
    result = alg(set(ns), final_edges)
    assert result.edges == final_edges


def test_ref_auto_passes_ignore_edge_order():
    # reference test_passes_ignore_edge_order_from_auto: the n in [5, 7)
    # branch of auto must forward ignore_edge_order
    ns = [Node(np.eye(2)) for _ in range(5)]
    a, b, c, d, e = ns
    a[1] ^ b[0]
    c[0] ^ d[1]
    c[1] ^ e[0]
    path_contractors.auto(ns, ignore_edge_order=True)


def test_ref_custom_optimizer_object():
    # reference test_custom_sanity_check: a stateful PathOptimizer object
    a = Node(np.ones(2))
    b = Node(np.ones((2, 5)))
    a[0] ^ b[0]

    class PathOptimizer:
        def __call__(self, inputs, output, size_dict, memory_limit=None):
            return [(0, 1)]

    out = path_contractors.custom([a, b], PathOptimizer())
    np.testing.assert_allclose(np.asarray(out.tensor), np.ones(5) * 2.0)


@pytest.mark.parametrize("alg", _ALGS, ids=_ALG_IDS)
def test_ref_single_node_trace_only(alg):
    a = Node(np.ones((2, 2, 2)))
    a[0] ^ a[1]
    out = alg([a])
    np.testing.assert_allclose(np.asarray(out.tensor), np.ones(2) * 2.0)


def test_contract_path_raises_on_bad_path():
    a = Node(np.ones((2, 2)))
    b = Node(np.ones((2, 2)))
    a[0] ^ b[0]
    with pytest.raises((ValueError, IndexError)):
        path_contractors.contract_path([(0, 7)], {a, b}, [a[1], b[1]])
