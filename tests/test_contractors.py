"""Contractor tests (reference strategy:
``contractors/opt_einsum_paths/path_contractors_test.py`` and
``custom_path_solvers/*_test.py``)."""
import numpy as np
import pytest

import tensornetwork_tpu as tn
from tensornetwork_tpu.contractors import custom_path_solvers as cps


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
