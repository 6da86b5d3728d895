"""ncon engine tests against numpy einsum oracles.

Mirrors the reference's test strategy (reference
``tensornetwork/tests/ncon_interface_test.py``): every contraction is checked
against a numpy einsum / tensordot oracle.
"""
import numpy as np
import pytest

from tensornetwork_tpu import ncon
from tensornetwork_tpu.ops.ncon import (
    canonicalize_structure, check_network, compile_plan)


def randc(rng, *shape):
    return rng.standard_normal(shape)


def test_matmul(rng):
    a = randc(rng, 4, 5)
    b = randc(rng, 5, 6)
    out = ncon([a, b], [(-1, 1), (1, -2)])
    np.testing.assert_allclose(out, a @ b, rtol=1e-10)


def test_trace(rng):
    a = randc(rng, 5, 5)
    out = ncon([a], [(1, 1)])
    np.testing.assert_allclose(out, np.trace(a), rtol=1e-10)


def test_partial_trace(rng):
    a = randc(rng, 3, 5, 5, 4)
    out = ncon([a], [(-1, 1, 1, -2)])
    np.testing.assert_allclose(out, np.einsum("aiib->ab", a), rtol=1e-10)


def test_outer_product(rng):
    a = randc(rng, 3)
    b = randc(rng, 4)
    out = ncon([a, b], [(-1,), (-2,)])
    np.testing.assert_allclose(out, np.outer(a, b), rtol=1e-10)


def test_sum_lone_label(rng):
    # positive label appearing once => summed over
    a = randc(rng, 3, 4)
    out = ncon([a], [(-1, 1)])
    np.testing.assert_allclose(out, a.sum(axis=1), rtol=1e-10)


def test_out_order_default_and_custom(rng):
    a = randc(rng, 3, 4, 5)
    b = randc(rng, 5, 6)
    out = ncon([a, b], [(-1, -2, 1), (1, -3)])
    np.testing.assert_allclose(out, np.einsum("abk,kc->abc", a, b), rtol=1e-10)
    out2 = ncon([a, b], [(-1, -2, 1), (1, -3)], out_order=[-3, -1, -2])
    np.testing.assert_allclose(out2, np.einsum("abk,kc->cab", a, b),
                               rtol=1e-10)


def test_con_order(rng):
    a = randc(rng, 3, 4)
    b = randc(rng, 4, 5)
    c = randc(rng, 5, 6)
    oracle = np.einsum("ab,bc,cd->ad", a, b, c)
    for order in ([1, 2], [2, 1]):
        out = ncon([a, b, c], [(-1, 1), (1, 2), (2, -2)], con_order=order)
        np.testing.assert_allclose(out, oracle, rtol=1e-10)


def test_solver_con_order(rng):
    a = randc(rng, 3, 4)
    b = randc(rng, 4, 5)
    c = randc(rng, 5, 6)
    oracle = np.einsum("ab,bc,cd->ad", a, b, c)
    for method in ("greedy", "optimal"):
        out = ncon([a, b, c], [(-1, 1), (1, 2), (2, -2)], con_order=method)
        np.testing.assert_allclose(out, oracle, rtol=1e-10)


def test_batch_label_three_tensors(rng):
    # positive label appearing 3x => generalized einsum diagonal+sum
    a = randc(rng, 7, 3)
    b = randc(rng, 7, 4)
    c = randc(rng, 7, 3, 4)
    oracle = np.einsum("ba,bc,bac->", a, b, c)
    out = ncon([a, b, c], [(1, 2), (1, 3), (1, 2, 3)])
    np.testing.assert_allclose(out, oracle, rtol=1e-10)


def test_open_batch_label(rng):
    # negative label appearing twice => batched output dim
    a = randc(rng, 7, 3, 5)
    b = randc(rng, 7, 5, 4)
    oracle = np.einsum("bik,bkj->bij", a, b)
    out = ncon([a, b], [(-1, -2, 1), (-1, 1, -3)])
    np.testing.assert_allclose(out, oracle, rtol=1e-10)


def test_mps_inner_product(rng):
    # MPS inner product (the BASELINE config runs 20 sites in bench.py)
    n, chi, d = 10, 16, 2
    mps = [randc(rng, 1, d, chi)] + [
        randc(rng, chi, d, chi) for _ in range(n - 2)] + [randc(rng, chi, d, 1)]
    labels_ket = []
    labels_bra = []
    for i in range(n):
        left = 1000 + i
        right = 1000 + i + 1
        phys = 2000 + i
        labels_ket.append((left, phys, right))
        labels_bra.append((3000 + i, phys, 3000 + i + 1))
    # connect boundary bonds between ket and bra (dim-1 bonds)
    labels_bra[0] = (1000, 2000, 3001)
    labels_bra[-1] = (3000 + n - 1, 2000 + n - 1, 1000 + n)
    out = ncon(mps + [np.conj(m) for m in mps], labels_ket + labels_bra,
               con_order="greedy")
    # oracle: contract as full state
    psi = mps[0].reshape(d, chi)
    for i in range(1, n):
        psi = np.tensordot(psi, mps[i], axes=[[-1], [0]])
    psi = psi.reshape(-1)
    np.testing.assert_allclose(out, np.vdot(psi, psi), rtol=1e-8)


def test_string_labels(rng):
    a = randc(rng, 4, 5)
    b = randc(rng, 5, 6)
    out = ncon([a, b], [("-o1", "k"), ("k", "-o2")])
    np.testing.assert_allclose(out, a @ b, rtol=1e-10)


def test_mixed_string_int_labels(rng):
    a = randc(rng, 4, 5, 3)
    b = randc(rng, 5, 6)
    c = randc(rng, 3, 6)
    oracle = np.einsum("aki,kc,ic->a", a, b, c)
    out = ncon([a, b, c], [(-1, 1, "i"), (1, 2), ("i", 2)])
    np.testing.assert_allclose(out, oracle, rtol=1e-10)


def test_canonicalize_structure():
    structure, mapping = canonicalize_structure(
        [(-1, 1, "x"), ("x", "-out")])
    assert structure[0][0] == -1
    assert structure[0][1] == 1
    assert structure[0][2] == structure[1][0] > 1
    assert structure[1][1] < -1


def test_check_network_errors(rng):
    a = np.ones((3, 4))
    with pytest.raises(ValueError):
        ncon([a], [(-1, -2, -3)])  # rank mismatch
    with pytest.raises(ValueError):
        ncon([a, a], [(-1, 1), (1, -2)], con_order=[1, 2])  # bad con_order
    with pytest.raises(ValueError):
        ncon([a, a], [(-1, 1), (1, -2)], out_order=[-1])  # bad out_order
    with pytest.raises(ValueError):
        ncon([np.ones((3, 4)), np.ones((5, 6))], [(-1, 1), (1, -2)])  # dims


def test_no_jit_path(rng):
    a = randc(rng, 4, 5)
    b = randc(rng, 5, 6)
    out = ncon([a, b], [(-1, 1), (1, -2)], jit=False)
    np.testing.assert_allclose(out, a @ b, rtol=1e-10)


def test_plan_flops():
    plan = compile_plan(((-1, 1), (1, -2)))
    assert plan.flops([(4, 5), (5, 6)]) == 2 * 4 * 5 * 6


def test_disconnected_network(rng):
    a = randc(rng, 3, 4)
    b = randc(rng, 4)
    c = randc(rng, 2)
    oracle = np.einsum("ab,b,c->ac", a, b, c)
    out = ncon([a, b, c], [(-1, 1), (1,), (-2,)])
    np.testing.assert_allclose(out, oracle, rtol=1e-10)


def test_scalar_result_chain(rng):
    a = randc(rng, 3, 4)
    b = randc(rng, 4, 3)
    out = ncon([a, b], [(1, 2), (2, 1)])
    np.testing.assert_allclose(out, np.einsum("ab,ba->", a, b), rtol=1e-10)


def test_many_tensor_ring(rng):
    tensors = [randc(rng, 3, 3) for _ in range(8)]
    labels = [(i + 1, (i + 1) % 8 + 1) for i in range(8)]
    oracle = np.trace(np.linalg.multi_dot(tensors))
    out = ncon(tensors, labels)
    np.testing.assert_allclose(out, oracle, rtol=1e-8)


def test_plan_flops_with_trace():
    # trace steps must drop the summed diagonal axes in the cost model
    plan = compile_plan(((1, 1, 2), (2, -1)))
    # trace of (5,5,3) ~ 75 ops, then (3,)x(3,4) pair = 2*3*4 = 24
    assert plan.flops([(5, 5, 3), (3, 4)]) == 75 + 24


def test_ncon_accepts_nodes_and_tensors(rng):
    import tensornetwork_tpu as tn
    a = rng.standard_normal((3, 4))
    b = rng.standard_normal((4, 5))
    out = ncon([tn.Node(a), tn.Tensor(b)], [(-1, 1), (1, -2)])
    np.testing.assert_allclose(np.asarray(out), a @ b, rtol=1e-10)


def test_default_backend_shims():
    import tensornetwork_tpu as tn
    assert tn.get_default_backend() == "jax"
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        with tn.DefaultBackend("numpy"):
            assert tn.get_default_backend() == "numpy"
    assert tn.get_default_backend() == "jax"
    import pytest as _pytest
    with _pytest.raises(ValueError):
        tn.set_default_backend("nonsense")
