"""Randomized block-sparse combinatorics vs ``todense()`` oracles —
the reference's exhaustive strategy (reference
``block_sparse/tensordot_test.py``: randomized rank/charge sweeps per
charge type), VERDICT r2 item 8.
"""
import numpy as np
import pytest

from tensornetwork_tpu.blocksparse import (
    U1Charge, Z2Charge, ZNCharge, Index, BlockSparseTensor,
    tensordot, fuse_charges, randn)
from tensornetwork_tpu.blocksparse.tensor import tensordot_batched


def make_charge(rng, d, kind):
    if kind == "u1":
        return U1Charge(rng.integers(-2, 3, d))
    if kind == "z2":
        return Z2Charge(rng.integers(0, 2, d))
    if kind == "z3":
        return ZNCharge(3)(rng.integers(0, 3, d))
    # product group
    return U1Charge(rng.integers(-1, 2, d)) @ Z2Charge(
        rng.integers(0, 2, d))


def rand_bst(rng, dims, flows, kind, seed):
    idx = [Index(make_charge(rng, d, kind), f)
           for d, f in zip(dims, flows)]
    return randn(idx, seed=seed)


KINDS = ["u1", "z2", "z3", "u1xz2"]


@pytest.mark.parametrize("kind", KINDS)
@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("r1,r2,nc", [(2, 2, 1), (3, 2, 1), (3, 3, 2),
                                      (4, 3, 2), (2, 3, 2), (4, 4, 3),
                                      (3, 3, 1)])
def test_tensordot_random_vs_dense(kind, seed, r1, r2, nc):
    # contract the last nc legs of t1 with the first nc of t2, with
    # matching (dual) charges on the contracted pairs
    rng = np.random.default_rng(100 * seed + r1 * 10 + r2)
    dims1 = list(rng.integers(2, 6, r1))
    dims2 = list(rng.integers(2, 6, r2))
    flows1 = [bool(b) for b in rng.integers(0, 2, r1)]
    cont_charges = [make_charge(rng, d, kind) for d in dims1[-nc:]]
    idx1 = [Index(make_charge(rng, d, kind), f)
            for d, f in zip(dims1[:-nc], flows1[:-nc])]
    idx1 += [Index(c, f) for c, f in zip(cont_charges, flows1[-nc:])]
    dims2[:nc] = dims1[-nc:]
    idx2 = [Index(c.copy(), not f)
            for c, f in zip(cont_charges, flows1[-nc:])]
    idx2 += [Index(make_charge(rng, d, kind), bool(b))
             for d, b in zip(dims2[nc:], rng.integers(0, 2, r2 - nc))]
    a = randn(idx1, seed=seed)
    b = randn(idx2, seed=seed + 7)
    axes1 = list(range(r1 - nc, r1))
    axes2 = list(range(nc))
    out = tensordot(a, b, [axes1, axes2])
    oracle = np.tensordot(a.todense(), b.todense(), [axes1, axes2])
    if oracle.ndim == 0:
        np.testing.assert_allclose(float(np.asarray(out)), float(oracle),
                                   atol=1e-10)
    else:
        np.testing.assert_allclose(out.todense(), oracle, atol=1e-10)


@pytest.mark.parametrize("kind", KINDS)
@pytest.mark.parametrize("seed", [0, 1])
def test_transpose_random_vs_dense(kind, seed):
    rng = np.random.default_rng(seed)
    r = int(rng.integers(2, 5))
    dims = list(rng.integers(2, 6, r))
    flows = [bool(b) for b in rng.integers(0, 2, r)]
    t = rand_bst(rng, dims, flows, kind, seed)
    perm = list(rng.permutation(r))
    np.testing.assert_allclose(t.transpose(perm).todense(),
                               t.todense().transpose(perm), atol=0)
    # transpose round trip is exact
    inv = list(np.argsort(perm))
    np.testing.assert_allclose(
        t.transpose(perm).transpose(inv).todense(), t.todense(), atol=0)


@pytest.mark.parametrize("kind", ["u1", "z3"])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_reshape_transpose_reshape_vs_dense(kind, seed):
    rng = np.random.default_rng(10 + seed)
    dims = list(rng.integers(2, 5, 4))
    flows = [bool(b) for b in rng.integers(0, 2, 4)]
    t = rand_bst(rng, dims, flows, kind, seed)
    dense = t.todense()
    m = t.reshape([dims[0] * dims[1], dims[2] * dims[3]])
    np.testing.assert_allclose(
        m.todense(), dense.reshape(dims[0] * dims[1],
                                   dims[2] * dims[3]), atol=0)
    mt = m.transpose([1, 0])
    np.testing.assert_allclose(
        mt.todense(),
        dense.reshape(dims[0] * dims[1], dims[2] * dims[3]).T, atol=0)
    back = mt.reshape([dims[2], dims[3], dims[0], dims[1]])
    np.testing.assert_allclose(
        back.todense(), dense.transpose(2, 3, 0, 1), atol=0)


@pytest.mark.parametrize("kind", KINDS)
def test_arithmetic_random_vs_dense(kind):
    rng = np.random.default_rng(3)
    dims = [3, 4, 5]
    flows = [False, True, False]
    a = rand_bst(rng, dims, flows, kind, 0)
    b = BlockSparseTensor(
        np.asarray(rng.standard_normal(a.data.shape[0])),
        [c.copy() for c in a._charges], list(a._flows),
        [list(g) for g in a._order])
    np.testing.assert_allclose((a + b).todense(),
                               a.todense() + b.todense(), atol=0)
    np.testing.assert_allclose((a - b).todense(),
                               a.todense() - b.todense(), atol=0)
    np.testing.assert_allclose((2.5 * a).todense(), 2.5 * a.todense(),
                               atol=0)
    np.testing.assert_allclose((-a).todense(), -a.todense(), atol=0)


@pytest.mark.parametrize("kind", ["u1", "z2", "u1xz2"])
@pytest.mark.parametrize("seed", [0, 1])
def test_tensordot_batched_random_vs_dense(kind, seed):
    rng = np.random.default_rng(40 + seed)
    db, di, dj, dk = (int(x) for x in rng.integers(3, 6, 4))
    cb = make_charge(rng, db, kind)
    cj = make_charge(rng, dj, kind)
    fb1, fj1 = bool(rng.integers(0, 2)), bool(rng.integers(0, 2))
    A = randn([Index(cb, fb1),
               Index(make_charge(rng, di, kind), True),
               Index(cj, fj1)], seed=seed)
    B = randn([Index(cb.copy(), not fb1), Index(cj.copy(), not fj1),
               Index(make_charge(rng, dk, kind), False)], seed=seed + 3)
    out = tensordot_batched(A, B, ([2], [1]), ([0], [0]))
    oracle = np.einsum("bij,bjk->bik", A.todense(), B.todense())
    np.testing.assert_allclose(out.todense(), oracle, atol=1e-10)


@pytest.mark.parametrize("kind", ["u1", "z3"])
def test_trace_random_vs_dense(kind):
    from tensornetwork_tpu.blocksparse.linalg import trace_axes
    rng = np.random.default_rng(5)
    c = make_charge(rng, 5, kind)
    t = randn([Index(c, False), Index(make_charge(rng, 4, kind), True),
               Index(c.copy(), True)], seed=0)
    out = trace_axes(t, (0, 2))
    oracle = np.einsum("iji->j", t.todense())
    np.testing.assert_allclose(out.todense(), oracle, atol=1e-12)


def test_tensordot_f64_dtype():
    rng = np.random.default_rng(6)
    c1, c2 = make_charge(rng, 5, "u1"), make_charge(rng, 6, "u1")
    a = randn([Index(c1, False), Index(c2, True)], seed=1,
              dtype=np.float64)
    b = randn([Index(c2, False), Index(c1, True)], seed=2,
              dtype=np.float64)
    out = tensordot(a, b, [[1], [0]])
    assert out.dtype == np.float64
    np.testing.assert_allclose(
        out.todense(), np.tensordot(a.todense(), b.todense(), [[1], [0]]),
        atol=1e-13)
