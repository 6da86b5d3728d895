"""BlockSparseTensor API scenario ports (reference
``block_sparse/blocksparsetensor_test.py``, VERDICT r4 item 5):
matmul, item, H, size, dunder validation, copy independence."""
import numpy as np
import pytest

from tensornetwork_tpu.blocksparse import Index, U1Charge, Z2Charge, randn
from tensornetwork_tpu.blocksparse.tensor import (BlockSparseTensor,
                                                  tensordot)


def _u1(rng, d, lo=-2, hi=3):
    return U1Charge(rng.integers(lo, hi, d))


@pytest.mark.parametrize("rank1", [1, 2])
@pytest.mark.parametrize("rank2", [1, 2])
@pytest.mark.parametrize("kind", ["u1", "z2"])
def test_matmul_matches_dense(rank1, rank2, kind):
    rng = np.random.default_rng(10)
    mk = (lambda d: _u1(rng, d)) if kind == "u1" else \
        (lambda d: Z2Charge(rng.integers(0, 2, d)))
    shared = mk(12)
    is1 = [Index(mk(10), False) for _ in range(rank1 - 1)] \
        + [Index(shared, False)]
    is2 = [Index(shared.copy(), True)] \
        + [Index(mk(11), False) for _ in range(rank2 - 1)]
    t1 = randn(is1, seed=1)
    t2 = randn(is2, seed=2)
    result = t1 @ t2
    dense = t1.todense() @ t2.todense()
    if rank1 == 1 and rank2 == 1:
        # full contraction returns a scalar (0-d) result
        np.testing.assert_allclose(np.asarray(result), dense, atol=1e-12)
    else:
        np.testing.assert_allclose(result.todense(), dense, atol=1e-12)


def test_matmul_rank3_raises():
    rng = np.random.default_rng(0)
    t1 = randn([Index(_u1(rng, 4), False), Index(_u1(rng, 5), False),
                Index(_u1(rng, 6), False)], seed=1)
    t2 = randn([Index(t1.flat_charges[2].copy(), True),
                Index(_u1(rng, 4), False)], seed=2)
    with pytest.raises(ValueError):
        t1 @ t2
    with pytest.raises(ValueError):
        t2 @ t1


def test_matmul_mismatched_bond_raises():
    rng = np.random.default_rng(0)
    t1 = randn([Index(_u1(rng, 6), False), Index(_u1(rng, 8), False)],
               seed=1)
    t2 = randn([Index(_u1(rng, 9), True), Index(_u1(rng, 6), False)],
               seed=2)
    with pytest.raises(ValueError):
        t1 @ t2


def test_item_scenarios():
    rng = np.random.default_rng(10)
    # size-1 tensor whose single entry may be structurally forbidden
    inds = [Index(U1Charge(np.array([1])), False),
            Index(U1Charge(np.array([2])), False)]
    t2 = randn(inds, seed=1)
    assert t2.item() == 0.0  # 1+2 != 0: no allowed entry
    inds0 = [Index(U1Charge(np.array([1])), False),
             Index(U1Charge(np.array([1])), True)]
    t0 = randn(inds0, seed=2)
    assert t0.item() == t0.data[0]
    big = randn([Index(_u1(rng, 6), False), Index(_u1(rng, 6), True)],
                seed=3)
    with pytest.raises(ValueError, match="size 1"):
        big.item()


@pytest.mark.parametrize("dtype", [np.float64, np.complex128])
def test_H_matches_dense(dtype):
    rng = np.random.default_rng(10)
    t = randn([Index(_u1(rng, 8), False), Index(_u1(rng, 9), True)],
              dtype=dtype, seed=1)
    np.testing.assert_allclose(t.H.todense(), t.todense().T.conj(),
                               atol=1e-12)


def test_H_rank3_raises():
    rng = np.random.default_rng(10)
    t = randn([Index(_u1(rng, 4), False)] * 3, seed=1)
    with pytest.raises(ValueError, match="hermitian"):
        t.H


def test_size_is_dense_count():
    rng = np.random.default_rng(10)
    t = randn([Index(_u1(rng, 8), True), Index(_u1(rng, 9), False),
               Index(_u1(rng, 10), True)], seed=1)
    assert t.size == 8 * 9 * 10
    assert t.data.size < t.size  # sparse storage is genuinely sparse


def test_copy_is_independent():
    rng = np.random.default_rng(10)
    t = randn([Index(_u1(rng, 8), False), Index(_u1(rng, 8), True)],
              seed=1)
    c = t.copy()
    c.data[:] = 0.0
    assert np.any(t.data != 0.0)


def test_add_sub_structure_mismatch_raises():
    rng = np.random.default_rng(10)
    a = randn([Index(_u1(rng, 8), False), Index(_u1(rng, 8), True)],
              seed=1)
    b = randn([Index(_u1(rng, 7), False), Index(_u1(rng, 7), True)],
              seed=2)
    with pytest.raises((ValueError, AssertionError)):
        a + b
    with pytest.raises((ValueError, AssertionError)):
        a - b


def test_scalar_dunder_validation():
    rng = np.random.default_rng(10)
    a = randn([Index(_u1(rng, 8), False), Index(_u1(rng, 8), True)],
              seed=1)
    with pytest.raises(TypeError):
        a * a  # tensor-tensor elementwise mul is not defined
    with pytest.raises(TypeError):
        a / a
    np.testing.assert_allclose((-a).data, -a.data)
    np.testing.assert_allclose((2.0 * a).data, 2.0 * a.data)
    np.testing.assert_allclose((a / 2.0).data, a.data / 2.0)


def test_T_reverses_all_legs():
    rng = np.random.default_rng(10)
    t = randn([Index(_u1(rng, 4), False), Index(_u1(rng, 5), True),
               Index(_u1(rng, 6), False)], seed=1)
    np.testing.assert_allclose(t.T.todense(),
                               np.transpose(t.todense(), (2, 1, 0)),
                               atol=1e-12)


def test_matmul_chain_associativity():
    rng = np.random.default_rng(10)
    c1, c2, c3, c4 = (_u1(rng, d) for d in (6, 7, 8, 6))
    m1 = randn([Index(c1, False), Index(c2, True)], seed=1)
    m2 = randn([Index(c2.copy(), False), Index(c3, True)], seed=2)
    m3 = randn([Index(c3.copy(), False), Index(c4, True)], seed=3)
    left = (m1 @ m2) @ m3
    right = m1 @ (m2 @ m3)
    np.testing.assert_allclose(left.todense(), right.todense(),
                               atol=1e-10)


def test_abs_sign_parity():
    # reference block_sparse/linalg.py:696-705
    from tensornetwork_tpu.blocksparse import abs as bs_abs, sign as bs_sign
    rng = np.random.default_rng(10)
    t = randn([Index(_u1(rng, 8), False), Index(_u1(rng, 8), True)],
              seed=1)
    np.testing.assert_allclose(bs_abs(t).todense(), np.abs(t.todense()))
    np.testing.assert_allclose(bs_sign(t).todense(),
                               np.sign(t.todense()))
    # structure preserved
    assert bs_abs(t).data.shape == t.data.shape
