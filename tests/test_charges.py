"""Charge-algebra scenario ports (reference
``block_sparse/charge_test.py``, VERDICT r4 item 5): equality, unique
with index/inverse/counts, intersect variants, duals across charge
families, product groups, fusion laws, reduce/getitem/identity."""
import numpy as np
import pytest

from tensornetwork_tpu.blocksparse.charge import (
    BaseCharge, U1Charge, Z2Charge, ZNCharge, charge_equal, fuse_charges)


def test_charge_equal_scenarios():
    q1 = np.array([-1, 2, 4, -3, 1, 2, -5])
    q2 = np.array([1, 2, 4, -3, 1, 2, -5])
    q3 = np.array([1, 2, 4, -3, -5])
    Q1, Q2, Q3 = U1Charge(q1), U1Charge(q2), U1Charge(q3)
    assert charge_equal(Q1, Q1)
    assert not charge_equal(Q1, Q2)
    assert not charge_equal(Q1, Q3)
    # materializing unique views must not change equality semantics
    _ = Q1.unique_charges
    _ = Q2.unique_charges
    assert charge_equal(Q1, Q1)
    assert not charge_equal(Q1, Q2)


def test_basecharge_dims_and_num_unique():
    rng = np.random.default_rng(10)
    q = rng.integers(-2, 3, (300, 2))
    Q = BaseCharge(q, [U1Charge(np.array([0])).charge_types[0]] * 2)
    assert Q.dim == 300
    assert len(Q) == 300
    assert Q.num_symmetries == 2
    assert Q.unique().dim == np.unique(q, axis=0).shape[0]


def test_basecharge_copy_is_deep():
    rng = np.random.default_rng(10)
    Q = U1Charge(rng.integers(-2, 3, 50))
    Qc = Q.copy()
    assert Q.charges is not Qc.charges
    np.testing.assert_array_equal(Q.charges, Qc.charges)
    Qc.charges[0, 0] = 99
    assert Q.charges[0, 0] != 99


def test_basecharge_unique_full_outputs():
    rng = np.random.default_rng(10)
    q = rng.integers(-2, 3, (500, 2))
    types = (U1Charge(np.array([0])).charge_types[0],) * 2
    Q = BaseCharge(q, list(types))
    uq, idx, inv, cnt = Q.unique(return_index=True, return_inverse=True,
                                 return_counts=True)
    euq, eidx, einv, ecnt = np.unique(q, axis=0, return_index=True,
                                      return_inverse=True,
                                      return_counts=True)
    np.testing.assert_array_equal(uq.charges, euq)
    np.testing.assert_array_equal(np.asarray(inv).reshape(-1),
                                  einv.reshape(-1))
    np.testing.assert_array_equal(cnt, ecnt)
    # reconstruct rows from unique + inverse
    np.testing.assert_array_equal(
        uq.charges[np.asarray(inv).reshape(-1)], q)


def test_single_unique_value():
    q = np.ones(30, dtype=np.int64)
    Q = U1Charge(q)
    uq, cnt = Q.unique(return_counts=True)
    assert uq.dim == 1 and cnt[0] == 30


@pytest.mark.parametrize("make,lo,hi", [
    (U1Charge, -5, 5), (Z2Charge, 0, 1),
    (ZNCharge(3), 0, 2), (ZNCharge(6), 0, 5)])
def test_dual_fusion_identity_per_family(make, lo, hi):
    rng = np.random.default_rng(11)
    q = rng.integers(lo, hi + 1, 40)
    Q = make(q)
    # q + dual(q) fuses to the identity for every entry
    fused = Q + Q.dual(True)
    ident = Q.identity_charges(1).charges[0]
    # elementwise fusion of matching entries: take the diagonal via
    # fuse of single entries
    for i in (0, 7, 23):
        f = Q[i] + Q.dual(True)[i]
        np.testing.assert_array_equal(f.charges[0], ident)
    # dual is an involution
    np.testing.assert_array_equal(Q.dual(True).dual(True).charges,
                                  Q.charges)
    # dual(False) is the identity map
    np.testing.assert_array_equal(Q.dual(False).charges, Q.charges)


@pytest.mark.parametrize("n", [2, 3, 5, 7])
def test_zn_fusion_mod_law(n):
    rng = np.random.default_rng(12)
    a = rng.integers(0, n, 60)
    b = rng.integers(0, n, 60)
    F = ZNCharge(n)(a) + ZNCharge(n)(b)
    # fusion of Z_n charges is addition mod n, through the outer-sum
    # convention of __add__ (kron order)
    outer = (a[:, None] + b[None, :]).reshape(-1) % n
    np.testing.assert_array_equal(F.charges.reshape(-1), outer)


def test_intersect_scenarios():
    a = U1Charge(np.array([0, 1, 2, 3, 4]))
    b = U1Charge(np.array([0, -1, 4]))
    c = a.intersect(b)
    np.testing.assert_array_equal(np.sort(c.charges.reshape(-1)), [0, 4])
    c2, ia, ib = a.intersect(b, return_indices=True)
    np.testing.assert_array_equal(a.charges[ia], c2.charges)
    np.testing.assert_array_equal(b.charges[ib], c2.charges)
    # empty intersection
    d = a.intersect(U1Charge(np.array([9, 10])))
    assert d.dim == 0


def test_product_group_matmul():
    rng = np.random.default_rng(13)
    u = U1Charge(rng.integers(-1, 2, 20))
    z = Z2Charge(rng.integers(0, 2, 20))
    P = u @ z
    assert P.num_symmetries == 2
    assert P.dim == 20
    np.testing.assert_array_equal(P.charges[:, 0], u.charges[:, 0])
    np.testing.assert_array_equal(P.charges[:, 1], z.charges[:, 0])
    # duals act per-factor: U1 negates, Z2 is self-dual
    D = P.dual(True)
    np.testing.assert_array_equal(D.charges[:, 0], -u.charges[:, 0])
    np.testing.assert_array_equal(D.charges[:, 1], z.charges[:, 0])


def test_matmul_length_mismatch_raises():
    with pytest.raises(ValueError):
        U1Charge(np.array([0, 1])) @ Z2Charge(np.array([0]))


def test_fuse_charges_multi_with_flows():
    a = U1Charge(np.array([0, 1]))
    b = U1Charge(np.array([-1, 2]))
    c = U1Charge(np.array([3]))
    f = fuse_charges([a, b, c], [False, True, False])
    # kron order, flow=True dualizes b
    expect = []
    for qa in [0, 1]:
        for qb in [-1, 2]:
            for qc in [3]:
                expect.append(qa - qb + qc)
    np.testing.assert_array_equal(f.charges.reshape(-1), expect)


def test_fuse_charges_flow_count_mismatch_raises():
    a = U1Charge(np.array([0, 1]))
    with pytest.raises((ValueError, AssertionError, IndexError)):
        fuse_charges([a, a], [False])


def test_reduce_and_locations():
    Q = U1Charge(np.array([0, 1, 2, 1, 0, 3]))
    targets = U1Charge(np.array([0, 3]))
    red, locs = Q.reduce(targets, return_locations=True)
    np.testing.assert_array_equal(red.charges.reshape(-1), [0, 0, 3])
    np.testing.assert_array_equal(locs, [0, 4, 5])


def test_getitem_and_eq():
    Q = U1Charge(np.array([0, 1, 2, 1]))
    sub = Q[[1, 3]]
    np.testing.assert_array_equal(sub.charges.reshape(-1), [1, 1])
    eq = (Q == U1Charge(np.array([1])))
    np.testing.assert_array_equal(eq.reshape(-1), [False, True, False,
                                                   True])


def test_identity_charges_dim():
    Q = U1Charge(np.array([5, -3]))
    ids = Q.identity_charges(4)
    assert ids.dim == 4
    assert np.all(ids.charges == 0)


def test_zncharge_value_validation():
    with pytest.raises(ValueError):
        ZNCharge(1)
    # out-of-range values are either rejected or canonicalized mod n —
    # accept both contracts but never silent garbage
    try:
        c = ZNCharge(3)(np.array([0, 1, 2]))
        assert np.all((c.charges >= 0) & (c.charges < 3))
    except ValueError:
        pass


# ---------------------------------------------------------------------------
# utils-level scenario ports (reference block_sparse/utils_test.py)
# ---------------------------------------------------------------------------

def test_fuse_ndarrays_kron_order():
    from tensornetwork_tpu.blocksparse.charge import fuse_ndarrays
    a = np.asarray([0, 1])
    b = np.asarray([2, 3, 4])
    fused = fuse_ndarrays([a, b])
    np.testing.assert_array_equal(fused, [2, 3, 4, 3, 4, 5])
    # three arrays: row-major enumeration of sums
    c = np.asarray([10, 20])
    f3 = fuse_ndarrays([a, b, c])
    expect = [x + y + z for x in a for y in b for z in c]
    np.testing.assert_array_equal(f3, expect)
    # single array passes through
    np.testing.assert_array_equal(fuse_ndarrays([a]), a)


def test_fuse_degeneracies_outer_product():
    from tensornetwork_tpu.blocksparse.charge import fuse_degeneracies
    d1 = np.asarray([1, 2, 3])
    d2 = np.asarray([2, 4])
    np.testing.assert_array_equal(fuse_degeneracies(d1, d2),
                                  np.kron(d1, d2))


def test_balanced_partition_minimizes_imbalance():
    from tensornetwork_tpu.blocksparse.tensor import _balanced_partition
    # [2, 2, 16]: p=2 gives (4, 16); p=1 gives (2, 32) -> picks p=2
    assert _balanced_partition([2, 2, 16]) == 2
    # [16, 2, 2]: p=1 gives (16, 4) -> best
    assert _balanced_partition([16, 2, 2]) == 1
    # symmetric case
    assert _balanced_partition([4, 4]) == 1


def test_compute_num_nonzero_families():
    from tensornetwork_tpu.blocksparse.tensor import compute_num_nonzero
    rng = np.random.default_rng(5)
    for mk in (lambda d: U1Charge(rng.integers(-2, 3, d)),
               lambda d: Z2Charge(rng.integers(0, 2, d)),
               lambda d: ZNCharge(3)(rng.integers(0, 3, d))):
        charges = [mk(6), mk(7), mk(8)]
        flows = [False, True, False]
        n = compute_num_nonzero(charges, flows)
        # oracle: count dense index tuples whose fused charge is the
        # identity
        f = fuse_charges(charges, flows)
        ident = charges[0].identity_charges(1).charges[0]
        expect = int(np.sum(np.all(f.charges == ident[None, :], axis=1)))
        assert n == expect


def test_nonzero_dense_coords_conserving():
    from tensornetwork_tpu.blocksparse.tensor import nonzero_dense_coords
    rng = np.random.default_rng(6)
    charges = [U1Charge(rng.integers(-1, 2, 5)),
               U1Charge(rng.integers(-1, 2, 6))]
    flows = [False, True]
    coords = nonzero_dense_coords(charges, flows)
    for (i, j) in coords:
        assert charges[0].charges[i, 0] - charges[1].charges[j, 0] == 0
