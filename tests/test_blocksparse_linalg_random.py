"""Randomized block-sparse linalg vs dense oracles (reference
``block_sparse/linalg_test.py`` coverage class, VERDICT r2 item 8):
svd/qr/eigh reconstruction and structure over charge types and seeds.
"""
import numpy as np
import pytest

from tensornetwork_tpu.blocksparse import (
    U1Charge, Z2Charge, ZNCharge, Index, BlockSparseTensor,
    tensordot, randn, svd, qr, eigh)
from tensornetwork_tpu.blocksparse.linalg import truncated_svd, pinv


def make_charge(rng, d, kind):
    if kind == "u1":
        return U1Charge(rng.integers(-2, 3, d))
    if kind == "z2":
        return Z2Charge(rng.integers(0, 2, d))
    return ZNCharge(3)(rng.integers(0, 3, d))


KINDS = ["u1", "z2", "z3"]


def rand_matrix(rng, kind, seed, dr=8, dc=7):
    c1 = make_charge(rng, dr, kind)
    c2 = make_charge(rng, dc, kind)
    return randn([Index(c1, False), Index(c2, True)], seed=seed)


@pytest.mark.parametrize("kind", KINDS)
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_svd_reconstruction_random(kind, seed):
    rng = np.random.default_rng(seed)
    a = rand_matrix(rng, kind, seed)
    U, S, V = svd(a)
    dense = a.todense()
    # reconstruct through the sparse algebra
    US = tensordot(U, _diag_embed(S), [[1], [0]])
    rec = tensordot(US, V, [[1], [0]])
    np.testing.assert_allclose(rec.todense(), dense, atol=1e-10)
    # singular values match the dense SVD's nonzeros
    s_dense = np.linalg.svd(dense, compute_uv=False)
    s_sparse = np.sort(np.asarray(S.todense()))[::-1]
    nz = min(len(s_sparse), len(s_dense))
    np.testing.assert_allclose(np.sort(s_sparse)[::-1][:nz],
                               s_dense[:nz], atol=1e-10)


def _diag_embed(S):
    from tensornetwork_tpu.blocksparse.linalg import diag
    return diag(S)


@pytest.mark.parametrize("kind", KINDS)
@pytest.mark.parametrize("seed", [0, 1])
def test_qr_reconstruction_and_isometry(kind, seed):
    rng = np.random.default_rng(10 + seed)
    a = rand_matrix(rng, kind, seed, dr=9, dc=6)
    Q, R = qr(a)
    rec = tensordot(Q, R, [[1], [0]])
    np.testing.assert_allclose(rec.todense(), a.todense(), atol=1e-10)
    qd = Q.todense()
    gram = qd.T @ qd
    # columns with any support are orthonormal
    live = np.diag(gram) > 0.5
    np.testing.assert_allclose(gram[np.ix_(live, live)],
                               np.eye(int(live.sum())), atol=1e-10)


@pytest.mark.parametrize("kind", KINDS)
@pytest.mark.parametrize("seed", [0, 1])
def test_eigh_reconstruction_random(kind, seed):
    rng = np.random.default_rng(20 + seed)
    c = make_charge(rng, 8, kind)
    a = randn([Index(c, False), Index(c.copy(), True)], seed=seed)
    # symmetrize within the sparse algebra
    at = a.transpose([1, 0])
    sym = BlockSparseTensor((a.data + at.data) / 2, a._charges, a._flows,
                            a._order)
    E, V = eigh(sym)
    VE = tensordot(V, _diag_embed(E), [[1], [0]])
    rec = tensordot(VE, V.conj().transpose([1, 0]), [[1], [0]])
    np.testing.assert_allclose(rec.todense(), sym.todense(), atol=1e-10)


@pytest.mark.parametrize("kind", ["u1", "z3"])
@pytest.mark.parametrize("msv", [2, 4, 6])
def test_truncated_svd_global_ranking_random(kind, msv):
    rng = np.random.default_rng(30 + msv)
    a = rand_matrix(rng, kind, msv, dr=10, dc=9)
    U, S, V, s_rest = truncated_svd(a, max_singular_values=msv)
    s_kept = np.asarray(S.todense())
    dense_s = np.linalg.svd(a.todense(), compute_uv=False)
    # the kept values are exactly the global top-msv of the dense spectrum
    np.testing.assert_allclose(np.sort(s_kept)[::-1],
                               dense_s[:len(s_kept)], atol=1e-10)
    assert len(s_kept) <= msv
    # discarded spectrum accounts for the rest (up to numerical zeros)
    total = np.sum(dense_s**2)
    np.testing.assert_allclose(np.sum(s_kept**2) + np.sum(s_rest**2),
                               total, rtol=1e-10)


@pytest.mark.parametrize("kind", KINDS)
def test_pinv_property_random(kind):
    rng = np.random.default_rng(40)
    a = rand_matrix(rng, kind, 3, dr=7, dc=7)
    ap = pinv(a)
    dense = a.todense()
    # A A+ A = A
    np.testing.assert_allclose(
        dense @ ap.todense() @ dense, dense, atol=1e-8)


@pytest.mark.parametrize("kind", ["u1", "z2"])
@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_svd_dtype_sweep(kind, dtype):
    rng = np.random.default_rng(50)
    c1, c2 = make_charge(rng, 6, kind), make_charge(rng, 5, kind)
    a = randn([Index(c1, False), Index(c2, True)], seed=0, dtype=dtype)
    U, S, V = svd(a)
    assert U.dtype == dtype
    tol = 1e-5 if dtype == np.float32 else 1e-12
    US = tensordot(U, _diag_embed(S), [[1], [0]])
    rec = tensordot(US, V, [[1], [0]])
    np.testing.assert_allclose(rec.todense(), a.todense(), atol=tol)


@pytest.mark.parametrize("kind", KINDS)
@pytest.mark.parametrize("seed", [0, 1])
def test_rank3_svd_via_matricization(kind, seed):
    # split a rank-3 tensor at partition 1 via reshape + svd, reconstruct
    rng = np.random.default_rng(60 + seed)
    c1 = make_charge(rng, 4, kind)
    c2 = make_charge(rng, 3, kind)
    c3 = make_charge(rng, 5, kind)
    t = randn([Index(c1, False), Index(c2, False), Index(c3, True)],
              seed=seed)
    m = t.reshape([4 * 3, 5])
    U, S, V = svd(m)
    US = tensordot(U, _diag_embed(S), [[1], [0]])
    rec = tensordot(US, V, [[1], [0]])
    np.testing.assert_allclose(rec.todense(), m.todense(), atol=1e-10)
    back = rec.reshape([4, 3, 5])
    np.testing.assert_allclose(back.todense(), t.todense(), atol=1e-10)
