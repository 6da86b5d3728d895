"""Distributed U(1) execution (EP-analog): psum-reduced sector partials
and all_gather-based global truncation on the virtual 8-device mesh,
against dense-numpy and single-device oracles (VERDICT r1 item 4)."""
import jax
import numpy as np
import pytest

from tensornetwork_tpu.blocksparse import (
    U1Charge, Index, randn)
from tensornetwork_tpu.blocksparse import tensor as bst
from tensornetwork_tpu.blocksparse.linalg import truncated_svd
from tensornetwork_tpu.blocksparse.distributed import (
    tensordot_sharded, truncated_svd_distributed)
from tensornetwork_tpu.parallel.mesh import make_mesh


@pytest.fixture
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    return make_mesh((8,), ("ep",))


def _rand_u1(rng, d):
    return U1Charge(rng.integers(-2, 3, d))


def test_tensordot_sharded_matches_dense(rng, mesh):
    c1, c2, c3 = (_rand_u1(rng, d) for d in (6, 7, 5))
    a = randn([Index(c1, False), Index(c2, True)], seed=1)
    b = randn([Index(c2, False), Index(c3, True)], seed=2)
    out = tensordot_sharded(a, b, [[1], [0]], mesh)
    oracle = np.tensordot(a.todense(), b.todense(), [[1], [0]])
    np.testing.assert_allclose(out.todense(), oracle, atol=1e-12)


def test_tensordot_sharded_rank3_multiaxis(rng, mesh):
    c1, c2, c3, c4 = (_rand_u1(rng, d) for d in (4, 5, 6, 3))
    a = randn([Index(c1, False), Index(c2, True), Index(c3, True)],
              seed=3)
    b = randn([Index(c2, False), Index(c3, False), Index(c4, True)],
              seed=4)
    out = tensordot_sharded(a, b, [[1, 2], [0, 1]], mesh)
    oracle = np.tensordot(a.todense(), b.todense(), [[1, 2], [0, 1]])
    np.testing.assert_allclose(out.todense(), oracle, atol=1e-12)
    # also matches the single-device sector engine
    ref = bst.tensordot(a, b, [[1, 2], [0, 1]])
    np.testing.assert_allclose(out.todense(), ref.todense(), atol=1e-12)


def test_tensordot_sharded_transposed_operands(rng, mesh):
    c1, c2, c3 = (_rand_u1(rng, d) for d in (4, 6, 5))
    a = randn([Index(c2, True), Index(c1, False)], seed=5).transpose((1, 0))
    b = randn([Index(c2, False), Index(c3, True)], seed=6)
    out = tensordot_sharded(a, b, [[1], [0]], mesh)
    oracle = np.tensordot(a.todense(), b.todense(), [[1], [0]])
    np.testing.assert_allclose(out.todense(), oracle, atol=1e-12)


def test_truncated_svd_distributed_matches_single_device(rng, mesh):
    c1, c2 = _rand_u1(rng, 20), _rand_u1(rng, 18)
    m = randn([Index(c1, False), Index(c2, True)], seed=7)
    for kwargs in ({"max_singular_values": 8},
                   {"max_truncation_error": 0.5},
                   {"max_truncation_error": 0.2, "relative": True},
                   {"max_singular_values": 5, "max_truncation_error": 0.3}):
        U, S, V, s_rest = truncated_svd_distributed(m, mesh, **kwargs)
        U0, S0, V0, s_rest0 = truncated_svd(m, **kwargs)
        np.testing.assert_allclose(np.sort(S.data)[::-1],
                                   np.sort(S0.data)[::-1], atol=1e-10)
        np.testing.assert_allclose(s_rest, s_rest0, atol=1e-10)
        # reconstruction parity (gauge-free comparison)
        rec = bst.tensordot(
            bst.tensordot(U, _diag_bs(S), [[1], [0]]), V, [[1], [0]])
        rec0 = bst.tensordot(
            bst.tensordot(U0, _diag_bs(S0), [[1], [0]]), V0, [[1], [0]])
        np.testing.assert_allclose(rec.todense(), rec0.todense(),
                                   atol=1e-10)


def _diag_bs(S):
    from tensornetwork_tpu.blocksparse.linalg import diag
    return diag(S)


def test_truncated_svd_distributed_dense_oracle(rng, mesh):
    """Keeping the k strongest values globally must reproduce the dense
    best-rank-k error (per-sector SVD + global sort == dense SVD on a
    block-diagonal matrix up to degeneracies)."""
    c1, c2 = _rand_u1(rng, 16), _rand_u1(rng, 16)
    m = randn([Index(c1, False), Index(c2, True)], seed=8)
    k = 6
    U, S, V, s_rest = truncated_svd_distributed(m, mesh,
                                                max_singular_values=k)
    dense = m.todense()
    s_dense = np.linalg.svd(dense, compute_uv=False)
    np.testing.assert_allclose(np.sort(S.data)[::-1], s_dense[:k],
                               atol=1e-10)
    # truncation error parity with the dense rank-k optimum
    rec = bst.tensordot(
        bst.tensordot(U, _diag_bs(S), [[1], [0]]), V, [[1], [0]])
    err = np.linalg.norm(rec.todense() - dense)
    err_dense = np.linalg.norm(s_dense[k:])
    np.testing.assert_allclose(err, err_dense, rtol=1e-8)
