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


def test_truncated_svd_distributed_masked_output(rng, mesh):
    # output="masked": device-resident masked factor stacks, zero host
    # syncs; reconstruction through the mask matches the ragged path
    c1, c2 = _rand_u1(rng, 8), _rand_u1(rng, 9)
    a = randn([Index(c1, False), Index(c2, True)], seed=7)
    u, s, vh, kept = truncated_svd_distributed(
        a, mesh, max_singular_values=5, output="masked")
    # masked reconstruction == sum over kept singular triplets
    rec = np.einsum("gij,gj,gjk->gik", np.asarray(u), np.asarray(s),
                    np.asarray(vh))
    U, S, V, s_rest = truncated_svd_distributed(
        a, mesh, max_singular_values=5)
    ref = (U.todense() * np.asarray(S.todense())[None, :]) @ V.todense()
    # project the per-sector reconstruction back to the dense matrix
    from tensornetwork_tpu.blocksparse.linalg import _get_blocks
    p, common, maps, shapes, blocks = _get_blocks(a)
    dense = np.zeros(a.shape, a.dtype)
    # scatter each sector's reconstruction into dense coordinates
    from tensornetwork_tpu.blocksparse.tensor import (
        _col_indices_per_sector)
    _, rows, cols = _col_indices_per_sector(a._charges, a._flows, p)
    for g in range(len(blocks)):
        r, c = shapes[g]
        dense[np.ix_(rows[g], cols[g])] = rec[g][:r, :c]
    np.testing.assert_allclose(dense, ref, atol=1e-5)
    assert int(np.asarray(kept).sum()) == 5


def test_truncated_svd_distributed_bst_transfer_is_kept_sized(rng, mesh):
    """The ragged-BST path must transfer ~kept nnz, not the full padded
    factor stacks (VERDICT r3 item 3)."""
    from tensornetwork_tpu.blocksparse import distributed as dist
    c1, c2 = _rand_u1(rng, 40), _rand_u1(rng, 36)
    m = randn([Index(c1, False), Index(c2, True)], seed=9)
    k = 4
    U, S, V, s_rest = truncated_svd_distributed(m, mesh,
                                                max_singular_values=k)
    assert dist.last_bst_transfer_bytes is not None
    from tensornetwork_tpu.blocksparse.linalg import _get_blocks
    p, common, maps, shapes, blocks = _get_blocks(m)
    Rm = max(b.shape[0] for b in blocks)
    Cm = max(b.shape[1] for b in blocks)
    itemsize = np.dtype(m.dtype).itemsize
    # kept triplets (k rows/cols at padded block dims) + index + tail —
    # far below the full padded stacks the old path transferred
    full_stacks = 2 * len(blocks) * Rm * Cm * itemsize
    budget = k * (Rm + Cm + 1) * itemsize + k * 4 + s_rest.nbytes + 256
    assert dist.last_bst_transfer_bytes <= budget
    assert dist.last_bst_transfer_bytes < full_stacks / 4
    # and the result still matches the single-device oracle
    U0, S0, V0, s_rest0 = truncated_svd(m, max_singular_values=k)
    np.testing.assert_allclose(np.sort(S.data)[::-1],
                               np.sort(S0.data)[::-1], atol=1e-10)
    np.testing.assert_allclose(s_rest, s_rest0, atol=1e-10)


def test_ep_symmetric_dmrg_one_site_matches_single_device(mesh):
    # VERDICT r2 item 2 "Done" criterion: a distributed symmetric sweep
    # on the virtual mesh matches the single-device BatchedSymmetricDMRG
    # energies to f32 tolerance
    from tensornetwork_tpu.blocksparse.batched import (
        uniform_skeleton_mps, random_data_batch)
    from tensornetwork_tpu.models.symmetric_dmrg import u1_xxz_mpo
    from tensornetwork_tpu.models.symmetric_dmrg_batched import (
        BatchedSymmetricDMRG)
    N, chi, B = 6, 10, 2
    skel = uniform_skeleton_mps(N, chi, dtype=np.float32)
    mpo = u1_xxz_mpo(1.0, 1.0, 0.0, N)
    data = random_data_batch(skel, B, seed=0)
    ref = BatchedSymmetricDMRG(skel, [d.copy() for d in data], mpo,
                               num_krylov_vecs=10)
    es_ref = ref.run_one_site(num_sweeps=2)
    ep = BatchedSymmetricDMRG(skel, [d.copy() for d in data], mpo,
                              num_krylov_vecs=10, ep_mesh=mesh)
    es_ep = ep.run_one_site(num_sweeps=2)
    np.testing.assert_allclose(es_ep, es_ref, atol=5e-6)


@pytest.mark.slow
def test_ep_symmetric_dmrg_two_site_matches_single_device(mesh):
    # two-site: sector-sharded contractions + DISTRIBUTED per-sector
    # truncation (lax.switch branch per device, psum reassembly)
    from tensornetwork_tpu.blocksparse.batched import (
        uniform_skeleton_mps, random_data_batch)
    from tensornetwork_tpu.models.symmetric_dmrg import u1_xxz_mpo
    from tensornetwork_tpu.models.symmetric_dmrg_batched import (
        BatchedSymmetricDMRG)
    N, chi, B = 6, 10, 2
    skel = uniform_skeleton_mps(N, chi, dtype=np.float32)
    mpo = u1_xxz_mpo(1.0, 1.0, 0.0, N)
    data = random_data_batch(skel, B, seed=1)
    ref = BatchedSymmetricDMRG(skel, [d.copy() for d in data], mpo,
                               num_krylov_vecs=10)
    es_ref = ref.run_two_site(num_sweeps=2)
    ep = BatchedSymmetricDMRG(skel, [d.copy() for d in data], mpo,
                              num_krylov_vecs=10, ep_mesh=mesh)
    es_ep = ep.run_two_site(num_sweeps=2)
    np.testing.assert_allclose(es_ep, es_ref, atol=1e-5)
    np.testing.assert_allclose(ep.truncation_errors[-1],
                               ref.truncation_errors[-1], atol=1e-6)


def test_ep_fused_chain_matches_sequential_exactly(mesh):
    # VERDICT r3 item 2: the fused chain executor assigns whole
    # dependency components to devices, so device partials have disjoint
    # support and ONE final psum reassembles the chain EXACTLY (adding
    # exact zeros) — assert equality against the sequential single-device
    # executors and the numpy sector engine on the DMRG matvec chain.
    from jax.sharding import PartitionSpec as P
    from tensornetwork_tpu.blocksparse.batched import (
        chain_contraction_plan, contraction_plan, uniform_skeleton_mps,
        random_data_batch)
    from tensornetwork_tpu.models.symmetric_dmrg import u1_xxz_mpo
    from tensornetwork_tpu.models import symmetric_dmrg as SD
    from tensornetwork_tpu.models.symmetric_dmrg_batched import (
        _boundary_left_skel)
    import jax.numpy as jnp

    N, chi = 6, 12
    skel = uniform_skeleton_mps(N, chi, dtype=np.float32)
    mpo = u1_xxz_mpo(1.0, 1.0, 0.0, N)
    Lsk = _boundary_left_skel(np.float32)
    for k in range(2):
        Lsk = SD._add_left(Lsk, skel[k], mpo[k])
    from tensornetwork_tpu.models.symmetric_dmrg_batched import (
        _boundary_right_skel)
    Rsk = _boundary_right_skel(skel[-1].flat_charges[-1], np.float32)
    for k in range(N - 1, 2, -1):
        Rsk = SD._add_right(Rsk, skel[k], mpo[k])
    A, W = skel[2], mpo[2]
    stages = [(Lsk, A, [[0], [0]]),
              (None, W, [[0, 2], [0, 3]]),
              (None, Rsk, [[1, 2], [0, 1]])]
    run_chain, y_skel = chain_contraction_plan(
        stages, ep=(8, "ep"))
    assert y_skel.data.shape == A.data.shape

    # data
    dx = random_data_batch([A], 1, seed=7)[0][0]
    rngl = np.random.default_rng(3)
    dl = rngl.standard_normal(Lsk.data.shape[0]).astype(np.float32)
    dr = rngl.standard_normal(Rsk.data.shape[0]).astype(np.float32)
    dw = np.asarray(W.data, np.float32)

    fn = jax.jit(jax.shard_map(
        lambda a, b, c, d: run_chain(a, b, c, d), mesh=mesh,
        in_specs=(P(), P(), P(), P()), out_specs=P(), check_vma=False))
    y_ep = np.asarray(fn(dl, dx, dw, dr))

    # sequential single-device executors
    mv1, t1 = contraction_plan(Lsk, A, [[0], [0]])
    mv2, t2 = contraction_plan(t1, W, [[0, 2], [0, 3]])
    mv3, _ = contraction_plan(t2, Rsk, [[1, 2], [0, 1]])
    y_seq = np.asarray(mv3(mv2(mv1(jnp.asarray(dl), jnp.asarray(dx)),
                              jnp.asarray(dw)), jnp.asarray(dr)))
    np.testing.assert_allclose(y_ep, y_seq, rtol=0, atol=1e-6)

    # numpy sector-engine oracle
    from tensornetwork_tpu.blocksparse.tensor import BlockSparseTensor
    def with_data(skel_t, d):
        return BlockSparseTensor(np.asarray(d), skel_t._charges,
                                 skel_t._flows,
                                 [list(g) for g in skel_t._order])
    o1 = bst.tensordot(with_data(Lsk, dl), with_data(A, dx), [[0], [0]])
    o2 = bst.tensordot(o1, W, [[0, 2], [0, 3]])
    o3 = bst.tensordot(o2, with_data(Rsk, dr), [[1, 2], [0, 1]])
    np.testing.assert_allclose(y_ep, o3.data, rtol=0, atol=1e-5)
