"""Batched-realization U(1) DMRG vs per-instance oracles.

Strategy: the batched engine must reproduce the single-instance
numpy-engine solver (itself validated against exact diagonalization in
test_symmetric_dmrg.py) realization by realization."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensornetwork_tpu.blocksparse.batched import (
    ShiftPlan, canonical_bond_charges, contraction_plan, random_data_batch,
    uniform_skeleton_mps)
from tensornetwork_tpu.blocksparse.tensor import BlockSparseTensor, tensordot
from tensornetwork_tpu.models.symmetric_dmrg import (
    SymmetricFiniteDMRG, u1_xxz_mpo)
from tensornetwork_tpu.models.symmetric_dmrg_batched import (
    BatchedSymmetricDMRG)


def _structure(t):
    return (list(t.flat_charges), list(t.flat_flows),
            [list(g) for g in t._order])


def test_canonical_bond_charges_inequalities():
    N, chi = 12, 32
    bonds = canonical_bond_charges(N, chi)
    assert len(bonds) == N + 1
    assert list(bonds[0]) == [0] and list(bonds[-1]) == [N // 2]
    for k in range(N):
        mk = {q: int((bonds[k] == q).sum()) for q in set(bonds[k])}
        mk1 = {q: int((bonds[k + 1] == q).sum()) for q in set(bonds[k + 1])}
        for q, m in mk1.items():
            assert mk.get(q, 0) + mk.get(q - 1, 0) >= m, (k, q)
        for q, m in mk.items():
            assert mk1.get(q, 0) + mk1.get(q + 1, 0) >= m, (k, q)
        assert len(bonds[k + 1]) <= chi


def test_shift_plans_reconstruct_and_isometric(rng):
    N, chi, B = 8, 24, 3
    skel = uniform_skeleton_mps(N, chi, dtype=np.float64)
    data = random_data_batch(skel, B, seed=1)
    site = 3
    t = skel[site]
    for direction in ("right", "left"):
        plan = ShiftPlan(t, direction)
        qd, pd = plan(data[site])
        for b in range(B):
            A = BlockSparseTensor(np.asarray(data[site][b]), *_structure(t))
            Q = BlockSparseTensor(np.asarray(qd[b]), *_structure(t))
            P = BlockSparseTensor(np.asarray(pd[b]),
                                  *_structure(plan.bond_skel))
            if direction == "right":
                rec = tensordot(Q, P, [[2], [0]])
                g = tensordot(Q.conj(), Q, [[0, 1], [0, 1]])
            else:
                rec = tensordot(P, Q, [[1], [0]])
                g = tensordot(Q, Q.conj(), [[1, 2], [1, 2]])
            np.testing.assert_allclose(rec.todense(), A.todense(),
                                       atol=1e-12)
            np.testing.assert_allclose(g.todense(), np.eye(g.shape[0]),
                                       atol=1e-12)


def test_batched_contraction_matches_numpy_engine(rng):
    N, chi, B = 6, 16, 4
    skel = uniform_skeleton_mps(N, chi, dtype=np.float64)
    data = random_data_batch(skel, B, seed=2)
    run, out_skel = contraction_plan(skel[2], skel[3], [[2], [0]])
    outB = jax.vmap(run)(data[2], data[3])
    for b in range(B):
        a = BlockSparseTensor(np.asarray(data[2][b]), *_structure(skel[2]))
        c = BlockSparseTensor(np.asarray(data[3][b]), *_structure(skel[3]))
        ref = tensordot(a, c, [[2], [0]])
        got = BlockSparseTensor(np.asarray(outB[b]), *_structure(out_skel))
        np.testing.assert_allclose(got.todense(), ref.todense(), atol=1e-13)


@pytest.mark.slow
def test_batched_dmrg_matches_per_instance():
    N, chi, B = 6, 12, 2
    skel = uniform_skeleton_mps(N, chi, dtype=np.float64)
    data = random_data_batch(skel, B, seed=3)
    mpo = u1_xxz_mpo(1.0, 1.0, 0.0, N)
    dmrg = BatchedSymmetricDMRG(skel, data, mpo, num_krylov_vecs=20,
                                ritz_method="eigh")
    es = dmrg.run_one_site(num_sweeps=5)
    for b in range(B):
        mps_b = [BlockSparseTensor(np.asarray(data[i][b]),
                                   *_structure(skel[i])) for i in range(N)]
        solo = SymmetricFiniteDMRG(mps_b, mpo, engine="numpy")
        e_solo = solo.run_one_site(num_sweeps=5, num_krylov_vecs=20)
        np.testing.assert_allclose(es[b], e_solo, rtol=1e-9)


@pytest.mark.slow
def test_batched_dmrg_mpo_disorder():
    # per-realization couplings: same charge structure, different data
    N, chi, B = 6, 12, 2
    Jzs = [0.6, 1.7]
    skel = uniform_skeleton_mps(N, chi, dtype=np.float64)
    data = random_data_batch(skel, B, seed=4)
    mpos = [u1_xxz_mpo(Jz, 1.0, 0.0, N) for Jz in Jzs]
    mpo_data = [jnp.stack([jnp.asarray(mpos[b][i].data)
                           for b in range(B)]) for i in range(N)]
    dmrg = BatchedSymmetricDMRG(skel, data, mpos[0], mpo_data=mpo_data,
                                num_krylov_vecs=20, ritz_method="eigh")
    es = dmrg.run_one_site(num_sweeps=5)
    assert len(set(np.round(es, 6))) == B  # distinct disorder energies
    for b in range(B):
        mps_b = [BlockSparseTensor(np.asarray(data[i][b]),
                                   *_structure(skel[i])) for i in range(N)]
        solo = SymmetricFiniteDMRG(mps_b, mpos[b], engine="numpy")
        e_solo = solo.run_one_site(num_sweeps=5, num_krylov_vecs=20)
        np.testing.assert_allclose(es[b], e_solo, rtol=1e-9)


@pytest.mark.slow
def test_batched_dmrg_power_ritz_agrees():
    # the TPU-default power Ritz path converges to the same energies
    N, chi, B = 6, 10, 2
    skel = uniform_skeleton_mps(N, chi, dtype=np.float64)
    data = random_data_batch(skel, B, seed=5)
    mpo = u1_xxz_mpo(1.0, 1.0, 0.0, N)
    d1 = BatchedSymmetricDMRG(skel, [d for d in data], mpo,
                              num_krylov_vecs=20, ritz_method="eigh")
    e1 = d1.run_one_site(num_sweeps=5)
    d2 = BatchedSymmetricDMRG(skel, [d for d in data], mpo,
                              num_krylov_vecs=20, ritz_method="power")
    e2 = d2.run_one_site(num_sweeps=5)
    np.testing.assert_allclose(e1, e2, rtol=1e-7)


@pytest.mark.slow
def test_batched_dmrg_sharded_mesh():
    # data-parallel realizations over the virtual 8-device CPU mesh
    from tensornetwork_tpu.parallel.mesh import make_mesh
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    mesh = make_mesh((len(jax.devices()),), ("data",))
    N, chi, B = 6, 10, 8
    skel = uniform_skeleton_mps(N, chi, dtype=np.float64)
    data = random_data_batch(skel, B, seed=6)
    mpo = u1_xxz_mpo(1.0, 1.0, 0.0, N)
    d_ref = BatchedSymmetricDMRG(skel, [d for d in data], mpo,
                                 num_krylov_vecs=16, ritz_method="eigh")
    e_ref = d_ref.run_one_site(num_sweeps=4)
    d_sh = BatchedSymmetricDMRG(skel, [d for d in data], mpo,
                                num_krylov_vecs=16, ritz_method="eigh",
                                mesh=mesh)
    e_sh = d_sh.run_one_site(num_sweeps=4)
    np.testing.assert_allclose(e_sh, e_ref, rtol=1e-10)


@pytest.mark.slow
def test_batched_two_site_converges_to_sector_exact():
    # two-site batched sweep vs sector-projected exact diagonalization:
    # with a generous profile (chi >= sector dims) truncation is exact
    from tests.test_symmetric_dmrg import sector_ground_energy
    N, chi, B = 6, 16, 2
    skel = uniform_skeleton_mps(N, chi, dtype=np.float64)
    data = random_data_batch(skel, B, seed=7)
    mpo = u1_xxz_mpo(1.0, 1.0, 0.1, N)
    dmrg = BatchedSymmetricDMRG(skel, data, mpo, num_krylov_vecs=20,
                                ritz_method="eigh")
    es = dmrg.run_two_site(num_sweeps=6)
    exact = sector_ground_energy(N, 1.0, 1.0, 0.1, N // 2)
    np.testing.assert_allclose(es, np.full(B, exact), rtol=1e-7)
    terr = dmrg.truncation_errors[-1]
    assert np.all(terr < 1e-8)


@pytest.mark.slow
def test_batched_two_site_truncates_with_tight_profile():
    # a tight profile forces per-sector truncation; energies stay
    # variational (above exact) and truncation weights are recorded
    from tests.test_symmetric_dmrg import sector_ground_energy
    N, chi, B = 8, 8, 2
    skel = uniform_skeleton_mps(N, chi, dtype=np.float64)
    data = random_data_batch(skel, B, seed=8)
    mpo = u1_xxz_mpo(1.0, 1.0, 0.0, N)
    dmrg = BatchedSymmetricDMRG(skel, data, mpo, num_krylov_vecs=16,
                                ritz_method="eigh")
    es = dmrg.run_two_site(num_sweeps=5)
    exact = sector_ground_energy(N, 1.0, 1.0, 0.0, N // 2)
    assert np.all(es >= exact - 1e-9)
    assert np.all(np.isfinite(dmrg.truncation_errors[-1]))
    np.testing.assert_allclose(es, np.full(B, exact), rtol=2e-2)


def test_export_load_serialized_traces(tmp_path):
    # VERDICT r2 item 3: serialized-trace AOT artifacts — a second
    # solver instance loads the exported StableHLO instead of retracing
    # and reproduces the energies bit-exactly
    N, chi, B = 8, 16, 2
    skel = uniform_skeleton_mps(N, chi, dtype=np.float32)
    mpo = u1_xxz_mpo(1.0, 1.0, 0.0, N)
    data = random_data_batch(skel, B, seed=0)
    d1 = BatchedSymmetricDMRG(skel, [x.copy() for x in data], mpo,
                              num_krylov_vecs=10)
    n = d1.export_programs(str(tmp_path))
    assert n > 0
    es_ref = d1.run_one_site(num_sweeps=2)
    d2 = BatchedSymmetricDMRG(skel, [x.copy() for x in data], mpo,
                              num_krylov_vecs=10)
    m = d2.load_programs(str(tmp_path))
    assert m == n
    es2 = d2.run_one_site(num_sweeps=2)
    np.testing.assert_array_equal(es_ref, es2)
    # loaded programs are installed under the exact keys _program() uses
    assert all(not hasattr(p, "theta") for p in d2._programs.values())
