"""FiniteMPS tests vs dense-state oracles (reference strategy:
``matrixproductstates/mps_test.py``)."""
import jax
import jax.numpy as jnp
import numpy as np

from tensornetwork_tpu.models import FiniteMPS


def dense_block(mps):
    """psi[a, i, b] with composite physical index i."""
    psi = np.asarray(mps.to_dense())
    chi = mps.bond_dim
    return psi.reshape(chi, -1, chi)


def test_random_is_normalized():
    mps = FiniteMPS.random(num_sites=6, bond_dim=8, seed=0)
    np.testing.assert_allclose(float(mps.norm()), 1.0, rtol=1e-10)


def test_canonicalize_preserves_state():
    mps = FiniteMPS.random(6, 8, seed=1, canonicalize=False)
    psi0 = dense_block(mps)
    psi0 = psi0 / np.linalg.norm(psi0)
    mps.canonicalize()
    psi1 = dense_block(mps)
    psi1 = psi1 / np.linalg.norm(psi1)
    # states equal up to sign/phase
    overlap = abs(np.sum(psi0 * psi1.conj()))
    np.testing.assert_allclose(overlap, 1.0, rtol=1e-10)
    assert float(mps.check_canonical()) < 1e-10


def test_position_shifts_center():
    mps = FiniteMPS.random(8, 6, seed=2)
    psi0 = dense_block(mps).copy()
    psi0 /= np.linalg.norm(psi0)
    mps.position(5)
    assert mps.center_position == 5
    assert float(mps.check_canonical()) < 1e-10
    psi1 = dense_block(mps).copy()
    psi1 /= np.linalg.norm(psi1)
    np.testing.assert_allclose(abs(np.sum(psi0 * psi1.conj())), 1.0,
                               rtol=1e-10)
    mps.position(2)
    assert float(mps.check_canonical()) < 1e-10


def test_measure_local_operator():
    mps = FiniteMPS.random(6, 8, seed=3)
    Z = np.diag([1.0, -1.0])
    vals = mps.measure_local_operator([Z] * 6, list(range(6)))
    psi = dense_block(mps)
    N = 6
    for site in range(N):
        psi_t = psi.reshape((mps.bond_dim,) + (2,) * N + (mps.bond_dim,))
        op_applied = np.tensordot(
            psi_t, Z, axes=[[1 + site], [1]])
        # tensordot moves the acted axis to the end; move it back
        op_applied = np.moveaxis(op_applied, -1, 1 + site)
        num = np.sum(op_applied * psi_t)
        den = np.sum(psi_t * psi_t)
        np.testing.assert_allclose(float(np.real(vals[site])), num / den,
                                   rtol=1e-10)


def test_measure_two_body_correlator():
    N = 6
    mps = FiniteMPS.random(N, 8, seed=4)
    Z = np.diag([1.0, -1.0])
    X = np.array([[0.0, 1.0], [1.0, 0.0]])
    sites2 = list(range(N))
    vals = mps.measure_two_body_correlator(Z, X, 3, sites2)
    psi = dense_block(mps).reshape((8,) + (2,) * N + (8,))
    den = np.sum(psi * psi)
    for j, v in zip(sites2, vals):
        op = psi.copy()
        # apply X at j then Z at 3 (or fused if equal)
        def apply(op_t, O, site):
            out = np.tensordot(op_t, O, axes=[[1 + site], [1]])
            return np.moveaxis(out, -1, 1 + site)
        if j == 3:
            acted = apply(psi, X, 3)
            acted = apply(acted, Z, 3)
        else:
            acted = apply(psi, X, j)
            acted = apply(acted, Z, 3)
        num = np.sum(acted * psi)
        np.testing.assert_allclose(float(np.real(v)), num / den, atol=1e-10)


def test_apply_two_site_gate_exact_when_rank_fits():
    # a bond-4 state in a chi=8 stack: theta rank <= 8, so the gate is exact
    N = 6
    small = FiniteMPS.random(N, 4, seed=5)
    As = jnp.pad(small.As, ((0, 0), (0, 4), (0, 0), (0, 4)))
    mps = FiniteMPS(As, canonicalize=False)
    rng = np.random.default_rng(0)
    h = rng.standard_normal((4, 4)); h = h + h.T
    u = np.asarray(jax.scipy.linalg.expm(-0.1j * jnp.asarray(h)))
    psi0 = np.asarray(mps.to_dense()).astype(complex)
    mps.As = mps.As.astype(jnp.complex128)
    gate = u.reshape(2, 2, 2, 2)
    terr = mps.apply_two_site_gate(gate, 2, 3)
    psi1 = np.asarray(mps.to_dense())
    psi_t = psi0.reshape((8,) + (2,) * N + (8,))
    acted = np.tensordot(psi_t, gate, axes=[[3, 4], [2, 3]])
    acted = np.moveaxis(acted, [-2, -1], [3, 4])
    np.testing.assert_allclose(
        psi1, acted.reshape(psi1.shape), atol=1e-8)
    assert float(terr) < 1e-12


def test_apply_two_site_gate_truncates_and_reports():
    # at full bond dimension a generic gate genuinely truncates
    N = 6
    mps = FiniteMPS.random(N, 8, seed=5)
    mps.position(2)
    rng = np.random.default_rng(0)
    h = rng.standard_normal((4, 4)); h = h + h.T
    u = np.asarray(jax.scipy.linalg.expm(-0.1j * jnp.asarray(h)))
    mps.As = mps.As.astype(jnp.complex128)
    terr = mps.apply_two_site_gate(u.reshape(2, 2, 2, 2), 2, 3)
    assert 0 < float(terr) < 0.1
    # tighter max_singular_values truncates more
    mps2 = FiniteMPS.random(N, 8, seed=5)
    mps2.As = mps2.As.astype(jnp.complex128)
    mps2.position(2)
    terr2 = mps2.apply_two_site_gate(u.reshape(2, 2, 2, 2), 2, 3,
                                     max_singular_values=4)
    assert float(terr2) > float(terr)


def test_apply_one_site_gate():
    N = 4
    mps = FiniteMPS.random(N, 4, seed=6)
    X = np.array([[0.0, 1.0], [1.0, 0.0]])
    psi0 = np.asarray(mps.to_dense())
    mps.apply_one_site_gate(X, 1)
    psi1 = np.asarray(mps.to_dense())
    psi_t = psi0.reshape((4,) + (2,) * N + (4,))
    acted = np.moveaxis(
        np.tensordot(psi_t, X, axes=[[2], [1]]), -1, 2)
    np.testing.assert_allclose(psi1, acted.reshape(psi1.shape), atol=1e-12)


def test_inner_product():
    a = FiniteMPS.random(5, 6, seed=7)
    b = FiniteMPS.random(5, 6, seed=8)
    pa = dense_block(a)
    pb = dense_block(b)
    np.testing.assert_allclose(
        float(a.inner(b)), np.sum(pa * pb.conj()), rtol=1e-10)
    np.testing.assert_allclose(float(a.inner(a)), float(a.norm())**2,
                               rtol=1e-10)


def test_ragged_open_boundary_embedding():
    # a conventional ragged open-boundary MPS embeds exactly
    rng = np.random.default_rng(1)
    ts = [rng.standard_normal((1, 2, 2)),
          rng.standard_normal((2, 2, 4)),
          rng.standard_normal((4, 2, 2)),
          rng.standard_normal((2, 2, 1))]
    mps = FiniteMPS(ts, canonicalize=False)
    assert mps.bond_dim == 4
    psi = np.asarray(mps.to_dense())
    # only the (0, ..., 0) block is populated
    oracle = np.einsum("asb,btc,cud,dve->stuv", *ts).reshape(2, 2, 2, 2)
    np.testing.assert_allclose(psi[0, ..., 0], oracle, atol=1e-12)
    assert np.allclose(np.delete(psi, 0, axis=0), 0)
    assert np.allclose(np.delete(psi, 0, axis=-1), 0)


def test_bond_dimensions_properties():
    mps = FiniteMPS.random(5, 8)
    assert mps.bond_dimensions == [8] * 6
    assert mps.physical_dimensions == [2] * 5
    assert len(mps) == 5


def test_envs_and_transfer_operator():
    mps = FiniteMPS.random(6, 5, seed=10)
    lenvs = mps.left_envs([0, 3])
    renvs = mps.right_envs([2, 5])
    np.testing.assert_allclose(np.asarray(lenvs[0]), np.eye(5), atol=1e-12)
    np.testing.assert_allclose(np.asarray(renvs[5]), np.eye(5), atol=1e-12)
    # transfer operator consistency: folding site 0 into the identity env
    out = mps.apply_transfer_operator(0, "left", jnp.eye(5,
                                                         dtype=mps.dtype))
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(mps.left_envs([1])[1]),
                               atol=1e-12)


def test_mps_save_load(tmp_path):
    import os
    mps = FiniteMPS.random(5, 4, seed=11)
    mps.position(2)
    path = os.path.join(tmp_path, "mps_ckpt")
    mps.save(path)
    loaded = FiniteMPS.load(path)
    np.testing.assert_allclose(np.asarray(loaded.As), np.asarray(mps.As))
    assert loaded.center_position == 2


def test_switch_backend_and_ncon_backend_kwarg(rng):
    import tensornetwork_tpu as tn
    a = tn.Node(rng.standard_normal((3, 3)))
    tn.switch_backend([a])
    out = tn.ncon([rng.standard_normal((2, 3)),
                   rng.standard_normal((3, 2))],
                  [(-1, 1), (1, -2)], backend="jax")
    assert np.asarray(out).shape == (2, 2)


# -- reference base_mps_test.py scenario batch (round 4): envs at every
# -- site set, orthonormality checks, transfer directions, error paths --
import pytest
import jax


def _dense_env_left(mps, s):
    # contraction of everything strictly left of site s (norm env)
    E = np.eye(mps.bond_dim)
    for k in range(s):
        A = np.asarray(mps.As[k])
        E = np.einsum("ac,asr,csp->rp", E, A, A)
    return E


def _dense_env_right(mps, s):
    E = np.eye(mps.bond_dim)
    for k in range(mps.num_sites - 1, s, -1):
        A = np.asarray(mps.As[k])
        E = np.einsum("rp,asr,csp->ac", E, A, A)
    return E


@pytest.mark.parametrize("sites", [[0], [3], [5], [0, 3, 5],
                                   [1, 4], list(range(6)), []])
def test_left_envs_match_dense(sites):
    mps = FiniteMPS.random(6, 8, seed=11)
    envs = mps.left_envs(sites)
    assert set(envs) == {int(s) for s in sites}
    for s in sites:
        np.testing.assert_allclose(np.asarray(envs[s]),
                                   _dense_env_left(mps, s), atol=1e-6)


@pytest.mark.parametrize("sites", [[0], [2], [5], [0, 2, 5],
                                   list(range(6))])
def test_right_envs_match_dense(sites):
    mps = FiniteMPS.random(6, 8, seed=12)
    envs = mps.right_envs(sites)
    for s in sites:
        np.testing.assert_allclose(np.asarray(envs[s]),
                                   _dense_env_right(mps, s), atol=1e-6)


@pytest.mark.parametrize("center", [0, 2, 5])
def test_check_orthonormality_after_position(center):
    mps = FiniteMPS.random(6, 8, seed=13)
    mps.position(center)
    for s in range(center):
        assert float(mps.check_orthonormality("l", s)) < 1e-5
    for s in range(center + 1, 6):
        assert float(mps.check_orthonormality("r", s)) < 1e-5
    assert float(mps.check_canonical()) < 1e-4


def test_position_out_of_range_raises():
    mps = FiniteMPS.random(4, 4, seed=1)
    with pytest.raises(ValueError):
        mps.position(-1)
    with pytest.raises(ValueError):
        mps.position(4)


def test_check_orthonormality_bad_which_raises():
    mps = FiniteMPS.random(4, 4, seed=1)
    with pytest.raises(ValueError):
        mps.check_orthonormality("x", 0)


@pytest.mark.parametrize("direction", [1, "l", "left", -1, "r", "right"])
def test_apply_transfer_operator_directions(direction):
    mps = FiniteMPS.random(5, 6, seed=14)
    m = np.eye(6)
    out = mps.apply_transfer_operator(2, direction, m)
    A = np.asarray(mps.As[2])
    if direction in (1, "l", "left"):
        oracle = np.einsum("ac,asr,csp->rp", m, A, A)
    else:
        oracle = np.einsum("rp,asr,csp->ac", m, A, A)
    np.testing.assert_allclose(np.asarray(out), oracle, atol=1e-6)


def test_apply_transfer_operator_bad_direction_raises():
    mps = FiniteMPS.random(4, 4, seed=1)
    with pytest.raises(ValueError):
        mps.apply_transfer_operator(1, "up", np.eye(4))


def test_measure_local_operator_mismatched_lengths_raises():
    mps = FiniteMPS.random(4, 4, seed=1)
    Z = np.diag([1.0, -1.0])
    with pytest.raises(ValueError):
        mps.measure_local_operator([Z, Z], [1])


def test_apply_two_site_gate_non_neighbor_raises():
    mps = FiniteMPS.random(5, 8, seed=2)
    gate = np.eye(4).reshape(2, 2, 2, 2)
    with pytest.raises(ValueError):
        mps.apply_two_site_gate(gate, 0, 2)


def test_physical_and_bond_dimension_properties():
    mps = FiniteMPS.random(5, 7, phys_dim=3, seed=3)
    assert mps.physical_dimensions == [3] * 5
    assert len(mps.bond_dimensions) == 6
    assert mps.phys_dim == 3 and mps.bond_dim == 7
    assert len(mps) == 5


@pytest.mark.parametrize("site", [0, 2, 4])
def test_apply_one_site_gate_dense_oracle(site):
    mps = FiniteMPS.random(5, 8, seed=15)
    H = np.array([[1.0, 1.0], [1.0, -1.0]]) / np.sqrt(2)
    # block state carries auxiliary boundary legs (chi, 2^N, chi)
    psi0 = np.asarray(mps.to_dense()).reshape((8,) + (2,) * 5 + (8,))
    mps.apply_one_site_gate(H, site)
    psi1 = np.asarray(mps.to_dense()).ravel()
    oracle = np.tensordot(psi0, H, axes=[[1 + site], [1]])
    oracle = np.moveaxis(oracle, -1, 1 + site).ravel()
    np.testing.assert_allclose(psi1, oracle, atol=1e-5)
