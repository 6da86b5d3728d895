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
