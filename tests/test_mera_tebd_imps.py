"""MERA / TEBD / InfiniteMPS tests (reference strategy:
``examples/simple_mera/simple_mera_test.py``,
``examples/wavefunctions/wavefunctions_test.py``,
``matrixproductstates/infinite_mps_test.py``)."""
import jax
import jax.numpy as jnp
import numpy as np

from tensornetwork_tpu.models import mera, tebd, FiniteMPS, InfiniteMPS


# -- MERA --------------------------------------------------------------------

def test_mera_ascend_identity():
    state = mera.initialize_mera(4, 1)
    ident = jnp.eye(64).reshape((4,) * 6)
    out = mera.ascend(ident, state.us[0], state.ws[0])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ident),
                               atol=1e-12)


def test_mera_descend_is_adjoint(rng):
    state = mera.initialize_mera(4, 1)
    h = jnp.asarray(rng.standard_normal((4,) * 6))
    r = jnp.asarray(rng.standard_normal((4,) * 6))
    lhs = jnp.einsum("abcdef,defabc->", r,
                     mera.ascend(h, state.us[0], state.ws[0]))
    rhs = jnp.einsum("abcdef,defabc->",
                     mera.descend(r, state.us[0], state.ws[0]), h)
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-10)


def test_mera_critical_ising_energy():
    # reference anchor: critical TFI energy -4/pi per spin
    # (``simple_mera_test.py`` checks the same physics)
    h3 = mera.blocked_ising_hamiltonian()
    state = mera.initialize_mera(4, num_layers=3)
    state, e = mera.optimize_mera(h3, state, num_iterations=60)
    per_spin = e / 2.0
    target = -4.0 / np.pi
    assert abs(per_spin - target) / abs(target) < 0.01
    # isometry constraints are preserved by the polar updates
    for u, w in zip(state.us, state.ws):
        um = np.asarray(u).reshape(16, 16)
        np.testing.assert_allclose(um @ um.T, np.eye(16), atol=1e-10)
        wm = np.asarray(w).reshape(4, 16)
        np.testing.assert_allclose(wm @ wm.T, np.eye(4), atol=1e-10)


# -- TEBD --------------------------------------------------------------------

def _tfi_h2(J=-1.0, h=-1.0):
    X = np.array([[0.0, 1.0], [1.0, 0.0]])
    Z = np.diag([1.0, -1.0])
    I = np.eye(2)
    return (J * np.kron(X, X) + h / 2 *
            (np.kron(Z, I) + np.kron(I, Z)))


def test_trotter_gate_unitary():
    g = tebd.trotter_gate(_tfi_h2(), 0.1)
    gm = np.asarray(g).reshape(4, 4)
    np.testing.assert_allclose(gm @ gm.conj().T, np.eye(4), atol=1e-10)


def test_exact_evolution_conserves_energy():
    N = 8
    h2 = _tfi_h2()
    rng = np.random.default_rng(0)
    psi = rng.standard_normal((2,) * N)
    psi /= np.linalg.norm(psi)
    psi_t = tebd.evolve_exact(jnp.asarray(psi), h2, dt=0.01, num_steps=20)
    # norm preserved
    np.testing.assert_allclose(float(jnp.linalg.norm(psi_t)), 1.0,
                               rtol=1e-8)

    def energy_exact(p):
        e = 0.0
        h = h2.reshape(2, 2, 2, 2)
        for b in range(N - 1):
            hp = np.asarray(tebd.apply_two_site_gate_exact(
                jnp.asarray(p), jnp.asarray(h, p.dtype), b))
            e += np.real(np.vdot(np.asarray(p).ravel(), hp.ravel()))
        return e

    e0 = energy_exact(psi)
    e1 = energy_exact(np.asarray(psi_t))
    # Trotterized unitary evolution approximately conserves energy
    np.testing.assert_allclose(e1, e0, atol=0.05)


def test_tebd_mps_matches_exact():
    N = 6
    h2 = _tfi_h2()
    # product state |0...0> embedded in chi=8
    chi = 8
    As = np.zeros((N, chi, 2, chi))
    As[:, 0, 0, 0] = 1.0
    mps = FiniteMPS(jnp.asarray(As), canonicalize=False)
    psi0 = np.zeros((2,) * N); psi0[(0,) * N] = 1.0
    dt, steps = 0.05, 6
    _, terr = tebd.evolve_mps(mps, h2, dt, steps,
                              max_singular_values=chi)
    psi_exact = tebd.evolve_exact(jnp.asarray(psi0), h2, dt, steps)
    # MPS applies bonds sequentially; exact uses even/odd splitting — both
    # are O(dt^2) integrators of the same Hamiltonian
    blk = np.asarray(mps.to_dense())
    psi_mps = blk[0, ..., 0]
    psi_mps = psi_mps / np.linalg.norm(psi_mps)
    fid = abs(np.vdot(psi_mps.ravel(), np.asarray(psi_exact).ravel()))
    assert fid > 0.995
    assert terr < 1e-6


def test_imaginary_tebd_lowers_energy():
    N = 6
    h2 = _tfi_h2()
    mps = FiniteMPS.random(N, 8, seed=1)
    e_start = tebd.measure_energy(mps, h2)
    energies, _ = tebd.evolve_mps(mps, h2, dt=0.1, num_steps=15,
                                  imaginary=True, max_singular_values=8)
    assert energies[-1] < e_start
    # compare against exact ground energy of the open chain
    H = np.zeros((2 ** N, 2 ** N))
    h = h2
    for b in range(N - 1):
        H += np.kron(np.kron(np.eye(2 ** b), h),
                     np.eye(2 ** (N - b - 2)))
    e_exact = np.linalg.eigvalsh(H)[0]
    assert energies[-1] - e_exact < 0.3


# -- InfiniteMPS -------------------------------------------------------------

def test_imps_canonicalize():
    imps = InfiniteMPS.random(2, 8, seed=0)
    eta, r = imps.canonicalize()
    assert eta > 0
    assert imps.check_right_canonical() < 1e-8
    # after canonicalization the transfer eigenvalue is 1
    evals, _ = imps.transfer_matrix_eigs("right", 1)
    np.testing.assert_allclose(abs(evals[0]), 1.0, rtol=1e-8)


def test_imps_product_state_measurement():
    # product state |up> on every site: <Z> = 1
    chi, d = 4, 2
    A = np.zeros((1, chi, d, chi))
    A[0, 0, 0, 0] = 1.0
    imps = InfiniteMPS(jnp.asarray(A))
    Z = np.diag([1.0, -1.0])
    val = imps.measure_local_operator(Z)
    np.testing.assert_allclose(float(np.real(val)), 1.0, atol=1e-8)


def test_imps_transfer_eigs_against_dense():
    imps = InfiniteMPS.random(1, 5, seed=2)
    evals, _ = imps.transfer_matrix_eigs("left", 1, num_krylov_vecs=25)
    A = np.asarray(imps.As[0])
    T = np.einsum("asc,bsd->abcd", A, A).reshape(25, 25)
    dense = np.linalg.eigvals(T)
    dom = dense[np.argmax(np.abs(dense))]
    np.testing.assert_allclose(abs(evals[0]), abs(dom), rtol=1e-8)


def test_imps_correlator_product_state():
    # product |up> state: <Z_0 Z_r> = 1 for all r, and <Z X> = 0
    chi, d = 3, 2
    A = np.zeros((1, chi, d, chi))
    A[0, 0, 0, 0] = 1.0
    imps = InfiniteMPS(jnp.asarray(A))
    Z = np.diag([1.0, -1.0])
    X = np.array([[0.0, 1.0], [1.0, 0.0]])
    vals = imps.measure_two_body_correlator(Z, Z, 0, [1, 3, 5])
    np.testing.assert_allclose(np.real(np.asarray(vals)), 1.0, atol=1e-8)
    vals2 = imps.measure_two_body_correlator(Z, X, 0, [2])
    np.testing.assert_allclose(np.real(np.asarray(vals2)), 0.0, atol=1e-8)


def test_imps_correlator_decays_for_random_state():
    imps = InfiniteMPS.random(1, 6, seed=5)
    imps.canonicalize()
    Z = np.diag([1.0, -1.0])
    vals = imps.measure_two_body_correlator(Z, Z, 0, [1, 4, 8])
    vals = np.abs(np.asarray(vals))
    # generic states have exponentially decaying connected correlations;
    # the raw correlator tends to <Z>^2
    z = float(np.real(imps.measure_local_operator(Z)))
    assert abs(vals[-1] - z * z) < abs(vals[0] - z * z) + 1e-6


def test_imps_correlator_same_site_and_empty():
    chi, d = 3, 2
    A = np.zeros((1, chi, d, chi)); A[0, 0, 0, 0] = 1.0
    imps = InfiniteMPS(jnp.asarray(A))
    Z = np.diag([1.0, -1.0])
    vals = imps.measure_two_body_correlator(Z, Z, 0, [0, 2])
    np.testing.assert_allclose(np.real(np.asarray(vals)), 1.0, atol=1e-8)
    assert imps.measure_two_body_correlator(Z, Z, 0, []) == []


def test_imps_complex_dtype_canonicalize():
    # complex unit cell: phase handling in the fixed points must be robust
    rng_ = np.random.default_rng(3)
    A = (rng_.standard_normal((1, 6, 2, 6))
         + 1j * rng_.standard_normal((1, 6, 2, 6))) / np.sqrt(12)
    imps = InfiniteMPS(jnp.asarray(A))
    eta, r = imps.canonicalize()
    assert np.isfinite(eta)
    assert imps.check_right_canonical() < 1e-6
