"""Krylov solver tests vs numpy/scipy oracles (mirrors reference
``backends/jax/jitted_functions_test.py`` strategy)."""
import jax
import jax.numpy as jnp
import numpy as np

from tensornetwork_tpu.ops import krylov


def _herm(rng, n):
    a = rng.standard_normal((n, n))
    return (a + a.T) / 2


def test_lanczos_ground_state(rng):
    n = 50
    H = _herm(rng, n)
    exact = np.linalg.eigvalsh(H)[0]
    v0 = jnp.asarray(rng.standard_normal(n))
    mv = lambda x: jnp.asarray(H) @ x
    evals, evecs = krylov.eigsh_lanczos(mv, v0, num_krylov_vecs=40, numeig=1)
    np.testing.assert_allclose(float(evals[0]), exact, rtol=1e-8)
    v = np.asarray(evecs[0])
    np.testing.assert_allclose(H @ v, exact * v, atol=1e-6)


def test_lanczos_multiple_eigs(rng):
    n = 60
    H = _herm(rng, n)
    exact = np.linalg.eigvalsh(H)[:3]
    v0 = jnp.asarray(rng.standard_normal(n))
    mv = lambda x: jnp.asarray(H) @ x
    evals, _ = krylov.eigsh_lanczos(mv, v0, num_krylov_vecs=60, numeig=3)
    np.testing.assert_allclose(np.asarray(evals), exact, rtol=1e-7)


def test_lanczos_tensor_shaped_state(rng):
    # matvec on a (4, 5) shaped state, as DMRG uses
    n = 20
    H = _herm(rng, n)
    v0 = jnp.asarray(rng.standard_normal((4, 5)))
    mv = lambda x: (jnp.asarray(H) @ x.reshape(-1)).reshape(4, 5)
    evals, evecs = krylov.eigsh_lanczos(mv, v0, num_krylov_vecs=20)
    assert evecs.shape == (1, 4, 5)
    np.testing.assert_allclose(float(evals[0]), np.linalg.eigvalsh(H)[0],
                               rtol=1e-8)


def test_lanczos_under_jit_and_vmap(rng):
    n = 16
    batch = 4
    Hs = np.stack([_herm(rng, n) for _ in range(batch)])
    v0s = jnp.asarray(rng.standard_normal((batch, n)))

    def solve(H, v0):
        return krylov.eigsh_lanczos(lambda x: H @ x, v0,
                                    num_krylov_vecs=16)[0][0]

    evals = jax.jit(jax.vmap(solve))(jnp.asarray(Hs), v0s)
    exact = np.array([np.linalg.eigvalsh(H)[0] for H in Hs])
    np.testing.assert_allclose(np.asarray(evals), exact, rtol=1e-7)


def test_arnoldi_eigs_dominant(rng):
    n = 40
    A = rng.standard_normal((n, n))
    exact = np.linalg.eigvals(A)
    dom = exact[np.argmax(np.abs(exact))]
    v0 = jnp.asarray(rng.standard_normal(n))
    evals, vecs = krylov.eigs(lambda x: jnp.asarray(A) @ x, v0,
                              num_krylov_vecs=40, numeig=1)
    np.testing.assert_allclose(np.abs(evals[0]), np.abs(dom), rtol=1e-6)


def test_gmres(rng):
    n = 30
    A = np.eye(n) * 4 + rng.standard_normal((n, n)) * 0.3
    b = rng.standard_normal(n)
    x, _ = krylov.gmres(lambda v: jnp.asarray(A) @ v, jnp.asarray(b),
                        num_krylov_vectors=30, maxiter=3)
    np.testing.assert_allclose(A @ np.asarray(x), b, atol=1e-6)


def test_gmres_with_x0_and_restarts(rng):
    n = 50
    A = np.eye(n) * 5 + rng.standard_normal((n, n)) * 0.2
    b = rng.standard_normal(n)
    x0 = jnp.asarray(rng.standard_normal(n))
    x, info = krylov.gmres(lambda v: jnp.asarray(A) @ v, jnp.asarray(b),
                           x0=x0, num_krylov_vectors=20, maxiter=6)
    assert info == 0
    np.testing.assert_allclose(A @ np.asarray(x), b, atol=1e-5)


def test_eigsh_which(rng):
    n = 30
    H = _herm(rng, n)
    exact = np.linalg.eigvalsh(H)
    v0 = jnp.asarray(rng.standard_normal(n))
    mv = lambda x: jnp.asarray(H) @ x
    lo, _ = krylov.eigsh(mv, v0, num_krylov_vecs=30, which="SA")
    hi, _ = krylov.eigsh(mv, v0, num_krylov_vecs=30, which="LA")
    np.testing.assert_allclose(float(lo[0]), exact[0], rtol=1e-8)
    np.testing.assert_allclose(float(hi[0]), exact[-1], rtol=1e-8)


def test_lanczos_power_ritz_ground_state(rng):
    # ritz_method="power" (shifted power iteration on the tridiagonal
    # projection) must agree with the eigh path for numeig=1
    n = 50
    H = _herm(rng, n)
    exact = np.linalg.eigvalsh(H)[0]
    v0 = jnp.asarray(rng.standard_normal(n))
    mv = lambda x: jnp.asarray(H) @ x
    # cold start (random v0 => e1 warm start is uninformed): needs more
    # descent steps than the warm-started DMRG usage
    evals, evecs = krylov.eigsh_lanczos(
        mv, v0, num_krylov_vecs=40, numeig=1, ritz_method="power",
        power_iters=150)
    np.testing.assert_allclose(float(evals[0]), exact, rtol=1e-8)
    v = np.asarray(evecs[0])
    np.testing.assert_allclose(H @ v, exact * v, atol=1e-5)


# ---------------------------------------------------------------------------
# Implicitly-restarted solvers + Givens GMRES (VERDICT round 1, item 5)
# ---------------------------------------------------------------------------


def test_iram_nonhermitian_numeig4(rng):
    """VERDICT done-criterion: numeig=4 Arnoldi parity vs scipy on a
    non-Hermitian operator, no per-restart host syncs (the whole restart
    loop is one compiled while_loop)."""
    import scipy.sparse.linalg as spla
    n = 120
    A = rng.standard_normal((n, n)) / np.sqrt(n)
    # make the dominant spectrum well separated
    A = A + np.diag(np.linspace(0.0, 2.0, n))
    v0 = jnp.asarray(rng.standard_normal(n))
    mv = lambda x: jnp.asarray(A) @ x
    evals, evecs = krylov.iram(mv, v0, num_krylov_vecs=30, numeig=4,
                               which="LM", maxiter=60, tol=1e-9)
    ref = spla.eigs(A, k=4, which="LM", return_eigenvectors=False)
    np.testing.assert_allclose(np.sort_complex(np.asarray(evals)),
                               np.sort_complex(ref), rtol=1e-5, atol=1e-7)
    # residuals of the returned eigenpairs
    for lam, v in zip(evals, evecs):
        v = np.asarray(v)
        assert np.linalg.norm(A @ v - lam * v) < 1e-4


def test_iram_complex_pairs(rng):
    """Real operator with dominant complex-conjugate eigenvalue pair:
    double-shift path."""
    import scipy.sparse.linalg as spla
    n = 80
    A = rng.standard_normal((n, n)) / np.sqrt(n)
    # plant a dominant rotation block (eigenvalues 2 +/- 1j)
    A[:2, :2] = [[2.0, -1.0], [1.0, 2.0]]
    A[:2, 2:] = 0.0
    A[2:, :2] = 0.0
    v0 = jnp.asarray(rng.standard_normal(n))
    mv = lambda x: jnp.asarray(A) @ x
    evals, _ = krylov.iram(mv, v0, num_krylov_vecs=24, numeig=2,
                           which="LM", maxiter=40, tol=1e-8)
    ref = spla.eigs(A, k=2, which="LM", return_eigenvectors=False)
    np.testing.assert_allclose(sorted(np.asarray(evals).imag),
                               sorted(ref.imag), atol=1e-5)
    np.testing.assert_allclose(sorted(np.asarray(evals).real),
                               sorted(ref.real), atol=1e-5)


def test_ir_lanczos_smallest(rng):
    n = 200
    H = _herm(rng, n)
    exact = np.linalg.eigvalsh(H)[:3]
    v0 = jnp.asarray(rng.standard_normal(n))
    mv = lambda x: jnp.asarray(H) @ x
    evals, evecs = krylov.ir_lanczos(mv, v0, num_krylov_vecs=20, numeig=3,
                                     which="SA", maxiter=60, tol=1e-10)
    np.testing.assert_allclose(np.asarray(evals), exact, rtol=1e-7)
    for lam, v in zip(np.asarray(evals), np.asarray(evecs)):
        assert np.linalg.norm(H @ v - lam * v) < 1e-5


def test_ir_lanczos_largest_and_tensor_shape(rng):
    n = 64
    H = _herm(rng, n)
    exact = np.linalg.eigvalsh(H)[-1]
    v0 = jnp.asarray(rng.standard_normal((8, 8)))
    mv = lambda x: (jnp.asarray(H) @ x.reshape(-1)).reshape(8, 8)
    evals, evecs = krylov.ir_lanczos(mv, v0, num_krylov_vecs=16, numeig=1,
                                     which="LA", maxiter=40, tol=1e-10)
    assert evecs.shape == (1, 8, 8)
    np.testing.assert_allclose(float(evals[0]), exact, rtol=1e-6)


def test_gmres_givens_matches_solve(rng):
    n = 60
    A = rng.standard_normal((n, n)) + n * np.eye(n)  # well conditioned
    b = rng.standard_normal(n)
    mv = lambda x: jnp.asarray(A) @ x
    x, info = krylov.gmres(mv, jnp.asarray(b), num_krylov_vectors=60,
                           maxiter=1, tol=1e-10)
    assert info == 0
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(A, b),
                               rtol=1e-5, atol=1e-7)


def test_gmres_givens_restarts_and_x0(rng):
    n = 100
    A = rng.standard_normal((n, n)) + 4 * np.sqrt(n) * np.eye(n)
    b = rng.standard_normal(n)
    x_exact = np.linalg.solve(A, b)
    mv = lambda x: jnp.asarray(A) @ x
    x0 = jnp.asarray(x_exact + 0.1 * rng.standard_normal(n))
    x, _ = krylov.gmres(mv, jnp.asarray(b), x0=x0, num_krylov_vectors=10,
                        maxiter=30, tol=1e-9)
    np.testing.assert_allclose(np.asarray(x), x_exact, rtol=1e-4, atol=1e-6)


def test_gmres_kernel_inside_jit(rng):
    """gmres_kernel must be traceable inside an outer jit (VUMPS uses it
    inside the compiled iteration)."""
    n = 32
    A = rng.standard_normal((n, n)) + n * np.eye(n)
    b = rng.standard_normal(n)

    @jax.jit
    def solve(bf):
        mv = lambda x: jnp.asarray(A) @ x
        x, rnorm = krylov.gmres_kernel(mv, bf, jnp.zeros_like(bf), 32, 2,
                                       1e-10)
        return x, rnorm

    x, rnorm = solve(jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(A, b),
                               rtol=1e-5, atol=1e-7)
    assert float(rnorm) < 1e-6


def _grcar(n):
    # Grcar matrix: the classic highly non-normal operator whose Ritz
    # values look stable long before the Ritz pairs are any good
    A = np.zeros((n, n))
    for i in range(n):
        A[i, i] = 1.0
        if i > 0:
            A[i, i - 1] = -1.0
        for k in (1, 2, 3):
            if i + k < n:
                A[i, i + k] = 1.0
    return A


def test_restart_convergence_is_residual_not_drift(rng):
    # VERDICT r2 item 5: near-defective operators can stall the
    # eigenvalue drift below tol without the Ritz residual being small.
    # On the Grcar matrix the wanted-|lambda| drift between consecutive
    # restarts dips below tol=1e-2 while the true residual stays O(1);
    # the residual-based criterion must keep reporting non-convergence.
    import functools
    n, m, numeig, tol = 100, 12, 1, 1e-2
    A = _grcar(n)
    Aj = jnp.asarray(A)
    mv = lambda x: Aj @ x
    v0 = jnp.asarray(np.random.default_rng(1).standard_normal(n))

    lam_prev = None
    min_drift = np.inf
    resid_at_min = None
    for maxiter in range(1, 8):
        V, H, it, conv = jax.jit(functools.partial(
            krylov._restarted_arnoldi_engine, mv, m=m, numeig=numeig,
            which="LM", maxiter=maxiter, tol=tol, hermitian=False))(v0)
        # the residual criterion must never accept: the Ritz residual is
        # O(1) at every restart here
        assert not bool(conv)
        Hm = np.asarray(H)[:m, :m]
        ev, U = np.linalg.eig(Hm)
        o = np.argsort(-np.abs(ev))
        lam, y = ev[o[0]], U[:, o[0]]
        ritz = np.asarray(V)[:m].T @ y
        ritz /= np.linalg.norm(ritz)
        resid = np.linalg.norm(A @ ritz - lam * ritz)
        if lam_prev is not None:
            # the old criterion compared the sort keys (|lambda|^2 for LM)
            drift = (abs(abs(lam) ** 2 - abs(lam_prev) ** 2)
                     / max(abs(lam) ** 2, 1.0))
            if drift < min_drift:
                min_drift, resid_at_min = drift, resid
        lam_prev = lam
    # drift stalls below tol (the old criterion would have accepted)...
    assert min_drift < tol, min_drift
    # ...while the pair it would have accepted has an O(1) residual
    assert resid_at_min > 0.1, resid_at_min


def test_hermitian_restart_residual_not_drift_clustered_spectrum(rng):
    # VERDICT r3 item 10, Hermitian side: a spectrum accumulating at the
    # top edge with sqrt spacing (gap shrinks toward the extreme value)
    # makes the leading Ritz value stall — drift between consecutive
    # restarts falls ORDERS below tol while the true residual is still
    # above it.  The residual criterion must keep reporting
    # non-convergence through the stall and flip only when the residual
    # itself crosses tol.
    import functools
    n, m, numeig, tol = 1500, 8, 1, 1e-6
    lrng = np.random.default_rng(0)
    evs = 1.0 - (np.arange(n) / n) ** 0.5
    Q, _ = np.linalg.qr(lrng.standard_normal((n, n)))
    A = (Q * evs) @ Q.T
    Aj = jnp.asarray(A)
    mv = lambda x: Aj @ x
    v0 = jnp.asarray(lrng.standard_normal(n))

    lam_prev = None
    stall_seen = False
    for maxiter in range(1, 10):
        V, H, it, conv = jax.jit(functools.partial(
            krylov._restarted_arnoldi_engine, mv, m=m, numeig=numeig,
            which="LA", maxiter=maxiter, tol=tol, hermitian=True))(v0)
        Hm = np.asarray(H)[:m, :m]
        Hm = (Hm + Hm.T) / 2
        ev, U = np.linalg.eigh(Hm)
        lam, y = ev[-1], U[:, -1]
        ritz = np.asarray(V)[:m].T @ y
        ritz /= np.linalg.norm(ritz)
        resid = np.linalg.norm(A @ ritz - lam * ritz)
        if lam_prev is not None:
            drift = abs(lam - lam_prev)
            if drift < tol / 100 and resid > tol:
                # a drift-based criterion would have accepted here
                stall_seen = True
                assert not bool(conv), (maxiter, drift, resid)
        lam_prev = lam
    assert stall_seen
    # and with enough restarts the criterion does flip, at a genuinely
    # small residual
    V, H, it, conv = jax.jit(functools.partial(
        krylov._restarted_arnoldi_engine, mv, m=m, numeig=numeig,
        which="LA", maxiter=40, tol=tol, hermitian=True))(v0)
    assert bool(conv)
    Hm = np.asarray(H)[:m, :m]
    Hm = (Hm + Hm.T) / 2
    ev, U = np.linalg.eigh(Hm)
    lam, y = ev[-1], U[:, -1]
    ritz = np.asarray(V)[:m].T @ y
    ritz /= np.linalg.norm(ritz)
    assert np.linalg.norm(A @ ritz - lam * ritz) < 10 * tol


def test_residual_criterion_still_converges_clean_operator(rng):
    # sanity: on a well-separated operator the residual criterion does
    # reach convergence (conv flag True) and the pair is genuinely good
    import functools
    n, m = 40, 20
    A = np.diag(np.linspace(0.1, 1.0, n))
    A[0, 1] = 0.05  # mildly non-normal
    Aj = jnp.asarray(A)
    mv = lambda x: Aj @ x
    v0 = jnp.asarray(rng.standard_normal(n))
    V, H, it, conv = jax.jit(functools.partial(
        krylov._restarted_arnoldi_engine, mv, m=m, numeig=2,
        which="LM", maxiter=30, tol=1e-8, hermitian=False))(v0)
    assert bool(conv)
    evals, vecs = krylov.iram(mv, v0, num_krylov_vecs=m, numeig=1,
                              which="LM", maxiter=30, tol=1e-8)
    lam = complex(evals[0])
    v = np.asarray(vecs[0])
    assert abs(lam - 1.0) < 1e-6
    np.testing.assert_allclose(A @ v, (lam * v).real, atol=1e-5)
