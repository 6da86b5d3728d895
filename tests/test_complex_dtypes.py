"""Native complex64/complex128 sweeps on the CPU path.

The reference sweeps complex dtypes across every backend
(``tests/testing_utils.py:25-60``); here the CPU execution layer is the
complex-capable path (the axon TPU backend raises UNIMPLEMENTED on
complex — lifted on-chip via ``ops/split_complex``), so these tests pin
down that ncon, the decompositions, the Krylov solvers, and a full DMRG
configuration run natively complex off-chip, and that the split-complex
representation agrees with the native one (VERDICT r3 item 4c).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tensornetwork_tpu as tn
from tensornetwork_tpu.models import FiniteTFI
from tensornetwork_tpu.models.dmrg import (mps_mpo_expectation,
                                           one_site_sweep,
                                           random_mps_stack,
                                           two_site_sweep)
from tensornetwork_tpu.ops import decompositions as dec
from tensornetwork_tpu.ops import krylov

CDTYPES = [jnp.complex64, jnp.complex128]


def _tol(dtype):
    return 2e-4 if dtype == jnp.complex64 else 1e-9


def _crandn(rng, shape, dtype):
    return jnp.asarray(rng.standard_normal(shape)
                       + 1j * rng.standard_normal(shape), dtype)


@pytest.mark.parametrize("dtype", CDTYPES)
def test_ncon_complex_matmul(dtype, rng):
    a = _crandn(rng, (4, 5), dtype)
    b = _crandn(rng, (5, 3), dtype)
    out = tn.ncon([a, b], [(-1, 1), (1, -2)])
    assert out.dtype == dtype
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(a) @ np.asarray(b),
                               atol=_tol(dtype))


@pytest.mark.parametrize("dtype", CDTYPES)
def test_ncon_complex_trace_and_conj(dtype, rng):
    a = _crandn(rng, (4, 4, 3), dtype)
    out = tn.ncon([a], [(1, 1, -1)])
    np.testing.assert_allclose(np.asarray(out),
                               np.trace(np.asarray(a), axis1=0, axis2=1),
                               atol=_tol(dtype))


@pytest.mark.parametrize("dtype", CDTYPES)
def test_svd_masked_complex(dtype, rng):
    a = _crandn(rng, (8, 6), dtype)
    res = dec.svd_masked(a, max_singular_values=3)
    assert res.u.dtype == dtype
    rec = (res.u * res.s[None, :].astype(dtype)) @ res.vh
    s = np.linalg.svd(np.asarray(a, np.complex128), compute_uv=False)
    err = np.linalg.norm(np.asarray(rec, np.complex128)
                         - np.asarray(a, np.complex128))
    np.testing.assert_allclose(err, np.linalg.norm(s[3:]),
                               rtol=1e-3 if dtype == jnp.complex64
                               else 1e-9)


@pytest.mark.parametrize("dtype", CDTYPES)
def test_ns_polar_complex(dtype, rng):
    a = _crandn(rng, (10, 4), dtype)
    Q, P = dec.ns_polar(a)
    tol = 1e-3 if dtype == jnp.complex64 else 1e-9
    np.testing.assert_allclose(np.asarray(Q.conj().T @ Q), np.eye(4),
                               atol=tol)
    np.testing.assert_allclose(np.asarray(Q @ P), np.asarray(a),
                               atol=tol)


@pytest.mark.parametrize("dtype", CDTYPES)
def test_eigsh_lanczos_complex_hermitian(dtype, rng):
    n = 20
    H = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    H = jnp.asarray((H + H.conj().T) / 2, dtype)
    v0 = _crandn(rng, (n,), dtype)
    evals, evecs = krylov.eigsh_lanczos(lambda x: H @ x, v0,
                                        num_krylov_vecs=n)
    exact = np.linalg.eigvalsh(np.asarray(H, np.complex128))[0]
    np.testing.assert_allclose(float(jnp.real(evals[0])), exact,
                               rtol=_tol(dtype))
    v = np.asarray(evecs[0])
    resid = np.linalg.norm(np.asarray(H, np.complex128) @ v
                           - exact * v)
    assert resid < (1e-2 if dtype == jnp.complex64 else 1e-7)


@pytest.mark.parametrize("dtype", CDTYPES)
def test_gmres_complex(dtype, rng):
    n = 16
    A = _crandn(rng, (n, n), dtype) + jnp.asarray(5 * np.eye(n), dtype)
    b = _crandn(rng, (n,), dtype)
    x, _ = krylov.gmres(lambda v: A @ v, b, num_krylov_vectors=n,
                        maxiter=4, tol=1e-12)
    np.testing.assert_allclose(np.asarray(A @ x), np.asarray(b),
                               atol=1e-3 if dtype == jnp.complex64
                               else 1e-7)


def test_expm_multiply_matches_scipy(rng):
    import scipy.linalg as sla
    n = 16
    H = rng.standard_normal((n, n))
    H = jnp.asarray((H + H.T) / 2)
    v = jnp.asarray(rng.standard_normal(n) + 0j)
    out = krylov.expm_multiply_lanczos(lambda x: H @ x, v, -0.1j,
                                       num_krylov_vecs=n)
    exact = sla.expm(-0.1j * np.asarray(H)) @ np.asarray(v)
    np.testing.assert_allclose(np.asarray(out), exact, atol=1e-8)


@pytest.mark.parametrize("dtype", CDTYPES)
def test_one_site_sweep_complex(dtype, rng):
    N, chi = 6, 8
    mpo = FiniteTFI(Jx=-1.0, Bz=-0.7, N=N, dtype=dtype)
    As = random_mps_stack(jax.random.PRNGKey(0), N, chi, 2, dtype)
    res = one_site_sweep(As, mpo.Ws, mpo.vL, mpo.vR, num_krylov_vecs=12)
    assert res.As.dtype == dtype
    e = complex(res.energy)
    # Hermitian H: the energy must be real
    assert abs(e.imag) < (1e-3 if dtype == jnp.complex64 else 1e-9)
    e_expect = complex(
        mps_mpo_expectation(res.As, mpo.Ws, mpo.vL, mpo.vR))
    np.testing.assert_allclose(e.real, e_expect.real, rtol=_tol(dtype))


def test_one_site_sweep_complex_matches_real_energy(rng):
    # the TFI MPO is real — a complex-dtype run must converge to the
    # same ground energy as the f64 run
    N, chi = 8, 12
    mpo_c = FiniteTFI(Jx=-1.0, Bz=-1.0, N=N, dtype=jnp.complex128)
    mpo_r = FiniteTFI(Jx=-1.0, Bz=-1.0, N=N, dtype=jnp.float64)
    As_c = random_mps_stack(jax.random.PRNGKey(1), N, chi, 2,
                            jnp.complex128)
    As_r = random_mps_stack(jax.random.PRNGKey(1), N, chi, 2,
                            jnp.float64)
    res_c = res_r = None
    for _ in range(5):
        res_c = one_site_sweep(
            As_c if res_c is None else res_c.As, mpo_c.Ws, mpo_c.vL,
            mpo_c.vR, num_krylov_vecs=12)
        res_r = one_site_sweep(
            As_r if res_r is None else res_r.As, mpo_r.Ws, mpo_r.vL,
            mpo_r.vR, num_krylov_vecs=12)
    np.testing.assert_allclose(complex(res_c.energy).real,
                               float(res_r.energy), rtol=1e-9)


def test_two_site_sweep_complex(rng):
    N, chi = 6, 6
    dtype = jnp.complex128
    mpo = FiniteTFI(Jx=-1.0, Bz=-0.9, N=N, dtype=dtype)
    As = random_mps_stack(jax.random.PRNGKey(2), N, chi, 2, dtype)
    res = two_site_sweep(As, mpo.Ws, mpo.vL, mpo.vR, num_krylov_vecs=12)
    assert res.As.dtype == dtype
    assert np.isfinite(float(np.real(res.trunc_err)))
    assert abs(complex(res.energy).imag) < 1e-9


def test_split_complex_matches_native_lanczos(rng):
    # SC pytree Lanczos vs native complex Lanczos on the same operator
    from tensornetwork_tpu.ops import split_complex as sc
    n = 24
    H = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    H = (H + H.conj().T) / 2
    Hj = jnp.asarray(H)
    Hre, Him = jnp.real(Hj), jnp.imag(Hj)
    v0 = rng.standard_normal(n) + 1j * rng.standard_normal(n)

    def mv_native(x):
        return Hj @ x

    def mv_sc(x):
        re = Hre @ x.re - Him @ x.im
        im = Hre @ x.im + Him @ x.re
        return sc.SC(re, im)

    ev_n, _ = krylov.eigsh_lanczos(mv_native, jnp.asarray(v0),
                                   num_krylov_vecs=n)
    V, alphas, betas = krylov.lanczos_factorization_sc(
        mv_sc, sc.SC(jnp.asarray(v0.real), jnp.asarray(v0.imag)), n)
    T = (np.diag(np.asarray(alphas)) + np.diag(np.asarray(betas), 1)
         + np.diag(np.asarray(betas), -1))
    T = np.where(np.abs(T) >= 1e9, 0.0, T)
    ev_sc = np.linalg.eigvalsh(T)[0]
    exact = np.linalg.eigvalsh(H)[0]
    np.testing.assert_allclose(float(jnp.real(ev_n[0])), exact,
                               atol=1e-9)
    np.testing.assert_allclose(ev_sc, exact, atol=1e-9)


def test_split_complex_expm_matches_native(rng):
    from tensornetwork_tpu.ops import split_complex as sc
    n = 16
    H = rng.standard_normal((n, n))
    H = (H + H.T) / 2
    Hj = jnp.asarray(H)
    v0 = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    dt = 0.07
    native = krylov.expm_multiply_lanczos(
        lambda x: Hj @ x, jnp.asarray(v0), -1j * dt, num_krylov_vecs=n)
    split = krylov.expm_multiply_lanczos_sc(
        lambda x: sc.SC(Hj @ x.re, Hj @ x.im),
        sc.SC(jnp.asarray(v0.real), jnp.asarray(v0.imag)),
        -1j * dt, num_krylov_vecs=n)
    np.testing.assert_allclose(np.asarray(split.re),
                               np.real(np.asarray(native)), atol=1e-8)
    np.testing.assert_allclose(np.asarray(split.im),
                               np.imag(np.asarray(native)), atol=1e-8)
