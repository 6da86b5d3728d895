"""dtype sweeps over the core compute paths (reference pattern:
``tests/testing_utils.py`` safe_randn dtype x backend sweeps; VERDICT
r2 item 8).  The TPU path is f32; f64 runs off-chip and anchors
correctness."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensornetwork_tpu.models import FiniteTFI
from tensornetwork_tpu.models.dmrg import (one_site_sweep, two_site_sweep,
                                           random_mps_stack,
                                           mps_mpo_expectation)
from tensornetwork_tpu.ops import decompositions as dec
from tensornetwork_tpu.ops import krylov

DTYPES = [jnp.float32, jnp.float64]


def _tol(dtype):
    return 1e-4 if dtype == jnp.float32 else 1e-9


@pytest.mark.parametrize("dtype", DTYPES)
def test_one_site_sweep_dtype(dtype):
    N, chi = 6, 8
    mpo = FiniteTFI(Jx=-1.0, Bz=-0.6, N=N, dtype=dtype)
    As = random_mps_stack(jax.random.PRNGKey(0), N, chi, 2, dtype)
    res = one_site_sweep(As, mpo.Ws, mpo.vL, mpo.vR, num_krylov_vecs=12)
    assert res.As.dtype == dtype
    e_sweep = float(res.energy)
    e_expect = float(mps_mpo_expectation(res.As, mpo.Ws, mpo.vL, mpo.vR))
    np.testing.assert_allclose(e_sweep, e_expect, rtol=_tol(dtype))


@pytest.mark.parametrize("dtype", DTYPES)
def test_two_site_sweep_dtype(dtype):
    N, chi = 6, 6
    mpo = FiniteTFI(Jx=-1.0, Bz=-0.9, N=N, dtype=dtype)
    As = random_mps_stack(jax.random.PRNGKey(1), N, chi, 2, dtype)
    res = two_site_sweep(As, mpo.Ws, mpo.vL, mpo.vR, num_krylov_vecs=12)
    assert res.As.dtype == dtype
    assert np.isfinite(float(res.trunc_err))


@pytest.mark.parametrize("dtype", DTYPES)
def test_svd_masked_dtype(dtype):
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((12, 9)), dtype)
    res = dec.svd_masked(a, max_singular_values=5)
    assert res.u.dtype == dtype
    rec = (res.u * res.s[None, :]) @ res.vh
    s_full = np.linalg.svd(np.asarray(a, np.float64), compute_uv=False)
    err = np.linalg.norm(np.asarray(rec, np.float64)
                         - np.asarray(a, np.float64))
    np.testing.assert_allclose(err, np.linalg.norm(s_full[5:]),
                               rtol=1e-3 if dtype == jnp.float32 else 1e-9)


@pytest.mark.parametrize("dtype", DTYPES)
def test_ns_polar_dtype(dtype):
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.standard_normal((16, 8)), dtype)
    Q, P = dec.ns_polar(a)
    assert Q.dtype == dtype
    tol = 1e-4 if dtype == jnp.float32 else 1e-10
    np.testing.assert_allclose(np.asarray(Q.T @ Q), np.eye(8), atol=tol)
    np.testing.assert_allclose(np.asarray(Q @ P), np.asarray(a), atol=tol)


@pytest.mark.parametrize("dtype", DTYPES)
def test_cholqr2_dtype(dtype):
    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.standard_normal((20, 6)), dtype)
    Q, R = dec.cholqr2(a)
    tol = 1e-4 if dtype == jnp.float32 else 1e-10
    np.testing.assert_allclose(np.asarray(Q.T @ Q), np.eye(6), atol=tol)
    np.testing.assert_allclose(np.asarray(Q @ R), np.asarray(a), atol=tol)


@pytest.mark.parametrize("dtype", DTYPES)
def test_lanczos_dtype(dtype):
    rng = np.random.default_rng(3)
    n = 30
    H = rng.standard_normal((n, n))
    H = jnp.asarray((H + H.T) / 2, dtype)
    v0 = jnp.asarray(rng.standard_normal(n), dtype)
    evals, evecs = krylov.eigsh_lanczos(lambda x: H @ x, v0,
                                        num_krylov_vecs=25, numeig=1)
    exact = np.linalg.eigvalsh(np.asarray(H, np.float64))[0]
    np.testing.assert_allclose(float(evals[0]), exact, rtol=_tol(dtype))
    assert evecs.dtype == dtype


@pytest.mark.parametrize("dtype", DTYPES)
def test_gmres_dtype(dtype):
    rng = np.random.default_rng(4)
    n = 24
    A = jnp.asarray(rng.standard_normal((n, n)) + 4 * np.eye(n), dtype)
    b = jnp.asarray(rng.standard_normal(n), dtype)
    x, _ = krylov.gmres(lambda v: A @ v, b, num_krylov_vectors=24,
                        maxiter=4, tol=1e-10)
    np.testing.assert_allclose(np.asarray(A @ x), np.asarray(b),
                               atol=1e-3 if dtype == jnp.float32 else 1e-8)


@pytest.mark.parametrize("dtype", DTYPES)
def test_subspace_truncate_dtype(dtype):
    rng = np.random.default_rng(5)
    # numerically rank-6 matrix like a DMRG theta
    u = rng.standard_normal((14, 6))
    v = rng.standard_normal((6, 12))
    a = jnp.asarray(u @ v, dtype)
    st = dec.subspace_truncate(a, 6, iters=8, orth="polar")
    rec = st.q @ st.rest
    tol = 1e-3 if dtype == jnp.float32 else 1e-8
    np.testing.assert_allclose(np.asarray(rec), np.asarray(a), atol=tol)
    assert float(st.trunc_sq_norm) < tol


@pytest.mark.parametrize("dtype", DTYPES)
def test_tebd_gate_dtype(dtype):
    from tensornetwork_tpu.models.mps import FiniteMPS
    mps = FiniteMPS.random(5, 4, 2, dtype=dtype)
    n0 = float(mps.norm())
    gate = jnp.asarray(np.kron(np.eye(2), np.eye(2)).reshape(2, 2, 2, 2),
                       dtype)
    mps.apply_two_site_gate(gate, 1, 2)
    # identity gate preserves the state norm
    tol = 1e-4 if dtype == jnp.float32 else 1e-10
    assert abs(float(mps.norm()) - n0) < tol * max(n0, 1.0)
