"""Tensor wrapper + functional linalg tests (reference strategy:
``tests/tensor_test.py``, ``linalg/tests``)."""
import jax.numpy as jnp
import numpy as np
import pytest

import tensornetwork_tpu as tn
from tensornetwork_tpu.core.tensor import Tensor, NconBuilder
from tensornetwork_tpu.core import linalg as la


def test_tensor_basics(rng):
    a = Tensor(rng.standard_normal((3, 4)))
    assert a.shape == (3, 4)
    assert a.ndim == 2
    assert a.size == 12
    np.testing.assert_allclose(np.asarray(a.T.array),
                               np.asarray(a.array).T)
    c = Tensor(rng.standard_normal((2, 2)) + 1j * rng.standard_normal((2, 2)))
    np.testing.assert_allclose(np.asarray(c.H.array),
                               np.conj(np.asarray(c.array)).T)


def test_tensor_arithmetic(rng):
    a = Tensor(rng.standard_normal((3, 3)))
    b = Tensor(rng.standard_normal((3, 3)))
    np.testing.assert_allclose(np.asarray((a + b).array),
                               np.asarray(a.array) + np.asarray(b.array))
    np.testing.assert_allclose(np.asarray((a @ b).array),
                               np.asarray(a.array) @ np.asarray(b.array),
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray((2.0 * a - a / 2.0).array),
                               1.5 * np.asarray(a.array))


def test_ncon_builder(rng):
    a = Tensor(rng.standard_normal((3, 4)))
    b = Tensor(rng.standard_normal((4, 5)))
    builder = a(-1, 1) @ b(1, -2)
    assert isinstance(builder, NconBuilder)
    out = tn.finalize(builder)
    np.testing.assert_allclose(np.asarray(out.array),
                               np.asarray(a.array) @ np.asarray(b.array),
                               rtol=1e-10)


def test_linalg_operations(rng):
    a = rng.standard_normal((3, 4))
    b = rng.standard_normal((4, 5))
    out = la.tensordot(Tensor(a), Tensor(b), [[1], [0]])
    np.testing.assert_allclose(np.asarray(out.array), a @ b, rtol=1e-10)
    out = la.einsum("ij,jk->ik", Tensor(a), Tensor(b))
    np.testing.assert_allclose(np.asarray(out.array), a @ b, rtol=1e-10)
    np.testing.assert_allclose(float(la.norm(Tensor(a))),
                               np.linalg.norm(a), rtol=1e-10)
    t = la.ncon([Tensor(a), Tensor(b)], [(-1, 1), (1, -2)])
    np.testing.assert_allclose(np.asarray(t.array), a @ b, rtol=1e-10)


def test_linalg_decompositions(rng):
    t = rng.standard_normal((4, 6))
    u, s, vh, rest = la.svd(Tensor(t), pivot_axis=1)
    recon = np.asarray(u.array) * np.asarray(s.array) @ np.asarray(vh.array)
    np.testing.assert_allclose(recon, t, atol=1e-10)
    q, r = la.qr(Tensor(t), pivot_axis=1)
    np.testing.assert_allclose(np.asarray(q.array) @ np.asarray(r.array), t,
                               atol=1e-10)
    h = t @ t.T
    e, v = la.eigh(Tensor(h), pivot_axis=1)
    np.testing.assert_allclose(
        np.asarray(v.array) @ np.diag(np.asarray(e.array))
        @ np.asarray(v.array).T, h, atol=1e-8)


def test_linalg_inv_expm(rng):
    m = rng.standard_normal((4, 4)) + 4 * np.eye(4)
    np.testing.assert_allclose(np.asarray(la.inv(Tensor(m)).array),
                               np.linalg.inv(m), rtol=1e-8)
    import scipy.linalg
    np.testing.assert_allclose(np.asarray(la.expm(Tensor(m * 0.1)).array),
                               scipy.linalg.expm(m * 0.1), rtol=1e-8)


def test_initializers():
    assert la.eye(3).shape == (3, 3)
    assert la.zeros((2, 3)).shape == (2, 3)
    assert la.ones((2,)).shape == (2,)
    r1 = la.randn((4, 4), seed=1)
    r2 = la.randn((4, 4), seed=1)
    np.testing.assert_allclose(np.asarray(r1.array), np.asarray(r2.array))
    u = la.random_uniform((10,), boundaries=(2.0, 3.0), seed=0)
    arr = np.asarray(u.array)
    assert np.all(arr >= 2.0) and np.all(arr <= 3.0)


def test_krylov_wrappers(rng):
    n = 20
    H = rng.standard_normal((n, n)); H = (H + H.T) / 2

    def mv(x):
        return Tensor(jnp.asarray(H) @ x.array)

    evals, evecs = la.eigsh_lanczos(mv, initial_state=Tensor(
        rng.standard_normal(n)), num_krylov_vecs=20)
    np.testing.assert_allclose(float(evals[0]), np.linalg.eigvalsh(H)[0],
                               rtol=1e-8)
    b = Tensor(rng.standard_normal(n))
    A = np.eye(n) * 3 + H * 0.1

    def mv2(x):
        return Tensor(jnp.asarray(A) @ x.array)

    x, info = la.gmres(mv2, b, num_krylov_vectors=20, maxiter=3)
    np.testing.assert_allclose(A @ np.asarray(x.array), np.asarray(b.array),
                               atol=1e-6)


def test_tensor_is_pytree(rng):
    import jax
    t = Tensor(rng.standard_normal((3,)))
    doubled = jax.jit(lambda x: Tensor(x.array * 2))(t)
    np.testing.assert_allclose(np.asarray(doubled.array),
                               2 * np.asarray(t.array))


def test_kron_matches_np_kron(rng):
    A = rng.standard_normal((2, 3))
    B = rng.standard_normal((4, 5))
    out = la.kron(Tensor(A), Tensor(B))
    assert out.shape == (2, 4, 3, 5)
    np.testing.assert_allclose(np.asarray(out.array).reshape(8, 15),
                               np.kron(A, B), rtol=1e-10)


def test_randn_fresh_seed_by_default():
    a = la.randn((16,))
    b = la.randn((16,))
    assert not np.allclose(np.asarray(a.array), np.asarray(b.array))
