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


# -- reference tensor_test.py parity sweep (round 4): every method and
# -- dunder across dtypes incl. complex -------------------------------
import pytest
import jax.numpy as jnp

_DTYPES = [np.float32, np.float64, np.complex64, np.complex128]


def _rand(rng, shape, dtype):
    x = rng.standard_normal(shape)
    if np.issubdtype(dtype, np.complexfloating):
        x = x + 1j * rng.standard_normal(shape)
    return x.astype(dtype)


@pytest.mark.parametrize("dtype", _DTYPES)
def test_tensor_unary_methods_dtype_sweep(rng, dtype):
    from tensornetwork_tpu import Tensor
    a = _rand(rng, (2, 3, 1), dtype)
    t = Tensor(a)
    assert t.dtype == a.dtype and t.ndim == 3 and t.size == 6
    np.testing.assert_allclose(np.asarray(t.T.array),
                               a.transpose(2, 1, 0))
    np.testing.assert_allclose(np.asarray(t.conj().array), a.conj())
    m = _rand(rng, (3, 4), dtype)
    np.testing.assert_allclose(np.asarray(Tensor(m).H.array),
                               m.conj().T)
    np.testing.assert_allclose(np.asarray(t.reshape((6, 1)).array),
                               a.reshape(6, 1))
    np.testing.assert_allclose(np.asarray(t.squeeze().array),
                               a.squeeze())
    np.testing.assert_allclose(np.asarray(t.ravel().array), a.ravel())
    np.testing.assert_allclose(np.asarray(t.flatten().array), a.ravel())
    c = t.copy()
    assert c is not t
    np.testing.assert_allclose(np.asarray(c.array), a)


@pytest.mark.parametrize("dtype", _DTYPES)
@pytest.mark.parametrize("op", ["add", "sub", "mul", "div", "matmul",
                                "neg", "pow"])
def test_tensor_arithmetic_dtype_sweep(rng, dtype, op):
    from tensornetwork_tpu import Tensor
    a = _rand(rng, (4, 4), dtype)
    b = _rand(rng, (4, 4), dtype)
    ta, tb = Tensor(a), Tensor(b)
    tol = 2e-5 if dtype in (np.float32, np.complex64) else 1e-12
    if op == "add":
        np.testing.assert_allclose(np.asarray((ta + tb).array), a + b,
                                   atol=tol)
        np.testing.assert_allclose(np.asarray((ta + 2.0).array), a + 2,
                                   atol=tol)
        np.testing.assert_allclose(np.asarray((2.0 + ta).array), a + 2,
                                   atol=tol)
    elif op == "sub":
        np.testing.assert_allclose(np.asarray((ta - tb).array), a - b,
                                   atol=tol)
        np.testing.assert_allclose(np.asarray((2.0 - ta).array), 2 - a,
                                   atol=tol)
    elif op == "mul":
        np.testing.assert_allclose(np.asarray((ta * tb).array), a * b,
                                   atol=tol)
        np.testing.assert_allclose(np.asarray((0.5 * ta).array), a / 2,
                                   atol=tol)
    elif op == "div":
        np.testing.assert_allclose(np.asarray((ta / 2.0).array), a / 2,
                                   atol=tol)
    elif op == "matmul":
        np.testing.assert_allclose(np.asarray((ta @ tb).array), a @ b,
                                   atol=1e-4 if tol > 1e-9 else tol)
    elif op == "neg":
        np.testing.assert_allclose(np.asarray((-ta).array), -a, atol=tol)
    elif op == "pow":
        np.testing.assert_allclose(np.asarray((ta ** 2).array), a ** 2,
                                   atol=1e-4 if tol > 1e-9 else tol)


def test_tensor_ops_raise_on_mismatch(rng):
    from tensornetwork_tpu import Tensor
    a = Tensor(rng.standard_normal((2, 3)))
    b = Tensor(rng.standard_normal((4, 5)))
    with pytest.raises(Exception):
        _ = a + b
    with pytest.raises(Exception):
        _ = a @ b


def test_tensor_getitem_and_call_labels(rng):
    from tensornetwork_tpu import Tensor, ncon
    a = rng.standard_normal((4, 5))
    b = rng.standard_normal((5, 3))
    ta, tb = Tensor(a), Tensor(b)
    np.testing.assert_allclose(np.asarray(ta[1:3, ::2].array),
                               a[1:3, ::2])
    # ncon-builder syntax: t(labels) @ t(labels) contracts on shared
    out = tn.finalize(ta(-1, 1) @ tb(1, -2))
    np.testing.assert_allclose(np.asarray(out.array), a @ b, atol=2e-5)
