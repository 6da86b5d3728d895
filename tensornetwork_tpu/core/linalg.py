"""Functional linear-algebra API over :class:`Tensor`.

Capability parity with the reference functional layer (reference
``linalg/operations.py:40-308``, ``linalg/linalg.py:19-226``,
``linalg/initialization.py:28-202``, ``linalg/krylov.py:113-264``): free
functions dispatching to XLA ops, tensor initializers, and Krylov wrappers
over ``Tensor`` matvecs.
"""
from __future__ import annotations

from typing import Any, Callable, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from tensornetwork_tpu.core.tensor import Tensor
from tensornetwork_tpu.ops import decompositions as _decomp
from tensornetwork_tpu.ops import krylov as _krylov
from tensornetwork_tpu.ops.ncon import ncon as _ncon


def _wrap(x):
    return Tensor(x) if not isinstance(x, Tensor) else x


def _unwrap(x):
    return x.array if isinstance(x, Tensor) else jnp.asarray(x)


# -- operations (reference ``linalg/operations.py``) -------------------------

def tensordot(a, b, axes) -> Tensor:
    return Tensor(jnp.tensordot(_unwrap(a), _unwrap(b), axes=axes))


def einsum(expr: str, *tensors, optimize="auto") -> Tensor:
    # "auto" (never True/'optimal'): exhaustive path search hangs for
    # >10 operands (see CLAUDE.md)
    if optimize is True:
        optimize = "auto"
    return Tensor(jnp.einsum(expr, *[_unwrap(t) for t in tensors],
                             optimize=optimize))


def reshape(t, shape) -> Tensor:
    return Tensor(jnp.reshape(_unwrap(t), tuple(shape)))


def transpose(t, perm=None) -> Tensor:
    return Tensor(jnp.transpose(_unwrap(t), perm))


def take_slice(t, start_indices, slice_sizes) -> Tensor:
    return Tensor(jax.lax.dynamic_slice(_unwrap(t), start_indices,
                                        slice_sizes))


def shape(t) -> Tuple[int, ...]:
    return tuple(_unwrap(t).shape)


def sqrt(t) -> Tensor:
    return Tensor(jnp.sqrt(_unwrap(t)))


def outer(a, b) -> Tensor:
    return Tensor(jnp.tensordot(_unwrap(a), _unwrap(b), 0))


def ncon(tensors, network_structure, con_order=None, out_order=None,
         check_network=True) -> Tensor:
    arrays = [_unwrap(t) for t in tensors]
    return Tensor(_ncon(arrays, network_structure, con_order, out_order,
                        check_network))


def diagonal(t, offset=0, axis1=-2, axis2=-1) -> Tensor:
    return Tensor(jnp.diagonal(_unwrap(t), offset, axis1, axis2))


def diagflat(t, k=0) -> Tensor:
    return Tensor(jnp.diag(_unwrap(t).reshape(-1), k=k))


def trace(t, offset=0, axis1=-2, axis2=-1) -> Tensor:
    return Tensor(jnp.trace(_unwrap(t), offset, axis1, axis2))


def sign(t) -> Tensor:
    return Tensor(jnp.sign(_unwrap(t)))


def abs(t) -> Tensor:  # noqa: A001 - reference exports `abs`
    return Tensor(jnp.abs(_unwrap(t)))


def conj(t) -> Tensor:
    """Complex conjugate (reference ``linalg/operations.py:142``)."""
    return Tensor(jnp.conj(_unwrap(t)))


def hconj(t, perm=None) -> Tensor:
    """Hermitian conjugate: conjugate + transpose (reference
    ``linalg/operations.py:153``)."""
    return Tensor(jnp.conj(jnp.transpose(_unwrap(t), perm)))


def sin(t) -> Tensor:
    """(reference ``linalg/operations.py:165``)"""
    return Tensor(jnp.sin(_unwrap(t)))


def cos(t) -> Tensor:
    """(reference ``linalg/operations.py:177``)"""
    return Tensor(jnp.cos(_unwrap(t)))


def exp(t) -> Tensor:
    """Elementwise exponential (reference ``linalg/operations.py:189``)."""
    return Tensor(jnp.exp(_unwrap(t)))


def log(t) -> Tensor:
    """Natural logarithm (reference ``linalg/operations.py:201``)."""
    return Tensor(jnp.log(_unwrap(t)))


def pivot(t, pivot_axis: int = -1) -> Tensor:
    """Reshape into a matrix around ``pivot_axis``."""
    arr = _unwrap(t)
    if pivot_axis < 0:
        pivot_axis += arr.ndim
    left = int(np.prod(arr.shape[:pivot_axis], dtype=np.int64))
    return Tensor(arr.reshape(left, -1))


def kron(a, b) -> Tensor:
    """Tensor Kronecker product (reference ``linalg/node_linalg.py:331``):
    for even-rank operands (k row axes then k column axes) the result has
    rows (a_rows, b_rows) and columns (a_cols, b_cols), so matricizing
    reproduces ``np.kron``."""
    A, B = _unwrap(a), _unwrap(b)
    if A.ndim % 2 != 0 or B.ndim % 2 != 0:
        raise ValueError("kron requires even-rank tensors")
    ka, kb = A.ndim // 2, B.ndim // 2
    out = jnp.tensordot(A, B, 0)
    # axes: (a_rows, a_cols, b_rows, b_cols) -> (a_rows, b_rows,
    #        a_cols, b_cols)
    perm = (list(range(ka)) + list(range(2 * ka, 2 * ka + kb))
            + list(range(ka, 2 * ka))
            + list(range(2 * ka + kb, 2 * (ka + kb))))
    return Tensor(jnp.transpose(out, perm))


def norm(t) -> jax.Array:
    return jnp.linalg.norm(_unwrap(t).reshape(-1))


def inv(t) -> Tensor:
    arr = _unwrap(t)
    if arr.ndim != 2:
        raise ValueError("inv requires a matrix")
    return Tensor(jnp.linalg.inv(arr))


def expm(t) -> Tensor:
    arr = _unwrap(t)
    if arr.ndim != 2:
        raise ValueError("expm requires a matrix")
    return Tensor(jax.scipy.linalg.expm(arr))


# -- decompositions (reference ``linalg/linalg.py``) -------------------------

def svd(t, pivot_axis: int = -1, max_singular_values=None,
        max_truncation_error=None, relative=False):
    u, s, vh, s_rest = _decomp.svd(_unwrap(t), pivot_axis,
                                   max_singular_values,
                                   max_truncation_error, relative)
    return Tensor(u), Tensor(s), Tensor(vh), Tensor(s_rest)


def qr(t, pivot_axis: int = -1, non_negative_diagonal: bool = False):
    q, r = _decomp.qr(_unwrap(t), pivot_axis, non_negative_diagonal)
    return Tensor(q), Tensor(r)


def rq(t, pivot_axis: int = -1, non_negative_diagonal: bool = False):
    r, q = _decomp.rq(_unwrap(t), pivot_axis, non_negative_diagonal)
    return Tensor(r), Tensor(q)


def eigh(t, pivot_axis: int = -1):
    e, v = _decomp.eigh(_unwrap(t), pivot_axis)
    return Tensor(e), Tensor(v)


# -- initialization (reference ``linalg/initialization.py``) -----------------

def eye(N: int, dtype=jnp.float64, M: Optional[int] = None) -> Tensor:
    return Tensor(jnp.eye(N, M, dtype=dtype))


def zeros(shape, dtype=jnp.float64) -> Tensor:
    return Tensor(jnp.zeros(shape, dtype))


def ones(shape, dtype=jnp.float64) -> Tensor:
    return Tensor(jnp.ones(shape, dtype))


def _fresh_seed() -> int:
    # reference draws a fresh random seed when none is given
    return int(np.random.SeedSequence().entropy % (2 ** 31))


def randn(shape, dtype=jnp.float64, seed: Optional[int] = None) -> Tensor:
    key = jax.random.PRNGKey(_fresh_seed() if seed is None else seed)
    if jnp.issubdtype(dtype, jnp.complexfloating):
        k1, k2 = jax.random.split(key)
        real_dt = jnp.zeros((), dtype).real.dtype
        return Tensor((jax.random.normal(k1, shape, real_dt)
                       + 1j * jax.random.normal(k2, shape, real_dt)
                       ).astype(dtype))
    return Tensor(jax.random.normal(key, shape, dtype))


def random_uniform(shape, dtype=jnp.float64, seed: Optional[int] = None,
                   boundaries: Tuple[float, float] = (0.0, 1.0)) -> Tensor:
    key = jax.random.PRNGKey(_fresh_seed() if seed is None else seed)
    lo, hi = boundaries
    if jnp.issubdtype(dtype, jnp.complexfloating):
        k1, k2 = jax.random.split(key)
        real_dt = jnp.zeros((), dtype).real.dtype
        return Tensor((jax.random.uniform(k1, shape, real_dt, lo, hi)
                       + 1j * jax.random.uniform(k2, shape, real_dt, lo, hi)
                       ).astype(dtype))
    return Tensor(jax.random.uniform(key, shape, dtype, lo, hi))


# -- Krylov wrappers (reference ``linalg/krylov.py``) ------------------------

def _tensor_matvec(A: Callable, args: Optional[List] = None):
    args = args or []
    uargs = [_unwrap(a) for a in args]

    def mv(x):
        res = A(Tensor(x), *[Tensor(a) for a in uargs])
        return _unwrap(res)

    return mv


def eigsh_lanczos(A: Callable, args=None, initial_state: Tensor = None,
                  shape=None, dtype=None, num_krylov_vecs: int = 20,
                  numeig: int = 1, tol: float = 1e-8, delta: float = 1e-8,
                  ndiag: int = 10, reorthogonalize: bool = True,
                  num_restarts: int = 1):
    """(reference ``linalg/krylov.py:113``.)

    Note: the compiled solver runs a *static* number of iterations
    (``num_krylov_vecs``, optionally repeated ``num_restarts`` times with
    the best Ritz vector as the new start); ``tol``/``ndiag`` are accepted
    for signature parity but convergence is governed by those two knobs.
    """
    if initial_state is None:
        if shape is None or dtype is None:
            raise ValueError("provide initial_state or (shape, dtype)")
        initial_state = randn(shape, dtype)
    evals, evecs = _krylov.eigsh_lanczos(
        _tensor_matvec(A, args), _unwrap(initial_state),
        num_krylov_vecs=num_krylov_vecs, numeig=numeig,
        reorthogonalize=reorthogonalize, delta=delta,
        num_restarts=num_restarts)
    return [evals[k] for k in range(numeig)], \
        [Tensor(evecs[k]) for k in range(numeig)]


def eigs(A: Callable, args=None, initial_state: Tensor = None, shape=None,
         dtype=None, num_krylov_vecs: int = 20, numeig: int = 1,
         tol: float = 1e-8, which: str = "LM", maxiter: int = 2):
    """(reference ``linalg/krylov.py:176``)"""
    if initial_state is None:
        if shape is None or dtype is None:
            raise ValueError("provide initial_state or (shape, dtype)")
        initial_state = randn(shape, dtype)
    evals, evecs = _krylov.eigs(
        _tensor_matvec(A, args), _unwrap(initial_state),
        num_krylov_vecs=num_krylov_vecs, numeig=numeig, which=which,
        maxiter=maxiter, tol=tol)
    return [evals[k] for k in range(numeig)], [Tensor(v) for v in evecs]


def gmres(A: Callable, b: Tensor, args=None, x0: Tensor = None,
          tol: float = 1e-8, atol: float = 0.0,
          num_krylov_vectors: int = 20, maxiter: int = 1):
    """(reference ``linalg/krylov.py:264``)"""
    x, info = _krylov.gmres(
        _tensor_matvec(A, args), _unwrap(b),
        x0=None if x0 is None else _unwrap(x0), tol=tol, atol=atol,
        num_krylov_vectors=num_krylov_vectors, maxiter=maxiter)
    return Tensor(x), info
