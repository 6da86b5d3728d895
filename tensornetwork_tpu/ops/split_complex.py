"""Split-complex arrays: complex arithmetic on real-only TPU backends.

Some TPU runtimes (notably the remote axon backend this framework targets)
do not implement complex dtypes at all — ``f32->c64`` converts, complex
matmuls, and complex transfers raise ``UNIMPLEMENTED`` even inside jit.
The reference library leans on complex tensors throughout (quantum states,
real-time evolution); this module restores that capability by carrying a
complex tensor as a pytree of two real arrays and lowering every complex
operation to real MXU-friendly primitives:

* ``SC(re, im)`` — a NamedTuple pytree, transparently jit/vmap/scan-able.
* complex ``dot_general`` via the 3-multiplication Karatsuba scheme
  (``(ar+ai)(br+bi) - arbr - aibi`` for the imaginary part), so a complex
  contraction costs 3 real GEMMs instead of 4.
* a matmul-only polar decomposition (hybrid quintic/cubic Newton-Schulz,
  see :func:`tensornetwork_tpu.models.dmrg._ns_polar`) standing in for
  complex QR in gauge fixing — triangularity is never needed there.

The reference has no equivalent component (it simply uses numpy/backend
complex dtypes, reference ``backends/abstract_backend.py``); this is a
TPU-necessity module.
"""
from __future__ import annotations

from typing import Any, NamedTuple, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


class SC(NamedTuple):
    """A complex tensor held as two real tensors (``re + 1j*im``)."""
    re: Array
    im: Array

    @property
    def shape(self):
        return self.re.shape

    @property
    def ndim(self):
        return self.re.ndim

    @property
    def dtype(self):
        return self.re.dtype

    # -- arithmetic sugar (elementwise) --
    def __add__(self, other):
        return add(self, other)

    def __sub__(self, other):
        return sub(self, other)

    def __mul__(self, other):
        return mul(self, other)

    def __rmul__(self, other):
        return mul(other, self)

    def __neg__(self):
        return SC(-self.re, -self.im)

    def __matmul__(self, other):
        return matmul(self, other)


ScalarLike = Union[int, float, complex]
SCLike = Union[SC, Array, ScalarLike]


def is_sc(x: Any) -> bool:
    return isinstance(x, SC)


def from_complex(z, dtype=None) -> SC:
    """Build an SC from a complex (or real) numpy/jax array.

    The split happens on host for numpy inputs, so no complex array ever
    reaches the device.
    """
    if isinstance(z, SC):
        return z
    z = np.asarray(z) if not isinstance(z, jax.Array) else z
    re = jnp.asarray(np.real(z) if isinstance(z, np.ndarray) else jnp.real(z),
                     dtype=dtype)
    im = jnp.asarray(np.imag(z) if isinstance(z, np.ndarray) else jnp.imag(z),
                     dtype=dtype)
    return SC(re, im)


def to_complex(x: SC) -> np.ndarray:
    """SC -> host complex numpy array (device_get on the real parts)."""
    re, im = jax.device_get((x.re, x.im))
    return np.asarray(re) + 1j * np.asarray(im)


def _coerce(x: SCLike, like: SC) -> SC:
    if isinstance(x, SC):
        return x
    if isinstance(x, complex):
        return SC(jnp.asarray(x.real, like.dtype),
                  jnp.asarray(x.imag, like.dtype))
    arr = jnp.asarray(x, like.dtype)
    return SC(arr, jnp.zeros_like(arr))


def add(a: SCLike, b: SCLike) -> SC:
    ref = a if isinstance(a, SC) else b
    a = _coerce(a, ref)
    b = _coerce(b, ref)
    return SC(a.re + b.re, a.im + b.im)


def sub(a: SCLike, b: SCLike) -> SC:
    ref = a if isinstance(a, SC) else b
    a = _coerce(a, ref)
    b = _coerce(b, ref)
    return SC(a.re - b.re, a.im - b.im)


def mul(a: SCLike, b: SCLike) -> SC:
    """Elementwise (broadcasting) complex multiply."""
    ref = a if isinstance(a, SC) else b
    a = _coerce(a, ref)
    b = _coerce(b, ref)
    return SC(a.re * b.re - a.im * b.im, a.re * b.im + a.im * b.re)


def conj(a: SC) -> SC:
    return SC(a.re, -a.im)


def transpose(a: SC, perm) -> SC:
    return SC(jnp.transpose(a.re, perm), jnp.transpose(a.im, perm))


def reshape(a: SC, shape) -> SC:
    return SC(a.re.reshape(shape), a.im.reshape(shape))


def sum_axes(a: SC, axes) -> SC:
    return SC(jnp.sum(a.re, axis=axes), jnp.sum(a.im, axis=axes))


def diagonal(a: SC, axis1: int, axis2: int) -> SC:
    return SC(jnp.diagonal(a.re, axis1=axis1, axis2=axis2),
              jnp.diagonal(a.im, axis1=axis1, axis2=axis2))


def norm(a: SC) -> Array:
    """Frobenius norm (a real scalar array)."""
    return jnp.sqrt(jnp.sum(a.re * a.re) + jnp.sum(a.im * a.im))


def vdot(a: SC, b: SC) -> SC:
    """<a|b> = sum(conj(a) * b), complex scalar as a 0-d SC."""
    re = jnp.sum(a.re * b.re) + jnp.sum(a.im * b.im)
    im = jnp.sum(a.re * b.im) - jnp.sum(a.im * b.re)
    return SC(re, im)


def scale(c: SCLike, a: SC) -> SC:
    """(complex scalar) * (SC tensor)."""
    return mul(_coerce(c, a), a)


def dot_general(a: SCLike, b: SCLike, dimension_numbers, **kw) -> SC:
    """Complex ``lax.dot_general`` by Karatsuba: 3 real contractions.

    Falls back to 2 real contractions when either side is purely real
    (zero imaginary part is not detected dynamically — pass a plain
    ``jax.Array`` to get the cheap path).
    """
    dg = lambda x, y: jax.lax.dot_general(
        x, y, dimension_numbers=dimension_numbers, **kw)
    a_sc, b_sc = isinstance(a, SC), isinstance(b, SC)
    if a_sc and not b_sc:
        return SC(dg(a.re, b), dg(a.im, b))
    if b_sc and not a_sc:
        return SC(dg(a, b.re), dg(a, b.im))
    if not (a_sc or b_sc):
        return SC(dg(a, b), jnp.zeros_like(dg(a, b)))
    t1 = dg(a.re, b.re)
    t2 = dg(a.im, b.im)
    t3 = dg(a.re + a.im, b.re + b.im)
    return SC(t1 - t2, t3 - t1 - t2)


def matmul(a: SCLike, b: SCLike) -> SC:
    """Complex (batched) matmul over the last two axes."""
    ref = a if isinstance(a, SC) else b
    nd = (a.ndim if isinstance(a, (SC, jax.Array)) else 0)
    ndb = (b.ndim if isinstance(b, (SC, jax.Array)) else 0)
    if nd == 2 and ndb == 2:
        dn = (((1,), (0,)), ((), ()))
        return dot_general(a, b, dn)
    # batched: leading axes are batch dims (must match)
    nbatch = nd - 2
    dn = (((nd - 1,), (nbatch,)),
          (tuple(range(nbatch)), tuple(range(nbatch))))
    return dot_general(a, b, dn)


def adjoint(a: SC) -> SC:
    """Conjugate transpose of the last two axes."""
    perm = tuple(range(a.ndim - 2)) + (a.ndim - 1, a.ndim - 2)
    return SC(jnp.transpose(a.re, perm), -jnp.transpose(a.im, perm))


def eye_like(a: SC, k: int) -> SC:
    e = jnp.eye(k, dtype=a.dtype)
    return SC(e, jnp.zeros_like(e))


def polar(m: SC, quintic_iters: Optional[int] = None,
          cubic_iters: Optional[int] = None) -> Tuple[SC, SC]:
    """Complex polar decomposition m = Q·P via the hybrid Newton-Schulz
    schedule of :func:`tensornetwork_tpu.models.dmrg._ns_polar`, executed
    entirely in split-complex matmuls.  Q is column-isometric (Q†Q = I),
    P = Q†m.  This is the complex-QR replacement for gauge shifts on
    real-only TPU backends.  Iteration counts default dtype-aware
    (f32: 14/7, f64: 20/10)."""
    if quintic_iters is None:
        quintic_iters = 14 if m.dtype == jnp.float32 else 20
    if cubic_iters is None:
        cubic_iters = 7 if m.dtype == jnp.float32 else 10
    k = m.shape[-1]
    nrm = jnp.sqrt(jnp.sum(m.re * m.re, axis=(-2, -1), keepdims=True)
                   + jnp.sum(m.im * m.im, axis=(-2, -1), keepdims=True))
    denom = jnp.where(nrm > 0, nrm * 1.01, 1.0)
    X = SC(m.re / denom, m.im / denom)
    eye = jnp.eye(k, dtype=m.dtype)
    a, b, c = 3.4445, -4.7750, 2.0315
    for _ in range(quintic_iters):
        G = matmul(adjoint(X), X)
        G2 = matmul(G, G)
        poly = SC(b * G.re + c * G2.re, b * G.im + c * G2.im)
        XG = matmul(X, poly)
        X = SC(a * X.re + XG.re, a * X.im + XG.im)
    for _ in range(cubic_iters):
        G = matmul(adjoint(X), X)
        three_m_g = SC(3.0 * eye - G.re, -G.im)
        X = matmul(X, three_m_g)
        X = SC(0.5 * X.re, 0.5 * X.im)
    P = matmul(adjoint(X), m)
    return X, P


def stack(xs: Sequence[SC], axis: int = 0) -> SC:
    return SC(jnp.stack([x.re for x in xs], axis=axis),
              jnp.stack([x.im for x in xs], axis=axis))


def where(pred, a: SC, b: SC) -> SC:
    return SC(jnp.where(pred, a.re, b.re), jnp.where(pred, a.im, b.im))


def _smoothstep_projector(D: SC, iters: int = 25) -> SC:
    """Sharpen a Hermitian matrix with eigenvalues in [0,1] toward the
    projector onto its (>1/2)-eigenspace: f(x)=3x^2-2x^3 iterated.
    Matmul-only; quadratic convergence at both ends."""
    for _ in range(iters):
        D2 = matmul(D, D)
        D3 = matmul(D2, D)
        D = SC(3.0 * D2.re - 2.0 * D3.re, 3.0 * D2.im - 2.0 * D3.im)
    return D


def polar_complete(m: SC, quintic_iters: Optional[int] = None,
                   cubic_iters: Optional[int] = None) -> Tuple[SC, SC]:
    """Polar split m = Q·P with Q a FULL isometry (Q†Q = I) even when m is
    rank-deficient.

    Plain Newton-Schulz (:func:`polar`) leaves exact null directions at
    zero, producing only a partial isometry — fatal for TDVP gauge shifts
    from product states (the completion directions seed entanglement
    growth, as QR's Householder completion does).  Here the defect
    projector D = I - X†X is sharpened to a hard projector (smoothstep
    iteration), a fixed candidate basis is projected onto the defect
    (column space orthogonal to X by construction), orthonormalized with
    a second Newton-Schulz pass, and added.  The splitting stays exact:
    the completion columns are orthogonal to col(m), so Q†m = X†m."""
    n, k = m.shape[-2], m.shape[-1]
    if quintic_iters is None:
        quintic_iters = 14 if m.dtype == jnp.float32 else 20
    if cubic_iters is None:
        cubic_iters = 7 if m.dtype == jnp.float32 else 10
    X, _ = polar(m, quintic_iters, cubic_iters)
    eye = jnp.eye(k, dtype=m.dtype)
    XtX = matmul(adjoint(X), X)
    D = SC(eye - XtX.re, -XtX.im)
    D = _smoothstep_projector(D)
    # fixed deterministic candidate: leading k coordinate directions,
    # projected off col(X): Y = (I - X X†) E
    E = jnp.eye(n, k, dtype=m.dtype)
    E_sc = SC(jnp.broadcast_to(E, m.shape), jnp.zeros(m.shape, m.dtype))
    XtE = matmul(adjoint(X), E_sc)
    Y = sub(E_sc, matmul(X, XtE))
    YD = matmul(Y, D)
    Z, _ = polar(YD, quintic_iters, cubic_iters)
    # restrict to the defect block (kills noise directions when D ~ 0)
    Z = matmul(Z, D)
    Q = add(X, Z)
    # cubic polish: Q is near-isometric (sigma = 1 +- 1e-4 in borderline
    # partial-rank cases); a few Newton-Schulz steps push it to machine
    # precision.  Right-multiplication keeps span(Q) fixed, so the
    # splitting below stays exact.
    for _ in range(4):
        G = matmul(adjoint(Q), Q)
        three_m_g = SC(3.0 * eye - G.re, -G.im)
        Q = matmul(Q, three_m_g)
        Q = SC(0.5 * Q.re, 0.5 * Q.im)
    P = matmul(adjoint(Q), m)
    return Q, P


# ---------------------------------------------------------------------------
# Spectral decompositions in split-complex arithmetic.
#
# Complex Hermitian eigh reduces to REAL symmetric eigh of the
# realification G = [[Hr, -Hi], [Hi, Hr]]: if H v = l v with v = vr+i*vi
# then G [vr; vi] = l [vr; vi] and G [-vi; vr] = l [-vi; vr], so the real
# spectrum is the complex spectrum doubled, and ANY real eigenvector
# x = [a; b] of a pair de-realifies to a complex eigenvector a + i*b
# (a complex multiple of v — nonzero because |x| = 1).  This runs on TPU
# backends with no complex support, using the well-optimized real eigh.
# ---------------------------------------------------------------------------


def _realify_hermitian(H: SC) -> Array:
    top = jnp.concatenate([H.re, -H.im], axis=-1)
    bot = jnp.concatenate([H.im, H.re], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def eigh(H: SC) -> Tuple[Array, SC]:
    """Eigendecomposition of a Hermitian SC matrix: ``H = V diag(w) V†``.

    Returns ``(w, V)`` with ``w`` real ascending (k,) and ``V`` an SC
    (k, k) with orthonormal columns.  Implementation: real symmetric eigh
    of the 2k x 2k realification (doubled spectrum), de-realify one
    eigenvector per pair, re-orthonormalize with the completed polar
    (guards near-degenerate pair mixing)."""
    k = H.shape[-1]
    G = _realify_hermitian(H)
    w2, X = jnp.linalg.eigh(G)       # ascending, pairs adjacent
    w = 0.5 * (w2[..., 0::2] + w2[..., 1::2])
    Xsel = X[..., :, 0::2]
    V = SC(Xsel[..., :k, :], Xsel[..., k:, :])
    # columns are eigenvectors up to complex scale; orthonormalize (and
    # complete in the pathological fully-mixed-degenerate case)
    V, _ = polar_complete(V)
    return w, V


def svd(M: SC) -> Tuple[SC, Array, SC]:
    """SVD of an SC matrix ``M = U diag(s) V†`` (full-matrices=False,
    descending singular values).

    Route: Hermitian eigh of M†M for (s^2, V) — real-arithmetic only —
    then U from the completed polar of M V (= U diag(s) exactly), which
    also supplies orthonormal U columns for zero singular values.
    Note the squared condition number of the Gram route: singular values
    below ~sqrt(eps)*s_max lose relative accuracy (fine for truncation
    decisions; use f64 where spectra span more than ~7 digits in f32)."""
    n, k = M.shape[-2], M.shape[-1]
    if n < k:
        # M = (M†)† = Vh_t† diag(s) U_t†
        U_t, s, Vh_t = svd(adjoint(M))
        return adjoint(Vh_t), s, adjoint(U_t)
    H = matmul(adjoint(M), M)
    w, V = eigh(H)
    # descending
    w = w[..., ::-1]
    V = SC(V.re[..., :, ::-1], V.im[..., :, ::-1])
    MV = matmul(M, V)                # = U diag(s)
    U, _ = polar_complete(MV)
    # refine s = Re diag(U† M V): u_i is the direction of M v_i, so this
    # recovers |M v_i| at full (un-squared) precision — the eigh route
    # alone returns sqrt(eigenvalues of M†M), which floors tiny singular
    # values at ~sqrt(eps)*s_max
    s = jnp.sum(U.re * MV.re + U.im * MV.im, axis=-2)
    s = jnp.maximum(s, 0.0)
    return U, s, adjoint(V)
