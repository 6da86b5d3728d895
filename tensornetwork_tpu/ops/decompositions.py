"""Tensor decompositions (SVD / QR / RQ / eigh) with truncation.

Truncation semantics follow the reference contract exactly (reference
``backends/numpy/decompositions.py:21-124``): the discarded singular values
are the maximal *tail* whose L2 norm is at most ``max_truncation_error``
(scaled by the largest singular value when ``relative=True``), further capped
by ``max_singular_values``; the discarded spectrum is returned for
truncation-error accounting.

Two families are provided:

* ``svd`` / ``qr`` / ``rq`` — host-level API with data-dependent output
  shapes (used by ``split_node`` and friends, which mutate the host-side
  graph anyway).
* ``svd_masked`` — static-shape, jit/vmap/scan-safe variant: output rank is
  the static ``max_singular_values``; truncated singular values are zeroed
  via a mask instead of sliced away.  This is what the compiled DMRG/TEBD
  paths use (pad-and-mask strategy, SURVEY §7.4).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _to_matrix(tensor, pivot_axis: int):
    shape = tensor.shape
    left = shape[:pivot_axis]
    right = shape[pivot_axis:]
    return (tensor.reshape((int(np.prod(left, dtype=np.int64)),
                            int(np.prod(right, dtype=np.int64)))),
            left, right)


def _num_keep_from_spectrum(
    s: np.ndarray,
    max_singular_values: Optional[int],
    max_truncation_error: Optional[float],
    relative: bool,
) -> int:
    n = s.shape[0]
    keep = n
    if max_truncation_error is not None:
        err = float(max_truncation_error)
        if relative and n > 0:
            err = err * float(s[0])
        tail_sq = np.cumsum((s**2)[::-1])
        # largest number of tail values with L2 norm <= err
        num_discard = int(np.searchsorted(np.sqrt(tail_sq), err, side="right"))
        keep = n - num_discard
    if max_singular_values is not None:
        keep = min(keep, int(max_singular_values))
    return max(keep, 0)


def svd(
    tensor,
    pivot_axis: int = -1,
    max_singular_values: Optional[int] = None,
    max_truncation_error: Optional[float] = None,
    relative: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Truncated SVD around ``pivot_axis``.

    Returns ``(u, s, vh, s_rest)`` where ``u`` has shape
    ``left_dims + (D,)``, ``vh`` has ``(D,) + right_dims`` and ``s_rest``
    holds the discarded singular values (reference
    ``backends/numpy/decompositions.py:32-76``).
    """
    if pivot_axis < 0:
        pivot_axis += tensor.ndim
    matrix, left, right = _to_matrix(tensor, pivot_axis)
    u, s, vh = jnp.linalg.svd(matrix, full_matrices=False)
    if max_truncation_error is None:
        # static decision — no device->host sync needed
        keep = s.shape[0]
        if max_singular_values is not None:
            keep = min(keep, int(max_singular_values))
    else:
        s_host = np.asarray(jax.device_get(s))
        keep = _num_keep_from_spectrum(
            s_host, max_singular_values, max_truncation_error, relative)
    s_rest = s[keep:]
    u, s, vh = u[:, :keep], s[:keep], vh[:keep, :]
    return (u.reshape(left + (keep,)), s, vh.reshape((keep,) + right), s_rest)


def qr(
    tensor,
    pivot_axis: int = -1,
    non_negative_diagonal: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """QR around ``pivot_axis`` (reference
    ``backends/numpy/decompositions.py:77-100``)."""
    if pivot_axis < 0:
        pivot_axis += tensor.ndim
    matrix, left, right = _to_matrix(tensor, pivot_axis)
    q, r = jnp.linalg.qr(matrix)
    if non_negative_diagonal:
        d = jnp.diagonal(r)
        phase = jnp.where(d == 0, jnp.ones_like(d), d / jnp.abs(d))
        q = q * jnp.conj(phase)[None, :]
        r = r * phase[:, None]
    k = q.shape[1]
    return q.reshape(left + (k,)), r.reshape((k,) + right)


def rq(
    tensor,
    pivot_axis: int = -1,
    non_negative_diagonal: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """RQ around ``pivot_axis`` (reference
    ``backends/numpy/decompositions.py:101-124``): returns ``r, q`` with
    ``tensor = r @ q`` and ``q`` having orthonormal rows."""
    if pivot_axis < 0:
        pivot_axis += tensor.ndim
    matrix, left, right = _to_matrix(tensor, pivot_axis)
    # rq(A) via qr of the conjugate transpose: A = R Q with Q row-orthonormal
    q_, r_ = jnp.linalg.qr(jnp.conj(matrix.T))
    if non_negative_diagonal:
        d = jnp.diagonal(r_)
        phase = jnp.where(d == 0, jnp.ones_like(d), d / jnp.abs(d))
        q_ = q_ * jnp.conj(phase)[None, :]
        r_ = r_ * phase[:, None]
    r = jnp.conj(r_.T)
    q = jnp.conj(q_.T)
    k = q.shape[0]
    return r.reshape(left + (k,)), q.reshape((k,) + right)


def eigh(tensor, pivot_axis: int = -1):
    if pivot_axis < 0:
        pivot_axis += tensor.ndim
    matrix, left, right = _to_matrix(tensor, pivot_axis)
    e, v = jnp.linalg.eigh(matrix)
    return e, v.reshape(left + (v.shape[1],))


def ns_polar(m: Array, quintic_iters: Optional[int] = None,
             cubic_iters: Optional[int] = None) -> Tuple[Array, Array]:
    """Polar decomposition m = Q·P (Q column-isometric, P = Q†m) by a
    matmul-only iteration, so it rides the MXU where batched Householder
    QR serializes.  DMRG gauge shifts and subspace-iteration
    orthonormalization only need *some* isometric/rest split, so the
    triangularity of QR is not required.

    Plain cubic Newton-Schulz stalls on ill-conditioned panels (singular
    values grow only ~1.5x/step from near zero).  Hybrid schedule instead:
    aggressive quintic steps (coefficients from the Muon/"polar express"
    family, growth ~3.44x/step) inflate the small singular values, then
    cubic steps polish quadratically.  Measured (f64, 24x12 panels):
    ||Q†Q-I|| < 1e-15 up to cond 1e10, ~3e-4 at cond 1e12.

    Iteration counts default dtype-aware: f32 only needs (14, 7) for
    full f32 isometry up to cond 1e7 (validated), f64 keeps (20, 10) —
    a ~35% cut of the gauge-shift matmuls in the batched f32 sweeps.

    CAVEAT: on exactly rank-deficient panels the result is a PARTIAL
    isometry (null columns stay zero) — where a full isometric
    completion matters use Householder QR or
    :func:`tensornetwork_tpu.ops.split_complex.polar_complete`."""
    if quintic_iters is None:
        quintic_iters = 14 if m.dtype == jnp.float32 else 20
    if cubic_iters is None:
        cubic_iters = 7 if m.dtype == jnp.float32 else 10
    k = m.shape[-1]
    nrm = jnp.linalg.norm(m, axis=(-2, -1), keepdims=True)
    X = m / jnp.where(nrm > 0, nrm * 1.01, 1.0)
    eye = jnp.eye(k, dtype=m.dtype)
    a, b, c = 3.4445, -4.7750, 2.0315
    for _ in range(quintic_iters):
        G = jnp.conj(X.swapaxes(-1, -2)) @ X
        X = a * X + X @ (b * G + c * (G @ G))
    for _ in range(cubic_iters):
        G = jnp.conj(X.swapaxes(-1, -2)) @ X
        X = 0.5 * X @ (3.0 * eye - G)
    P = jnp.conj(X.swapaxes(-1, -2)) @ m
    return X, P


def _pe_best_step(l: float) -> Tuple[Tuple[float, float, float], float]:
    """One Polar Express step: the odd quintic maximizing
    ``min_{x in [l, 1]} p(x)`` subject to ``p(x) <= 1`` on [l, 1]
    (LP on a dense grid).  Returns ((a, b, c), new_l).  The same
    objective covers both regimes: for tiny l it is the max-slope
    inflation step (~8.2x growth/step), near convergence it contracts
    [l, 1] with super-linear order."""
    from scipy.optimize import linprog
    x = np.unique(np.concatenate([np.geomspace(l, 1.0, 2500),
                                  np.linspace(l, 1.0, 2500)]))
    # the fine validation grid (dips of a near-double root are
    # ~1e-5-wide; the LP rides exactly between coarse grid points, so
    # cutting-plane refinement against this grid is essential)
    xf = np.unique(np.concatenate([np.geomspace(l, 1.0, 120000),
                                   np.linspace(l, 1.0, 120000)]))
    a = b = c = t = None
    for _ in range(8):
        n = len(x)
        M = np.stack([x, x**3, x**5], axis=1)
        ones_col = np.ones((n, 1))
        # vars (a, b, c, t): maximize t  s.t.  M v <= 1,  t - M v <= 0
        A_ub = np.concatenate([
            np.concatenate([M, np.zeros((n, 1))], axis=1),
            np.concatenate([-M, ones_col], axis=1)])
        b_ub = np.concatenate([np.ones(n), np.zeros(n)])
        res = linprog(np.array([0.0, 0.0, 0.0, -1.0]), A_ub=A_ub,
                      b_ub=b_ub,
                      bounds=[(None, None)] * 3 + [(None, None)],
                      method="highs")
        a, b, c, t = res.x
        vals = a * xf + b * xf**3 + c * xf**5
        mn, mx = float(np.min(vals)), float(np.max(vals))
        if mn >= t * (1.0 - 1e-3) and mx <= 1.0 + 1e-9:
            break
        # add the violated fine-grid extrema as cutting planes
        new_pts = [xf[int(np.argmin(vals))], xf[int(np.argmax(vals))]]
        x = np.unique(np.concatenate([x, np.asarray(new_pts)]))
    safety = 1.00002
    scale = max(mx, 1.0) * safety
    return (a / scale, b / scale, c / scale), mn / scale


@functools.lru_cache(maxsize=32)
def _polar_express_schedule(l: float, target: float,
                            max_steps: int = 24) -> Tuple[Tuple[float,
                                                                float,
                                                                float], ...]:
    """Per-iteration quintic coefficients for the Newton-Schulz polar
    iteration (the "Polar Express" construction, arXiv:2505.16932
    family): each step's odd quintic maximizes the post-step lower
    edge of the singular-value interval subject to staying <= 1 —
    LP-computed on the host at trace time (lru-cached) — until
    ``1 - l < target``.

    Against the fixed (14 quintic + 7 cubic) f32 schedule this reaches
    the same isometry class in ~8-9 steps (~60% cut of the gauge-shift
    matmuls); every step's coefficients are pre-divided so max p <= 1
    with an f32 safety margin.
    """
    steps = []
    lo = float(l)
    while 1.0 - lo > target and len(steps) < max_steps:
        coeffs, new_lo = _pe_best_step(lo)
        steps.append(coeffs)
        if new_lo <= lo:      # LP stall guard: no contraction progress
            break
        lo = new_lo
    return tuple(steps)


@functools.lru_cache(maxsize=32)
def _polar_hybrid_schedule(l: float) -> Tuple[Tuple[float, float,
                                                    float], ...]:
    """Hybrid schedule: the classic gentle quintic (3.4445, -4.7750,
    2.0315 — the coefficients the battle-tested default uses, measured
    span-safe at f32) for the inflation phase, then LP minimax quintics
    only for the CONTRACTION tail.

    MEASURED CONCLUSION (round 5): ~54 GEMMs vs the fixed schedule's 56
    — the pure-LP mode's savings come from its AGGRESSIVE inflation
    coefficients, which are exactly what corrupts the batched f32 floor
    (BASELINE.md polar-express A/B).  There is no safe middle ground
    worth wiring; kept as the recorded negative result."""
    a, b, c = 3.4445, -4.7750, 2.0315
    steps = []
    lo = float(l)
    # the classic quintic maps [0, 1.2023] -> [0, 1.2023] (its interior
    # max; the upper edge is handled by the tail, as in the default
    # schedule) — track it so the LP tail sees a normalized interval
    hi = 1.20224838
    while lo < 0.05 * hi and len(steps) < 20:
        steps.append((a, b, c))
        lo = a * lo + b * lo**3 + c * lo**5
    while 1.0 - lo / hi > 1e-2 and len(steps) < 26:
        (ca, cb, cc), new_lo = _pe_best_step(lo / hi)
        # fold the 1/hi normalization into this step's coefficients
        steps.append((ca / hi, cb / hi**3, cc / hi**5))
        if new_lo <= lo / hi:
            break
        lo, hi = new_lo, 1.0
    return tuple(steps)


def ns_polar_express(m: Array, cond_bound: Optional[float] = None,
                     polish: Optional[int] = None,
                     mode: str = "lp") -> Tuple[Array, Array]:
    """Polar decomposition via the minimax-scheduled quintic iteration
    (:func:`_polar_express_schedule`) — same contract as
    :func:`ns_polar` (partial isometry on rank-deficient panels) at
    ~40%% of the matmul cost.  ``cond_bound``: assumed upper bound on
    the panel condition number (default 1e7 for f32, 1e10 for f64 —
    the validated :func:`ns_polar` classes)."""
    if cond_bound is None:
        cond_bound = 1e7 if m.dtype == jnp.float32 else 1e10
    # after Frobenius normalization sigma_min >= 1/(cond*sqrt(k))
    k = m.shape[-1]
    l0 = 1.0 / (float(cond_bound) * float(np.sqrt(k)) * 1.01)
    if l0 < 3e-9:
        # below the LP's reliable conditioning range (f64 cond bounds):
        # the fixed hybrid schedule stays the right tool there
        return ns_polar(m)
    nrm = jnp.linalg.norm(m, axis=(-2, -1), keepdims=True)
    X = m / jnp.where(nrm > 0, nrm * 1.01, 1.0)
    # quintic phase to a coarse 1e-2 edge, then cubic polish steps
    # (quadratic contraction: 1e-2 -> 1.5e-4 -> 3e-8 [-> 2e-15]) —
    # cubic NS is also stable against f32 rounding pushing sigma
    # slightly above 1, which the aggressive quintics are not
    if mode == "hybrid":
        sched = _polar_hybrid_schedule(l0)
    else:
        sched = _polar_express_schedule(l0, 1e-2)
    if polish is None:
        polish = 3 if m.dtype == jnp.float32 else 4
    for (a, b, c) in sched:
        G = jnp.conj(X.swapaxes(-1, -2)) @ X
        X = a * X + X @ (b * G + c * (G @ G))
    eye = jnp.eye(k, dtype=m.dtype)
    for _ in range(polish):
        G = jnp.conj(X.swapaxes(-1, -2)) @ X
        X = 0.5 * X @ (3.0 * eye - G)
    P = jnp.conj(X.swapaxes(-1, -2)) @ m
    return X, P


def cholqr2(m: Array) -> Tuple[Array, Array]:
    """Cholesky-QR2: Q with orthonormal columns, R upper triangular.
    Two passes restore f32 orthogonality (condition-squared of one pass);
    on TPU the Gram matmuls ride the MXU while Householder QR serializes."""
    n = m.shape[-1]
    eye = jnp.eye(n, dtype=m.dtype)
    G = jnp.conj(m.swapaxes(-1, -2)) @ m
    # relative jitter keeps Cholesky finite on rank-deficient panels; the
    # spurious directions are gauge-null (same as Householder's arbitrary
    # orthogonal completion) and the second pass restores orthogonality.
    # Dtype-aware floor: 1e-6 is below f32 rounding on ill-conditioned
    # Grams (observed NaNs in B=256 batched sweeps) — use ~1e3*eps.
    eps = jnp.finfo(m.dtype).eps
    jfac = jnp.maximum(1e3 * eps, 1e-6).astype(m.dtype)
    jit1 = (jnp.trace(G, axis1=-2, axis2=-1) / n)[..., None, None]
    G = G + jfac * jit1 * eye
    L = jnp.linalg.cholesky(G)
    q1 = jax.lax.linalg.triangular_solve(
        L, m.swapaxes(-1, -2), left_side=True, lower=True).swapaxes(-1, -2)
    G2 = jnp.conj(q1.swapaxes(-1, -2)) @ q1
    jfac2 = jnp.maximum(10 * eps, 1e-12).astype(m.dtype)
    jit2 = (jnp.trace(G2, axis1=-2, axis2=-1) / n)[..., None, None]
    G2 = G2 + jfac2 * jit2 * eye
    L2 = jnp.linalg.cholesky(G2)
    q2 = jax.lax.linalg.triangular_solve(
        L2, q1.swapaxes(-1, -2), left_side=True, lower=True
    ).swapaxes(-1, -2)
    r = L2.swapaxes(-1, -2) @ L.swapaxes(-1, -2)
    return q2, r


class MaskedSVD(NamedTuple):
    """Static-shape truncated SVD result.

    ``u``: [..., m, k], ``s``: [..., k] (truncated entries zeroed),
    ``vh``: [..., k, n], ``num_kept``: [] int32, ``trunc_sq_norm``: []
    squared L2 norm of the discarded spectrum (includes both mask-truncated
    values and the hard tail beyond ``k``).
    """
    u: jax.Array
    s: jax.Array
    vh: jax.Array
    num_kept: jax.Array
    trunc_sq_norm: jax.Array


def svd_masked(
    matrix,
    max_singular_values: int,
    max_truncation_error: Optional[float] = None,
    relative: bool = False,
) -> MaskedSVD:
    """Jit/vmap-safe truncated SVD with a static output rank.

    The output rank is always ``k = min(max_singular_values, min(m, n))``;
    singular values that the reference semantics would discard are zeroed in
    ``s`` (and counted in ``trunc_sq_norm``) instead of changing the shape.
    Batched inputs ([..., m, n]) are supported.
    """
    u, s, vh = jnp.linalg.svd(matrix, full_matrices=False)
    n = s.shape[-1]
    k = min(int(max_singular_values), n)
    full_sq = jnp.sum(s**2, axis=-1)
    u_k, s_k, vh_k = u[..., :, :k], s[..., :k], vh[..., :k, :]
    if max_truncation_error is not None:
        err = jnp.asarray(max_truncation_error, dtype=s.dtype)
        if relative:
            err = err * s[..., 0]
        tail_sq = jnp.cumsum((s**2)[..., ::-1], axis=-1)[..., ::-1]
        # keep s[i] iff the tail starting at i has L2 norm > err
        keep_mask_full = jnp.sqrt(tail_sq) > err[..., None]
        keep_mask = keep_mask_full[..., :k]
    else:
        keep_mask = jnp.ones(s_k.shape, dtype=bool)
    s_masked = jnp.where(keep_mask, s_k, jnp.zeros_like(s_k))
    num_kept = jnp.sum(keep_mask, axis=-1).astype(jnp.int32)
    kept_sq = jnp.sum(s_masked**2, axis=-1)
    trunc_sq = full_sq - kept_sq
    # zero the corresponding rows/cols so downstream contractions ignore them
    u_k = jnp.where(keep_mask[..., None, :], u_k, jnp.zeros_like(u_k))
    vh_k = jnp.where(keep_mask[..., :, None], vh_k, jnp.zeros_like(vh_k))
    return MaskedSVD(u_k, s_masked, vh_k, num_kept, trunc_sq)


class MaskedSVDSC(NamedTuple):
    """Split-complex analog of :class:`MaskedSVD` (``u``/``vh`` are SC)."""
    u: object
    s: jax.Array
    vh: object
    num_kept: jax.Array
    trunc_sq_norm: jax.Array


def svd_masked_sc(
    matrix,
    max_singular_values: int,
    max_truncation_error: Optional[float] = None,
    relative: bool = False,
) -> MaskedSVDSC:
    """Static-rank truncated SVD of a split-complex matrix — same
    semantics as :func:`svd_masked` on complex input, executed entirely in
    real arithmetic (see :func:`tensornetwork_tpu.ops.split_complex.svd`).
    Unbatched ([m, n]) input."""
    from tensornetwork_tpu.ops import split_complex as sc

    u, s, vh = sc.svd(matrix)
    n = s.shape[-1]
    k = min(int(max_singular_values), n)
    full_sq = jnp.sum(s**2, axis=-1)
    u_k = sc.SC(u.re[..., :, :k], u.im[..., :, :k])
    s_k = s[..., :k]
    vh_k = sc.SC(vh.re[..., :k, :], vh.im[..., :k, :])
    if max_truncation_error is not None:
        err = jnp.asarray(max_truncation_error, dtype=s.dtype)
        if relative:
            err = err * s[..., 0]
        tail_sq = jnp.cumsum((s**2)[..., ::-1], axis=-1)[..., ::-1]
        keep_mask = (jnp.sqrt(tail_sq) > err[..., None])[..., :k]
    else:
        keep_mask = jnp.ones(s_k.shape, dtype=bool)
    s_masked = jnp.where(keep_mask, s_k, jnp.zeros_like(s_k))
    num_kept = jnp.sum(keep_mask, axis=-1).astype(jnp.int32)
    trunc_sq = full_sq - jnp.sum(s_masked**2, axis=-1)
    ucol = keep_mask[..., None, :]
    vrow = keep_mask[..., :, None]
    u_k = sc.SC(jnp.where(ucol, u_k.re, 0.0), jnp.where(ucol, u_k.im, 0.0))
    vh_k = sc.SC(jnp.where(vrow, vh_k.re, 0.0),
                 jnp.where(vrow, vh_k.im, 0.0))
    return MaskedSVDSC(u_k, s_masked, vh_k, num_kept, trunc_sq)


def ns_polar_complete(m: jax.Array, quintic_iters: Optional[int] = None,
                      cubic_iters: Optional[int] = None
                      ) -> Tuple[jax.Array, jax.Array]:
    """Matmul-only polar split ``m = Q @ P`` with a FULL isometry Q
    (Q^T Q = I) for real (optionally batched [..., n, k], n >= k)
    matrices — including exactly rank-deficient input, where plain
    Newton-Schulz leaves null columns at zero.

    Real-arithmetic twin of
    :func:`tensornetwork_tpu.ops.split_complex.polar_complete` (same
    hybrid quintic/cubic schedule, smoothstep-sharpened defect projector,
    deterministic coordinate-basis completion, cubic polish).  This is the
    QR replacement for batched gauge shifts on TPU, where Householder QR
    serializes.
    """
    n, k = m.shape[-2], m.shape[-1]
    if n < k:
        raise ValueError(f"need n >= k, got {m.shape}")
    dt = m.dtype
    # dtype-aware schedule: f32 reaches its precision floor with fewer
    # steps (validated to cond 1e7)
    if quintic_iters is None:
        quintic_iters = 14 if dt == jnp.float32 else 20
    if cubic_iters is None:
        cubic_iters = 7 if dt == jnp.float32 else 10
    eye = jnp.eye(k, dtype=dt)

    def ns(x):
        nrm = jnp.sqrt(jnp.sum(x * x, axis=(-2, -1), keepdims=True))
        X = x / jnp.where(nrm > 0, nrm * 1.01, 1.0)
        a, b, c = 3.4445, -4.7750, 2.0315
        for _ in range(quintic_iters):
            G = jnp.swapaxes(X, -1, -2) @ X
            X = a * X + X @ (b * G + c * (G @ G))
        for _ in range(cubic_iters):
            G = jnp.swapaxes(X, -1, -2) @ X
            X = 0.5 * X @ (3.0 * eye - G)
        return X

    X = ns(m)
    D = eye - jnp.swapaxes(X, -1, -2) @ X
    for _ in range(25):  # smoothstep: eigenvalues -> {0, 1}
        D2 = D @ D
        D = 3.0 * D2 - 2.0 * (D2 @ D)
    E = jnp.broadcast_to(jnp.eye(n, k, dtype=dt), m.shape)
    Y = E - X @ (jnp.swapaxes(X, -1, -2) @ E)
    Z = ns(Y @ D) @ D
    Q = X + Z
    for _ in range(4):  # cubic polish; span(Q) preserved
        G = jnp.swapaxes(Q, -1, -2) @ Q
        Q = 0.5 * Q @ (3.0 * eye - G)
    P = jnp.swapaxes(Q, -1, -2) @ m
    return Q, P


class SubspaceTrunc(NamedTuple):
    """Matmul-only truncation result: ``q``: [..., m, k] isometry spanning
    (an approximation of) the dominant rank-k left-singular subspace,
    ``rest``: [..., k, n] with ``q @ rest`` the projected matrix,
    ``trunc_sq_norm``: [...] discarded squared norm."""
    q: jax.Array
    rest: jax.Array
    trunc_sq_norm: jax.Array


def subspace_truncate(matrix, k: int, q0=None, iters: int = 6,
                      key=None, power: int = 1,
                      orth: str = "qr",
                      polar_fast=None) -> SubspaceTrunc:
    """Rank-``k`` truncation by warm-started subspace iteration —
    matmuls + Cholesky-QR only, no batched SVD/eigh (which serialize
    pathologically on TPU; measured in BASELINE.md).

    Equivalent to the truncated SVD *as a projector*: if ``u s vh`` is
    the SVD, then ``q @ rest == u_k s_k vh_k`` up to convergence of the
    iteration (exact in the spectral-gap limit; warm starts from the
    previous sweep's site tensors make 2-6 iterations sufficient inside
    DMRG).  The within-subspace basis of ``q`` is NOT the singular basis
    — downstream must treat it as gauge (MPS updates do).

    ``q0``: [..., m, k] warm start (need not be orthonormal).  Falls
    back to the first ``k`` columns of the identity (+ optional random
    perturbation from ``key``) when None.  ``power``: applications of
    the Gram matrix per orthogonalization — numerically unsafe at f32
    (squared spectrum collapses; measured garbage on chip), keep 1.
    ``orth``: per-iteration orthonormalizer.  "qr" (batched Householder)
    is the exact default — DMRG thetas have numerical rank ~k (they are
    built from rank-k pieces), every iterate is rank-deficient, and
    Cholesky-based orthonormalization NaNs on the null space at f32;
    Householder completes it exactly.  "cholqr2" is the matmul-only
    fast path for full-rank inputs.  "polar" orthonormalizes every
    iterate with the Newton-Schulz polar factor (matmul-only; handles
    cond up to ~1e7 at f32 but leaves exact-null columns zero);
    "polar+qr" runs polar on the intermediate iterates and one final
    Householder QR to complete the basis exactly — NOT the TPU choice:
    in the on-chip two-site A/B (BASELINE.md, 2026-08-20) it DIVERGED
    (the final QR hits a rank-deficient iterate and the backend's
    batched QR corrupts the span); plain "polar" is the batched-TPU
    default (328 inst-sweeps/s at floor -1.7e-5).

    ``polar_fast=(quintic, cubic)``: with ``orth="polar"``, run the
    INTERMEDIATE orthonormalizations with a truncated Newton-Schulz
    schedule (they only have to keep the iterate well conditioned — the
    span is re-mixed by the next Gram application anyway) and the full
    dtype-aware schedule on the final iterate only.  Cuts the dominant
    dependent-GEMM chain of the truncation stage ~(iters-1)x.
    """
    m = matrix.shape[-2]
    batch = matrix.shape[:-2]
    if q0 is None:
        q0 = jnp.broadcast_to(
            jnp.eye(m, k, dtype=matrix.dtype),
            batch + (m, k))
        if key is not None:
            q0 = q0 + 0.01 * jax.random.normal(key, q0.shape,
                                               matrix.dtype)
    G = matrix @ jnp.swapaxes(matrix, -1, -2)
    # normalize so repeated applications stay in range (f32)
    gnorm = jnp.linalg.norm(G, axis=(-2, -1), keepdims=True)
    Gn = G / jnp.where(gnorm > 0, gnorm, 1.0)
    if orth == "cholqr2":
        orth_fns = [cholqr2] * iters
    elif orth == "polar":
        if polar_fast is None:
            orth_fns = [ns_polar] * iters
        else:
            qi, ci = polar_fast
            fast = functools.partial(ns_polar, quintic_iters=qi,
                                     cubic_iters=ci)
            orth_fns = [fast] * (iters - 1) + [ns_polar]
    elif orth == "polar+qr":
        orth_fns = [ns_polar] * (iters - 1) + [jnp.linalg.qr]
    else:
        orth_fns = [jnp.linalg.qr] * iters
    q = q0
    for orth_fn in orth_fns:
        y = Gn @ q
        if power > 1:
            for _ in range(power - 1):
                y = Gn @ y
        q = orth_fn(y)[0]
    rest = jnp.swapaxes(q, -1, -2) @ matrix
    trunc = (jnp.sum(matrix * matrix, axis=(-2, -1))
             - jnp.sum(rest * rest, axis=(-2, -1)))
    trunc = jnp.maximum(trunc, 0.0)
    return SubspaceTrunc(q, rest, trunc)
