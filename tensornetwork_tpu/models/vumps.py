"""VUMPS: variational uniform-MPS ground states in the thermodynamic limit.

The reference's ``InfiniteMPS`` (reference
``matrixproductstates/infinite_mps.py:25-307``) only provides
transfer-matrix eigenvectors and canonicalization; it has no
infinite-system ground-state solver.  This module adds the VUMPS
algorithm (Zauner-Stauber et al., PRB 97, 045145 (2018) — see PAPERS.md)
as a TPU-native solver: one *entire* VUMPS iteration — quasi-triangular
MPO environment solves (on-device GMRES over the regularized transfer
map), the H_AC / H_C Lanczos eigensolves, and the polar-decomposition
gauge updates — is a single jitted XLA computation with static shapes.

Conventions (matching :mod:`tensornetwork_tpu.models.dmrg`):
  AL/AR/AC[a, s, b]   uniform site tensors, a/b bond, s physical
  C[a, b]             center matrix,  AC = AL·C = C·AR at the fixed point
  W[wl, wr, s, t]     uniform MPO tensor in lower-triangular (Schur) form:
                      W[w, v] = 0 for v > w, W[0, 0] = W[M-1, M-1] = 1,
                      row M-1 is the "start" channel and column 0 the
                      "done" channel (the layout every MPO in
                      :mod:`tensornetwork_tpu.models.mpo` uses).
  LW[a, w, c] / RW[b, v, d]  stacked environments, [ket, mpo, bra].
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tensornetwork_tpu.ops import krylov

Array = jax.Array


class VUMPSState(NamedTuple):
    AL: Array
    AR: Array
    C: Array
    AC: Array


class VUMPSResult(NamedTuple):
    state: VUMPSState
    energy: float
    energies: list            # per-iteration energy density
    gradient_norms: list      # per-iteration ||AC - AL·C||
    LW: Array                 # converged left environment (chi, M, chi)
    RW: Array                 # converged right environment (chi, M, chi)


# ---------------------------------------------------------------------------
# transfer maps and fixed points
# ---------------------------------------------------------------------------


def _transfer_left(x: Array, A: Array) -> Array:
    """(x| T_A: x'[r,p] = x[a,c] A[a,t,r] conj(A)[c,t,p]."""
    return jnp.einsum("ac,atr,ctp->rp", x, A, jnp.conj(A), optimize="auto")


def _transfer_right(x: Array, A: Array) -> Array:
    """T_A |x): x'[a,c] = A[a,t,r] conj(A)[c,t,p] x[r,p]."""
    return jnp.einsum("atr,ctp,rp->ac", A, jnp.conj(A), x, optimize="auto")


def _fixed_point_right(AL: Array, r0: Array, n_iter: int,
                       gmres_m: int = 30, gmres_restarts: int = 2,
                       rtol=1e-7) -> Array:
    """Right fixed point of T_AL (eigenvalue exactly 1: AL is
    left-isometric) via the DEFLATED linear system
    ``(1 - T + q·tr(·)) x = q`` with ``q = I/chi`` — GMRES-accelerated,
    warm-started with ``r0``.  Power iteration (the r1-r3 approach)
    contracts only like the transfer gap per step, and its leftover
    O(gauge-err) error made the downstream H_AC sandwich slightly
    non-Hermitian, stalling the Lanczos solves — and therefore the whole
    VUMPS gauge error — at the fixed-point error level (measured: the
    critical-TFI oscillation around 1e-4).  ``n_iter`` power steps
    polish/precondition the seed first (cheap; also keeps the guess PSD)."""
    def body(r, _):
        r = _transfer_right(r, AL)
        r = 0.5 * (r + jnp.conj(r.T))
        tr = jnp.trace(r)
        return r / jnp.where(jnp.abs(tr) > 0, tr, 1.0), None
    r0, _ = jax.lax.scan(body, r0, None, length=min(n_iter, 5))
    chi = AL.shape[0]
    q = jnp.eye(chi, dtype=AL.dtype) / chi
    op = lambda x: x - _transfer_right(x, AL) + jnp.trace(x) * q
    r = _gmres_static(op, q, r0, gmres_m, gmres_restarts, rtol)
    r = 0.5 * (r + jnp.conj(r.T))
    tr = jnp.trace(r)
    return r / jnp.where(jnp.abs(tr) > 0, tr, 1.0)


def _fixed_point_left(AR: Array, l0: Array, n_iter: int,
                      gmres_m: int = 30, gmres_restarts: int = 2,
                      rtol=1e-7) -> Array:
    """Left fixed point of T_AR — deflated-GMRES solve, as
    :func:`_fixed_point_right`."""
    def body(l, _):
        l = _transfer_left(l, AR)
        l = 0.5 * (l + jnp.conj(l.T))
        tr = jnp.trace(l)
        return l / jnp.where(jnp.abs(tr) > 0, tr, 1.0), None
    l0, _ = jax.lax.scan(body, l0, None, length=min(n_iter, 5))
    chi = AR.shape[0]
    q = jnp.eye(chi, dtype=AR.dtype) / chi
    op = lambda x: x - _transfer_left(x, AR) + jnp.trace(x) * q
    l = _gmres_static(op, q, l0, gmres_m, gmres_restarts, rtol)
    l = 0.5 * (l + jnp.conj(l.T))
    tr = jnp.trace(l)
    return l / jnp.where(jnp.abs(tr) > 0, tr, 1.0)


# ---------------------------------------------------------------------------
# jit-safe GMRES (static restart/iteration counts, no host syncs)
# ---------------------------------------------------------------------------


def _gmres_static(op, b: Array, x0: Array, m: int, restarts: int,
                  rtol=1e-7) -> Array:
    """Restarted GMRES(m) with static counts — usable inside jit.

    ``op`` maps (chi, chi) -> (chi, chi).  ``rtol`` may be a traced
    scalar — the deep-convergence VUMPS loop tightens it with the gauge
    error (a fixed 1e-7 caps the achievable gauge error at ~1e-7)."""
    shape = b.shape
    mv = lambda v: op(v.reshape(shape)).reshape(-1)
    bf = b.reshape(-1)
    # Givens-rotation GMRES core (jit-safe; converged restarts exit early
    # inside the compiled while_loop instead of running all `restarts`)
    x, _ = krylov.gmres_kernel(mv, bf, x0.reshape(-1), m, restarts,
                               rtol * jnp.linalg.norm(bf))
    return x.reshape(shape)


# ---------------------------------------------------------------------------
# quasi-triangular MPO environments
# (Zauner-Stauber et al. §V; channel-by-channel geometric-sum solves)
# ---------------------------------------------------------------------------


def mpo_diagonal_coefficients(W) -> Tuple[float, ...]:
    """Host-side: the scalar lambda_w with W[w, w] = lambda_w * I.

    Raises if a diagonal block is not proportional to the identity (the
    quasi-triangular solver requires a Schur-form MPO; every MPO built in
    :mod:`tensornetwork_tpu.models.mpo` qualifies)."""
    Wn = np.asarray(W)
    M, _, d, _ = Wn.shape[0], Wn.shape[1], Wn.shape[2], Wn.shape[3]
    lams = []
    eye = np.eye(d)
    for w in range(M):
        blk = Wn[w, w]
        lam = np.trace(blk) / d
        if not np.allclose(blk, lam * eye, atol=1e-12):
            raise ValueError(
                f"MPO diagonal block W[{w},{w}] is not a multiple of the "
                "identity; VUMPS needs a Schur-form (triangular) MPO")
        lams.append(float(np.real(lam)))
    # strict lower-triangularity check off the diagonal
    for w in range(M):
        for v in range(w + 1, M):
            if not np.allclose(Wn[w, v], 0.0, atol=1e-12):
                raise ValueError(
                    "MPO is not lower triangular (W[{},{}] != 0); "
                    "VUMPS expects the layout of models.mpo".format(w, v))
    if abs(lams[0] - 1.0) > 1e-12 or abs(lams[-1] - 1.0) > 1e-12:
        raise ValueError("expected identity channels at W[0,0] and "
                         "W[M-1,M-1]")
    return tuple(lams)


def left_mpo_environment(AL: Array, W: Array, r: Array, lams,
                         LW0_guess: Array, gmres_m: int,
                         gmres_restarts: int, rtol=1e-7
                         ) -> Tuple[Array, Array]:
    """Solve the stacked left environment LW (chi, M, chi) and the energy
    density.  ``r``: right fixed point of T_AL, trace-normalized.

    Channels descend w = M-1 .. 0; channel M-1 is the identity start
    channel (LW = I), middle channels solve (1 - lam_w T) x = Y_w, and
    channel 0 solves the regularized geometric sum with the energy
    density projected out."""
    chi = AL.shape[0]
    M = W.shape[0]
    dtype = AL.dtype
    eye = jnp.eye(chi, dtype=dtype)
    # channel-major stack for the recursion
    Ls = [None] * M
    Ls[M - 1] = eye
    energy = None
    for v in range(M - 2, -1, -1):
        solved = jnp.stack([Ls[w] for w in range(v + 1, M)])   # (n, chi, chi)
        Wcol = W[v + 1:, v]                                     # (n, d, d)
        Y = jnp.einsum("wac,atr,wst,csp->rp", solved, AL, Wcol,
                       jnp.conj(AL), optimize="auto")
        lam = lams[v]
        if v == 0:
            # regularized solve: (1 - T + |r)(1|) x = Y - e·1,  e = (Y|r)
            e = jnp.einsum("ac,ac->", Y, r)
            b = Y - e * eye
            op = lambda x: (x - _transfer_left(x, AL)
                            + jnp.einsum("ac,ac->", x, r) * eye)
            Ls[0] = _gmres_static(op, b, LW0_guess, gmres_m,
                                  gmres_restarts, rtol)
            energy = e
        elif lam == 0.0:
            Ls[v] = Y
        else:
            op = lambda x, _lam=lam: x - _lam * _transfer_left(x, AL)
            Ls[v] = _gmres_static(op, Y, Y, gmres_m, gmres_restarts, rtol)
    LW = jnp.stack(Ls).transpose(1, 0, 2)   # (chi, M, chi): [ket, w, bra]
    return LW, energy


def right_mpo_environment(AR: Array, W: Array, l: Array, lams,
                          RWlast_guess: Array, gmres_m: int,
                          gmres_restarts: int, rtol=1e-7
                          ) -> Tuple[Array, Array]:
    """Solve the stacked right environment RW (chi, M, chi) and the energy
    density from the right.  ``l``: left fixed point of T_AR."""
    chi = AR.shape[0]
    M = W.shape[0]
    dtype = AR.dtype
    eye = jnp.eye(chi, dtype=dtype)
    Rs = [None] * M
    Rs[0] = eye
    energy = None
    for w in range(1, M):
        solved = jnp.stack([Rs[v] for v in range(0, w)])        # (n, chi, chi)
        Wrow = W[w, :w]                                          # (n, d, d)
        Y = jnp.einsum("vbd,ltb,vst,psd->lp", solved, AR, Wrow,
                       jnp.conj(AR), optimize="auto")
        lam = lams[w]
        if w == M - 1:
            e = jnp.einsum("ac,ac->", l, Y)
            b = Y - e * eye
            op = lambda x: (x - _transfer_right(x, AR)
                            + jnp.einsum("ac,ac->", l, x) * eye)
            Rs[w] = _gmres_static(op, b, RWlast_guess, gmres_m,
                                  gmres_restarts, rtol)
            energy = e
        elif lam == 0.0:
            Rs[w] = Y
        else:
            op = lambda x, _lam=lam: x - _lam * _transfer_right(x, AR)
            Rs[w] = _gmres_static(op, Y, Y, gmres_m, gmres_restarts, rtol)
    RW = jnp.stack(Rs).transpose(1, 0, 2)   # (chi, M, chi): [ket, v, bra]
    return RW, energy


# ---------------------------------------------------------------------------
# effective Hamiltonians and gauge updates
# ---------------------------------------------------------------------------


def _matvec_AC(LW: Array, W: Array, RW: Array, x: Array) -> Array:
    return jnp.einsum("awc,wvst,atb,bvd->csd", LW, W, x, RW,
                      optimize="auto")


def _matvec_C(LW: Array, RW: Array, x: Array) -> Array:
    return jnp.einsum("awc,ab,bwd->cd", LW, x, RW, optimize="auto")


def _restarted_ritz_to_tol(one_pass, mv, v0, max_restarts, solve_tol):
    """Repeat ``one_pass`` (an m-step ground-state solve seeded with the
    current best vector) until the Ritz residual ``||H v - <v|H|v> v||``
    drops below ``solve_tol`` (a traced scalar) or ``max_restarts``
    passes ran.  The residual check costs one extra matvec per pass and
    runs BEFORE the first pass — at late VUMPS iterations the warm start
    already meets the target and the solve is one matvec.

    This adaptivity is what makes VUMPS contract at criticality: the AC
    and C updates must be solved CONSISTENTLY (residual well below the
    current gauge error), else the two Ritz vectors rotate independently
    inside the near-degenerate low cluster of H_AC/H_C and the gauge
    error ||AC - AL·C|| spikes instead of contracting (measured: chi=64
    critical TFI oscillates at 1e-4..1e-3 with any FIXED restart count;
    converges monotonically with the residual-targeted loop)."""
    def cond(carry):
        v, i = carry
        Hv = mv(v)
        lam = jnp.vdot(v, Hv)
        res = jnp.linalg.norm(Hv - lam * v)
        return jnp.logical_and(i < max_restarts, res > solve_tol)

    def body(carry):
        v, i = carry
        v = one_pass(v)
        return v / jnp.linalg.norm(v), i + 1

    v0 = v0 / jnp.linalg.norm(v0)
    v, _ = jax.lax.while_loop(cond, body, (v0, jnp.asarray(0)))
    return v


def _solve_AC(LW, W, RW, AC, m, lanczos_impl, interpret, restarts=1,
              solve_tol=None):
    """Smallest Ritz vector of the AC effective Hamiltonian; fused
    Pallas whole-Lanczos kernel on TPU (same sandwich as the DMRG
    H_eff), XLA Lanczos otherwise.  ``restarts`` bounds the number of
    m-step passes; with ``solve_tol`` (traced scalar) the passes stop
    early once the Ritz residual meets it (see
    :func:`_restarted_ritz_to_tol`)."""
    mv = lambda x: _matvec_AC(LW, W, RW, x)
    use_fused = False
    if lanczos_impl == "fused":
        chi, d = AC.shape[0], AC.shape[1]
        M = W.shape[0]
        from tensornetwork_tpu.ops import vmem
        use_fused = vmem.admit_resident_lanczos(chi, d, M, m)
    if use_fused:
        from tensornetwork_tpu.ops import kernels

        def one_pass(v):
            # eigh Ritz, NOT the batched-DMRG "power" shortcut: the
            # 2x2-step power-Ritz residual is too loose for the
            # residual-targeted VUMPS solves and the gauge error
            # oscillates at 1e-3 (measured on chip, chi=64 critical);
            # a single m x m eigh per solve is cheap at batch 1.
            _, evec = kernels.fused_lanczos_ground_state(
                LW[None], W, RW[None], v[None], num_krylov_vecs=m,
                ritz_method="eigh", interpret=interpret,
                precision=jax.lax.Precision.HIGHEST)
            return evec[0]
    else:
        def one_pass(v):
            _, vec = krylov.eigsh_lanczos(mv, v, num_krylov_vecs=m,
                                          numeig=1)
            return vec[0]
    if solve_tol is None:
        v = AC / jnp.linalg.norm(AC)
        for _ in range(restarts):
            v = one_pass(v)
            v = v / jnp.linalg.norm(v)
        return v
    return _restarted_ritz_to_tol(one_pass, mv, AC, restarts, solve_tol)


def _solve_C(LW, RW, C, m, lanczos_impl, interpret, restarts=1,
             solve_tol=None):
    """Zero-site solve: the bond operator is the same sandwich with one
    physical tile and identity MPO couplings."""
    mv = lambda x: _matvec_C(LW, RW, x)
    use_fused = False
    if lanczos_impl == "fused":
        chi = C.shape[0]
        M = LW.shape[1]
        from tensornetwork_tpu.ops import vmem
        use_fused = vmem.admit_resident_lanczos(chi, 1, M, m)
    if use_fused:
        from tensornetwork_tpu.ops import kernels
        M = LW.shape[1]
        W_eye = jnp.eye(M, dtype=C.dtype).reshape(M, M, 1, 1)

        def one_pass(v):
            # eigh Ritz — see _solve_AC
            _, evec = kernels.fused_lanczos_ground_state(
                LW[None], W_eye, RW[None], v[None, :, None, :],
                num_krylov_vecs=m, ritz_method="eigh",
                interpret=interpret,
                precision=jax.lax.Precision.HIGHEST)
            return evec[0, :, 0, :]
    else:
        def one_pass(v):
            _, vec = krylov.eigsh_lanczos(mv, v, num_krylov_vecs=m,
                                          numeig=1)
            return vec[0]
    if solve_tol is None:
        v = C / jnp.linalg.norm(C)
        for _ in range(restarts):
            v = one_pass(v)
            v = v / jnp.linalg.norm(v)
        return v
    return _restarted_ritz_to_tol(one_pass, mv, C, restarts, solve_tol)


def _polar_split(AC: Array, C: Array) -> Tuple[Array, Array, Array]:
    """AL, AR from the polar parts of AC·C† and C†·AC, plus the gauge
    error ||AC - AL·C||."""
    chi, d, _ = AC.shape
    Ml = AC.reshape(chi * d, chi) @ jnp.conj(C.T)
    U, _, Vh = jnp.linalg.svd(Ml, full_matrices=False)
    AL = (U @ Vh).reshape(chi, d, chi)
    Mr = jnp.conj(C.T) @ AC.reshape(chi, d * chi)
    U2, _, Vh2 = jnp.linalg.svd(Mr, full_matrices=False)
    AR = (U2 @ Vh2).reshape(chi, d, chi)
    err = jnp.linalg.norm(AC - jnp.einsum("asb,bc->asc", AL, C))
    return AL, AR, err


def vumps_iteration(state: VUMPSState, W: Array, lams: Tuple[float, ...],
                    num_krylov_vecs: int = 25, gmres_m: int = 30,
                    gmres_restarts: int = 2, n_power: int = 10,
                    lanczos_impl: Optional[str] = None,
                    guesses=None, lanczos_restarts: int = 4,
                    solve_tol=None):
    """One full VUMPS iteration as a single XLA computation.

    Returns ``(new_state, energy_density, gauge_error, LW, RW, guesses)``
    where ``guesses = (r, l)`` are the transfer fixed points to warm-start
    the next iteration with.  Pass the previous iteration's ``guesses``
    back in: warm-started power iterations accumulate accuracy across
    the VUMPS loop, which is what lets a small ``n_power`` converge the
    gauge error through small transfer gaps (critical chains) — with
    cold ``C·C†`` seeds every iteration the error floor is set by the
    per-iteration fixed-point error and the loop stalls around 1e-3
    (measured, chi=16 critical TFI)."""
    if lanczos_impl is None:
        lanczos_impl = ("fused" if jax.default_backend() == "tpu"
                        else "xla")
    interpret = jax.default_backend() != "tpu"
    if guesses is None:
        C = state.C
        r0 = C @ jnp.conj(C.T)
        l0 = C.T @ jnp.conj(C)
        guesses = (r0 / jnp.trace(r0), l0 / jnp.trace(l0))
    return _vumps_iteration_jit(state, W, guesses, solve_tol, lams,
                                num_krylov_vecs, gmres_m, gmres_restarts,
                                n_power, lanczos_impl, interpret,
                                lanczos_restarts)


@functools.partial(jax.jit, static_argnames=(
    "lams", "num_krylov_vecs", "gmres_m", "gmres_restarts", "n_power",
    "lanczos_impl", "interpret", "lanczos_restarts"))
def _vumps_iteration_jit(state: VUMPSState, W: Array, guesses, solve_tol,
                         lams, num_krylov_vecs=25, gmres_m=30,
                         gmres_restarts=2, n_power=10,
                         lanczos_impl="xla", interpret=False,
                         lanczos_restarts=4):
    with jax.default_matmul_precision("highest"):
        AL, AR, C, AC = state
        chi = C.shape[0]
        # fixed points of the pure transfer maps: warm-started from the
        # previous iteration (falling back to C·C†, exact at the fixed
        # point), polished by n_power power steps.  Mixing in the C·C†
        # seed keeps the guess PSD-aligned after large state updates.
        r_prev, l_prev = guesses
        r0 = C @ jnp.conj(C.T)
        r0 = r0 / jnp.trace(r0)
        if solve_tol is None:
            env_rtol = 1e-7
        else:
            eps = jnp.finfo(C.dtype).eps
            env_rtol = jnp.clip(0.1 * solve_tol, 20 * eps, 1e-7)
        r = _fixed_point_right(AL, 0.5 * (r_prev + r0), n_power,
                               gmres_m, gmres_restarts, env_rtol)
        l0 = C.T @ jnp.conj(C)
        l0 = l0 / jnp.trace(l0)
        l = _fixed_point_left(AR, 0.5 * (l_prev + l0), n_power,
                              gmres_m, gmres_restarts, env_rtol)

        LW, eL = left_mpo_environment(AL, W, r, lams, jnp.zeros_like(C),
                                      gmres_m, gmres_restarts, env_rtol)
        RW, eR = right_mpo_environment(AR, W, l, lams, jnp.zeros_like(C),
                                       gmres_m, gmres_restarts, env_rtol)

        AC_new = _solve_AC(LW, W, RW, AC, num_krylov_vecs,
                           lanczos_impl, interpret, lanczos_restarts,
                           solve_tol)
        AC_new = AC_new / jnp.linalg.norm(AC_new)

        C_new = _solve_C(LW, RW, C, num_krylov_vecs, lanczos_impl,
                         interpret, lanczos_restarts, solve_tol)
        C_new = C_new / jnp.linalg.norm(C_new)

        AL_new, AR_new, err = _polar_split(AC_new, C_new)
        energy = 0.5 * jnp.real(eL + eR)
        return (VUMPSState(AL_new, AR_new, C_new, AC_new), energy, err,
                LW, RW, (r, l))


def random_vumps_state(key, chi: int, d: int = 2,
                       dtype=jnp.float64) -> VUMPSState:
    """Random mixed-canonical starting point: AL = isometry from QR, C
    random normalized, AR/AC from one polar split."""
    k1, k2 = jax.random.split(key)
    m = jax.random.normal(k1, (chi * d, chi), dtype)
    AL, _ = jnp.linalg.qr(m)
    AL = AL.reshape(chi, d, chi)
    C = jax.random.normal(k2, (chi, chi), dtype)
    C = C / jnp.linalg.norm(C)
    AC = jnp.einsum("asb,bc->asc", AL, C)
    _, AR, _ = _polar_split(AC, C)
    return VUMPSState(AL, AR, C, AC)


def vumps(W, chi: int, d: Optional[int] = None, num_iterations: int = 100,
          tol: float = 1e-8, num_krylov_vecs: int = 25, gmres_m: int = 30,
          gmres_restarts: int = 2, n_power: int = 10, seed: int = 0,
          dtype=jnp.float64, initial_state: Optional[VUMPSState] = None,
          verbose: int = 0, lanczos_restarts: int = 20) -> VUMPSResult:
    """Find the uniform-MPS ground state of the infinite chain with
    uniform MPO tensor ``W`` (take a bulk site of any MPO from
    :mod:`tensornetwork_tpu.models.mpo`, e.g. ``FiniteTFI(J, h, N=2).Ws[0]``).

    Each iteration is one compiled XLA program; the Python loop only
    checks convergence of the gauge error ||AC - AL·C||."""
    W = jnp.asarray(W, dtype)
    lams = mpo_diagonal_coefficients(W)
    if d is None:
        d = W.shape[2]
    if initial_state is None:
        state = random_vumps_state(jax.random.PRNGKey(seed), chi, d, dtype)
    else:
        state = initial_state
    energies, errs = [], []
    LW = RW = None
    guesses = None
    # adaptive inner eigensolve target: the AC/C Ritz residuals must sit
    # well below the current gauge error for the fixed-point iteration to
    # contract (see _restarted_ritz_to_tol); lanczos_restarts bounds the
    # passes per iteration, the residual target ends them early.
    tol_floor = 50 * float(jnp.finfo(dtype).eps)
    prev_err = 0.1
    for it in range(num_iterations):
        solve_tol = jnp.asarray(max(0.02 * prev_err, tol_floor), dtype)
        state, e, err, LW, RW, guesses = vumps_iteration(
            state, W, lams, num_krylov_vecs=num_krylov_vecs,
            gmres_m=gmres_m, gmres_restarts=gmres_restarts,
            n_power=n_power, guesses=guesses,
            lanczos_restarts=lanczos_restarts, solve_tol=solve_tol)
        e = float(e)
        err_f = float(err)
        energies.append(e)
        errs.append(err_f)
        if verbose:
            print(f"vumps it {it}: e = {e:.12f}, |AC - AL C| = {err_f:.3e}")
        if err_f < tol:
            break
        prev_err = min(err_f, prev_err * 4.0)
    return VUMPSResult(state, energies[-1], energies, errs, LW, RW)


def correlation_length(AL: Array, num_krylov_vecs: int = 30) -> float:
    """xi = -1 / log|lambda_2| from the second transfer-matrix eigenvalue
    (the dominant one is 1 in the AL gauge)."""
    chi = AL.shape[0]
    mv = lambda x: _transfer_right(x, AL)
    v0 = jnp.ones((chi, chi), AL.dtype) / chi
    evals, _ = krylov.eigs(mv, v0, num_krylov_vecs=num_krylov_vecs,
                           numeig=2, which="LM")
    lam2 = sorted(np.abs(np.asarray(evals)))[0]
    lam2 = min(max(float(lam2), 1e-300), 1.0 - 1e-16)
    return -1.0 / np.log(lam2)


def tfi_exact_energy_density(J: float, h: float, nk: int = 20001) -> float:
    """Exact infinite-chain ground energy density of
    H = J sum X_i X_{i+1} + h sum Z_i (free-fermion integral oracle).

    For J = -1, h = -g this is -(1/4pi) ∫ 2 sqrt(1 + g^2 - 2 g cos k) dk;
    general signs map onto |J|, |h| (energy is even in both couplings'
    signs for the ground state)."""
    g = abs(h) / abs(J)
    k = np.linspace(-np.pi, np.pi, nk)
    eps = 2.0 * np.sqrt(1.0 + g * g - 2.0 * g * np.cos(k))
    trapezoid = getattr(np, "trapezoid", np.trapz)
    return -abs(J) * trapezoid(eps, k) / (4.0 * np.pi)


# ---------------------------------------------------------------------------
# iTDVP: real/imaginary-time evolution of uniform MPS in the thermodynamic
# limit (Vanderstraeten, Haegeman, Verstraete, SciPost Lect. Notes 7 (2019),
# alg. 5 — see PAPERS.md).  One step reuses the VUMPS environment solves
# and replaces the two eigensolves by Lanczos exponentials: AC and C both
# evolve forward under their (regularized) effective Hamiltonians, and the
# new gauge is extracted with the polar splits.  The reference library has
# no infinite-system time evolution at all.
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=(
    "lams", "num_krylov_vecs", "gmres_m", "gmres_restarts", "n_power",
    "imaginary"))
def itdvp_step(state: VUMPSState, W: Array, lams: Tuple[float, ...], dt,
               num_krylov_vecs: int = 25, gmres_m: int = 30,
               gmres_restarts: int = 2, n_power: int = 10,
               imaginary: bool = False):
    """One iTDVP step of size ``dt``: returns
    ``(new_state, energy_density, gauge_error)``.

    ``imaginary=True`` evolves ``exp(-H dt)`` (infinite-system
    ground-state projection); otherwise ``exp(-i H dt)`` (``state``
    should be complex).  The energy density returned is evaluated from
    the environment solves *before* the step (i.e. of the input state).
    """
    from tensornetwork_tpu.ops.krylov import expm_multiply_lanczos
    with jax.default_matmul_precision("highest"):
        AL, AR, C, AC = state
        r0 = C @ jnp.conj(C.T)
        r0 = r0 / jnp.trace(r0)
        r = _fixed_point_right(AL, r0, n_power, gmres_m, gmres_restarts)
        l0 = C.T @ jnp.conj(C)
        l0 = l0 / jnp.trace(l0)
        l = _fixed_point_left(AR, l0, n_power, gmres_m, gmres_restarts)
        LW, eL = left_mpo_environment(AL, W, r, lams, jnp.zeros_like(C),
                                      gmres_m, gmres_restarts)
        RW, eR = right_mpo_environment(AR, W, l, lams, jnp.zeros_like(C),
                                       gmres_m, gmres_restarts)
        coeff = jnp.asarray(-dt if imaginary else -1j * dt)
        mv_ac = lambda x: _matvec_AC(LW, W, RW, x)
        AC_new = expm_multiply_lanczos(mv_ac, AC, coeff, num_krylov_vecs)
        AC_new = AC_new / jnp.linalg.norm(AC_new)
        mv_c = lambda x: _matvec_C(LW, RW, x)
        C_new = expm_multiply_lanczos(mv_c, C, coeff, num_krylov_vecs)
        C_new = C_new / jnp.linalg.norm(C_new)
        AL_new, AR_new, err = _polar_split(AC_new, C_new)
        energy = 0.5 * jnp.real(eL + eR)
        return (VUMPSState(AL_new, AR_new, C_new, AC_new), energy, err)


def itdvp(state: VUMPSState, W, t: float, num_steps: int,
          lams: Optional[Tuple[float, ...]] = None,
          num_krylov_vecs: int = 25, imaginary: bool = False,
          observable=None):
    """Evolve a uniform MPS by total time ``t`` in ``num_steps`` iTDVP
    steps.  Returns ``(final state, energy trace, observable trace)``;
    ``observable(state) -> scalar`` is evaluated after every step."""
    W = jnp.asarray(W)
    if lams is None:
        lams = mpo_diagonal_coefficients(W)
    dt = t / num_steps
    energies, obs = [], []
    for _ in range(num_steps):
        state, e, err = itdvp_step(state, W, lams, dt,
                                   num_krylov_vecs=num_krylov_vecs,
                                   imaginary=imaginary)
        energies.append(float(jnp.real(e)))
        if observable is not None:
            obs.append(observable(state))
    return state, energies, obs


def uniform_expectation_1site(state: VUMPSState, op,
                              n_power: int = 40) -> complex:
    """<op> per site of a uniform MPS in mixed canonical form:
    tr(conj(AC) op AC r-weighted) — with AC normalized and the identity
    environments of the mixed gauge, this is
    einsum('asb,st,atb->', conj(AC), op, AC)."""
    AC = state.AC
    op = jnp.asarray(op, AC.dtype)
    val = jnp.einsum("asb,st,atb->", jnp.conj(AC), op, AC,
                     optimize="auto")
    nrm = jnp.einsum("asb,asb->", jnp.conj(AC), AC, optimize="auto")
    return complex(val / nrm)
