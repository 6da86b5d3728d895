"""TDVP: time-dependent variational principle for finite MPS, compiled
end-to-end for TPU.

The reference has no MPS time-evolution solver beyond two-site TEBD gates
(reference ``matrixproductstates/base_mps.py:481``); this module adds the
one-site projector-splitting TDVP integrator (Haegeman et al., PRB 94,
165116 (2016)) on the uniform stacked MPS layout of
:mod:`tensornetwork_tpu.models.dmrg`: one full symmetric sweep
(left-to-right + right-to-left, each a ``lax.scan``) is a single XLA
computation.  Local evolutions use the static-shape Lanczos
exponentiation :func:`tensornetwork_tpu.ops.krylov.expm_multiply_lanczos`
— no data-dependent control flow anywhere.

One-site TDVP is exactly norm- and energy-conserving for real time (up to
the Krylov projection error); ``imaginary=True`` gives imaginary-time
evolution toward the ground state (renormalizing each local update).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tensornetwork_tpu.models.dmrg import (
    _boundary_left, _boundary_right, _matvec_1s, _matvec_2s,
    _qr_shift_right, _rq_shift_left, _update_left, _update_right,
    mps_mpo_expectation, right_canonicalize_and_envs)
from tensornetwork_tpu.models.mpo import MPO
from tensornetwork_tpu.ops.decompositions import svd_masked
from tensornetwork_tpu.ops.krylov import expm_multiply_lanczos

Array = jax.Array


def _matvec_C(L: Array, R: Array, x: Array) -> Array:
    """Zero-site effective Hamiltonian: y[c,d] = L[a,w,c] x[a,b] R[b,w,d]."""
    return jnp.einsum("awc,ab,bwd->cd", L, x, R, optimize="auto")


def _renorm(x: Array) -> Array:
    n = jnp.linalg.norm(x)
    return x / jnp.where(n > 0, n, 1.0)



def _expm_local(Lenv, W, Renv, v, coeff, m, lanczos_impl, interpret,
                real_coeff):
    """Local ``exp(coeff*H_eff) v`` — fused Pallas kernel when enabled
    (real coeff only: imaginary-time path); XLA Lanczos otherwise."""
    if lanczos_impl == "fused" and real_coeff:
        chi, d = v.shape[0], v.shape[1]
        M = W.shape[0]
        from tensornetwork_tpu.ops import vmem
        if vmem.admit_resident_lanczos(chi, d, M, m):
            from tensornetwork_tpu.ops import kernels
            return kernels.expm_multiply_fused(
                Lenv[None], W, Renv[None], v[None], coeff, m,
                interpret=interpret,
                precision=jax.lax.Precision.HIGHEST)[0]
    mv = lambda x: _matvec_1s(Lenv, W, Renv, x)
    return expm_multiply_lanczos(mv, v, coeff, m)


def _expm_local_C(Lenv, Renv, v, coeff, m, lanczos_impl, interpret,
                  real_coeff):
    """Zero-site variant: the bond operator L·x·R is the same sandwich
    with one physical tile and identity MPO couplings."""
    if lanczos_impl == "fused" and real_coeff:
        chi = v.shape[0]
        M = Lenv.shape[1]
        from tensornetwork_tpu.ops import vmem
        if vmem.admit_resident_lanczos(chi, 1, M, m):
            from tensornetwork_tpu.ops import kernels
            W_eye = jnp.eye(M, dtype=v.dtype).reshape(M, M, 1, 1)
            y = kernels.expm_multiply_fused(
                Lenv[None], W_eye, Renv[None],
                v[None, :, None, :], coeff, m, interpret=interpret,
                precision=jax.lax.Precision.HIGHEST)
            return y[0, :, 0, :]
    mvc = lambda x: _matvec_C(Lenv, Renv, x)
    return expm_multiply_lanczos(mvc, v, coeff, m)


def tdvp_one_site_sweep(
    As: Array, Ws: Array, vL: Array, vR: Array, dt,
    num_krylov_vecs: int = 20, imaginary: bool = False,
    boundary_envs: Optional[Tuple[Array, Array]] = None,
    lanczos_impl: Optional[str] = None,
) -> Array:
    """One symmetric one-site TDVP sweep evolving the state by ``dt``.

    Left-to-right evolves each center tensor forward by dt/2 and each bond
    matrix backward by dt/2; right-to-left mirrors it.  ``imaginary=True``
    evolves ``exp(-H t)`` (ground-state projection); otherwise
    ``exp(-i H t)`` (``As`` should be complex).  Returns the evolved,
    right-canonical stack.  ``boundary_envs`` as in
    :func:`tensornetwork_tpu.models.dmrg.one_site_sweep`.
    """
    if lanczos_impl is None:
        lanczos_impl = ("fused" if jax.default_backend() == "tpu"
                        else "xla")
    interpret = jax.default_backend() != "tpu"
    return _tdvp_one_site_jit(As, Ws, vL, vR, dt, num_krylov_vecs,
                              imaginary, boundary_envs, lanczos_impl,
                              interpret)


@functools.partial(jax.jit, static_argnames=(
    "num_krylov_vecs", "imaginary", "lanczos_impl", "interpret"))
def _tdvp_one_site_jit(As, Ws, vL, vR, dt, num_krylov_vecs, imaginary,
                       boundary_envs, lanczos_impl, interpret):
    with jax.default_matmul_precision("highest"):
        return _tdvp_sweep_impl(As, Ws, vL, vR, dt, num_krylov_vecs,
                                imaginary, boundary_envs, lanczos_impl,
                                interpret)


def _tdvp_sweep_impl(As, Ws, vL, vR, dt, num_krylov_vecs, imaginary,
                     boundary_envs=None, lanczos_impl="xla",
                     interpret=False):
    N, chi, d, _ = As.shape
    if imaginary:
        cf = jnp.asarray(-0.5 * dt)            # forward half step
        cb = jnp.asarray(+0.5 * dt)            # backward half step
    else:
        cf = jnp.asarray(-0.5j * dt)
        cb = jnp.asarray(+0.5j * dt)

    As, Renvs = right_canonicalize_and_envs(
        As, Ws, vL, vR,
        R0=None if boundary_envs is None else boundary_envs[1])
    L0 = (_boundary_left(chi, vL) if boundary_envs is None
          else boundary_envs[0])
    R0 = (_boundary_right(chi, vR) if boundary_envs is None
          else boundary_envs[1])
    eye = jnp.eye(chi, dtype=As.dtype)
    site_idx = jnp.arange(N)

    # ---- left-to-right half sweep ----
    # skip the backward bond step after the last site (turnaround):
    cb_lr = jnp.where(site_idx < N - 1, cb, jnp.zeros_like(cb))

    def body_lr(carry, inputs):
        Lenv, C = carry
        A, W, Renv, cb_i = inputs
        AC = jnp.einsum("ab,bsc->asc", C, A)
        AC = _renorm(AC)
        AC = _expm_local(Lenv, W, Renv, AC, cf, num_krylov_vecs,
                         lanczos_impl, interpret, imaginary)
        AC = _renorm(AC)
        AL, Cn = _qr_shift_right(AC)
        Lenv_new = _update_left(Lenv, AL, W)
        Cn = _expm_local_C(Lenv_new, Renv, Cn, cb_i, num_krylov_vecs,
                           lanczos_impl, interpret, imaginary)
        Cn = _renorm(Cn)
        return (Lenv_new, Cn), (AL, Lenv)

    (_, C_last), (ALs, Lenvs) = jax.lax.scan(
        body_lr, (L0, eye), (As, Ws, Renvs, cb_lr))

    # ---- right-to-left half sweep ----
    cb_rl = jnp.where(site_idx > 0, cb, jnp.zeros_like(cb))

    def body_rl(carry, inputs):
        Renv, C = carry
        A, W, Lenv, cb_i = inputs
        AC = jnp.einsum("asb,bc->asc", A, C)
        AC = _renorm(AC)
        AC = _expm_local(Lenv, W, Renv, AC, cf, num_krylov_vecs,
                         lanczos_impl, interpret, imaginary)
        AC = _renorm(AC)
        Cn, AR = _rq_shift_left(AC)
        Renv_new = _update_right(Renv, AR, W)
        Cn = _expm_local_C(Lenv, Renv_new, Cn, cb_i, num_krylov_vecs,
                           lanczos_impl, interpret, imaginary)
        Cn = _renorm(Cn)
        return (Renv_new, Cn), AR

    (_, C_first), ARs = jax.lax.scan(
        body_rl, (R0, C_last), (ALs, Ws, Lenvs, cb_rl), reverse=True)
    # absorb the remaining bond matrix into site 0 (it was not evolved
    # backward: site 0's forward step ends the symmetric splitting)
    ARs = ARs.at[0].set(jnp.einsum("ab,bsc->asc", C_first, ARs[0]))
    return ARs


@functools.partial(jax.jit, static_argnames=("num_krylov_vecs", "imaginary"))
def tdvp_two_site_sweep(
    As: Array, Ws: Array, vL: Array, vR: Array, dt,
    num_krylov_vecs: int = 20, imaginary: bool = False,
    boundary_envs: Optional[Tuple[Array, Array]] = None,
) -> Tuple[Array, Array]:
    """One symmetric two-site TDVP sweep (2TDVP): two-site blocks evolve
    forward dt/2 and the freshly split one-site centers evolve backward
    dt/2.  Bond truncation back to the static ``chi`` uses the masked SVD
    (pad-and-mask); returns ``(evolved stack, accumulated squared
    truncated weight)``.  Unlike one-site TDVP this explores bond content
    beyond the initial state's, at the price of a truncation error."""
    with jax.default_matmul_precision("highest"):
        return _tdvp2_sweep_impl(As, Ws, vL, vR, dt, num_krylov_vecs,
                                 imaginary, boundary_envs)


def _tdvp2_sweep_impl(As, Ws, vL, vR, dt, num_krylov_vecs, imaginary,
                      boundary_envs=None):
    N, chi, d, _ = As.shape
    if imaginary:
        cf = jnp.asarray(-0.5 * dt)
        cb = jnp.asarray(+0.5 * dt)
    else:
        cf = jnp.asarray(-0.5j * dt)
        cb = jnp.asarray(+0.5j * dt)
    real_dtype = jnp.zeros((), As.dtype).real.dtype

    As, Renvs = right_canonicalize_and_envs(
        As, Ws, vL, vR,
        R0=None if boundary_envs is None else boundary_envs[1])
    L0 = (_boundary_left(chi, vL) if boundary_envs is None
          else boundary_envs[0])
    R0 = (_boundary_right(chi, vR) if boundary_envs is None
          else boundary_envs[1])
    bond_idx = jnp.arange(N - 1)

    # ---- left-to-right over bonds (0..N-2) ----
    # backward one-site step applies at bonds < N-2 (skip at turnaround)
    cb_lr = jnp.where(bond_idx < N - 2, cb, jnp.zeros_like(cb))

    def body_lr(carry, inputs):
        Lenv, AC, terr = carry
        A_next, W1, W2, Renv, cb_i = inputs
        theta = jnp.einsum("asb,btc->astc", AC, A_next)
        theta = _renorm(theta)
        mv2 = lambda x: _matvec_2s(Lenv, W1, W2, Renv, x)
        theta = expm_multiply_lanczos(mv2, theta, cf, num_krylov_vecs)
        theta = _renorm(theta)
        res = svd_masked(theta.reshape(chi * d, d * chi),
                         max_singular_values=chi)
        s = res.s / jnp.where(jnp.linalg.norm(res.s) > 0,
                              jnp.linalg.norm(res.s), 1.0)
        AL = res.u.reshape(chi, d, chi)
        AC_next = (s[:, None].astype(res.vh.dtype) * res.vh).reshape(
            chi, d, chi)
        terr = terr + res.trunc_sq_norm.astype(real_dtype)
        Lenv_new = _update_left(Lenv, AL, W1)
        mv1 = lambda x: _matvec_1s(Lenv_new, W2, Renv, x)
        AC_next = expm_multiply_lanczos(mv1, AC_next, cb_i,
                                        num_krylov_vecs)
        AC_next = _renorm(AC_next)
        return (Lenv_new, AC_next, terr), (AL, Lenv)

    carry0 = (L0, As[0], jnp.zeros((), real_dtype))
    (Lenv_f, AC_last, terr_lr), (ALs, Lenvs) = jax.lax.scan(
        body_lr, carry0, (As[1:], Ws[:-1], Ws[1:], Renvs[1:], cb_lr))

    # ---- right-to-left over bonds (N-2..0) ----
    cb_rl = jnp.where(bond_idx > 0, cb, jnp.zeros_like(cb))

    def body_rl(carry, inputs):
        Renv, AC, terr = carry
        A_prev, W1, W2, Lenv, cb_i = inputs
        theta = jnp.einsum("asb,btc->astc", A_prev, AC)
        theta = _renorm(theta)
        mv2 = lambda x: _matvec_2s(Lenv, W1, W2, Renv, x)
        theta = expm_multiply_lanczos(mv2, theta, cf, num_krylov_vecs)
        theta = _renorm(theta)
        res = svd_masked(theta.reshape(chi * d, d * chi),
                         max_singular_values=chi)
        s = res.s / jnp.where(jnp.linalg.norm(res.s) > 0,
                              jnp.linalg.norm(res.s), 1.0)
        AR = res.vh.reshape(chi, d, chi)
        AC_prev = (res.u * s[None, :].astype(res.u.dtype)).reshape(
            chi, d, chi)
        terr = terr + res.trunc_sq_norm.astype(real_dtype)
        Renv_new = _update_right(Renv, AR, W2)
        mv1 = lambda x: _matvec_1s(Lenv, W1, Renv_new, x)
        AC_prev = expm_multiply_lanczos(mv1, AC_prev, cb_i,
                                        num_krylov_vecs)
        AC_prev = _renorm(AC_prev)
        return (Renv_new, AC_prev, terr), AR

    carry0 = (R0, AC_last, terr_lr)
    (_, AC_first, terr), ARs = jax.lax.scan(
        body_rl, carry0, (ALs, Ws[:-1], Ws[1:], Lenvs, cb_rl),
        reverse=True)
    out = jnp.concatenate([AC_first[None], ARs], axis=0)
    return out, terr


class TDVP:
    """Finite-MPS time evolution driver.

    Accepts a stacked MPS ``(N, chi, d, chi)`` or
    :class:`~tensornetwork_tpu.models.mps.FiniteMPS`; for real-time
    evolution pass a complex-dtype state, or set ``split_complex=True``
    to carry the state as a split-complex pytree — required on TPU
    backends without complex-dtype support (e.g. the remote axon runtime)
    and accepted everywhere else.  With ``split_complex`` the input may
    be a complex numpy/jax array (split on host) or an
    :class:`~tensornetwork_tpu.ops.split_complex.SC` directly."""

    def __init__(self, mps, mpo: MPO, split_complex: bool = False):
        from tensornetwork_tpu.ops import split_complex as sc_mod
        self._sc = split_complex
        if hasattr(mps, "to_stack"):
            self._mps_obj = mps
            self.As = mps.to_stack()
        else:
            self._mps_obj = None
            self.As = mps if isinstance(mps, sc_mod.SC) else jnp.asarray(mps)
        if split_complex and not isinstance(self.As, sc_mod.SC):
            self.As = sc_mod.from_complex(np.asarray(jax.device_get(self.As))
                                          if jnp.iscomplexobj(self.As)
                                          else self.As)
        self.mpo = mpo
        self.truncation_errors: list = []
        if self.As.shape[0] != mpo.num_sites:
            raise ValueError(
                f"MPS has {self.As.shape[0]} sites, MPO {mpo.num_sites}")
        if split_complex:
            # MPO stays real: the SC sweep takes real MPO operands
            self._Ws = jnp.asarray(mpo.Ws)
            self._vL = jnp.asarray(mpo.vL)
            self._vR = jnp.asarray(mpo.vR)
            return
        # cast the MPO to the state dtype once, inside a jitted convert:
        # *eager* real->complex casts (and some host pulls) are
        # unimplemented on remote TPU backends, and re-casting per call
        # would re-upload the MPO anyway
        dt_ = self.As.dtype
        cast = jax.jit(lambda x: x.astype(dt_))
        self._Ws = cast(jnp.asarray(mpo.Ws))
        self._vL = cast(jnp.asarray(mpo.vL))
        self._vR = cast(jnp.asarray(mpo.vR))

    def step(self, dt, num_krylov_vecs: int = 20,
             imaginary: bool = False, two_site: bool = False) -> None:
        if self._sc:
            if imaginary:
                raise NotImplementedError(
                    "imaginary time needs no complex dtype: run the "
                    "plain real-dtype path")
            if two_site:
                self.As, terr = tdvp_two_site_sweep_sc(
                    self.As, self._Ws, self._vL, self._vR, dt,
                    num_krylov_vecs=num_krylov_vecs)
                self.truncation_errors.append(float(terr))
            else:
                self.As = tdvp_one_site_sweep_sc(
                    self.As, self._Ws, self._vL, self._vR, dt,
                    num_krylov_vecs=num_krylov_vecs)
            return
        if two_site:
            self.As, terr = tdvp_two_site_sweep(
                self.As, self._Ws, self._vL, self._vR, dt,
                num_krylov_vecs=num_krylov_vecs, imaginary=imaginary)
            self.truncation_errors.append(float(terr))
        else:
            self.As = tdvp_one_site_sweep(
                self.As, self._Ws, self._vL, self._vR, dt,
                num_krylov_vecs=num_krylov_vecs, imaginary=imaginary)
        if self._mps_obj is not None:
            self._mps_obj.from_stack(self.As)

    def evolve(self, t: float, num_steps: int, num_krylov_vecs: int = 20,
               imaginary: bool = False, two_site: bool = False) -> Array:
        dt = t / num_steps
        for _ in range(num_steps):
            self.step(dt, num_krylov_vecs, imaginary, two_site)
        return self.As

    def energy(self) -> float:
        if self._sc:
            e = mps_mpo_expectation_sc(self.As, self._Ws, self._vL,
                                       self._vR)
            return float(e.re)
        return float(jnp.real(mps_mpo_expectation(
            self.As, self._Ws, self._vL, self._vR)))


# ---------------------------------------------------------------------------
# Split-complex real-time TDVP: complex states on real-only TPU backends.
# The axon TPU runtime has no complex dtypes (f32->c64 convert, complex
# matmul and transfers all raise UNIMPLEMENTED), so the complex-dtype
# sweep above cannot run on the chip.  This path carries the state as
# ops.split_complex.SC pytrees: contractions lower to Karatsuba
# dot_generals, local evolutions to the SC Lanczos exponentiation, and
# gauge shifts to the matmul-only hybrid polar decomposition.
# ---------------------------------------------------------------------------

from tensornetwork_tpu.ops import split_complex as _sc
from tensornetwork_tpu.ops.krylov import expm_multiply_lanczos_sc
from tensornetwork_tpu.ops.ncon import ncon as _ncon


def _renorm_sc(x):
    n = _sc.norm(x)
    safe = jnp.where(n > 0, n, 1.0)
    return _sc.SC(x.re / safe, x.im / safe)


def _update_left_sc(L, A, W):
    # rvp <- awc,atr,wvst,csp (W real)
    return _ncon([L, A, W, _sc.conj(A)],
                 [(1, 2, 3), (1, 4, -1), (2, -2, 5, 4), (3, 5, -3)],
                 con_order=(1, 4, 2, 5, 3), check_network=False, jit=False)


def _update_right_sc(R, A, W):
    # lwp <- bvd,ltb,wvst,psd
    return _ncon([R, A, W, _sc.conj(A)],
                 [(1, 2, 3), (-1, 4, 1), (-2, 2, 5, 4), (-3, 5, 3)],
                 con_order=(1, 4, 2, 5, 3), check_network=False, jit=False)


def _matvec_1s_sc(L, W, R, x):
    # csd <- awc,wvst,atb,bvd
    return _ncon([L, W, x, R],
                 [(1, 2, -1), (2, 3, -2, 4), (1, 4, 5), (5, 3, -3)],
                 con_order=(1, 4, 2, 5, 3), check_network=False, jit=False)


def _matvec_C_sc(L, R, x):
    # cd <- awc,ab,bwd
    return _ncon([L, x, R],
                 [(1, 2, -1), (1, 3), (3, 2, -2)],
                 con_order=(1, 3, 2), check_network=False, jit=False)


def _qr_shift_right_sc(A):
    chi_l, d, chi_r = A.shape
    m = _sc.reshape(A, (chi_l * d, chi_r))
    # polar_complete, not polar: rank-deficient centers (product states)
    # need a full isometric completion — the completion directions are
    # what seeds entanglement growth, exactly as QR's Householder
    # completion does in the complex-dtype path
    Q, P = _sc.polar_complete(m)
    return _sc.reshape(Q, (chi_l, d, chi_r)), P


def _rq_shift_left_sc(A):
    chi_l, d, chi_r = A.shape
    m = _sc.adjoint(_sc.reshape(A, (chi_l, d * chi_r)))
    Q, P = _sc.polar_complete(m)  # A^dag = Q P  =>  A = P^dag Q^dag
    return _sc.adjoint(P), _sc.reshape(_sc.adjoint(Q), (chi_l, d, chi_r))


def _boundary_left_sc(chi, vL):
    L = jnp.einsum("ac,w->awc", jnp.eye(chi, dtype=vL.dtype), vL)
    return _sc.SC(L, jnp.zeros_like(L))


def _boundary_right_sc(chi, vR):
    R = jnp.einsum("bd,v->bvd", jnp.eye(chi, dtype=vR.dtype), vR)
    return _sc.SC(R, jnp.zeros_like(R))


def right_canonicalize_and_envs_sc(As, Ws, vL, vR, R0=None):
    """Split-complex analog of
    :func:`tensornetwork_tpu.models.dmrg.right_canonicalize_and_envs`."""
    N, chi, d, _ = As.shape
    if R0 is None:
        R0 = _boundary_right_sc(chi, vR)
    Lm0 = _sc.SC(jnp.eye(chi, dtype=As.dtype),
                 jnp.zeros((chi, chi), As.dtype))

    def body(carry, inputs):
        Renv, Lm = carry
        A, W = inputs
        A = _ncon([A, Lm], [(-1, -2, 1), (1, -3)],
                  check_network=False, jit=False)
        A = _renorm_sc(A)
        Lm_new, Q = _rq_shift_left_sc(A)
        Renv_new = _update_right_sc(Renv, Q, W)
        return (Renv_new, Lm_new), (Q, Renv)

    (_, Lm_final), (Qs, Renvs) = jax.lax.scan(body, (R0, Lm0), (As, Ws),
                                              reverse=True)
    Q0 = _ncon([Lm_final, _sc.SC(Qs.re[0], Qs.im[0])],
               [(-1, 1), (1, -2, -3)], check_network=False, jit=False)
    Qs = _sc.SC(Qs.re.at[0].set(Q0.re), Qs.im.at[0].set(Q0.im))
    return Qs, Renvs


def _expm_local_sc(Lenv, W, Renv, v, coeff, m, lanczos_impl, interpret):
    """SC local exp: fused realified kernel (ops.kernels) or XLA SC
    Lanczos."""
    if lanczos_impl == "fused":
        chi, d = v.shape[0], v.shape[1]
        M = W.shape[0]
        # realified tiles double both M and d (nt = 2d >= 4: the
        # calibrated Mosaic inflation in ops.vmem applies)
        from tensornetwork_tpu.ops import vmem
        if vmem.admit_resident_lanczos(chi, 2 * d, 2 * M, m):
            from tensornetwork_tpu.ops import kernels
            vb = _sc.SC(v.re[None], v.im[None])
            Lb = _sc.SC(Lenv.re[None], Lenv.im[None])
            Rb = _sc.SC(Renv.re[None], Renv.im[None])
            y = kernels.expm_multiply_fused_sc(
                Lb, W, Rb, vb, coeff, m, interpret=interpret,
                precision=jax.lax.Precision.HIGHEST)
            return _sc.SC(y.re[0], y.im[0])
    mv = lambda x: _matvec_1s_sc(Lenv, W, Renv, x)
    return expm_multiply_lanczos_sc(mv, v, coeff, m)


def _expm_local_C_sc(Lenv, Renv, v, coeff, m, lanczos_impl, interpret):
    if lanczos_impl == "fused":
        chi = v.shape[0]
        M = Lenv.re.shape[1]
        from tensornetwork_tpu.ops import vmem
        if vmem.admit_resident_lanczos(chi, 2, 2 * M, m):
            from tensornetwork_tpu.ops import kernels
            W_eye = jnp.eye(M, dtype=v.dtype).reshape(M, M, 1, 1)
            vb = _sc.SC(v.re[None, :, None, :], v.im[None, :, None, :])
            Lb = _sc.SC(Lenv.re[None], Lenv.im[None])
            Rb = _sc.SC(Renv.re[None], Renv.im[None])
            y = kernels.expm_multiply_fused_sc(
                Lb, W_eye, Rb, vb, coeff, m, interpret=interpret,
                precision=jax.lax.Precision.HIGHEST)
            return _sc.SC(y.re[0, :, 0, :], y.im[0, :, 0, :])
    mvc = lambda x: _matvec_C_sc(Lenv, Renv, x)
    return expm_multiply_lanczos_sc(mvc, v, coeff, m)


def tdvp_one_site_sweep_sc(
    As, Ws: Array, vL: Array, vR: Array, dt,
    num_krylov_vecs: int = 20,
    boundary_envs=None,
    lanczos_impl: Optional[str] = None,
):
    """One symmetric one-site real-time TDVP sweep on a split-complex MPS
    stack (``As`` is an SC of shape (N, chi, d, chi); ``Ws`` is the real
    MPO stack).  Evolves by ``exp(-i H dt)``.  Semantics identical to
    :func:`tdvp_one_site_sweep` with a complex dtype — but runs on TPU
    backends without complex support."""
    if lanczos_impl is None:
        lanczos_impl = ("fused" if jax.default_backend() == "tpu"
                        else "xla")
    interpret = jax.default_backend() != "tpu"
    return _tdvp_sc_jit(As, Ws, vL, vR, dt, num_krylov_vecs,
                        boundary_envs, lanczos_impl, interpret)


@functools.partial(jax.jit, static_argnames=(
    "num_krylov_vecs", "lanczos_impl", "interpret"))
def _tdvp_sc_jit(As, Ws, vL, vR, dt, num_krylov_vecs, boundary_envs,
                 lanczos_impl, interpret):
    with jax.default_matmul_precision("highest"):
        return _tdvp_sweep_sc_impl(As, Ws, vL, vR, dt, num_krylov_vecs,
                                   boundary_envs, lanczos_impl, interpret)


def _tdvp_sweep_sc_impl(As, Ws, vL, vR, dt, num_krylov_vecs,
                        boundary_envs=None, lanczos_impl="xla",
                        interpret=False):
    N, chi, d, _ = As.shape
    dt = jnp.asarray(dt)
    zero = jnp.zeros_like(dt)
    cf = _sc.SC(zero, -0.5 * dt)           # forward: exp(-i H dt/2)
    cb_full = _sc.SC(zero, +0.5 * dt)      # backward bond step

    As, Renvs = right_canonicalize_and_envs_sc(
        As, Ws, vL, vR,
        R0=None if boundary_envs is None else boundary_envs[1])
    L0 = (_boundary_left_sc(chi, vL) if boundary_envs is None
          else boundary_envs[0])
    R0 = (_boundary_right_sc(chi, vR) if boundary_envs is None
          else boundary_envs[1])
    eyeC = _sc.SC(jnp.eye(chi, dtype=As.dtype),
                  jnp.zeros((chi, chi), As.dtype))
    site_idx = jnp.arange(N)
    cb_lr = _sc.SC(jnp.zeros((N,), dt.dtype),
                   jnp.where(site_idx < N - 1, cb_full.im, 0.0))
    cb_rl = _sc.SC(jnp.zeros((N,), dt.dtype),
                   jnp.where(site_idx > 0, cb_full.im, 0.0))

    def body_lr(carry, inputs):
        Lenv, C = carry
        A, W, Renv, cb_i = inputs
        AC = _ncon([C, A], [(-1, 1), (1, -2, -3)],
                   check_network=False, jit=False)
        AC = _renorm_sc(AC)
        AC = _expm_local_sc(Lenv, W, Renv, AC, cf, num_krylov_vecs,
                            lanczos_impl, interpret)
        AC = _renorm_sc(AC)
        AL, Cn = _qr_shift_right_sc(AC)
        Lenv_new = _update_left_sc(Lenv, AL, W)
        Cn = _expm_local_C_sc(Lenv_new, Renv, Cn, cb_i, num_krylov_vecs,
                              lanczos_impl, interpret)
        Cn = _renorm_sc(Cn)
        return (Lenv_new, Cn), (AL, Lenv)

    (_, C_last), (ALs, Lenvs) = jax.lax.scan(
        body_lr, (L0, eyeC), (As, Ws, Renvs, cb_lr))

    def body_rl(carry, inputs):
        Renv, C = carry
        A, W, Lenv, cb_i = inputs
        AC = _ncon([A, C], [(-1, -2, 1), (1, -3)],
                   check_network=False, jit=False)
        AC = _renorm_sc(AC)
        AC = _expm_local_sc(Lenv, W, Renv, AC, cf, num_krylov_vecs,
                            lanczos_impl, interpret)
        AC = _renorm_sc(AC)
        Cn, AR = _rq_shift_left_sc(AC)
        Renv_new = _update_right_sc(Renv, AR, W)
        Cn = _expm_local_C_sc(Lenv, Renv_new, Cn, cb_i, num_krylov_vecs,
                              lanczos_impl, interpret)
        Cn = _renorm_sc(Cn)
        return (Renv_new, Cn), AR

    (_, C_first), ARs = jax.lax.scan(
        body_rl, (R0, C_last), (ALs, Ws, Lenvs, cb_rl), reverse=True)
    A0 = _ncon([C_first, _sc.SC(ARs.re[0], ARs.im[0])],
               [(-1, 1), (1, -2, -3)], check_network=False, jit=False)
    return _sc.SC(ARs.re.at[0].set(A0.re), ARs.im.at[0].set(A0.im))


@jax.jit
def mps_mpo_expectation_sc(As, Ws, vL, vR):
    """<psi|H|psi>/<psi|psi> on a split-complex stack; returns an SC
    scalar (imaginary part ~0 for Hermitian H)."""
    with jax.default_matmul_precision("highest"):
        N, chi, d, _ = As.shape
        L = _boundary_left_sc(chi, vL)

        def body(L, inputs):
            A, W = inputs
            return _update_left_sc(L, A, W), None

        L, _ = jax.lax.scan(body, L, (As, Ws))
        eyeR = jnp.eye(chi, dtype=As.dtype)
        num = _sc.SC(jnp.einsum("awc,ac,w->", L.re, eyeR, vR),
                     jnp.einsum("awc,ac,w->", L.im, eyeR, vR))

        n0 = _sc.SC(eyeR, jnp.zeros_like(eyeR))

        def nbody(nL, A):
            out = _ncon([nL, A, _sc.conj(A)],
                        [(1, 2), (1, 3, -1), (2, 3, -2)],
                        con_order=(1, 3, 2), check_network=False, jit=False)
            return out, None

        nL, _ = jax.lax.scan(nbody, n0, As)
        den = jnp.trace(nL.re)  # trace of a PSD Gram matrix is real
        return _sc.SC(num.re / den, num.im / den)


def _matvec_2s_sc(L, W1, W2, R, x):
    # csud <- awc,wmst,mvuz,atzb,bvd
    return _ncon([L, W1, W2, x, R],
                 [(1, 2, -1), (2, 3, -2, 4), (3, 5, -3, 6), (1, 4, 6, 7),
                  (7, 5, -4)],
                 con_order=(1, 2, 4, 3, 6, 7, 5), check_network=False,
                 jit=False)


@functools.partial(jax.jit, static_argnames=("num_krylov_vecs",))
def tdvp_two_site_sweep_sc(
    As, Ws: Array, vL: Array, vR: Array, dt,
    num_krylov_vecs: int = 20,
    boundary_envs=None,
):
    """One symmetric two-site real-time TDVP sweep on a split-complex
    stack.  Semantics of :func:`tdvp_two_site_sweep` with a complex
    dtype; bond truncation uses the split-complex masked SVD
    (:func:`tensornetwork_tpu.ops.decompositions.svd_masked_sc`).
    Returns ``(evolved SC stack, accumulated squared truncated weight)``."""
    with jax.default_matmul_precision("highest"):
        return _tdvp2_sweep_sc_impl(As, Ws, vL, vR, dt, num_krylov_vecs,
                                    boundary_envs)


def _tdvp2_sweep_sc_impl(As, Ws, vL, vR, dt, num_krylov_vecs,
                         boundary_envs=None):
    from tensornetwork_tpu.ops.decompositions import svd_masked_sc
    N, chi, d, _ = As.shape
    dt = jnp.asarray(dt)
    zero = jnp.zeros_like(dt)
    cf = _sc.SC(zero, -0.5 * dt)
    cb_full = _sc.SC(zero, +0.5 * dt)
    real_dtype = As.re.dtype

    As, Renvs = right_canonicalize_and_envs_sc(
        As, Ws, vL, vR,
        R0=None if boundary_envs is None else boundary_envs[1])
    L0 = (_boundary_left_sc(chi, vL) if boundary_envs is None
          else boundary_envs[0])
    R0 = (_boundary_right_sc(chi, vR) if boundary_envs is None
          else boundary_envs[1])
    bond_idx = jnp.arange(N - 1)
    cb_lr = _sc.SC(jnp.zeros((N - 1,), dt.dtype),
                   jnp.where(bond_idx < N - 2, cb_full.im, 0.0))
    cb_rl = _sc.SC(jnp.zeros((N - 1,), dt.dtype),
                   jnp.where(bond_idx > 0, cb_full.im, 0.0))

    def sc_idx(stack, i):
        return _sc.SC(stack.re[i], stack.im[i])

    def body_lr(carry, inputs):
        Lenv, AC, terr = carry
        A_next, W1, W2, Renv, cb_i = inputs
        theta = _ncon([AC, A_next], [(-1, -2, 1), (1, -3, -4)],
                      check_network=False, jit=False)
        theta = _renorm_sc(theta)
        mv2 = lambda x: _matvec_2s_sc(Lenv, W1, W2, Renv, x)
        theta = expm_multiply_lanczos_sc(mv2, theta, cf, num_krylov_vecs)
        theta = _renorm_sc(theta)
        res = svd_masked_sc(_sc.reshape(theta, (chi * d, d * chi)),
                            max_singular_values=chi)
        snrm = jnp.linalg.norm(res.s)
        s = res.s / jnp.where(snrm > 0, snrm, 1.0)
        AL = _sc.reshape(res.u, (chi, d, chi))
        AC_next = _sc.reshape(
            _sc.SC(s[:, None] * res.vh.re, s[:, None] * res.vh.im),
            (chi, d, chi))
        terr = terr + res.trunc_sq_norm.astype(real_dtype)
        Lenv_new = _update_left_sc(Lenv, AL, W1)
        mv1 = lambda x: _matvec_1s_sc(Lenv_new, W2, Renv, x)
        AC_next = expm_multiply_lanczos_sc(mv1, AC_next, cb_i,
                                           num_krylov_vecs)
        AC_next = _renorm_sc(AC_next)
        return (Lenv_new, AC_next, terr), (AL, Lenv)

    As_tail = _sc.SC(As.re[1:], As.im[1:])
    carry0 = (L0, sc_idx(As, 0), jnp.zeros((), real_dtype))
    (Lenv_f, AC_last, terr_lr), (ALs, Lenvs) = jax.lax.scan(
        body_lr, carry0, (As_tail, Ws[:-1], Ws[1:], Renvs_tail(Renvs),
                          cb_lr))

    def body_rl(carry, inputs):
        Renv, AC, terr = carry
        A_prev, W1, W2, Lenv, cb_i = inputs
        theta = _ncon([A_prev, AC], [(-1, -2, 1), (1, -3, -4)],
                      check_network=False, jit=False)
        theta = _renorm_sc(theta)
        mv2 = lambda x: _matvec_2s_sc(Lenv, W1, W2, Renv, x)
        theta = expm_multiply_lanczos_sc(mv2, theta, cf, num_krylov_vecs)
        theta = _renorm_sc(theta)
        res = svd_masked_sc(_sc.reshape(theta, (chi * d, d * chi)),
                            max_singular_values=chi)
        snrm = jnp.linalg.norm(res.s)
        s = res.s / jnp.where(snrm > 0, snrm, 1.0)
        AR = _sc.reshape(res.vh, (chi, d, chi))
        AC_prev = _sc.reshape(
            _sc.SC(res.u.re * s[None, :], res.u.im * s[None, :]),
            (chi, d, chi))
        terr = terr + res.trunc_sq_norm.astype(real_dtype)
        Renv_new = _update_right_sc(Renv, AR, W2)
        mv1 = lambda x: _matvec_1s_sc(Lenv, W1, Renv_new, x)
        AC_prev = expm_multiply_lanczos_sc(mv1, AC_prev, cb_i,
                                           num_krylov_vecs)
        AC_prev = _renorm_sc(AC_prev)
        return (Renv_new, AC_prev, terr), AR

    carry0 = (R0, AC_last, terr_lr)
    (_, AC_first, terr), ARs = jax.lax.scan(
        body_rl, carry0, (ALs, Ws[:-1], Ws[1:], Lenvs, cb_rl),
        reverse=True)
    out = _sc.SC(jnp.concatenate([AC_first.re[None], ARs.re], axis=0),
                 jnp.concatenate([AC_first.im[None], ARs.im], axis=0))
    return out, terr


def Renvs_tail(Renvs):
    """Drop the first entry of a stacked SC env (sites 1..N-1)."""
    return _sc.SC(Renvs.re[1:], Renvs.im[1:])
