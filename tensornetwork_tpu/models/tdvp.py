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


@functools.partial(jax.jit, static_argnames=("num_krylov_vecs", "imaginary"))
def tdvp_one_site_sweep(
    As: Array, Ws: Array, vL: Array, vR: Array, dt,
    num_krylov_vecs: int = 20, imaginary: bool = False,
    boundary_envs: Optional[Tuple[Array, Array]] = None,
) -> Array:
    """One symmetric one-site TDVP sweep evolving the state by ``dt``.

    Left-to-right evolves each center tensor forward by dt/2 and each bond
    matrix backward by dt/2; right-to-left mirrors it.  ``imaginary=True``
    evolves ``exp(-H t)`` (ground-state projection); otherwise
    ``exp(-i H t)`` (``As`` should be complex).  Returns the evolved,
    right-canonical stack.  ``boundary_envs`` as in
    :func:`tensornetwork_tpu.models.dmrg.one_site_sweep`.
    """
    with jax.default_matmul_precision("highest"):
        return _tdvp_sweep_impl(As, Ws, vL, vR, dt, num_krylov_vecs,
                                imaginary, boundary_envs)


def _tdvp_sweep_impl(As, Ws, vL, vR, dt, num_krylov_vecs, imaginary,
                     boundary_envs=None):
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
        mv = lambda x: _matvec_1s(Lenv, W, Renv, x)
        AC = expm_multiply_lanczos(mv, AC, cf, num_krylov_vecs)
        AC = _renorm(AC)
        AL, Cn = _qr_shift_right(AC)
        Lenv_new = _update_left(Lenv, AL, W)
        mvc = lambda x: _matvec_C(Lenv_new, Renv, x)
        Cn = expm_multiply_lanczos(mvc, Cn, cb_i, num_krylov_vecs)
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
        mv = lambda x: _matvec_1s(Lenv, W, Renv, x)
        AC = expm_multiply_lanczos(mv, AC, cf, num_krylov_vecs)
        AC = _renorm(AC)
        Cn, AR = _rq_shift_left(AC)
        Renv_new = _update_right(Renv, AR, W)
        mvc = lambda x: _matvec_C(Lenv, Renv_new, x)
        Cn = expm_multiply_lanczos(mvc, Cn, cb_i, num_krylov_vecs)
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
    evolution pass a complex-dtype state."""

    def __init__(self, mps, mpo: MPO):
        if hasattr(mps, "to_stack"):
            self._mps_obj = mps
            self.As = mps.to_stack()
        else:
            self._mps_obj = None
            self.As = jnp.asarray(mps)
        self.mpo = mpo
        self.truncation_errors: list = []
        if self.As.shape[0] != mpo.num_sites:
            raise ValueError(
                f"MPS has {self.As.shape[0]} sites, MPO {mpo.num_sites}")
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
        return float(jnp.real(mps_mpo_expectation(
            self.As, self._Ws, self._vL, self._vR)))
