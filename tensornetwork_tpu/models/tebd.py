"""Trotterized time evolution: TEBD on MPS and exact wavefunctions.

Capability parity with the reference gate-evolution surface:
``BaseMPS.apply_two_site_gate`` sweeps (reference ``base_mps.py:481-596``)
and the exact-wavefunction Trotter example (reference
``examples/wavefunctions/wavefunctions.py:116-208``, gate prep
``trotter.py:19``).  The exact-state evolution runs entirely inside one
``jit`` (the reference uses TF ``defun``); the MPS sweep reuses the
masked-SVD truncation with error accounting.
"""
from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def trotter_gate(h2, dt: float, imaginary: bool = False) -> Array:
    """Two-site Trotter gate exp(-i dt h) (or exp(-dt h) for imaginary
    time).  ``h2`` may be (d^2, d^2) or (d, d, d, d); returns
    (o1, o2, i1, i2) (reference ``examples/wavefunctions/trotter.py:19``).
    """
    h2 = jnp.asarray(h2)
    if h2.ndim == 4:
        d = h2.shape[0]
        h_mat = h2.reshape(d * d, d * d)
    else:
        h_mat = h2
        d = int(np.sqrt(h_mat.shape[0]))
    if imaginary:
        gate = jax.scipy.linalg.expm(-dt * h_mat)
    else:
        gate = jax.scipy.linalg.expm(-1j * dt * h_mat)
    return gate.reshape(d, d, d, d)


def tebd_sweep(mps, gate, max_singular_values: Optional[int] = None,
               max_truncation_err: Optional[float] = None) -> float:
    """Apply a two-site gate to every bond, sweeping left to right with the
    orthogonality center (standard sweeping TEBD; gate application and
    truncation semantics of reference ``base_mps.py:481-596``).

    Returns the accumulated truncated squared weight."""
    N = mps.num_sites
    mps.position(0)
    total = 0.0
    for b in range(N - 1):
        terr = mps.apply_two_site_gate(
            gate, b, b + 1, max_singular_values=max_singular_values,
            max_truncation_err=max_truncation_err, center_position=b + 1)
        total += float(terr)
    mps.position(0)
    return total


def evolve_mps(mps, h2, dt: float, num_steps: int,
               imaginary: bool = False,
               max_singular_values: Optional[int] = None,
               normalize: bool = True) -> Tuple[List[float], float]:
    """TEBD evolution of an MPS under a uniform two-site hamiltonian.

    Returns (per-step energies if imaginary else empty, total truncation
    weight)."""
    gate = trotter_gate(h2, dt, imaginary=imaginary)
    if jnp.iscomplexobj(gate) and not jnp.iscomplexobj(mps.As):
        mps.As = mps.As.astype(
            jnp.result_type(mps.As.dtype, jnp.complex64))
    energies: List[float] = []
    total_trunc = 0.0
    for _ in range(num_steps):
        total_trunc += tebd_sweep(mps, gate,
                                  max_singular_values=max_singular_values)
        if normalize:
            nrm = mps.norm()
            mps.As = mps.As.at[0].multiply(
                1.0 / jnp.where(nrm > 0, nrm, 1.0))
        if imaginary:
            energies.append(measure_energy(mps, h2))
    return energies, total_trunc


def measure_energy(mps, h2) -> float:
    """<H> = sum of two-site terms on neighboring bonds."""
    h2 = jnp.asarray(h2, mps.dtype)
    if h2.ndim == 2:
        d = mps.phys_dim
        h2 = h2.reshape(d, d, d, d)
    N = mps.num_sites
    from tensornetwork_tpu.models.mps import (
        _left_norm_envs, _right_norm_envs, _norm_update_left)
    nLs = _left_norm_envs(mps.As)
    nRs = _right_norm_envs(mps.As)
    den = jnp.trace(_norm_update_left(nLs[-1], mps.As[-1]))
    total = 0.0
    for b in range(N - 1):
        A1, A2 = mps.As[b], mps.As[b + 1]
        # gate convention (o1, o2, i1, i2): bra side gets the outputs
        num = jnp.einsum(
            "ac,asb,btq,uvst,cue,evr,qr->",
            nLs[b], A1, A2, h2, jnp.conj(A1), jnp.conj(A2), nRs[b + 1],
            optimize="auto")
        total = total + num / den
    return float(jnp.real(total))


# ---------------------------------------------------------------------------
# Exact wavefunction evolution (reference ``examples/wavefunctions``)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("site",))
def apply_two_site_gate_exact(psi: Array, gate: Array, site: int) -> Array:
    """Apply a two-site gate at (site, site+1) to a dense state
    psi[(d,)*N] (reference ``wavefunctions.py:38-77``)."""
    N = psi.ndim
    out = jnp.tensordot(psi, gate, axes=[[site, site + 1], [2, 3]])
    return jnp.moveaxis(out, (N - 2, N - 1), (site, site + 1))


def evolve_exact(psi: Array, h2, dt: float, num_steps: int,
                 imaginary: bool = False) -> Array:
    """Even/odd Trotter evolution of the dense state (reference
    ``wavefunctions.py:116-168``)."""
    gate = trotter_gate(h2, dt, imaginary=imaginary)
    if jnp.iscomplexobj(gate):
        psi = psi.astype(jnp.result_type(psi.dtype, jnp.complex64))
    N = psi.ndim

    @jax.jit
    def step(psi):
        for b in range(0, N - 1, 2):
            psi = apply_two_site_gate_exact(psi, gate, b)
        for b in range(1, N - 1, 2):
            psi = apply_two_site_gate_exact(psi, gate, b)
        return psi / jnp.linalg.norm(psi)

    for _ in range(num_steps):
        psi = step(psi)
    return psi


def inner_exact(psi1: Array, psi2: Array) -> Array:
    return jnp.vdot(psi1.reshape(-1), psi2.reshape(-1))
