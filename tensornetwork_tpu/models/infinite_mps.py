"""Infinite (unit-cell) matrix-product states.

Capability parity with the reference ``InfiniteMPS`` (reference
``matrixproductstates/infinite_mps.py:25-307``): transfer-matrix dominant
eigenpairs via the compiled Arnoldi solver (reference delegates to
``backend.eigs``, ``infinite_mps.py:104``) and canonicalization through
the dominant-environment gauge (reference ``infinite_mps.py:179``).

Conventions: the unit-cell transfer map ``T`` acts on (ket, bra) bond
matrices.  The *left* fixed point ``l`` satisfies ``l T = eta l``
(computed by propagating a left environment rightward through the cell);
the *right* fixed point ``r`` satisfies ``T r = eta r``.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tensornetwork_tpu.ops import krylov

Array = jax.Array


class InfiniteMPS:
    """Unit-cell MPS ``(N, chi, d, chi)`` repeated infinitely."""

    def __init__(self, tensors):
        if isinstance(tensors, (list, tuple)):
            tensors = jnp.stack([jnp.asarray(t) for t in tensors])
        self.As = jnp.asarray(tensors)
        if self.As.ndim != 4:
            raise ValueError("expected stacked (N, chi, d, chi) tensors")

    @classmethod
    def random(cls, num_sites: int, bond_dim: int, phys_dim: int = 2,
               dtype=jnp.float64, seed: int = 0) -> "InfiniteMPS":
        key = jax.random.PRNGKey(seed)
        As = jax.random.normal(
            key, (num_sites, bond_dim, phys_dim, bond_dim), dtype)
        return cls(As / np.sqrt(bond_dim * phys_dim))

    @property
    def num_sites(self) -> int:
        return self.As.shape[0]

    @property
    def bond_dim(self) -> int:
        return self.As.shape[1]

    @property
    def phys_dim(self) -> int:
        return self.As.shape[2]

    # -- transfer maps -----------------------------------------------------
    def _propagate_right(self, m: Array) -> Array:
        """Left environment m -> m·T (one unit cell to the right)."""

        def body(m, A):
            return jnp.einsum("ab,asc,bsd->cd", m, A, jnp.conj(A),
                              optimize="auto"), None

        m, _ = jax.lax.scan(body, m, self.As)
        return m

    def _propagate_left(self, m: Array) -> Array:
        """Right environment m -> T·m (one unit cell to the left)."""

        def body(m, A):
            return jnp.einsum("cd,asc,bsd->ab", m, A, jnp.conj(A),
                              optimize="auto"), None

        m, _ = jax.lax.scan(body, m, self.As, reverse=True)
        return m

    def transfer_matrix_eigs(self, direction: str = "left",
                             numeig: int = 1,
                             num_krylov_vecs: int = 30,
                             maxiter: int = 5,
                             tol: float = 1e-10):
        """Dominant eigenpair(s) of the unit-cell transfer matrix
        (reference ``transfer_matrix_eigs``, ``infinite_mps.py:104``).
        ``direction='left'`` returns the left fixed point, ``'right'`` the
        right one."""
        chi = self.bond_dim
        fn = (self._propagate_right if direction in ("left", "l")
              else self._propagate_left)
        init = jnp.eye(chi, dtype=self.As.dtype)
        evals, evecs = krylov.eigs(fn, init,
                                   num_krylov_vecs=num_krylov_vecs,
                                   numeig=numeig, which="LM",
                                   maxiter=maxiter, tol=tol)
        return evals, evecs

    # -- canonicalization --------------------------------------------------
    def canonicalize(self, num_krylov_vecs: int = 30
                     ) -> Tuple[float, Array]:
        """Gauge the cell to right-canonical form (right fixed point
        becomes the identity); returns (eta, old right fixed point)
        (reference ``canonicalize``, ``infinite_mps.py:179``)."""
        eta_arr, vr = self.transfer_matrix_eigs("right", 1,
                                                num_krylov_vecs)
        eta = float(np.real(eta_arr[0]))
        r = _hermitize_psd(vr[0], self.As.dtype)
        r = r / jnp.trace(r)
        Y = _psd_sqrt(r)
        Yi = _psd_inv_sqrt(r)
        N = self.num_sites
        new = self.As
        # boundary gauge: A'_k = Yi A_k Y applied at the cell boundary
        new = new.at[0].set(jnp.einsum("ab,bsc->asc", Yi, new[0]))
        new = new.at[N - 1].set(jnp.einsum("asb,bc->asc", new[N - 1], Y))
        scale = eta ** (1.0 / (2.0 * N))
        self.As = new / scale
        return eta, r

    def check_right_canonical(self) -> float:
        chi = self.bond_dim
        out = self._propagate_left(jnp.eye(chi, dtype=self.As.dtype))
        return float(
            jnp.linalg.norm(out - jnp.eye(chi, dtype=self.As.dtype)))

    def roll(self, num_sites: int) -> "InfiniteMPS":
        """Cyclic shift of the unit cell (reference ``InfiniteMPO.roll``
        analog)."""
        return InfiniteMPS(jnp.roll(self.As, -num_sites, axis=0))

    # -- measurements ------------------------------------------------------
    def measure_local_operator(self, op, site: int = 0):
        """<O_site> in the thermodynamic limit via dominant environments."""
        _, vl = self.transfer_matrix_eigs("left", 1)
        _, vr = self.transfer_matrix_eigs("right", 1)
        l = _hermitize_psd(vl[0], self.As.dtype)
        r = _hermitize_psd(vr[0], self.As.dtype)
        m = l
        for k in range(site):
            m = jnp.einsum("ab,asc,bsd->cd", m, self.As[k],
                           jnp.conj(self.As[k]), optimize="auto")
        mr = r
        for k in range(self.num_sites - 1, site, -1):
            mr = jnp.einsum("cd,asc,bsd->ab", mr, self.As[k],
                            jnp.conj(self.As[k]), optimize="auto")
        A = self.As[site]
        op = jnp.asarray(op, A.dtype)
        num = jnp.einsum("ab,asc,ts,btd,cd->", m, A, op, jnp.conj(A), mr,
                         optimize="auto")
        den = jnp.einsum("ab,asc,bsd,cd->", m, A, jnp.conj(A), mr,
                         optimize="auto")
        return num / den


def _imps_correlator(self, op1, op2, site1: int, sites2):
    """<op1_{site1} op2_j> in the thermodynamic limit (reference
    ``measure_two_body_correlator`` surface, ``base_mps.py:322``; here
    computed with the dominant transfer environments).  ``sites2`` are
    absolute site indices >= site1; sites beyond the unit cell use
    repeated transfer application."""
    if len(sites2) == 0:
        return []
    _, vl = self.transfer_matrix_eigs("left", 1)
    _, vr = self.transfer_matrix_eigs("right", 1)
    l = _hermitize_psd(vl[0], self.As.dtype)
    r = _hermitize_psd(vr[0], self.As.dtype)
    op1 = jnp.asarray(op1, self.As.dtype)
    op2 = jnp.asarray(op2, self.As.dtype)
    N = self.num_sites

    def site_tensor(j):
        return self.As[j % N]

    # left env up to site1, then insert op1
    m = l
    for k in range(site1):
        A = site_tensor(k)
        m = jnp.einsum("ab,asc,bsd->cd", m, A, jnp.conj(A),
                       optimize="auto")
    results = {}
    A1 = site_tensor(site1)
    if site1 in sites2:
        # same-site correlator: fused operator
        num = jnp.einsum("ab,asc,st,btd,cd->", m, A1, op1 @ op2,
                         jnp.conj(A1), r, optimize="auto")
        den = jnp.einsum("ab,asc,bsd,cd->", m, A1, jnp.conj(A1), r,
                         optimize="auto")
        results[site1] = num / den
    E = jnp.einsum("ab,asc,st,btd->cd", m, A1, op1, jnp.conj(A1),
                   optimize="auto")
    # normalization envs advanced in lockstep
    n_env = jnp.einsum("ab,asc,bsd->cd", m, A1, jnp.conj(A1),
                       optimize="auto")
    pos = site1 + 1
    max_site = max(sites2)
    while pos <= max_site:
        A = site_tensor(pos)
        if pos in sites2:
            # close with op2 here and the right fixed point
            r_here = r
            num = jnp.einsum("ab,asc,st,btd,cd->", E, A, op2,
                             jnp.conj(A), r_here, optimize="auto")
            den = jnp.einsum("ab,asc,bsd,cd->", n_env, A, jnp.conj(A),
                             r_here, optimize="auto")
            results[pos] = num / den
        E = jnp.einsum("ab,asc,bsd->cd", E, A, jnp.conj(A),
                       optimize="auto")
        n_env = jnp.einsum("ab,asc,bsd->cd", n_env, A, jnp.conj(A),
                           optimize="auto")
        pos += 1
    return [results[j] for j in sites2]


InfiniteMPS.measure_two_body_correlator = _imps_correlator


def _hermitize_psd(m: Array, dtype=None) -> Array:
    # remove the eigensolver's arbitrary global phase BEFORE hermitizing:
    # for phase ~ +-i, hermitizing first would collapse the fixed point
    tr = jnp.trace(m)
    mag = jnp.abs(tr)
    phase = jnp.where(mag > 0, tr / jnp.where(mag > 0, mag, 1.0), 1.0)
    m = m * jnp.conj(phase)
    m = 0.5 * (m + jnp.conj(m.T))
    if dtype is not None and not jnp.issubdtype(dtype, jnp.complexfloating):
        m = jnp.real(m).astype(dtype)
    return m


def _psd_sqrt(m: Array) -> Array:
    e, v = jnp.linalg.eigh(m)
    e = jnp.clip(jnp.real(e), 0.0, None)
    return (v * jnp.sqrt(e)[None, :]) @ jnp.conj(v.T)


def _psd_inv_sqrt(m: Array, eps: float = 1e-12) -> Array:
    e, v = jnp.linalg.eigh(m)
    e = jnp.clip(jnp.real(e), eps, None)
    return (v * (1.0 / jnp.sqrt(e))[None, :]) @ jnp.conj(v.T)
