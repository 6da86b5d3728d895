"""Finite matrix-product states on uniform stacked tensors.

Capability parity with the reference ``BaseMPS``/``FiniteMPS``
(reference ``matrixproductstates/base_mps.py:29-671``,
``finite_mps.py:26-317``), re-designed for the TPU execution model:

* Site tensors form one uniform array ``(N, chi, d, chi)`` — whole-chain
  operations (canonicalization, environments, measurements) are single
  ``lax.scan`` computations instead of per-site Python dispatch.
* Boundaries are **auxiliary legs**: the object is the block state
  ``psi[a, s_0..s_{N-1}, b] = (A_0[s_0] ⋯ A_{N-1}[s_{N-1}])_{ab}`` living
  in ``C^chi ⊗ H_phys ⊗ C^chi``; inner products and expectation values sum
  over the auxiliary indices (norm² = Σ_ab ‖psi_ab‖²).  A conventional
  open-boundary MPS embeds exactly by zero-padding its boundary tensors to
  the uniform ``chi`` (only the (0, ·, 0) block is populated), every
  boundary environment is the identity, and gauge moves (QR/SVD sweeps)
  preserve the block state exactly while every tensor keeps the same
  static shape.  This removes the ragged bond dimensions that make the
  reference representation unjittable, at no cost in physics: for a
  unique ground state the variational optimum populates the auxiliary
  space with a single product direction, and all measurements reduce to
  standard MPS expectation values.
* Truncating operations (``apply_two_site_gate``, ``position`` with
  ``max_singular_values``) use the static-shape masked SVD and report the
  truncated weight, reproducing the reference truncation semantics.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from tensornetwork_tpu.ops.decompositions import svd_masked

Array = jax.Array


def _norm_update_left(nL: Array, A: Array) -> Array:
    return jnp.einsum("ac,atr,ctp->rp", nL, A, jnp.conj(A), optimize="auto")


def _norm_update_right(nR: Array, A: Array) -> Array:
    return jnp.einsum("bd,ltb,ptd->lp", nR, A, jnp.conj(A), optimize="auto")


@jax.jit
def _left_norm_envs(As: Array) -> Array:
    """nLs[i] = norm env of sites < i (identity at i=0)."""
    chi = As.shape[1]
    n0 = jnp.eye(chi, dtype=As.dtype)

    def body(nL, A):
        return _norm_update_left(nL, A), nL

    _, envs = jax.lax.scan(body, n0, As)
    return envs


@jax.jit
def _right_norm_envs(As: Array) -> Array:
    """nRs[i] = norm env of sites > i (identity at i=N-1)."""
    chi = As.shape[1]
    n0 = jnp.eye(chi, dtype=As.dtype)

    def body(nR, A):
        return _norm_update_right(nR, A), nR

    _, envs = jax.lax.scan(body, n0, As, reverse=True)
    return envs


class FiniteMPS:
    """A finite MPS with uniform bond dimension and trace boundaries."""

    def __init__(self, tensors: Union[Array, Sequence[Array]],
                 center_position: Optional[int] = None,
                 canonicalize: bool = True):
        if isinstance(tensors, (list, tuple)):
            tensors = self._pad_ragged(tensors)
        self.As = jnp.asarray(tensors)
        if self.As.ndim != 4:
            raise ValueError(
                f"expected stacked (N, chi, d, chi) tensors, got shape "
                f"{self.As.shape}")
        self.center_position: Optional[int] = center_position
        if canonicalize:
            self.canonicalize()

    # -- construction -----------------------------------------------------

    @staticmethod
    def _pad_ragged(tensors: Sequence[Array]) -> Array:
        """Embed a ragged open-boundary tensor list into a uniform stack."""
        tensors = [jnp.asarray(t) for t in tensors]
        d = tensors[0].shape[1]
        chi = max(max(t.shape[0], t.shape[2]) for t in tensors)
        out = []
        for t in tensors:
            pad = ((0, chi - t.shape[0]), (0, 0), (0, chi - t.shape[2]))
            out.append(jnp.pad(t, pad))
        return jnp.stack(out)

    @classmethod
    def random(cls, num_sites: int, bond_dim: int, phys_dim: int = 2,
               dtype=jnp.float64, seed: int = 0,
               canonicalize: bool = True) -> "FiniteMPS":
        """Random MPS (reference ``FiniteMPS.random``,
        ``finite_mps.py:88``)."""
        key = jax.random.PRNGKey(seed)
        if jnp.issubdtype(dtype, jnp.complexfloating):
            k1, k2 = jax.random.split(key)
            real_dt = jnp.zeros((), dtype).real.dtype
            As = (jax.random.normal(
                      k1, (num_sites, bond_dim, phys_dim, bond_dim), real_dt)
                  + 1j * jax.random.normal(
                      k2, (num_sites, bond_dim, phys_dim, bond_dim), real_dt)
                  ).astype(dtype)
        else:
            As = jax.random.normal(
                key, (num_sites, bond_dim, phys_dim, bond_dim), dtype)
        As = As / np.sqrt(bond_dim * phys_dim)
        return cls(As, canonicalize=canonicalize)

    # -- basic properties -------------------------------------------------

    @property
    def num_sites(self) -> int:
        return self.As.shape[0]

    def __len__(self) -> int:
        return self.num_sites

    @property
    def bond_dim(self) -> int:
        return self.As.shape[1]

    @property
    def phys_dim(self) -> int:
        return self.As.shape[2]

    @property
    def dtype(self):
        return self.As.dtype

    @property
    def tensors(self) -> List[Array]:
        """Per-site view (reference exposes a tensor list)."""
        return [self.As[i] for i in range(self.num_sites)]

    @property
    def bond_dimensions(self) -> List[int]:
        """Uniform by construction (reference ``bond_dimensions``)."""
        return [self.bond_dim] * (self.num_sites + 1)

    @property
    def physical_dimensions(self) -> List[int]:
        return [self.phys_dim] * self.num_sites

    def to_stack(self) -> Array:
        return self.As

    def from_stack(self, As: Array) -> None:
        self.As = As
        self.center_position = None

    # -- canonicalization -------------------------------------------------

    def canonicalize(self, normalize: bool = True) -> Array:
        """Bring all sites to right-canonical form, center at 0
        (reference ``FiniteMPS.canonicalize``, ``finite_mps.py:123``)."""
        self.As, norm = _right_canonicalize(self.As)
        self.center_position = 0
        if not normalize:
            self.As = self.As.at[0].multiply(norm)
        self.center_position = 0
        return norm

    def position(self, site: int, normalize: bool = True) -> Array:
        """Shift the orthogonality center (reference ``BaseMPS.position``,
        ``base_mps.py:139``)."""
        if site < 0 or site >= self.num_sites:
            raise ValueError(
                f"site = {site} not between 0 and {self.num_sites - 1}")
        if self.center_position is None:
            self.canonicalize()
        norm = jnp.asarray(1.0, self.As.real.dtype)
        while self.center_position < site:
            i = self.center_position
            A = self.As[i]
            chi, d, _ = A.shape
            q, r = jnp.linalg.qr(A.reshape(chi * d, chi))
            nrm = jnp.linalg.norm(r)
            if normalize:
                r = r / jnp.where(nrm > 0, nrm, 1.0)
            norm = norm * nrm
            self.As = self.As.at[i].set(q.reshape(chi, d, chi))
            self.As = self.As.at[i + 1].set(
                jnp.einsum("ab,bsc->asc", r, self.As[i + 1]))
            self.center_position = i + 1
        while self.center_position > site:
            i = self.center_position
            A = self.As[i]
            chi, d, _ = A.shape
            qt, rt = jnp.linalg.qr(A.reshape(chi, d * chi).T)
            lm, q = rt.T, qt.T.reshape(chi, d, chi)
            nrm = jnp.linalg.norm(lm)
            if normalize:
                lm = lm / jnp.where(nrm > 0, nrm, 1.0)
            norm = norm * nrm
            self.As = self.As.at[i].set(q)
            self.As = self.As.at[i - 1].set(
                jnp.einsum("asb,bc->asc", self.As[i - 1], lm))
            self.center_position = i - 1
        return norm

    def check_orthonormality(self, which: str, site: int) -> Array:
        """Deviation from canonical form (reference
        ``check_orthonormality``, ``base_mps.py:616``)."""
        A = self.As[site]
        chi, d, _ = A.shape
        if which in ("l", "left"):
            m = A.reshape(chi * d, chi)
            dev = jnp.conj(m.T) @ m - jnp.eye(chi, dtype=A.dtype)
        elif which in ("r", "right"):
            m = A.reshape(chi, d * chi)
            dev = m @ jnp.conj(m.T) - jnp.eye(chi, dtype=A.dtype)
        else:
            raise ValueError(f"which = {which!r} must be 'l' or 'r'")
        return jnp.linalg.norm(dev)

    def check_canonical(self) -> Array:
        """Sum of deviations given current center (reference
        ``check_canonical``, ``base_mps.py:660``)."""
        if self.center_position is None:
            raise ValueError("MPS has no orthogonality center")
        total = jnp.asarray(0.0)
        for i in range(self.num_sites):
            if i < self.center_position:
                total = total + self.check_orthonormality("l", i)
            elif i > self.center_position:
                total = total + self.check_orthonormality("r", i)
        return total

    # -- linear algebra ---------------------------------------------------

    def norm(self) -> Array:
        nL = _left_norm_envs(self.As)
        last = _norm_update_left(nL[-1], self.As[-1])
        return jnp.sqrt(jnp.abs(jnp.trace(last)))

    def inner(self, other: "FiniteMPS") -> Array:
        """<other|self> = Σ_ab <other_ab|self_ab> (auxiliary boundary legs
        identified pairwise)."""
        if self.bond_dim != other.bond_dim:
            raise ValueError("inner product requires equal bond dims")
        E = jnp.eye(self.bond_dim, dtype=self.dtype)

        def body(E, inputs):
            A, B = inputs
            return jnp.einsum("ac,atr,ctp->rp", E, A, jnp.conj(B),
                              optimize="auto"), None

        E, _ = jax.lax.scan(body, E, (self.As, other.As))
        return jnp.trace(E)

    # -- environments / transfer (reference ``base_mps.py:128-286``,
    # ``finite_mps.py:168-315``) -------------------------------------------

    def left_envs(self, sites: Sequence[int]):
        """Left norm environments for the given sites (reference
        ``FiniteMPS.left_envs``)."""
        envs = _left_norm_envs(self.As)
        return {int(s): envs[int(s)] for s in sites}

    def right_envs(self, sites: Sequence[int]):
        envs = _right_norm_envs(self.As)
        return {int(s): envs[int(s)] for s in sites}

    def apply_transfer_operator(self, site: int, direction,
                                matrix: Array) -> Array:
        """One-site transfer-operator application (reference
        ``BaseMPS.apply_transfer_operator``, ``base_mps.py:264``).
        ``direction`` in (1, 'l', 'left') propagates rightward."""
        A = self.As[site]
        if direction in (1, "l", "left"):
            return _norm_update_left(matrix, A)
        if direction in (-1, "r", "right"):
            return _norm_update_right(matrix, A)
        raise ValueError(f"unknown direction {direction!r}")

    # -- persistence (the reference declares BaseMPS.save but never
    # implements it, ``base_mps.py:235-236``) ------------------------------

    def save(self, path: str) -> None:
        """Checkpoint the full MPS state (orbax pytree)."""
        from tensornetwork_tpu.utils.checkpoint import save_pytree
        import numpy as _np
        save_pytree(path, {
            "As": _np.asarray(jax.device_get(self.As)),
            "center_position": _np.asarray(
                -1 if self.center_position is None
                else self.center_position),
        })

    @classmethod
    def load(cls, path: str) -> "FiniteMPS":
        from tensornetwork_tpu.utils.checkpoint import load_pytree
        state = load_pytree(path)
        center = int(state["center_position"])
        return cls(jnp.asarray(state["As"]),
                   center_position=None if center < 0 else center,
                   canonicalize=False)

    # -- measurements -----------------------------------------------------

    def measure_local_operator(self, ops, sites) -> List[Array]:
        """<O_i> for each (op, site) pair (reference
        ``measure_local_operator``, ``base_mps.py:287``)."""
        if len(ops) != len(sites):
            raise ValueError("measure_local_operator: len(ops) != len(sites)")
        nLs = _left_norm_envs(self.As)
        nRs = _right_norm_envs(self.As)
        den = jnp.trace(_norm_update_left(nLs[-1], self.As[-1]))
        out = []
        for op, site in zip(ops, sites):
            A = self.As[site]
            num = jnp.einsum("ac,atb,st,csd,bd->", nLs[site], A,
                             jnp.asarray(op, self.dtype), jnp.conj(A),
                             nRs[site], optimize="auto")
            out.append(num / den)
        return out

    def measure_two_body_correlator(self, op1, op2, site1: int,
                                    sites2: Sequence[int]) -> List[Array]:
        """<op1_{site1} op2_j> for j in sites2 (reference
        ``measure_two_body_correlator``, ``base_mps.py:322``)."""
        op1 = jnp.asarray(op1, self.dtype)
        op2 = jnp.asarray(op2, self.dtype)
        N = self.num_sites
        nLs = _left_norm_envs(self.As)
        nRs = _right_norm_envs(self.As)
        den = jnp.trace(_norm_update_left(nLs[-1], self.As[-1]))
        A1 = self.As[site1]
        results = {}
        # same site: op1 @ op2
        if site1 in sites2:
            num = jnp.einsum("ac,atb,st,csd,bd->", nLs[site1], A1,
                             op1 @ op2, jnp.conj(A1), nRs[site1],
                             optimize="auto")
            results[site1] = num / den
        # j > site1: env with op1 inserted, scan right
        E = jnp.einsum("ac,atb,st,csd->bd", nLs[site1], A1, op1,
                       jnp.conj(A1), optimize="auto")
        for j in range(site1 + 1, N):
            if j in sites2:
                A = self.As[j]
                num = jnp.einsum("ac,atb,st,csd,bd->", E, A, op2,
                                 jnp.conj(A), nRs[j], optimize="auto")
                results[j] = num / den
            E = _norm_update_left(E, self.As[j])
        # j < site1: env with op1 inserted, scan left
        E = jnp.einsum("bd,atb,st,csd->ac", nRs[site1], A1, op1,
                       jnp.conj(A1), optimize="auto")
        for j in range(site1 - 1, -1, -1):
            if j in sites2:
                A = self.As[j]
                num = jnp.einsum("bd,atb,st,csd,ac->", E, A, op2,
                                 jnp.conj(A), nLs[j], optimize="auto")
                results[j] = num / den
            E = _norm_update_right(E, self.As[j])
        return [results[j] for j in sites2]

    # -- gates ------------------------------------------------------------

    def apply_one_site_gate(self, gate, site: int) -> None:
        """In-place one-site gate (reference ``apply_one_site_gate``,
        ``base_mps.py:598``)."""
        gate = jnp.asarray(gate, self.dtype)
        self.As = self.As.at[site].set(
            jnp.einsum("st,atb->asb", gate, self.As[site]))

    def apply_two_site_gate(
        self, gate, site1: int, site2: Optional[int] = None,
        max_singular_values: Optional[int] = None,
        max_truncation_err: Optional[float] = None,
        center_position: Optional[int] = None,
    ) -> Array:
        """Apply a two-site gate via contraction + truncated SVD; returns
        the truncated squared weight (reference ``apply_two_site_gate``,
        ``base_mps.py:481``).  The bond dimension stays at the static
        ``chi`` (pad-and-mask truncation)."""
        if site2 is None:
            site2 = site1 + 1
        if site2 != site1 + 1:
            raise ValueError("gate must act on neighboring sites")
        gate = jnp.asarray(gate, self.dtype)
        if self.center_position is not None:
            # keep canonical structure: move center into the gate window
            if self.center_position < site1:
                self.position(site1)
            elif self.center_position > site2:
                self.position(site2)
        chi, d = self.bond_dim, self.phys_dim
        # gate index convention (o1, o2, i1, i2), as in the reference
        # (``base_mps.py:546-548``)
        theta = jnp.einsum("asb,btc,uvst->auvc", self.As[site1],
                           self.As[site2], gate, optimize="auto")
        res = svd_masked(theta.reshape(chi * d, d * chi),
                         max_singular_values=max_singular_values or chi,
                         max_truncation_error=max_truncation_err)
        k = res.s.shape[0]
        if k < chi:  # re-pad to static chi
            u = jnp.pad(res.u, ((0, 0), (0, chi - k)))
            s = jnp.pad(res.s, (0, chi - k))
            vh = jnp.pad(res.vh, ((0, chi - k), (0, 0)))
        else:
            u, s, vh = res.u, res.s, res.vh
        if center_position is None:
            center_position = site2
        if center_position == site2:
            A1 = u.reshape(chi, d, chi)
            A2 = (s[:, None] * vh).reshape(chi, d, chi)
        else:
            A1 = (u * s[None, :]).reshape(chi, d, chi)
            A2 = vh.reshape(chi, d, chi)
        self.As = self.As.at[site1].set(A1).at[site2].set(A2)
        if self.center_position in (site1, site2):
            self.center_position = center_position
        return res.trunc_sq_norm

    # -- dense state (testing / small systems) ----------------------------

    def to_dense(self) -> Array:
        """Materialize the block state psi[a, s_0, ..., s_{N-1}, b]
        including the auxiliary boundary legs (small N only)."""
        N, chi, d, _ = self.As.shape
        acc = self.As[0]
        for i in range(1, N):
            acc = jnp.einsum("a...b,bsc->a...sc", acc, self.As[i])
        return acc


@jax.jit
def _right_canonicalize(As: Array) -> Tuple[Array, Array]:
    """Right-canonicalize all sites by one reverse scan; returns the
    canonicalized stack and the collected norm factor."""
    N, chi, d, _ = As.shape
    Lm0 = jnp.eye(chi, dtype=As.dtype)

    def body(carry, A):
        Lm, norm = carry
        A = jnp.einsum("asb,bc->asc", A, Lm)
        qt, rt = jnp.linalg.qr(A.reshape(chi, d * chi).T)
        lm, q = rt.T, qt.T.reshape(chi, d, chi)
        nrm = jnp.linalg.norm(lm)
        lm = lm / jnp.where(nrm > 0, nrm, 1.0)
        return (lm, norm * nrm), q

    (lm, norm), Qs = jax.lax.scan(
        body, (Lm0, jnp.asarray(1.0, jnp.zeros((), As.dtype).real.dtype)),
        As, reverse=True)
    # absorb the residual gauge (a scalar times unitary-ish factor) into
    # site 0 so the represented state is unchanged up to normalization
    Qs = Qs.at[0].set(jnp.einsum("ab,bsc->asc", lm, Qs[0]))
    return Qs, norm