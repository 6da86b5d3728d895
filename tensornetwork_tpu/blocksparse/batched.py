"""Batched-realization execution for block-sparse U(1) tensors.

The EP-analog axis of SURVEY §2.10: disorder realizations share one
charge *skeleton* (identical charges/flows/layout per tensor), so their
data vectors stack on a leading batch axis and every sector operation
becomes a batched device op:

* contractions: ``vmap`` of the compiled sector plan of
  :mod:`tensornetwork_tpu.blocksparse.jax_engine` (gathers and GEMMs
  pick up a batch dimension, which XLA folds into the batched GEMM).
* gauge shifts: per-sector completed-polar factorizations
  (:func:`tensornetwork_tpu.ops.decompositions.ns_polar_complete`)
  executed as batched matmuls on gathered sector blocks — the
  block-sparse analog of the dense batched sweep's polar pipeline.

Static shapes everywhere: the skeleton's bond-charge multiplicities are
constructed (:func:`canonical_bond_charges`) so that every matricization
sector satisfies rows >= cols in the shift direction, making exact
isometric gauge fixing possible without dynamic bond shrinking (the
reference's block-sparse QR shrinks bonds per sector,
reference ``block_sparse/linalg.py:300``; that is incompatible with one
compiled program serving every realization and sweep).
"""
from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tensornetwork_tpu.blocksparse.charge import BaseCharge, U1Charge
from tensornetwork_tpu.blocksparse.index import Index
from tensornetwork_tpu.blocksparse.tensor import (
    BlockSparseTensor, compute_num_nonzero, find_diagonal_blocks)
from tensornetwork_tpu.blocksparse.initialization import zeros
from tensornetwork_tpu.ops.decompositions import ns_polar_complete


def canonical_bond_charges(N: int, chi: int, n_total: Optional[int] = None,
                           width: int = 2) -> List[np.ndarray]:
    """Bond-charge multiplicity profile admitting exact static-shape
    canonicalization in BOTH sweep directions.

    Returns ``N+1`` sorted charge vectors (bond 0..N), bond k holding at
    most ``chi`` charges near ``n_total*k/N``, satisfying for every
    charge q and physical charges {0, 1}:

      (R)  m_k(q) + m_k(q-1) >= m_{k+1}(q)   (right-shift sectors tall)
      (L)  m_{k+1}(q) + m_{k+1}(q+1) >= m_k(q)  (left-shift sectors wide)

    enforced by alternating forward/backward capping passes (monotone,
    converges).  Boundary bonds are {0} and {n_total}.
    """
    if n_total is None:
        n_total = N // 2
    # target multiplicity tables: window around the mean filling
    mult: List[Dict[int, int]] = [{0: 1}]
    for k in range(1, N):
        mean = n_total * k / N
        lo = max(int(np.floor(mean)) - width, max(0, n_total - (N - k)))
        hi = min(int(np.ceil(mean)) + width, min(k, n_total))
        qs = list(range(lo, hi + 1))
        if not qs:
            qs = [max(0, min(int(round(mean)), n_total))]
        base = max(chi // len(qs), 1)
        tab = {q: base for q in qs}
        # distribute the remainder to the central charges
        rem = chi - base * len(qs)
        center = sorted(qs, key=lambda q: abs(q - mean))
        for q in center[:max(rem, 0)]:
            tab[q] += 1
        mult.append(tab)
    mult.append({n_total: 1})

    def cap_forward():
        changed = False
        for k in range(N):
            for q in list(mult[k + 1]):
                limit = mult[k].get(q, 0) + mult[k].get(q - 1, 0)
                if mult[k + 1][q] > limit:
                    mult[k + 1][q] = limit
                    changed = True
            mult[k + 1] = {q: m for q, m in mult[k + 1].items() if m > 0}
        return changed

    def cap_backward():
        changed = False
        for k in range(N - 1, -1, -1):
            for q in list(mult[k]):
                limit = mult[k + 1].get(q, 0) + mult[k + 1].get(q + 1, 0)
                if mult[k][q] > limit:
                    mult[k][q] = limit
                    changed = True
            mult[k] = {q: m for q, m in mult[k].items() if m > 0}
        return changed

    for _ in range(4 * N):
        c1 = cap_forward()
        c2 = cap_backward()
        if not (c1 or c2):
            break
    for k, tab in enumerate(mult):
        if not tab:
            raise ValueError(
                f"bond {k} has no admissible charges for chi={chi}, "
                f"N={N}, n_total={n_total}")
    return [np.sort(np.concatenate([[q] * m for q, m in sorted(t.items())])
                    ).astype(np.int64) for t in mult]


def uniform_skeleton_mps(N: int, chi: int, n_total: Optional[int] = None,
                         dtype=np.float32) -> List[BlockSparseTensor]:
    """Zero-data skeleton MPS with :func:`canonical_bond_charges` bonds.
    Legs (l[False], s[False], r[True]); physical charge n in {0, 1}."""
    bonds = canonical_bond_charges(N, chi, n_total)
    phys = U1Charge(np.array([0, 1]))
    out = []
    for k in range(N):
        idx = [Index(U1Charge(bonds[k]), False), Index(phys, False),
               Index(U1Charge(bonds[k + 1]), True)]
        out.append(zeros(idx, dtype=dtype))
    return out


def random_data_batch(skeleton: Sequence[BlockSparseTensor], B: int,
                      seed: int = 0) -> List[jax.Array]:
    """(B, nnz_i) random normal data stacks for each skeleton tensor."""
    rng = np.random.default_rng(seed)
    out = []
    for t in skeleton:
        n = t.data.shape[0]
        out.append(jnp.asarray(
            rng.standard_normal((B, n)) / np.sqrt(max(n, 1)),
            t.data.dtype))
    return out


# ---------------------------------------------------------------------------
# Batched sector gauge shifts
# ---------------------------------------------------------------------------


def _matricization_meta(t: BlockSparseTensor, partition: int):
    """(sector charges, block position maps, block shapes) of the
    (rows=[:p], cols=[p:]) matricization of a natural-order skeleton."""
    if [list(g) for g in t._order] != [[i] for i in range(t.ndim)]:
        raise ValueError("skeleton must be in natural order")
    return find_diagonal_blocks(list(t.flat_charges), list(t.flat_flows),
                                partition)


def _bond_matrix_skeleton(bond: BaseCharge, dtype) -> BlockSparseTensor:
    """Square bond matrix skeleton with legs (bond[False], bond[True])."""
    return zeros([Index(bond.copy(), False), Index(bond.copy(), True)],
                 dtype=dtype)


def _sector_label_map(charges: BaseCharge) -> Dict[Tuple, int]:
    arr = np.asarray(charges.charges).reshape(len(charges), -1)
    return {tuple(int(v) for v in arr[i]): i for i in range(len(charges))}


class ShiftPlan:
    """Host-compiled plan for a batched sector polar shift of one site."""

    def __init__(self, skel: BlockSparseTensor, direction: str):
        if direction not in ("right", "left"):
            raise ValueError(direction)
        self.direction = direction
        partition = 2 if direction == "right" else 1
        sec, maps, shapes = _matricization_meta(skel, partition)
        bond_leg = 2 if direction == "right" else 0
        bond = skel.flat_charges[bond_leg]
        self.bond_skel = _bond_matrix_skeleton(bond, skel.dtype)
        bsec, bmaps, bshapes = _matricization_meta(self.bond_skel, 1)
        bmap_by_charge = _sector_label_map(bsec)
        smap_by_charge = _sector_label_map(sec)
        self.blocks = []
        seen_bond = set()
        for i in range(len(sec)):
            q = tuple(int(v) for v in
                      np.asarray(sec.charges).reshape(len(sec), -1)[i])
            j = bmap_by_charge.get(q)
            if j is None:
                raise ValueError(
                    f"matricization sector {q} missing on the bond — "
                    "skeleton violates the canonical profile")
            nr, nc = shapes[i]
            bnr, bnc = bshapes[j]
            k = nc if direction == "right" else nr
            if bnr != k or bnc != k:
                raise ValueError("bond sector shape mismatch")
            if direction == "right" and nr < nc:
                raise ValueError(
                    f"sector {q}: rows {nr} < cols {nc} — right shift "
                    "not isometric; use canonical_bond_charges")
            if direction == "left" and nc < nr:
                raise ValueError(
                    f"sector {q}: cols {nc} < rows {nr} — left shift "
                    "not isometric; use canonical_bond_charges")
            self.blocks.append(dict(
                map=jnp.asarray(maps[i]), shape=(nr, nc),
                bond_map=jnp.asarray(bmaps[j])))
            seen_bond.add(j)
        # bond sectors never produced (no matching matricization sector)
        # keep identity so absorbing the factor is well-defined
        self.identity_bond = [
            (jnp.asarray(bmaps[j]), bshapes[j])
            for j in range(len(bsec)) if j not in seen_bond]
        self.nnz = skel.data.shape[0]
        self.bond_nnz = self.bond_skel.data.shape[0]

    def __call__(self, data: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """data (..., nnz) -> (Q data (..., nnz), bond data (..., bond_nnz)).

        right: A = Q·P (Q col-isometric);  left: A = P·Q (Q row-isometric).
        """
        batch_shape = data.shape[:-1]
        qd = jnp.zeros(batch_shape + (self.nnz,), data.dtype)
        pd = jnp.zeros(batch_shape + (self.bond_nnz,), data.dtype)
        for b in self.blocks:
            blk = data[..., b["map"]]                 # (..., nr, nc)
            if self.direction == "right":
                Q, P = ns_polar_complete(blk)
            else:
                Qt, Pt = ns_polar_complete(
                    jnp.swapaxes(blk, -1, -2))
                Q = jnp.swapaxes(Qt, -1, -2)
                P = jnp.swapaxes(Pt, -1, -2)
            qd = qd.at[..., b["map"]].set(Q)
            pd = pd.at[..., b["bond_map"]].set(P)
        for bmap, (k, _) in self.identity_bond:
            eye = jnp.broadcast_to(jnp.eye(k, dtype=data.dtype),
                                   batch_shape + (k, k))
            pd = pd.at[..., bmap].set(eye)
        return qd, pd


# ---------------------------------------------------------------------------
# Batched contraction on a shared skeleton
# ---------------------------------------------------------------------------


def _skel_of_plan_out(plan) -> BlockSparseTensor:
    o = plan["out"]
    t = BlockSparseTensor.__new__(BlockSparseTensor)
    t.data = np.zeros(o["nnz"], np.float32)
    t._charges = [c.copy() for c in o["charges"]]
    t._flows = list(o["flows"])
    t._order = [list(g) for g in o["order"]]
    return t


def contraction_plan(skel1: BlockSparseTensor, skel2: BlockSparseTensor,
                     axes, precision: str = "highest", ep=None):
    """(single-instance run fn, output skeleton) for a fixed structure.
    The run fn maps flat data vectors -> flat data vector and is
    jax-traceable, so it may be vmapped/jitted freely.

    ``ep=(ndev, axis_name)`` returns the sector-sharded executor instead
    (one psum per contraction; see ``jax_engine._make_executor``) — it
    must run inside a ``shard_map`` over ``axis_name``."""
    from tensornetwork_tpu.blocksparse import jax_engine as JE
    if isinstance(axes, int):
        axes1 = list(range(skel1.ndim - axes, skel1.ndim))
        axes2 = list(range(axes))
    else:
        axes1, axes2 = [list(a) for a in axes]
    plan = JE._get_plan(skel1, skel2, axes1, axes2, precision, ep=ep)
    return plan["run"], (None if plan["scalar"]
                         else _skel_of_plan_out(plan))


# ---------------------------------------------------------------------------
# Capacity-EP sharded environment storage (VERDICT r4 item 1).
#
# Environments dominate the symmetric sweep's HBM (BASELINE.md: 3.88 MB
# per realization vs 0.14 MB MPS nnz at chi=1024; B=256 renvs stacks are
# ~1.2 GB each), and the r4 EP executor replicated every env on every
# device (`in_specs=P()`).  Capacity-EP stores each env between programs
# as a (B, ndev, L) array sharded over the EP axis — per-device HBM =
# nnz/ndev — and moves the collective boundary: env-growth chains run
# with ``reduce="none"`` (NO psum) and reduce-scatter their disjoint-
# support partials straight into the sharded layout (half an all-
# reduce's bytes); consuming programs all-gather the current bond's env
# transiently (the other half), use it, and free it.  Exact by
# construction — reduce_scatter + all_gather composes to the same sum
# the old psum produced — with NO cross-program partition-alignment
# surface: true zero-comm env locality would require the producing and
# consuming chains to agree on component ownership, which the charged
# MPO legs (S+/S- rows map bond charge q -> q+-1) structurally break.
# Net: env psum bytes -> 0, total env comm per produce+consume cycle ~
# the old psum, stored env stacks shard P-fold.
# ---------------------------------------------------------------------------


def env_block_len(nnz: int, ndev: int) -> int:
    """Per-device block length of the sharded env layout (ceil div)."""
    return -(-nnz // ndev)


def env_scatter_stored(partial, ndev: int, axis_name: str):
    """(B, nnz) per-device disjoint-support partial -> this device's
    (B, L) block of the summed env (reduce-scatter; must run inside the
    EP shard_map)."""
    B, nnz = partial.shape
    L = env_block_len(nnz, ndev)
    p = jnp.pad(partial, ((0, 0), (0, ndev * L - nnz)))
    return jax.lax.psum_scatter(p, axis_name, scatter_dimension=1,
                                tiled=True)


def env_gather_full(stored, nnz: int, axis_name: str):
    """This device's (B, L) stored block -> the full (B, nnz) env
    (all-gather; must run inside the EP shard_map)."""
    g = jax.lax.all_gather(stored, axis_name, axis=1, tiled=True)
    return g[:, :nnz]


def env_to_stored(full, ndev: int):
    """Host-side (B, nnz) replicated env -> (B, ndev, L) stored layout
    (for boundary envs; device_put with a P(None, ep_axis, None)
    sharding to place the blocks)."""
    B, nnz = full.shape
    L = env_block_len(nnz, ndev)
    p = jnp.pad(full, ((0, 0), (0, ndev * L - nnz)))
    return p.reshape(B, ndev, L)


def env_from_stored(stored, nnz: int):
    """(B, ndev, L) stored layout -> (B, nnz) replicated env."""
    B = stored.shape[0]
    return stored.reshape(B, -1)[:, :nnz]


def chain_contraction_plan(stages, ep, precision: str = "highest",
                           reduce: str = "psum"):
    """Fused EP executor for a chain of contractions (VERDICT r3 item 2).

    ``stages``: list of ``(skel1, skel2, axes)`` where ``skel1 is None``
    for stages after the first (the through-operand = previous output).
    ``ep=(ndev, axis_name)``.  Returns ``(run, out_skel)``;
    ``run(d1_0, d2_0, d2_1, ..., d2_{n-1})`` must execute inside a
    ``shard_map`` over ``axis_name`` with replicated operands and issues
    ONE ``psum`` (final output only) for the whole chain — vs one
    full-intermediate psum per contraction in the per-contraction EP
    executor.  Bit-identical to the single-device chain: whole
    dependency components are device-assigned, so per-device partials
    have disjoint support.
    """
    from tensornetwork_tpu.blocksparse import jax_engine as JE
    specs = []
    for (s1, s2, axes) in stages:
        if isinstance(axes, int):
            raise ValueError("chain stages need explicit axes lists")
        axes1, axes2 = [list(a) for a in axes]
        specs.append((s1, s2, axes1, axes2))
    return JE.make_chain_executor(specs, ep[0], ep[1], precision,
                                  reduce=reduce)


class TwoSiteSplitPlan:
    """Batched sector-SVD split of a two-site block back onto the fixed
    bond profile.

    theta legs (l, s, t, r) with the new bond between (l,s) and (t,r);
    for each bond sector q the kept rank is exactly the bond's
    multiplicity m(q) (static) — per-sector truncation instead of the
    reference's global cross-sector singular-value sort (reference
    ``symmetric/decompositions.py:70-120``); with the canonical profile
    both row and column multiplicities dominate m(q), so shapes never
    shrink.  Returns left data (A_i layout), right data (A_{i+1} layout)
    and the summed squared discarded weight.
    """

    def __init__(self, theta_skel: BlockSparseTensor,
                 left_skel: BlockSparseTensor,
                 right_skel: BlockSparseTensor):
        sec, maps, shapes = _matricization_meta(theta_skel, 2)
        lsec, lmaps, lshapes = _matricization_meta(left_skel, 2)
        rsec, rmaps, rshapes = _matricization_meta(right_skel, 1)
        lmap_q = _sector_label_map(lsec)
        rmap_q = _sector_label_map(rsec)
        qarr = np.asarray(sec.charges).reshape(len(sec), -1)
        self.blocks = []
        for i in range(len(sec)):
            q = tuple(int(v) for v in qarr[i])
            li, ri = lmap_q.get(q), rmap_q.get(q)
            if li is None or ri is None:
                # bond does not carry this fused charge: the whole sector
                # is discarded weight
                self.blocks.append(dict(
                    map=jnp.asarray(maps[i]), shape=shapes[i], keep=0,
                    lmap=None, rmap=None))
                continue
            nr, nc = shapes[i]
            k = lshapes[li][1]
            if lshapes[li][0] != nr or rshapes[ri][1] != nc \
                    or rshapes[ri][0] != k:
                raise ValueError(f"sector {q}: inconsistent block shapes")
            if k > min(nr, nc):
                raise ValueError(
                    f"sector {q}: bond multiplicity {k} exceeds "
                    f"min(rows, cols) = {min(nr, nc)}")
            self.blocks.append(dict(
                map=jnp.asarray(maps[i]), shape=(nr, nc), keep=k,
                lmap=jnp.asarray(lmaps[li]), rmap=jnp.asarray(rmaps[ri])))
        self.left_nnz = left_skel.data.shape[0]
        self.right_nnz = right_skel.data.shape[0]

    def _apply_blocks(self, blocks, theta: jax.Array, absorb: str
                      ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        batch_shape = theta.shape[:-1]
        ld = jnp.zeros(batch_shape + (self.left_nnz,), theta.dtype)
        rd = jnp.zeros(batch_shape + (self.right_nnz,), theta.dtype)
        terr = jnp.zeros(batch_shape, theta.dtype)
        for b in blocks:
            blk = theta[..., b["map"]]
            if b["keep"] == 0:
                terr = terr + jnp.sum(blk * blk, axis=(-2, -1))
                continue
            k = b["keep"]
            U, S, Vh = jnp.linalg.svd(blk, full_matrices=False)
            Uk = U[..., :, :k]
            Sk = S[..., :k]
            Vk = Vh[..., :k, :]
            terr = terr + jnp.sum(S[..., k:] ** 2, axis=-1)
            if absorb == "right":
                lblk = Uk
                rblk = Sk[..., :, None] * Vk
            else:
                lblk = Uk * Sk[..., None, :]
                rblk = Vk
            ld = ld.at[..., b["lmap"]].set(lblk)
            rd = rd.at[..., b["rmap"]].set(rblk)
        return ld, rd, terr

    def __call__(self, theta: jax.Array, absorb: str, ep=None
                 ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """theta (..., nnz) -> (left data, right data, trunc_sq).

        ``absorb='right'``: left factor U isometric, right = S·Vh
        (left-to-right sweep); ``absorb='left'``: right factor Vh
        isometric, left = U·S.

        ``ep=(ndev, axis_name)`` distributes the ragged per-sector SVDs
        over the mesh axis (must run inside a ``shard_map``): device
        ``d`` executes only blocks ``d::ndev`` — selected by
        ``lax.switch`` on ``axis_index``, so each device compiles and
        runs just its branch — and the disjoint scatter regions are
        reassembled with one ``psum`` (the distributed truncation of
        VERDICT r2 item 2; global-ranking semantics are not needed here
        because the kept ranks are the static bond profile)."""
        if ep is None:
            return self._apply_blocks(self.blocks, theta, absorb)
        ndev, axis_name = ep
        branches = [
            functools.partial(self._apply_blocks, self.blocks[d::ndev],
                              absorb=absorb)
            for d in range(ndev)]
        idx = jax.lax.axis_index(axis_name)
        ld, rd, terr = jax.lax.switch(idx, branches, theta)
        ld = jax.lax.psum(ld, axis_name)
        rd = jax.lax.psum(rd, axis_name)
        terr = jax.lax.psum(terr, axis_name)
        return ld, rd, terr
