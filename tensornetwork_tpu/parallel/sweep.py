"""Chain-distributed DMRG sweeps (SP-analog).

The reference sweeps one site at a time over the whole chain in Python
(reference ``dmrg.py:397-442``); here the chain is partitioned into
contiguous blocks laid out across a mesh axis, and blocks sweep *locally
in parallel* with their neighbors frozen — the real-space-parallel DMRG
structure (Stoudenmire-White), expressed TPU-natively:

* environments are relayed across devices with ``lax.ppermute`` (ICI
  halo exchange) — O(P) pipeline-fill steps per outer iteration;
* the norm environments at each block boundary are gauged to the
  identity with a (clipped) PSD square root, so the in-block Lanczos
  stays a standard eigenproblem; the gauge is purely local to the
  active block (its inverse is applied when mapping back), so frozen
  neighbors are untouched;
* blocks alternate red/black so neighboring blocks never update
  concurrently.

Everything below runs inside one ``shard_map`` over the ``sp`` mesh axis.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tensornetwork_tpu.models import dmrg as _dmrg

Array = jax.Array


def _fold_left_env(L, As_blk, Ws_blk):
    def body(L, inputs):
        A, W = inputs
        return _dmrg._update_left(L, A, W), None

    L, _ = jax.lax.scan(body, L, (As_blk, Ws_blk))
    return L


def _fold_right_env(R, As_blk, Ws_blk):
    def body(R, inputs):
        A, W = inputs
        return _dmrg._update_right(R, A, W), None

    R, _ = jax.lax.scan(body, R, (As_blk, Ws_blk), reverse=True)
    return R


def _fold_left_norm(n, As_blk):
    def body(n, A):
        return jnp.einsum("ac,atr,ctp->rp", n, A, jnp.conj(A),
                          optimize="auto"), None

    n, _ = jax.lax.scan(body, n, As_blk)
    return n


def _fold_right_norm(n, As_blk):
    def body(n, A):
        return jnp.einsum("bd,ltb,ptd->lp", n, A, jnp.conj(A),
                          optimize="auto"), None

    n, _ = jax.lax.scan(body, n, As_blk, reverse=True)
    return n


def _psd_factor(n, rel_eps=None):
    """Return (a, a_inv) with a·a† = n, PROJECTING the near-null norm
    directions (a and a_inv both zero there).

    The round-4 version inverted clipped eigenvalues (floor at
    1e-10·max) instead of projecting: at f32 the null eigenvalues of a
    rank-deficient boundary norm env are eigh noise (~eps·max), so
    1/sqrt(floor) amplified unphysical directions of the effective
    Hamiltonian by ~1e5 and every f32 SP run diverged to -1e18 within
    one iteration (the suite only passed because conftest forces x64 —
    measured 2026-08-21, benchmarks/sp_scaling.py).  Null directions
    carry zero norm, so zeroing them is the exact gauge: the gauged
    state a†·B has no weight there and the back-map drops them."""
    e, v = jnp.linalg.eigh(0.5 * (n + jnp.conj(n.T)))
    e = jnp.real(e)
    if rel_eps is None:
        rel_eps = 100.0 * float(jnp.finfo(e.dtype).eps)
    cut = jnp.maximum(jnp.max(e), 0.0) * rel_eps
    keep = e > cut
    sq = jnp.sqrt(jnp.where(keep, e, 1.0))
    a = v * jnp.where(keep, sq, 0.0)[None, :]
    a_inv = v * jnp.where(keep, 1.0 / sq, 0.0)[None, :]
    # a = v diag(sq) on the kept subspace: a a† = n up to the null cut
    return a, jnp.conj(a_inv.T)


def _relay(x, fold, axis_name, num_devices, boundary, direction):
    """Pipeline-fill env relay: after P-1 steps, each device holds the
    fold of all blocks on its boundary side."""
    idx = jax.lax.axis_index(axis_name)
    if direction == "left_to_right":
        perm = [(i, i + 1) for i in range(num_devices - 1)]
        is_first = idx == 0
    else:
        perm = [(i + 1, i) for i in range(num_devices - 1)]
        is_first = idx == num_devices - 1

    # the relay carry varies per device; mark the replicated boundary as
    # device-varying so the shard_map VMA types line up
    boundary = jax.lax.pcast(boundary, (axis_name,), to="varying")
    env = boundary

    def body(_, env):
        out = fold(env)
        shifted = jax.lax.ppermute(out, axis_name, perm)
        return jnp.where(is_first, boundary, shifted)

    env = jax.lax.fori_loop(0, num_devices - 1, body, env)
    return env


def make_distributed_sweep(mesh: Mesh, num_devices: int,
                           num_krylov_vecs: int = 10,
                           inner_sweeps: int = 1,
                           axis_name: str = "sp",
                           num_colors: int = 2,
                           two_site: bool = False):
    """Build the jitted red/black distributed sweep for a given mesh."""
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    def phase_fn(As, Ws, vL, vR, parity):
        # the env folds, norm gauges and eigh here run OUTSIDE the
        # sweep impl's forced-highest context — wrap the whole phase
        # (the documented TPU default-precision trap, CLAUDE.md)
        with jax.default_matmul_precision("highest"):
            return _phase_body(As, Ws, vL, vR, parity)

    def _phase_body(As, Ws, vL, vR, parity):
        # runs per-device on a (B, chi, d, chi) block
        chi = As.shape[1]
        idx = jax.lax.axis_index(axis_name)
        dtype = As.dtype
        eyeL = _dmrg._boundary_left(chi, vL)
        eyeR = _dmrg._boundary_right(chi, vR)
        ident = jnp.eye(chi, dtype=dtype)

        L = _relay(None, lambda e: _fold_left_env(e, As, Ws), axis_name,
                   num_devices, eyeL, "left_to_right")
        R = _relay(None, lambda e: _fold_right_env(e, As, Ws), axis_name,
                   num_devices, eyeR, "right_to_left")
        nL = _relay(None, lambda e: _fold_left_norm(e, As), axis_name,
                    num_devices, ident, "left_to_right")
        nR = _relay(None, lambda e: _fold_right_norm(e, As), axis_name,
                    num_devices, ident, "right_to_left")

        a, a_inv = _psd_factor(nL)        # nL = a a†
        b, b_inv = _psd_factor(nR)        # nR = b b†
        aH = jnp.conj(a.T)
        bH = jnp.conj(b.T)
        a_invH = jnp.conj(a_inv.T)
        b_invH = jnp.conj(b_inv.T)

        # gauge the block: B' = a† · B · b  (norm envs become identity)
        As_g = As.at[0].set(jnp.einsum("ab,bsc->asc", aH, As[0]))
        As_g = As_g.at[-1].set(jnp.einsum("asb,bc->asc", As_g[-1], b))
        # transform the hamiltonian envs into the gauged frame
        Lg = jnp.einsum("xa,awc,yc->xwy", a_inv, L, jnp.conj(a_inv))
        Rg = jnp.einsum("xb,bwd,yd->xwy", b_inv, R, jnp.conj(b_inv))

        sweep_impl = (_dmrg._two_site_sweep_impl if two_site
                      else _dmrg._one_site_sweep_impl)
        res = sweep_impl(As_g, Ws, vL, vR, num_krylov_vecs,
                         boundary_envs=(Lg, Rg))
        As_new = res.As
        for _ in range(inner_sweeps - 1):
            res = sweep_impl(As_new, Ws, vL, vR, num_krylov_vecs,
                             boundary_envs=(Lg, Rg))
            As_new = res.As
        # back to the global frame.  The back-map is NOT isometric
        # (a_inv carries 1/sqrt of the kept norm-env eigenvalues, up to
        # ~1/sqrt(cut) on poorly conditioned boundaries), so normalize
        # the boundary sites afterwards — a pure global-scale change.
        # Without this, simultaneous (red/black) updates compound the
        # amplification across iterations and the f32 state overflows
        # by iteration ~2 (measured 2026-08-21, sp_scaling.py).
        A0 = jnp.einsum("ab,bsc->asc", a_invH, As_new[0])
        As_new = As_new.at[0].set(A0 / jnp.maximum(
            _dmrg._norm_like(A0), jnp.asarray(1e-30, A0.dtype)))
        Al = jnp.einsum("asb,bc->asc", As_new[-1], b_inv)
        As_new = As_new.at[-1].set(Al / jnp.maximum(
            _dmrg._norm_like(Al), jnp.asarray(1e-30, Al.dtype)))
        active = (idx % num_colors) == parity
        As_out = jnp.where(active, As_new, As)
        energy = jnp.where(active, res.energy, jnp.inf)
        return As_out, energy.reshape(1)

    import inspect
    kw = {}
    params = inspect.signature(shard_map).parameters
    if "check_vma" in params:
        kw["check_vma"] = False
    elif "check_rep" in params:
        kw["check_rep"] = False
    sharded = shard_map(
        phase_fn, mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P(), P(), P()),
        out_specs=(P(axis_name), P(axis_name)), **kw,
    )

    @jax.jit
    def one_iteration(As, Ws, vL, vR):
        e_best = jnp.asarray(jnp.inf, jnp.zeros((), As.dtype).real.dtype)
        for color in range(num_colors):
            As, e = sharded(As, Ws, vL, vR,
                            jnp.asarray(color, jnp.int32))
            e_best = jnp.minimum(e_best, jnp.min(e))
        return As, e_best

    return one_iteration


class DistributedDMRG:
    """Ground-state search with the chain distributed over a mesh axis."""

    def __init__(self, As: Array, mpo, mesh: Mesh, axis_name: str = "sp",
                 num_krylov_vecs: int = 10, inner_sweeps: int = 1,
                 num_colors: Optional[int] = None,
                 two_site: bool = False):
        """``num_colors``: blocks of the same color update concurrently.
        ``num_colors == num_devices`` is an exact sequential (Gauss-Seidel)
        wave — full DMRG quality, one active block at a time;
        ``num_colors = 2`` (red/black) updates half the blocks per phase —
        maximal parallelism, but simultaneous far-block updates use stale
        environments and converge approximately (use for pre-conditioning,
        then finish with a sequential wave).  Default: sequential."""
        self.mesh = mesh
        self.axis_name = axis_name
        num_devices = mesh.shape[axis_name]
        N = As.shape[0]
        if N % num_devices != 0:
            raise ValueError(
                f"chain length {N} not divisible by {num_devices} devices")
        self.As = jax.device_put(
            As, NamedSharding(mesh, P(axis_name, None, None, None)))
        self.Ws = jax.device_put(
            mpo.Ws, NamedSharding(mesh, P(axis_name, None, None, None, None)))
        self.vL = jax.device_put(mpo.vL, NamedSharding(mesh, P()))
        self.vR = jax.device_put(mpo.vR, NamedSharding(mesh, P()))
        if num_colors is None:
            num_colors = num_devices
        self._step = make_distributed_sweep(
            mesh, num_devices, num_krylov_vecs, inner_sweeps, axis_name,
            num_colors, two_site)
        self.energies = []

    def run(self, num_iterations: int = 10, tol: float = 1e-10) -> float:
        e_prev = None
        for _ in range(num_iterations):
            self.As, e = self._step(self.As, self.Ws, self.vL, self.vR)
            e = float(e)
            self.energies.append(e)
            if e_prev is not None and abs(e - e_prev) < tol:
                break
            e_prev = e
        return self.energies[-1]

    def energy(self) -> float:
        """Exact <H> of the current distributed state."""
        return float(_dmrg.mps_mpo_expectation(self.As, self.Ws, self.vL,
                                               self.vR))
