"""DMRG ground-state search, compiled end-to-end for TPU.

Capability parity with the reference ``BaseDMRG``/``FiniteDMRG``
(reference ``matrixproductstates/dmrg.py:29-604``), re-architected for XLA:

* The MPS is a uniform stack ``(N, chi, d, chi)`` — open boundaries are
  *trace* boundaries (identity boundary environments) so every site tensor
  has the same shape and an entire sweep is a single ``lax.scan``.
  The reference instead drives a Python loop over ragged per-site tensors
  (reference ``dmrg.py:397-442``), paying dispatch per site.
* The local eigensolver is the static-iteration Lanczos of
  :mod:`tensornetwork_tpu.ops.krylov` (masked-matmul orthogonalization on
  the MXU), run *inside* the scan body — one XLA computation per sweep.
* Environment caching falls out of the scan structure: the left-to-right
  optimize scan emits the left environments the right-to-left scan
  consumes (reference maintains explicit env caches with invalidation,
  ``dmrg.py:114-157``).
* Two-site updates truncate with the static-shape masked SVD
  (pad-and-mask), keeping shapes compile-time constant while reproducing
  the reference's truncation semantics and error accounting.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tensornetwork_tpu.models.mpo import MPO
from tensornetwork_tpu.ops import krylov
from tensornetwork_tpu.ops.decompositions import cholqr2 as _cholqr2
from tensornetwork_tpu.ops.decompositions import ns_polar as _ns_polar_impl
from tensornetwork_tpu.ops.decompositions import (subspace_truncate,
                                                  svd_masked)

Array = jax.Array


# ---------------------------------------------------------------------------
# Environment algebra.  Conventions:
#   A[l, s, r]        ket site tensor
#   W[wl, wr, s, t]   MPO tensor, s = bra phys, t = ket phys
#   L[a, w, a']       left env, a = ket bond, a' = bra bond
#   R[b, w, b']       right env
# (reference matvec/env definitions: ``dmrg.py:90-112``)
# ---------------------------------------------------------------------------



def _norm_like(x: Array) -> Array:
    """Frobenius norm in x's dtype (jnp.linalg.norm upcasts f32 inputs
    to f64 under jax_enable_x64, which would poison scan carries for
    f32 states in the x64 test environment)."""
    return jnp.linalg.norm(x).astype(x.dtype)

def _update_left(L: Array, A: Array, W: Array) -> Array:
    return jnp.einsum("awc,atr,wvst,csp->rvp", L, A, W, jnp.conj(A),
                      optimize="auto")


def _update_right(R: Array, A: Array, W: Array) -> Array:
    return jnp.einsum("bvd,ltb,wvst,psd->lwp", R, A, W, jnp.conj(A),
                      optimize="auto")


def _matvec_1s(L: Array, W: Array, R: Array, x: Array,
               prec: Optional[str] = None) -> Array:
    # y[c, s, d] = L[a,w,c] W[w,v,s,t] x[a,t,b] R[b,v,d]
    return jnp.einsum("awc,wvst,atb,bvd->csd", L, W, x, R, optimize="auto",
                      precision=prec)


def _matvec_2s(L: Array, W1: Array, W2: Array, R: Array, x: Array,
               prec: Optional[str] = None) -> Array:
    # y[c, s, u, d] = L[a,w,c] W1[w,m,s,t] W2[m,v,u,z] x[a,t,z,b] R[b,v,d]
    return jnp.einsum("awc,wmst,mvuz,atzb,bvd->csud", L, W1, W2, x, R,
                      optimize="auto", precision=prec)


def _boundary_left(chi: int, vL: Array) -> Array:
    return jnp.einsum("ac,w->awc", jnp.eye(chi, dtype=vL.dtype), vL)


def _boundary_right(chi: int, vR: Array) -> Array:
    return jnp.einsum("bd,v->bvd", jnp.eye(chi, dtype=vR.dtype), vR)


# canonical implementation lives in ops.decompositions (shared with the
# subspace-truncation orthonormalizer); kept under the historical name
_ns_polar = _ns_polar_impl


QR_IMPL = "householder"  # "householder" | "cholesky" | "polar"
# Module-level default for the gauge-shift factorization OFF-TPU.  The
# public sweep entry points resolve it at *call* time (TPU resolves to
# "polar" — see _default_qr_impl) and key their jit cache on the
# resolved value, so flipping it between calls is safe.


def _default_qr_impl() -> str:
    """Call-time gauge default: ``ns_polar`` on TPU, module default off.

    On-chip A/B (VERDICT r4 item 4, benchmarks/gauge_ab.py, N=32 TFI
    f32 m=10, 2026-08-21): Householder gauges leave the single-instance
    one-site floor at -1.2e-4..-1.5e-4 (NON-VARIATIONAL — the backend's
    f32 QR span quality, BASELINE.md QR addendum), while polar recovers
    the batched +1e-5 class at every chi and is FASTER below chi=512
    (chi=64: 213 -> 247 sweeps/s; chi=256: 34.7 -> 44.8; chi=512: 7.99
    -> 7.03, -12% for a 14x floor gain).  The "likely reflects QR
    quality" hypothesis is now a measurement."""
    return "polar" if jax.default_backend() == "tpu" else QR_IMPL

RITZ_IMPL = "eigh"  # "eigh" | "power" — small-eigenproblem method inside
# the per-site Lanczos ("power" avoids the batched tiny eigh, which is
# pathologically slow on TPU; see ops.krylov.eigsh_lanczos).  Resolved at
# call time like QR_IMPL.

MATVEC_PRECISION: Optional[str] = None  # None | "highest" | "high"
# Precision of the Lanczos matvec einsums only; everything else in the
# sweep stays at the forced "highest" (6-pass bf16 = f32-exact on MXU).
# "high" (3-pass emulation) halves the dominant GEMM cost; measure energy
# parity before adopting it for a new model class.  Resolved at call time.

EPILOGUE_IMPL = "xla"  # "xla" | "fused" — per-site gauge-shift + env
# growth.  "fused" = the Pallas fused polar+env kernel
# (ops.kernels.make_fused_gauge_env).  MEASURED SLOWER than XLA on TPU
# v5e (B=256 chi=64: 627 vs 438 ms/sweep even with full-panel GEMMs):
# the polar iteration is a chain of 21 *dependent* small GEMMs, and the
# sequential grid (one instance per program) exposes that latency,
# while XLA pipelines the MXU across instances within each iteration.
# Fusion pays only when each dependency step carries enough parallel
# work (the Lanczos kernel's 12-GEMM matvecs) — not for iteration
# chains of single small GEMMs.  Kept opt-in; only applies when
# qr_impl == "polar".

TRUNC_IMPL = "svd"  # "svd" | "subspace" — two-site bond truncation.
# "svd" is the exact reference-semantics masked SVD; batched
# (B,128,128) SVD/eigh serialize pathologically on TPU (218 ms per
# batched call = 13.5 s per B=256 sweep).  "subspace" replaces it with
# warm-started subspace iteration (matmuls + CholQR2 only, ~25x
# faster): q spans the dominant rank-chi left subspace, q@rest equals
# the truncated SVD as a projector, and the within-subspace basis
# difference is MPS gauge.  Batched wrappers default to it on TPU.

TRUNC_ITERS = 4  # subspace-iteration count for trunc_impl="subspace"

TRUNC_ORTH = "qr"  # "qr" | "polar" | "polar+qr" | "cholqr2" — the
# per-iteration orthonormalizer inside the subspace truncation (see
# ops.decompositions.subspace_truncate).  Batched Householder QR costs
# ~4-5x one NS polar on TPU at B=256 chi=64; "polar+qr" keeps the exact
# final completion.  Resolved at call time like QR_IMPL.

LANCZOS_IMPL = "xla"  # "xla" | "fused"
# "fused" runs the one-site local eigensolve through the Pallas
# whole-Lanczos-step kernel (ops.kernels.make_fused_lanczos): all m
# matvecs of a site execute back-to-back in VMEM, one grid program per
# batch instance.  Measured on TPU v5e (B=256, chi=64, m=10): 1.48x the
# XLA Lanczos chain at identical (HIGHEST) precision.  Implies
# reorth=False + numeig=1 semantics; matvec_prec is ignored (in-kernel
# dots are always HIGHEST — Mosaic has no 3-pass mode).  Resolved at
# call time like QR_IMPL.


def _qr(m: Array, use_cholesky: bool = False,
        impl: Optional[str] = None) -> Tuple[Array, Array]:
    # call-time default: polar on TPU (see _default_qr_impl) — this
    # also covers TDVP's gauge shifts, which import these helpers
    impl = _default_qr_impl() if impl is None else impl
    if use_cholesky or impl == "cholesky":
        return _cholqr2(m)
    if impl == "polar":
        return _ns_polar(m)
    if impl == "polar_express":
        # experimental LP-scheduled quintic iteration (~12% fewer
        # gauge GEMMs at the same f32 isometry class; see
        # ops.decompositions.ns_polar_express)
        from tensornetwork_tpu.ops.decompositions import ns_polar_express
        return ns_polar_express(m)
    return jnp.linalg.qr(m)


def _qr_shift_right(A: Array, use_cholesky: bool = False,
                    impl: Optional[str] = None) -> Tuple[Array, Array]:
    """Left-canonicalize: A = Q·Rm with Q†Q = I on the right bond."""
    chi_l, d, chi_r = A.shape
    q, rm = _qr(A.reshape(chi_l * d, chi_r), use_cholesky, impl)
    return q.reshape(chi_l, d, chi_r), rm


def _rq_shift_left(A: Array, use_cholesky: bool = False,
                   impl: Optional[str] = None) -> Tuple[Array, Array]:
    """Right-canonicalize: A = Lm·Q with Q·Q† = I on the left bond."""
    chi_l, d, chi_r = A.shape
    qt, rt = _qr(A.reshape(chi_l, d * chi_r).T, use_cholesky, impl)
    return rt.T, qt.T.reshape(chi_l, d, chi_r)


def _local_solve_1s(Lenv: Array, W: Array, Renv: Array, A: Array,
                    num_krylov_vecs: int, ritz_impl: str, reorth: bool,
                    matvec_prec: Optional[str], lanczos_impl: str,
                    interpret: bool) -> Tuple[Array, Array]:
    """Per-site local ground-state solve: smallest Ritz pair of H_eff.

    ``lanczos_impl="fused"`` routes through the Pallas whole-Lanczos
    kernel (plain three-term recurrence in VMEM, batch on the grid via
    vmap); ``"xla"`` is the in-XLA masked-matmul Lanczos."""
    if lanczos_impl == "fused":
        chi, d = A.shape[0], A.shape[1]
        M = W.shape[0]
        from tensornetwork_tpu.ops import kernels, vmem
        # Tier routing consults the single VMEM admission authority
        # (ops.vmem, VERDICT r4 item 3 — every budget calibrated there).
        # Tier 1 — single-pass, basis resident: L+R blocks, x, the m-row
        # Krylov basis and ~3 working vectors, all (chi, chi) f32 tiles.
        fits_resident = vmem.admit_resident_lanczos(
            chi, d, M, num_krylov_vecs)
        # Tier 2 — two-pass (no basis storage): L, R + ~6 working tiles;
        # 2x matvec cost.  At chi=512, M=3, d=2 this is 18.9 MB — over.
        # Tier 3 — streamed: chi chunked over a third grid axis, L
        # streamed in, basis streamed OUT to HBM (VERDICT r2 item 1).
        n_chunks = vmem.streamed_chunk_count(chi, d, M)
        if fits_resident or vmem.admit_two_pass_lanczos(chi, d, M):
            ev, evec = kernels.fused_lanczos_ground_state(
                Lenv[None], W, Renv[None], A[None],
                num_krylov_vecs=num_krylov_vecs, ritz_method=ritz_impl,
                interpret=interpret, precision=jax.lax.Precision.HIGHEST,
                two_pass=not fits_resident)
            return ev[0], evec[0]
        if n_chunks is not None:
            ev, evec = kernels.fused_lanczos_ground_state_streamed(
                Lenv[None], W, Renv[None], A[None],
                num_krylov_vecs=num_krylov_vecs, ritz_method=ritz_impl,
                n_chunks=n_chunks, interpret=interpret,
                precision=jax.lax.Precision.HIGHEST)
            return ev[0], evec[0]
        # Tier 4 — doubly-chunked matvec kernel + XLA recurrence: the
        # chi=1024 tier, where even the streamed kernel's resident
        # recurrence vectors (3d tiles) no longer fit VMEM (r4).
        # Tier 5 — three-level-chunked XL kernel: chi=2048, where the
        # state itself exceeds VMEM (r5).
        plan = (vmem.streamed_matvec_plan(chi, d, M)
                or vmem.streamed_matvec_xl_plan(chi, d, M))
        if plan is not None:
            ev, evec = kernels.fused_lanczos_ground_state_streamed2(
                Lenv[None], W, Renv[None], A[None],
                num_krylov_vecs=num_krylov_vecs, ritz_method=ritz_impl,
                plan=plan, interpret=interpret,
                precision=jax.lax.Precision.HIGHEST)
            return ev[0], evec[0]
    mv = lambda x: _matvec_1s(Lenv, W, Renv, x, matvec_prec)
    evals, evecs = krylov.eigsh_lanczos(
        mv, A, num_krylov_vecs=num_krylov_vecs, numeig=1,
        ritz_method=ritz_impl, reorthogonalize=reorth)
    return evals[0], evecs[0]


def _local_solve_2s(Lenv: Array, W1: Array, W2: Array, Renv: Array,
                    theta: Array, num_krylov_vecs: int, ritz_impl: str,
                    reorth: bool, matvec_prec: Optional[str],
                    lanczos_impl: str, interpret: bool
                    ) -> Tuple[Array, Array]:
    """Two-site local solve; fused-kernel path as in
    :func:`_local_solve_1s` (nt = d*d tiles, MPO pair pre-fused)."""
    if lanczos_impl == "fused":
        chi, d = theta.shape[0], theta.shape[1]
        M = W1.shape[0]
        nt = d * d
        from tensornetwork_tpu.ops import kernels, vmem
        # resident-kernel admission via the single VMEM authority
        # (ops.vmem): the 2s kernel holds nt = d^2 (chi, chi) tiles and
        # Mosaic allocates ~6.4x the analytic count for nt>=4 kernels
        # (chi=128, m=6 OOMed at 23.08 MB scoped where the old chi^2
        # estimate said 3 MB) — the calibrated model admits the
        # measured-safe chi*d=128 class, scales down with
        # num_krylov_vecs (ADVICE r4), and routes larger shapes to the
        # streamed tier below.
        if vmem.admit_resident_lanczos(chi, nt, M, num_krylov_vecs):
            ev, evec = kernels.fused_lanczos_ground_state_2s(
                Lenv[None], W1, W2, Renv[None], theta[None],
                num_krylov_vecs=num_krylov_vecs, ritz_method=ritz_impl,
                interpret=interpret, precision=jax.lax.Precision.HIGHEST)
            return ev[0], evec[0]
        # Large-chi two-site tiers: doubly-chunked matvec kernel (r4) or
        # the three-level-chunked XL kernel (r5, chi=1024: x streamed in
        # a-chunks, Q staged through HBM) + XLA recurrence — theta tiles
        # are (chi*d)^2, so the resident-recurrence kernels never fit.
        plan = (vmem.streamed_matvec_plan(chi, nt, M)
                or vmem.streamed_matvec_xl_plan(chi, nt, M))
        if plan is not None:
            ev, evec = kernels.fused_lanczos_ground_state_2s_streamed(
                Lenv[None], W1, W2, Renv[None], theta[None],
                num_krylov_vecs=num_krylov_vecs, ritz_method=ritz_impl,
                plan=plan, interpret=interpret,
                precision=jax.lax.Precision.HIGHEST)
            return ev[0], evec[0]
    mv = lambda x: _matvec_2s(Lenv, W1, W2, Renv, x, matvec_prec)
    evals, evecs = krylov.eigsh_lanczos(
        mv, theta, num_krylov_vecs=num_krylov_vecs, numeig=1,
        ritz_method=ritz_impl, reorthogonalize=reorth)
    return evals[0], evecs[0]


def _gauge_env_left(Lenv: Array, W: Array, A: Array, qr_impl: str,
                    epilogue_impl: str, interpret: bool
                    ) -> Tuple[Array, Array, Array]:
    """Gauge-shift right (A = Q·Rm) + grow the left env with Q.
    Fused-kernel path when epilogue_impl == "fused" and the shift is the
    polar one (see EPILOGUE_IMPL)."""
    chi, d = A.shape[0], A.shape[1]
    M = W.shape[0]
    from tensornetwork_tpu.ops import vmem
    if (epilogue_impl == "fused" and qr_impl == "polar"
            and vmem.admit_gauge_epilogue(chi, d, M)):
        from tensornetwork_tpu.ops import kernels
        qi, ci = (14, 7) if A.dtype == jnp.float32 else (20, 10)
        Q, P, Lnew = kernels.fused_gauge_env_left(
            Lenv[None], W, A[None], quintic_iters=qi, cubic_iters=ci,
            interpret=interpret, precision=jax.lax.Precision.HIGHEST)
        return Q[0], P[0], Lnew[0]
    Q, Rm = _qr_shift_right(A, impl=qr_impl)
    return Q, Rm, _update_left(Lenv, Q, W)


def _gauge_env_right(Renv: Array, W: Array, A: Array, qr_impl: str,
                     epilogue_impl: str, interpret: bool
                     ) -> Tuple[Array, Array, Array]:
    """Gauge-shift left (A = Lm·Q) + grow the right env with Q."""
    chi, d = A.shape[0], A.shape[1]
    M = W.shape[0]
    from tensornetwork_tpu.ops import vmem
    if (epilogue_impl == "fused" and qr_impl == "polar"
            and vmem.admit_gauge_epilogue(chi, d, M)):
        from tensornetwork_tpu.ops import kernels
        qi, ci = (14, 7) if A.dtype == jnp.float32 else (20, 10)
        Q, Lm, Rnew = kernels.fused_gauge_env_right(
            Renv[None], W, A[None], quintic_iters=qi, cubic_iters=ci,
            interpret=interpret, precision=jax.lax.Precision.HIGHEST)
        return Q[0], Lm[0], Rnew[0]
    Lm, Q = _rq_shift_left(A, impl=qr_impl)
    return Q, Lm, _update_right(Renv, Q, W)


def right_canonicalize_and_envs(
    As: Array, Ws: Array, vL: Array, vR: Array,
    R0: Optional[Array] = None,
    qr_impl: Optional[str] = None,
    epilogue_impl: str = "xla",
    interpret: bool = False,
) -> Tuple[Array, Array]:
    """One reverse scan: bring all sites to right-canonical form and emit the
    right environment stack ``Renvs[i]`` = env of sites > i.  ``R0``
    optionally overrides the open-boundary right environment."""
    N, chi, d, _ = As.shape
    if R0 is None:
        R0 = _boundary_right(chi, vR)
    Lm0 = jnp.eye(chi, dtype=As.dtype)

    def body(carry, inputs):
        Renv, Lm = carry
        A, W = inputs
        A = jnp.einsum("asb,bc->asc", A, Lm)
        nrm = _norm_like(A)
        A = A / jnp.where(nrm > 0, nrm, 1.0)
        Q, Lm_new, Renv_new = _gauge_env_right(
            Renv, W, A, qr_impl or _default_qr_impl(), epilogue_impl, interpret)
        return (Renv_new, Lm_new), (Q, Renv)

    (_, Lm_final), (Qs, Renvs) = jax.lax.scan(body, (R0, Lm0), (As, Ws),
                                              reverse=True)
    # re-absorb the left-over center factor of site 0 — dropping it would
    # change the state (site 0 becomes the orthogonality center)
    Qs = Qs.at[0].set(jnp.einsum("ab,bsc->asc", Lm_final, Qs[0]))
    return Qs, Renvs


class SweepResult(NamedTuple):
    As: Array
    energy: Array
    energies: Array        # per-site Lanczos energies of the last half-sweep
    trunc_err: Array       # accumulated truncated weight (2-site only)
    renvs: Optional[Array] = None  # right-env stack in the final gauge:
    # feeding it back as ``renvs=`` to the next sweep (one- or two-site)
    # skips the re-canonicalization prepass (~17% of the sweep) — the
    # reverse pass has already built exactly these environments.


def one_site_sweep(
    As: Array, Ws: Array, vL: Array, vR: Array,
    num_krylov_vecs: int = 10,
    boundary_envs: Optional[Tuple[Array, Array]] = None,
    qr_impl: Optional[str] = None,
    ritz_impl: Optional[str] = None,
    reorth: bool = True,
    matvec_prec: Optional[str] = None,
    lanczos_impl: Optional[str] = None,
    epilogue_impl: Optional[str] = None,
    renvs: Optional[Array] = None,
) -> SweepResult:
    """One full (left-to-right + right-to-left) one-site DMRG sweep as a
    single XLA computation (reference ``run_one_site``, ``dmrg.py:345``).

    ``boundary_envs``: optional explicit (L0, R0) environments of shape
    (chi, M, chi) replacing the open-boundary defaults — this is how a
    chain *block* inside a distributed sweep sees its frozen neighbors.
    The norm environments at the block boundary must be (gauged to) the
    identity for the Lanczos to be a standard eigenproblem.

    ``qr_impl``/``ritz_impl`` override the module defaults ``QR_IMPL`` /
    ``RITZ_IMPL``; both are resolved here (outside jit) so the compile
    cache is keyed on the actual implementation choice."""
    qr_impl = _default_qr_impl() if qr_impl is None else qr_impl
    ritz_impl = RITZ_IMPL if ritz_impl is None else ritz_impl
    matvec_prec = MATVEC_PRECISION if matvec_prec is None else matvec_prec
    if lanczos_impl is None:
        # TPU default: the fused Pallas whole-Lanczos kernel — measured
        # 140 vs 75 sweeps/s single-instance and 585 vs 434
        # inst-sweeps/s batched (B=256) at chi=64, identical converged
        # energies.  Off-TPU the kernel would run in slow interpret
        # mode, so the module default ("xla") applies there.
        lanczos_impl = ("fused" if jax.default_backend() == "tpu"
                        else LANCZOS_IMPL)
    if epilogue_impl is None:
        epilogue_impl = EPILOGUE_IMPL
    # Pallas runs in interpret mode off-TPU (CPU tests / virtual meshes).
    interpret = jax.default_backend() != "tpu"
    return _one_site_sweep_jit(As, Ws, vL, vR, num_krylov_vecs,
                               boundary_envs, qr_impl, ritz_impl, reorth,
                               matvec_prec, lanczos_impl, interpret,
                               epilogue_impl, renvs)


@functools.partial(
    jax.jit,
    static_argnames=("num_krylov_vecs", "qr_impl", "ritz_impl", "reorth",
                     "matvec_prec", "lanczos_impl", "interpret",
                     "epilogue_impl"))
def _one_site_sweep_jit(As, Ws, vL, vR, num_krylov_vecs, boundary_envs,
                        qr_impl, ritz_impl, reorth=True, matvec_prec=None,
                        lanczos_impl="xla", interpret=False,
                        epilogue_impl="xla", renvs=None):
    with jax.default_matmul_precision("highest"):
        return _one_site_sweep_impl(As, Ws, vL, vR, num_krylov_vecs,
                                    boundary_envs, qr_impl, ritz_impl,
                                    reorth, matvec_prec, lanczos_impl,
                                    interpret, epilogue_impl, renvs)


def _one_site_sweep_impl(As, Ws, vL, vR, num_krylov_vecs,
                         boundary_envs=None, qr_impl=None, ritz_impl=None,
                         reorth=True, matvec_prec=None,
                         lanczos_impl="xla", interpret=False,
                         epilogue_impl="xla", renvs=None):
    if ritz_impl is None:
        ritz_impl = RITZ_IMPL
    # Lanczos is precision-critical: bf16 MXU passes make the tridiagonal
    # projection non-variational (energies below the true ground state),
    # hence the forced float32 accumulation above.
    N, chi, d, _ = As.shape
    if renvs is None:
        As, Renvs = right_canonicalize_and_envs(
            As, Ws, vL, vR,
            R0=None if boundary_envs is None else boundary_envs[1],
            qr_impl=qr_impl, epilogue_impl=epilogue_impl,
            interpret=interpret)
    else:
        # sweep chaining: the previous sweep's reverse pass left the
        # stack right-canonical (center factor absorbed at site 0) and
        # produced exactly the environments the forward pass consumes.
        Renvs = renvs
    if boundary_envs is None:
        L0 = _boundary_left(chi, vL)
    else:
        L0 = boundary_envs[0]
    eye = jnp.eye(chi, dtype=As.dtype)

    def body_lr(carry, inputs):
        Lenv, Rm = carry
        A, W, Renv = inputs
        A = jnp.einsum("ab,bsc->asc", Rm, A)
        nrm = _norm_like(A)
        A = A / jnp.where(nrm > 0, nrm, 1.0)
        E0, A_opt = _local_solve_1s(Lenv, W, Renv, A, num_krylov_vecs,
                                    ritz_impl, reorth, matvec_prec,
                                    lanczos_impl, interpret)
        Q, Rm_new, Lenv_new = _gauge_env_left(
            Lenv, W, A_opt, qr_impl or _default_qr_impl(), epilogue_impl, interpret)
        return (Lenv_new, Rm_new), (Q, Lenv, E0)

    (_, Rm_last), (As1, Lenvs, Es_lr) = jax.lax.scan(
        body_lr, (L0, eye), (As, Ws, Renvs))

    if boundary_envs is None:
        R0 = _boundary_right(chi, vR)
    else:
        R0 = boundary_envs[1]

    def body_rl(carry, inputs):
        Renv, Lm = carry
        A, W, Lenv = inputs
        A = jnp.einsum("asb,bc->asc", A, Lm)
        nrm = _norm_like(A)
        A = A / jnp.where(nrm > 0, nrm, 1.0)
        E0, A_opt = _local_solve_1s(Lenv, W, Renv, A, num_krylov_vecs,
                                    ritz_impl, reorth, matvec_prec,
                                    lanczos_impl, interpret)
        Q, Lm_new, Renv_new = _gauge_env_right(
            Renv, W, A_opt, qr_impl or _default_qr_impl(), epilogue_impl, interpret)
        return (Renv_new, Lm_new), (Q, E0, Renv)

    # seed the reverse pass with the left-over center factor of the forward
    # pass, and re-absorb the final center factor into site 0 so the
    # returned stack represents the optimized state (not just its gauge).
    (_, Lm_last), (As2, Es_rl, Renvs_out) = jax.lax.scan(
        body_rl, (R0, Rm_last), (As1, Ws, Lenvs), reverse=True)
    As2 = As2.at[0].set(jnp.einsum("ab,bsc->asc", Lm_last, As2[0]))
    return SweepResult(As2, Es_rl[0], Es_rl,
                       jnp.zeros((), jnp.zeros((), As.dtype).real.dtype),
                       Renvs_out)


def two_site_sweep(
    As: Array, Ws: Array, vL: Array, vR: Array,
    num_krylov_vecs: int = 10,
    boundary_envs: Optional[Tuple[Array, Array]] = None,
    qr_impl: Optional[str] = None,
    ritz_impl: Optional[str] = None,
    reorth: bool = True,
    matvec_prec: Optional[str] = None,
    lanczos_impl: Optional[str] = None,
    trunc_impl: Optional[str] = None,
    trunc_iters: Optional[int] = None,
    trunc_orth: Optional[str] = None,
    trunc_polar_fast: Optional[Tuple[int, int]] = None,
    renvs: Optional[Array] = None,
) -> SweepResult:
    """One full two-site DMRG sweep (reference ``run_two_site``,
    ``dmrg.py:445``).  Bond truncation back to the static ``chi`` uses the
    masked SVD; the squared truncated weight is accumulated.
    ``boundary_envs``/``qr_impl``/``ritz_impl`` as in
    :func:`one_site_sweep`.

    ``renvs``: the previous sweep's ``SweepResult.renvs`` (shape
    (N-1, chi, M, chi)) — the reverse pass leaves the stack
    right-canonical with the center at site 0 and emits exactly the
    right environments the next forward pass consumes, so chaining
    skips the re-canonicalization prepass."""
    qr_impl = _default_qr_impl() if qr_impl is None else qr_impl
    ritz_impl = RITZ_IMPL if ritz_impl is None else ritz_impl
    matvec_prec = MATVEC_PRECISION if matvec_prec is None else matvec_prec
    if lanczos_impl is None:
        lanczos_impl = ("fused" if jax.default_backend() == "tpu"
                        else LANCZOS_IMPL)
    trunc_impl = TRUNC_IMPL if trunc_impl is None else trunc_impl
    trunc_iters = TRUNC_ITERS if trunc_iters is None else trunc_iters
    trunc_orth = TRUNC_ORTH if trunc_orth is None else trunc_orth
    interpret = jax.default_backend() != "tpu"
    return _two_site_sweep_jit(As, Ws, vL, vR, num_krylov_vecs,
                               boundary_envs, qr_impl, ritz_impl, reorth,
                               matvec_prec, lanczos_impl, interpret,
                               trunc_impl, trunc_iters, trunc_orth, renvs,
                               trunc_polar_fast)


@functools.partial(
    jax.jit,
    static_argnames=("num_krylov_vecs", "qr_impl", "ritz_impl", "reorth",
                     "matvec_prec", "lanczos_impl", "interpret",
                     "trunc_impl", "trunc_iters", "trunc_orth",
                     "trunc_polar_fast"))
def _two_site_sweep_jit(As, Ws, vL, vR, num_krylov_vecs, boundary_envs,
                        qr_impl, ritz_impl, reorth=True, matvec_prec=None,
                        lanczos_impl="xla", interpret=False,
                        trunc_impl="svd", trunc_iters=4, trunc_orth="qr",
                        renvs=None, trunc_polar_fast=None):
    with jax.default_matmul_precision("highest"):
        return _two_site_sweep_impl(As, Ws, vL, vR, num_krylov_vecs,
                                    boundary_envs, qr_impl, ritz_impl,
                                    reorth, matvec_prec, lanczos_impl,
                                    interpret, trunc_impl, trunc_iters,
                                    trunc_orth, renvs, trunc_polar_fast)


def _two_site_sweep_impl(As, Ws, vL, vR, num_krylov_vecs,
                         boundary_envs=None, qr_impl=None, ritz_impl=None,
                         reorth=True, matvec_prec=None,
                         lanczos_impl="xla", interpret=False,
                         trunc_impl="svd", trunc_iters=4, trunc_orth="qr",
                         renvs=None, trunc_polar_fast=None):
    if ritz_impl is None:
        ritz_impl = RITZ_IMPL
    N, chi, d, _ = As.shape
    if renvs is None:
        As, Renvs_full = right_canonicalize_and_envs(
            As, Ws, vL, vR,
            R0=None if boundary_envs is None else boundary_envs[1],
            qr_impl=qr_impl)
        step_renvs = Renvs_full[1:]
    else:
        # sweep chaining: the previous reverse pass left As2[1:]
        # right-canonical (truncation isometries), the center at site 0,
        # and emitted exactly these (N-1) bond-step environments.
        step_renvs = renvs
    if boundary_envs is None:
        L0 = _boundary_left(chi, vL)
    else:
        L0 = boundary_envs[0]
    real_dtype = jnp.zeros((), As.dtype).real.dtype

    # ---- left-to-right over bonds (0..N-2) ----
    def body_lr(carry, inputs):
        Lenv, pending, terr = carry
        A_next, W1, W2, Renv = inputs
        theta = jnp.einsum("asb,btc->astc", pending, A_next)
        nrm = _norm_like(theta)
        theta = theta / jnp.where(nrm > 0, nrm, 1.0)
        E0, th_opt = _local_solve_2s(Lenv, W1, W2, Renv, theta,
                                     num_krylov_vecs, ritz_impl, reorth,
                                     matvec_prec, lanczos_impl, interpret)
        th = th_opt.reshape(chi * d, d * chi)
        if trunc_impl == "subspace":
            st = subspace_truncate(th, chi,
                                   q0=pending.reshape(chi * d, chi),
                                   iters=trunc_iters, orth=trunc_orth,
                                   polar_fast=trunc_polar_fast)
            s_norm = _norm_like(st.rest)
            U = st.q.reshape(chi, d, chi)
            SV = (st.rest / jnp.where(s_norm > 0, s_norm, 1.0)
                  ).reshape(chi, d, chi)
            tsq = st.trunc_sq_norm
        else:
            res = svd_masked(th, max_singular_values=chi)
            s_norm = _norm_like(res.s)
            s = res.s / jnp.where(s_norm > 0, s_norm, 1.0)
            U = res.u.reshape(chi, d, chi)
            SV = (s[:, None] * res.vh).reshape(chi, d, chi)
            tsq = res.trunc_sq_norm
        Lenv_new = _update_left(Lenv, U, W1)
        terr = terr + tsq.astype(real_dtype)
        return (Lenv_new, SV, terr), (U, Lenv, E0)

    carry0 = (L0, As[0], jnp.zeros((), real_dtype))
    (Lenv_f, last, terr_lr), (Us, Lenvs, Es_lr) = jax.lax.scan(
        body_lr, carry0, (As[1:], Ws[:-1], Ws[1:], step_renvs))
    As1 = jnp.concatenate([Us, last[None]], axis=0)
    # left envs emitted at bond i correspond to site i; for the R->L pass we
    # need Lenvs[i] for bonds (i, i+1), i = N-2..0 — exactly Lenvs.

    if boundary_envs is None:
        R0 = _boundary_right(chi, vR)
    else:
        R0 = boundary_envs[1]

    def body_rl(carry, inputs):
        Renv, pending, terr = carry
        A_prev, W1, W2, Lenv = inputs
        theta = jnp.einsum("asb,btc->astc", A_prev, pending)
        nrm = _norm_like(theta)
        theta = theta / jnp.where(nrm > 0, nrm, 1.0)
        E0, th_opt = _local_solve_2s(Lenv, W1, W2, Renv, theta,
                                     num_krylov_vecs, ritz_impl, reorth,
                                     matvec_prec, lanczos_impl, interpret)
        th = th_opt.reshape(chi * d, d * chi)
        if trunc_impl == "subspace":
            st = subspace_truncate(th.T, chi,
                                   q0=pending.reshape(chi, d * chi).T,
                                   iters=trunc_iters, orth=trunc_orth,
                                   polar_fast=trunc_polar_fast)
            # th.T ~ q @ rest  =>  th ~ rest.T @ q.T = US @ V
            s_norm = _norm_like(st.rest)
            US = (st.rest.T / jnp.where(s_norm > 0, s_norm, 1.0)
                  ).reshape(chi, d, chi)
            V = st.q.T.reshape(chi, d, chi)
            tsq = st.trunc_sq_norm
        else:
            res = svd_masked(th, max_singular_values=chi)
            s_norm = _norm_like(res.s)
            s = res.s / jnp.where(s_norm > 0, s_norm, 1.0)
            US = (res.u * s[None, :]).reshape(chi, d, chi)
            V = res.vh.reshape(chi, d, chi)
            tsq = res.trunc_sq_norm
        Renv_new = _update_right(Renv, V, W2)
        terr = terr + tsq.astype(real_dtype)
        return (Renv_new, US, terr), (V, E0, Renv)

    carry0 = (R0, As1[-1], terr_lr)
    (_, first, terr), (Vs, Es_rl, Renvs_out) = jax.lax.scan(
        body_rl, carry0, (As1[:-1], Ws[:-1], Ws[1:], Lenvs), reverse=True)
    As2 = jnp.concatenate([first[None], Vs], axis=0)
    # Renvs_out[i] is the carry-in env at bond (i, i+1) — env of sites
    # > i+1 in the final gauge: exactly what the next forward pass's
    # bond step i consumes (sweep chaining via ``renvs=``).
    return SweepResult(As2, Es_rl[0], Es_rl, terr, Renvs_out)


def random_mps_stack(
    key, N: int, chi: int, d: int = 2, dtype=jnp.float64,
) -> Array:
    """Random uniform MPS stack (N, chi, d, chi)."""
    # divide by a python float, not a numpy f64 scalar — the latter
    # silently promotes f32 stacks to f64 under jax_enable_x64
    return (jax.random.normal(key, (N, chi, d, chi), dtype)
            / float(np.sqrt(chi * d)))


class FiniteDMRG:
    """Sweeping ground-state solver (reference ``FiniteDMRG``,
    ``dmrg.py:572``).

    Accepts either a stacked MPS array ``(N, chi, d, chi)`` or a
    :class:`~tensornetwork_tpu.models.mps.FiniteMPS` (converted to a
    uniform stack)."""

    def __init__(self, mps, mpo: MPO):
        if hasattr(mps, "to_stack"):
            self._mps_obj = mps
            self.As = mps.to_stack()
        else:
            self._mps_obj = None
            self.As = jnp.asarray(mps)
        self.mpo = mpo
        if self.As.shape[0] != mpo.num_sites:
            raise ValueError(
                f"MPS has {self.As.shape[0]} sites but MPO has "
                f"{mpo.num_sites}")
        if self.As.shape[2] != mpo.phys_dim:
            raise ValueError(
                f"MPS physical dimension {self.As.shape[2]} != MPO "
                f"physical dimension {mpo.phys_dim}")
        self.energies: list = []
        self.truncation_errors: list = []

    def _run(self, sweep_fn, num_sweeps, num_krylov_vecs, tol, verbose):
        e_prev = None
        renvs = None
        # sweep chaining (see SweepResult.renvs); both sweep kinds emit
        # the env stack their own next forward pass consumes
        chain = sweep_fn in (one_site_sweep, two_site_sweep)
        for sweep in range(num_sweeps):
            kw = {"renvs": renvs} if chain else {}
            res = sweep_fn(self.As, self.mpo.Ws, self.mpo.vL, self.mpo.vR,
                           num_krylov_vecs=num_krylov_vecs, **kw)
            renvs = res.renvs
            self.As = res.As
            e = float(res.energy)
            self.energies.append(e)
            self.truncation_errors.append(float(res.trunc_err))
            if verbose > 0:
                print(f"sweep {sweep}: E = {e:.12f}")
            if e_prev is not None and abs(e - e_prev) < tol:
                break
            e_prev = e
        if self._mps_obj is not None:
            self._mps_obj.from_stack(self.As)
        return self.energies[-1]

    def run_one_site(self, num_sweeps: int = 4, num_krylov_vecs: int = 10,
                     tol: float = 1e-10, verbose: int = 0) -> float:
        """Run one-site DMRG; returns the converged energy."""
        return self._run(one_site_sweep, num_sweeps, num_krylov_vecs, tol,
                         verbose)

    def run_two_site(self, num_sweeps: int = 4, num_krylov_vecs: int = 10,
                     tol: float = 1e-10, verbose: int = 0) -> float:
        """Run two-site DMRG with truncation back to the MPS bond dim."""
        return self._run(two_site_sweep, num_sweeps, num_krylov_vecs, tol,
                         verbose)

    def compute_energy(self) -> float:
        """<psi|H|psi>/<psi|psi> of the current state (reference
        ``compute_energy``, ``dmrg.py:561``)."""
        return float(mps_mpo_expectation(
            self.As, self.mpo.Ws, self.mpo.vL, self.mpo.vR))


@jax.jit
def mps_mpo_expectation(As: Array, Ws: Array, vL: Array, vR: Array) -> Array:
    """<psi|H|psi>/<psi|psi> on uniform stacks (identity boundary envs)."""
    with jax.default_matmul_precision("highest"):
        return _mps_mpo_expectation_impl(As, Ws, vL, vR)


def _mps_mpo_expectation_impl(As, Ws, vL, vR):
    N, chi, d, _ = As.shape
    L = _boundary_left(chi, vL)

    def body(L, inputs):
        A, W = inputs
        return _update_left(L, A, W), None

    L, _ = jax.lax.scan(body, L, (As, Ws))
    num = jnp.einsum("awc,ac,w->", L, jnp.eye(chi, dtype=As.dtype), vR)

    n0 = jnp.eye(chi, dtype=As.dtype)

    def nbody(nL, A):
        return jnp.einsum("ac,atr,ctp->rp", nL, A, jnp.conj(A),
                          optimize="auto"), None

    nL, _ = jax.lax.scan(nbody, n0, As)
    den = jnp.trace(nL)
    return num / den
