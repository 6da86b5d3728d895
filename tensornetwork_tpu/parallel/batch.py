"""Instance/batch parallelism (DP-analog) for DMRG and contractions.

The reference's only batching primitive is the ncon batch label
(reference ``ncon_interface.py:280-354``); everything else is serial.
Here: thousands of independent network instances (disorder realizations,
coupling scans) are stacked on a leading axis, ``vmap``-ed through the
compiled sweep, and the batch axis is sharded across the mesh with
``NamedSharding`` — XLA turns the per-instance Lanczos/QR/contraction into
large batched MXU ops and inserts no cross-instance communication.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from tensornetwork_tpu.models import dmrg as _dmrg
from tensornetwork_tpu.models.mpo import MPO
from tensornetwork_tpu.parallel.mesh import batch_spec, make_mesh
from jax.sharding import NamedSharding, PartitionSpec as P


def batched_one_site_sweep(As_batch, Ws, vL, vR, num_krylov_vecs: int = 10,
                           qr_impl: str = "polar",
                           ritz_impl: str = "power",
                           reorth: bool = False,
                           matvec_prec=None,
                           lanczos_impl=None,
                           epilogue_impl=None,
                           renvs=None,
                           paired: Optional[bool] = None):
    """One-site DMRG sweep over a batch of MPS instances.

    ``As_batch``: (B, N, chi, d, chi); MPO shared across the batch.
    Returns a batched :class:`~tensornetwork_tpu.models.dmrg.SweepResult`.

    ``paired`` selects the paired-kernel route (4 instances per fused
    Pallas program, phased issue — the fastest measured route on TPU):
    ``None`` auto-routes to it on TPU when the default knob combination
    allows and ``B % 4 == 0`` (so adjacent batch sizes such as 252 vs
    256 can run different — floor-equivalent at the measured shapes —
    kernels; pass an explicit value for apples-to-apples comparisons
    across batch sizes), ``True`` forces it (raises if ``B % 4``),
    ``False`` pins the unpaired vmap route.

    Unlike the single-instance sweep, the *batched* default is the
    matmul-only pipeline (``qr_impl="polar"``, ``ritz_impl="power"``):
    batched Householder QR and batched tiny eigh serialize on TPU, and
    the measured difference is large (TPU v5e, TFI N=32: chi=64 B=256
    353 vs 191 inst-sweeps/s; chi=128 B=64 106 vs 74).  Pass
    ``qr_impl="householder", ritz_impl="eigh"`` for bit-parity with the
    single-instance path.  ``reorth=False`` (batched default) runs the
    plain three-term Lanczos recurrence — at m~10 with warm starts the
    energies stay at the f32 floor and the sweep is ~15% faster (434 vs
    378 inst-sweeps/s at chi=64 B=256); pass True for the fully
    reorthogonalized basis.
    All three impl knobs are resolved at call time (outside jit), so the
    compile cache keys on them.
    """
    matvec_prec = (_dmrg.MATVEC_PRECISION if matvec_prec is None
                   else matvec_prec)
    if lanczos_impl is None:
        # Batched TPU default: the fused Pallas whole-Lanczos kernel —
        # 585 vs 434 inst-sweeps/s at B=256 chi=64 (TPU v5e, identical
        # mean converged energy).  Off-TPU the kernel would run in slow
        # interpret mode, so fall back to the module default.
        lanczos_impl = ("fused" if jax.default_backend() == "tpu"
                        else _dmrg.LANCZOS_IMPL)
    if epilogue_impl is None:
        epilogue_impl = _dmrg.EPILOGUE_IMPL
    # Batched TPU default route: the PAIRED sweep packs 4 instances per
    # fused-Lanczos program (phased in-program GEMM issue).  On-chip A/B
    # (B=256 chi=64 m=10, 2026-08-21): 678 -> 837 inst-sweeps/s at an
    # identical +2.3e-5 floor.  Engages only for the default knob
    # combination the paired path implements.
    route_ok = (jax.default_backend() == "tpu" and lanczos_impl == "fused"
                and not reorth and matvec_prec is None
                and epilogue_impl == "xla")
    # the paired kernel is the tier-1 RESIDENT kernel with `pair`
    # instances per program: its VMEM footprint is pair x the tier-1
    # estimate.  Admission via the single VMEM authority (ops.vmem,
    # VERDICT r4 item 3).  Without this gate, B=4 chi=512 routed here
    # and died in an 11-minute compile ending in a 40 MB scoped-vmem
    # OOM (measured 2026-08-21) instead of falling through to the
    # streamed tier.
    from tensornetwork_tpu.ops import vmem
    _, _, chi_b, d_b, _ = As_batch.shape
    pair_fits = vmem.admit_resident_lanczos(
        chi_b, d_b, Ws.shape[1], num_krylov_vecs, pair=4)
    if paired is True and not route_ok:
        raise ValueError(
            "paired=True requires the TPU fused-kernel default route "
            "(lanczos_impl='fused', reorth=False, matvec_prec=None, "
            "epilogue_impl='xla')")
    if paired is True and not pair_fits:
        raise ValueError(
            f"paired=True: 4 instances per program exceed the scoped-"
            f"VMEM budget (ops.vmem.admit_resident_lanczos) at "
            f"chi={chi_b}; use the streamed tier (paired=False)")
    if paired is True or (paired is None and route_ok and pair_fits
                          and As_batch.shape[0] % 4 == 0):
        return batched_one_site_sweep_paired(
            As_batch, Ws, vL, vR, num_krylov_vecs=num_krylov_vecs,
            qr_impl=qr_impl, ritz_impl=ritz_impl, pair=4, renvs=renvs)
    return _batched_one_site_jit(As_batch, Ws, vL, vR, num_krylov_vecs,
                                 qr_impl, ritz_impl, reorth, matvec_prec,
                                 lanczos_impl, epilogue_impl, renvs)


@functools.partial(
    jax.jit,
    static_argnames=("num_krylov_vecs", "qr_impl", "ritz_impl", "reorth",
                     "matvec_prec", "lanczos_impl", "epilogue_impl"))
def _batched_one_site_jit(As_batch, Ws, vL, vR, num_krylov_vecs,
                          qr_impl, ritz_impl, reorth=False,
                          matvec_prec=None, lanczos_impl="xla",
                          epilogue_impl="xla", renvs=None):
    if renvs is None:
        fn = lambda As: _dmrg.one_site_sweep(
            As, Ws, vL, vR, num_krylov_vecs=num_krylov_vecs,
            qr_impl=qr_impl, ritz_impl=ritz_impl, reorth=reorth,
            matvec_prec=matvec_prec, lanczos_impl=lanczos_impl,
            epilogue_impl=epilogue_impl)
        return jax.vmap(fn)(As_batch)
    fn = lambda As, rv: _dmrg.one_site_sweep(
        As, Ws, vL, vR, num_krylov_vecs=num_krylov_vecs,
        qr_impl=qr_impl, ritz_impl=ritz_impl, reorth=reorth,
        matvec_prec=matvec_prec, lanczos_impl=lanczos_impl,
        epilogue_impl=epilogue_impl, renvs=rv)
    return jax.vmap(fn)(As_batch, renvs)


def batched_one_site_sweep_multi_mpo(As_batch, Ws_batch, vL, vR,
                                     num_krylov_vecs: int = 10,
                                     qr_impl: str = "polar",
                                     ritz_impl: str = "power"):
    """Batch over both MPS instances and MPO realizations (disorder).
    Batched-default impls as in :func:`batched_one_site_sweep`."""
    return _batched_multi_mpo_jit(As_batch, Ws_batch, vL, vR,
                                  num_krylov_vecs, qr_impl, ritz_impl)


@functools.partial(
    jax.jit, static_argnames=("num_krylov_vecs", "qr_impl", "ritz_impl"))
def _batched_multi_mpo_jit(As_batch, Ws_batch, vL, vR, num_krylov_vecs,
                           qr_impl, ritz_impl):
    fn = lambda As, Ws: _dmrg.one_site_sweep(
        As, Ws, vL, vR, num_krylov_vecs=num_krylov_vecs,
        qr_impl=qr_impl, ritz_impl=ritz_impl)
    return jax.vmap(fn)(As_batch, Ws_batch)


def batched_two_site_sweep(As_batch, Ws, vL, vR, num_krylov_vecs: int = 10,
                           qr_impl: str = "polar",
                           ritz_impl: str = "power",
                           reorth: bool = False,
                           lanczos_impl=None,
                           trunc_impl=None,
                           trunc_iters=None,
                           trunc_orth=None,
                           trunc_polar_fast=None,
                           renvs=None):
    """Two-site batched sweep; batched-default impls as in
    :func:`batched_one_site_sweep` (incl. the fused Pallas Lanczos on
    TPU).  Bond truncation defaults to the matmul-only subspace
    iteration on TPU — the batched (B,128,128) SVD serializes (218 ms
    per call = 13.5 s per B=256 chi=64 sweep); pass
    ``trunc_impl="svd"`` for exact reference SVD semantics.
    ``renvs``: previous result's ``.renvs`` — skips the
    re-canonicalization prepass (sweep chaining)."""
    if lanczos_impl is None:
        lanczos_impl = ("fused" if jax.default_backend() == "tpu"
                        else _dmrg.LANCZOS_IMPL)
    if trunc_impl is None:
        trunc_impl = ("subspace" if jax.default_backend() == "tpu"
                      else _dmrg.TRUNC_IMPL)
    if trunc_iters is None:
        # batched-TPU default: 2 warm-started subspace iterations.
        # On-chip A/B (B=256 chi=64 N=32, 2026-08-21): iters=2 matches
        # or beats the iters=4 floor at every m (m=10: -1.17e-5 vs
        # -1.69e-5) and is ~20% faster; iters=1 leaks truncation weight
        # (floor +3.2e-4) — see BASELINE.md two-site table.
        trunc_iters = (2 if jax.default_backend() == "tpu"
                       else _dmrg.TRUNC_ITERS)
    if trunc_orth is None:
        # batched-TPU default: NS-polar orthonormalization at every
        # subspace iteration.  Measured on chip (B=256 chi=64 N=32 m=10,
        # 2026-08-20): 328 inst-sweeps/s at a -1.7e-5 mean energy floor
        # vs 131 / -1.0e-4 for Householder ("qr") — the polar factor's
        # bounded conditioning also filters the rare fused-Lanczos
        # breakdown transients that "qr"/"polar+qr" faithfully keep.
        trunc_orth = ("polar" if jax.default_backend() == "tpu"
                      else _dmrg.TRUNC_ORTH)
    # Paired default route (see batched_one_site_sweep): 2 instances per
    # fused two-site Lanczos program — 570 -> 631 inst-sweeps/s at an
    # identical -1.1e-5 floor (B=256 chi=64 m=6, 2026-08-21).  pair=4
    # overflows scoped VMEM (the nt=d^2 basis doubles the footprint).
    # Admission via the single VMEM authority (ops.vmem): the 2s
    # kernel's nt = d^2 tiles carry the measured ~6.4x Mosaic
    # inflation, and the gate scales with num_krylov_vecs (ADVICE r4 —
    # a user-passed large m no longer auto-routes into a doomed
    # compile); inadmissible shapes fall through to the unpaired path
    # and its streamed tier.
    from tensornetwork_tpu.ops import vmem
    _, _, chi_b, d_b, _ = As_batch.shape
    if (jax.default_backend() == "tpu" and lanczos_impl == "fused"
            and not reorth and trunc_impl == "subspace"
            and trunc_orth == "polar" and trunc_polar_fast is None
            and vmem.admit_resident_lanczos(
                chi_b, d_b * d_b, Ws.shape[1], num_krylov_vecs, pair=2)
            and As_batch.shape[0] % 2 == 0):
        return batched_two_site_sweep_paired(
            As_batch, Ws, vL, vR, num_krylov_vecs=num_krylov_vecs,
            qr_impl=qr_impl, ritz_impl=ritz_impl,
            trunc_iters=trunc_iters, trunc_orth=trunc_orth, pair=2,
            renvs=renvs)
    return _batched_two_site_jit(As_batch, Ws, vL, vR, num_krylov_vecs,
                                 qr_impl, ritz_impl, reorth, lanczos_impl,
                                 trunc_impl, trunc_iters, trunc_orth,
                                 trunc_polar_fast, renvs)


@functools.partial(
    jax.jit,
    static_argnames=("num_krylov_vecs", "qr_impl", "ritz_impl", "reorth",
                     "lanczos_impl", "trunc_impl", "trunc_iters",
                     "trunc_orth", "trunc_polar_fast"))
def _batched_two_site_jit(As_batch, Ws, vL, vR, num_krylov_vecs,
                          qr_impl, ritz_impl, reorth=False,
                          lanczos_impl="xla", trunc_impl="svd",
                          trunc_iters=4, trunc_orth="qr",
                          trunc_polar_fast=None, renvs=None):
    if renvs is None:
        fn = lambda As: _dmrg.two_site_sweep(
            As, Ws, vL, vR, num_krylov_vecs=num_krylov_vecs,
            qr_impl=qr_impl, ritz_impl=ritz_impl, reorth=reorth,
            lanczos_impl=lanczos_impl, trunc_impl=trunc_impl,
            trunc_iters=trunc_iters, trunc_orth=trunc_orth,
            trunc_polar_fast=trunc_polar_fast)
        return jax.vmap(fn)(As_batch)
    fn = lambda As, rv: _dmrg.two_site_sweep(
        As, Ws, vL, vR, num_krylov_vecs=num_krylov_vecs,
        qr_impl=qr_impl, ritz_impl=ritz_impl, reorth=reorth,
        lanczos_impl=lanczos_impl, trunc_impl=trunc_impl,
        trunc_iters=trunc_iters, trunc_orth=trunc_orth,
        trunc_polar_fast=trunc_polar_fast, renvs=rv)
    return jax.vmap(fn)(As_batch, renvs)


class BatchedDMRG:
    """Ground-state search over many instances at once, sharded on a mesh.

    This is the χ=1024 × 1k-realizations configuration of BASELINE.md run
    the TPU way: instances ride the ``data`` mesh axis; the reference runs
    them serially in Python.
    """

    def __init__(self, As_batch, mpo: MPO, mesh=None,
                 batch_axis: str = "data"):
        self.mesh = mesh
        if mesh is not None:
            As_batch = jax.device_put(
                As_batch, batch_spec(mesh, batch_axis, As_batch.ndim))
            ws_sharding = NamedSharding(mesh, P())
            mpo = MPO(jax.device_put(mpo.Ws, ws_sharding),
                      jax.device_put(mpo.vL, ws_sharding),
                      jax.device_put(mpo.vR, ws_sharding))
        self.As = As_batch
        self.mpo = mpo
        self.energies = None

    def run_one_site(self, num_sweeps: int = 4,
                     num_krylov_vecs: int = 10) -> jax.Array:
        """Returns per-instance energies (B,)."""
        renvs = None
        for _ in range(num_sweeps):
            res = batched_one_site_sweep(
                self.As, self.mpo.Ws, self.mpo.vL, self.mpo.vR,
                num_krylov_vecs=num_krylov_vecs, renvs=renvs)
            self.As = res.As
            self.energies = res.energy
            renvs = res.renvs
        return self.energies

    def run_two_site(self, num_sweeps: int = 4,
                     num_krylov_vecs: int = 10) -> jax.Array:
        renvs = None
        for _ in range(num_sweeps):
            res = batched_two_site_sweep(
                self.As, self.mpo.Ws, self.mpo.vL, self.mpo.vR,
                num_krylov_vecs=num_krylov_vecs, renvs=renvs)
            self.As = res.As
            self.energies = res.energy
            renvs = res.renvs
        return self.energies


def batched_tdvp_one_site_sweep_sc(As_batch, Ws, vL, vR, dt,
                                   num_krylov_vecs: int = 10,
                                   lanczos_impl=None):
    """One real-time TDVP sweep over a batch of split-complex MPS
    instances — e.g. many quantum quenches evolved in parallel on one
    chip (no analog in the reference, which has no time evolution and
    no complex-on-real-backend support).

    ``As_batch``: SC of shape (B, N, chi, d, chi); shared real MPO.
    ``dt`` may be a scalar (shared) or a (B,) array of per-instance
    time steps.  Returns the evolved SC batch.
    """
    from tensornetwork_tpu.models.tdvp import tdvp_one_site_sweep_sc
    if lanczos_impl is None:
        lanczos_impl = ("fused" if jax.default_backend() == "tpu"
                        else "xla")
    dt = jnp.asarray(dt)
    dt_b = jnp.broadcast_to(dt, As_batch.re.shape[:1])
    return _batched_tdvp_sc_jit(As_batch, Ws, vL, vR, dt_b,
                                num_krylov_vecs, lanczos_impl)


@functools.partial(
    jax.jit, static_argnames=("num_krylov_vecs", "lanczos_impl"))
def _batched_tdvp_sc_jit(As_batch, Ws, vL, vR, dt_b, num_krylov_vecs,
                         lanczos_impl):
    from tensornetwork_tpu.models import tdvp as _tdvp
    interpret = jax.default_backend() != "tpu"

    def one(As, dt):
        with jax.default_matmul_precision("highest"):
            return _tdvp._tdvp_sweep_sc_impl(
                As, Ws, vL, vR, dt, num_krylov_vecs,
                None, lanczos_impl, interpret)

    return jax.vmap(one)(As_batch, dt_b)


# ---------------------------------------------------------------------------
# Paired batched sweep: tile_b instances per Pallas program
# ---------------------------------------------------------------------------


def _paired_one_site_sweep(As_p, Ws, vL, vR, num_krylov_vecs,
                           qr_impl, ritz_impl, interpret,
                           renvs_p=None):
    """One-site sweep over a small stacked *pair* of instances
    (P = leading axis), with the fused Lanczos kernel called directly on
    the pair (``tile_b=P``: phased in-program issue — each dependency
    step carries P instances of parallel GEMMs, measured 1.33x the
    per-program-single-instance kernel at chi=64 B=256, 2026-08-21).
    Everything else is the standard sweep vmapped over the pair axis.
    Mirrors :func:`tensornetwork_tpu.models.dmrg._one_site_sweep_impl`.
    """
    from tensornetwork_tpu.ops import kernels
    D = _dmrg
    P, N, chi, d, _ = As_p.shape

    if renvs_p is None:
        As_p, Renvs_p = jax.vmap(
            lambda A: D.right_canonicalize_and_envs(
                A, Ws, vL, vR, qr_impl=qr_impl))(As_p)
    else:
        Renvs_p = renvs_p
    # (P, N, ...) -> (N, P, ...) for the site scan
    As_s = jnp.swapaxes(As_p, 0, 1)
    Renvs_s = jnp.swapaxes(Renvs_p, 0, 1)
    L0 = jnp.broadcast_to(D._boundary_left(chi, vL)[None],
                          (P, chi, Ws.shape[1], chi))
    eye_p = jnp.broadcast_to(jnp.eye(chi, dtype=As_p.dtype)[None],
                             (P, chi, chi))

    def norm_p(A):
        n = jnp.sqrt(jnp.sum(A * A, axis=(1, 2, 3), keepdims=True))
        return A / jnp.where(n > 0, n, 1.0)

    def solve_p(Lenv, W, Renv, A):
        ev, evec = kernels.fused_lanczos_ground_state(
            Lenv, W, Renv, A, num_krylov_vecs=num_krylov_vecs,
            ritz_method=ritz_impl, interpret=interpret,
            precision=jax.lax.Precision.HIGHEST, tile_b=P)
        return ev, evec

    def body_lr(carry, inputs):
        Lenv, Rm = carry
        A, W, Renv = inputs
        A = norm_p(jnp.einsum("pab,pbsc->pasc", Rm, A))
        E0, A_opt = solve_p(Lenv, W, Renv, A)
        Q, Rm_new, Lenv_new = jax.vmap(
            lambda l, a: D._gauge_env_left(l, W, a, qr_impl, "xla",
                                           interpret))(Lenv, A_opt)
        return (Lenv_new, Rm_new), (Q, Lenv, E0)

    (_, Rm_last), (As1, Lenvs, Es_lr) = jax.lax.scan(
        body_lr, (L0, eye_p), (As_s, Ws, Renvs_s))

    R0 = jnp.broadcast_to(D._boundary_right(chi, vR)[None],
                          (P, chi, Ws.shape[1], chi))

    def body_rl(carry, inputs):
        Renv, Lm = carry
        A, W, Lenv = inputs
        A = norm_p(jnp.einsum("pasb,pbc->pasc", A, Lm))
        E0, A_opt = solve_p(Lenv, W, Renv, A)
        Q, Lm_new, Renv_new = jax.vmap(
            lambda r, a: D._gauge_env_right(r, W, a, qr_impl, "xla",
                                            interpret))(Renv, A_opt)
        return (Renv_new, Lm_new), (Q, E0, Renv)

    (_, Lm_last), (As2, Es_rl, Renvs_out) = jax.lax.scan(
        body_rl, (R0, Rm_last), (As1, Ws, Lenvs), reverse=True)
    As2 = As2.at[0].set(jnp.einsum("pab,pbsc->pasc", Lm_last, As2[0]))
    # (N, P, ...) -> (P, N, ...)
    return (jnp.swapaxes(As2, 0, 1), Es_rl[0],
            jnp.swapaxes(Renvs_out, 0, 1))


@functools.partial(
    jax.jit,
    static_argnames=("num_krylov_vecs", "qr_impl", "ritz_impl",
                     "interpret", "pair"))
def _batched_paired_one_site_jit(As_batch, Ws, vL, vR, num_krylov_vecs,
                                 qr_impl, ritz_impl, interpret, pair,
                                 renvs=None):
    B, N = As_batch.shape[0], As_batch.shape[1]
    As_pp = As_batch.reshape((B // pair, pair) + As_batch.shape[1:])
    rv_pp = (None if renvs is None
             else renvs.reshape((B // pair, pair) + renvs.shape[1:]))
    fn = lambda As_p, rv: _paired_one_site_sweep(
        As_p, Ws, vL, vR, num_krylov_vecs, qr_impl, ritz_impl,
        interpret, renvs_p=rv)
    # gauge/env precision is energy-critical: without forced-highest
    # matmuls the NS-polar span corrupts to a +2.8 floor (measured —
    # the same failure BASELINE.md's gauge precision A/B records)
    with jax.default_matmul_precision("highest"):
        if rv_pp is None:
            As2, es, rvs = jax.vmap(lambda a: fn(a, None))(As_pp)
        else:
            As2, es, rvs = jax.vmap(fn)(As_pp, rv_pp)
    from tensornetwork_tpu.models.dmrg import SweepResult
    return SweepResult(
        As2.reshape(As_batch.shape), es.reshape(B), es.reshape(B),
        jnp.zeros((), As_batch.dtype),
        rvs.reshape((B,) + rvs.shape[2:]))


def batched_one_site_sweep_paired(As_batch, Ws, vL, vR,
                                  num_krylov_vecs: int = 10,
                                  qr_impl: str = "polar",
                                  ritz_impl: str = "power",
                                  pair: int = 2,
                                  renvs=None):
    """Batched one-site sweep with ``pair`` instances per fused-Lanczos
    program (phased in-program issue; see :func:`_paired_one_site_sweep`).
    Semantics identical to :func:`batched_one_site_sweep` with the
    fused kernel, ``reorth=False``.  ``pair`` must divide the batch.
    For ONE-SITE, pair=4 is the measured sweet spot (678 -> 837
    inst-sweeps/s at B=256 chi=64; tile_b >= 8 fails Mosaic compile) and
    is what the auto-route passes; the pair=2 default here is the
    conservative choice that also matches the TWO-SITE sweet spot
    (pair=4 VMEM-OOMs there).
    """
    if As_batch.shape[0] % pair:
        raise ValueError(
            f"batch {As_batch.shape[0]} not divisible by pair={pair}")
    interpret = jax.default_backend() != "tpu"
    return _batched_paired_one_site_jit(
        As_batch, Ws, vL, vR, num_krylov_vecs, qr_impl, ritz_impl,
        interpret, pair, renvs)


def _paired_two_site_sweep(As_p, Ws, vL, vR, num_krylov_vecs,
                           qr_impl, ritz_impl, trunc_iters, trunc_orth,
                           interpret, renvs_p=None):
    """Two-site sweep over a stacked pair of instances (leading axis P)
    with the fused two-site Lanczos kernel called on the pair
    (``tile_b=P``) and the subspace truncation vmapped.  Mirrors
    :func:`tensornetwork_tpu.models.dmrg._two_site_sweep_impl` with
    ``trunc_impl="subspace"`` (the batched-TPU default)."""
    from tensornetwork_tpu.ops import kernels
    from tensornetwork_tpu.ops.decompositions import subspace_truncate
    D = _dmrg
    P, N, chi, d, _ = As_p.shape

    if renvs_p is None:
        As_p, Renvs_full = jax.vmap(
            lambda A: D.right_canonicalize_and_envs(
                A, Ws, vL, vR, qr_impl=qr_impl))(As_p)
        step_renvs = jnp.swapaxes(Renvs_full[:, 1:], 0, 1)
    else:
        step_renvs = jnp.swapaxes(renvs_p, 0, 1)
    As_s = jnp.swapaxes(As_p, 0, 1)                  # (N, P, ...)
    M = Ws.shape[1]
    L0 = jnp.broadcast_to(D._boundary_left(chi, vL)[None],
                          (P, chi, M, chi))
    real_dtype = jnp.zeros((), As_p.dtype).real.dtype

    def norm_p(th):
        n = jnp.sqrt(jnp.sum(th * th, axis=(1, 2, 3, 4), keepdims=True))
        return th / jnp.where(n > 0, n, 1.0)

    def trunc_p(th, q0):
        return jax.vmap(lambda t, q: subspace_truncate(
            t, chi, q0=q, iters=trunc_iters, orth=trunc_orth))(th, q0)

    def body_lr(carry, inputs):
        Lenv, pending, terr = carry
        A_next, W1, W2, Renv = inputs
        theta = norm_p(jnp.einsum("pasb,pbtc->pastc", pending, A_next))
        E0, th_opt = kernels.fused_lanczos_ground_state_2s(
            Lenv, W1, W2, Renv, theta,
            num_krylov_vecs=num_krylov_vecs, ritz_method=ritz_impl,
            interpret=interpret, precision=jax.lax.Precision.HIGHEST,
            tile_b=P)
        th = th_opt.reshape(P, chi * d, d * chi)
        st = trunc_p(th, pending.reshape(P, chi * d, chi))
        s_norm = jnp.sqrt(jnp.sum(st.rest * st.rest, axis=(1, 2),
                                  keepdims=True))
        U = st.q.reshape(P, chi, d, chi)
        SV = (st.rest / jnp.where(s_norm > 0, s_norm, 1.0)
              ).reshape(P, chi, d, chi)
        Lenv_new = jax.vmap(
            lambda l, u: D._update_left(l, u, W1))(Lenv, U)
        terr = terr + st.trunc_sq_norm.astype(real_dtype)
        return (Lenv_new, SV, terr), (U, Lenv, E0)

    carry0 = (L0, As_s[0], jnp.zeros((P,), real_dtype))
    (Lenv_f, last, terr_lr), (Us, Lenvs, Es_lr) = jax.lax.scan(
        body_lr, carry0, (As_s[1:], Ws[:-1], Ws[1:], step_renvs))
    As1 = jnp.concatenate([Us, last[None]], axis=0)

    R0 = jnp.broadcast_to(D._boundary_right(chi, vR)[None],
                          (P, chi, M, chi))

    def body_rl(carry, inputs):
        Renv, pending, terr = carry
        A_prev, W1, W2, Lenv = inputs
        theta = norm_p(jnp.einsum("pasb,pbtc->pastc", A_prev, pending))
        E0, th_opt = kernels.fused_lanczos_ground_state_2s(
            Lenv, W1, W2, Renv, theta,
            num_krylov_vecs=num_krylov_vecs, ritz_method=ritz_impl,
            interpret=interpret, precision=jax.lax.Precision.HIGHEST,
            tile_b=P)
        th = th_opt.reshape(P, chi * d, d * chi)
        tht = jnp.swapaxes(th, 1, 2)
        st = trunc_p(tht, jnp.swapaxes(
            pending.reshape(P, chi, d * chi), 1, 2))
        s_norm = jnp.sqrt(jnp.sum(st.rest * st.rest, axis=(1, 2),
                                  keepdims=True))
        US = jnp.swapaxes(st.rest / jnp.where(s_norm > 0, s_norm, 1.0),
                          1, 2).reshape(P, chi, d, chi)
        V = jnp.swapaxes(st.q, 1, 2).reshape(P, chi, d, chi)
        Renv_new = jax.vmap(
            lambda r, v: D._update_right(r, v, W2))(Renv, V)
        terr = terr + st.trunc_sq_norm.astype(real_dtype)
        return (Renv_new, US, terr), (V, E0, Renv)

    carry0 = (R0, As1[-1], terr_lr)
    (_, first, terr), (Vs, Es_rl, Renvs_out) = jax.lax.scan(
        body_rl, carry0, (As1[:-1], Ws[:-1], Ws[1:], Lenvs),
        reverse=True)
    As2 = jnp.concatenate([first[None], Vs], axis=0)
    return (jnp.swapaxes(As2, 0, 1), Es_rl[0], terr,
            jnp.swapaxes(Renvs_out, 0, 1))


@functools.partial(
    jax.jit,
    static_argnames=("num_krylov_vecs", "qr_impl", "ritz_impl",
                     "trunc_iters", "trunc_orth", "interpret", "pair"))
def _batched_paired_two_site_jit(As_batch, Ws, vL, vR, num_krylov_vecs,
                                 qr_impl, ritz_impl, trunc_iters,
                                 trunc_orth, interpret, pair,
                                 renvs=None):
    B = As_batch.shape[0]
    As_pp = As_batch.reshape((B // pair, pair) + As_batch.shape[1:])
    rv_pp = (None if renvs is None
             else renvs.reshape((B // pair, pair) + renvs.shape[1:]))
    fn = lambda As_p, rv: _paired_two_site_sweep(
        As_p, Ws, vL, vR, num_krylov_vecs, qr_impl, ritz_impl,
        trunc_iters, trunc_orth, interpret, renvs_p=rv)
    with jax.default_matmul_precision("highest"):
        if rv_pp is None:
            As2, es, terr, rvs = jax.vmap(lambda a: fn(a, None))(As_pp)
        else:
            As2, es, terr, rvs = jax.vmap(fn)(As_pp, rv_pp)
    from tensornetwork_tpu.models.dmrg import SweepResult
    return SweepResult(
        As2.reshape(As_batch.shape), es.reshape(B), es.reshape(B),
        terr.reshape(B), rvs.reshape((B,) + rvs.shape[2:]))


def batched_two_site_sweep_paired(As_batch, Ws, vL, vR,
                                  num_krylov_vecs: int = 10,
                                  qr_impl: str = "polar",
                                  ritz_impl: str = "power",
                                  trunc_iters: int = 2,
                                  trunc_orth: str = "polar",
                                  pair: int = 2,
                                  renvs=None):
    """Two-site batched sweep with ``pair`` instances per fused-Lanczos
    program (see :func:`batched_one_site_sweep_paired`); subspace/polar
    truncation only (the batched-TPU default)."""
    if As_batch.shape[0] % pair:
        raise ValueError(
            f"batch {As_batch.shape[0]} not divisible by pair={pair}")
    interpret = jax.default_backend() != "tpu"
    return _batched_paired_two_site_jit(
        As_batch, Ws, vL, vR, num_krylov_vecs, qr_impl, ritz_impl,
        trunc_iters, trunc_orth, interpret, pair, renvs)
