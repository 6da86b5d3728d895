"""Single VMEM admission model for every Pallas kernel tier.

VERDICT r4 item 3: scoped-VMEM budgets used to live in three places (a
14 MB constant in the streamed planner, 12 MB paired gates in
``parallel/batch``, per-kernel empirical pins) and the decisions were
wrong twice in round 4 — the two-site resident gate estimated chi^2
where the kernel holds nt = d^2 tiles (single-instance 2s chi=128 OOMed
at 23.08 MB scoped while the estimate said 3 MB), and the paired route
gated on ``B % 4 == 0`` alone and died in an 11-minute doomed compile
at chi=512.  This module is now the ONLY authority: sweep routing
(``models/dmrg``, ``models/tdvp``, ``models/vumps``,
``parallel/batch``) and the streamed planners consult these functions,
and ``tests/test_vmem_model.py`` asserts every admit/reject against the
measured-compile outcomes recorded in BASELINE.md.

The model is analytic where measurement supports it and
calibrated-empirical where remote Mosaic's allocator defies the
analytic estimate.  Measured anchors (TPU v5e, 2026-08-21, BASELINE.md):

* nt<=2 resident kernels track the analytic count: 1s chi=256
  (10.5 MB incl. the M*nt stage-1 intermediate) compiles; chi=512
  (44.6 MB) and the chi=512 two-pass plan (18.9 MB) fail.
* nt=4 resident kernels allocate ~6.4x the analytic count: 2s chi=128
  m=6 OOMs at 23.08 MB scoped vs 3.63 MB analytic; 2s chi=64 pair=2
  compiles while pair=4 OOMs — all reproduced by one inflation
  constant against the 16 MB physical limit.
* The streamed (chi-chunked) planner budget is 14 MB: the chi=512 K=4
  plan (15.7 MB nominal) fails remote Mosaic while K=8 (13.6 MB)
  compiles and validates exactly.
* The doubly-chunked matvec planner is conservative AND optimistic in
  places — (16, 4) at chi=1024 estimates 17.4 MB yet compiles, (2, 2)
  at chi=512 nt=4 estimates 16.5 MB and fails — so flagship shapes
  carry on-chip measured plans (``MEASURED_MATVEC_PLANS``).
"""
from typing import Optional, Tuple

VMEM_LIMIT_BYTES = 16 * 2**20
"""Physical per-core VMEM class on TPU v5e."""

RESIDENT_BUDGET_BYTES = 12 * 2**20
"""Measured-safe scoped budget for nt<=2 resident-recurrence kernels
(margin below the 16 MB physical limit absorbs Mosaic's double
buffering of the basis output between grid programs)."""

MOSAIC_NT4_INFLATION = 6.36
"""Measured scoped/analytic ratio for nt>=4 resident kernels: the
two-site kernel at chi=128, M=3, m=6 reported 23.08 MB scoped against
a 3.63 MB analytic count (BASELINE.md round-4 two-site ladder).  The
inflation comes from Mosaic's live-range handling of the unrolled
physical-tile loops, so it is applied to every nt>=4 admission."""

STREAMED_BUDGET_BYTES = 14_000_000
"""Calibrated budget for the chi-chunked streamed Lanczos planner and
the doubly-chunked matvec planner (chi=512 K=4 at 15.7 MB nominal
fails remote Mosaic; K=8 at 13.6 MB passes)."""

MEASURED_MATVEC_PLANS = {
    (512, 4, 3): (8, 2),     # 2-site chi=512: 4.5 TF matvec, on-chip sweep
    (1024, 2, 3): (16, 4),   # 1-site chi=1024: 12.3 TF, 16% over model pick
}
"""On-chip measured (K, K2) plans for :func:`streamed_matvec_plan`
(TPU v5e plan sweep, 2026-08-21) — measurements override the cost
model where we have them."""


def resident_lanczos_bytes(chi: int, nt: int, M: int, m: int,
                           pair: int = 1) -> int:
    """Analytic scoped-VMEM footprint of the resident whole-Lanczos
    kernel family (``ops.kernels.make_fused_lanczos`` and its 2s / expm
    / realified-SC wrappers) in bytes.

    Per instance, in (chi, chi) f32 tiles: L + R inputs (2M), the
    m-row Krylov basis (m*nt), the state + three recurrence vectors
    (4*nt), and the stage-1 intermediate P[w][t] (M*nt).
    """
    tiles = pair * (2 * M + nt * (m + 4 + M))
    return 4 * chi * chi * tiles


def admit_resident_lanczos(chi: int, nt: int, M: int, m: int,
                           pair: int = 1) -> bool:
    """Admission for the resident whole-Lanczos kernel family.

    nt<=2 families compare the analytic count against the 12 MB
    measured-safe budget; nt>=4 families apply the measured Mosaic
    inflation against the physical limit (see module docstring)."""
    raw = resident_lanczos_bytes(chi, nt, M, m, pair)
    if nt <= 2:
        return raw <= RESIDENT_BUDGET_BYTES
    return raw * MOSAIC_NT4_INFLATION <= VMEM_LIMIT_BYTES


def two_pass_lanczos_bytes(chi: int, nt: int, M: int) -> int:
    """Two-pass (no basis storage) resident kernel: L, R and ~6 working
    tiles per physical index; m-independent."""
    return 4 * chi * chi * (2 * M + 6 * nt)


def admit_two_pass_lanczos(chi: int, nt: int, M: int) -> bool:
    return two_pass_lanczos_bytes(chi, nt, M) <= RESIDENT_BUDGET_BYTES


def gauge_epilogue_bytes(chi: int, d: int, M: int) -> int:
    """Fused polar-gauge + env-growth epilogue kernel
    (``ops.kernels.fused_gauge_env_*``): L/R env (2M), the site and NS
    iterates (~4d), and the env-growth intermediates (2Md)."""
    return 4 * chi * chi * (2 * M + 4 * d + 2 * M * d)


def admit_gauge_epilogue(chi: int, d: int, M: int) -> bool:
    return gauge_epilogue_bytes(chi, d, M) <= RESIDENT_BUDGET_BYTES


def streamed_chunk_count(chi: int, d: int, M: int,
                         budget_bytes: Optional[int] = None
                         ) -> Optional[int]:
    """Smallest power-of-two chunk count K (dividing chi, chunks >= 64
    rows) for which the chi-chunked streamed Lanczos kernel's VMEM plan
    fits the calibrated budget; None if no admissible K exists (the
    doubly-chunked matvec tier or TP sharding own that regime)."""
    if budget_bytes is None:
        budget_bytes = STREAMED_BUDGET_BYTES
    tile = 4 * chi * chi
    K = 2
    while K <= max(chi // 64, 1):
        if chi % K == 0:
            resident = tile * (M + d + 3 * d)          # Rt + x0 + v/vp/w
            chunked = tile * (2 * M + M * d + 2 * d) // K  # L(2x), P, Vout
            if resident + chunked <= budget_bytes:
                return K
        K *= 2
    return None


def streamed_matvec_plan(chi: int, nt: int, M: int,
                         budget_bytes: Optional[int] = None
                         ) -> Optional[Tuple[int, int]]:
    """(K, K2) chunk counts for the doubly-chunked streamed matvec
    kernel (``ops.kernels.make_streamed_matvec``), preferring the
    largest chunks (small K, then small K2 — bigger GEMMs keep the MXU
    full); None if nothing fits.  Mosaic constrains the LAST block dim
    to multiples of 128 (column chunks ds >= 128) and the
    second-to-last to multiples of 8 (row chunks cs >= 32 kept for MXU
    efficiency).  Flagship shapes return their on-chip measured plans
    (:data:`MEASURED_MATVEC_PLANS`)."""
    if budget_bytes is None:
        budget_bytes = STREAMED_BUDGET_BYTES
        if (chi, nt, M) in MEASURED_MATVEC_PLANS:
            return MEASURED_MATVEC_PLANS[(chi, nt, M)]
    tile = 4 * chi * chi

    def vmem(K, K2):
        cs, ds = chi // K, chi // K2
        resident = tile * nt                       # x
        lc = 2 * M * cs * chi * 4                  # L chunks (dbl-buffered)
        rc = (2 if K2 > 1 else 1) * M * chi * ds * 4
        q = M * nt * cs * chi * 4
        yc = 2 * nt * cs * ds * 4
        return resident + lc + rc + q + yc

    K = 1
    while chi // K >= 32:
        if chi % K == 0:
            K2 = 1
            while chi // K2 >= 128:
                if chi % K2 == 0 and vmem(K, K2) <= budget_bytes:
                    return K, K2
                K2 *= 2
        K *= 2
    return None


def streamed_matvec_xl_plan(chi: int, nt: int, M: int,
                            budget_bytes: Optional[int] = None
                            ) -> Optional[Tuple[int, int, int]]:
    """(K, K3, K2) chunk counts for the three-level-chunked matvec
    (``ops.kernels.make_streamed_matvec_xl``) — the chi=1024 TWO-SITE
    tier, where the state x alone (nt*chi^2*4 = 16 MB) exceeds VMEM and
    no x-resident plan exists.  Streams x in contraction (a) chunks
    through kernel A and stages the coupling-folded Q through HBM.

    Mosaic alignment: kernel A's L block has last dim a-chunk
    (multiple of 128) and x's second-to-last is the a-chunk (covered);
    kernel B's R/x/y blocks have last dim d-chunk (multiple of 128);
    row chunks cs kept >= 32.  Prefers the largest chunks (small K,
    K3, K2) under the calibrated streamed budget per kernel."""
    if budget_bytes is None:
        budget_bytes = STREAMED_BUDGET_BYTES

    def vmem_a(cs, a):
        xb = 2 * nt * a * chi * 4          # x chunk (dbl-buffered)
        lb = 2 * M * cs * a * 4            # L chunk
        qb = M * nt * cs * chi * 4         # Q out block (revisited)
        return xb + lb + qb

    def vmem_b(cs, d):
        qb = 2 * M * nt * cs * chi * 4     # Q chunk (dbl-buffered)
        rb = 2 * M * chi * d * 4
        xb = nt * cs * d * 4
        yb = 2 * nt * cs * d * 4
        return qb + rb + xb + yb

    K = 1
    while chi // K >= 32:
        if chi % K:
            K *= 2
            continue
        cs = chi // K
        K3 = 1
        while chi // K3 >= 128:
            if chi % K3 == 0 and vmem_a(cs, chi // K3) <= budget_bytes:
                K2 = 1
                while chi // K2 >= 128:
                    if (chi % K2 == 0
                            and vmem_b(cs, chi // K2) <= budget_bytes):
                        return K, K3, K2
                    K2 *= 2
                break  # kernel A fits but no K2 fits: shrink cs
            K3 *= 2
        K *= 2
    return None
