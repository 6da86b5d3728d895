"""The single VMEM admission model (ops.vmem) vs every measured-compile
outcome recorded in BASELINE.md (VERDICT r4 item 3).

Each row below is a compile/run outcome measured on the real chip (TPU
v5e, remote Mosaic).  If one of these asserts starts failing, the model
was retuned away from a measured boundary — re-calibrate against the
hardware, don't relax the test.
"""
import pytest

from tensornetwork_tpu.ops import vmem


# (chi, nt, M, m, pair) -> admitted?, with the BASELINE.md evidence.
RESIDENT_OUTCOMES = [
    # --- one-site resident kernel (nt = d = 2) ---
    # B=256 chi=64 m=10 default route: compiles, 585 inst-sweeps/s.
    ((64, 2, 3, 10, 1), True),
    # chi=256 single instance: "measured-safe" (r2/r3 chi-scaling rows).
    ((256, 2, 3, 10, 1), True),
    # chi=512: never fit; falls to the streamed tier (r2 item 1).
    ((512, 2, 3, 10, 1), False),
    # paired one-site default: pair=4 at chi=64, 837 inst-sweeps/s.
    ((64, 2, 3, 10, 4), True),
    # pair=4 at chi=128 also admitted today (8.9 MB under the old gate).
    ((128, 2, 3, 10, 4), True),
    # B=4 chi=512 pair=4: 11-minute doomed compile, 40 MB scoped OOM.
    ((512, 2, 3, 10, 4), False),
    # --- two-site resident kernel (nt = d^2 = 4) ---
    # batched 2s chi=64 m=10: the only measured-safe 2s class.
    ((64, 4, 3, 10, 1), True),
    # paired 2s default: pair=2 at chi=64 m=6, 631 inst-sweeps/s.
    ((64, 4, 3, 6, 2), True),
    # pair=4 two-site: VMEM-OOM (the nt=d^2 basis doubles the footprint).
    ((64, 4, 3, 6, 4), False),
    # single-instance 2s chi=128 m=6: OOMed at 23.08 MB scoped (the old
    # chi^2 estimate said 3 MB and mis-routed it to the resident kernel).
    ((128, 4, 3, 6, 1), False),
]


@pytest.mark.parametrize("shape,admitted", RESIDENT_OUTCOMES)
def test_resident_admission_matches_measured_outcomes(shape, admitted):
    chi, nt, M, m, pair = shape
    assert vmem.admit_resident_lanczos(chi, nt, M, m, pair) is admitted


def test_resident_scoped_estimate_matches_measured_oom_report():
    # The one scoped-VMEM number Mosaic ever reported: 23.08 MB at the
    # 2s chi=128 m=6 OOM.  The calibrated estimate must reproduce it.
    est = (vmem.resident_lanczos_bytes(128, 4, 3, 6)
           * vmem.MOSAIC_NT4_INFLATION)
    assert est == pytest.approx(23.08 * 2**20, rel=0.02)


def test_resident_gate_scales_with_num_krylov_vecs():
    # ADVICE r4 (medium): the old empirical chi*d <= 128 gate ignored m;
    # a user-passed m ~ 40 at chi=64 must now fall through to the
    # streamed tier instead of hitting a doomed Mosaic compile.
    assert vmem.admit_resident_lanczos(64, 4, 3, 10) is True
    assert vmem.admit_resident_lanczos(64, 4, 3, 40) is False
    # paired two-site (ADVICE r4 low): pair=2 doubles the footprint.
    assert vmem.admit_resident_lanczos(64, 4, 3, 6, pair=2) is True
    assert vmem.admit_resident_lanczos(64, 4, 3, 20, pair=2) is False


def test_two_pass_admission():
    # chi=256 two-pass fits; chi=512 (18.9 MB, "over") does not.
    assert vmem.admit_two_pass_lanczos(256, 2, 3) is True
    assert vmem.admit_two_pass_lanczos(512, 2, 3) is False


def test_streamed_chunk_count_measured_boundary():
    # chi=512: the K=4 plan (15.7 MB nominal) fails remote Mosaic; K=8
    # (13.6 MB) compiles and validates exactly.
    assert vmem.streamed_chunk_count(512, 2, 3) == 8
    # chi=256 fits the resident tiers anyway but the streamed plan exists.
    assert vmem.streamed_chunk_count(256, 2, 3) is not None
    # chi=1024 one-site: no chi-chunked plan (doubly-chunked tier owns it).
    assert vmem.streamed_chunk_count(1024, 2, 3) is None


def test_streamed_matvec_measured_plans_pinned():
    # On-chip measured plans override the cost model ((16, 4) at
    # chi=1024 "17.4 MB" compiles; (2, 2) at chi=512 nt=4 "16.5 MB"
    # fails — the model alone cannot pick these).
    assert vmem.streamed_matvec_plan(512, 4, 3) == (8, 2)
    assert vmem.streamed_matvec_plan(1024, 2, 3) == (16, 4)
    # chi=256 two-site has an admissible (model-picked) plan.
    assert vmem.streamed_matvec_plan(256, 4, 3) is not None
    # chi=1024 TWO-site: x alone is 16 MB — no admissible plan anywhere
    # in the single-chip kernel ladder (TP territory).
    assert vmem.streamed_matvec_plan(1024, 4, 3) is None


def test_kernels_module_delegates_to_vmem():
    from tensornetwork_tpu.ops import kernels
    assert kernels.streamed_chunk_count(512, 2, 3) == \
        vmem.streamed_chunk_count(512, 2, 3)
    assert kernels.streamed_matvec_plan(512, 4, 3) == \
        vmem.streamed_matvec_plan(512, 4, 3)


def test_no_raw_vmem_constants_in_routing_code():
    # VERDICT r4 item 3 "done" criterion: no raw VMEM budget constants
    # left in sweep routing code — ops/vmem.py is the only authority.
    import pathlib
    import tensornetwork_tpu
    pkg = pathlib.Path(tensornetwork_tpu.__file__).parent
    offenders = []
    for f in pkg.rglob("*.py"):
        if f.name == "vmem.py":
            continue
        text = f.read_text()
        if "12 * 2**20" in text or "14_000_000" in text:
            offenders.append(str(f))
    assert offenders == []


def test_xl_plan_model_matches_chip_sweep():
    """Round-5 on-chip XL plan sweep (benchmarks/xl_plan_sweep.py,
    chi=1024 nt=4 M=3): every plan that failed remote Mosaic is one the
    cost model rejects, every plan that compiled is admitted, and the
    model's pick (16, 4, 4) was the measured-fastest (3.35 ms)."""
    budget = vmem.STREAMED_BUDGET_BYTES
    chi, nt, M = 1024, 4, 3

    def admit(K, K3, K2):
        cs, a, d = chi // K, chi // K3, chi // K2
        va = (2 * nt * a * chi * 4 + 2 * M * cs * a * 4
              + M * nt * cs * chi * 4)
        vb = (2 * M * nt * cs * chi * 4 + 2 * M * chi * d * 4
              + nt * cs * d * 4 + 2 * nt * cs * d * 4)
        return va <= budget and vb <= budget

    compiled = [(16, 4, 4), (16, 8, 4), (16, 4, 8), (16, 8, 8),
                (32, 4, 4), (32, 8, 8)]
    failed = [(8, 8, 8), (16, 2, 4), (8, 4, 8), (8, 8, 4)]
    for plan in compiled:
        assert admit(*plan), plan
    for plan in failed:
        assert not admit(*plan), plan
    # and the chooser returns the measured-fastest plan
    assert vmem.streamed_matvec_xl_plan(chi, nt, M) == (16, 4, 4)


def test_gauge_epilogue_admission_boundaries():
    # fused polar+env epilogue (opt-in): chi=64/128 class fits, chi=512
    # (2M + 4d + 2Md tiles = 26 MB) does not
    assert vmem.admit_gauge_epilogue(64, 2, 3) is True
    assert vmem.admit_gauge_epilogue(128, 2, 3) is True
    assert vmem.admit_gauge_epilogue(512, 2, 3) is False


def test_xl_plan_chooser_properties():
    # Mosaic alignment invariants of every returned plan
    for (chi, nt) in ((1024, 4), (512, 4), (2048, 4), (1024, 2)):
        plan = vmem.streamed_matvec_xl_plan(chi, nt, 3)
        assert plan is not None
        K, K3, K2 = plan
        assert chi % K == 0 and chi % K3 == 0 and chi % K2 == 0
        assert (chi // K3) % 128 == 0      # L block last dim
        assert (chi // K2) % 128 == 0      # R/x/y block last dim
        assert chi // K >= 32              # row chunks stay MXU-worthy


def test_streamed_and_xl_tiers_are_disjointly_ordered():
    # the two-site dispatch prefers the doubly-chunked tier and falls
    # through to XL only where no plan exists (chi=1024 nt=4)
    assert vmem.streamed_matvec_plan(512, 4, 3) is not None
    assert vmem.streamed_matvec_plan(1024, 4, 3) is None
    assert vmem.streamed_matvec_xl_plan(1024, 4, 3) is not None
