"""Pallas kernel tests (interpret mode on CPU; see the kernel module's
status note for compiled-mode findings)."""
import jax
import jax.numpy as jnp
import numpy as np

from tensornetwork_tpu.ops import kernels as K


def test_heff_matvec_kernel_matches_einsum(rng):
    B, chi, d, M = 8, 16, 2, 3
    L = jnp.asarray(rng.standard_normal((B, chi, M, chi)), jnp.float32)
    W = jnp.asarray(rng.standard_normal((M, M, d, d)), jnp.float32)
    R = jnp.asarray(rng.standard_normal((B, chi, M, chi)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((B, chi, d, chi)), jnp.float32)
    Lt, W_, Rt, xt = K.prepare_operands(L, W, R, x)
    f = K.make_heff_matvec(chi, d, M, tile_b=4, interpret=True)
    y = K.finalize_output(f(Lt, W_, Rt, xt))
    ref = K.heff_matvec_reference(L, W, R, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-3,
                               rtol=1e-3)


def test_heff_matvec_batch_validation(rng):
    f = K.make_heff_matvec(8, 2, 3, tile_b=4, interpret=True)
    L = jnp.zeros((6, 3, 8, 8), jnp.float32)  # 6 not divisible by 4
    W = jnp.zeros((3, 3, 2, 2), jnp.float32)
    import pytest
    with pytest.raises(ValueError):
        f(L, W, L, jnp.zeros((6, 2, 8, 8), jnp.float32))


def test_fused_lanczos_matches_xla_lanczos(rng):
    from tensornetwork_tpu.ops import krylov
    from tensornetwork_tpu.models import dmrg as D

    B, chi, d, M, m = 3, 16, 2, 3, 8
    L = jnp.asarray(rng.standard_normal((B, chi, M, chi)), jnp.float32)
    L = (L + L.transpose(0, 3, 2, 1)) / 2
    R = jnp.asarray(rng.standard_normal((B, chi, M, chi)), jnp.float32)
    R = (R + R.transpose(0, 3, 2, 1)) / 2
    W = jnp.asarray(rng.standard_normal((M, M, d, d)), jnp.float32)
    W = (W + W.transpose(1, 0, 3, 2)) / 2
    x = jnp.asarray(rng.standard_normal((B, chi, d, chi)), jnp.float32)

    def oracle(l, r, v):
        mv = lambda z: D._matvec_1s(l, W, r, z)
        return krylov.eigsh_lanczos(mv, v, num_krylov_vecs=m, numeig=1,
                                    ritz_method="power",
                                    reorthogonalize=False)

    ev_o, vec_o = jax.vmap(oracle)(L, R, x)
    ev_k, vec_k = K.fused_lanczos_ground_state(
        L, W, R, x, num_krylov_vecs=m, ritz_method="power",
        interpret=True)
    np.testing.assert_allclose(np.asarray(ev_k).ravel(),
                               np.asarray(ev_o).ravel(),
                               rtol=2e-5, atol=1e-3)
    vo, vk = np.asarray(vec_o)[:, 0], np.asarray(vec_k)
    for i in range(B):
        a, b = vo[i].ravel(), vk[i].ravel()
        sign = np.sign(np.dot(a, b))
        np.testing.assert_allclose(a, sign * b, atol=1e-4)


def test_fused_lanczos_breakdown_masking(rng):
    # start from an exact eigenvector of a diagonal operator: the
    # recurrence hits an invariant subspace at step 1; dead steps must
    # not corrupt the Ritz value (sentinels keep them out of the min).
    from tensornetwork_tpu.ops import krylov

    B, chi, d, M, m = 1, 8, 2, 1, 6
    # identity MPO couplings -> H = L (x) I (x) R acting diagonally
    W = jnp.eye(d, dtype=jnp.float32).reshape(1, 1, d, d)
    evals = jnp.arange(1.0, chi + 1.0, dtype=jnp.float32)
    L = jnp.diag(evals).reshape(1, chi, 1, chi)
    R = jnp.eye(chi, dtype=jnp.float32).reshape(1, chi, 1, chi)
    x = jnp.zeros((B, chi, d, chi), jnp.float32).at[0, 0, 0, 0].set(1.0)
    ev_k, vec_k = K.fused_lanczos_ground_state(
        L, W, R, x, num_krylov_vecs=m, ritz_method="eigh",
        interpret=True)
    # <x|H|x> = evals[0] * 1 = 1.0 and x is exactly an eigenvector
    np.testing.assert_allclose(np.asarray(ev_k)[0], 1.0, atol=1e-5)


def test_fused_lanczos_two_site_matches_xla(rng):
    from tensornetwork_tpu.ops import krylov
    from tensornetwork_tpu.models import dmrg as D

    B, chi, d, M, m = 2, 10, 2, 3, 8
    L = jnp.asarray(rng.standard_normal((B, chi, M, chi)), jnp.float32)
    L = (L + L.transpose(0, 3, 2, 1)) / 2
    R = jnp.asarray(rng.standard_normal((B, chi, M, chi)), jnp.float32)
    R = (R + R.transpose(0, 3, 2, 1)) / 2
    W1 = jnp.asarray(rng.standard_normal((M, M, d, d)), jnp.float32)
    W2 = jnp.asarray(rng.standard_normal((M, M, d, d)), jnp.float32)
    # Hermitian two-site operator: symmetrize the fused coupling by
    # using W2 = W1 reversed appropriately is awkward; instead make each
    # W (bra,ket)-symmetric and (left,right)-symmetric, which makes
    # H = L.W1.W2.R Hermitian given Hermitian L, R.
    W1 = (W1 + W1.transpose(1, 0, 3, 2)) / 2
    W2 = (W2 + W2.transpose(1, 0, 3, 2)) / 2
    x = jnp.asarray(rng.standard_normal((B, chi, d, d, chi)), jnp.float32)

    def oracle(l, r, v):
        mv = lambda z: D._matvec_2s(l, W1, W2, r, z)
        return krylov.eigsh_lanczos(mv, v, num_krylov_vecs=m, numeig=1,
                                    ritz_method="power",
                                    reorthogonalize=False)

    ev_o, vec_o = jax.vmap(oracle)(L, R, x)
    ev_k, vec_k = K.fused_lanczos_ground_state_2s(
        L, W1, W2, R, x, num_krylov_vecs=m, ritz_method="power",
        interpret=True)
    np.testing.assert_allclose(np.asarray(ev_k).ravel(),
                               np.asarray(ev_o).ravel(),
                               rtol=2e-5, atol=1e-3)
    vo, vk = np.asarray(vec_o)[:, 0], np.asarray(vec_k)
    for i in range(B):
        a, b = vo[i].ravel(), vk[i].ravel()
        sign = np.sign(np.dot(a, b))
        np.testing.assert_allclose(a, sign * b, atol=1e-4)


def test_transfer_chain_matches_xla(rng):
    """Whole-chain transfer kernel vs the scan-of-einsum oracle
    (interpret mode; on-chip validation happens in benchmarks)."""
    from tensornetwork_tpu.ops.kernels import transfer_chain
    B, N, chi, d = 4, 5, 16, 2
    As = jnp.asarray(rng.standard_normal((B, N, chi, d, chi))
                     / np.sqrt(2 * chi), jnp.float32)
    E0 = jnp.asarray(rng.standard_normal((B, chi, chi)), jnp.float32)
    ref = transfer_chain(As, E0, impl="xla")
    out = transfer_chain(As, E0, impl="pallas", tile_b=2, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=1e-6)
    # tile_b that does not divide B falls back to a divisor
    out2 = transfer_chain(As, E0, impl="pallas", tile_b=3, interpret=True)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref),
                               rtol=2e-5, atol=1e-6)
    # "rows" variant (row-stacked A, fused-depth stage-2 GEMM)
    out3 = transfer_chain(As, E0, impl="pallas", tile_b=2, interpret=True,
                          variant="rows")
    np.testing.assert_allclose(np.asarray(out3), np.asarray(ref),
                               rtol=2e-5, atol=1e-6)


def test_fused_lanczos_two_pass_matches_single(rng):
    """Two-pass (basis-free) fused Lanczos replays bitwise-identically
    (VERDICT r1 item 3: the chi=512 VMEM regime)."""
    B, chi, d, M, m = 3, 12, 2, 3, 8
    def sym(x, perm):
        return (x + x.transpose(*perm)) / 2
    L = sym(jnp.asarray(rng.standard_normal((B, chi, M, chi))),
            (0, 3, 2, 1))
    W = sym(jnp.asarray(rng.standard_normal((M, M, d, d))), (1, 0, 3, 2))
    R = sym(jnp.asarray(rng.standard_normal((B, chi, M, chi))),
            (0, 3, 2, 1))
    x0 = jnp.asarray(rng.standard_normal((B, chi, d, chi)))
    ev1, y1 = K.fused_lanczos_ground_state(L, W, R, x0, m,
                                           ritz_method="eigh",
                                           interpret=True)
    ev2, y2 = K.fused_lanczos_ground_state(L, W, R, x0, m,
                                           ritz_method="eigh",
                                           interpret=True, two_pass=True)
    np.testing.assert_allclose(np.asarray(ev1), np.asarray(ev2),
                               rtol=1e-12)
    for b in range(B):
        a, c = np.asarray(y1[b]).ravel(), np.asarray(y2[b]).ravel()
        s = np.sign(a @ c)
        np.testing.assert_allclose(a, s * c, atol=1e-10)


def test_streamed_lanczos_matches_resident(rng):
    # chi-chunked streamed kernel (VERDICT r2 item 1) == the resident
    # single-pass kernel: identical V, alphas, betas to f32 roundoff
    from tensornetwork_tpu.ops import kernels
    import jax.numpy as jnp
    B, chi, d, M, m, K = 2, 16, 2, 3, 6, 4
    L = jnp.asarray(rng.standard_normal((B, chi, M, chi)),
                    jnp.float32) / np.sqrt(chi)
    L = (L + L.transpose(0, 3, 2, 1)) / 2
    R = jnp.asarray(rng.standard_normal((B, chi, M, chi)),
                    jnp.float32) / np.sqrt(chi)
    R = (R + R.transpose(0, 3, 2, 1)) / 2
    W = jnp.asarray(rng.standard_normal((M, M, d, d)), jnp.float32)
    W = (W + W.transpose(1, 0, 3, 2)) / 2
    x0 = jnp.asarray(rng.standard_normal((B, chi, d, chi)), jnp.float32)
    Lt, W_, Rt, xt = kernels.prepare_operands(L, W, R, x0)
    V1, ab1 = kernels.make_fused_lanczos(chi, d, M, m,
                                         interpret=True)(Lt, W_, Rt, xt)
    V2, ab2 = kernels.make_fused_lanczos_streamed(
        chi, d, M, m, n_chunks=K, interpret=True)(Lt, W_, Rt, xt)
    np.testing.assert_allclose(np.asarray(ab2), np.asarray(ab1),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(V2), np.asarray(V1), atol=2e-6)
    # ground-state wrapper parity (up to evec sign)
    ev1, y1 = kernels.fused_lanczos_ground_state(
        L, W, R, x0, m, ritz_method="eigh", interpret=True)
    ev2, y2 = kernels.fused_lanczos_ground_state_streamed(
        L, W, R, x0, m, ritz_method="eigh", n_chunks=K, interpret=True)
    np.testing.assert_allclose(np.asarray(ev2), np.asarray(ev1),
                               atol=2e-5)
    d1 = float(jnp.max(jnp.abs(y1 - y2)))
    d2 = float(jnp.max(jnp.abs(y1 + y2)))
    assert min(d1, d2) < 2e-6


def test_streamed_chunk_count_gates():
    from tensornetwork_tpu.ops.kernels import streamed_chunk_count
    assert streamed_chunk_count(512, 2, 3) == 8    # the target regime
    # (K=4's 15.7 MB plan fails remote Mosaic VMEM on chip; K=8 passes)
    assert streamed_chunk_count(1024, 2, 3) is None  # TP territory


def test_streamed_matvec_plan_targets():
    from tensornetwork_tpu.ops.kernels import streamed_matvec_plan
    # the round-4 target regimes must have admissible plans
    assert streamed_matvec_plan(512, 4, 3) is not None    # chi=512 2-site
    assert streamed_matvec_plan(1024, 2, 3) is not None   # chi=1024 1-site
    assert streamed_matvec_plan(256, 4, 3) is not None    # chi=256 2-site
    # chi=1024 two-site: x alone (4 tiles of 4 MB) busts VMEM — TP-shard
    assert streamed_matvec_plan(1024, 4, 3) is None


def test_streamed2_matches_xla_lanczos_oracle(rng):
    # doubly-chunked matvec kernel + XLA recurrence vs the plain
    # three-term XLA Lanczos on a Hermitian sandwich (interpret mode)
    from tensornetwork_tpu.ops import krylov
    B, chi, d, M, m = 2, 128, 2, 3, 8
    L = rng.standard_normal((B, chi, M, chi))
    L = 0.5 * (L + L.transpose(0, 3, 2, 1))
    R = rng.standard_normal((B, chi, M, chi))
    R = 0.5 * (R + R.transpose(0, 3, 2, 1))
    W = rng.standard_normal((M, M, d, d))
    W = 0.5 * (W + W.transpose(1, 0, 3, 2))
    L, W, R = jnp.asarray(L), jnp.asarray(W), jnp.asarray(R)
    x0 = jnp.asarray(rng.standard_normal((B, chi, d, chi)))

    def mv(Lb, Rb, x):
        return jnp.einsum("awc,wvst,atb,bvd->csd", Lb, W, x, Rb,
                          optimize="auto")

    ev_or, y_or = jax.vmap(lambda Lb, Rb, xb: krylov.eigsh_lanczos(
        lambda x: mv(Lb, Rb, x), xb, num_krylov_vecs=m, numeig=1,
        reorthogonalize=False, ritz_method="eigh"))(L, R, x0)
    ev, y = K.fused_lanczos_ground_state_streamed2(
        L, W, R, x0, num_krylov_vecs=m, ritz_method="eigh",
        plan=(2, 2), interpret=True)
    np.testing.assert_allclose(np.asarray(ev), np.asarray(ev_or[:, 0]),
                               atol=1e-10)
    fid = jnp.abs(jnp.sum(y.reshape(B, -1) * y_or[:, 0].reshape(B, -1),
                          axis=1))
    np.testing.assert_allclose(np.asarray(fid), 1.0, atol=1e-10)


def test_streamed2_two_site_matches_oracle(rng):
    from tensornetwork_tpu.ops import krylov
    B, chi, d, M, m = 1, 128, 2, 3, 6
    L = rng.standard_normal((B, chi, M, chi))
    L = 0.5 * (L + L.transpose(0, 3, 2, 1))
    R = rng.standard_normal((B, chi, M, chi))
    R = 0.5 * (R + R.transpose(0, 3, 2, 1))
    W1 = rng.standard_normal((M, M, d, d))
    W1 = 0.5 * (W1 + W1.transpose(1, 0, 3, 2))
    W2 = rng.standard_normal((M, M, d, d))
    W2 = 0.5 * (W2 + W2.transpose(1, 0, 3, 2))
    L, R = jnp.asarray(L), jnp.asarray(R)
    W1, W2 = jnp.asarray(W1), jnp.asarray(W2)
    th0 = jnp.asarray(rng.standard_normal((B, chi, d, d, chi)))

    def mv2(Lb, Rb, x):
        return jnp.einsum("awc,wmst,mvuz,atzb,bvd->csud", Lb, W1, W2, x,
                          Rb, optimize="auto")

    ev_or, y_or = jax.vmap(lambda Lb, Rb, xb: krylov.eigsh_lanczos(
        lambda x: mv2(Lb, Rb, x), xb, num_krylov_vecs=m, numeig=1,
        reorthogonalize=False, ritz_method="eigh"))(L, R, th0)
    ev, y = K.fused_lanczos_ground_state_2s_streamed(
        L, W1, W2, R, th0, num_krylov_vecs=m, ritz_method="eigh",
        plan=(2, 2), interpret=True)
    np.testing.assert_allclose(np.asarray(ev), np.asarray(ev_or[:, 0]),
                               atol=1e-10)
    fid = jnp.abs(jnp.sum(y.reshape(B, -1) * y_or[:, 0].reshape(B, -1),
                          axis=1))
    np.testing.assert_allclose(np.asarray(fid), 1.0, atol=1e-10)


def test_streamed_xl_two_site_matches_oracle(rng):
    # three-level-chunked (XL) matvec: x streamed in a-chunks, Q staged
    # through HBM (the chi=1024 two-site tier, VERDICT r4 item 2a) —
    # exact vs the plain XLA Lanczos oracle in interpret mode
    from tensornetwork_tpu.ops import krylov
    B, chi, d, M, m = 1, 128, 2, 3, 6
    L = rng.standard_normal((B, chi, M, chi))
    L = 0.5 * (L + L.transpose(0, 3, 2, 1))
    R = rng.standard_normal((B, chi, M, chi))
    R = 0.5 * (R + R.transpose(0, 3, 2, 1))
    W1 = rng.standard_normal((M, M, d, d))
    W1 = 0.5 * (W1 + W1.transpose(1, 0, 3, 2))
    W2 = rng.standard_normal((M, M, d, d))
    W2 = 0.5 * (W2 + W2.transpose(1, 0, 3, 2))
    L, R = jnp.asarray(L), jnp.asarray(R)
    W1, W2 = jnp.asarray(W1), jnp.asarray(W2)
    th0 = jnp.asarray(rng.standard_normal((B, chi, d, d, chi)))

    def mv2(Lb, Rb, x):
        return jnp.einsum("awc,wmst,mvuz,atzb,bvd->csud", Lb, W1, W2, x,
                          Rb, optimize="auto")

    ev_or, y_or = jax.vmap(lambda Lb, Rb, xb: krylov.eigsh_lanczos(
        lambda x: mv2(Lb, Rb, x), xb, num_krylov_vecs=m, numeig=1,
        reorthogonalize=False, ritz_method="eigh"))(L, R, th0)
    ev, y = K.fused_lanczos_ground_state_2s_streamed(
        L, W1, W2, R, th0, num_krylov_vecs=m, ritz_method="eigh",
        plan=(2, 2, 2), interpret=True)
    np.testing.assert_allclose(np.asarray(ev), np.asarray(ev_or[:, 0]),
                               atol=1e-10)
    fid = jnp.abs(jnp.sum(y.reshape(B, -1) * y_or[:, 0].reshape(B, -1),
                          axis=1))
    np.testing.assert_allclose(np.asarray(fid), 1.0, atol=1e-10)


def test_streamed_xl_matvec_alpha_matches_einsum(rng):
    # kernel A + kernel B composition vs the raw einsum matvec and
    # Rayleigh quotient
    B, chi, nt, M = 2, 128, 4, 3
    Lt = jnp.asarray(rng.standard_normal((B, M, chi, chi)))
    Rt = jnp.asarray(rng.standard_normal((B, M, chi, chi)))
    C = jnp.asarray(rng.standard_normal((M, M, nt, nt)))
    x = jnp.asarray(rng.standard_normal((B, nt, chi, chi)))
    f = K.make_streamed_matvec_xl(chi, nt, M, 2, 2, 2,
                                  accum_dtype=jnp.float64,
                                  interpret=True)
    y, alpha = f(Lt, C, Rt, x)
    y_ref = jnp.einsum("Bwca,Btab,wvst,Bvbd->Bscd", Lt, x, C, Rt,
                       optimize="auto")
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               atol=1e-8)
    a_ref = jnp.sum(x * y_ref, axis=(1, 2, 3))
    np.testing.assert_allclose(np.asarray(alpha), np.asarray(a_ref),
                               atol=1e-8)


def test_streamed_matvec_xl_plan_targets():
    from tensornetwork_tpu.ops import vmem
    # the chi=1024 two-site regime now has an admissible plan
    assert vmem.streamed_matvec_xl_plan(1024, 4, 3) is not None
    # and the two-site dispatch falls through to it
    plan = (vmem.streamed_matvec_plan(1024, 4, 3)
            or vmem.streamed_matvec_xl_plan(1024, 4, 3))
    assert plan is not None and len(plan) == 3


def test_streamed_xl_one_site_matches_oracle(rng):
    # the chi=2048 ONE-site tier: XL kernel with nt=d=2 (interpret)
    from tensornetwork_tpu.ops import krylov
    B, chi, d, M, m = 1, 128, 2, 3, 6
    L = rng.standard_normal((B, chi, M, chi))
    L = 0.5 * (L + L.transpose(0, 3, 2, 1))
    R = rng.standard_normal((B, chi, M, chi))
    R = 0.5 * (R + R.transpose(0, 3, 2, 1))
    W = rng.standard_normal((M, M, d, d))
    W = 0.5 * (W + W.transpose(1, 0, 3, 2))
    L, W, R = jnp.asarray(L), jnp.asarray(W), jnp.asarray(R)
    x0 = jnp.asarray(rng.standard_normal((B, chi, d, chi)))

    def mv(Lb, Rb, x):
        return jnp.einsum("awc,wvst,atb,bvd->csd", Lb, W, x, Rb,
                          optimize="auto")

    ev_or, y_or = jax.vmap(lambda Lb, Rb, xb: krylov.eigsh_lanczos(
        lambda x: mv(Lb, Rb, x), xb, num_krylov_vecs=m, numeig=1,
        reorthogonalize=False, ritz_method="eigh"))(L, R, x0)
    ev, y = K.fused_lanczos_ground_state_streamed2(
        L, W, R, x0, num_krylov_vecs=m, ritz_method="eigh",
        plan=(2, 2, 2), interpret=True)
    np.testing.assert_allclose(np.asarray(ev), np.asarray(ev_or[:, 0]),
                               atol=1e-10)
    fid = jnp.abs(jnp.sum(y.reshape(B, -1) * y_or[:, 0].reshape(B, -1),
                          axis=1))
    np.testing.assert_allclose(np.asarray(fid), 1.0, atol=1e-10)


def test_one_site_chi2048_has_xl_plan():
    from tensornetwork_tpu.ops import vmem
    assert vmem.streamed_matvec_plan(2048, 2, 3) is None
    assert vmem.streamed_matvec_xl_plan(2048, 2, 3) is not None
