"""Decomposition tests: reconstruction + reference truncation semantics
(oracle: numpy.linalg; truncation contract from reference
``backends/numpy/decompositions.py:21-124``)."""
import jax.numpy as jnp
import numpy as np
import pytest

from tensornetwork_tpu.ops.decompositions import (
    svd, qr, rq, eigh, svd_masked)


def test_svd_reconstruct(rng):
    t = rng.standard_normal((6, 4, 5, 3))
    u, s, vh, s_rest = svd(t, pivot_axis=2)
    u, s, vh = map(np.asarray, (u, s, vh))
    assert u.shape[:2] == (6, 4) and vh.shape[1:] == (5, 3)
    assert s_rest.shape == (0,)
    recon = np.einsum("abk,k,kcd->abcd", u, s, vh)
    np.testing.assert_allclose(recon, t, atol=1e-10)


def test_svd_max_singular_values(rng):
    t = rng.standard_normal((10, 8))
    u, s, vh, s_rest = svd(t, pivot_axis=1, max_singular_values=3)
    assert s.shape == (3,)
    assert s_rest.shape == (5,)
    full_s = np.linalg.svd(t, compute_uv=False)
    np.testing.assert_allclose(np.asarray(s), full_s[:3], rtol=1e-10)
    np.testing.assert_allclose(np.sort(np.asarray(s_rest))[::-1], full_s[3:],
                               rtol=1e-10)


def test_svd_max_truncation_error(rng):
    # construct a known spectrum
    u0, _ = np.linalg.qr(rng.standard_normal((8, 8)))
    v0, _ = np.linalg.qr(rng.standard_normal((8, 8)))
    spec = np.array([10.0, 5.0, 1.0, 0.1, 0.05, 0.01, 0.005, 0.001])
    t = (u0 * spec) @ v0.T
    # tail [0.005, 0.001] has norm ~0.0051; allow 0.006
    _, s, _, s_rest = svd(t, pivot_axis=1, max_truncation_error=0.0052)
    assert s.shape == (6,)
    np.testing.assert_allclose(np.asarray(s), spec[:6], rtol=1e-8)
    # relative: err * s[0] = 0.00052*10 = 0.0052
    _, s2, _, _ = svd(t, pivot_axis=1, max_truncation_error=0.00052,
                      relative=True)
    assert s2.shape == (6,)
    # both caps: max_sv wins when smaller
    _, s3, _, rest3 = svd(t, pivot_axis=1, max_singular_values=2,
                          max_truncation_error=0.0052)
    assert s3.shape == (2,)
    assert rest3.shape == (6,)


def test_qr_rq(rng):
    t = rng.standard_normal((6, 4, 5))
    q, r = qr(t, pivot_axis=2)
    recon = np.einsum("abk,kc->abc", np.asarray(q), np.asarray(r))
    np.testing.assert_allclose(recon, t, atol=1e-10)
    qm = np.asarray(q).reshape(24, -1)
    np.testing.assert_allclose(qm.T @ qm, np.eye(qm.shape[1]), atol=1e-10)

    r2, q2 = rq(t, pivot_axis=1)
    recon2 = np.einsum("ak,kbc->abc", np.asarray(r2), np.asarray(q2))
    np.testing.assert_allclose(recon2, t, atol=1e-10)
    q2m = np.asarray(q2).reshape(q2.shape[0], -1)
    np.testing.assert_allclose(q2m @ q2m.T, np.eye(q2m.shape[0]), atol=1e-10)


def test_qr_non_negative_diagonal(rng):
    t = rng.standard_normal((5, 5))
    q, r = qr(t, pivot_axis=1, non_negative_diagonal=True)
    assert np.all(np.diagonal(np.asarray(r)) >= 0)
    np.testing.assert_allclose(np.asarray(q) @ np.asarray(r), t, atol=1e-10)


def test_eigh(rng):
    a = rng.standard_normal((6, 6))
    a = a + a.T
    e, v = eigh(a, pivot_axis=1)
    np.testing.assert_allclose(
        np.asarray(v) @ np.diag(np.asarray(e)) @ np.asarray(v).T, a,
        atol=1e-10)


def test_svd_masked_static_shape(rng):
    t = rng.standard_normal((10, 8))
    res = svd_masked(t, max_singular_values=5)
    assert res.u.shape == (10, 5)
    assert res.s.shape == (5,)
    assert res.vh.shape == (5, 8)
    assert int(res.num_kept) == 5
    full_s = np.linalg.svd(t, compute_uv=False)
    np.testing.assert_allclose(np.asarray(res.s), full_s[:5], rtol=1e-10)
    np.testing.assert_allclose(float(res.trunc_sq_norm),
                               float(np.sum(full_s[5:]**2)), rtol=1e-8)


def test_svd_masked_truncation_error_matches_host(rng):
    u0, _ = np.linalg.qr(rng.standard_normal((8, 8)))
    v0, _ = np.linalg.qr(rng.standard_normal((8, 8)))
    spec = np.array([10.0, 5.0, 1.0, 0.1, 0.05, 0.01, 0.005, 0.001])
    t = (u0 * spec) @ v0.T
    res = svd_masked(t, max_singular_values=8, max_truncation_error=0.0052)
    assert int(res.num_kept) == 6
    np.testing.assert_allclose(np.asarray(res.s)[:6], spec[:6], rtol=1e-8)
    assert np.all(np.asarray(res.s)[6:] == 0)
    # masked rows of vh / cols of u are zeroed
    assert np.all(np.asarray(res.vh)[6:, :] == 0)
    assert np.all(np.asarray(res.u)[:, 6:] == 0)


def test_svd_masked_batched(rng):
    t = rng.standard_normal((4, 10, 8))
    res = svd_masked(t, max_singular_values=3)
    assert res.u.shape == (4, 10, 3)
    for b in range(4):
        full_s = np.linalg.svd(t[b], compute_uv=False)
        np.testing.assert_allclose(np.asarray(res.s)[b], full_s[:3],
                                   rtol=1e-10)


def test_subspace_truncate_matches_svd_projector():
    import jax.numpy as jnp
    from tensornetwork_tpu.ops.decompositions import subspace_truncate
    rng = np.random.default_rng(0)
    B, n, k = 4, 32, 16
    u, _ = np.linalg.qr(rng.standard_normal((B, n, n)))
    v, _ = np.linalg.qr(rng.standard_normal((B, n, n)))
    s = np.exp(-0.4 * np.arange(n))
    th = jnp.asarray(u * s[None, None, :] @ v)
    res = subspace_truncate(th, k, iters=10)
    uo, so, vho = np.linalg.svd(np.asarray(th))
    ref = uo[:, :, :k] * so[:, None, :k] @ vho[:, :k]
    got = np.asarray(res.q @ res.rest)
    # q @ rest equals the truncated SVD as a projector (within the
    # subspace-iteration convergence at this spectral gap; tests run in
    # f32 — the f64 floor is ~1e-8)
    np.testing.assert_allclose(got, ref, atol=1e-4)
    np.testing.assert_allclose(np.asarray(res.trunc_sq_norm),
                               (so[:, k:] ** 2).sum(-1), rtol=1e-2,
                               atol=1e-9)
    # q is an isometry
    g = np.einsum("bij,bik->bjk", np.asarray(res.q), np.asarray(res.q))
    np.testing.assert_allclose(g, np.broadcast_to(np.eye(k), (B, k, k)),
                               atol=1e-10)


def test_subspace_truncate_warm_start_few_iters():
    import jax.numpy as jnp
    from tensornetwork_tpu.ops.decompositions import subspace_truncate
    rng = np.random.default_rng(1)
    n, k = 24, 8
    u, _ = np.linalg.qr(rng.standard_normal((n, n)))
    v, _ = np.linalg.qr(rng.standard_normal((n, n)))
    s = np.exp(-0.5 * np.arange(n))
    th = jnp.asarray(u * s[None, :] @ v)
    q0 = jnp.asarray(u[:, :k] + 0.05 * rng.standard_normal((n, k)))
    res = subspace_truncate(th, k, q0=q0, iters=2)
    ref = (u[:, :k] * s[None, :k]) @ v[:k]
    np.testing.assert_allclose(np.asarray(res.q @ res.rest), ref,
                               atol=1e-4)


# ---------------------------------------------------------------------------
# Round-5 edge cases for the accuracy-critical kernels (polar gauges
# became the TPU-wide default this round — BASELINE.md gauge A/B)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("shape", [(32, 32), (64, 32), (48, 16)])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.float64])
def test_ns_polar_isometry_and_span(rng, shape, dtype):
    from tensornetwork_tpu.ops.decompositions import ns_polar
    m = jnp.asarray(rng.standard_normal(shape), dtype)
    q, p = ns_polar(m)
    tol = 1e-5 if dtype == jnp.float32 else 1e-10
    np.testing.assert_allclose(np.asarray(q.T @ q),
                               np.eye(shape[1]), atol=tol)
    # q p reconstructs m and p is symmetric PSD
    np.testing.assert_allclose(np.asarray(q @ p), np.asarray(m),
                               atol=tol * 10)
    np.testing.assert_allclose(np.asarray(p), np.asarray(p.T),
                               atol=tol * 10)


def test_ns_polar_rank_deficient_partial_isometry(rng):
    # documented contract: NS polar on rank-deficient panels yields a
    # PARTIAL isometry (null columns stay zero) — polar_complete is the
    # full-completion variant (CLAUDE.md)
    from tensornetwork_tpu.ops.decompositions import ns_polar
    m = jnp.asarray(rng.standard_normal((32, 8)), jnp.float64)
    m = jnp.concatenate([m, m @ jnp.ones((8, 8))], axis=1)  # rank 8
    q, p = ns_polar(m)
    g = np.asarray(q.T @ q)
    # the isometric block acts correctly on the row space
    np.testing.assert_allclose(np.asarray(q @ p), np.asarray(m),
                               atol=1e-8)


def test_ns_polar_complete_full_isometry_on_rank_deficient(rng):
    from tensornetwork_tpu.ops.decompositions import ns_polar_complete
    m = jnp.asarray(rng.standard_normal((32, 8)), jnp.float64)
    m = jnp.concatenate([m, m], axis=1)  # rank 8 of 16 columns
    q, p = ns_polar_complete(m)
    np.testing.assert_allclose(np.asarray(q.T @ q), np.eye(16),
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(q @ p), np.asarray(m),
                               atol=1e-8)


def test_cholqr2_well_conditioned(rng):
    from tensornetwork_tpu.ops.decompositions import cholqr2
    m = jnp.asarray(rng.standard_normal((64, 16)), jnp.float64)
    q, r = cholqr2(m)
    np.testing.assert_allclose(np.asarray(q.T @ q), np.eye(16),
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(q @ r), np.asarray(m),
                               atol=1e-10)


def test_svd_masked_zero_rows(rng):
    # a matrix with trailing zero singular values: the masked SVD must
    # not NaN and must keep shapes static
    from tensornetwork_tpu.ops.decompositions import svd_masked
    a = jnp.asarray(rng.standard_normal((16, 4)), jnp.float64)
    m = a @ jnp.asarray(rng.standard_normal((4, 16)), jnp.float64)
    res = svd_masked(m, max_singular_values=8)
    u, s, vh = res.u, res.s, res.vh
    assert u.shape == (16, 8) and s.shape == (8,)
    assert np.all(np.isfinite(np.asarray(u)))
    # only ~4 significant values
    assert np.sum(np.asarray(s) > 1e-10) <= 4 + 1
    np.testing.assert_allclose(
        np.asarray((u * s) @ vh), np.asarray(m), atol=1e-8)


def test_subspace_truncate_identity_when_k_equals_rank(rng):
    from tensornetwork_tpu.ops.decompositions import subspace_truncate
    m = jnp.asarray(rng.standard_normal((24, 24)), jnp.float64)
    q, rest = subspace_truncate(m, k=24, iters=8)[:2]
    # full rank kept: projector is the identity on the column space
    np.testing.assert_allclose(np.asarray(q @ (q.T @ m)), np.asarray(m),
                               atol=1e-8)


@pytest.mark.parametrize("cond", [1.0, 1e3, 1e6, 1e7])
def test_ns_polar_express_f32_isometry(rng, cond):
    """LP-scheduled quintic polar (opt-in): f32-eps isometry class
    across the validated condition range, same contract as ns_polar."""
    from tensornetwork_tpu.ops.decompositions import ns_polar_express
    k = 48
    u, _ = np.linalg.qr(rng.standard_normal((96, k)))
    v, _ = np.linalg.qr(rng.standard_normal((k, k)))
    s = np.geomspace(1.0, 1.0 / cond, k)
    m = jnp.asarray(u @ np.diag(s) @ v.T, jnp.float32)
    q, p = ns_polar_express(m)
    g = np.asarray(q, np.float64).T @ np.asarray(q, np.float64)
    assert np.max(np.abs(g - np.eye(k))) < 5e-6
    np.testing.assert_allclose(np.asarray(q @ p), np.asarray(m),
                               atol=1e-4)


def test_ns_polar_express_f64_falls_back(rng):
    # f64 cond bounds sit below the LP's reliable range: the express
    # path must fall back to the fixed hybrid schedule and still
    # deliver f64 isometry
    from tensornetwork_tpu.ops.decompositions import ns_polar_express
    m = jnp.asarray(rng.standard_normal((64, 24)), jnp.float64)
    q, p = ns_polar_express(m)
    np.testing.assert_allclose(np.asarray(q.T @ q), np.eye(24),
                               atol=1e-10)


def test_polar_express_schedule_stays_in_unit_interval():
    from tensornetwork_tpu.ops.decompositions import (
        _polar_express_schedule)
    l0 = 1e-7 / np.sqrt(64) / 1.01
    sched = _polar_express_schedule(l0, 1e-2)
    assert 5 < len(sched) < 20
    x = np.geomspace(l0, 1.0, 200000)
    for (a, b, c) in sched:
        x = a * x + b * x**3 + c * x**5
        # every intermediate stays in (0, 1]: no overshoot, no dip
        # below the tracked lower edge
        assert x.max() <= 1.0 + 1e-12
        assert x.min() > 0.0
    assert x.min() > 0.98


def test_ns_polar_express_hybrid_mode(rng):
    # hybrid (gentle inflation + LP tail): correctness across the f32
    # condition range; the measured conclusion (no GEMM savings worth
    # wiring) lives in the schedule docstring
    from tensornetwork_tpu.ops.decompositions import ns_polar_express
    for cond in (1.0, 1e7):
        k = 32
        u, _ = np.linalg.qr(rng.standard_normal((64, k)))
        v, _ = np.linalg.qr(rng.standard_normal((k, k)))
        s = np.geomspace(1.0, 1.0 / cond, k)
        m = jnp.asarray(u @ np.diag(s) @ v.T, jnp.float32)
        q, p = ns_polar_express(m, mode="hybrid")
        g = np.asarray(q, np.float64).T @ np.asarray(q, np.float64)
        assert np.max(np.abs(g - np.eye(k))) < 5e-6
