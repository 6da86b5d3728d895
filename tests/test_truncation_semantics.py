"""Truncation-semantics parity with the reference contract (reference
``backends/numpy/decompositions.py:40-68``: the discarded singular
values are the maximal tail with L2 norm <= max_truncation_error,
scaled by s[0] when relative=True, capped by max_singular_values) —
exercised through every public surface that truncates."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tensornetwork_tpu as tn
from tensornetwork_tpu.ops import decompositions as dec


def matrix_with_spectrum(s, rng, m=None, n=None):
    k = len(s)
    m = m or k + 3
    n = n or k + 1
    u, _ = np.linalg.qr(rng.standard_normal((m, k)))
    v, _ = np.linalg.qr(rng.standard_normal((n, k)))
    return (u * np.asarray(s)) @ v.T


def test_max_truncation_error_tail_rule():
    rng = np.random.default_rng(0)
    s = [4.0, 2.0, 1.0, 0.5, 0.25]
    a = matrix_with_spectrum(s, rng)
    # tail [0.5, 0.25] has norm ~0.559: err=0.6 discards both, err=0.5
    # discards only 0.25... sqrt(0.25^2)=0.25<=0.5, sqrt(0.5^2+0.25^2)
    # =0.559>0.5 -> discard exactly one
    u, sv, vh, s_rest = dec.svd(jnp.asarray(a),
                                max_truncation_error=0.6)
    assert len(np.asarray(sv)) == 3
    # the discarded tail holds [0.5, 0.25] plus the matrix's numerical
    # zeros (rank-4 of a 7x5 matrix) — the reference keeps those too
    rest = np.sort(np.asarray(s_rest))[::-1]
    np.testing.assert_allclose(rest[:2], [0.5, 0.25], atol=1e-10)
    assert np.all(rest[2:] < 1e-12)
    u, sv, vh, s_rest = dec.svd(jnp.asarray(a),
                                max_truncation_error=0.5)
    assert len(np.asarray(sv)) == 4


def test_relative_truncation_scales_by_largest():
    rng = np.random.default_rng(1)
    s = [10.0, 1.0, 0.1]
    a = matrix_with_spectrum(s, rng)
    # relative err 0.05 -> absolute 0.5: discards only 0.1
    u, sv, vh, s_rest = dec.svd(jnp.asarray(a),
                                max_truncation_error=0.05, relative=True)
    assert len(np.asarray(sv)) == 2
    # absolute err 0.05 discards nothing
    u, sv, vh, s_rest = dec.svd(jnp.asarray(a),
                                max_truncation_error=0.05, relative=False)
    assert len(np.asarray(sv)) == 3


def test_max_singular_values_caps_after_error_rule():
    rng = np.random.default_rng(2)
    s = [4.0, 2.0, 1.0, 0.5]
    a = matrix_with_spectrum(s, rng)
    u, sv, vh, s_rest = dec.svd(jnp.asarray(a), max_singular_values=2,
                                max_truncation_error=10.0)
    # the error rule alone would keep 0; the cap keeps at most 2; the
    # reference applies min(error-rule-keep, cap)
    assert len(np.asarray(sv)) == 0
    u, sv, vh, s_rest = dec.svd(jnp.asarray(a), max_singular_values=2,
                                max_truncation_error=0.1)
    assert len(np.asarray(sv)) == 2
    np.testing.assert_allclose(np.asarray(sv), [4.0, 2.0], atol=1e-10)


def test_split_node_s_rest_and_reconstruction():
    rng = np.random.default_rng(3)
    s = [3.0, 1.5, 0.75, 0.01]
    a = matrix_with_spectrum(s, rng, m=6, n=5)
    node = tn.Node(jnp.asarray(a))
    left, right, s_rest = tn.split_node(
        node, [node[0]], [node[1]], max_singular_values=3)
    rest = np.sort(np.asarray(s_rest))[::-1]
    np.testing.assert_allclose(rest[0], 0.01, atol=1e-9)
    assert np.all(rest[1:] < 1e-12)
    rec = np.asarray(tn.contract(left[1]).tensor)
    best3 = matrix_with_spectrum_best(a, 3)
    np.testing.assert_allclose(rec, best3, atol=1e-8)


def matrix_with_spectrum_best(a, k):
    u, s, vh = np.linalg.svd(a, full_matrices=False)
    return (u[:, :k] * s[:k]) @ vh[:k]


def test_split_node_full_svd_s_node():
    rng = np.random.default_rng(4)
    a = matrix_with_spectrum([2.0, 1.0, 0.5], rng)
    node = tn.Node(jnp.asarray(a))
    u, s_node, vh, s_rest = tn.split_node_full_svd(
        node, [node[0]], [node[1]], max_singular_values=2)
    sd = np.asarray(s_node.tensor)
    np.testing.assert_allclose(np.diag(sd), [2.0, 1.0], atol=1e-9)
    rest = np.sort(np.asarray(s_rest))[::-1]
    np.testing.assert_allclose(rest[0], 0.5, atol=1e-9)


def test_svd_masked_trunc_sq_norm_accounting():
    rng = np.random.default_rng(5)
    s = [2.0, 1.0, 0.5, 0.25]
    a = matrix_with_spectrum(s, rng)
    res = dec.svd_masked(jnp.asarray(a), max_singular_values=2)
    np.testing.assert_allclose(float(res.trunc_sq_norm),
                               0.5**2 + 0.25**2, rtol=1e-6)
    # masked values are zeroed, shape static
    assert res.s.shape[0] == 2 or np.count_nonzero(
        np.asarray(res.s)) == 2


def test_two_site_sweep_trunc_err_matches_discarded_weight():
    # the sweep's accumulated trunc_err equals the sum of squared
    # discarded singular values of each bond split (svd path)
    from tensornetwork_tpu.models import FiniteTFI
    from tensornetwork_tpu.models.dmrg import (two_site_sweep,
                                               random_mps_stack)
    N, chi = 6, 4   # chi too small for the exact state: real truncation
    mpo = FiniteTFI(Jx=-1.0, Bz=-1.0, N=N)
    As = random_mps_stack(jax.random.PRNGKey(0), N, chi)
    res = None
    renvs = None
    for _ in range(6):
        res = two_site_sweep(As, mpo.Ws, mpo.vL, mpo.vR,
                             num_krylov_vecs=16, renvs=renvs)
        As, renvs = res.As, res.renvs
    terr = float(res.trunc_err)
    assert terr > 0  # genuine truncation at chi=4
    assert terr < 1e-2  # but small: the state is near area-law


@pytest.mark.parametrize("msv", [1, 3, 5, 8])
def test_svd_masked_matches_host_svd(msv):
    rng = np.random.default_rng(6)
    a = jnp.asarray(rng.standard_normal((9, 7)))
    res = dec.svd_masked(a, max_singular_values=msv)
    u, s, vh, s_rest = dec.svd(a, max_singular_values=msv)
    k = min(msv, 7)
    np.testing.assert_allclose(np.asarray(res.s)[:k], np.asarray(s),
                               atol=1e-10)
    rec_m = (res.u * res.s[None, :]) @ res.vh
    rec_h = (u * s[None, :]) @ vh
    np.testing.assert_allclose(np.asarray(rec_m), np.asarray(rec_h),
                               atol=1e-9)
