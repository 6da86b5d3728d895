"""EP fused-chain executor (VERDICT r3 item 2): component partitioning,
dead-sector pruning, exact psum reassembly, dtype promotion, caching,
and validation errors — against sequential single-device executors and
the numpy sector engine."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensornetwork_tpu.blocksparse import U1Charge, Index, randn
from tensornetwork_tpu.blocksparse import tensor as bst
from tensornetwork_tpu.blocksparse import jax_engine as JE
from tensornetwork_tpu.blocksparse.batched import (
    chain_contraction_plan, contraction_plan)
from tensornetwork_tpu.parallel.mesh import make_mesh
from jax.sharding import PartitionSpec as P


@pytest.fixture
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    return make_mesh((8,), ("ep",))


def _rand_u1(rng, d, lo=-2, hi=3):
    return U1Charge(rng.integers(lo, hi, d))


def _with_data(skel, data):
    return bst.BlockSparseTensor(np.asarray(data), skel._charges,
                                 skel._flows,
                                 [list(g) for g in skel._order])


def _run_chain_on_mesh(mesh, run, datas):
    n = len(datas)
    fn = jax.jit(jax.shard_map(
        lambda *d: run(*d), mesh=mesh,
        in_specs=(P(),) * n, out_specs=P(), check_vma=False))
    return np.asarray(fn(*[jnp.asarray(d) for d in datas]))


def _matmul_chain_skels(rng, dims=(6, 7, 5, 6, 4, 5)):
    cs = [_rand_u1(rng, d) for d in dims]
    mats = [randn([Index(cs[i], False), Index(cs[i + 1], True)],
                  seed=10 + i) for i in range(len(dims) - 1)]
    return mats


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("n_stages", [2, 3, 4])
def test_chain_matches_numpy_matmul_chain(rng, mesh, seed, n_stages):
    r = np.random.default_rng(seed)
    mats = _matmul_chain_skels(r)[: n_stages + 1]
    stages = [(mats[0], mats[1], [[1], [0]])]
    for m in mats[2:]:
        stages.append((None, m, [[1], [0]]))
    run, out_skel = chain_contraction_plan(stages, ep=(8, "ep"))
    out = _run_chain_on_mesh(mesh, run,
                             [m.data for m in mats])
    # numpy oracle through the sector engine
    acc = mats[0]
    for m in mats[1:]:
        acc = bst.tensordot(acc, m, [[1], [0]])
    np.testing.assert_allclose(out, acc.data, rtol=0, atol=1e-5)
    assert out_skel.data.shape[0] == acc.data.shape[0]


def test_chain_exact_vs_sequential_executors(rng, mesh):
    r = np.random.default_rng(7)
    mats = _matmul_chain_skels(r, dims=(8, 9, 7, 8))
    stages = [(mats[0], mats[1], [[1], [0]]),
              (None, mats[2], [[1], [0]])]
    run, _ = chain_contraction_plan(stages, ep=(8, "ep"))
    out = _run_chain_on_mesh(mesh, run, [m.data for m in mats])
    f1, t1 = contraction_plan(mats[0], mats[1], [[1], [0]])
    f2, _ = contraction_plan(t1, mats[2], [[1], [0]])
    seq = np.asarray(f2(f1(jnp.asarray(mats[0].data),
                           jnp.asarray(mats[1].data)),
                        jnp.asarray(mats[2].data)))
    # disjoint-support psum: reassembly adds exact zeros
    np.testing.assert_array_equal(out, seq)


def test_partition_covers_multiple_devices():
    r = np.random.default_rng(3)
    # many distinct charge values -> many components
    mats = _matmul_chain_skels(r, dims=(24, 24, 24, 24))
    raws = []
    prev = None
    specs = [(mats[0], mats[1], [1], [0]), (None, mats[2], [1], [0])]
    for k, (s1, s2, a1, a2) in enumerate(specs):
        if s1 is None:
            s1 = prev
        raw = JE._build_plan(s1, s2, list(a1), list(a2))
        raws.append(raw)
        prev = JE._out_skel_of_raw(raw)
    assign, bins = JE._partition_chain(raws, 4)
    used = {d for a in assign for d in a if d >= 0}
    assert len(used) > 1, "components should spread over devices"
    # every live stage-2 sector's device owns its writers
    wv = np.full(raws[0]["out"]["nnz"], -1, np.int64)
    for t, (_m1, _m2, mo, _s1, _s2) in enumerate(raws[0]["sectors"]):
        if assign[0][t] >= 0:
            wv[mo.ravel()] = assign[0][t]
    for t, (m1, _m2, _mo, _s1, _s2) in enumerate(raws[1]["sectors"]):
        if assign[1][t] < 0:
            continue
        pos = m1.ravel()
        if raws[1]["perm1"] is not None:
            pos = raws[1]["perm1"][pos]
        owners = set(wv[pos]) - {-1}
        assert owners <= {assign[1][t]}, "read crosses devices"


def test_dead_and_unread_sectors_do_not_break_exactness(rng, mesh):
    # skewed charge ranges make some intermediate sectors structurally
    # unproduced (dead downstream reads) and some produced-but-unread
    r = np.random.default_rng(11)
    c1 = _rand_u1(r, 8, -1, 2)
    c2 = _rand_u1(r, 9, -3, 4)
    c3 = _rand_u1(r, 7, 0, 2)
    c4 = _rand_u1(r, 6, -1, 2)
    a = randn([Index(c1, False), Index(c2, True)], seed=1)
    b = randn([Index(c2, False), Index(c3, True)], seed=2)
    c = randn([Index(c3, False), Index(c4, True)], seed=3)
    run, _ = chain_contraction_plan(
        [(a, b, [[1], [0]]), (None, c, [[1], [0]])], ep=(8, "ep"))
    out = _run_chain_on_mesh(mesh, run, [a.data, b.data, c.data])
    oracle = bst.tensordot(bst.tensordot(a, b, [[1], [0]]), c,
                           [[1], [0]])
    np.testing.assert_allclose(out, oracle.data, rtol=0, atol=1e-5)


def test_chain_multiaxis_rank3(rng, mesh):
    # rank-3 operands, 2-leg contraction in stage 2 (exercises perms)
    r = np.random.default_rng(5)
    c1, c2, c3, c4 = (_rand_u1(r, d) for d in (4, 5, 6, 3))
    a = randn([Index(c1, False), Index(c2, True), Index(c3, True)],
              seed=4)
    b = randn([Index(c2, False), Index(c4, True)], seed=5)
    # stage 1: contract c2 -> (c1, c3, c4); stage 2: contract (c3, c4)
    d = randn([Index(c3, False), Index(c4, False)], seed=6)
    run, _ = chain_contraction_plan(
        [(a, b, [[1], [0]]), (None, d, [[1, 2], [0, 1]])], ep=(8, "ep"))
    out = _run_chain_on_mesh(mesh, run, [a.data, b.data, d.data])
    oracle = bst.tensordot(bst.tensordot(a, b, [[1], [0]]), d,
                           [[1, 2], [0, 1]])
    np.testing.assert_allclose(out, oracle.data, rtol=0, atol=1e-5)


def test_chain_dtype_promotion(rng, mesh):
    r = np.random.default_rng(9)
    mats = _matmul_chain_skels(r, dims=(6, 7, 6, 5))
    d0 = mats[0].data.astype(np.float32)
    d1 = mats[1].data.astype(np.float64)
    d2 = mats[2].data.astype(np.float32)
    run, _ = chain_contraction_plan(
        [(mats[0], mats[1], [[1], [0]]), (None, mats[2], [[1], [0]])],
        ep=(8, "ep"))
    # conftest enables x64 globally
    out = _run_chain_on_mesh(mesh, run, [d0, d1, d2])
    assert out.dtype == np.float64


def test_chain_cache_hit():
    r = np.random.default_rng(2)
    mats = _matmul_chain_skels(r, dims=(5, 6, 5))
    stages = [(mats[0], mats[1], [[1], [0]])]
    run1, _ = chain_contraction_plan(stages, ep=(8, "ep"))
    run2, _ = chain_contraction_plan(stages, ep=(8, "ep"))
    assert run1 is run2
    run3, _ = chain_contraction_plan(stages, ep=(4, "ep"))
    assert run3 is not run1


def test_chain_validation_errors():
    r = np.random.default_rng(2)
    mats = _matmul_chain_skels(r, dims=(5, 6, 5))
    with pytest.raises(ValueError, match="explicit axes"):
        chain_contraction_plan([(mats[0], mats[1], 1)], ep=(8, "ep"))
    with pytest.raises(ValueError, match="stage 0"):
        JE.make_chain_executor([(None, mats[1], [1], [0])], 8, "ep")
    # scalar-producing stage rejected
    v1 = randn([Index(_rand_u1(np.random.default_rng(1), 5), False)],
               seed=1)
    v2 = randn([Index(v1._charges[0].copy(), True)], seed=2)
    with pytest.raises(ValueError, match="produce tensors"):
        JE.make_chain_executor([(v1, v2, [0], [0])], 8, "ep")
    # wrong operand count at call time
    run, _ = chain_contraction_plan(
        [(mats[0], mats[1], [[1], [0]])], ep=(8, "ep"))
    with pytest.raises(TypeError, match="data vectors"):
        run(jnp.zeros(3))


# -- charge-family sweep: the chain partition must be correct for any
# -- symmetry group, not just U(1) ------------------------------------
from tensornetwork_tpu.blocksparse import Z2Charge, ZNCharge


def _charge_factory(kind):
    def make(rng, d):
        if kind == "u1":
            return U1Charge(rng.integers(-2, 3, d))
        if kind == "z2":
            return Z2Charge(rng.integers(0, 2, d))
        if kind == "z3":
            return ZNCharge(3)(rng.integers(0, 3, d))
        if kind == "u1xz2":
            return (U1Charge(rng.integers(-1, 2, d))
                    @ Z2Charge(rng.integers(0, 2, d)))
        raise ValueError(kind)
    return make


@pytest.mark.parametrize("kind", ["u1", "z2", "z3", "u1xz2"])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_chain_all_charge_families(rng, mesh, kind, seed):
    r = np.random.default_rng(100 + seed)
    mk = _charge_factory(kind)
    cs = [mk(r, d) for d in (6, 7, 5, 6)]
    mats = [randn([Index(cs[i], False), Index(cs[i + 1], True)],
                  seed=20 + i) for i in range(3)]
    if any(m.data.size == 0 for m in mats):
        pytest.skip("degenerate random structure (no allowed entries)")
    run, _ = chain_contraction_plan(
        [(mats[0], mats[1], [[1], [0]]), (None, mats[2], [[1], [0]])],
        ep=(8, "ep"))
    out = _run_chain_on_mesh(mesh, run, [m.data for m in mats])
    acc = bst.tensordot(bst.tensordot(mats[0], mats[1], [[1], [0]]),
                        mats[2], [[1], [0]])
    np.testing.assert_allclose(out, acc.data, rtol=0, atol=1e-5)


@pytest.mark.parametrize("ndev", [1, 2, 3, 5, 8, 16])
def test_partition_any_device_count(ndev):
    # host-side partition invariants for arbitrary ndev (no mesh needed)
    r = np.random.default_rng(4)
    mats = _matmul_chain_skels(r, dims=(12, 12, 12, 12))
    specs = [(mats[0], mats[1], [1], [0]), (None, mats[2], [1], [0])]
    raws, prev = [], None
    for s1, s2, a1, a2 in specs:
        raw = JE._build_plan(s1 if s1 is not None else prev, s2,
                             list(a1), list(a2))
        raws.append(raw)
        prev = JE._out_skel_of_raw(raw)
    assign, bins = JE._partition_chain(raws, ndev)
    for a in assign:
        live = a[a >= 0]
        assert ((live >= 0) & (live < ndev)).all()
    # bins non-negative, total weight preserved across ndev choices
    assert (bins >= 0).all()


def test_chain_matches_ep_per_contraction_executors(rng, mesh):
    # the r3 per-contraction EP path and the r4 fused chain must agree
    r = np.random.default_rng(21)
    mats = _matmul_chain_skels(r, dims=(8, 9, 7, 8))
    run_chain, _ = chain_contraction_plan(
        [(mats[0], mats[1], [[1], [0]]), (None, mats[2], [[1], [0]])],
        ep=(8, "ep"))
    f1, t1 = contraction_plan(mats[0], mats[1], [[1], [0]], ep=(8, "ep"))
    f2, _ = contraction_plan(t1, mats[2], [[1], [0]], ep=(8, "ep"))

    def old(d0, d1, d2):
        return f2(f1(d0, d1), d2)

    def new(d0, d1, d2):
        return run_chain(d0, d1, d2)

    fn_old = jax.jit(jax.shard_map(old, mesh=mesh, in_specs=(P(),) * 3,
                                   out_specs=P(), check_vma=False))
    fn_new = jax.jit(jax.shard_map(new, mesh=mesh, in_specs=(P(),) * 3,
                                   out_specs=P(), check_vma=False))
    args = [jnp.asarray(m.data) for m in mats]
    np.testing.assert_allclose(np.asarray(fn_new(*args)),
                               np.asarray(fn_old(*args)),
                               rtol=0, atol=1e-6)


def _run_chain_partials_on_mesh(mesh, run, datas):
    """Run a reduce='none' chain: return the per-device partials
    stacked on a leading axis (out_specs P('ep'))."""
    n = len(datas)
    fn = jax.jit(jax.shard_map(
        lambda *d: run(*d)[None], mesh=mesh,
        in_specs=(P(),) * n, out_specs=P("ep"), check_vma=False))
    return np.asarray(fn(*[jnp.asarray(d) for d in datas]))


@pytest.mark.parametrize("kind,seed", [("u1", 0), ("z2", 1), ("z3", 2),
                                       ("u1xz2", 3)])
def test_chain_reduce_none_partials_disjoint_and_exact(rng, mesh, kind,
                                                       seed):
    """Capacity-EP producer path (reduce='none'): per-device partials
    have DISJOINT support and sum to the exact chain output, for every
    charge family — the invariant the reduce-scatter env storage relies
    on."""
    from tensornetwork_tpu.blocksparse.jax_engine import make_chain_executor
    r = np.random.default_rng(100 + seed)
    mk = _charge_factory(kind)
    cs = [mk(r, d) for d in (6, 7, 5, 6)]
    mats = [randn([Index(cs[i], False), Index(cs[i + 1], True)],
                  seed=20 + i) for i in range(3)]
    if any(m.data.size == 0 for m in mats):
        pytest.skip("degenerate random structure (no allowed entries)")
    specs = [(mats[0], mats[1], [1], [0]), (None, mats[2], [1], [0])]
    run, _ = make_chain_executor(specs, 8, "ep", reduce="none")
    partials = _run_chain_partials_on_mesh(mesh, run,
                                           [m.data for m in mats])
    assert partials.shape[0] == 8
    # disjoint support: at most one device owns each position
    support = (partials != 0.0).sum(axis=0)
    assert support.max() <= 1
    # and the sum is the exact chain output
    acc = bst.tensordot(bst.tensordot(mats[0], mats[1], [[1], [0]]),
                        mats[2], [[1], [0]])
    np.testing.assert_allclose(partials.sum(axis=0), acc.data,
                               rtol=0, atol=1e-5)


def test_env_scatter_gather_roundtrip_on_mesh(mesh):
    """env_scatter_stored o env_gather_full == psum, elementwise, for
    ragged nnz (pad tail exercised)."""
    from tensornetwork_tpu.blocksparse.batched import (
        env_block_len, env_gather_full, env_scatter_stored)
    rng2 = np.random.default_rng(0)
    for nnz in (1, 5, 37, 64, 129):
        parts = jnp.asarray(rng2.standard_normal((8, 2, nnz)), jnp.float32)

        def body(p):
            # p: (1, 2, nnz) — this device's partial
            stored = env_scatter_stored(p[0], 8, "ep")
            full = env_gather_full(stored, nnz, "ep")
            return full[None]

        fn = jax.jit(jax.shard_map(
            body, mesh=mesh, in_specs=(P("ep"),), out_specs=P("ep"),
            check_vma=False))
        out = np.asarray(fn(parts))
        expect = np.asarray(parts).sum(axis=0)
        for d in range(8):
            np.testing.assert_allclose(out[d], expect, atol=1e-5)
