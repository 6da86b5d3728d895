"""Device execution for block-sparse contractions.

The host computes the sector metadata exactly as the numpy engine does
(charge fusion, block maps, matching); what runs on device is a compiled
"sector plan": sectors are *shape-bucketed* — every sector whose GEMM
rounds to the same padded (R, K, C) joins one batched gather -> batched
GEMM -> scatter, so a contraction executes as a handful of large batched
matmuls inside a single jit.  Padding gathers read a zero slot appended
to each operand (exact zeros, no masks); padded scatter positions land in
a dummy tail slot of the output.  This moves the reference's serial
per-sector loop (reference ``block_sparse/blocksparsetensor.py:1094-1101``)
onto the MXU and is the execution model for the chi=1024 x
many-realizations U(1) configuration (SURVEY §7.7).

The plan (all index arrays) is cached per (structures, axes) — repeated
contractions with the same charge structure (DMRG sweeps) pay metadata
cost once.
"""
from __future__ import annotations

import functools
from typing import List, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from tensornetwork_tpu.blocksparse.tensor import (
    BlockSparseTensor, find_diagonal_blocks, compute_num_nonzero,
    nonzero_dense_coords, _lookup_key)

from collections import OrderedDict

_PLAN_CACHE: "OrderedDict" = OrderedDict()
_PLAN_CACHE_CAPACITY = 128  # plans pin device index maps; bound the leak


def _structure_key(t: BlockSparseTensor):
    return _lookup_key(t._charges, t._flows, 0) + (
        tuple(tuple(g) for g in t._order),)


def _transpose_perm(t: BlockSparseTensor, flat_perm: List[int]
                    ) -> np.ndarray:
    """Host-computed data permutation realizing an eager transpose."""
    coords = nonzero_dense_coords(t._charges, t._flows)
    new_coords = coords[:, flat_perm]
    new_dims = [t._charges[i].dim for i in flat_perm]
    new_linear = np.ravel_multi_index(tuple(new_coords.T), new_dims)
    return np.argsort(new_linear, kind="stable")


def _build_plan(t1: BlockSparseTensor, t2: BlockSparseTensor,
                axes1: List[int], axes2: List[int]):
    """Metadata for the device executor; mirrors tensor.tensordot."""
    free1 = [i for i in range(t1.ndim) if i not in axes1]
    free2 = [i for i in range(t2.ndim) if i not in axes2]
    flat_perm1 = [i for g in [t1._order[o] for o in free1 + axes1]
                  for i in g]
    flat_perm2 = [i for g in [t2._order[o] for o in axes2 + free2]
                  for i in g]
    perm1 = (None if flat_perm1 == list(range(len(t1._charges)))
             else _transpose_perm(t1, flat_perm1))
    perm2 = (None if flat_perm2 == list(range(len(t2._charges)))
             else _transpose_perm(t2, flat_perm2))
    m1 = t1.transpose(free1 + axes1)
    m2 = t2.transpose(axes2 + free2)
    p1 = sum(len(m1._order[k]) for k in range(len(free1)))
    p2 = sum(len(m2._order[k]) for k in range(len(axes2)))
    common1, maps1, shapes1 = find_diagonal_blocks(m1._charges, m1._flows,
                                                   p1)
    common2, maps2, shapes2 = find_diagonal_blocks(m2._charges, m2._flows,
                                                   p2)
    out_charges = (m1._charges[:p1] + m2._charges[p2:])
    out_flows = (m1._flows[:p1] + m2._flows[p2:])
    out_order: List[List[int]] = []
    k = 0
    for i in range(len(free1)):
        g = m1._order[i]
        out_order.append(list(range(k, k + len(g))))
        k += len(g)
    for i in range(len(axes2), m2.ndim):
        g = m2._order[i]
        out_order.append(list(range(k, k + len(g))))
        k += len(g)
    scalar_out = len(out_charges) == 0
    sectors = []
    if scalar_out:
        _, ia, ib = common1.intersect(common2, return_indices=True)
        for t in range(len(ia)):
            sectors.append((maps1[ia[t]], maps2[ib[t]], None,
                            shapes1[ia[t]], shapes2[ib[t]]))
        return dict(perm1=perm1, perm2=perm2, sectors=sectors,
                    scalar=True, out=None,
                    nnz1=t1.data.size, nnz2=t2.data.size)
    out_nnz = compute_num_nonzero(out_charges, out_flows)
    p_out = sum(len(out_order[i]) for i in range(len(free1)))
    common_out, maps_out, shapes_out = find_diagonal_blocks(
        out_charges, out_flows, p_out)
    _, ia, ib = common1.intersect(common2, return_indices=True)
    subset = common1[ia]
    _, io, ic = common_out.intersect(subset, return_indices=True)
    for t in range(len(io)):
        s1, s2 = ia[ic[t]], ib[ic[t]]
        sectors.append((maps1[s1], maps2[s2], maps_out[io[t]],
                        shapes1[s1], shapes2[s2]))
    return dict(perm1=perm1, perm2=perm2, sectors=sectors, scalar=False,
                out=dict(nnz=out_nnz, charges=out_charges,
                         flows=out_flows, order=out_order),
                nnz1=t1.data.size, nnz2=t2.data.size)


# below this window width, windowed dynamic-slice fetch loses to one
# padded elementwise gather (TPU gathers amortize per-element cost only
# over wide contiguous runs)
_MIN_RUN = 32


def _round_dim(x: int) -> int:
    """Bucket rounding: small dims to the next power of two (>=8), large
    dims to the next multiple of 128 (one MXU tile)."""
    if x >= 128:
        return ((x + 127) // 128) * 128
    p = 8
    while p < x:
        p *= 2
    return p


def _build_buckets(plan, windows: bool = True, pad_groups_to: int = 1):
    """Group sectors by padded GEMM shape so each bucket executes as ONE
    batched matmul on the MXU (SURVEY §7.7: shape-bucketed ragged sector
    matmuls) instead of one underfilled GEMM per charge sector.

    Block rows are *contiguous runs* in the flat data vector (the maps
    from ``find_diagonal_blocks`` are ``start + arange(width)`` per row),
    so operand blocks are fetched as slice-gathers (windowed
    ``dynamic_slice``) instead of elementwise gathers — the form the TPU
    memory system executes at HBM bandwidth.  Columns past a sector's
    true width (bucket padding) would read the *next* run's data; a
    static per-sector column mask zeroes them before the GEMM.

    ``windows=False`` forces the uniform elementwise-gather path and
    ``pad_groups_to`` pads each bucket's sector count to a multiple —
    both required by the EP (sector-sharded) executor, whose per-device
    dynamic slicing needs identical code and divisible group counts.
    """
    groups = {}
    for idx, (m1, m2, mo, s1, s2) in enumerate(plan["sectors"]):
        key = (_round_dim(s1[0]), _round_dim(s1[1]), _round_dim(s2[1]))
        groups.setdefault(key, []).append((m1, m2, mo, s1, s2))
    buckets = []
    for (R, K, C), secs in groups.items():
        G0 = len(secs)
        G = ((G0 + pad_groups_to - 1) // pad_groups_to) * pad_groups_to
        secs = secs + [(None, None, None, (0, 0), (0, 0))] * (G - G0)
        # windowed (slice) fetch pays off only for wide runs; narrow runs
        # (window < _MIN_RUN) fall back to one padded elementwise gather
        win1 = windows and K >= _MIN_RUN
        win2 = windows and C >= _MIN_RUN
        win_o = windows and C >= _MIN_RUN
        S1 = np.full((G, R), plan["nnz1"], dtype=np.int32)
        S2 = np.full((G, K), plan["nnz2"], dtype=np.int32)
        M1 = np.full((G, R, K), plan["nnz1"], dtype=np.int32)
        M2 = np.full((G, K, C), plan["nnz2"], dtype=np.int32)
        nnz_out = 0 if plan["scalar"] else plan["out"]["nnz"]
        MO = np.full((G, R, C), nnz_out, dtype=np.int32)
        mask1 = np.zeros((G, 1, K), dtype=np.float32)
        mask2 = np.zeros((G, 1, C), dtype=np.float32)
        scatters = []
        for g, (m1, m2, mo, s1, s2) in enumerate(secs):
            if m1 is None:      # group padding (EP divisibility)
                continue
            S1[g, : s1[0]] = m1[:, 0]
            S2[g, : s2[0]] = m2[:, 0]
            M1[g, : s1[0], : s1[1]] = m1
            M2[g, : s2[0], : s2[1]] = m2
            mask1[g, 0, : s1[1]] = 1.0
            mask2[g, 0, : s2[1]] = 1.0
            if mo is not None:
                MO[g, : s1[0], : s2[1]] = mo
                scatters.append((g, s1[0], s2[1],
                                 mo[:, 0].astype(np.int32)))
        buckets.append(dict(
            R=R, K=K, C=C, win1=win1, win2=win2, win_o=win_o,
            S1=S1 if win1 else None, S2=S2 if win2 else None,
            M1=None if win1 else M1, M2=None if win2 else M2,
            MO=None if win_o or plan["scalar"] else MO,
            mask1=mask1, mask2=mask2,
            scatters=scatters if win_o else []))
    return buckets


def _get_plan(t1, t2, axes1, axes2, precision="highest", ep=None):
    """``ep=(ndev, axis_name)`` builds the sector-sharded (EP) executor:
    the caller must run it inside a ``shard_map`` over ``axis_name``."""
    key = (_structure_key(t1), _structure_key(t2), tuple(axes1),
           tuple(axes2), precision, ep)
    plan = _PLAN_CACHE.get(key)
    if plan is not None:
        _PLAN_CACHE.move_to_end(key)
    if plan is None:
        plan = _build_plan(t1, t2, axes1, axes2)
        def dev(x):
            return None if x is None else jnp.asarray(x)

        bucket_kw = ({} if ep is None
                     else dict(windows=False, pad_groups_to=ep[0]))
        plan["jx"] = [
            dict(R=b["R"], K=b["K"], C=b["C"],
                 win1=b["win1"], win2=b["win2"], win_o=b["win_o"],
                 S1=dev(b["S1"]), S2=dev(b["S2"]),
                 M1=dev(b["M1"]), M2=dev(b["M2"]), MO=dev(b["MO"]),
                 mask1=jnp.asarray(b["mask1"]),
                 mask2=jnp.asarray(b["mask2"]),
                 scatters=[(g, r, c, jnp.asarray(so))
                           for (g, r, c, so) in b["scatters"]])
            for b in _build_buckets(plan, **bucket_kw)]
        plan["jp1"] = (None if plan["perm1"] is None
                       else jnp.asarray(plan["perm1"]))
        plan["jp2"] = (None if plan["perm2"] is None
                       else jnp.asarray(plan["perm2"]))
        plan["run"] = _make_executor(plan, precision, ep=ep)
        _PLAN_CACHE[key] = plan
        while len(_PLAN_CACHE) > _PLAN_CACHE_CAPACITY:
            _PLAN_CACHE.popitem(last=False)
    return plan


def _slice_gather(dx, starts, width):
    """(G, R) start positions -> (G, R, width) contiguous windows."""
    return jax.vmap(jax.vmap(
        lambda s: jax.lax.dynamic_slice(dx, (s,), (width,))))(starts)


def _window_scatter(out, starts, updates):
    """Write ``updates[i]`` (rows of width C) at ``out[starts[i]:...]``.
    Runs are disjoint and ordered -> unique/sorted scatter."""
    dnums = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(1,), inserted_window_dims=(),
        scatter_dims_to_operand_dims=(0,))
    return jax.lax.scatter(
        out, starts[:, None], updates, dnums,
        indices_are_sorted=True, unique_indices=True,
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)


def _make_executor(plan, precision: str = "highest", ep=None):
    """Build the contraction executor.

    ``ep=None``: the single-device program (windowed fetch, one jit).
    ``ep=(ndev, axis_name)``: the sector-sharded SPMD body (EP-analog,
    SURVEY §2.10.2) — each device gathers and multiplies only its
    ``G/ndev`` slice of every bucket's sector stack (selected by
    ``lax.axis_index``) and the disjoint sector outputs are reassembled
    with ONE ``psum`` per contraction.  Must be called inside a
    ``shard_map`` over ``axis_name`` with replicated data operands; not
    jitted here (the enclosing program is)."""
    max_k = max((b["K"] for b in plan["jx"]), default=1)
    max_c = max((b["C"] for b in plan["jx"]), default=1)

    def fetch1(d1x, b, acc_dtype):
        if b["win1"]:
            blk = _slice_gather(d1x, b["S1"], b["K"])
            return blk * b["mask1"].astype(acc_dtype)
        return d1x[b["M1"]]

    def fetch2(d2x, b, acc_dtype):
        if b["win2"]:
            blk = _slice_gather(d2x, b["S2"], b["C"])
            return blk * b["mask2"].astype(acc_dtype)
        return d2x[b["M2"]]

    if ep is not None:
        ndev, axis_name = ep

        def run_ep(d1, d2):
            with jax.default_matmul_precision(precision):
                d1p = d1 if plan["jp1"] is None else d1[plan["jp1"]]
                d2p = d2 if plan["jp2"] is None else d2[plan["jp2"]]
                d1x = jnp.concatenate([d1p, jnp.zeros(1, d1.dtype)])
                d2x = jnp.concatenate([d2p, jnp.zeros(1, d2.dtype)])
                acc_dtype = jnp.result_type(d1.dtype, d2.dtype)
                idx = jax.lax.axis_index(axis_name)

                def loc(M):
                    g_loc = M.shape[0] // ndev
                    return jax.lax.dynamic_slice_in_dim(
                        M, idx * g_loc, g_loc, axis=0)

                if plan["scalar"]:
                    total = jnp.zeros((), acc_dtype)
                    for b in plan["jx"]:
                        b1 = d1x[loc(b["M1"])]
                        b2 = d2x[loc(b["M2"])]
                        total = total + jnp.sum(jnp.matmul(b1, b2))
                    return jax.lax.psum(total, axis_name)
                out = jnp.zeros(plan["out"]["nnz"] + 1, acc_dtype)
                for b in plan["jx"]:
                    b1 = d1x[loc(b["M1"])]
                    b2 = d2x[loc(b["M2"])]
                    res = jnp.matmul(b1, b2)
                    out = out.at[loc(b["MO"])].set(res)
                # sectors touch disjoint regions: the sum over devices IS
                # the reassembly — one psum per contraction
                return jax.lax.psum(out, axis_name)[:-1]

        return run_ep

    @jax.jit
    def run(d1, d2):
        with jax.default_matmul_precision(precision):
            d1p = d1 if plan["jp1"] is None else d1[plan["jp1"]]
            d2p = d2 if plan["jp2"] is None else d2[plan["jp2"]]
            # zero tail: dummy positions (index/start = nnz) and padded
            # window edges read exact zeros
            d1x = jnp.concatenate([d1p, jnp.zeros(max_k, d1.dtype)])
            d2x = jnp.concatenate([d2p, jnp.zeros(max_c, d2.dtype)])
            acc_dtype = jnp.result_type(d1.dtype, d2.dtype)
            if plan["scalar"]:
                total = jnp.zeros((), acc_dtype)
                for b in plan["jx"]:
                    b1 = fetch1(d1x, b, acc_dtype)
                    b2 = fetch2(d2x, b, acc_dtype)
                    total = total + jnp.sum(jnp.matmul(b1, b2))
                return total
            # trailing dummy slot absorbs elementwise-scatter padding
            out = jnp.zeros(plan["out"]["nnz"] + 1, acc_dtype)
            for b in plan["jx"]:
                b1 = fetch1(d1x, b, acc_dtype)              # (G, R, K)
                b2 = fetch2(d2x, b, acc_dtype)              # (G, K, C)
                res = jnp.matmul(b1, b2)                    # batched GEMM
                if b["win_o"]:
                    for (g, r, c, so) in b["scatters"]:
                        out = _window_scatter(out, so, res[g, :r, :c])
                else:
                    out = out.at[b["MO"]].set(res)
            return out[:-1]

    return run


def tensordot_device(
    t1: BlockSparseTensor,
    t2: BlockSparseTensor,
    axes: Union[int, Sequence[Sequence[int]]] = 2,
    precision: str = "highest",
):
    """Sector tensordot executed on the accelerator.

    Returns a BlockSparseTensor whose ``data`` is a ``jax.Array`` (or a
    jnp scalar for full contractions).  Metadata is host-cached per
    charge structure; the device program is one jit with the sector GEMMs
    unrolled.
    """
    if isinstance(axes, int):
        axes1 = list(range(t1.ndim - axes, t1.ndim))
        axes2 = list(range(axes))
    else:
        axes1, axes2 = [list(a) for a in axes]
    if len(axes1) == 0:
        from tensornetwork_tpu.blocksparse.tensor import outerproduct
        return outerproduct(t1, t2)
    # same loud validation as the numpy engine: without it, mismatched
    # charges/flows would just find no common sectors and silently
    # return zeros
    s1, s2 = t1.sparse_shape, t2.sparse_shape
    for a1, a2 in zip(axes1, axes2):
        i1, i2 = s1[a1], s2[a2]
        if i1.dim != i2.dim:
            raise ValueError(
                f"cannot contract axes with dims {i1.dim} and {i2.dim}")
        if not np.array_equal(i1.charges.charges,
                              i2.charges.dual(True).charges):
            raise ValueError(
                "contracted legs have incompatible charges/flows")
    plan = _get_plan(t1, t2, axes1, axes2, precision)
    d1 = jnp.asarray(t1.data)
    d2 = jnp.asarray(t2.data)
    result = plan["run"](d1, d2)
    if plan["scalar"]:
        return result
    o = plan["out"]
    # keep the result device-resident: chained device contractions (env
    # growth, Lanczos matvecs) then never roundtrip host<->HBM; numpy
    # consumers trigger the transfer lazily via __array__.
    out = BlockSparseTensor.__new__(BlockSparseTensor)
    out.data = result
    out._charges = list(o["charges"])
    out._flows = list(o["flows"])
    out._order = [list(g) for g in o["order"]]
    return out


def to_device(t: BlockSparseTensor) -> BlockSparseTensor:
    """Pin a block-sparse tensor's data on the accelerator.

    Chained :func:`tensordot_device` calls keep results device-resident,
    but *inputs* with numpy data (MPO tensors, boundaries) would be
    re-uploaded on every contraction; convert them once with this."""
    out = BlockSparseTensor.__new__(BlockSparseTensor)
    out.data = jnp.asarray(t.data)
    out._charges = list(t._charges)
    out._flows = list(t._flows)
    out._order = [list(g) for g in t._order]
    return out


def from_device(t: BlockSparseTensor) -> BlockSparseTensor:
    """Materialize a device-resident block-sparse tensor back to numpy."""
    return BlockSparseTensor(np.asarray(t.data), t._charges, t._flows,
                             [list(g) for g in t._order])


def clear_plan_cache():
    _PLAN_CACHE.clear()
    _CHAIN_CACHE.clear()


# ---------------------------------------------------------------------------
# EP fused-chain executor (VERDICT r3 item 2)
#
# The per-contraction EP executor above reassembles EVERY intermediate
# with a full-size psum — for the DMRG H_eff matvec chain that is
# ~(2*Dw+1) x nnz(x) of payload per matvec (BASELINE.md: 257.5 MB per
# batched sweep at chi=1024, 232x the MPS nnz).  Cross-device reduction
# belongs at sector-partial boundaries (SURVEY §2.10.2): a chain of
# contractions y = C_n(...C_2(C_1(a, b), e_2)..., e_n) is LINEAR in the
# through-operand, and its (stage, sector) dependency graph — sector s
# of stage k reads intermediate positions written by sectors of stage
# k-1 — decomposes into connected components (for the DMRG chain these
# are the classes of the persistent free-leg charge).  Each component is
# closed under reads, so assigning WHOLE components to devices makes
# stages 2..n device-local: the only collective is ONE psum of the final
# (x-sized) output per chain, and the result is bit-identical to the
# single-device program (disjoint-support summands).
# ---------------------------------------------------------------------------

_CHAIN_CACHE: "OrderedDict" = OrderedDict()
_CHAIN_CACHE_CAPACITY = 64


def _out_skel_of_raw(raw):
    """Skeleton tensor for a raw plan's output (host metadata only)."""
    o = raw["out"]
    t = BlockSparseTensor.__new__(BlockSparseTensor)
    t.data = np.zeros(o["nnz"], np.float32)
    t._charges = [c.copy() for c in o["charges"]]
    t._flows = list(o["flows"])
    t._order = [list(g) for g in o["order"]]
    return t


class _UnionFind:
    def __init__(self, n: int):
        self.p = np.arange(n)

    def find(self, i: int) -> int:
        p = self.p
        root = i
        while p[root] != root:
            root = p[root]
        while p[i] != root:
            p[i], i = root, p[i]
        return root

    def union(self, a: int, b: int):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.p[rb] = ra


def _partition_chain(raws, ndev: int):
    """Assign every (stage, sector) to a device.

    Components of the read/write dependency graph are FLOP-weighted and
    greedily bin-packed onto ``ndev`` devices (heaviest first).  Sectors
    whose through-operand input is structurally never written are dead
    (contribute exact zeros) and dropped; sectors whose output is never
    read by any live downstream sector are pruned backwards.

    Returns ``assign``: list over stages of int arrays (device id per
    sector, -1 = dropped).
    """
    n_stages = len(raws)
    counts = [len(r["sectors"]) for r in raws]
    offsets = np.cumsum([0] + counts)
    uf = _UnionFind(offsets[-1])
    live = [np.ones(c, bool) for c in counts]

    prev_writer = None
    for k, raw in enumerate(raws):
        if k > 0:
            perm = raw["perm1"]
            for t, (m1, _m2, _mo, _s1, _s2) in enumerate(raw["sectors"]):
                pos = m1.ravel()
                if perm is not None:
                    pos = perm[pos]
                ws = np.unique(prev_writer[pos])
                ws = ws[ws >= 0]
                if ws.size == 0:
                    live[k][t] = False
                    continue
                for w in ws:
                    uf.union(offsets[k] + t, offsets[k - 1] + int(w))
        wv = np.full(raw["out"]["nnz"], -1, np.int64)
        for t, (_m1, _m2, mo, _s1, _s2) in enumerate(raw["sectors"]):
            if live[k][t]:
                wv[mo.ravel()] = t
        prev_writer = wv

    # backward prune: a sector below the last stage whose output no live
    # downstream sector reads only produces dead intermediates
    for k in range(n_stages - 2, -1, -1):
        nxt = raws[k + 1]
        perm = nxt["perm1"]
        read = np.zeros(raws[k]["out"]["nnz"], bool)
        for t, (m1, _m2, _mo, _s1, _s2) in enumerate(nxt["sectors"]):
            if live[k + 1][t]:
                pos = m1.ravel()
                if perm is not None:
                    pos = perm[pos]
                read[pos] = True
        for t, (_m1, _m2, mo, _s1, _s2) in enumerate(raws[k]["sectors"]):
            if live[k][t] and not read[mo.ravel()].any():
                live[k][t] = False

    comp_weight: dict = {}
    comp_nodes: dict = {}
    for k, raw in enumerate(raws):
        for t, (_m1, _m2, _mo, s1, s2) in enumerate(raw["sectors"]):
            if not live[k][t]:
                continue
            root = uf.find(offsets[k] + t)
            w = 2 * s1[0] * s1[1] * s2[1]  # GEMM flops
            comp_weight[root] = comp_weight.get(root, 0) + w
            comp_nodes.setdefault(root, []).append((k, t))
    bins = np.zeros(ndev, np.float64)
    dev_of_comp = {}
    for root in sorted(comp_weight, key=comp_weight.get, reverse=True):
        d = int(np.argmin(bins))
        bins[d] += comp_weight[root]
        dev_of_comp[root] = d
    assign = [np.full(c, -1, np.int32) for c in counts]
    for root, nodes in comp_nodes.items():
        d = dev_of_comp[root]
        for k, t in nodes:
            assign[k][t] = d
    return assign, bins


def _stacked_stage_buckets(raw, assign_k, ndev: int):
    """Per-device sub-plans packed as device-indexed constant arrays.

    Every device runs the SAME program; device d's sector set enters as
    the leading axis of the (ndev, G, ...) index tensors, selected by
    ``axis_index``.  Per-device group counts are padded to the per-key
    max with sentinel indices (reads hit the appended zero slot, writes
    the dummy output tail) — no lax.switch, one compiled body.
    """
    nnz1, nnz2 = raw["nnz1"], raw["nnz2"]
    out_nnz = raw["out"]["nnz"]
    per_dev = []
    for d in range(ndev):
        sub = dict(raw)
        sub["sectors"] = [s for t, s in enumerate(raw["sectors"])
                          if assign_k[t] == d]
        per_dev.append({(b["R"], b["K"], b["C"]): b
                        for b in _build_buckets(sub, windows=False)})
    keys = sorted({k for bd in per_dev for k in bd})
    stages = []
    for (R, K, C) in keys:
        gmax = max((bd[(R, K, C)]["M1"].shape[0]
                    for bd in per_dev if (R, K, C) in bd), default=0)
        if gmax == 0:
            continue
        M1 = np.full((ndev, gmax, R, K), nnz1, np.int32)
        M2 = np.full((ndev, gmax, K, C), nnz2, np.int32)
        MO = np.full((ndev, gmax, R, C), out_nnz, np.int32)
        for d, bd in enumerate(per_dev):
            b = bd.get((R, K, C))
            if b is None:
                continue
            g = b["M1"].shape[0]
            M1[d, :g] = b["M1"]
            M2[d, :g] = b["M2"]
            MO[d, :g] = b["MO"]
        stages.append(dict(M1=jnp.asarray(M1), M2=jnp.asarray(M2),
                           MO=jnp.asarray(MO)))
    return stages


def make_chain_executor(specs, ndev: int, axis_name: str,
                        precision: str = "highest",
                        reduce: str = "psum"):
    """Fused EP executor for a contraction chain.

    ``specs``: list of ``(skel1, skel2, axes1, axes2)``; for stages
    after the first, ``skel1`` may be ``None`` (the previous stage's
    output — the through-operand).  Returns ``(run, out_skel)`` where
    ``run(d1_0, d2_0, d2_1, ..., d2_{n-1})`` maps flat data vectors to
    the final output data vector, must execute inside a ``shard_map``
    over ``axis_name`` with replicated operands, and issues exactly ONE
    ``psum`` (of the final output) for the whole chain.

    ``reduce="none"`` skips the final psum and returns the PER-DEVICE
    partial (full output length, non-zero only on this device's
    component support; partials across devices have disjoint support
    and sum to the exact output).  This is the capacity-EP producer
    path (VERDICT r4 item 1): the caller reduce-scatters the partial
    into the sharded env storage layout instead of replicating it —
    see ``blocksparse.batched.env_scatter_stored``.
    """
    raws = []
    prev_out = None
    key_parts = []
    for k, (s1, s2, a1, a2) in enumerate(specs):
        if s1 is None:
            if k == 0:
                raise ValueError("stage 0 needs an explicit first operand")
            s1 = prev_out
        raw = _build_plan(s1, s2, list(a1), list(a2))
        if raw["scalar"]:
            raise ValueError("chain stages must produce tensors")
        key_parts.append((_structure_key(s1), _structure_key(s2),
                          tuple(a1), tuple(a2)))
        raws.append(raw)
        prev_out = _out_skel_of_raw(raw)
    key = (tuple(key_parts), ndev, axis_name, precision, reduce)
    cached = _CHAIN_CACHE.get(key)
    if cached is not None:
        _CHAIN_CACHE.move_to_end(key)
        return cached["run"], cached["out_skel"]

    assign, _bins = _partition_chain(raws, ndev)
    stage_meta = []
    for k, raw in enumerate(raws):
        stage_meta.append(dict(
            jx=_stacked_stage_buckets(raw, assign[k], ndev),
            jp1=None if raw["perm1"] is None else jnp.asarray(raw["perm1"]),
            jp2=None if raw["perm2"] is None else jnp.asarray(raw["perm2"]),
            out_nnz=raw["out"]["nnz"]))

    def _apply(st, d1, d2, idx, acc_dtype):
        d1p = d1 if st["jp1"] is None else d1[st["jp1"]]
        d2p = d2 if st["jp2"] is None else d2[st["jp2"]]
        d1x = jnp.concatenate([d1p, jnp.zeros(1, d1.dtype)])
        d2x = jnp.concatenate([d2p, jnp.zeros(1, d2.dtype)])
        out = jnp.zeros(st["out_nnz"] + 1, acc_dtype)
        for b in st["jx"]:
            b1 = d1x[b["M1"][idx]]
            b2 = d2x[b["M2"][idx]]
            out = out.at[b["MO"][idx]].set(
                jnp.matmul(b1, b2).astype(acc_dtype))
        return out[:-1]

    def run(*data):
        if len(data) != len(raws) + 1:
            raise TypeError(
                f"chain executor takes {len(raws) + 1} data vectors")
        idx = jax.lax.axis_index(axis_name)
        acc_dtype = data[0].dtype
        for d in data[1:]:
            acc_dtype = jnp.result_type(acc_dtype, d.dtype)
        with jax.default_matmul_precision(precision):
            cur = _apply(stage_meta[0], data[0], data[1], idx, acc_dtype)
            for k in range(1, len(raws)):
                cur = _apply(stage_meta[k], cur, data[k + 1], idx,
                             acc_dtype)
        # per-device partials have disjoint support (components are
        # closed under reads): the sum IS the exact reassembly
        if reduce == "none":
            return cur
        return jax.lax.psum(cur, axis_name)

    out_skel = prev_out
    _CHAIN_CACHE[key] = dict(run=run, out_skel=out_skel)
    while len(_CHAIN_CACHE) > _CHAIN_CACHE_CAPACITY:
        _CHAIN_CACHE.popitem(last=False)
    return run, out_skel
