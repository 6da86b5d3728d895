"""Device execution for block-sparse contractions.

The host computes the sector metadata exactly as the numpy engine does
(charge fusion, block maps, matching); what runs on device is a compiled
"sector plan": per charge sector one gather -> GEMM -> scatter, unrolled
inside a single jit.  This moves the reference's serial per-sector loop
(reference ``block_sparse/blocksparsetensor.py:1094-1101``) onto the MXU
and is the execution model for the chi=1024 x many-realizations U(1)
configuration (SURVEY §7.7): the ragged sector matmuls become a handful
of dense GEMMs per contraction.

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
                    scalar=True, out=None)
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
                         flows=out_flows, order=out_order))


def _get_plan(t1, t2, axes1, axes2, precision="highest"):
    key = (_structure_key(t1), _structure_key(t2), tuple(axes1),
           tuple(axes2), precision)
    plan = _PLAN_CACHE.get(key)
    if plan is not None:
        _PLAN_CACHE.move_to_end(key)
    if plan is None:
        plan = _build_plan(t1, t2, axes1, axes2)
        # device constants for the executor
        plan["jx"] = [
            (jnp.asarray(m1.reshape(-1)), jnp.asarray(m2.reshape(-1)),
             None if mo is None else jnp.asarray(mo.reshape(-1)),
             s1, s2)
            for (m1, m2, mo, s1, s2) in plan["sectors"]]
        plan["jp1"] = (None if plan["perm1"] is None
                       else jnp.asarray(plan["perm1"]))
        plan["jp2"] = (None if plan["perm2"] is None
                       else jnp.asarray(plan["perm2"]))
        plan["run"] = _make_executor(plan, precision)
        _PLAN_CACHE[key] = plan
        while len(_PLAN_CACHE) > _PLAN_CACHE_CAPACITY:
            _PLAN_CACHE.popitem(last=False)
    return plan


def _make_executor(plan, precision: str = "highest"):
    @jax.jit
    def run(d1, d2):
        with jax.default_matmul_precision(precision):
            d1p = d1 if plan["jp1"] is None else d1[plan["jp1"]]
            d2p = d2 if plan["jp2"] is None else d2[plan["jp2"]]
            if plan["scalar"]:
                total = jnp.zeros((), jnp.result_type(d1.dtype, d2.dtype))
                for (m1, m2, _, s1, s2) in plan["jx"]:
                    b1 = d1p[m1].reshape(s1)
                    b2 = d2p[m2].reshape(s2)
                    total = total + jnp.sum(b1 * b2.T)
                return total
            out = jnp.zeros(plan["out"]["nnz"],
                            jnp.result_type(d1.dtype, d2.dtype))
            for (m1, m2, mo, s1, s2) in plan["jx"]:
                b1 = d1p[m1].reshape(s1)
                b2 = d2p[m2].reshape(s2)
                res = jnp.dot(b1, b2)
                out = out.at[mo].set(res.reshape(-1))
            return out

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
    return BlockSparseTensor(np.asarray(result), o["charges"], o["flows"],
                             [list(g) for g in o["order"]])


def clear_plan_cache():
    _PLAN_CACHE.clear()
