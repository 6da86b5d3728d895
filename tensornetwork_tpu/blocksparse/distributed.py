"""Cross-device block-sparse execution — the EP-analog axis
(SURVEY §2.10.2, §7.7; VERDICT round 1 item 4).

Charge sectors are independent GEMMs (the reference executes them
serially in Python, ``block_sparse/blocksparsetensor.py:1094-1101``; the
single-device engine here buckets them into batched GEMMs,
``blocksparse/jax_engine.py``).  This module distributes them over a
device mesh:

* :func:`tensordot_sharded` — the bucketed sector batch is sharded over a
  mesh axis with ``shard_map``; every device contracts its sector shard
  and scatters into a local output vector; sectors touch disjoint output
  regions, so one ``psum`` over the axis reassembles the full result.
* :func:`truncated_svd_distributed` — per-sector SVDs run sharded; the
  (small) per-sector spectra are ``all_gather``-ed so every device
  applies the *identical* global cross-sector singular-value ranking the
  reference computes centrally
  (``backends/symmetric/decompositions.py:70-120``); the factor matrices
  are then masked locally.  Semantics match
  :func:`tensornetwork_tpu.blocksparse.linalg.truncated_svd` exactly.

Both entry points run unchanged on the virtual CPU mesh (tests) and a
real ICI slice.
"""
from __future__ import annotations

from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tensornetwork_tpu.blocksparse.charge import BaseCharge
from tensornetwork_tpu.blocksparse.tensor import (
    BlockSparseTensor, compute_num_nonzero, find_diagonal_blocks)
from tensornetwork_tpu.blocksparse import jax_engine as _engine
from tensornetwork_tpu.blocksparse import linalg as _linalg


def _pad_groups(arrs, G_pad, fill):
    """Pad the leading (sector) axis of each index array to ``G_pad``."""
    out = []
    for a, f in zip(arrs, fill):
        pad = np.full((G_pad - a.shape[0],) + a.shape[1:], f, a.dtype)
        out.append(np.concatenate([a, pad], axis=0))
    return out


def tensordot_sharded(
    t1: BlockSparseTensor,
    t2: BlockSparseTensor,
    axes: Union[int, Sequence[Sequence[int]]],
    mesh: Mesh,
    axis_name: str = "ep",
    precision: str = "highest",
) -> BlockSparseTensor:
    """Symmetric tensordot with charge sectors sharded over ``axis_name``
    and the output reassembled by ``psum``.

    Uses the single-device engine's host-side plan (eager transposes,
    sector maps, shape buckets) but executes each bucket's batched GEMM
    as an SPMD program: index maps ride as sharded inputs, so every
    device runs the same code on its sector shard."""
    if isinstance(axes, int):
        axes1 = list(range(t1.ndim - axes, t1.ndim))
        axes2 = list(range(axes))
    else:
        axes1, axes2 = [list(a) for a in axes]
    ndev = mesh.shape[axis_name]
    plan = _engine._build_plan(t1, t2, axes1, axes2)
    if plan["scalar"]:
        raise NotImplementedError(
            "tensordot_sharded supports tensor-valued outputs; use "
            "tensordot_device for full (scalar) contractions")
    nnz1, nnz2 = plan["nnz1"], plan["nnz2"]
    nnz_out = plan["out"]["nnz"]

    # group sectors by padded GEMM shape (same bucketing as the
    # single-device engine, but always on the uniform elementwise-gather
    # path: SPMD needs identical code on every device)
    groups = {}
    for (m1, m2, mo, s1, s2) in plan["sectors"]:
        key = (_engine._round_dim(s1[0]), _engine._round_dim(s1[1]),
               _engine._round_dim(s2[1]))
        groups.setdefault(key, []).append((m1, m2, mo, s1, s2))

    buckets = []
    for (R, K, C), secs in groups.items():
        G = len(secs)
        G_pad = ((G + ndev - 1) // ndev) * ndev
        M1 = np.full((G, R, K), nnz1, dtype=np.int32)
        M2 = np.full((G, K, C), nnz2, dtype=np.int32)
        MO = np.full((G, R, C), nnz_out, dtype=np.int32)
        for g, (m1, m2, mo, s1, s2) in enumerate(secs):
            M1[g, : s1[0], : s1[1]] = m1
            M2[g, : s2[0], : s2[1]] = m2
            MO[g, : s1[0], : s2[1]] = mo
        M1, M2, MO = _pad_groups([M1, M2, MO], G_pad,
                                 [nnz1, nnz2, nnz_out])
        buckets.append((jnp.asarray(M1), jnp.asarray(M2), jnp.asarray(MO)))

    d1 = jnp.asarray(t1.data)
    d2 = jnp.asarray(t2.data)
    if plan["perm1"] is not None:
        d1 = d1[jnp.asarray(plan["perm1"])]
    if plan["perm2"] is not None:
        d2 = d2[jnp.asarray(plan["perm2"])]

    spec_g = P(axis_name)          # sector axis sharded
    spec_r = P()                   # data vectors replicated

    def body(d1, d2, *bucket_maps):
        # dummy tail: padded index positions (== nnz) read exact zeros /
        # write into a discarded slot
        d1x = jnp.concatenate([d1, jnp.zeros(1, d1.dtype)])
        d2x = jnp.concatenate([d2, jnp.zeros(1, d2.dtype)])
        acc_dtype = jnp.result_type(d1.dtype, d2.dtype)
        out = jnp.zeros(nnz_out + 1, acc_dtype)
        for (M1, M2, MO) in zip(bucket_maps[0::3], bucket_maps[1::3],
                                bucket_maps[2::3]):
            b1 = d1x[M1].astype(acc_dtype)
            b2 = d2x[M2].astype(acc_dtype)
            with jax.default_matmul_precision(precision):
                res = jnp.matmul(b1, b2)
            out = out.at[MO].set(res)
        # sectors write disjoint regions: the sum over devices IS the
        # reassembled output (SURVEY §2.10.2: psum-reduced sector
        # partials)
        return jax.lax.psum(out, axis_name)

    flat_maps = [m for b in buckets for m in b]
    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(spec_r, spec_r) + tuple(
            spec_g for _ in flat_maps),
        out_specs=spec_r)
    result = jax.jit(fn)(d1, d2, *flat_maps)[:-1]

    o = plan["out"]
    out = BlockSparseTensor.__new__(BlockSparseTensor)
    out.data = result
    out._charges = list(o["charges"])
    out._flows = list(o["flows"])
    out._order = [list(g) for g in o["order"]]
    return out


def truncated_svd_distributed(
    matrix: BlockSparseTensor,
    mesh: Mesh,
    max_singular_values: Optional[int] = None,
    max_truncation_error: Optional[float] = None,
    relative: bool = False,
    axis_name: str = "ep",
):
    """Global cross-sector truncated SVD with the per-sector SVDs sharded
    over the mesh and the global ranking computed from ``all_gather``-ed
    spectra (SURVEY §5: "all_gather for spectra needed by global
    truncation" — the distributed form of the reference's padded-stack
    sort, ``backends/symmetric/decompositions.py:70-120``).

    Returns ``(U, S, V, s_rest)`` with semantics identical to
    :func:`tensornetwork_tpu.blocksparse.linalg.truncated_svd`."""
    ndev = mesh.shape[axis_name]
    p, common, maps, shapes, blocks = _linalg._get_blocks(matrix)
    G = len(blocks)
    if G == 0:
        return _linalg.truncated_svd(matrix, max_singular_values,
                                     max_truncation_error, relative)
    Rm = max(b.shape[0] for b in blocks)
    Cm = max(b.shape[1] for b in blocks)
    G_pad = ((G + ndev - 1) // ndev) * ndev
    stack = np.zeros((G_pad, Rm, Cm), matrix.dtype)
    nvals = np.zeros((G_pad,), np.int32)
    for g, b in enumerate(blocks):
        stack[g, : b.shape[0], : b.shape[1]] = b
        nvals[g] = min(b.shape)
    kmax = min(Rm, Cm)
    valid = (np.arange(kmax)[None, :] < nvals[:, None])   # (G_pad, kmax)

    def body(blk, valid_loc):
        # local batched SVD of this device's sector shard
        u, s, vh = jnp.linalg.svd(blk, full_matrices=False)
        s = jnp.where(valid_loc, s, 0.0)
        # the (small) spectra travel; the factors stay put
        s_all = jax.lax.all_gather(s, axis_name, tiled=True)
        return u, s, vh, s_all

    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(axis_name), P(axis_name)),
        out_specs=(P(axis_name), P(axis_name), P(axis_name), P()),
        check_vma=False)
    u_all, s_all, vh_all, spectrum = jax.jit(fn)(
        jnp.asarray(stack), jnp.asarray(valid))

    # identical global ranking on the gathered spectrum (here on host for
    # the numpy reassembly; on-device consumers rank inside the same jit)
    spectrum = np.asarray(jax.device_get(spectrum))[:G]   # (G, kmax)
    flat = spectrum[valid[:G]]
    # reproduce the reference's concatenation order: sector-major
    order = np.argsort(flat, kind="stable")[::-1]
    sorted_s = flat[order]
    keep = sorted_s.shape[0]
    if max_truncation_error is not None:
        err = float(max_truncation_error)
        if relative and sorted_s.size:
            err *= float(sorted_s[0])
        tail = np.sqrt(np.cumsum(sorted_s[::-1] ** 2))
        keep -= int(np.searchsorted(tail, err, side="right"))
    if max_singular_values is not None:
        keep = min(keep, int(max_singular_values))
    keep = max(keep, 0)
    kept_mask = np.zeros(flat.shape[0], dtype=bool)
    kept_mask[order[:keep]] = True
    s_rest = sorted_s[keep:]

    u_all = np.asarray(jax.device_get(u_all))[:G]
    vh_all = np.asarray(jax.device_get(vh_all))[:G]
    offsets = np.concatenate([[0], np.cumsum(nvals[:G])])
    new_us, new_ss, new_vs, ks = [], [], [], []
    for g in range(G):
        m = kept_mask[offsets[g]:offsets[g + 1]]
        k = int(np.sum(m))
        ks.append(k)
        nv = int(nvals[g])
        r, c = blocks[g].shape
        new_us.append(u_all[g][:r, :nv][:, m])
        new_ss.append(spectrum[g][:nv][m])
        new_vs.append(vh_all[g][:nv, :c][m, :])
    bond_charges, _ = _linalg._bond_index(common, ks, True)
    from tensornetwork_tpu.blocksparse.tensor import ChargeArray
    S = ChargeArray(np.concatenate(new_ss) if new_ss else np.zeros(0),
                    [bond_charges], [False])
    U = _linalg._scatter_matrix(new_us, common, matrix._charges[:p],
                                matrix._flows[:p], p, bond_charges, True,
                                matrix.dtype)
    V = _linalg._scatter_matrix_left_bond(
        new_vs, common, BaseCharge(bond_charges.charges,
                                   bond_charges.charge_types),
        False, matrix._charges[p:], matrix._flows[p:], matrix.dtype)
    return U, S, V, s_rest
