"""Linear algebra on block-sparse tensors.

Capability parity with the reference sparse linalg (reference
``block_sparse/linalg.py:35-704``): per-charge-sector decompositions with
*global* cross-block singular-value truncation (reference
``backends/symmetric/decompositions.py:70-120``), diag/trace/pinv/eye.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from tensornetwork_tpu.blocksparse.charge import BaseCharge
from tensornetwork_tpu.blocksparse.index import Index
from tensornetwork_tpu.blocksparse.tensor import (
    BlockSparseTensor, ChargeArray, find_diagonal_blocks,
    _col_indices_per_sector, compute_num_nonzero)


def _matrix_partition(t: BlockSparseTensor) -> int:
    if t.ndim != 2:
        raise ValueError(f"expected a rank-2 tensor, got rank {t.ndim}")
    return len(t._order[0])


def _bond_index(sectors: BaseCharge, ks: Sequence[int],
                flow: bool) -> Tuple[BaseCharge, Index]:
    reps = np.repeat(np.arange(sectors.dim), np.asarray(ks, dtype=np.int64))
    bond_charges = BaseCharge(sectors.charges[reps], sectors.charge_types)
    return bond_charges, Index(bond_charges, flow)


def _scatter_matrix(blocks: List[np.ndarray], sectors: BaseCharge,
                    row_charges, row_flows, row_order_len: int,
                    bond_charges: BaseCharge, bond_flow: bool,
                    dtype) -> BlockSparseTensor:
    """Build the (rows..., bond) tensor from per-sector blocks."""
    charges = list(row_charges) + [bond_charges]
    flows = list(row_flows) + [bond_flow]
    order = [list(range(row_order_len)), [row_order_len]]
    nnz = compute_num_nonzero(charges, flows)
    out = BlockSparseTensor(np.zeros(nnz, dtype=dtype), charges, flows,
                            order)
    common, maps, shapes = find_diagonal_blocks(charges, flows,
                                                row_order_len)
    _, io, isec = common.intersect(sectors, return_indices=True)
    for t in range(len(io)):
        out.data[maps[io[t]]] = blocks[isec[t]]
    return out


def _scatter_matrix_left_bond(blocks: List[np.ndarray],
                              sectors: BaseCharge,
                              bond_charges: BaseCharge, bond_flow: bool,
                              col_charges, col_flows,
                              dtype) -> BlockSparseTensor:
    """Build the (bond, cols...) tensor from per-sector blocks."""
    charges = [bond_charges] + list(col_charges)
    flows = [bond_flow] + list(col_flows)
    order = [[0], list(range(1, 1 + len(col_charges)))]
    nnz = compute_num_nonzero(charges, flows)
    out = BlockSparseTensor(np.zeros(nnz, dtype=dtype), charges, flows,
                            order)
    common, maps, shapes = find_diagonal_blocks(charges, flows, 1)
    _, io, isec = common.intersect(sectors, return_indices=True)
    for t in range(len(io)):
        out.data[maps[io[t]]] = blocks[isec[t]]
    return out


def _get_blocks(t: BlockSparseTensor):
    p = _matrix_partition(t)
    common, maps, shapes = find_diagonal_blocks(t._charges, t._flows, p)
    blocks = [t.data[m] for m in maps]
    return p, common, maps, shapes, blocks


def svd(matrix: BlockSparseTensor, full_matrices: bool = False,
        compute_uv: bool = True, hermitian: bool = False):
    """Per-sector SVD.  Returns ``(U, S, V)`` with ``S`` a rank-1
    :class:`ChargeArray` over the new bond (reference
    ``block_sparse/linalg.py:183``)."""
    if full_matrices:
        raise NotImplementedError(
            "full_matrices=True is not supported for block-sparse svd")
    p, common, maps, shapes, blocks = _get_blocks(matrix)
    us, ss, vs, ks = [], [], [], []
    for b in blocks:
        if compute_uv:
            u, s, vh = np.linalg.svd(b, full_matrices=False)
            us.append(u); ss.append(s); vs.append(vh)
        else:
            ss.append(np.linalg.svd(b, compute_uv=False))
        ks.append(min(b.shape))
    bond_charges, _ = _bond_index(common, ks, True)
    s_data = np.concatenate(ss) if ss else np.zeros(0)
    S = ChargeArray(s_data, [bond_charges], [False])
    if not compute_uv:
        return S
    U = _scatter_matrix(us, common, matrix._charges[:p],
                        matrix._flows[:p], p, bond_charges, True,
                        matrix.dtype)
    bond_charges_v = BaseCharge(bond_charges.charges,
                                bond_charges.charge_types)
    V = _scatter_matrix_left_bond(vs, common, bond_charges_v, False,
                                  matrix._charges[p:], matrix._flows[p:],
                                  matrix.dtype)
    return U, S, V


def truncated_svd(matrix: BlockSparseTensor,
                  max_singular_values: Optional[int] = None,
                  max_truncation_error: Optional[float] = None,
                  relative: bool = False):
    """SVD with *global* cross-sector truncation: all sectors' singular
    values are ranked together and the weakest discarded (reference
    ``backends/symmetric/decompositions.py:27-130``).

    Returns ``(U, S, V, s_rest)`` with ``s_rest`` the discarded values
    (descending)."""
    p, common, maps, shapes, blocks = _get_blocks(matrix)
    us, ss, vs = [], [], []
    for b in blocks:
        u, s, vh = np.linalg.svd(b, full_matrices=False)
        us.append(u); ss.append(s); vs.append(vh)
    all_s = np.concatenate(ss) if ss else np.zeros(0)
    order = np.argsort(all_s)[::-1]
    sorted_s = all_s[order]
    keep = sorted_s.shape[0]
    if max_truncation_error is not None:
        err = float(max_truncation_error)
        if relative and sorted_s.size:
            err *= float(sorted_s[0])
        tail = np.sqrt(np.cumsum(sorted_s[::-1] ** 2))
        num_discard = int(np.searchsorted(tail, err, side="right"))
        keep -= num_discard
    if max_singular_values is not None:
        keep = min(keep, int(max_singular_values))
    keep = max(keep, 0)
    kept_mask = np.zeros(all_s.shape[0], dtype=bool)
    kept_mask[order[:keep]] = True
    s_rest = sorted_s[keep:]
    # per-sector keep counts
    offsets = np.concatenate([[0], np.cumsum([len(s) for s in ss])])
    new_us, new_ss, new_vs, ks = [], [], [], []
    for i in range(len(ss)):
        m = kept_mask[offsets[i]:offsets[i + 1]]
        k = int(np.sum(m))
        ks.append(k)
        new_us.append(us[i][:, m])
        new_ss.append(ss[i][m])
        new_vs.append(vs[i][m, :])
    bond_charges, _ = _bond_index(common, ks, True)
    S = ChargeArray(np.concatenate(new_ss) if new_ss else np.zeros(0),
                    [bond_charges], [False])
    U = _scatter_matrix(new_us, common, matrix._charges[:p],
                        matrix._flows[:p], p, bond_charges, True,
                        matrix.dtype)
    V = _scatter_matrix_left_bond(new_vs, common,
                                  BaseCharge(bond_charges.charges,
                                             bond_charges.charge_types),
                                  False, matrix._charges[p:],
                                  matrix._flows[p:], matrix.dtype)
    return U, S, V, s_rest


def qr(matrix: BlockSparseTensor, mode: str = "reduced"):
    """(reference ``block_sparse/linalg.py:300``)"""
    if mode not in ("reduced", "complete"):
        raise ValueError(f"unsupported mode {mode!r}")
    p, common, maps, shapes, blocks = _get_blocks(matrix)
    qs, rs, ks = [], [], []
    for b in blocks:
        q, r = np.linalg.qr(b, mode="reduced" if mode == "reduced"
                            else "complete")
        qs.append(q); rs.append(r)
        ks.append(q.shape[1])
    bond_charges, _ = _bond_index(common, ks, True)
    Q = _scatter_matrix(qs, common, matrix._charges[:p],
                        matrix._flows[:p], p, bond_charges, True,
                        matrix.dtype)
    R = _scatter_matrix_left_bond(rs, common,
                                  BaseCharge(bond_charges.charges,
                                             bond_charges.charge_types),
                                  False, matrix._charges[p:],
                                  matrix._flows[p:], matrix.dtype)
    return Q, R


def eigh(matrix: BlockSparseTensor):
    """(reference ``block_sparse/linalg.py:395``)"""
    p, common, maps, shapes, blocks = _get_blocks(matrix)
    es, vs, ks = [], [], []
    for b in blocks:
        e, v = np.linalg.eigh(b)
        es.append(e); vs.append(v); ks.append(e.shape[0])
    bond_charges, _ = _bond_index(common, ks, True)
    E = ChargeArray(np.concatenate(es) if es else np.zeros(0),
                    [bond_charges], [False])
    V = _scatter_matrix(vs, common, matrix._charges[:p],
                        matrix._flows[:p], p, bond_charges, True,
                        matrix.dtype)
    return E, V


def eig(matrix: BlockSparseTensor):
    """(reference ``block_sparse/linalg.py:454``)"""
    p, common, maps, shapes, blocks = _get_blocks(matrix)
    es, vs, ks = [], [], []
    for b in blocks:
        e, v = np.linalg.eig(b)
        es.append(e); vs.append(v); ks.append(e.shape[0])
    bond_charges, _ = _bond_index(common, ks, True)
    E = ChargeArray(np.concatenate(es) if es else np.zeros(0,
                                                           dtype=complex),
                    [bond_charges], [False])
    V = _scatter_matrix(vs, common, matrix._charges[:p],
                        matrix._flows[:p], p, bond_charges, True,
                        np.result_type(matrix.dtype, np.complex64))
    return E, V


def diag(x):
    """ChargeArray -> diagonal matrix; rank-2 tensor -> diagonal
    (reference ``block_sparse/linalg.py:35``)."""
    if isinstance(x, ChargeArray) and x.ndim == 1:
        charges = x.flat_charges[0]
        flow = x.flat_flows[0]
        mat_charges = [charges, charges]
        mat_flows = [flow, not flow]
        nnz = compute_num_nonzero(mat_charges, mat_flows)
        out = BlockSparseTensor(np.zeros(nnz, dtype=x.dtype), mat_charges,
                                mat_flows, [[0], [1]])
        common, maps, shapes = find_diagonal_blocks(mat_charges, mat_flows,
                                                    1)
        _, rows, cols = _col_indices_per_sector(mat_charges, mat_flows, 1)
        for bm, r_idx in zip(maps, rows):
            vals = x.data[r_idx]
            n = min(bm.shape)
            out.data[bm[np.arange(n), np.arange(n)]] = vals[:n]
        return out
    if isinstance(x, BlockSparseTensor) and x.ndim == 2:
        p = _matrix_partition(x)
        common, maps, shapes = find_diagonal_blocks(x._charges, x._flows, p)
        _, rows, cols = _col_indices_per_sector(x._charges, x._flows, p)
        datas, sec_charges = [], []
        for s, (bm, r_idx, c_idx) in enumerate(zip(maps, rows, cols)):
            # diagonal of the block in the dense sense: entries where the
            # dense row index equals the dense column index are only
            # meaningful for square matricizations; use block diagonal
            n = min(bm.shape)
            datas.append(x.data[bm[np.arange(n), np.arange(n)]])
            sec_charges.append(np.repeat(common.charges[s][None, :], n,
                                         axis=0))
        charges = BaseCharge(
            np.concatenate(sec_charges, axis=0) if sec_charges
            else np.zeros((0, x._charges[0].num_symmetries), dtype=np.int64),
            x._charges[0].charge_types)
        return ChargeArray(np.concatenate(datas) if datas else np.zeros(0),
                           [charges], [x._flows[0]])
    raise TypeError("diag expects a rank-1 ChargeArray or rank-2 "
                    "BlockSparseTensor")


def trace(matrix: BlockSparseTensor, axes=None):
    """Trace over two legs (reference ``block_sparse/linalg.py:595``).

    For a matrix (``ndim == 2``) returns the scalar trace.  For higher-rank
    tensors returns the partially-traced ``BlockSparseTensor`` over the
    given axis pair (default: the last two), implemented — like the
    reference — as a contraction against a block-sparse identity."""
    if matrix.ndim != 2:
        return trace_axes(matrix, axes)
    if axes is not None:
        ax = sorted(a % matrix.ndim for a in axes)
        if ax != [0, 1]:
            raise ValueError(f"invalid trace axes {axes} for a matrix")
    p = _matrix_partition(matrix)
    common, maps, shapes = find_diagonal_blocks(matrix._charges,
                                                matrix._flows, p)
    _, rows, cols = _col_indices_per_sector(matrix._charges, matrix._flows,
                                            p)
    total = 0.0
    for bm, r_idx, c_idx in zip(maps, rows, cols):
        # positions where the dense row index equals the dense col index
        common_idx, ri, ci = np.intersect1d(r_idx, c_idx,
                                            return_indices=True)
        if len(common_idx):
            total = total + np.sum(matrix.data[bm[ri, ci]])
    return total


def trace_axes(tensor: BlockSparseTensor, axes=None) -> BlockSparseTensor:
    """Partial trace over one axis pair of a rank-n tensor (reference
    ``block_sparse/linalg.py:595-644``, which likewise contracts against a
    block-sparse identity)."""
    from tensornetwork_tpu.blocksparse.tensor import tensordot as _td
    if axes is None:
        axes = (tensor.ndim - 2, tensor.ndim - 1)
    if len(axes) != 2:
        raise ValueError(f"`len(axes)` has to be 2, found `axes = {axes}`")
    ax1, ax2 = (a % tensor.ndim for a in axes)
    if ax1 == ax2:
        raise ValueError(f"trace axes must differ, got {axes}")
    idx = tensor.sparse_shape[ax1]
    ident = eye(idx.flip_flow(), dtype=tensor.data.dtype)
    return _td(tensor, ident, [[ax1, ax2], [0, 1]])


def inv(matrix: BlockSparseTensor) -> BlockSparseTensor:
    """(reference ``block_sparse/linalg.py``)"""
    return _apply_blockwise(matrix, np.linalg.inv, transpose_structure=True)


def pinv(matrix: BlockSparseTensor, rcond: float = 1e-15
         ) -> BlockSparseTensor:
    """(reference ``block_sparse/linalg.py:660``)"""
    return _apply_blockwise(matrix, lambda b: np.linalg.pinv(b, rcond),
                            transpose_structure=True)


def _apply_blockwise(matrix, fn, transpose_structure=False):
    p, common, maps, shapes, blocks = _get_blocks(matrix)
    if transpose_structure:
        # the (pseudo)inverse maps the other way: legs (cols..., rows...)
        # with all flows flipped, so inv(A) @ A contracts legally
        n_col = len(matrix._charges) - p
        out_charges = matrix._charges[p:] + matrix._charges[:p]
        out_flows = ([not f for f in matrix._flows[p:]]
                     + [not f for f in matrix._flows[:p]])
        out_order = [list(range(n_col)),
                     list(range(n_col, len(out_charges)))]
        nnz = compute_num_nonzero(out_charges, out_flows)
        out = BlockSparseTensor(
            np.zeros(nnz, dtype=matrix.dtype), out_charges, out_flows,
            out_order)
        common_o, maps_o, _ = find_diagonal_blocks(out_charges, out_flows,
                                                   n_col)
        # flipping flows on the col side makes its fused charge equal the
        # original sector charge c, so sectors match directly
        _, io, isrc = common_o.intersect(common, return_indices=True)
        for t in range(len(io)):
            out.data[maps_o[io[t]]] = fn(blocks[isrc[t]])
        return out
    out = BlockSparseTensor(np.zeros_like(matrix.data), matrix._charges,
                            matrix._flows, matrix._order)
    for s, b in enumerate(blocks):
        out.data[maps[s]] = fn(b)
    return out


def sqrt(t: BlockSparseTensor) -> BlockSparseTensor:
    return BlockSparseTensor(np.sqrt(t.data), t._charges, t._flows,
                             t._order)


def norm(t: BlockSparseTensor) -> float:
    """(reference ``block_sparse/linalg.py``)"""
    return float(np.linalg.norm(t.data))


def abs(tensor: BlockSparseTensor) -> BlockSparseTensor:  # noqa: A001
    """Elementwise absolute value (reference
    ``block_sparse/linalg.py:696``)."""
    return BlockSparseTensor(np.abs(tensor.data), tensor._charges,
                             tensor._flows, tensor._order)


def sign(tensor: BlockSparseTensor) -> BlockSparseTensor:
    """Elementwise sign (reference ``block_sparse/linalg.py:701``)."""
    return BlockSparseTensor(np.sign(tensor.data), tensor._charges,
                             tensor._flows, tensor._order)


def eye(column_index: Index, row_index: Optional[Index] = None,
        dtype=np.float64) -> BlockSparseTensor:
    """Identity matrix with legs (column_index, dual) (reference
    ``block_sparse/linalg.py:557``)."""
    if row_index is None:
        row_index = column_index.flip_flow()
    charges = column_index.flat_charges + row_index.flat_charges
    flows = column_index.flat_flows + row_index.flat_flows
    p = len(column_index.flat_charges)
    order = [list(range(p)), list(range(p, len(charges)))]
    nnz = compute_num_nonzero(charges, flows)
    out = BlockSparseTensor(np.zeros(nnz, dtype=dtype), charges, flows,
                            order)
    common, maps, shapes = find_diagonal_blocks(charges, flows, p)
    for bm in maps:
        n = min(bm.shape)
        out.data[bm[np.arange(n), np.arange(n)]] = 1.0
    return out
