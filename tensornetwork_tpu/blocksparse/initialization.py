"""Initializers for block-sparse tensors
(reference ``block_sparse/initialization.py:22-163``)."""
from __future__ import annotations

from typing import Sequence

import numpy as np

from tensornetwork_tpu.blocksparse.index import Index
from tensornetwork_tpu.blocksparse.tensor import (
    BlockSparseTensor, _expand_indices, compute_num_nonzero)


def _nnz(indices: Sequence[Index]) -> tuple:
    charges, flows, order = _expand_indices(indices)
    return compute_num_nonzero(charges, flows), charges, flows, order


def zeros(indices: Sequence[Index], dtype=np.float64) -> BlockSparseTensor:
    n, charges, flows, order = _nnz(indices)
    return BlockSparseTensor(np.zeros(n, dtype=dtype), charges, flows, order)


def ones(indices: Sequence[Index], dtype=np.float64) -> BlockSparseTensor:
    n, charges, flows, order = _nnz(indices)
    return BlockSparseTensor(np.ones(n, dtype=dtype), charges, flows, order)


def randn(indices: Sequence[Index], dtype=np.float64,
          seed: int = 0) -> BlockSparseTensor:
    n, charges, flows, order = _nnz(indices)
    rng = np.random.default_rng(seed)
    if np.issubdtype(dtype, np.complexfloating):
        data = (rng.standard_normal(n)
                + 1j * rng.standard_normal(n)).astype(dtype)
    else:
        data = rng.standard_normal(n).astype(dtype)
    return BlockSparseTensor(data, charges, flows, order)


def random(indices: Sequence[Index], boundaries=(0.0, 1.0),
           dtype=np.float64, seed: int = 0) -> BlockSparseTensor:
    n, charges, flows, order = _nnz(indices)
    rng = np.random.default_rng(seed)
    lo, hi = boundaries
    if np.issubdtype(dtype, np.complexfloating):
        data = (rng.uniform(lo, hi, n)
                + 1j * rng.uniform(lo, hi, n)).astype(dtype)
    else:
        data = rng.uniform(lo, hi, n).astype(dtype)
    return BlockSparseTensor(data, charges, flows, order)


def randn_like(t: BlockSparseTensor, seed: int = 0) -> BlockSparseTensor:
    rng = np.random.default_rng(seed)
    if np.issubdtype(t.dtype, np.complexfloating):
        data = (rng.standard_normal(t.data.shape[0]) + 1j
                * rng.standard_normal(t.data.shape[0])).astype(t.dtype)
    else:
        data = rng.standard_normal(t.data.shape[0]).astype(t.dtype)
    return BlockSparseTensor(data, t.flat_charges, t.flat_flows,
                             [list(g) for g in t._order])


def empty_like(t: BlockSparseTensor) -> BlockSparseTensor:
    return BlockSparseTensor(np.empty_like(t.data), t.flat_charges,
                             t.flat_flows, [list(g) for g in t._order])
