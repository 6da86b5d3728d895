"""Host-side contraction-order solvers.

Path solving is a compile-time concern: it runs on the host in numpy /
opt_einsum and produces a static schedule that is baked into the jitted
executable.  Mirrors the reference's use of opt_einsum path algorithms
(reference ``contractors/opt_einsum_paths/path_contractors.py:36-403`` and
``contractors/opt_einsum_paths/utils.py:29``).
"""
from __future__ import annotations

from typing import Callable, List, Sequence, Set, Tuple, Union

import numpy as np
import opt_einsum

PathAlgorithm = Union[str, Callable]


def _resolve_algorithm(algorithm: PathAlgorithm) -> Callable:
    if callable(algorithm):
        return algorithm
    table = {
        "optimal": opt_einsum.paths.optimal,
        "greedy": opt_einsum.paths.greedy,
        "branch": opt_einsum.paths.branch_all,
        "branch-2": opt_einsum.paths.branch_2,
        "branch-1": opt_einsum.paths.branch_1,
        "auto": None,
    }
    if algorithm not in table:
        raise ValueError(f"unknown path algorithm {algorithm!r}")
    if algorithm == "auto":
        raise ValueError("resolve 'auto' via auto_algorithm() first")
    return table[algorithm]


def native_optimal_path(input_sets, output_set, size_dict,
                        memory_limit=None):
    """Exact optimal path from the native (C++) subset-DP scheduler
    (:mod:`tensornetwork_tpu.native`), in opt_einsum's path convention
    (contracted pair removed, result appended).  Returns ``None`` when
    the native library is unavailable or the network has hyper-edges
    (a symbol shared by 3+ operands, or an output symbol shared by 2)
    the adjacency model cannot represent."""
    from tensornetwork_tpu import native
    n = len(input_sets)
    if n > 22 or not native.available():
        return None
    adj = np.zeros((n, n))
    for sym, d in ((s, size_dict[s])
                   for s in {x for g in input_sets for x in g}):
        holders = [k for k in range(n) if sym in input_sets[k]]
        ld = np.log10(d)
        if len(holders) == 1:
            adj[holders[0], holders[0]] += ld
        elif len(holders) == 2 and sym not in output_set:
            i, k = holders
            adj[i, k] += ld
            adj[k, i] += ld
        else:
            return None  # hyper-edge / open batch symbol
    res = native.optimal_order_masks(adj)
    if res is None:
        return None
    merges, _ = res
    current = [1 << i for i in range(n)]
    path = []
    for (ma, mb) in merges:
        i = current.index(int(ma))
        j = current.index(int(mb))
        path.append(tuple(sorted((i, j))))
        current = [c for k, c in enumerate(current) if k not in (i, j)]
        current.append(int(ma) | int(mb))
    return path


def _native_or(fallback: Callable) -> Callable:
    def algo(input_sets, output_set, size_dict, memory_limit=None):
        path = native_optimal_path(input_sets, output_set, size_dict,
                                   memory_limit)
        if path is not None:
            return path
        return fallback(input_sets, output_set, size_dict, memory_limit)
    return algo


def auto_algorithm(n_operands: int) -> Callable:
    """Size-based policy of the reference ``auto`` contractor
    (reference ``path_contractors.py:197-265``), upgraded: the native
    exact-optimal scheduler covers every size the reference handed to
    the approximate ``branch-*`` heuristics (5 <= n < 15), falling back
    to the reference policy when unavailable."""
    if n_operands < 5:
        return _native_or(opt_einsum.paths.optimal)
    if n_operands < 7:
        return _native_or(opt_einsum.paths.branch_all)
    if n_operands < 9:
        return _native_or(opt_einsum.paths.branch_2)
    if n_operands < 15:
        return _native_or(opt_einsum.paths.branch_1)
    if n_operands < 19:
        return _native_or(opt_einsum.paths.greedy)
    return opt_einsum.paths.greedy


def get_pair_path(
    input_sets: Sequence[Set],
    output_set: Set,
    size_dict: dict,
    algorithm: PathAlgorithm = "auto",
) -> List[Tuple[int, int]]:
    """Pairwise contraction path [(i, j), ...] over operand indices.

    Indices refer to the *current* operand list at each step, where the two
    contracted operands are removed and their result is appended (the
    opt_einsum convention).
    """
    if len(input_sets) == 1:
        return []
    if isinstance(algorithm, str) and algorithm == "auto":
        algorithm = auto_algorithm(len(input_sets))
    fn = _resolve_algorithm(algorithm)
    input_sets = [set(s) for s in input_sets]
    path = fn(input_sets, set(output_set), dict(size_dict))
    # normalize: some opt_einsum algorithms may emit singleton/merged steps
    out = []
    for step in path:
        if len(step) == 2:
            out.append((step[0], step[1]))
        elif len(step) == 1:
            # self-contraction of a single operand; represent as (i, i)
            out.append((step[0], step[0]))
        else:
            raise ValueError("non-pairwise path steps are not supported")
    return out


def solve_con_order(
    structure: Sequence[Sequence[int]],
    shapes: Sequence[Tuple[int, ...]],
    method: str = "greedy",
) -> List[int]:
    """Turn a pairwise path into an ncon ``con_order`` label sequence.

    The ncon engine resolves labels front-to-back, contracting all shared
    labels of the holding pair at once, so emitting each path step's shared
    labels in step order reproduces the solved pair schedule.
    """
    input_sets = []
    size_dict = {}
    for labels, shape in zip(structure, shapes):
        input_sets.append(set(labels))
        for l, d in zip(labels, shape):
            size_dict[l] = max(size_dict.get(l, 1), int(d))
    output_set = {l for l in size_dict if l < 0}
    pairs = get_pair_path(input_sets, output_set, size_dict, method)
    pools: List[Set] = [set(s) for s in input_sets]
    con_order: List[int] = []
    seen = set()
    for (i, j) in pairs:
        a, b = pools[i], pools[j]
        if i == j:
            new = a
            pools = [p for k, p in enumerate(pools) if k != i] + [new]
            continue
        rest: Set = set().union(*(p for k, p in enumerate(pools)
                                  if k not in (i, j))) | output_set
        shared = {l for l in (a & b) if l > 0 and l not in rest}
        for l in sorted(shared):
            if l not in seen:
                con_order.append(l)
                seen.add(l)
        new = (a | b) - shared
        pools = [p for k, p in enumerate(pools) if k not in (i, j)] + [new]
    # any positive labels never covered (traces, sums, batch leftovers)
    all_pos = sorted({l for labels in structure for l in labels if l > 0})
    for l in all_pos:
        if l not in seen:
            con_order.append(l)
            seen.add(l)
    return con_order


def path_cost(
    structure: Sequence[Sequence[int]],
    shapes: Sequence[Tuple[int, ...]],
    con_order: Sequence[int],
) -> float:
    """FLOP estimate of an ncon contraction order (doubles as the cost model
    for the profiler's MXU-utilization accounting)."""
    from tensornetwork_tpu.ops.ncon import compile_plan
    plan = compile_plan(tuple(tuple(l) for l in structure),
                        tuple(con_order), None)
    return float(plan.flops([tuple(s) for s in shapes]))
