"""Node-level linear algebra and initializers.

Capability parity with the reference ``linalg/node_linalg.py:32-331``:
initializers that return graph Nodes, plus ``norm``/``conj``/``transpose``
and the operator Kronecker product over Nodes.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Union

import jax.numpy as jnp

from tensornetwork_tpu.core.network import (
    AbstractNode, Node, outer_product_final_nodes)
from tensornetwork_tpu.core import linalg as _linalg


def eye(N: int, dtype=jnp.float32, M: Optional[int] = None,
        name: Optional[str] = None,
        axis_names: Optional[List[str]] = None) -> Node:
    """Identity-matrix Node (reference ``linalg/node_linalg.py:67``)."""
    return Node(jnp.eye(N, M, dtype=dtype), name=name, axis_names=axis_names)


def zeros(shape: Sequence[int], dtype=jnp.float32,
          name: Optional[str] = None,
          axis_names: Optional[List[str]] = None) -> Node:
    """(reference ``linalg/node_linalg.py:99``)"""
    return Node(jnp.zeros(tuple(shape), dtype), name=name,
                axis_names=axis_names)


def ones(shape: Sequence[int], dtype=jnp.float32,
         name: Optional[str] = None,
         axis_names: Optional[List[str]] = None) -> Node:
    """(reference ``linalg/node_linalg.py:125``)"""
    return Node(jnp.ones(tuple(shape), dtype), name=name,
                axis_names=axis_names)


def randn(shape: Sequence[int], dtype=jnp.float32,
          seed: Optional[int] = None, name: Optional[str] = None,
          axis_names: Optional[List[str]] = None) -> Node:
    """Gaussian-random Node (reference ``linalg/node_linalg.py:152``)."""
    t = _linalg.randn(tuple(shape), dtype=dtype, seed=seed)
    return Node(t.array, name=name, axis_names=axis_names)


def random_uniform(shape: Sequence[int], dtype=jnp.float32,
                   seed: Optional[int] = None,
                   boundaries=(0.0, 1.0), name: Optional[str] = None,
                   axis_names: Optional[List[str]] = None) -> Node:
    """(reference ``linalg/node_linalg.py:181``)"""
    t = _linalg.random_uniform(tuple(shape), dtype=dtype, seed=seed,
                               boundaries=boundaries)
    return Node(t.array, name=name, axis_names=axis_names)


def norm(node: AbstractNode) -> jnp.ndarray:
    """L2 norm of a node's tensor (reference
    ``linalg/node_linalg.py:214``)."""
    return jnp.linalg.norm(jnp.asarray(node.tensor).reshape(-1))


def conj(node: AbstractNode, name: Optional[str] = None,
         axis_names: Optional[List[str]] = None) -> Node:
    """Conjugated copy of a node (reference
    ``linalg/node_linalg.py:232``)."""
    if not axis_names:
        axis_names = node.axis_names
    return Node(jnp.conj(node.tensor), name=name, axis_names=axis_names)


def transpose(node: AbstractNode,
              permutation: Sequence[Union[str, int]],
              name: Optional[str] = None,
              axis_names: Optional[List[str]] = None) -> Node:
    """Transposed copy of a node (reference
    ``linalg/node_linalg.py:262``): a fresh Node whose axes are reordered
    by ``permutation`` (names or indices)."""
    perm = [node.get_axis_number(p) for p in permutation]
    if not axis_names:
        axis_names = node.axis_names
    new_node = Node(node.tensor, name=name, axis_names=node.axis_names)
    return new_node.reorder_axes(perm)


def kron(nodes: Sequence[AbstractNode]) -> AbstractNode:
    """Operator Kronecker product of even-order nodes: the first halves of
    every node's edges become the result's first half (reference
    ``linalg/node_linalg.py:297``)."""
    input_edges = []
    output_edges = []
    for node in nodes:
        order = len(node.shape)
        if order % 2 != 0:
            raise ValueError(
                f"All operator tensors must have an even order. "
                f"Found tensor with order {order}")
        input_edges += node.edges[:order // 2]
        output_edges += node.edges[order // 2:]
    return outer_product_final_nodes(nodes, input_edges + output_edges)
