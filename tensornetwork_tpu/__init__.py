"""tensornetwork_tpu — a TPU-native tensor-network framework.

Re-designed from scratch for JAX/XLA/Pallas with the capability surface of
the google/TensorNetwork reference library: ncon contraction, a Node/Edge
graph API, contraction-path solvers, truncated decompositions, MPS/DMRG/
MERA/TEBD solvers, U(1)/Z_N block-sparse symmetric tensors, quantum
operator algebra, tensor-network NN layers, and multi-chip sharding.
"""
from tensornetwork_tpu.config import (
    Config, config_context, get_config, set_default_backend,
    get_default_backend, DefaultBackend,
    enable_persistent_compilation_cache)
from tensornetwork_tpu.ops.ncon import ncon, finalize
from tensornetwork_tpu.ops.decompositions import (
    svd, qr, rq, eigh, svd_masked, MaskedSVD)
from tensornetwork_tpu.ops import krylov

# graph core (reference ``network_components.py`` / ``network_operations.py``)
from tensornetwork_tpu.core.network import (
    AbstractNode, Node, CopyNode, Edge, NodeCollection,
    connect, disconnect, contract, contract_between, contract_parallel,
    contract_copy_node, outer_product, outer_product_final_nodes,
    flatten_edges, flatten_edges_between, flatten_all_edges, split_edge,
    slice_edge, get_all_edges, get_all_dangling, get_all_nondangling,
    get_neighbors, get_shared_edges, get_parallel_edges)
from tensornetwork_tpu.core.operations import (
    copy, replicate_nodes, remove_node, reachable, check_correct,
    check_connected, get_subgraph_dangling, redirect_edge,
    get_all_nodes, contract_trace_edges,
    split_node, split_node_qr, split_node_rq, split_node_full_svd,
    reduced_density, nodes_to_json, nodes_from_json, switch_backend)

from tensornetwork_tpu import contractors

# functional layer (reference ``tensor.py`` / ``linalg/``)
from tensornetwork_tpu.core.tensor import Tensor, NconBuilder
from tensornetwork_tpu.core import linalg
from tensornetwork_tpu.core import node_linalg
from tensornetwork_tpu.core.linalg import (
    tensordot, einsum, norm, kron, eigsh_lanczos, eigs, gmres,
    # free functions (reference ``linalg/operations.py``, exported at
    # ``/root/reference/tensornetwork/__init__.py:17-22``)
    reshape, transpose, take_slice, shape, sqrt, outer, conj, hconj,
    sin, cos, exp, log, diagonal, diagflat, trace, sign, abs, pivot,
    # decomposition wrappers over Tensor (reference ``linalg/linalg.py``)
    expm, inv,
    # initializers (reference ``linalg/initialization.py``)
    eye, ones, randn, random_uniform, zeros)

# split-complex engine: complex tensors on real-only TPU backends
from tensornetwork_tpu.ops import split_complex

# quantum operators (reference ``quantum/``)
from tensornetwork_tpu import quantum

# utilities (reference ``utils.py`` / ``visualization/``)
from tensornetwork_tpu.utils import (
    save_nodes, load_nodes, from_topology, to_graphviz)

# block-sparse symmetric tensors (reference ``block_sparse/``)
from tensornetwork_tpu import blocksparse
block_sparse = blocksparse  # reference module name alias
from tensornetwork_tpu.blocksparse import (
    BlockSparseTensor, ChargeArray, Index, U1Charge, BaseCharge,
    Z2Charge, ZNCharge)

# application layer at package top level (reference
# ``/root/reference/tensornetwork/__init__.py:37-43``)
from tensornetwork_tpu.models.mps import FiniteMPS
from tensornetwork_tpu.models.infinite_mps import InfiniteMPS
from tensornetwork_tpu.models.dmrg import FiniteDMRG
from tensornetwork_tpu.models.mpo import (
    FiniteMPO, FiniteTFI, FiniteXXZ, FiniteFreeFermion2D)
from tensornetwork_tpu import models

import jax as _jax


def jit(fun=None, backend=None, backend_argnum=None, static_argnums=None,
        **kwargs):
    """Reference-compatible jit decorator (reference
    ``backends/decorators.py:26-89``): the backend arguments are accepted
    for API parity and ignored — XLA is the only execution layer."""
    if fun is None:
        return lambda f: _jax.jit(f, static_argnums=static_argnums,
                                  **kwargs)
    return _jax.jit(fun, static_argnums=static_argnums, **kwargs)


__version__ = "0.1.0"
