"""tensornetwork_tpu — a TPU-native tensor-network framework.

Re-designed from scratch for JAX/XLA/Pallas with the capability surface of
the google/TensorNetwork reference library: ncon contraction, a Node/Edge
graph API, contraction-path solvers, truncated decompositions, MPS/DMRG/
MERA/TEBD solvers, U(1)/Z_N block-sparse symmetric tensors, quantum
operator algebra, tensor-network NN layers, and multi-chip sharding.
"""
from tensornetwork_tpu.config import Config, config_context, get_config
from tensornetwork_tpu.ops.ncon import ncon, finalize
from tensornetwork_tpu.ops.decompositions import (
    svd, qr, rq, eigh, svd_masked, MaskedSVD)

__version__ = "0.1.0"
