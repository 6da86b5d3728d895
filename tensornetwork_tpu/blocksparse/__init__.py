from tensornetwork_tpu.blocksparse.charge import (
    BaseCharge, U1Charge, Z2Charge, ZNCharge, fuse_charges, charge_equal,
    fuse_ndarrays, fuse_degeneracies)
from tensornetwork_tpu.blocksparse.index import Index, fuse_index_pair
from tensornetwork_tpu.blocksparse.tensor import (
    ChargeArray, BlockSparseTensor, tensordot, outerproduct, transpose,
    reshape, conj)
from tensornetwork_tpu.blocksparse.linalg import (
    svd, qr, eigh, eig, diag, trace, pinv, eye, norm, inv, sqrt,
    abs, sign)
from tensornetwork_tpu.blocksparse.initialization import (
    randn, zeros, ones, random, randn_like, empty_like)
from tensornetwork_tpu.blocksparse.caching import (
    enable_caching, disable_caching, clear_cache, get_cacher)
from tensornetwork_tpu.blocksparse.batched import (
    canonical_bond_charges, uniform_skeleton_mps, random_data_batch,
    contraction_plan, ShiftPlan)
