from tensornetwork_tpu.ops.ncon import ncon, compile_plan, execute_plan
from tensornetwork_tpu.ops.decompositions import (
    svd, qr, rq, eigh, svd_masked, MaskedSVD)
from tensornetwork_tpu.ops import paths
