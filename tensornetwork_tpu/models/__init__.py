from tensornetwork_tpu.models.mpo import (
    MPO, BaseMPO, FiniteMPO, InfiniteMPO, FiniteTFI, FiniteXXZ,
    FiniteFreeFermion2D, mpo_to_dense)
from tensornetwork_tpu.models.dmrg import FiniteDMRG
from tensornetwork_tpu.models.mps import FiniteMPS
from tensornetwork_tpu.models.infinite_mps import InfiniteMPS
from tensornetwork_tpu.models import mera, tebd
from tensornetwork_tpu.models.vumps import (
    VUMPSState, VUMPSResult, vumps, vumps_iteration, correlation_length)
from tensornetwork_tpu.models.tdvp import TDVP, tdvp_one_site_sweep
from tensornetwork_tpu.models.symmetric_dmrg import (
    SymmetricFiniteDMRG, u1_xxz_mpo, half_filled_mps)
from tensornetwork_tpu.models.symmetric_dmrg_batched import (
    BatchedSymmetricDMRG)
