"""Bond-sharded (TP) DMRG tests on the virtual mesh."""
import jax
import numpy as np
import pytest

from tensornetwork_tpu.models import FiniteTFI, mpo_to_dense
from tensornetwork_tpu.models.dmrg import random_mps_stack
from tensornetwork_tpu.parallel.mesh import make_mesh
from tensornetwork_tpu.parallel.tp import TPShardedDMRG


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
def test_tp_sharded_dmrg_matches_exact():
    N, chi, P = 10, 16, 4
    mesh = make_mesh((P,), ("model",), devices=jax.devices()[:P])
    mpo = FiniteTFI(Jx=-1.0, Bz=-1.0, N=N)
    exact = float(np.linalg.eigvalsh(np.asarray(mpo_to_dense(mpo)))[0])
    As = random_mps_stack(jax.random.PRNGKey(0), N, chi)
    dmrg = TPShardedDMRG(As, mpo, mesh, num_krylov_vecs=20)
    e = dmrg.run_one_site(num_sweeps=6, tol=0)
    np.testing.assert_allclose(e, exact, rtol=1e-8)
    # the state actually lives sharded on the mesh
    shardings = dmrg.As.sharding
    assert shardings.spec == jax.sharding.PartitionSpec(
        None, None, None, "model")
