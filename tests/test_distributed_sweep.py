"""Distributed (chain-partitioned) DMRG tests on a virtual device mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensornetwork_tpu.models import FiniteTFI, mpo_to_dense
from tensornetwork_tpu.models.dmrg import random_mps_stack
from tensornetwork_tpu.parallel.mesh import make_mesh
from tensornetwork_tpu.parallel.sweep import DistributedDMRG


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
def test_distributed_dmrg_matches_exact():
    N, chi, P = 12, 16, 4
    mesh = make_mesh((P,), ("sp",), devices=jax.devices()[:P])
    mpo = FiniteTFI(Jx=-1.0, Bz=-1.0, N=N)
    exact = float(np.linalg.eigvalsh(np.asarray(mpo_to_dense(mpo)))[0])
    As = random_mps_stack(jax.random.PRNGKey(0), N, chi)
    dmrg = DistributedDMRG(As, mpo, mesh, num_krylov_vecs=20,
                           inner_sweeps=2)  # default: exact sequential wave
    dmrg.run(num_iterations=10, tol=0)
    e = dmrg.energy()
    np.testing.assert_allclose(e, exact, rtol=1e-9)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
def test_distributed_dmrg_red_black_approximate():
    # red/black updates half the blocks concurrently: maximal parallelism,
    # approximate convergence (stale far-block environments)
    N, chi, P = 12, 16, 4
    mesh = make_mesh((P,), ("sp",), devices=jax.devices()[:P])
    mpo = FiniteTFI(Jx=-1.0, Bz=-1.0, N=N)
    exact = float(np.linalg.eigvalsh(np.asarray(mpo_to_dense(mpo)))[0])
    As = random_mps_stack(jax.random.PRNGKey(0), N, chi)
    dmrg = DistributedDMRG(As, mpo, mesh, num_krylov_vecs=20,
                           inner_sweeps=2, num_colors=2)
    dmrg.run(num_iterations=15, tol=0)
    assert dmrg.energy() - exact < 1e-2


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
def test_distributed_dmrg_monotone_improvement():
    N, chi, P = 8, 8, 4
    mesh = make_mesh((P,), ("sp",), devices=jax.devices()[:P])
    mpo = FiniteTFI(Jx=-1.0, Bz=-0.6, N=N)
    As = random_mps_stack(jax.random.PRNGKey(1), N, chi)
    dmrg = DistributedDMRG(As, mpo, mesh, num_krylov_vecs=15)
    e_first = None
    for k in range(6):
        dmrg.run(num_iterations=1, tol=0)
        e = dmrg.energy()
        if e_first is None:
            e_first = e
    assert e < e_first
    exact = float(np.linalg.eigvalsh(np.asarray(mpo_to_dense(mpo)))[0])
    assert e - exact < 1e-4


def test_chain_length_validation():
    mesh = make_mesh((-1,), ("sp",))
    mpo = FiniteTFI(Jx=-1.0, Bz=-1.0, N=9)
    As = random_mps_stack(jax.random.PRNGKey(0), 9, 4)
    if mesh.shape["sp"] > 1 and 9 % mesh.shape["sp"] != 0:
        with pytest.raises(ValueError):
            DistributedDMRG(As, mpo, mesh)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
def test_distributed_two_site():
    N, chi, P = 12, 12, 4
    mesh = make_mesh((P,), ("sp",), devices=jax.devices()[:P])
    mpo = FiniteTFI(Jx=-1.0, Bz=-0.8, N=N)
    exact = float(np.linalg.eigvalsh(np.asarray(mpo_to_dense(mpo)))[0])
    As = random_mps_stack(jax.random.PRNGKey(2), N, chi)
    dmrg = DistributedDMRG(As, mpo, mesh, num_krylov_vecs=20,
                           inner_sweeps=1, two_site=True)
    dmrg.run(num_iterations=8, tol=0)
    np.testing.assert_allclose(dmrg.energy(), exact, rtol=1e-6)


def test_distributed_dmrg_f32_rank_deficient_boundaries():
    """f32 regression (round 5): the clipped-inverse boundary gauge
    diverged to -1e18 within one iteration at EVERY f32 config (null
    eigenvalues of the rank-deficient norm envs are eigh noise at f32;
    1/sqrt(1e-10 floor) amplified them ~1e5x) — the suite never caught
    it because conftest forces x64.  _psd_factor now PROJECTS the null
    directions; this drives the exact config in explicit f32."""
    import jax
    import jax.numpy as jnp
    from tensornetwork_tpu.models import FiniteTFI
    from tensornetwork_tpu.models.dmrg import random_mps_stack
    from tensornetwork_tpu.parallel.mesh import make_mesh
    from tensornetwork_tpu.parallel.sweep import DistributedDMRG

    N, chi, P = 12, 16, 4
    mpo = FiniteTFI(Jx=1.0, Bz=1.0, N=N, dtype=jnp.float32)
    As = random_mps_stack(jax.random.PRNGKey(0), N, chi, 2, jnp.float32)
    mesh = make_mesh((P,), ("sp",), devices=jax.devices()[:P])
    d = DistributedDMRG(As, mpo, mesh, num_krylov_vecs=10, num_colors=P)
    d.run(num_iterations=6, tol=0.0)
    e = d.energy()
    assert np.isfinite(e)
    # chi=16 >= 2^6: the chain is exactly representable; f32 block-DMRG
    # must land within f32 tolerance of the true ground state
    import numpy as _np
    H_exact = -14.925623  # N=12 critical TFI (dense diag, f64)
    assert abs(e - H_exact) < 5e-4, e


def test_distributed_two_site_f32():
    """Two-site block sweeps in explicit f32 (same bug class as the
    one-site f32 divergence — keep both dtypes driven)."""
    import jax
    import jax.numpy as jnp
    from tensornetwork_tpu.models import FiniteTFI
    from tensornetwork_tpu.models.dmrg import random_mps_stack
    from tensornetwork_tpu.parallel.mesh import make_mesh
    from tensornetwork_tpu.parallel.sweep import DistributedDMRG

    N, chi, P = 12, 12, 4
    mpo = FiniteTFI(Jx=1.0, Bz=1.0, N=N, dtype=jnp.float32)
    As = random_mps_stack(jax.random.PRNGKey(2), N, chi, 2, jnp.float32)
    mesh = make_mesh((P,), ("sp",), devices=jax.devices()[:P])
    d = DistributedDMRG(As, mpo, mesh, num_krylov_vecs=8, num_colors=P,
                        two_site=True)
    d.run(num_iterations=6, tol=0.0)
    e = d.energy()
    assert np.isfinite(e)
    assert abs(e - (-14.925623)) < 1e-3, e
