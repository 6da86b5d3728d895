"""Multi-host mesh component tests (SURVEY §2.10.5; VERDICT r1 item 8).
Virtual 8-device CPU mesh; the hybrid layout emulates 2 hosts x 4 chips."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from tensornetwork_tpu.parallel.mesh import (
    initialize_distributed, make_hybrid_mesh, make_mesh, pod_layout)


def test_initialize_distributed_noop_single_process():
    # no coordinator configured -> must not raise, must not initialize
    assert initialize_distributed() is False


def test_hybrid_mesh_axes_and_shape():
    mesh = make_hybrid_mesh((4,), (2,), ("host", "model"))
    assert mesh.axis_names == ("host", "model")
    assert mesh.devices.shape == (2, 4)
    # dcn axis leads: consecutive devices fill the ici (model) axis first
    flat = mesh.devices.reshape(-1)
    assert list(flat) == jax.devices()[:8]


def test_hybrid_mesh_validates():
    with pytest.raises(ValueError):
        make_hybrid_mesh((4,), (3,), ("host", "model"))  # 12 != 8
    with pytest.raises(ValueError):
        make_hybrid_mesh((4,), (2,), ("host",))  # axis names mismatch


def test_pod_layout_dp_over_host_tp_over_model():
    mesh = pod_layout(n_hosts=2)
    assert mesh.axis_names == ("host", "model")
    B, chi = 4, 16
    x = jnp.arange(B * chi * chi, dtype=jnp.float32).reshape(B, chi, chi)
    xs = jax.device_put(x, NamedSharding(mesh, P("host", None, "model")))
    # batch split over hosts, chi split over chips within a host
    shapes = {s.data.shape for s in xs.addressable_shards}
    assert shapes == {(B // 2, chi, chi // 4)}
    y = jax.jit(lambda v: jnp.einsum("bij,bkj->bik", v, v))(xs)
    np.testing.assert_allclose(
        np.asarray(y), np.einsum("bij,bkj->bik", x, x), rtol=1e-5)


def test_batched_sweep_on_hybrid_mesh():
    """The DP-batched DMRG sweep runs with the batch over the DCN axis of
    a hybrid mesh (the pod deployment layout)."""
    from tensornetwork_tpu.models import FiniteTFI
    from tensornetwork_tpu.models.dmrg import random_mps_stack
    from tensornetwork_tpu.parallel.batch import batched_one_site_sweep
    mesh = pod_layout(n_hosts=2)
    N, chi, B = 8, 8, 4
    mpo = FiniteTFI(Jx=1.0, Bz=1.0, N=N)
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    As = jnp.stack([random_mps_stack(k, N, chi) for k in keys])
    As = jax.device_put(
        As, NamedSharding(mesh, P("host", *([None] * (As.ndim - 1)))))
    repl = NamedSharding(mesh, P())
    with mesh:
        res = batched_one_site_sweep(
            jax.device_put(As, NamedSharding(
                mesh, P("host", *([None] * (As.ndim - 1))))),
            jax.device_put(mpo.Ws, repl), jax.device_put(mpo.vL, repl),
            jax.device_put(mpo.vR, repl), num_krylov_vecs=8)
    e = np.asarray(res.energy)
    assert e.shape == (B,)
    assert np.all(np.isfinite(e))
