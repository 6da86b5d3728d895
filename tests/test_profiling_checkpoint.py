"""Observability + checkpoint tests."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from tensornetwork_tpu.utils.profiling import (
    Timer, ncon_flops, benchmark, dmrg_sweep_flops, detect_chip)
from tensornetwork_tpu.utils.checkpoint import (
    save_dmrg_state, restore_dmrg, save_pytree, load_pytree)
from tensornetwork_tpu.models import FiniteTFI, FiniteDMRG, mpo_to_dense
from tensornetwork_tpu.models.dmrg import random_mps_stack


def test_timer():
    t = Timer()
    with t.phase("a"):
        pass
    with t.phase("a"):
        pass
    with t.phase("b"):
        pass
    assert t.counts["a"] == 2
    assert "a" in t.report()


def test_ncon_flops():
    # matmul (4,5)x(5,6): 2*4*5*6 flops
    f = ncon_flops([(-1, 1), (1, -2)], [(4, 5), (5, 6)])
    assert f == 240


def test_benchmark_reports_utilization(rng):
    a = jnp.asarray(rng.standard_normal((256, 256)), jnp.float32)
    f = jax.jit(lambda x: x @ x)
    flops = 2 * 256 ** 3
    res = benchmark(f, a, iters=5, flops=flops)
    assert res["per_call_s"] > 0
    assert 0 < res["mxu_utilization"] < 10  # sanity (cpu peak is a guess)
    assert res["chip"] == detect_chip()


def test_dmrg_sweep_flops_positive():
    assert dmrg_sweep_flops(32, 64, 2, 3, 10) > 1e8


def test_dmrg_checkpoint_roundtrip(tmp_path):
    N, chi = 6, 8
    mpo = FiniteTFI(Jx=-1.0, Bz=-1.0, N=N)
    dmrg = FiniteDMRG(random_mps_stack(jax.random.PRNGKey(0), N, chi), mpo)
    e = dmrg.run_one_site(num_sweeps=2, num_krylov_vecs=10)
    path = os.path.join(tmp_path, "ckpt")
    save_dmrg_state(path, dmrg, sweep=2, rng_key=jax.random.PRNGKey(7))
    dmrg2, sweep = restore_dmrg(path)
    assert sweep == 2
    np.testing.assert_allclose(np.asarray(dmrg2.As), np.asarray(dmrg.As))
    # resumed solver continues from the same energy
    e2 = dmrg2.run_one_site(num_sweeps=1, num_krylov_vecs=10)
    assert abs(e2 - e) < 1e-6


def test_generic_pytree_checkpoint(tmp_path, rng):
    tree = {"a": np.asarray(rng.standard_normal((3, 3))),
            "nested": {"b": np.arange(5)}}
    path = os.path.join(tmp_path, "tree")
    save_pytree(path, tree)
    out = load_pytree(path)
    np.testing.assert_allclose(out["a"], tree["a"])
    np.testing.assert_allclose(out["nested"]["b"], tree["nested"]["b"])
