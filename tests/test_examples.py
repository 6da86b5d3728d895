"""Example-script smoke tests (reference strategy: tests under
``examples/*/``)."""
import runpy
import subprocess
import sys

import numpy as np
import pytest


def _load(path):
    """Import an example module's functions without running __main__."""
    src = open(path).read().split('if __name__')[0]
    ns = {}
    exec(compile(src, path, "exec"), ns)
    return ns


def test_fft_example():
    ns = _load("examples/fft.py")
    rng = np.random.default_rng(1)
    for n in (8, 32):
        x = rng.standard_normal(n) + 1j * rng.standard_normal(n)
        np.testing.assert_allclose(ns["fft_via_network"](x), np.fft.fft(x),
                                   atol=1e-8)


def test_sat_example():
    ns = _load("examples/sat.py")
    assert ns["sat_count"]([(1, 2, 3)]) == 7
    assert ns["sat_count"]([(1, 2, 3), (-1, -2, -3)]) == 6
    # a formula over 4 variables
    clauses = [(1, 2, 3), (2, 3, 4), (-1, -2, 4)]
    import itertools
    brute = 0
    for bits in itertools.product([0, 1], repeat=4):
        ok = all(any((bits[abs(l) - 1] == 1) == (l > 0) for l in c)
                 for c in clauses)
        brute += ok
    assert ns["sat_count"](clauses) == brute


def test_dmrg_example_small():
    ns = _load("examples/dmrg_tfi.py")
    e = ns["main"](N=8, chi=16, sweeps=4)
    from tensornetwork_tpu.models import FiniteTFI, mpo_to_dense
    exact = float(np.linalg.eigvalsh(
        np.asarray(mpo_to_dense(FiniteTFI(Jx=1.0, Bz=1.0, N=8))))[0])
    np.testing.assert_allclose(e, exact, rtol=1e-6)


def test_symmetric_dmrg_example_small():
    ns = _load("examples/symmetric_dmrg.py")
    e = ns["main"](N=8, chi=16, sweeps=5)
    assert e < 0


def test_wavefunctions_example_small():
    ns = _load("examples/wavefunctions.py")
    fid = ns["main"](N=6, dt=0.02, steps=10)
    assert fid > 0.999


@pytest.mark.slow
def test_image_classifier_learns_and_checkpoints(tmp_path):
    import os
    ns = _load("examples/image_classifier.py")
    acc, params = ns["main"](steps=300, batch=128)
    assert acc > 0.22  # 10-class chance is 0.1
    # params round-trip through the generic checkpoint
    from tensornetwork_tpu.utils.checkpoint import save_pytree, load_pytree
    import jax
    import numpy as np
    path = os.path.join(tmp_path, "clf")
    save_pytree(path, jax.device_get(params))
    restored = load_pytree(path)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_path_solvers_example():
    ns = _load("examples/path_solvers.py")
    cost = ns["main"]()
    assert cost > 0


@pytest.mark.slow
def test_disorder_study_example():
    import importlib.util, pathlib
    path = pathlib.Path(__file__).parent.parent / "examples" / "disorder_study.py"
    spec = importlib.util.spec_from_file_location("disorder_study", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    es = mod.main(N=6, chi=10, B=3, num_sweeps=3, verbose=0)
    assert es.shape == (3,)
    assert np.all(np.isfinite(es))


@pytest.mark.slow
def test_distributed_symmetric_dmrg_example(tmp_path):
    # EP showcase example: single-device vs sector-sharded energies
    # agree on the virtual mesh; export/load round-trips
    # load by file path: test_reference_parity puts /root/reference at
    # sys.path[0], whose examples/ dir shadows the repo's namespace
    # package when that module was collected first
    import importlib.util
    import os
    path = os.path.join(os.path.dirname(__file__), "..", "examples",
                        "distributed_symmetric_dmrg.py")
    spec = importlib.util.spec_from_file_location(
        "distributed_symmetric_dmrg_example", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    es = mod.main(N=6, chi=10, B=2, sweeps=2,
                  export_dir=str(tmp_path))
    assert np.all(np.isfinite(es))
