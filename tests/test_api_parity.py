"""Export-parity test: every public name the reference exports at package
top level (``/root/reference/tensornetwork/__init__.py``) must exist at the
top level of ``tensornetwork_tpu``, modulo an explicit allowlist of
by-design drops (VERDICT round 1, item 7)."""
import ast
import os

import pytest

import tensornetwork_tpu as tn

REFERENCE_INIT = "/root/reference/tensornetwork/__init__.py"

# By-design drops: the framework has exactly one execution layer (XLA), so
# the pluggable-backend abstract class is not part of the surface
# (SURVEY.md §7 stage 2 collapses L0 into XLA).
ALLOWED_MISSING = {"AbstractBackend"}


def _reference_exports():
    """Collect every name the reference imports into its top level."""
    if not os.path.exists(REFERENCE_INIT):
        pytest.skip("reference not available")
    with open(REFERENCE_INIT) as f:
        tree = ast.parse(f.read())
    names = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom):
            for alias in node.names:
                names.add(alias.asname or alias.name)
        elif isinstance(node, ast.Import):
            for alias in node.names:
                names.add((alias.asname or alias.name).split(".")[0])
    return names


def test_top_level_export_parity():
    ref = _reference_exports()
    missing = sorted(n for n in ref
                     if not hasattr(tn, n) and n not in ALLOWED_MISSING)
    assert not missing, f"missing top-level exports: {missing}"


def test_allowlist_is_tight():
    # every allowlisted name must actually be absent — otherwise the
    # allowlist is stale
    stale = sorted(n for n in ALLOWED_MISSING if hasattr(tn, n))
    assert not stale, f"allowlist entries now exported: {stale}"


def test_new_free_functions_work():
    import numpy as np
    x = tn.randn((3, 4), dtype="float32", seed=0)
    np.testing.assert_allclose(np.asarray(tn.sin(x).array),
                               np.sin(np.asarray(x.array)), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(tn.cos(x).array),
                               np.cos(np.asarray(x.array)), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(tn.exp(x).array),
                               np.exp(np.asarray(x.array)), rtol=1e-6)
    y = tn.exp(x)
    np.testing.assert_allclose(np.asarray(tn.log(y).array),
                               np.asarray(x.array), rtol=1e-5, atol=1e-6)
    m = tn.randn((4, 3), dtype="float32", seed=1)
    np.testing.assert_allclose(np.asarray(tn.hconj(m).array),
                               np.asarray(m.array).T.conj(), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(tn.conj(m).array),
                               np.asarray(m.array).conj(), rtol=1e-6)


def test_contract_trace_edges_and_get_all_nodes():
    import numpy as np
    arr = np.random.rand(2, 3, 2, 4).astype(np.float32)
    a = tn.Node(arr)
    # connect axes 0 and 2 into a trace edge
    tn.connect(a[0], a[2])
    out = tn.contract_trace_edges(a)
    assert out.shape == (3, 4)
    np.testing.assert_allclose(np.asarray(out.tensor),
                               np.trace(arr, axis1=0, axis2=2), rtol=1e-6)
    b = tn.Node(np.random.rand(3, 3).astype(np.float32))
    e2 = tn.connect(out[0], b[0])
    nodes = tn.get_all_nodes([e2])
    assert nodes == {out, b}
    # node with no trace edges passes through unchanged
    assert tn.contract_trace_edges(b) is b


def test_node_linalg():
    import numpy as np
    n = tn.node_linalg.randn((2, 2, 2, 2), dtype="float32", seed=3)
    m = tn.node_linalg.randn((3, 3), dtype="float32", seed=4)
    k = tn.node_linalg.kron([n, m])
    assert k.shape == (2, 2, 3, 2, 2, 3)
    # matricized kron == np.kron of matricizations
    A = np.asarray(n.tensor).reshape(4, 4)
    B = np.asarray(m.tensor)
    np.testing.assert_allclose(np.asarray(k.tensor).reshape(12, 12),
                               np.kron(A, B), rtol=1e-6)
    t = tn.node_linalg.transpose(
        tn.Node(np.arange(6, dtype=np.float32).reshape(2, 3)), [1, 0])
    assert t.shape == (3, 2)
    assert float(tn.node_linalg.norm(m)) == pytest.approx(
        np.linalg.norm(B), rel=1e-6)
    c = tn.node_linalg.conj(m)
    np.testing.assert_allclose(np.asarray(c.tensor), B.conj())
    assert tn.node_linalg.eye(3).shape == (3, 3)
    assert tn.node_linalg.zeros((2, 5)).shape == (2, 5)
    assert tn.node_linalg.ones((2,)).shape == (2,)
    assert tn.node_linalg.random_uniform((2, 2), seed=1).shape == (2, 2)
