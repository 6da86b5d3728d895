"""Serialization / topology / visualization tests (reference strategy:
``tests/serialize_test.py``, ``utils_test.py``)."""
import os

import numpy as np

import tensornetwork_tpu as tn
from tensornetwork_tpu.utils import (
    save_nodes, load_nodes, from_topology, to_graphviz)


def test_hdf5_roundtrip(tmp_path, rng):
    a = tn.Node(rng.standard_normal((3, 4)), name="a",
                axis_names=["x", "y"])
    b = tn.Node(rng.standard_normal((4, 5)), name="b")
    e = a[1] ^ b[0]
    e.set_name("bond")
    path = os.path.join(tmp_path, "net.h5")
    save_nodes([a, b], path)
    nodes = load_nodes(path)
    assert [n.name for n in nodes] == ["a", "b"]
    assert nodes[0].axis_names == ["x", "y"]
    bond = [x for x in nodes[0].edges if not x.is_dangling()]
    assert len(bond) == 1 and bond[0].name == "bond"
    c = tn.contract(bond[0])
    np.testing.assert_allclose(np.asarray(c.tensor),
                               np.asarray(a.tensor) @ np.asarray(b.tensor),
                               rtol=1e-10)


def test_hdf5_copy_node_roundtrip(tmp_path, rng):
    cn = tn.CopyNode(rank=3, dimension=2, name="copy")
    v = tn.Node(rng.standard_normal(2), name="v")
    v[0] ^ cn[0]
    path = os.path.join(tmp_path, "cn.h5")
    save_nodes([cn, v], path)
    nodes = load_nodes(path)
    assert isinstance(nodes[0], tn.CopyNode)
    assert nodes[0].rank == 3


def test_from_topology(rng):
    A = rng.standard_normal((3, 4))
    B = rng.standard_normal((4, 5))
    C = rng.standard_normal((5, 6))
    nodes = from_topology("Ab,bc,cD", [A, B, C])
    out = tn.contractors.greedy(
        nodes, output_edge_order=[nodes[0][0], nodes[2][1]])
    np.testing.assert_allclose(np.asarray(out.tensor), A @ B @ C, rtol=1e-8)


def test_to_graphviz(rng):
    a = tn.Node(rng.standard_normal((3, 4)), name="a")
    b = tn.Node(rng.standard_normal((4, 5)), name="b")
    a[1] ^ b[0]
    g = to_graphviz([a, b])
    src = g.source
    assert "n0" in src and "n1" in src
    # two dangling edges -> two invisible ghosts
    assert src.count("invis") >= 2


def test_hdf5_boundary_edge_either_orientation(tmp_path, rng):
    import tensornetwork_tpu as tn
    inside = tn.Node(rng.standard_normal((3,)), name="in")
    outside = tn.Node(rng.standard_normal((3,)), name="out")
    tn.connect(outside[0], inside[0])
    path = os.path.join(tmp_path, "boundary.h5")
    save_nodes([inside], path)
    nodes = load_nodes(path)
    assert nodes[0].edges[0].is_dangling()
