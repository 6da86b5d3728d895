"""Quantum operator algebra tests (reference strategy:
``quantum/quantum_test.py``)."""
import jax.numpy as jnp
import numpy as np

from tensornetwork_tpu.quantum import (
    QuOperator, QuVector, QuAdjointVector, QuScalar, identity)


def rand_op(rng, d=2, n=2):
    return rng.standard_normal((d,) * (2 * n))


def test_from_tensor_and_eval(rng):
    m = rng.standard_normal((2, 2, 2, 2))
    op = QuOperator.from_tensor(m)
    np.testing.assert_allclose(np.asarray(op.eval()), m, rtol=1e-10)


def test_matmul_composition(rng):
    a = rng.standard_normal((2, 2))
    b = rng.standard_normal((2, 2))
    opa = QuOperator.from_tensor(a, [0], [1])
    opb = QuOperator.from_tensor(b, [0], [1])
    out = (opa @ opb).eval()
    np.testing.assert_allclose(np.asarray(out), a @ b, rtol=1e-10)


def test_adjoint(rng):
    a = rng.standard_normal((2, 2)) + 1j * rng.standard_normal((2, 2))
    op = QuOperator.from_tensor(a, [0], [1])
    np.testing.assert_allclose(np.asarray(op.adjoint().eval()),
                               a.conj().T, rtol=1e-10)


def test_trace_and_norm(rng):
    a = rng.standard_normal((3, 3))
    op = QuOperator.from_tensor(a, [0], [1])
    np.testing.assert_allclose(float(op.trace().eval()), np.trace(a),
                               rtol=1e-10)
    np.testing.assert_allclose(float(op.norm().eval()),
                               np.sum(a * a), rtol=1e-10)


def test_partial_trace(rng):
    m = rng.standard_normal((2, 3, 2, 3))
    op = QuOperator.from_tensor(m, [0, 1], [2, 3])
    pt = op.partial_trace([1]).eval()
    np.testing.assert_allclose(np.asarray(pt), np.einsum("aibi->ab", m),
                               rtol=1e-10)


def test_tensor_product(rng):
    a = rng.standard_normal((2, 2))
    b = rng.standard_normal((3, 3))
    opa = QuOperator.from_tensor(a, [0], [1])
    opb = QuOperator.from_tensor(b, [0], [1])
    out = (opa | opb).eval()
    np.testing.assert_allclose(np.asarray(out),
                               np.einsum("ab,cd->acbd", a, b), rtol=1e-10)


def test_quvector_inner_and_projector(rng):
    psi = rng.standard_normal((2, 2))
    v = QuVector.from_tensor(psi)
    bra = v.adjoint()
    overlap = (bra @ v).eval()
    np.testing.assert_allclose(float(overlap), np.sum(psi * psi), rtol=1e-10)
    proj = v.projector().eval()
    np.testing.assert_allclose(np.asarray(proj),
                               np.einsum("ab,cd->abcd", psi, psi),
                               rtol=1e-10)


def test_reduced_density(rng):
    psi = rng.standard_normal((2, 3))
    v = QuVector.from_tensor(psi)
    rho = v.reduced_density([1]).eval()
    np.testing.assert_allclose(np.asarray(rho),
                               np.einsum("ak,bk->ab", psi, psi), rtol=1e-10)


def test_identity_and_elimination(rng):
    ident = identity([2, 3])
    np.testing.assert_allclose(
        np.asarray(ident.eval()).reshape(6, 6),
        np.eye(6).reshape(2, 3, 2, 3).reshape(6, 6), rtol=1e-10)
    # op @ identity == op
    a = rng.standard_normal((2, 3, 2, 3))
    op = QuOperator.from_tensor(a, [0, 1], [2, 3])
    out = (op @ identity([2, 3])).eval()
    np.testing.assert_allclose(np.asarray(out), a, rtol=1e-10)


def test_scalar_multiplication(rng):
    a = rng.standard_normal((2, 2))
    op = QuOperator.from_tensor(a, [0], [1])
    out = (op * 2.5).eval()
    np.testing.assert_allclose(np.asarray(out), 2.5 * a, rtol=1e-10)


def test_quscalar(rng):
    s = QuScalar.from_tensor(3.0)
    assert s.is_scalar()
    np.testing.assert_allclose(float(s.eval()), 3.0)


def test_vector_spaces(rng):
    psi = rng.standard_normal((2, 3, 4))
    v = QuVector.from_tensor(psi)
    assert v.space == [2, 3, 4]
    assert v.is_vector()
    assert v.adjoint().is_adjoint_vector()


# -- reference scenario batch (round 4): constructor signatures, space
# -- checks, mul semantics, expectation identities, ignore_edges --------
import pytest
import tensornetwork_tpu as tn
from tensornetwork_tpu.quantum import quantum_constructor, check_spaces


def test_constructor_edge_signatures(rng):
    psi = tn.Node(rng.standard_normal((2, 2)))
    op = quantum_constructor([psi[0]], [psi[1]])
    assert not op.is_scalar() and not op.is_vector()
    assert not op.is_adjoint_vector()
    assert op.out_edges[0] is psi[0] and op.in_edges[0] is psi[1]

    vec = quantum_constructor([psi[0], psi[1]], [])
    assert vec.is_vector() and not vec.is_adjoint_vector()

    adj = quantum_constructor([], [psi[0], psi[1]])
    assert adj.is_adjoint_vector() and not adj.is_vector()

    # scalar requires a fully-contracted ref network
    with pytest.raises(ValueError):
        quantum_constructor([], [], [psi])
    psi2 = tn.Node(rng.standard_normal((2, 2)))
    psi2[0] ^ psi2[1]
    sc = quantum_constructor([], [], [psi2])
    assert sc.is_scalar()


def test_dangling_edge_checks(rng):
    n1 = tn.Node(rng.standard_normal((2, 2)))
    n2 = tn.Node(rng.standard_normal((2, 2)))
    n1[1] ^ n2[0]
    # extra dangling edge must be explicitly ignored
    with pytest.raises(ValueError):
        QuVector([n1[0]])
    QuVector([n1[0]], ignore_edges=[n2[1]])  # ok when ignored
    # in/out edges must be dangling
    with pytest.raises(ValueError):
        QuVector([n1[0], n1[1], n2[1]])


def test_check_spaces_mismatch(rng):
    a = tn.Node(rng.standard_normal((2, 3)))
    b = tn.Node(rng.standard_normal((4, 5)))
    with pytest.raises(ValueError):
        check_spaces([a[0]], [b[0]])
    with pytest.raises(ValueError):
        check_spaces([a[0], a[1]], [b[0]])


def test_mul_semantics(rng):
    mat = np.eye(2)
    op = QuOperator.from_tensor(mat)
    scal = QuScalar.from_tensor(np.float64(0.5))
    np.testing.assert_allclose(np.asarray((op * scal).eval()), mat * 0.5)
    np.testing.assert_allclose(np.asarray((scal * op).eval()), mat * 0.5)
    np.testing.assert_allclose(np.asarray((scal * scal).eval()), 0.25)
    np.testing.assert_allclose(np.asarray((op * 0.5).eval()), mat * 0.5)
    np.testing.assert_allclose(np.asarray((0.5 * op).eval()), mat * 0.5)
    np.testing.assert_allclose(np.asarray((op / 2.0).eval()), mat * 0.5)
    with pytest.raises(ValueError):
        _ = op * np.eye(2)          # non-scalar


def test_expectation_via_reduced_density(rng):
    # <psi| (op x I x I) |psi>  ==  tr(op @ rho_1)
    psi_t = rng.standard_normal((2, 2, 2))
    op_t = rng.standard_normal((2, 2))
    psi = QuVector.from_tensor(psi_t)
    op = QuOperator.from_tensor(op_t)
    op3 = op.tensor_product(identity((2, 2)))
    res1 = np.asarray((psi.adjoint() @ op3 @ psi).eval())
    rho1 = psi.reduced_density([1, 2])
    res2 = np.asarray((op @ rho1).trace().eval())
    np.testing.assert_allclose(res1, res2, atol=1e-10)


def test_from_tensor_out_axes_permutation(rng):
    t = rng.standard_normal((2, 3, 2, 3))
    # interpret axes (2, 3) as outputs, (0, 1) as inputs
    op = QuOperator.from_tensor(t, out_axes=[2, 3], in_axes=[0, 1])
    dense = np.asarray(op.eval())
    np.testing.assert_allclose(dense, t.transpose(2, 3, 0, 1),
                               atol=1e-12)


def test_projector_squares_to_itself(rng):
    psi_t = rng.standard_normal((2, 2))
    psi = QuVector.from_tensor(psi_t)
    nrm = np.sqrt((psi.adjoint() @ psi).eval())
    psi = psi / float(nrm)
    P = psi.projector()
    P2 = (P @ P).eval()
    np.testing.assert_allclose(np.asarray(P2), np.asarray(P.eval()),
                               atol=1e-10)


def test_scalar_multiplication_by_node():
    # ADVICE r4: the reference (quantum/quantum.py:374-382) accepts a
    # scalar-shaped Node as the scalar operand in __mul__/__rmul__
    import numpy as np
    from tensornetwork_tpu.core.network import Node
    from tensornetwork_tpu.quantum.quantum import QuOperator
    op = QuOperator.from_tensor(np.diag([1.0, 2.0]), [0], [1])
    s = Node(np.array(3.0))
    np.testing.assert_allclose(np.asarray((op * s).eval()),
                               np.diag([3.0, 6.0]))
    np.testing.assert_allclose(np.asarray(op.__rmul__(s).eval()),
                               np.diag([3.0, 6.0]))
    import pytest
    with pytest.raises(ValueError):
        op * Node(np.ones((2, 2)))
