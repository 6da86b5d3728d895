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
