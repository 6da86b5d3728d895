"""ncon edge/error semantics (reference ``ncon_interface_test.py``
coverage class, VERDICT r2 item 8): label validation, canonicalization,
orders, traces, batch labels, dtype behavior.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensornetwork_tpu.ops.ncon import (canonicalize_structure,
                                        check_network, ncon)


def _r(shape, seed=0):
    return np.random.default_rng(seed).standard_normal(shape)


# -- validation errors ------------------------------------------------------

def test_label_zero_rejected():
    with pytest.raises(ValueError, match="label 0"):
        ncon([_r((2, 2))], [[0, -1]])


def test_tensor_count_mismatch():
    with pytest.raises(ValueError, match="tensors"):
        ncon([_r((2, 2))], [[1, -1], [1, -2]])


def test_rank_label_mismatch():
    with pytest.raises(ValueError, match="rank"):
        ncon([_r((2, 2, 3))], [[1, -1]])


def test_inconsistent_dimensions():
    with pytest.raises(ValueError, match="inconsistent"):
        ncon([_r((2, 3)), _r((4, 2))], [[-1, 1], [1, -2]])


def test_output_label_more_than_twice():
    with pytest.raises(ValueError, match="appears"):
        ncon([_r((2,)), _r((2,)), _r((2,))], [[-1], [-1], [-1]])


def test_output_label_repeated_on_one_tensor():
    with pytest.raises(ValueError, match="appears"):
        ncon([_r((2, 2))], [[-1, -1]])


def test_positive_label_thrice_on_one_tensor():
    with pytest.raises(ValueError, match="appears"):
        ncon([_r((2, 2, 2)), _r((2,))], [[1, 1, 1], [1]])


def test_trace_label_also_elsewhere_rejected():
    with pytest.raises(ValueError, match="traced"):
        ncon([_r((2, 2)), _r((2,))], [[1, 1], [1]])


def test_con_order_duplicate():
    with pytest.raises(ValueError, match="duplicate"):
        ncon([_r((2, 3)), _r((3, 2))], [[-1, 1], [1, -2]],
             con_order=[1, 1])


def test_con_order_not_permutation():
    with pytest.raises(ValueError, match="permutation"):
        ncon([_r((2, 3)), _r((3, 2))], [[-1, 1], [1, -2]],
             con_order=[2])


def test_out_order_not_permutation():
    with pytest.raises(ValueError, match="permutation"):
        ncon([_r((2, 3)), _r((3, 2))], [[-1, 1], [1, -2]],
             out_order=[-1])


def test_out_order_duplicate():
    with pytest.raises(ValueError, match="duplicate"):
        ncon([_r((2, 3)), _r((3, 2))], [[-1, 1], [1, -2]],
             out_order=[-1, -1])


# -- canonicalization -------------------------------------------------------

def test_string_labels_match_int_result():
    a, b = _r((3, 4)), _r((4, 5), seed=1)
    out_i = ncon([a, b], [[-1, 1], [1, -2]])
    out_s = ncon([a, b], [["-o1", "k"], ["k", "-o2"]])
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_i),
                               atol=0)


def test_mixed_string_int_labels():
    a, b, c = _r((3, 4)), _r((4, 5), seed=1), _r((5, 2), seed=2)
    out = ncon([a, b, c], [[-1, 1], [1, "k"], ["k", -2]])
    np.testing.assert_allclose(np.asarray(out), a @ b @ c, atol=1e-12)


def test_canonicalize_structure_fresh_labels_beyond_extremes():
    canonical, mapping = canonicalize_structure(
        [[5, "x"], ["x", -3, "-y"]])
    assert mapping["x"] == 6          # beyond max positive int label
    assert mapping["-y"] == -4        # beyond min negative int label
    assert canonical == ((5, 6), (6, -3, -4))


# -- semantics: orders, traces, sums, batches ------------------------------

def test_default_out_order_descending_negatives():
    a = _r((2, 3, 4))
    out = ncon([a], [[-3, -1, -2]])
    # default output order is -1, -2, -3: axes (1, 2, 0)
    np.testing.assert_allclose(np.asarray(out), a.transpose(1, 2, 0),
                               atol=0)


def test_explicit_out_order():
    a, b = _r((3, 4)), _r((4, 5), seed=1)
    out = ncon([a, b], [[-1, 1], [1, -2]], out_order=[-2, -1])
    np.testing.assert_allclose(np.asarray(out), (a @ b).T, atol=1e-12)


def test_explicit_con_order_changes_path_not_result():
    a, b, c = _r((3, 4)), _r((4, 5), seed=1), _r((5, 6), seed=2)
    net = [[-1, 1], [1, 2], [2, -2]]
    out1 = ncon([a, b, c], net, con_order=[1, 2])
    out2 = ncon([a, b, c], net, con_order=[2, 1])
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               atol=1e-10)


def test_full_trace_scalar():
    a = _r((5, 5))
    out = ncon([a], [[1, 1]])
    np.testing.assert_allclose(float(np.asarray(out)), np.trace(a),
                               atol=1e-12)


def test_partial_trace_then_contract():
    a, v = _r((3, 4, 3)), _r((4,), seed=1)
    out = ncon([a, v], [[1, 2, 1], [2]])
    np.testing.assert_allclose(float(np.asarray(out)),
                               np.einsum("iji,j->", a, v), atol=1e-12)


def test_lone_label_sum():
    a = _r((3, 4))
    out = ncon([a], [[1, -1]])
    np.testing.assert_allclose(np.asarray(out), a.sum(axis=0),
                               atol=1e-12)


def test_outer_product_disconnected():
    a, b = _r((3,)), _r((4,), seed=1)
    out = ncon([a, b], [[-1], [-2]])
    np.testing.assert_allclose(np.asarray(out), np.outer(a, b),
                               atol=1e-12)


def test_open_batch_label():
    a, b = _r((5, 3, 4)), _r((5, 4, 2), seed=1)
    out = ncon([a, b], [[-1, -2, 1], [-1, 1, -3]])
    np.testing.assert_allclose(np.asarray(out),
                               np.einsum("bij,bjk->bik", a, b),
                               atol=1e-12)


def test_closed_batch_label_three_tensors():
    a = _r((5, 3))
    b = _r((5, 3, 4), seed=1)
    c = _r((5, 4), seed=2)
    out = ncon([a, b, c], [[1, 2], [1, 2, 3], [1, 3]])
    np.testing.assert_allclose(float(np.asarray(out)),
                               np.einsum("bi,bij,bj->", a, b, c),
                               atol=1e-12)


def test_scalar_times_network():
    # rank-0 operand rides as an outer product
    a, s = _r((3, 3)), np.asarray(2.5)
    out = ncon([a, s], [[1, 1], []])
    np.testing.assert_allclose(float(np.asarray(out)),
                               2.5 * np.trace(a), atol=1e-12)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.float64])
def test_dtype_preserved(dtype):
    a = jnp.asarray(_r((3, 4)), dtype)
    b = jnp.asarray(_r((4, 5), seed=1), dtype)
    out = ncon([a, b], [[-1, 1], [1, -2]])
    assert out.dtype == dtype


def test_jit_false_matches_jit_true():
    a, b = _r((3, 4)), _r((4, 3), seed=1)
    o1 = ncon([a, b], [[1, 2], [2, 1]], jit=True)
    o2 = ncon([a, b], [[1, 2], [2, 1]], jit=False)
    np.testing.assert_allclose(float(np.asarray(o1)),
                               float(np.asarray(o2)), atol=1e-12)


def test_check_network_flag_skips_validation():
    # with validation off, a consistent network still contracts
    a, b = _r((3, 4)), _r((4, 5), seed=1)
    out = ncon([a, b], [[-1, 1], [1, -2]], check_network=False)
    np.testing.assert_allclose(np.asarray(out), a @ b, atol=1e-12)


def test_con_order_string_solvers():
    a, b, c = _r((3, 4)), _r((4, 5), seed=1), _r((5, 6), seed=2)
    net = [[-1, 1], [1, 2], [2, -2]]
    for method in ("greedy", "optimal"):
        out = ncon([a, b, c], net, con_order=method)
        np.testing.assert_allclose(np.asarray(out), a @ b @ c,
                                   atol=1e-10)
