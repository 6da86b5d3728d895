"""Pallas kernel tests (interpret mode on CPU; see the kernel module's
status note for compiled-mode findings)."""
import jax
import jax.numpy as jnp
import numpy as np

from tensornetwork_tpu.ops import kernels as K


def test_heff_matvec_kernel_matches_einsum(rng):
    B, chi, d, M = 8, 16, 2, 3
    L = jnp.asarray(rng.standard_normal((B, chi, M, chi)), jnp.float32)
    W = jnp.asarray(rng.standard_normal((M, M, d, d)), jnp.float32)
    R = jnp.asarray(rng.standard_normal((B, chi, M, chi)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((B, chi, d, chi)), jnp.float32)
    Lt, W_, Rt, xt = K.prepare_operands(L, W, R, x)
    f = K.make_heff_matvec(chi, d, M, tile_b=4, interpret=True)
    y = K.finalize_output(f(Lt, W_, Rt, xt))
    ref = K.heff_matvec_reference(L, W, R, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-3,
                               rtol=1e-3)


def test_heff_matvec_batch_validation(rng):
    f = K.make_heff_matvec(8, 2, 3, tile_b=4, interpret=True)
    L = jnp.zeros((6, 3, 8, 8), jnp.float32)  # 6 not divisible by 4
    W = jnp.zeros((3, 3, 2, 2), jnp.float32)
    import pytest
    with pytest.raises(ValueError):
        f(L, W, L, jnp.zeros((6, 2, 8, 8), jnp.float32))
