"""MPO zoo property tests (reference ``matrixproductstates/mpo.py``
zoo coverage class): Hermiticity, boundary contraction structure, and
coupling-limit behavior of every shipped Hamiltonian MPO."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensornetwork_tpu.models import (FiniteTFI, FiniteXXZ,
                                      FiniteFreeFermion2D, mpo_to_dense)


def _dense(mpo):
    return np.asarray(mpo_to_dense(mpo))


@pytest.mark.parametrize("mk", [
    lambda: FiniteTFI(Jx=-1.0, Bz=-0.7, N=5),
    lambda: FiniteTFI(Jx=0.5, Bz=1.3, N=4),
    lambda: FiniteXXZ(Jz=1.0, Jxy=0.8, Bz=0.2, N=5),
    lambda: FiniteXXZ(Jz=-0.4, Jxy=1.0, Bz=0.0, N=4),
    lambda: FiniteFreeFermion2D(1.0, 0.5, 0.2, 2, 2),
])
def test_mpo_dense_is_hermitian(mk):
    H = _dense(mk())
    np.testing.assert_allclose(H, H.conj().T, atol=1e-12)


@pytest.mark.parametrize("N", [2, 3, 5, 8])
def test_tfi_extensive_identity_limit(N):
    # Jx=0: H = -Bz * sum Z_i — spectrum is exactly the magnetization
    H = _dense(FiniteTFI(Jx=0.0, Bz=-1.0, N=N))
    ev = np.sort(np.linalg.eigvalsh(H))
    exact = np.sort([N - 2 * bin(b).count("1") for b in range(2**N)])
    np.testing.assert_allclose(ev, exact, atol=1e-12)


@pytest.mark.parametrize("N", [3, 4, 6])
def test_xxz_total_sz_conserved(N):
    H = _dense(FiniteXXZ(Jz=0.7, Jxy=1.1, Bz=0.3, N=N))
    Z = np.diag([1.0, -1.0])
    I = np.eye(2)
    Sz = np.zeros_like(H)
    for i in range(N):
        ops = [I] * N
        ops[i] = Z
        acc = np.array([[1.0]])
        for o in ops:
            acc = np.kron(acc, o)
        Sz += acc / 2
    np.testing.assert_allclose(H @ Sz, Sz @ H, atol=1e-10)


@pytest.mark.parametrize("N", [2, 4, 6])
def test_tfi_ground_energy_below_product_bound(N):
    # variational sanity: E0 <= -Bz*N (the all-up product state energy
    # at Jx<0 ... with Bz<0 convention used here)
    mpo = FiniteTFI(Jx=-1.0, Bz=-1.0, N=N)
    e0 = float(np.linalg.eigvalsh(_dense(mpo))[0])
    assert e0 <= -N + 1e-9


def test_mpo_shapes_and_boundaries():
    for mpo, M in ((FiniteTFI(Jx=1.0, Bz=1.0, N=6), 3),
                   (FiniteXXZ(Jz=1.0, Jxy=1.0, Bz=0.1, N=6), 5)):
        assert mpo.Ws.shape[:2] == (6, M) and mpo.Ws.shape[2] == M
        assert mpo.vL.shape == (M,) and mpo.vR.shape == (M,)
        assert mpo.num_sites == 6 and mpo.phys_dim == 2


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.float64])
def test_mpo_dtype(dtype):
    mpo = FiniteTFI(Jx=1.0, Bz=1.0, N=4, dtype=dtype)
    assert mpo.Ws.dtype == dtype
    assert mpo.vL.dtype == dtype
