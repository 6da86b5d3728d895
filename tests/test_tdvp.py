import pytest
"""TDVP integrator vs exact dense evolution / exact diagonalization.

Oracle strategy follows the reference's exact-result pattern
(reference ``matrixproductstates/dmrg_test.py:18-33``); the reference has
no TDVP to compare against.
"""
import jax
import jax.numpy as jnp
import numpy as np
import scipy.linalg as sla

from tensornetwork_tpu.models.mpo import FiniteTFI, FiniteXXZ, mpo_to_dense
from tensornetwork_tpu.models.tdvp import TDVP, tdvp_one_site_sweep
from tensornetwork_tpu.ops.krylov import expm_multiply_lanczos


def _product_state_stack(N, chi, v, dtype):
    As = np.zeros((N, chi, len(v), chi), dtype)
    As[:, 0, :, 0] = v
    return jnp.asarray(As)


def _dense_from_stack(As):
    """Boundary block [0, :, 0] of the stacked MPS as a state vector."""
    acc = np.asarray(As[0])
    for i in range(1, As.shape[0]):
        acc = np.einsum("a...b,bsc->a...sc", acc, np.asarray(As[i]))
    N = As.shape[0]
    chi = As.shape[1]
    vec = acc.reshape(chi, -1, chi)[0, :, 0]
    return vec


def test_expm_multiply_lanczos_matches_scipy():
    rng = np.random.default_rng(0)
    n = 50
    A = rng.standard_normal((n, n))
    A = (A + A.T) / 2
    v = rng.standard_normal(n)
    for coeff in [-0.4, -0.25j, 0.15, 0.1 - 0.3j]:
        exact = sla.expm(coeff * A) @ v
        got = np.asarray(expm_multiply_lanczos(
            lambda x: jnp.asarray(A) @ x, jnp.asarray(v), coeff, 30))
        np.testing.assert_allclose(got, exact, atol=1e-9)


def test_real_time_matches_exact_expm():
    N, chi = 6, 8
    mpo = FiniteTFI(-1.0, -1.2, N=N)
    H = mpo_to_dense(mpo)
    v = np.array([1.0, 0.6]) / np.linalg.norm([1.0, 0.6])
    As = _product_state_stack(N, chi, v, np.complex128)
    psi0 = np.array([1.0])
    for _ in range(N):
        psi0 = np.kron(psi0, v)
    tdvp = TDVP(As, mpo)
    e0 = tdvp.energy()
    t, steps = 0.5, 25
    tdvp.evolve(t, steps)
    # energy conservation (exact for 1-site TDVP up to Krylov error)
    assert abs(tdvp.energy() - e0) < 1e-8
    psi_t = sla.expm(-1j * t * H) @ psi0.astype(np.complex128)
    vec = _dense_from_stack(tdvp.As)
    fidelity = abs(np.vdot(vec / np.linalg.norm(vec),
                           psi_t / np.linalg.norm(psi_t)))
    assert fidelity > 1 - 1e-8


def test_norm_is_preserved():
    N, chi = 5, 4
    mpo = FiniteXXZ(1.0, 1.0, 0.2, N=N)
    v = np.array([1.0, 1.0]) / np.sqrt(2)
    As = _product_state_stack(N, chi, v, np.complex128)
    tdvp = TDVP(As, mpo)
    tdvp.evolve(0.3, 10)
    vec = _dense_from_stack(tdvp.As)
    np.testing.assert_allclose(np.linalg.norm(vec), 1.0, atol=1e-9)


def test_imaginary_time_converges_to_ground_state():
    # imaginary-time TDVP is a projector flow with an O(dt^2) splitting
    # bias — it approaches the ground state but DMRG remains the
    # high-precision ground-state solver.  Single-boundary-sector init.
    N, chi = 6, 8      # chi = 2^(N/2): exact-capable manifold
    mpo = FiniteTFI(-1.0, -1.1, N=N)
    e_exact = np.linalg.eigvalsh(mpo_to_dense(mpo))[0]
    rng = np.random.default_rng(0)
    As = np.zeros((N, chi, 2, chi))
    dims = [1] + [min(2 ** min(i + 1, N - i - 1), chi)
                  for i in range(N - 1)] + [1]
    for i in range(N):
        As[i, :dims[i], :, :dims[i + 1]] = rng.standard_normal(
            (dims[i], 2, dims[i + 1]))
    tdvp = TDVP(jnp.asarray(As), mpo)
    e_start = tdvp.energy()
    for dt, n in [(0.2, 60), (0.05, 60)]:
        for _ in range(n):
            tdvp.step(dt, imaginary=True)
    assert e_start > e_exact + 1.0          # started far away
    assert abs(tdvp.energy() - e_exact) < 1e-4


def test_two_site_matches_exact_expm():
    N, chi = 6, 8
    mpo = FiniteTFI(-1.0, -1.2, N=N)
    H = mpo_to_dense(mpo)
    v = np.array([1.0, 0.6]) / np.linalg.norm([1.0, 0.6])
    As = _product_state_stack(N, chi, v, np.complex128)
    psi0 = np.array([1.0])
    for _ in range(N):
        psi0 = np.kron(psi0, v)
    tdvp = TDVP(As, mpo)
    e0 = tdvp.energy()
    t, steps = 0.5, 25
    tdvp.evolve(t, steps, two_site=True)
    assert abs(tdvp.energy() - e0) < 1e-8
    # full-rank manifold: no truncation happened
    assert tdvp.truncation_errors[-1] == 0.0
    psi_t = sla.expm(-1j * t * H) @ psi0.astype(np.complex128)
    vec = _dense_from_stack(tdvp.As)
    fidelity = abs(np.vdot(vec / np.linalg.norm(vec),
                           psi_t / np.linalg.norm(psi_t)))
    assert fidelity > 1 - 1e-8


def test_two_site_truncates_when_chi_limited():
    # chi=2 < needed bond content: truncation error must accumulate but
    # the state stays normalized and energy stays finite
    N, chi = 6, 2
    mpo = FiniteTFI(-1.0, -1.5, N=N)
    v = np.array([1.0, 0.0])
    As = _product_state_stack(N, chi, v, np.complex128)
    tdvp = TDVP(As, mpo)
    tdvp.evolve(1.0, 20, two_site=True)
    assert tdvp.truncation_errors[-1] > 0.0
    vec = _dense_from_stack(tdvp.As)
    np.testing.assert_allclose(np.linalg.norm(vec), 1.0, atol=1e-8)


def test_sweep_is_jit_cached():
    # two sweeps with the same shapes must not retrace (compile cache hit)
    N, chi = 4, 4
    mpo = FiniteTFI(-1.0, -0.9, N=N)
    v = np.array([1.0, 0.3]) / np.linalg.norm([1.0, 0.3])
    As = _product_state_stack(N, chi, v, np.complex128)
    Ws = mpo.Ws.astype(As.dtype)
    vL = mpo.vL.astype(As.dtype)
    vR = mpo.vR.astype(As.dtype)
    from tensornetwork_tpu.models.tdvp import _tdvp_one_site_jit
    n0 = _tdvp_one_site_jit._cache_size()
    out1 = tdvp_one_site_sweep(As, Ws, vL, vR, 0.01)
    out2 = tdvp_one_site_sweep(out1, Ws, vL, vR, 0.01)
    assert _tdvp_one_site_jit._cache_size() == n0 + 1
    assert out2.shape == As.shape


@pytest.mark.slow
def test_sc_sweep_fused_kernel_matches_xla():
    # fused realified-Lanczos expm (interpret mode on CPU) vs the XLA SC
    # path: same state after a short real-time sweep
    from tensornetwork_tpu.models.tdvp import tdvp_one_site_sweep_sc
    from tensornetwork_tpu.ops import split_complex as sc
    N, chi = 4, 4
    mpo = FiniteTFI(-1.0, -0.9, N=N)
    v = np.array([1.0, 0.3]) / np.linalg.norm([1.0, 0.3])
    As_c = np.asarray(_product_state_stack(N, chi, v, np.complex128))
    As = sc.SC(jnp.asarray(As_c.real, jnp.float64),
               jnp.asarray(As_c.imag, jnp.float64))
    Ws = jnp.asarray(mpo.Ws, jnp.float64)
    vL = jnp.asarray(mpo.vL, jnp.float64)
    vR = jnp.asarray(mpo.vR, jnp.float64)
    out_x = tdvp_one_site_sweep_sc(As, Ws, vL, vR, 0.02,
                                   num_krylov_vecs=10,
                                   lanczos_impl="xla")
    out_f = tdvp_one_site_sweep_sc(As, Ws, vL, vR, 0.02,
                                   num_krylov_vecs=10,
                                   lanczos_impl="fused")
    # raw tensors are gauge-ambiguous on rank-deficient (product-state)
    # panels — compare the physical states instead
    vx = _dense_from_stack(np.asarray(out_x.re) + 1j*np.asarray(out_x.im))
    vf = _dense_from_stack(np.asarray(out_f.re) + 1j*np.asarray(out_f.im))
    fid = abs(np.vdot(vx / np.linalg.norm(vx), vf / np.linalg.norm(vf)))
    assert fid > 1 - 1e-10


def test_real_tdvp_fused_imaginary_time():
    # fused real expm path (interpret on CPU), imaginary-time step
    from tensornetwork_tpu.models.tdvp import tdvp_one_site_sweep
    N, chi = 4, 4
    mpo = FiniteTFI(-1.0, -0.9, N=N)
    v = np.array([1.0, 0.3]) / np.linalg.norm([1.0, 0.3])
    As = jnp.asarray(np.asarray(
        _product_state_stack(N, chi, v, np.float64)))
    out_x = tdvp_one_site_sweep(As, mpo.Ws, mpo.vL, mpo.vR, 0.05,
                                num_krylov_vecs=10, imaginary=True,
                                lanczos_impl="xla")
    out_f = tdvp_one_site_sweep(As, mpo.Ws, mpo.vL, mpo.vR, 0.05,
                                num_krylov_vecs=10, imaginary=True,
                                lanczos_impl="fused")
    vx = _dense_from_stack(out_x)
    vf = _dense_from_stack(out_f)
    fid = abs(np.vdot(vx / np.linalg.norm(vx), vf / np.linalg.norm(vf)))
    assert fid > 1 - 1e-10


def test_batched_sc_tdvp_parallel_quenches():
    # B independent quenches in one compiled sweep; each stays
    # normalized and matches the single-instance sweep
    from tensornetwork_tpu.parallel.batch import (
        batched_tdvp_one_site_sweep_sc)
    from tensornetwork_tpu.models.tdvp import tdvp_one_site_sweep_sc
    from tensornetwork_tpu.ops import split_complex as sc
    N, chi, d, B = 4, 4, 2, 3
    mpo = FiniteTFI(-1.0, -0.9, N=N)
    rng = np.random.default_rng(0)
    vs = rng.standard_normal((B, d))
    vs /= np.linalg.norm(vs, axis=1, keepdims=True)
    As = np.zeros((B, N, chi, d, chi))
    for b in range(B):
        As[b, :, 0, :, 0] = vs[b]
    Asb = sc.SC(jnp.asarray(As), jnp.zeros_like(jnp.asarray(As)))
    Ws = jnp.asarray(mpo.Ws, jnp.float64)
    vL = jnp.asarray(mpo.vL, jnp.float64)
    vR = jnp.asarray(mpo.vR, jnp.float64)
    out = batched_tdvp_one_site_sweep_sc(Asb, Ws, vL, vR, 0.02,
                                         num_krylov_vecs=10)
    for b in range(B):
        single = tdvp_one_site_sweep_sc(
            sc.SC(Asb.re[b], Asb.im[b]), Ws, vL, vR, 0.02,
            num_krylov_vecs=10, lanczos_impl="xla")
        vb = _dense_from_stack(np.asarray(out.re[b])
                               + 1j * np.asarray(out.im[b]))
        vs_ = _dense_from_stack(np.asarray(single.re)
                                + 1j * np.asarray(single.im))
        fid = abs(np.vdot(vb / np.linalg.norm(vb),
                          vs_ / np.linalg.norm(vs_)))
        assert fid > 1 - 1e-10
