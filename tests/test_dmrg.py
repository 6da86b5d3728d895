"""DMRG tests vs exact diagonalization (reference oracle strategy:
``matrixproductstates/dmrg_test.py:18-33,166-191``)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensornetwork_tpu.models import (
    FiniteDMRG, FiniteTFI, FiniteXXZ, FiniteFreeFermion2D, mpo_to_dense)
from tensornetwork_tpu.models.dmrg import (
    random_mps_stack, mps_mpo_expectation)


def exact_ground_energy(mpo):
    H = mpo_to_dense(mpo)
    return float(np.linalg.eigvalsh(H)[0])


def test_mpo_to_dense_tfi_small():
    # oracle consistency: dense TFI from MPO == hand-built TFI
    N = 4
    mpo = FiniteTFI(Jx=-1.0, Bz=-0.7, N=N)
    H = mpo_to_dense(mpo)
    X = np.array([[0, 1], [1, 0]]); Z = np.diag([1.0, -1.0]); I = np.eye(2)
    def kron_at(ops):
        out = np.array([[1.0]])
        for o in ops:
            out = np.kron(out, o)
        return out
    Href = np.zeros((16, 16))
    for i in range(N - 1):
        ops = [I] * N; ops[i] = X; ops[i + 1] = X
        Href += -1.0 * kron_at(ops)
    for i in range(N):
        ops = [I] * N; ops[i] = Z
        Href += -0.7 * kron_at(ops)
    np.testing.assert_allclose(H, Href, atol=1e-12)


def test_one_site_dmrg_tfi():
    N, chi = 10, 16
    mpo = FiniteTFI(Jx=-1.0, Bz=-1.0, N=N)
    exact = exact_ground_energy(mpo)
    mps = random_mps_stack(jax.random.PRNGKey(0), N, chi)
    dmrg = FiniteDMRG(mps, mpo)
    e = dmrg.run_one_site(num_sweeps=6, num_krylov_vecs=20)
    np.testing.assert_allclose(e, exact, rtol=1e-8)
    # energy functional of the final state agrees with the Lanczos energy
    np.testing.assert_allclose(dmrg.compute_energy(), exact, rtol=1e-8)


def test_two_site_dmrg_tfi():
    N, chi = 8, 8
    mpo = FiniteTFI(Jx=-1.0, Bz=-0.5, N=N)
    exact = exact_ground_energy(mpo)
    mps = random_mps_stack(jax.random.PRNGKey(1), N, chi)
    dmrg = FiniteDMRG(mps, mpo)
    e = dmrg.run_two_site(num_sweeps=6, num_krylov_vecs=20)
    np.testing.assert_allclose(e, exact, rtol=1e-6)
    # chi=8 < 2^4: genuine truncation happens and is reported
    assert 0 < dmrg.truncation_errors[-1] < 1e-3
    # with chi=16 the state is exact: truncation error ~ 0
    mps2 = random_mps_stack(jax.random.PRNGKey(7), N, 16)
    dmrg2 = FiniteDMRG(mps2, mpo)
    e2 = dmrg2.run_two_site(num_sweeps=6, num_krylov_vecs=20)
    np.testing.assert_allclose(e2, exact, rtol=1e-9)
    # at chi=16 only Lanczos-residual tail weight remains
    assert dmrg2.truncation_errors[-1] < 1e-5


def test_one_site_dmrg_xxz():
    N, chi = 8, 16
    mpo = FiniteXXZ(Jz=1.0, Jxy=1.0, Bz=0.0, N=N)
    exact = exact_ground_energy(mpo)
    mps = random_mps_stack(jax.random.PRNGKey(2), N, chi)
    dmrg = FiniteDMRG(mps, mpo)
    e = dmrg.run_one_site(num_sweeps=8, num_krylov_vecs=20)
    np.testing.assert_allclose(e, exact, rtol=1e-7)


def test_free_fermion_2d_mpo():
    # exact free-fermion oracle: sum of negative single-particle eigenvalues
    N1, N2 = 2, 3
    t1, t2, mu = 1.0, 0.8, 0.3
    mpo = FiniteFreeFermion2D(t1, t2, mu, N1, N2)
    H = mpo_to_dense(mpo)
    # single-particle hopping matrix in chain (snake) order
    N = N1 * N2
    def site(x, y):
        return x * N2 + (y if x % 2 == 0 else N2 - 1 - y)
    h = np.zeros((N, N))
    for x in range(N1):
        for y in range(N2):
            if y + 1 < N2:
                i, j = site(x, y), site(x, y + 1)
                h[i, j] += -t2; h[j, i] += -t2
            if x + 1 < N1:
                i, j = site(x, y), site(x + 1, y)
                h[i, j] += -t1; h[j, i] += -t1
    h -= mu * np.eye(N)
    ev = np.linalg.eigvalsh(h)
    exact = float(np.sum(ev[ev < 0]))
    many_body = float(np.linalg.eigvalsh(H)[0])
    np.testing.assert_allclose(many_body, exact, atol=1e-10)


def test_dmrg_free_fermion_2d():
    N1, N2 = 2, 3
    mpo = FiniteFreeFermion2D(1.0, 0.8, 0.3, N1, N2)
    exact = exact_ground_energy(mpo)
    mps = random_mps_stack(jax.random.PRNGKey(3), N1 * N2, 16)
    dmrg = FiniteDMRG(mps, mpo)
    e = dmrg.run_one_site(num_sweeps=8, num_krylov_vecs=20)
    np.testing.assert_allclose(e, exact, rtol=1e-7)


def test_dmrg_shape_validation():
    mpo = FiniteTFI(Jx=-1.0, Bz=-1.0, N=6)
    with pytest.raises(ValueError):
        FiniteDMRG(random_mps_stack(jax.random.PRNGKey(0), 5, 8), mpo)


def test_expectation_value_random_state():
    # <psi|H|psi>/<psi|psi> on a random uniform stack vs dense oracle
    N, chi = 6, 5
    mpo = FiniteTFI(Jx=-1.0, Bz=-0.9, N=N)
    As = random_mps_stack(jax.random.PRNGKey(4), N, chi)
    val = float(mps_mpo_expectation(As, mpo.Ws, mpo.vL, mpo.vR))
    # oracle: materialize the (traced-boundary) state explicitly
    A = np.asarray(As)
    H = mpo_to_dense(mpo)
    # psi[a, s1..sN, b] with free boundary bonds a, b
    psi = np.transpose(A[0], (0, 1, 2)).reshape(chi, 2, chi)
    acc = psi
    for i in range(1, N):
        acc = np.einsum("a...b,bsc->a...sc", acc, A[i])
    vec = acc.reshape(chi, 2**N, chi)
    # trace boundaries: sum over diagonal boundary pairs
    num = np.einsum("aib,ij,ajb->", vec, H, vec)
    den = np.einsum("aib,aib->", vec, vec)
    np.testing.assert_allclose(val, num / den, rtol=1e-10)


def test_batched_two_site_sweep():
    from tensornetwork_tpu.parallel.batch import batched_two_site_sweep
    N, chi, B = 6, 8, 3
    mpo = FiniteTFI(Jx=-1.0, Bz=-0.7, N=N)
    exact = exact_ground_energy(mpo)
    keys = jax.random.split(jax.random.PRNGKey(5), B)
    As = jnp.stack([random_mps_stack(k, N, chi) for k in keys])
    for _ in range(6):
        res = batched_two_site_sweep(As, mpo.Ws, mpo.vL, mpo.vR,
                                     num_krylov_vecs=20)
        As = res.As
    np.testing.assert_allclose(np.asarray(res.energy),
                               np.full(B, exact), rtol=1e-6)


def test_mpo_aliases():
    from tensornetwork_tpu.models import BaseMPO, FiniteMPO, InfiniteMPO
    mpo = FiniteTFI(Jx=-1.0, Bz=-1.0, N=4)
    assert isinstance(mpo, BaseMPO)
    impo = InfiniteMPO(mpo.Ws, mpo.vL, mpo.vR)
    rolled = impo.roll(1)
    np.testing.assert_allclose(np.asarray(rolled.Ws[-1]),
                               np.asarray(mpo.Ws[0]))


@pytest.mark.parametrize("qr_impl,ritz_impl", [
    ("polar", "eigh"), ("householder", "power"), ("polar", "power")])
def test_one_site_dmrg_alternative_impls(qr_impl, ritz_impl):
    # MXU-friendly gauge-shift (Newton-Schulz polar) and Ritz (power
    # iteration) variants must converge to the same ground energy
    from tensornetwork_tpu.models.dmrg import one_site_sweep
    N, chi = 8, 12
    mpo = FiniteTFI(Jx=-1.0, Bz=-0.9, N=N)
    exact = exact_ground_energy(mpo)
    As = random_mps_stack(jax.random.PRNGKey(3), N, chi)
    for _ in range(6):
        res = one_site_sweep(As, mpo.Ws, mpo.vL, mpo.vR,
                             num_krylov_vecs=20, qr_impl=qr_impl,
                             ritz_impl=ritz_impl)
        As = res.As
    np.testing.assert_allclose(float(res.energy), exact, rtol=1e-6)


def test_two_site_dmrg_alternative_impls():
    from tensornetwork_tpu.models.dmrg import two_site_sweep
    N, chi = 8, 12
    mpo = FiniteTFI(Jx=-1.0, Bz=-0.9, N=N)
    exact = exact_ground_energy(mpo)
    As = random_mps_stack(jax.random.PRNGKey(4), N, chi)
    for _ in range(6):
        res = two_site_sweep(As, mpo.Ws, mpo.vL, mpo.vR,
                             num_krylov_vecs=20, qr_impl="polar",
                             ritz_impl="power")
        As = res.As
    np.testing.assert_allclose(float(res.energy), exact, rtol=1e-6)


def test_one_site_dmrg_matvec_precision_knob():
    # matvec_prec threads through to the Lanczos matvec einsums; on the
    # CPU test backend all precisions are exact f32/f64 matmuls, so the
    # converged energy must match the exact ground energy either way.
    from tensornetwork_tpu.models.dmrg import one_site_sweep
    N, chi = 8, 12
    mpo = FiniteTFI(Jx=-1.0, Bz=-0.7, N=N)
    exact = exact_ground_energy(mpo)
    for prec in ("high", "highest"):
        As = random_mps_stack(jax.random.PRNGKey(5), N, chi)
        for _ in range(6):
            res = one_site_sweep(As, mpo.Ws, mpo.vL, mpo.vR,
                                 num_krylov_vecs=20, matvec_prec=prec)
            As = res.As
        np.testing.assert_allclose(float(res.energy), exact, rtol=1e-6)


def test_two_site_sweep_chaining():
    # feeding SweepResult.renvs into the next two-site sweep skips the
    # re-canonicalization prepass; the chained iteration must converge
    # to the same exact ground energy as the unchained one
    from tensornetwork_tpu.models.dmrg import two_site_sweep
    N, chi = 8, 10
    mpo = FiniteTFI(Jx=-1.0, Bz=-0.8, N=N)
    exact = exact_ground_energy(mpo)
    As = random_mps_stack(jax.random.PRNGKey(6), N, chi)
    renvs = None
    for _ in range(6):
        res = two_site_sweep(As, mpo.Ws, mpo.vL, mpo.vR,
                             num_krylov_vecs=20, renvs=renvs)
        As, renvs = res.As, res.renvs
    assert res.renvs.shape == (N - 1, chi, mpo.Ws.shape[1], chi)
    np.testing.assert_allclose(float(res.energy), exact, rtol=1e-7)
    # batched wrapper accepts and emits the same chaining stack
    from tensornetwork_tpu.parallel.batch import batched_two_site_sweep
    B = 2
    keys = jax.random.split(jax.random.PRNGKey(8), B)
    As_b = jnp.stack([random_mps_stack(k, N, chi) for k in keys])
    rv = None
    for _ in range(6):
        resb = batched_two_site_sweep(As_b, mpo.Ws, mpo.vL, mpo.vR,
                                      num_krylov_vecs=20, renvs=rv)
        As_b, rv = resb.As, resb.renvs
    np.testing.assert_allclose(np.asarray(resb.energy),
                               np.full(B, exact), rtol=1e-6)


def test_two_site_chaining_with_subspace_polar():
    # the actual batched-TPU default combination: renvs chaining +
    # trunc_impl="subspace" + trunc_orth="polar" (ADVICE r2: this code
    # path was only ever validated on hardware, not by any CPU test)
    from tensornetwork_tpu.models.dmrg import two_site_sweep
    N, chi = 8, 10
    mpo = FiniteTFI(Jx=-1.0, Bz=-0.8, N=N)
    exact = exact_ground_energy(mpo)
    As = random_mps_stack(jax.random.PRNGKey(9), N, chi)
    renvs = None
    for _ in range(8):
        res = two_site_sweep(As, mpo.Ws, mpo.vL, mpo.vR,
                             num_krylov_vecs=20, renvs=renvs,
                             trunc_impl="subspace", trunc_orth="polar",
                             trunc_iters=6)
        As, renvs = res.As, res.renvs
    np.testing.assert_allclose(float(res.energy), exact, rtol=1e-6)


@pytest.mark.parametrize("trunc_orth", ["qr", "polar+qr", "polar"])
def test_two_site_dmrg_subspace_truncation(trunc_orth):
    # matmul-only truncation path (TPU batched default): converges to
    # the exact ground energy within the inexact-projector floor (~1e-9
    # at f64, far below the f32 on-chip floor).  The NS-polar
    # orthonormalizers replace the serializing batched Householder QR
    # on TPU (trunc_orth knob, measured in BASELINE.md).
    from tensornetwork_tpu.models.dmrg import two_site_sweep
    N, chi = 8, 12
    mpo = FiniteTFI(Jx=-1.0, Bz=-1.0, N=N)  # critical point, worst gaps
    exact = exact_ground_energy(mpo)
    As = random_mps_stack(jax.random.PRNGKey(4), N, chi)
    for _ in range(8):
        res = two_site_sweep(As, mpo.Ws, mpo.vL, mpo.vR,
                             num_krylov_vecs=16, trunc_impl="subspace",
                             trunc_iters=6, trunc_orth=trunc_orth)
        As = res.As
    np.testing.assert_allclose(float(res.energy), exact, rtol=1e-7)


def test_batched_paired_sweep_matches_standard():
    # the paired sweep (pair instances per fused-Lanczos program) must
    # reproduce the standard batched fused sweep exactly off-chip
    from tensornetwork_tpu.parallel.batch import (
        batched_one_site_sweep, batched_one_site_sweep_paired)
    N, chi, B = 8, 10, 4
    mpo = FiniteTFI(Jx=-1.0, Bz=-0.8, N=N, dtype=jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    As = jnp.stack([random_mps_stack(k, N, chi, 2, jnp.float32)
                    for k in keys])
    A1 = A2 = As
    r1 = r2 = None
    for _ in range(5):
        res1 = batched_one_site_sweep(A1, mpo.Ws, mpo.vL, mpo.vR,
                                      num_krylov_vecs=16,
                                      lanczos_impl="fused", reorth=False,
                                      renvs=r1)
        A1, r1 = res1.As, res1.renvs
        res2 = batched_one_site_sweep_paired(A2, mpo.Ws, mpo.vL, mpo.vR,
                                             num_krylov_vecs=16, pair=2,
                                             renvs=r2)
        A2, r2 = res2.As, res2.renvs
    np.testing.assert_allclose(np.asarray(res2.energy),
                               np.asarray(res1.energy), atol=1e-6)
    exact = exact_ground_energy(mpo)
    np.testing.assert_allclose(np.asarray(res2.energy),
                               np.full(B, exact), rtol=1e-5)


@pytest.mark.slow
def test_batched_paired_two_site_matches_standard():
    # interpret-mode two-site paired kernels are expensive on CPU (the
    # nt=d^2 tile count); slow-marked, the one-site paired equivalence
    # runs in the default suite
    from tensornetwork_tpu.parallel.batch import (
        batched_two_site_sweep, batched_two_site_sweep_paired)
    N, chi, B = 8, 8, 4
    mpo = FiniteTFI(Jx=-1.0, Bz=-0.7, N=N, dtype=jnp.float32)
    exact = exact_ground_energy(mpo)
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    As = jnp.stack([random_mps_stack(k, N, chi, 2, jnp.float32)
                    for k in keys])
    A1 = A2 = As
    r1 = r2 = None
    for _ in range(6):
        res1 = batched_two_site_sweep(
            A1, mpo.Ws, mpo.vL, mpo.vR, num_krylov_vecs=16,
            lanczos_impl="fused", trunc_impl="subspace", trunc_iters=2,
            trunc_orth="polar", renvs=r1)
        A1, r1 = res1.As, res1.renvs
        res2 = batched_two_site_sweep_paired(
            A2, mpo.Ws, mpo.vL, mpo.vR, num_krylov_vecs=16, pair=2,
            renvs=r2)
        A2, r2 = res2.As, res2.renvs
    np.testing.assert_allclose(np.asarray(res2.energy),
                               np.asarray(res1.energy), atol=1e-5)
    np.testing.assert_allclose(np.asarray(res2.energy),
                               np.full(B, exact), rtol=1e-5)
