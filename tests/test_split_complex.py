"""Split-complex engine tests: complex arithmetic on real-only backends.

Oracles are numpy complex arithmetic and scipy dense evolution (no
reference counterpart exists — the reference simply uses complex dtypes,
which the target TPU runtime lacks)."""
import jax
import jax.numpy as jnp
import numpy as np
import scipy.linalg as sla

from tensornetwork_tpu.models.mpo import FiniteTFI, mpo_to_dense
from tensornetwork_tpu.models.tdvp import (
    TDVP, mps_mpo_expectation_sc, tdvp_one_site_sweep,
    tdvp_one_site_sweep_sc)
from tensornetwork_tpu.ops import split_complex as sc
from tensornetwork_tpu.ops.krylov import (
    expm_multiply_lanczos_sc, lanczos_factorization_sc)
from tensornetwork_tpu.ops.ncon import ncon


def _rc(rng, *shape):
    return rng.standard_normal(shape) + 1j * rng.standard_normal(shape)


def test_sc_elementwise_and_reductions(rng):
    a = _rc(rng, 4, 5)
    b = _rc(rng, 4, 5)
    A, B = sc.from_complex(a), sc.from_complex(b)
    np.testing.assert_allclose(sc.to_complex(sc.mul(A, B)), a * b,
                               atol=1e-12)
    np.testing.assert_allclose(sc.to_complex(sc.conj(A)), a.conj(),
                               atol=1e-12)
    np.testing.assert_allclose(float(sc.norm(A)), np.linalg.norm(a),
                               atol=1e-12)
    v = sc.vdot(A, B)
    np.testing.assert_allclose(complex(v.re) + 1j * complex(v.im),
                               np.vdot(a, b), atol=1e-12)


def test_sc_dot_general_karatsuba(rng):
    a = _rc(rng, 6, 7)
    b = _rc(rng, 7, 5)
    dn = (((1,), (0,)), ((), ()))
    out = sc.dot_general(sc.from_complex(a), sc.from_complex(b), dn)
    np.testing.assert_allclose(sc.to_complex(out), a @ b, atol=1e-12)
    # mixed real/SC operands take the 2-GEMM path
    br = rng.standard_normal((7, 5))
    out2 = sc.dot_general(sc.from_complex(a), jnp.asarray(br), dn)
    np.testing.assert_allclose(sc.to_complex(out2), a @ br, atol=1e-12)


def test_sc_ncon_mixed_network(rng):
    A = _rc(rng, 8, 3, 8)
    B = _rc(rng, 8, 3, 8)
    W = rng.standard_normal((3, 3))
    oracle = np.einsum("asb,st,atc->bc", A, W, B.conj())
    out = ncon([sc.from_complex(A), W, sc.conj(sc.from_complex(B))],
               [(1, 2, -1), (2, 3), (1, 3, -2)])
    np.testing.assert_allclose(sc.to_complex(out), oracle, atol=1e-10)


def test_sc_ncon_trace(rng):
    C = _rc(rng, 5, 5, 4)
    out = ncon([sc.from_complex(C)], [(1, 1, -1)])
    np.testing.assert_allclose(sc.to_complex(out),
                               np.einsum("aab->b", C), atol=1e-12)


def test_sc_polar_complete_rank_cases(rng):
    cases = {
        "full": _rc(rng, 16, 8),
        "rank1": np.outer(_rc(rng, 16), _rc(rng, 8)),
        "e00": np.zeros((16, 8), complex),
    }
    cases["e00"][0, 0] = 1.0
    uu, _ = np.linalg.qr(rng.standard_normal((16, 8)))
    vv, _ = np.linalg.qr(rng.standard_normal((8, 8)))
    cases["mixed"] = (uu * np.array([1, 1, 1, 1e-5, 1e-7, 0, 0, 0.0])) @ vv.T
    for label, m in cases.items():
        Q, P = sc.polar_complete(sc.from_complex(m))
        Qc, Pc = sc.to_complex(Q), sc.to_complex(P)
        np.testing.assert_allclose(Qc.conj().T @ Qc, np.eye(8), atol=1e-12,
                                   err_msg=label)
        np.testing.assert_allclose(Qc @ Pc, m, atol=1e-12, err_msg=label)


def test_sc_lanczos_factorization_hermitian(rng):
    n = 30
    a = _rc(rng, n, n)
    H = (a + a.conj().T) / 2
    Hs = sc.from_complex(H)
    mv = lambda x: sc.dot_general(Hs, x, (((1,), (0,)), ((), ())))
    v0 = sc.from_complex(_rc(rng, n))
    V, alphas, betas = lanczos_factorization_sc(mv, v0, 12)
    Vc = sc.to_complex(V)
    # rows orthonormal under the complex inner product
    np.testing.assert_allclose(Vc.conj() @ Vc.T, np.eye(12), atol=1e-10)
    # projection is the tridiagonal: V H V^dag == T
    T = np.diag(np.asarray(alphas)) + np.diag(np.asarray(betas), 1) \
        + np.diag(np.asarray(betas), -1)
    np.testing.assert_allclose(Vc.conj() @ H @ Vc.T, T, atol=1e-9)


def test_sc_expm_multiply_matches_scipy(rng):
    n = 40
    a = _rc(rng, n, n)
    H = (a + a.conj().T) / 2
    v = _rc(rng, n)
    Hs = sc.from_complex(H)
    mv = lambda x: sc.dot_general(Hs, x, (((1,), (0,)), ((), ())))
    for coeff in [-1j * 0.3, -0.25 + 0j, -0.1 - 0.5j]:
        exact = sla.expm(coeff * H) @ v
        out = expm_multiply_lanczos_sc(mv, sc.from_complex(v), coeff, 40)
        np.testing.assert_allclose(sc.to_complex(out), exact, atol=1e-9)


def test_sc_sweep_matches_complex_sweep(rng):
    # one SC sweep == one complex-dtype sweep on the same generic state
    N, chi, d = 5, 6, 2
    mpo = FiniteTFI(-1.0, -1.2, N=N)
    Wc = mpo.Ws.astype(jnp.complex128)
    vLc = mpo.vL.astype(jnp.complex128)
    vRc = mpo.vR.astype(jnp.complex128)
    A0 = _rc(rng, N, chi, d, chi)
    dt = 0.02
    out_c = tdvp_one_site_sweep(jnp.asarray(A0), Wc, vLc, vRc, dt,
                                num_krylov_vecs=15)
    out_s = tdvp_one_site_sweep_sc(
        sc.SC(jnp.asarray(A0.real), jnp.asarray(A0.imag)),
        mpo.Ws, mpo.vL, mpo.vR, dt, num_krylov_vecs=15)

    def dense(As):
        acc = np.asarray(As[0])
        for i in range(1, N):
            acc = np.einsum("a...b,bsc->a...sc", acc, np.asarray(As[i]))
        return acc.reshape(chi, -1, chi)[0, :, 0]

    vc = dense(np.asarray(out_c))
    vs = dense(sc.to_complex(out_s))
    fid = abs(np.vdot(vc / np.linalg.norm(vc), vs / np.linalg.norm(vs)))
    assert fid > 1 - 1e-10


def test_sc_tdvp_real_time_matches_exact():
    # real-time evolution from a product state vs dense expm — the
    # configuration that requires the isometric *completion* in
    # polar_complete (plain polar loses 3e-2 fidelity here)
    N, chi = 6, 8
    mpo = FiniteTFI(-1.0, -1.2, N=N)
    H = mpo_to_dense(mpo)
    v = np.array([1.0, 0.6]) / np.linalg.norm([1.0, 0.6])
    As_np = np.zeros((N, chi, 2, chi))
    As_np[:, 0, :, 0] = v
    tdvp = TDVP(jnp.asarray(As_np), mpo, split_complex=True)
    e0 = tdvp.energy()
    t, steps = 0.5, 25
    tdvp.evolve(t, steps)
    assert abs(tdvp.energy() - e0) < 1e-8
    psi0 = np.array([1.0])
    for _ in range(N):
        psi0 = np.kron(psi0, v)
    psi_t = sla.expm(-1j * t * H) @ psi0.astype(np.complex128)
    Ac = sc.to_complex(tdvp.As)
    acc = Ac[0]
    for i in range(1, N):
        acc = np.einsum("a...b,bsc->a...sc", acc, Ac[i])
    vec = acc.reshape(chi, -1, chi)[0, :, 0]
    fid = abs(np.vdot(vec / np.linalg.norm(vec),
                      psi_t / np.linalg.norm(psi_t)))
    assert fid > 1 - 1e-8


def test_sc_svd_and_eigh(rng):
    m = _rc(rng, 16, 8)
    U, s, Vh = sc.svd(sc.from_complex(m))
    Uc, Vhc = sc.to_complex(U), sc.to_complex(Vh)
    s = np.asarray(s)
    np.testing.assert_allclose((Uc * s[None, :]) @ Vhc, m, atol=1e-12)
    np.testing.assert_allclose(Uc.conj().T @ Uc, np.eye(8), atol=1e-12)
    np.testing.assert_allclose(s, np.linalg.svd(m, compute_uv=False),
                               atol=1e-12)
    # wide input
    mw = _rc(rng, 6, 10)
    U, s, Vh = sc.svd(sc.from_complex(mw))
    np.testing.assert_allclose(
        (sc.to_complex(U) * np.asarray(s)[None, :]) @ sc.to_complex(Vh),
        mw, atol=1e-12)
    # hermitian eigh
    a = _rc(rng, 12, 12)
    H = (a + a.conj().T) / 2
    w, V = sc.eigh(sc.from_complex(H))
    Vc = sc.to_complex(V)
    np.testing.assert_allclose(H @ Vc, Vc * np.asarray(w)[None, :],
                               atol=1e-10)


def test_sc_two_site_sweep_matches_complex(rng):
    from tensornetwork_tpu.models.tdvp import (
        tdvp_two_site_sweep, tdvp_two_site_sweep_sc)
    N, chi, d = 5, 6, 2
    mpo = FiniteTFI(-1.0, -1.2, N=N)
    Wc = mpo.Ws.astype(jnp.complex128)
    A0 = _rc(rng, N, chi, d, chi)
    dt = 0.02
    out_c, terr_c = tdvp_two_site_sweep(
        jnp.asarray(A0), Wc, mpo.vL.astype(jnp.complex128),
        mpo.vR.astype(jnp.complex128), dt, num_krylov_vecs=15)
    out_s, terr_s = tdvp_two_site_sweep_sc(
        sc.SC(jnp.asarray(A0.real), jnp.asarray(A0.imag)),
        mpo.Ws, mpo.vL, mpo.vR, dt, num_krylov_vecs=15)

    def dense(As):
        acc = np.asarray(As[0])
        for i in range(1, N):
            acc = np.einsum("a...b,bsc->a...sc", acc, np.asarray(As[i]))
        return acc.reshape(chi, -1, chi)[0, :, 0]

    vc = dense(np.asarray(out_c))
    vs = dense(sc.to_complex(out_s))
    fid = abs(np.vdot(vc / np.linalg.norm(vc), vs / np.linalg.norm(vs)))
    assert fid > 1 - 1e-9
    np.testing.assert_allclose(float(terr_s), float(terr_c), atol=1e-10)


def test_sc_two_site_tdvp_real_time_matches_exact():
    N, chi = 6, 8
    mpo = FiniteTFI(-1.0, -1.2, N=N)
    H = mpo_to_dense(mpo)
    v = np.array([1.0, 0.6]) / np.linalg.norm([1.0, 0.6])
    As_np = np.zeros((N, chi, 2, chi))
    As_np[:, 0, :, 0] = v
    tdvp = TDVP(jnp.asarray(As_np), mpo, split_complex=True)
    t, steps = 0.5, 25
    tdvp.evolve(t, steps, two_site=True)
    psi0 = np.array([1.0])
    for _ in range(N):
        psi0 = np.kron(psi0, v)
    psi_t = sla.expm(-1j * t * H) @ psi0.astype(np.complex128)
    Ac = sc.to_complex(tdvp.As)
    acc = Ac[0]
    for i in range(1, N):
        acc = np.einsum("a...b,bsc->a...sc", acc, Ac[i])
    vec = acc.reshape(chi, -1, chi)[0, :, 0]
    fid = abs(np.vdot(vec / np.linalg.norm(vec),
                      psi_t / np.linalg.norm(psi_t)))
    assert fid > 1 - 1e-8
