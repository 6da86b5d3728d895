"""Scale-invariant binary MERA ground-state optimizer.

Capability parity with the reference ``simple_mera`` example (reference
``examples/simple_mera/simple_mera.py:36-245``): a single jit-compiled
energy network; the descending superoperator is obtained as the *adjoint
of the ascending network via ``jax.vjp``* (the reference derives its
environments with ``jax.grad`` of the same energy network,
``simple_mera.py:120-165``); tensor updates are SVD-polar steps
(``update_iso``/``update_dis``, ``simple_mera.py:183-245``).

Conventions: one coarse site <- isometry ``w[out, a, b]`` over two fine
sites, with disentanglers ``u[a', b', a, b]`` acting between blocks.
Three-site operators stay three-site under ascending (binary-MERA causal
cone); the two fine placements are averaged.
"""
from __future__ import annotations

import functools
from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit)
def ascend(h: jax.Array, u: jax.Array, w: jax.Array) -> jax.Array:
    """Ascending superoperator for 3-site operators.

    ``h``: (d,d,d, d,d,d) with (out, in) triples; ``u``: (d,d,d,d)
    (out,out,in,in); ``w``: (d, d, d) (coarse_out, fine_a, fine_b).
    """
    uc, wc = jnp.conj(u), jnp.conj(w)
    # two fine placements of h under blocks (0,1)(2,3)(4,5) with
    # disentanglers on (1,2) and (3,4): sites (1,2,3) and (2,3,4)
    hL = _ascend_L(h, u, w, uc, wc)
    hR = _ascend_R(h, u, w, uc, wc)
    return 0.5 * (hL + hR)


def _ascend_L(h, u, w, uc, wc):
    # legs: coarse out (A,B,C), coarse in (D,E,F)
    # fine top legs: w0(A, p0, x1) w1(B, x2, x3) w2(C, x4, p5)
    # u0(x1,x2, y1,y2) u1(x3,x4, y3, t4)
    # h(y1,y2,y3, z1,z2,z3)
    # u0*(x1',x2', z1,z2) u1*(x3',x4', z3, t4)
    # w0*(D, p0, x1') w1*(E, x2', x3') w2*(F, x4', p5)
    return jnp.einsum(
        "Aax,Bmn,Cop,"      # w0[A,a,x] w1[B,m,n] w2[C,o,p]
        "xmyz,nosc,"        # u0[x,m,y,z] u1[n,o,s,c]
        "yzsijk,"           # h[y,z,s, i,j,k]
        "XMij,NOkc,"        # u0*[X,M,i,j] u1*[N,O,k,c]
        "DaX,EMN,FOp->ABCDEF",
        w, w, w, u, u, h, jnp.conj(u), jnp.conj(u),
        wc, wc, wc, optimize="auto")


def _ascend_R(h, u, w, uc, wc):
    # h acts on fine sites (2,3,4): u0 passes site 1 through,
    # u1 covers (3,4) fully
    return jnp.einsum(
        "Aax,Bmn,Cop,"      # w0 w1 w2
        "xmty,nosc,"        # u0[x,m,t,y] (t passes through) u1[n,o,s,c]
        "yscjkl,"           # h[y,s,c, j,k,l]
        "XMtj,NOkl,"        # u0*[X,M,t,j] u1*[N,O,k,l]
        "DaX,EMN,FOp->ABCDEF",
        w, w, w, u, u, h, jnp.conj(u), jnp.conj(u),
        wc, wc, wc, optimize="auto")


@jax.jit
def descend(rho: jax.Array, u: jax.Array, w: jax.Array) -> jax.Array:
    """Descending superoperator = adjoint of :func:`ascend` in the trace
    inner product, obtained with ``jax.vjp`` (TPU-native: one transpose of
    the compiled ascending network)."""
    d = rho.shape[0]
    primal = jnp.zeros((d,) * 6, rho.dtype)
    _, vjp_fn = jax.vjp(lambda h: ascend(h, u, w), primal)
    (out,) = vjp_fn(rho)
    return jnp.conj(out) if jnp.iscomplexobj(out) else out


@jax.jit
def energy(h: jax.Array, rho: jax.Array) -> jax.Array:
    """<h> = Tr[rho h] / Tr[rho] for 3-site ops/densities."""
    num = jnp.einsum("abcdef,defabc->", rho, h)
    den = jnp.einsum("abcabc->", rho)
    return jnp.real(num / den)


def _polar(m: jax.Array) -> jax.Array:
    u_svd, _, vh = jnp.linalg.svd(m, full_matrices=False)
    return u_svd @ vh


@functools.partial(jax.jit)
def update_disentangler(h, rho, u, w):
    """SVD-polar update of u (reference ``update_dis``,
    ``simple_mera.py:220-245``)."""
    env = jax.grad(
        lambda uu: energy(ascend(h, uu, w), rho))(u)
    d = u.shape[0]
    m = env.reshape(d * d, d * d)
    return (-_polar(m)).reshape(u.shape)


@functools.partial(jax.jit)
def update_isometry(h, rho, u, w):
    """SVD-polar update of w (reference ``update_iso``,
    ``simple_mera.py:183-218``)."""
    env = jax.grad(
        lambda ww: energy(ascend(h, u, ww), rho))(w)
    dc, da, db = w.shape
    m = env.reshape(dc, da * db)
    return (-_polar(m.T).T).reshape(w.shape)


class MERAState(NamedTuple):
    us: List[jax.Array]
    ws: List[jax.Array]


def initialize_mera(chi: int, num_layers: int, dtype=jnp.float64
                    ) -> MERAState:
    """Identity disentanglers, truncated-identity isometries."""
    eye2 = jnp.eye(chi * chi, dtype=dtype)
    u = eye2.reshape(chi, chi, chi, chi)
    w_mat = eye2[:, :chi]  # (chi^2, chi) isometric columns
    w = w_mat.T.reshape(chi, chi, chi)
    return MERAState([u] * num_layers, [w] * num_layers)


def top_density(h_top: jax.Array, u, w, num_iters: int = 20) -> jax.Array:
    """Scale-invariant fixed point of the descending superoperator by
    power iteration."""
    d = h_top.shape[0]
    rho = jnp.eye(d ** 3, dtype=h_top.dtype).reshape((d,) * 6)
    for _ in range(num_iters):
        rho = descend(rho, u, w)
        rho = rho / jnp.einsum("abcabc->", rho)
    return rho


def optimize_mera(
    h_base: jax.Array,
    state: MERAState,
    num_iterations: int = 100,
    num_top_iters: int = 10,
) -> Tuple[MERAState, float]:
    """Alternating polar updates layer by layer (reference optimization
    loop in ``simple_mera.py`` main)."""
    # shift spectrum so the polar update minimizes
    d = h_base.shape[0]
    h_mat = h_base.reshape(d ** 3, d ** 3)
    shift = float(jnp.linalg.eigvalsh(h_mat)[-1])
    h_shifted = (h_mat - shift * jnp.eye(d ** 3, dtype=h_base.dtype)
                 ).reshape(h_base.shape)
    us, ws = list(state.us), list(state.ws)
    L = len(us)
    e = np.inf
    for _ in range(num_iterations):
        # ascend hams
        hams = [h_shifted]
        for k in range(L):
            hams.append(ascend(hams[-1], us[k], ws[k]))
        # descend densities from the scale-invariant top
        rho = top_density(hams[-1], us[-1], ws[-1], num_top_iters)
        rhos = [rho]
        for k in reversed(range(L)):
            rhos.insert(0, descend(rhos[0], us[k], ws[k]))
        # local polar updates
        for k in range(L):
            us[k] = update_disentangler(hams[k], rhos[k + 1], us[k], ws[k])
            ws[k] = update_isometry(hams[k], rhos[k + 1], us[k], ws[k])
        e = float(energy(hams[0], rhos[0])) + shift
    return MERAState(us, ws), e


def blocked_ising_hamiltonian(dtype=jnp.float64) -> jax.Array:
    """Critical TFI (H = -sum XX - sum Z) with two spins blocked per site
    (chi=4); returns the 3-site (block) hamiltonian density whose
    expectation per *spin* is half the per-block value.  Critical per-spin
    ground energy is -4/pi (reference anchor,
    ``matrixproductstates/mpo.py:226``)."""
    X = np.array([[0.0, 1.0], [1.0, 0.0]])
    Z = np.diag([1.0, -1.0])
    I = np.eye(2)

    def kron(*ops):
        out = np.array([[1.0]])
        for o in ops:
            out = np.kron(out, o)
        return out

    # two-block (4-spin) density: internal terms at half weight
    h_internal = (-kron(X, X, I, I) - kron(I, I, X, X)
                  - kron(Z, I, I, I) - kron(I, Z, I, I)
                  - kron(I, I, Z, I) - kron(I, I, I, Z))
    h_coupling = -kron(I, X, X, I)
    h2 = 0.5 * h_internal + h_coupling  # (16, 16) on two blocks
    # three-block density: h2 on (A,B) and (B,C), half weight each
    h2t = h2.reshape(4, 4, 4, 4)
    h3 = (0.5 * np.einsum("ABab,Cc->ABCabc", h2t, np.eye(4))
          + 0.5 * np.einsum("Aa,BCbc->ABCabc", np.eye(4), h2t))
    return jnp.asarray(h3, dtype)
