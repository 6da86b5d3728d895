"""Discrete Fourier transform as a tensor network.

Capability parity with the reference FFT example (reference
``examples/fft/fft.py:8-60``: Cooley-Tukey butterfly as a CopyNode
network).  This construction uses the equivalent QFT-circuit
factorization: the size-2^n DFT is a chain of Hadamard and
controlled-phase two-bit gates plus a bit reversal — O(n^2) two-bit
tensors instead of one 2^n x 2^n matrix.
"""
import sys

import numpy as np

sys.path.insert(0, ".")  # repo root when run as a script

import tensornetwork_tpu as tn


def add_fft(input_edges, inverse: bool = False):
    """Append a DFT network to ``input_edges`` (list of dim-2 dangling
    edges, most-significant bit first).  Returns (nodes, output_edges)
    with output bits most-significant first, satisfying
    out[k] = sum_x exp(-2 pi i k x / N) in[x] (numpy convention)."""
    n = len(input_edges)
    sign = 1.0 if inverse else -1.0
    H = np.array([[1.0, 1.0], [1.0, -1.0]], dtype=complex) / np.sqrt(2)
    nodes = []
    edges = list(input_edges)
    for j in range(n):
        # Hadamard on bit j
        h = tn.Node(H, name=f"H_{j}")
        edges[j] ^ h[1]
        edges[j] = h[0]
        nodes.append(h)
        # controlled phases from bits j+1..n-1
        for k in range(j + 1, n):
            phi = sign * 2.0 * np.pi / (2 ** (k - j + 1))
            cp = np.eye(4, dtype=complex)
            cp[3, 3] = np.exp(1j * phi)
            g = tn.Node(cp.reshape(2, 2, 2, 2), name=f"CP_{j}_{k}")
            edges[j] ^ g[2]
            edges[k] ^ g[3]
            edges[j] = g[0]
            edges[k] = g[1]
            nodes.append(g)
    # QFT outputs bits in reversed order; the unitary QFT carries a
    # 1/sqrt(N) normalization relative to the numpy DFT convention
    scale = 2 ** (n / 2.0)
    out_edges = list(reversed(edges))
    return nodes, out_edges, scale


def fft_via_network(x: np.ndarray) -> np.ndarray:
    """DFT of a length-2^n vector through the network."""
    n = int(np.log2(x.shape[0]))
    assert 2 ** n == x.shape[0]
    inp = tn.Node(x.reshape((2,) * n).astype(complex), name="input")
    nodes, out_edges, scale = add_fft([inp[i] for i in range(n)])
    result = tn.contractors.auto([inp] + nodes,
                                 output_edge_order=out_edges)
    out = np.asarray(result.tensor) * scale
    return out.reshape(-1)


if __name__ == "__main__":
    rng = np.random.default_rng(0)
    x = rng.standard_normal(16) + 1j * rng.standard_normal(16)
    np.testing.assert_allclose(fft_via_network(x), np.fft.fft(x),
                               atol=1e-10)
    print("fft network matches np.fft.fft for N=16")
