"""Tensor-network neural-network layers (Flax).

Capability parity with the reference ``tn_keras`` zoo (reference
``tn_keras/dense.py:14``, ``mpo.py:16``, ``condenser.py:16``,
``expander.py:16``, ``entangler.py:16``, ``conv2d_mpo.py:15``), built on
Flax linen instead of TF-Keras: each layer factorizes a dense weight into
a small tensor network, and the forward pass contracts it with the input
via einsums that XLA fuses onto the MXU.
"""
from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _int_root(value: int, k: int, what: str) -> int:
    root = round(value ** (1.0 / k))
    for cand in (root - 1, root, root + 1):
        if cand > 0 and cand ** k == value:
            return cand
    raise ValueError(
        f"{what} = {value} must be a perfect {k}-th power for this layer")


class DenseDecomp(nn.Module):
    """Rank-decomposed dense layer: W ≈ A·B through a ``decomp_size``
    bottleneck (reference ``tn_keras/dense.py:14``)."""
    output_dim: int
    decomp_size: int
    use_bias: bool = True
    activation: Optional[Callable] = None

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        a = self.param("a_var", nn.initializers.lecun_normal(),
                       (in_dim, self.decomp_size))
        b = self.param("b_var", nn.initializers.lecun_normal(),
                       (self.decomp_size, self.output_dim))
        y = jnp.einsum("...i,ir,ro->...o", x, a, b)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.output_dim,))
            y = y + bias
        if self.activation is not None:
            y = self.activation(y)
        return y


class DenseMPO(nn.Module):
    """MPO-factorized dense layer (reference ``tn_keras/mpo.py:16``):
    the input is reshaped to ``num_nodes`` legs and contracted through an
    MPO chain of ``num_nodes`` cores with bond dimension ``bond_dim``."""
    output_dim: int
    num_nodes: int
    bond_dim: int
    use_bias: bool = True
    activation: Optional[Callable] = None

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        n = self.num_nodes
        if n < 2:
            raise ValueError("DenseMPO requires num_nodes >= 2")
        in_leg = _int_root(in_dim, n, "input dimension")
        out_leg = _int_root(self.output_dim, n, "output_dim")
        D = self.bond_dim
        init = nn.initializers.lecun_normal()
        first = self.param("node_0", init, (in_leg, out_leg * D)).reshape(
            in_leg, out_leg, D)
        cores = [first]
        for k in range(1, n - 1):
            c = self.param(f"node_{k}", init,
                           (D * in_leg, out_leg * D)).reshape(
                               D, in_leg, out_leg, D)
            cores.append(c)
        last = self.param(f"node_{n - 1}", init,
                          (D * in_leg, out_leg)).reshape(D, in_leg, out_leg)
        cores.append(last)
        batch_shape = x.shape[:-1]
        # contract the chain leg by leg; output legs accumulate at the end
        flat = x.reshape((-1,) + (in_leg,) * n)
        acc = jnp.einsum("bi...,iod->b...od", flat, cores[0])
        for k in range(1, n - 1):
            acc = jnp.einsum("bi...pd,diqe->b...pqe", acc, cores[k])
        acc = jnp.einsum("bi...pd,diq->b...pq", acc, cores[-1])
        y = acc.reshape(batch_shape + (self.output_dim,))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.output_dim,))
            y = y + bias
        if self.activation is not None:
            y = self.activation(y)
        return y


class DenseCondenser(nn.Module):
    """Contracts an exponentially wide input down:
    output_dim = input_dim / exp_base**num_nodes (reference
    ``tn_keras/condenser.py:16``)."""
    exp_base: int
    num_nodes: int
    use_bias: bool = True
    activation: Optional[Callable] = None

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        out_dim = in_dim
        for _ in range(self.num_nodes):
            if out_dim % self.exp_base != 0:
                raise ValueError(
                    f"input dimension {in_dim} is not divisible by "
                    f"exp_base**num_nodes")
            out_dim //= self.exp_base
        init = nn.initializers.lecun_normal()
        batch_shape = x.shape[:-1]
        y = x.reshape((-1, in_dim))
        for k in range(self.num_nodes):
            cur = y.shape[-1]
            rest = cur // self.exp_base
            w = self.param(f"node_{k}", init, (self.exp_base * rest, rest))
            # contract one exp_base-sized leg (plus the backbone) per node
            y = y.reshape(-1, rest, self.exp_base)
            w3 = w.reshape(self.exp_base, rest, rest)
            y = jnp.einsum("bre,erp->bp", y, w3)
        y = y.reshape(batch_shape + (out_dim,))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (out_dim,))
            y = y + bias
        if self.activation is not None:
            y = self.activation(y)
        return y


class DenseExpander(nn.Module):
    """Expands the input exponentially:
    output_dim = input_dim * exp_base**num_nodes (reference
    ``tn_keras/expander.py:16``)."""
    exp_base: int
    num_nodes: int
    use_bias: bool = True
    activation: Optional[Callable] = None

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        out_dim = in_dim * self.exp_base ** self.num_nodes
        init = nn.initializers.lecun_normal()
        batch_shape = x.shape[:-1]
        y = x.reshape((-1, in_dim))
        for k in range(self.num_nodes):
            cur = y.shape[-1]
            w = self.param(f"node_{k}", init, (cur, cur * self.exp_base))
            w3 = w.reshape(cur, cur, self.exp_base)
            y = jnp.einsum("bc,cpe->bpe", y, w3).reshape(
                -1, cur * self.exp_base)
        y = y.reshape(batch_shape + (out_dim,))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (out_dim,))
            y = y + bias
        if self.activation is not None:
            y = self.activation(y)
        return y


class DenseEntangler(nn.Module):
    """Staircase of two-leg cores over ``num_legs`` input legs
    (reference ``tn_keras/entangler.py:16``).  input and output dims must
    both be perfect ``num_legs``-th powers."""
    output_dim: int
    num_legs: int
    num_levels: int
    use_bias: bool = True
    activation: Optional[Callable] = None

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        n = self.num_legs
        leg_in = _int_root(in_dim, n, "input dimension")
        leg_out = _int_root(self.output_dim, n, "output_dim")
        init = nn.initializers.lecun_normal()
        batch_shape = x.shape[:-1]
        y = x.reshape((-1,) + (leg_in,) * n)
        leg = leg_in
        for level in range(self.num_levels):
            # at the last level, the staircase maps leg_in -> leg_out
            new_leg = leg_out if level == self.num_levels - 1 else leg
            for k in range(n - 1):
                # two-site core acting on legs (k, k+1)
                w = self.param(f"level_{level}_core_{k}", init,
                               (y.shape[1 + k] * y.shape[2 + k],
                                new_leg * new_leg))
                w4 = w.reshape(y.shape[1 + k], y.shape[2 + k],
                               new_leg, new_leg)
                y = _apply_two_leg(y, w4, k)
            leg = new_leg
        y = y.reshape(batch_shape + (self.output_dim,))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.output_dim,))
            y = y + bias
        if self.activation is not None:
            y = self.activation(y)
        return y


def _apply_two_leg(y, w4, k):
    """Contract core ``w4[i,j,p,q]`` with legs (k, k+1) of ``y`` (leg axes
    start at 1; axis 0 is batch)."""
    perm_in = (1 + k, 2 + k)
    y = jnp.moveaxis(y, perm_in, (y.ndim - 2, y.ndim - 1))
    y = jnp.einsum("...ij,ijpq->...pq", y, w4)
    y = jnp.moveaxis(y, (y.ndim - 2, y.ndim - 1), perm_in)
    return y


class Conv2DMPO(nn.Module):
    """2D convolution whose kernel is MPO-factorized (reference
    ``tn_keras/conv2d_mpo.py:15``).  The kernel
    (kh, kw, in_ch, out_ch) is built from ``num_nodes`` cores and fed to
    ``lax.conv_general_dilated`` — XLA maps it straight onto the MXU."""
    filters: int
    kernel_size: Tuple[int, int]
    num_nodes: int
    bond_dim: int
    strides: Tuple[int, int] = (1, 1)
    padding: str = "SAME"
    use_bias: bool = True
    activation: Optional[Callable] = None

    @nn.compact
    def __call__(self, x):
        # x: (batch, h, w, in_channels)
        in_ch = x.shape[-1]
        n = self.num_nodes
        in_leg = _int_root(in_ch, n, "in_channels")
        out_leg = _int_root(self.filters, n, "filters")
        kh, kw = self.kernel_size
        D = self.bond_dim
        init = nn.initializers.lecun_normal()
        first = self.param("node_0", init,
                           (kh * kw * in_leg, out_leg * D)).reshape(
                               kh, kw, in_leg, out_leg, D)
        cores = [first]
        for k in range(1, n - 1):
            cores.append(self.param(f"node_{k}", init,
                                    (D * in_leg, out_leg * D)).reshape(
                                        D, in_leg, out_leg, D))
        cores.append(self.param(f"node_{n - 1}", init,
                                (D * in_leg, out_leg)).reshape(
                                    D, in_leg, out_leg))
        # materialize the kernel: (kh, kw, in_leg^n, out_leg^n)
        acc = cores[0]  # (kh, kw, i0, o0, D)
        for k in range(1, n - 1):
            acc = jnp.einsum("hw...d,diqe->hw...iqe", acc, cores[k])
        acc = jnp.einsum("hw...d,diq->hw...iq", acc, cores[-1])
        # acc axes: kh, kw, i0, o0, i1, o1, ..., separate and merge
        perm = ([0, 1] + [2 + 2 * k for k in range(n)]
                + [3 + 2 * k for k in range(n)])
        kernel = jnp.transpose(acc, perm).reshape(kh, kw, in_ch,
                                                  self.filters)
        kernel = kernel.astype(x.dtype)
        y = jax.lax.conv_general_dilated(
            x, kernel, window_strides=self.strides, padding=self.padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.filters,))
            y = y + bias
        if self.activation is not None:
            y = self.activation(y)
        return y
