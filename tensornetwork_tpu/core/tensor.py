"""Functional ``Tensor`` wrapper and ncon-builder sugar.

Capability parity with the reference ``Tensor`` (reference
``tensor.py:25-202``) and its ``NconBuilder`` call syntax
(``A(1, -1) @ B(1, -2)`` builds an ncon network; reference
``tensor.py:193``, finalized by ``ncon_interface.finalize:665``).
JAX-native: the wrapper is a thin pytree-compatible shell over a
``jax.Array``; there is no backend tag because XLA is the backend.
"""
from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np


class NconBuilder:
    """Accumulates (tensor, labels) pairs (reference ``tensor.py:193``)."""

    def __init__(self, tensors: List[Any], axes: List[List[Any]]):
        self.tensors = list(tensors)
        self.axes = [list(a) for a in axes]

    def __matmul__(self, other: "NconBuilder") -> "NconBuilder":
        if not isinstance(other, NconBuilder):
            raise TypeError("can only combine NconBuilder with NconBuilder")
        return NconBuilder(self.tensors + other.tensors,
                           self.axes + other.axes)


class Tensor:
    """Backend-free tensor wrapper (reference ``tensor.py:25``)."""

    def __init__(self, array: Any):
        if isinstance(array, Tensor):
            array = array.array
        self.array = jnp.asarray(array)

    # -- properties --------------------------------------------------------
    @property
    def shape(self) -> Tuple[int, ...]:
        return tuple(self.array.shape)

    @property
    def dtype(self):
        return self.array.dtype

    @property
    def ndim(self) -> int:
        return self.array.ndim

    @property
    def size(self) -> int:
        return int(np.prod(self.shape, dtype=np.int64))

    @property
    def T(self) -> "Tensor":
        return Tensor(jnp.transpose(self.array))

    @property
    def H(self) -> "Tensor":
        """Conjugate transpose (hermitian adjoint for matrices; for higher
        rank, conjugate + reversed axes)."""
        return Tensor(jnp.conj(jnp.transpose(self.array)))

    def conj(self) -> "Tensor":
        return Tensor(jnp.conj(self.array))

    hconj = H

    def copy(self) -> "Tensor":
        return Tensor(self.array)

    def reshape(self, shape: Sequence[int]) -> "Tensor":
        return Tensor(jnp.reshape(self.array, tuple(shape)))

    def transpose(self, perm: Optional[Sequence[int]] = None) -> "Tensor":
        return Tensor(jnp.transpose(self.array, perm))

    def flatten(self) -> "Tensor":
        return Tensor(self.array.reshape(-1))

    def ravel(self) -> "Tensor":
        return self.flatten()

    def squeeze(self) -> "Tensor":
        return Tensor(jnp.squeeze(self.array))

    # -- arithmetic --------------------------------------------------------
    @staticmethod
    def _unwrap(x):
        return x.array if isinstance(x, Tensor) else x

    def __add__(self, o):
        return Tensor(self.array + self._unwrap(o))

    __radd__ = __add__

    def __sub__(self, o):
        return Tensor(self.array - self._unwrap(o))

    def __rsub__(self, o):
        return Tensor(self._unwrap(o) - self.array)

    def __mul__(self, o):
        return Tensor(self.array * self._unwrap(o))

    __rmul__ = __mul__

    def __truediv__(self, o):
        return Tensor(self.array / self._unwrap(o))

    def __rtruediv__(self, o):
        return Tensor(self._unwrap(o) / self.array)

    def __neg__(self):
        return Tensor(-self.array)

    def __pow__(self, o):
        return Tensor(self.array ** self._unwrap(o))

    def __matmul__(self, other):
        if isinstance(other, NconBuilder):
            raise ValueError(
                "cannot mix a plain Tensor with an NconBuilder; call the "
                "tensor with axis labels first")
        return Tensor(self.array @ self._unwrap(other))

    def __getitem__(self, key):
        return Tensor(self.array[key])

    def __call__(self, *labels) -> NconBuilder:
        """ncon-builder sugar: ``A(1, -1) @ B(1, -2)``."""
        if len(labels) != self.ndim:
            raise ValueError(
                f"{len(labels)} labels for a rank-{self.ndim} tensor")
        return NconBuilder([self.array], [list(labels)])

    def __repr__(self):
        return f"Tensor(shape={self.shape}, dtype={self.dtype})"


jax.tree_util.register_pytree_node(
    Tensor,
    lambda t: ((t.array,), None),
    lambda _, c: Tensor(c[0]),
)
