"""Global configuration for tensornetwork_tpu.

The reference library threads configuration through module-level mutable
singletons (default-backend stack, per-backend caches; see reference
``backend_contextmanager.py:22-49``).  Here configuration is a single frozen
dataclass passed explicitly (or read from a context variable), which keeps
every jitted computation a pure function of (config, inputs) and therefore
cache-friendly under XLA.
"""
from __future__ import annotations

import contextlib
import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Config:
    """Framework-wide knobs.

    Attributes:
      dot_precision: precision for ``lax.dot_general`` on TPU. ``"highest"``
        keeps float32 accumulation on the MXU; ``"default"`` allows bf16
        passes.
      preferred_element_type: accumulation dtype for contractions
        (``None`` = infer from operands).
      bucket_sizes: shape-bucketing boundaries for bond dimensions.  A
        compiled plan is cached per bucket, so a χ=97 network reuses the
        χ=128 executable (padded), bounding compile counts.
      max_paths_optimal: below this operand count the ``auto`` contractor
        uses the optimal (DP) path solver; mirrors the reference policy
        (reference ``path_contractors.py:197-265``).
    """
    dot_precision: str = "highest"
    preferred_element_type: Optional[jnp.dtype] = None
    bucket_sizes: tuple = (8, 16, 32, 64, 128, 256, 512, 1024)
    max_paths_optimal: int = 5

    def dot_general_kwargs(self):
        kwargs = {"precision": jax.lax.Precision(self.dot_precision)}
        if self.preferred_element_type is not None:
            kwargs["preferred_element_type"] = self.preferred_element_type
        return kwargs


_CONFIG_STACK = [Config()]


def get_config() -> Config:
    return _CONFIG_STACK[-1]


@contextlib.contextmanager
def config_context(config: Config):
    _CONFIG_STACK.append(config)
    try:
        yield config
    finally:
        _CONFIG_STACK.pop()


def bucket_dim(dim: int, config: Optional[Config] = None) -> int:
    """Round a bond dimension up to the nearest bucket boundary."""
    config = config or get_config()
    for b in config.bucket_sizes:
        if dim <= b:
            return b
    return dim


# -- reference-compatible default-backend shims ------------------------------
# (reference ``backend_contextmanager.py:22-49``; XLA is the only execution
# layer here, so these only validate and record the name)

_DEFAULT_BACKEND = "jax"
_KNOWN_BACKENDS = ("jax", "numpy", "tensorflow", "pytorch", "symmetric")


def set_default_backend(backend: str) -> None:
    global _DEFAULT_BACKEND
    if backend not in _KNOWN_BACKENDS:
        raise ValueError(f"unknown backend {backend!r}")
    if backend != "jax":
        import warnings
        warnings.warn(
            f"backend {backend!r} is accepted for API parity only; "
            f"execution always goes through JAX/XLA")
    _DEFAULT_BACKEND = backend


def get_default_backend() -> str:
    return _DEFAULT_BACKEND


class DefaultBackend:
    """Context manager (reference ``DefaultBackend``)."""

    def __init__(self, backend: str):
        self.backend = backend
        self._prev = None

    def __enter__(self):
        global _DEFAULT_BACKEND
        self._prev = _DEFAULT_BACKEND
        set_default_backend(self.backend)
        return self

    def __exit__(self, *a):
        global _DEFAULT_BACKEND
        _DEFAULT_BACKEND = self._prev


def enable_persistent_compilation_cache(path: str = "/tmp/tn_tpu_xla_cache",
                                        min_compile_time_secs: float = 1.0
                                        ) -> None:
    """Turn on jax's on-disk compilation cache.

    Large block-sparse programs (e.g. the batched symmetric DMRG at
    chi=1024: ~45 per-site programs, ~457 s first-sweep compile) are
    recompiled per process without this; with it, repeat runs of the same
    configuration start in seconds.  Safe to call multiple times.
    """
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_time_secs)
    try:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
