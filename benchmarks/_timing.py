"""Honest device timing for the tunneled TPU backend (VERDICT r2 item 10).

`jax.block_until_ready` on this backend can SILENTLY return early —
even after the transfer-path warm-up, and even mid-process after having
worked (observed 2026-08-20: a 20 ms kernel "measured" at 0.04 ms).
The only trustworthy synchronization is `jax.device_get` of a scalar
whose value depends on the full computation.

Every benchmark in this directory must time through these helpers:

    from benchmarks._timing import warmup, timed_scalar, bracket

* ``warmup()`` — run once at process start, before ANY timing: the first
  device_get in a process can cost 130-450 s (tunnel transfer init).
* ``timed_scalar(fn, *args)`` — fn must return a SCALAR computed inside
  the jit from its full result (e.g. ``jnp.sum(jnp.abs(x))``); the
  device_get of that scalar is the sync.
* ``bracket(fetch)`` — context manager for loop-structured code: time
  arbitrary dispatches inside the block; at exit it device_gets
  ``fetch()`` (a scalar depending on the whole chain) and reports the
  wall time of the block including that sync.  For CHAINED loops (each
  iteration consumes the previous result) sync ONCE at the end — the
  single device executes dispatches in order, and a per-iteration
  scalar fetch costs ~10-30 ms RTT each.
"""
from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp

_WARM = False


def warmup():
    """Force the tunnel transfer path open before any measurement."""
    global _WARM
    jax.device_get(jnp.ones(4))
    _WARM = True


def timed_scalar(fn, *args, iters: int = 3, warm: int = 1):
    """Mean seconds per call of ``fn(*args)``, device_get-synced.

    ``fn`` MUST return a scalar (or small array) computed from its full
    result inside jit; returning an intermediate lets XLA dead-code the
    work and lets the tunnel lie about completion.
    """
    if not _WARM:
        warmup()
    for _ in range(warm):
        jax.device_get(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        jax.device_get(fn(*args))
    return (time.perf_counter() - t0) / iters


class _Bracket:
    def __init__(self):
        self.seconds = None


@contextlib.contextmanager
def bracket(fetch):
    """Time a block of dispatches, syncing on ``fetch()`` at exit.

    ``fetch`` is a zero-arg callable returning a device scalar that
    depends on everything dispatched inside the block (e.g. the final
    sweep's energy).  Result in ``.seconds`` after the block::

        with bracket(lambda: res.energy) as b:
            for _ in range(n):
                res = sweep(...)
        rate = n / b.seconds
    """
    if not _WARM:
        warmup()
    b = _Bracket()
    t0 = time.perf_counter()
    yield b
    jax.device_get(fetch())
    b.seconds = time.perf_counter() - t0
