"""Profiling, FLOP accounting, and MXU-utilization reporting.

The reference has no instrumentation at all (SURVEY §5); this module adds
the observability layer the build plan calls for: per-phase wall timers,
the contraction-plan FLOP model (the same model the path solvers use for
cost ranking) compared against measured wall time, and hooks into the JAX
profiler for on-device traces.
"""
from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np

# peak dense matmul throughput per chip (f32-accumulated bf16), used for
# utilization accounting; override per generation
PEAK_FLOPS = {
    "tpu-v4": 275e12,
    "tpu-v5e": 197e12,
    "tpu-v5p": 459e12,
    "cpu": 1e11,
}


def detect_chip() -> str:
    d = jax.devices()[0]
    kind = getattr(d, "device_kind", "").lower()
    if "v5 lite" in kind or "v5e" in kind:
        return "tpu-v5e"
    if "v5" in kind:
        return "tpu-v5p"
    if "v4" in kind:
        return "tpu-v4"
    if d.platform == "cpu":
        return "cpu"
    return "tpu-v5e"


@dataclass
class Timer:
    """Accumulating per-phase wall timers."""
    phases: Dict[str, float] = field(default_factory=dict)
    counts: Dict[str, int] = field(default_factory=dict)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.phases[name] = self.phases.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        lines = []
        for name, total in sorted(self.phases.items(),
                                  key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(f"{name:30s} {total:10.4f}s  x{n}  "
                         f"({total / n * 1e3:8.3f} ms/call)")
        return "\n".join(lines)


def ncon_flops(network_structure, shapes,
               con_order=None) -> int:
    """Analytic FLOP count of an ncon contraction (reuses the compiled
    plan's cost model; the reference's path solvers expose the same
    quantity as log10 cost, ``custom_path_solvers/pathsolvers.py:91-145``).
    """
    from tensornetwork_tpu.ops.ncon import (
        canonicalize_structure, compile_plan)
    structure, mapping = canonicalize_structure(network_structure)
    if con_order is not None:
        con_order = tuple(mapping.get(l, l) if isinstance(l, str) else int(l)
                          for l in con_order)
    plan = compile_plan(structure, con_order, None)
    return plan.flops([tuple(s) for s in shapes])


def benchmark(
    fn: Callable,
    *args,
    iters: int = 10,
    warmup: int = 1,
    flops: Optional[int] = None,
    chip: Optional[str] = None,
) -> Dict[str, float]:
    """Compile + steady-state timing; reports achieved FLOP/s and MXU
    utilization when an analytic FLOP count is provided."""
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    for _ in range(warmup - 1):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    per_call = (time.perf_counter() - t0) / iters
    result = {"compile_s": compile_s, "per_call_s": per_call}
    if flops is not None:
        achieved = flops / per_call
        result["flops_per_s"] = achieved
        chip = chip or detect_chip()
        result["mxu_utilization"] = achieved / PEAK_FLOPS[chip]
        result["chip"] = chip
    return result


@contextlib.contextmanager
def device_trace(logdir: str):
    """JAX profiler trace for tensorboard (on-device timeline)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def dmrg_sweep_flops(N: int, chi: int, d: int, M: int,
                     num_krylov_vecs: int) -> int:
    """Analytic FLOPs of one one-site DMRG sweep on uniform stacks:
    per site, the Lanczos runs m matvecs (each ~ two chi²·d·M·chi
    contractions), plus one QR (~2·chi³·d) and one env update; a full
    sweep visits every site twice."""
    matvec = 2 * (2 * chi ** 3 * d * M + chi ** 2 * d ** 2 * M ** 2)
    per_site = (num_krylov_vecs * matvec
                + 2 * 2 * (chi * d) * chi ** 2     # QR
                + matvec)                          # env update
    return 2 * N * per_site
