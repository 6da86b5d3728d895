"""Canonical test-gate runner: the suite split across fresh processes.

A single-process run of all ~650+ tests intermittently SEGFAULTS near the
end inside XLA's CPU ``backend_compile_and_load`` (load-dependent compiler
flake after hundreds of in-process compiles; host RAM is fine — documented
in CLAUDE.md and reproduced by the round-3 judge).  Every subset passes in
a fresh process, so the reliable gate is a sharded run: test *files* are
partitioned into ``--shards`` groups (greedy size-balanced, deterministic)
and each group runs in its own ``pytest`` process, sequentially (the
container has 2 host cores and the TPU relay needs CPU — do not
parallelize).

Usage::

    python tests/run_suite.py               # default gate (3 shards)
    python tests/run_suite.py --shards 2
    python tests/run_suite.py -- -m slow    # extra pytest args after --

Exit code is non-zero if any shard fails.
"""
from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def collect_test_files():
    return sorted(
        f for f in os.listdir(HERE)
        if f.startswith("test_") and f.endswith(".py"))


def partition(files, n_shards):
    """Greedy size-balanced partition (largest file first) — deterministic
    for a given tree, keeps per-process compile load roughly even."""
    sized = sorted(files, key=lambda f: (-os.path.getsize(
        os.path.join(HERE, f)), f))
    shards = [[] for _ in range(n_shards)]
    loads = [0] * n_shards
    for f in sized:
        i = loads.index(min(loads))
        shards[i].append(f)
        loads[i] += os.path.getsize(os.path.join(HERE, f))
    return [sorted(s) for s in shards if s]


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--shards", type=int, default=3)
    ap.add_argument("--timeout", type=int, default=1800,
                    help="per-shard timeout in seconds")
    ap.add_argument("rest", nargs="*",
                    help="extra pytest args (put after --)")
    args = ap.parse_args(argv)

    shards = partition(collect_test_files(), args.shards)
    failures = []
    t0 = time.time()
    for i, shard in enumerate(shards):
        cmd = [sys.executable, "-m", "pytest", "-q",
               *[os.path.join("tests", f) for f in shard], *args.rest]
        print(f"[run_suite] shard {i + 1}/{len(shards)}: "
              f"{len(shard)} files", flush=True)
        t = time.time()
        try:
            rc = subprocess.call(cmd, cwd=REPO, timeout=args.timeout)
        except subprocess.TimeoutExpired:
            print(f"[run_suite] shard {i + 1} TIMED OUT "
                  f"after {args.timeout}s", flush=True)
            rc = -1
        print(f"[run_suite] shard {i + 1} rc={rc} "
              f"({time.time() - t:.0f}s)", flush=True)
        if rc != 0:
            failures.append((i + 1, rc, shard))
    dt = time.time() - t0
    if failures:
        for n, rc, shard in failures:
            print(f"[run_suite] FAILED shard {n} (rc={rc}): "
                  f"{' '.join(shard)}")
        print(f"[run_suite] {len(failures)}/{len(shards)} shards failed "
              f"in {dt:.0f}s")
        return 1
    print(f"[run_suite] all {len(shards)} shards green in {dt:.0f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
