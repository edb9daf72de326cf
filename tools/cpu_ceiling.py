"""Hardware parallel-scaling ceiling microbenchmark.

Measures the best achievable N -> 4N process-level scaling for pure
CPU-bound work on THIS box (no Spark, no I/O, no Python-vs-JVM effects).
Virtualized/turbo-scaled hosts deliver < 4x from 4x processes even for
embarrassingly parallel arithmetic; the ratio measured here is the
ceiling any 4x-parallelism job can reach on one box. On a real
multi-executor cluster N -> 4N adds machines (each with its own clocks),
so this penalty does not apply — which is why BENCH/BASELINE.md reports
both raw job efficiency and job efficiency normalized by this ceiling.

Usage: python tools/cpu_ceiling.py [N] [4N]   (default 8 32)
Prints one JSON line {"lo": .., "hi": .., "thr_lo": .., "thr_hi": ..,
"ceiling": ratio/(hi/lo)}.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time


def _burn(n: int) -> int:
    x = 0
    for i in range(n):
        x += i * i
    return x


def _throughput_once(procs: int, per: int, chunks_per_proc: int) -> float:
    # pin to `procs` CPUs, mirroring the probe's taskset shape: the
    # ceiling must measure what a FIXED CPU budget delivers, not what a
    # pool that sprawls into the box's idle cores delivers
    try:
        import os

        prev = os.sched_getaffinity(0)
        os.sched_setaffinity(0, set(range(min(procs, os.cpu_count() or procs))))
    except (AttributeError, OSError):
        prev = None
    try:
        t0 = time.monotonic()
        with mp.Pool(procs) as p:
            p.map(_burn, [per] * procs * chunks_per_proc)
        dt = time.monotonic() - t0
        return procs * chunks_per_proc / dt
    finally:
        if prev is not None:
            import os

            os.sched_setaffinity(0, prev)


def measure(lo: int = 8, hi: int = 32, per: int = 3_000_000,
            chunks_per_proc: int = 4, repeats: int = 3) -> dict:
    # INTERLEAVED best-of-N: this host's deliverable capacity drifts 2-4x
    # over minutes; measuring all-lo-then-all-hi lets that drift land on
    # one level and produce a nonsense ratio (super-linear "ceilings"
    # observed). Interleave (lo,hi) pairs and take the best per level —
    # and clamp to 1.0: >1x/core scaling is measurement noise by
    # definition for this workload.
    thr_lo = thr_hi = 0.0
    for _ in range(repeats):
        thr_lo = max(thr_lo, _throughput_once(lo, per, chunks_per_proc))
        thr_hi = max(thr_hi, _throughput_once(hi, per, chunks_per_proc))
    return {
        "lo": lo,
        "hi": hi,
        "thr_lo": round(thr_lo, 2),
        "thr_hi": round(thr_hi, 2),
        "ceiling": min(1.0, round((thr_hi / thr_lo) / (hi / lo), 4)),
    }


if __name__ == "__main__":
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    print(json.dumps(measure(lo, hi)))
