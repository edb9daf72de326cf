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


def iso_capacity(subject_cpus: int = 4, total_cpus: int = 16,
                 per: int = 3_000_000, repeats: int = 3) -> dict:
    """Per-CPU capacity under load vs idle-box — the clock term, directly.

    /proc/cpuinfo MHz is a static constant on this VM, so frequency
    scaling can't be read; it CAN be measured behaviorally. Run the same
    pure-CPU subject (``subject_cpus`` pinned burn processes on CPUs
    0..subject_cpus-1) twice: (a) with the rest of the box idle — the
    conditions a low-parallelism probe level enjoys — and (b) with CPUs
    subject_cpus..total_cpus-1 occupied by background spinners — the
    sustained all-core conditions every executor of a packed cluster
    node (and the probe's high level) runs at. iso_factor = thr_loaded /
    thr_idle < 1 quantifies exactly the capacity an idle-box baseline
    borrows from turbo/shared-cache headroom that a cluster's N-executor
    level never has.
    """
    import os
    import subprocess
    import sys as _sys

    thr_idle = thr_loaded = 0.0
    n_load = max(0, total_cpus - subject_cpus)
    load_pin = f"{subject_cpus}-{total_cpus - 1}"
    spin = ("import multiprocessing as mp\n"
            "def s(_):\n"
            "    while True: pass\n"
            f"mp.Pool({n_load}).map(s, range({n_load}))\n")
    taskset = "taskset"
    for _ in range(repeats):
        # interleaved idle/loaded so host drift hits both alike
        thr_idle = max(thr_idle, _throughput_once(subject_cpus, per, 4))
        # start_new_session + killpg: killing only the Popen parent leaks
        # its mp.Pool children as permanent box-wide spinners
        loader = subprocess.Popen(
            [taskset, "-c", load_pin, _sys.executable, "-c", spin],
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            start_new_session=True,
        ) if n_load else None
        try:
            if loader:
                time.sleep(1.0)  # let spinners reach steady state
            thr_loaded = max(thr_loaded, _throughput_once(subject_cpus, per, 4))
        finally:
            if loader:
                import signal

                os.killpg(loader.pid, signal.SIGKILL)
                loader.wait()
    return {
        "subject_cpus": subject_cpus,
        "total_cpus": total_cpus,
        "thr_idle": round(thr_idle, 2),
        "thr_loaded": round(thr_loaded, 2),
        "iso_factor": round(min(1.0, thr_loaded / thr_idle), 4) if thr_idle else None,
    }


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--iso":
        subj = int(sys.argv[2]) if len(sys.argv) > 2 else 4
        tot = int(sys.argv[3]) if len(sys.argv) > 3 else 16
        print(json.dumps(iso_capacity(subj, tot)))
        raise SystemExit(0)
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    print(json.dumps(measure(lo, hi)))
