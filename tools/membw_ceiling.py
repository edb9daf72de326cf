"""Memory-bandwidth scaling ceiling for the multi-executor probe shape.

Companion to ``cpu_ceiling.py``. That tool measures pure-register
arithmetic (no memory traffic) and shows per-CPU capacity on this VM is
UNCHANGED with up to 16 CPUs busy (iso_factor 1.0 at the (2,8) probe
pair's footprint). This tool measures the other extreme — streaming
DRAM copies, the memory system's worst case — at the probe's literal
executor shape: K concurrent 4-CPU slots, one copy stream per CPU
(64 MB arrays, far beyond LLC).

Measured on this box: ONE slot pulls ~66 GB/s; the whole box tops out
at ~99 GB/s, so bandwidth-bound work weak-scales at only ~0.38 across
1 -> 4 slots while register-bound work scales at 1.0. Every real job
sits between the two; where it lands is set by its memory intensity,
not by its coordination. On a real cluster, N -> 4N executors
multiplies memory controllers and LLCs with node count, so this wall —
unlike a job's own serialization — does not exist there. That is why
BENCH/BASELINE.md publishes this ceiling next to the raw efficiency:
the pair (cpu_ceiling, membw_ceiling) brackets what ANY job can show
on one box, and the probe's raw number must be read against it.

Usage: python tools/membw_ceiling.py [slots] [cpus_per_slot]
Prints one JSON {"bw_1slot_GBps": .., "bw_kslot_GBps": ..,
"membw_slot_scaling": agg_k / (k * agg_1)}.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

_SECONDS = 4.0
_ARR_MB = 64


def _child(cpu: int) -> None:
    import numpy as np

    os.sched_setaffinity(0, {cpu})
    a = np.empty(_ARR_MB * 1024 * 1024, dtype=np.uint8)
    b = np.empty_like(a)
    t0 = time.monotonic()
    n = 0
    while time.monotonic() - t0 < _SECONDS:
        np.copyto(b, a)
        n += 1
    # read + write bytes per copy
    print(n * a.nbytes * 2 / (time.monotonic() - t0) / 1e9)


def _run(slots: int, cpus_per_slot: int) -> float:
    procs = []
    for s in range(slots):
        for c in range(cpus_per_slot):
            cpu = s * cpus_per_slot + c
            procs.append(
                subprocess.Popen(
                    [sys.executable, os.path.abspath(__file__), "--child", str(cpu)],
                    stdout=subprocess.PIPE,
                    text=True,
                )
            )
    return sum(float(p.communicate()[0]) for p in procs)


def measure(slots: int = 4, cpus_per_slot: int = 4, repeats: int = 3) -> dict:
    """Interleaved best-of-N (host capacity drifts 2-4x over minutes)."""
    best1 = bestk = 0.0
    for _ in range(repeats):
        best1 = max(best1, _run(1, cpus_per_slot))
        bestk = max(bestk, _run(slots, cpus_per_slot))
    return {
        "slots": slots,
        "cpus_per_slot": cpus_per_slot,
        "bw_1slot_GBps": round(best1, 1),
        "bw_kslot_GBps": round(bestk, 1),
        "membw_slot_scaling": round(bestk / (slots * best1), 4) if best1 else None,
    }


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        _child(int(sys.argv[2]))
        raise SystemExit(0)
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    cps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    print(json.dumps(measure(k, cps)))
