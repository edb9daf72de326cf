"""Env-gated in-worker CPU profiler for mapInPandas kernels.

Set ``MIRU_KERNEL_PROF_DIR=/some/dir`` and every profiled kernel
invocation appends one JSON line per completed generator to a file
named after its worker PID. The decomposition exploits generator
mechanics: while a kernel generator is suspended at ``yield``, the
SAME worker thread runs the Arrow output serializer, and while it
blocks inside ``next()`` on its *input* iterator, that thread runs the
Arrow input deserializer — so ``time.process_time()`` deltas taken at
the suspension boundaries split worker CPU into

- ``in_cpu``   — Arrow deserialize + pandas conversion of input batches
- ``kernel_cpu`` — the kernel's own numpy/python work
- ``out_cpu``  — Arrow serialize of output batches (time between our
  ``yield`` returning control and the worker pulling the next batch)

Socket waits don't accrue (process_time is CPU, not wall), so the three
buckets sum to ~the worker's total CPU for the task. Zero overhead when
the env var is unset (factories return the raw kernel).
"""

from __future__ import annotations

import json
import os
import time


def profiled(kernel, name: str):
    """Wrap a mapInPandas kernel (iterator->iterator generator factory)
    with per-invocation CPU accounting. No-op unless
    ``MIRU_KERNEL_PROF_DIR`` is set in the worker environment."""
    prof_dir = os.environ.get("MIRU_KERNEL_PROF_DIR")
    if not prof_dir:
        return kernel

    def wrapper(pdf_iter):
        prof = None
        if os.environ.get("MIRU_KERNEL_CPROFILE"):
            import cProfile

            prof = cProfile.Profile()
            prof.enable()
        stats = {
            "name": name,
            "in_cpu": 0.0,
            "kernel_cpu": 0.0,
            "out_cpu": 0.0,
            "proc_cpu": 0.0,
            "thread_cpu": 0.0,
            "rows_in": 0,
            "rows_out": 0,
            "batches_in": 0,
            "batches_out": 0,
        }
        if os.environ.get("MIRU_KERNEL_CALIBRATE"):
            import numpy as _np

            t0 = time.process_time()
            for _ in range(10):
                a = _np.ones(350_000, dtype=_np.int64)
                a.cumsum()
            stats["calib_numpy_ms"] = round((time.process_time() - t0) * 1000, 2)
            t0 = time.process_time()
            junk = ["x" * 8 for _ in range(200_000)]
            stats["calib_alloc_ms"] = round((time.process_time() - t0) * 1000, 2)
            del junk
        p0, h0 = time.process_time(), time.thread_time()
        src = iter(pdf_iter)
        first_dtypes = {}

        def timed_in():
            while True:
                t0 = time.process_time()
                try:
                    pdf = next(src)
                except StopIteration:
                    stats["in_cpu"] += time.process_time() - t0
                    return
                stats["in_cpu"] += time.process_time() - t0
                stats["batches_in"] += 1
                stats["rows_in"] += len(pdf)
                if not first_dtypes and hasattr(pdf, "dtypes"):
                    for c in pdf.columns:
                        v = pdf[c].iloc[0] if len(pdf) else None
                        first_dtypes[c] = f"{pdf[c].dtype}/{type(v).__name__}"
                    stats["dtypes"] = first_dtypes
                yield pdf

        inner = kernel(timed_in())
        while True:
            t0 = time.process_time()
            in_before = stats["in_cpu"]
            try:
                out = next(inner)
            except StopIteration:
                stats["kernel_cpu"] += (
                    time.process_time() - t0 - (stats["in_cpu"] - in_before)
                )
                break
            stats["kernel_cpu"] += (
                time.process_time() - t0 - (stats["in_cpu"] - in_before)
            )
            stats["batches_out"] += 1
            stats["rows_out"] += len(out)
            # while we are suspended at this yield, the SAME worker thread
            # runs the Arrow output serializer — measure suspend->resume
            t_yield = time.process_time()
            yield out
            stats["out_cpu"] += time.process_time() - t_yield

        stats["proc_cpu"] = time.process_time() - p0
        stats["thread_cpu"] = time.thread_time() - h0
        try:
            os.makedirs(prof_dir, exist_ok=True)
            with open(os.path.join(prof_dir, f"w{os.getpid()}.jsonl"), "a") as f:
                f.write(json.dumps(stats) + "\n")
            if prof is not None:
                prof.disable()
                prof.dump_stats(
                    os.path.join(prof_dir, f"c{os.getpid()}_{name}_{id(stats)}.prof")
                )
        except OSError:
            pass

    return wrapper


def summarize(prof_dir: str) -> dict:
    """Aggregate all per-worker jsonl files in ``prof_dir`` by kernel
    name -> summed buckets."""
    agg: dict[str, dict] = {}
    for fn in os.listdir(prof_dir):
        if not fn.endswith(".jsonl"):
            continue
        with open(os.path.join(prof_dir, fn)) as f:
            for line in f:
                rec = json.loads(line)
                a = agg.setdefault(
                    rec["name"],
                    {"in_cpu": 0.0, "kernel_cpu": 0.0, "out_cpu": 0.0,
                     "proc_cpu": 0.0, "thread_cpu": 0.0,
                     "rows_in": 0, "rows_out": 0, "invocations": 0},
                )
                for k in ("in_cpu", "kernel_cpu", "out_cpu", "proc_cpu", "thread_cpu"):
                    a[k] += rec.get(k, 0.0)
                a["rows_in"] += rec["rows_in"]
                a["rows_out"] += rec["rows_out"]
                a["invocations"] += 1
    for a in agg.values():
        for k in ("in_cpu", "kernel_cpu", "out_cpu", "proc_cpu", "thread_cpu"):
            a[k] = round(a[k], 2)
    return agg
