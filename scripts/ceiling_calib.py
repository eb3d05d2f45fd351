#!/usr/bin/env python
"""Hardware scaling-ceiling calibration for BENCH.md: K independent
CPU-pinned Python processes each run a fixed integer/float loop (no Spark,
no shared state); the aggregate-throughput ratio going N -> 4N busy vCPUs
is the maximum efficiency ANY software can show on this host (guest
oversubscription + shared memory bus). Usage: ceiling_calib.py [n_low]."""

import json
import subprocess
import sys
import time

WORK = r"""
import time
t0 = time.perf_counter()
x = 0
for i in range(30_000_000):
    x += i * 31 + (i ^ 1234567)
print(time.perf_counter() - t0)
"""


def run_level(n: int) -> float:
    procs = []
    t0 = time.perf_counter()
    for i in range(n):
        procs.append(subprocess.Popen(
            ["taskset", "-c", str(i), sys.executable, "-c", WORK],
            stdout=subprocess.PIPE, text=True))
    for p in procs:
        p.wait()
    wall = time.perf_counter() - t0
    return n / wall  # units of work per second, aggregate


def main():
    n_low = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    lo = max(run_level(n_low) for _ in range(reps))
    hi = max(run_level(n_low * 4) for _ in range(reps))
    print(json.dumps({
        "n_low": n_low, "reps": reps,
        "low_units_per_sec": round(lo, 3),
        "high_units_per_sec": round(hi, 3),
        "ceiling_efficiency": round((hi / lo) / 4.0, 4),
    }))


if __name__ == "__main__":
    main()


# -- memory-bandwidth variant (what shuffle/cache-bound stages experience) --
WORK_MEM = r"""
import numpy as np, time
a = np.arange(40_000_000, dtype=np.int64)   # ~320 MB working set
b = np.empty_like(a)
t0 = time.perf_counter()
for _ in range(6):
    np.copyto(b, a)
    s = int(b.sum())
print(time.perf_counter() - t0)
"""


def run_level_mem(n: int) -> float:
    import subprocess, sys, time
    procs = []
    t0 = time.perf_counter()
    for i in range(n):
        procs.append(subprocess.Popen(
            ["taskset", "-c", str(i), sys.executable, "-c", WORK_MEM],
            stdout=subprocess.PIPE, text=True))
    for p in procs:
        p.wait()
    return n / (time.perf_counter() - t0)


def main_mem():
    import json, sys
    n_low = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    lo = max(run_level_mem(n_low) for _ in range(reps))
    hi = max(run_level_mem(n_low * 4) for _ in range(reps))
    print(json.dumps({
        "kind": "membw", "n_low": n_low,
        "low_units_per_sec": round(lo, 3),
        "high_units_per_sec": round(hi, 3),
        "ceiling_efficiency": round((hi / lo) / 4.0, 4),
    }))
