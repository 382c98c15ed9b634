#!/usr/bin/env python
"""Hardware scaling ceilings for the two-parallelism protocol.

Measures, taskset-pinned like tools/bench_scaling.py, the N -> 4N aggregate-
throughput scaling of two synthetic workloads that bracket any real job on
this VM:

  pure-CPU   — integer spin, zero memory traffic: the best any
               perfectly-parallel compute can scale.
  streaming  — repeated +1.0 passes over per-worker 16 MB float64 arrays:
               the FRIENDLIEST memory-bound pattern (sequential, no
               sharing). Spark shuffle hash tables / GC / Arrow buffers
               are strictly worse.

A Spark job whose efficiency lands between the streaming and pure-CPU
ceilings is limited by this box's shared memory controllers, not by its
plan. Prints one JSON line per pair and appends to
BENCH/ceiling_runs.jsonl.

Usage: PAIRS=4:16,2:8 python tools/hw_ceilings.py
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SECONDS = float(os.environ.get("SECONDS_PER_RUN", "8"))


def _pin(core: int) -> None:
    try:
        os.sched_setaffinity(0, {core})
    except OSError:
        pass


def _cpu_worker(core: int, out: "mp.Queue") -> None:
    _pin(core)
    x = 1
    iters = 0
    t_end = time.time() + SECONDS
    while time.time() < t_end:
        for _ in range(100_000):
            x = (x * 1103515245 + 12345) & 0x7FFFFFFF
        iters += 100_000
    out.put(iters)


def _stream_worker(core: int, out: "mp.Queue") -> None:
    _pin(core)
    a = np.zeros(2 * 1024 * 1024, dtype=np.float64)  # 16 MB
    passes = 0
    t_end = time.time() + SECONDS
    while time.time() < t_end:
        a += 1.0
        passes += 1
    out.put(passes)


def aggregate(worker, n: int) -> float:
    q: "mp.Queue" = mp.Queue()
    procs = [
        mp.Process(target=worker, args=(i, q)) for i in range(n)
    ]
    t0 = time.time()
    for p in procs:
        p.start()
    total = sum(q.get() for _ in procs)
    for p in procs:
        p.join()
    return total / (time.time() - t0)


def main() -> int:
    pairs = [
        tuple(int(v) for v in p.split(":"))
        for p in os.environ.get("PAIRS", "4:16,2:8").split(",")
    ]
    report = {}
    for n, n4 in pairs:
        cpu_n = aggregate(_cpu_worker, n)
        cpu_4n = aggregate(_cpu_worker, n4)
        st_n = aggregate(_stream_worker, n)
        st_4n = aggregate(_stream_worker, n4)
        report[f"{n}->{n4}"] = {
            "pure_cpu_eff": round(cpu_4n / cpu_n / (n4 / n), 3),
            "streaming_eff": round(st_4n / st_n / (n4 / n), 3),
            "cpu_ops_per_s": {str(n): cpu_n, str(n4): cpu_4n},
            "stream_passes_per_s": {str(n): st_n, str(n4): st_4n},
        }
    print(json.dumps(report, indent=2))
    os.makedirs(f"{REPO}/BENCH", exist_ok=True)
    with open(f"{REPO}/BENCH/ceiling_runs.jsonl", "a") as f:
        f.write(json.dumps({"seconds_per_run": SECONDS, "report": report}) + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
