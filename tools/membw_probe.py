#!/usr/bin/env python
"""Aggregate memory-bandwidth probe (north-rule scaling context).

Each worker process streams over a private 512 MB float64 array
(x *= 1.0000001 — one read + one write per element, defeats any
cache reuse at this size) for a fixed wall window; aggregate bytes
touched / wall = achievable memory bandwidth at that process count.
If aggregate bandwidth is flat from 2 -> 8 procs, a 4x-core Spark run
on this box CANNOT show 4x throughput on bandwidth-bound stages —
the scaling ceiling is the single memory controller, not the plan.

Usage: python tools/membw_probe.py [--procs 1,2,4,8] [--seconds 6]
Prints one JSON line: {"1": GBps, "2": GBps, ...}
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import time


def worker(seconds: float, out, barrier) -> None:
    import numpy as np

    x = np.ones(512 * 1024 * 1024 // 8, dtype=np.float64)
    n_bytes = x.nbytes
    # all workers finish fork/import/allocation BEFORE anyone streams —
    # otherwise the parent's wall includes staggered setup phases where
    # fewer than n workers run, deflating high-proc-count figures
    barrier.wait()
    t_end = time.perf_counter() + seconds
    touched = 0
    while time.perf_counter() < t_end:
        x *= 1.0000001
        touched += 2 * n_bytes  # one read + one write stream
    out.put(touched)


def measure(n_procs: int, seconds: float) -> float:
    q: mp.Queue = mp.Queue()
    barrier = mp.Barrier(n_procs + 1)
    procs = [
        mp.Process(target=worker, args=(seconds, q, barrier))
        for _ in range(n_procs)
    ]
    for p in procs:
        p.start()
    barrier.wait()
    t0 = time.perf_counter()
    total = sum(q.get() for _ in procs)
    wall = time.perf_counter() - t0
    for p in procs:
        p.join()
    return total / wall / 1e9


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", default="1,2,4,8")
    ap.add_argument("--seconds", type=float, default=6.0)
    args = ap.parse_args()
    counts = [int(c) for c in args.procs.split(",")]
    res = {}
    for c in counts:
        res[str(c)] = round(measure(c, args.seconds), 2)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
