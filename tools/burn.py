#!/usr/bin/env python3
"""Pure-CPU scaling ceiling of this host (methodology from BENCH.md).

Runs a fixed bag of identical CPU-bound tasks on a multiprocessing Pool of
N and 4N workers and reports the per-core throughput ratio. No Spark, no
I/O, no shuffle — so the ratio is the HARDWARE+HOST ceiling (turbo scaling,
SMT sharing beyond the physical-core count, neighbor load) that bounds any
Spark job's achievable N→4N scaling efficiency on this box. Best-of-reps
per config filters host spikes; run only on an otherwise idle host.

Two modes bracket a Spark job's achievable ceiling:
  cpu (default) — L1-resident integer loop: the PURE-CPU ceiling
    (turbo + SMT + neighbor load only).
  mem — streaming 256 MB numpy sums: the MEMORY-BANDWIDTH ceiling
    (DRAM channels are shared box-wide; on a real cluster each node
    brings its own channels, so this term scales with node count).
A real build (tokenize, shuffle, compress, write) lands between them.

Usage: python3 tools/burn.py [N=4] [tasks=64] [reps=3] [mode=cpu|mem]
"""
import multiprocessing as mp
import sys
import time


def work(i: int) -> int:
    h = i
    for _ in range(3_000_000):
        h = (h * 31 + 7) % 1000000007
    return h


def work_mem(i: int) -> int:
    import numpy as np

    a = np.full(32_000_000, i, dtype=np.int64)  # 256 MB
    s = 0
    for _ in range(6):
        s += int(a.sum())  # streaming read per pass
    return s


def measure(k: int, tasks: int, reps: int, fn) -> float:
    best = None
    for _ in range(reps):
        with mp.Pool(k) as p:
            t0 = time.time()
            p.map(fn, range(tasks))
            dt = time.time() - t0
        if best is None or dt < best:
            best = dt
    return best


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    tasks = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    mode = sys.argv[4] if len(sys.argv) > 4 else "cpu"
    fn = work_mem if mode == "mem" else work
    n4 = 4 * n
    t_n = measure(n, tasks, reps, fn)
    t_4n = measure(n4, tasks, reps, fn)
    eff = ((1.0 / t_4n) / n4) / ((1.0 / t_n) / n)
    print(
        f'{{"metric":"burn_ceiling","mode":"{mode}","n":{n},"tasks":{tasks},"reps":{reps},'
        f'"t_n_sec":{t_n:.2f},"t_4n_sec":{t_4n:.2f},'
        f'"speedup":{t_n / t_4n:.2f},"ceiling_efficiency":{eff:.3f}}}'
    )
