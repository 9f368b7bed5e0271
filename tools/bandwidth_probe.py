"""Memory-BANDWIDTH scaling ceiling of this host (4 vs 16 procs).

The md5 host-ceiling microbench in scaling_bench.py is compute-bound
(fits in L1/L2, ~no DRAM traffic), so it bounds only the CPU side. Spark's
16-core profile is different: Arrow serialization + tmpfs shuffle + GC all
stream through shared DRAM, and DRAM bandwidth does not scale with cores.
This probe streams large numpy buffers (copy + sum, ~3x buffer traffic per
pass) far beyond LLC size and reports the 4->16 process scaling of
aggregate bandwidth — the ceiling that applies to the shuffle/serialize
share of the pipeline.

Usage: python tools/bandwidth_probe.py
"""

from __future__ import annotations

import multiprocessing as mp
import time

import numpy as np

BUF_MB = 256
PASSES = 24


def work(_):
    a = np.arange(BUF_MB * 1024 * 1024 // 8, dtype=np.int64)
    s = 0
    for _ in range(PASSES):
        b = a.copy()          # read + write BUF_MB
        s += int(b[::4096].sum())  # touch again
    return s


def main() -> None:
    rates = {}
    for procs in (4, 16):
        t = time.time()
        with mp.Pool(procs) as p:
            p.map(work, range(procs), chunksize=1)
        w = time.time() - t
        gb = procs * PASSES * BUF_MB * 3 / 1024  # r+w+reread per pass
        rates[procs] = gb / w
        print(f"procs={procs} aggregate~{rates[procs]:.1f} GB/s wall={w:.1f}s")
    print(f"bandwidth 4->16 scaling efficiency: {rates[16] / (4 * rates[4]):.3f}")


if __name__ == "__main__":
    main()
