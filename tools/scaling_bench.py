"""Two-cluster-size scaling evidence (BASELINE.json north rule).

No real cluster exists in this sandbox, so N vs 4N executors is evidenced by
the same job at local[8] vs local[32] on the same machine. Single-node local
mode carries fixed costs a cluster does not scale away per-node (driver
session setup, Catalyst planning, Python-worker warmup, per-stage barriers
~15-25 s here) which at this corpus size are the SAME order as the compute —
so two corpus sizes are run per parallelism and BOTH efficiencies reported:

  raw      = (docs/s @32) / (4 x docs/s @8)            at the large corpus
  marginal = (d_wall@8 / d_wall@32) / 4                between the corpora

Marginal efficiency measures the data-proportional part of the job — the
part that exists at 10^12-row scale, where the ~20 s fixed costs are seven
orders of magnitude below the work. Both numbers + method land in
BENCH/BASELINE.md.

Usage: python tools/scaling_bench.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import json
import multiprocessing
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REPL_SMALL = int(os.environ.get("SCALING_REPL_SMALL", "40"))
REPL_LARGE = int(os.environ.get("SCALING_REPL_LARGE", "160"))

# Shuffle/spill dirs on tmpfs when available: production executors put
# shuffle on per-node local NVMe, which scales WITH the cluster; this
# sandbox's single shared disk does not, so leaving shuffle on it would
# measure disk contention, not the engine (measured ~12% drag at 16 cores).
SHM = "/dev/shm/spark-tmp"


def _mp_work(n: int) -> int:
    h = b"seed"
    for i in range(n):
        h = hashlib.md5(h + str(i).encode()).digest()
    return h[0]


def host_mp_efficiency(n_small: int, n_large: int) -> dict:
    """Pure-Python multiprocessing ceiling of THIS HOST at the same core
    counts (no Spark): on SMT machines the large run spans hyperthread
    siblings while the small run gets dedicated physical cores, so even a
    perfect engine cannot exceed this ratio."""
    rates = {}
    for procs in (n_small, n_large):
        n_tasks, per_task = 128, 400_000
        t = time.time()
        with multiprocessing.Pool(procs) as p:
            p.map(_mp_work, [per_task] * n_tasks, chunksize=1)
        rates[procs] = n_tasks * per_task / (time.time() - t)
    return {
        "rate@N": round(rates[n_small] / 1e6, 2),
        "rate@4N": round(rates[n_large] / 1e6, 2),
        "host_ceiling_efficiency": round(
            rates[n_large] / (4 * rates[n_small]), 3
        ),
    }


def run_bench(cpus: int, repl: int, sf_dir: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_BENCH_REPL=str(repl),
        # scaling evidence times the kg_pipeline only — the operator-suite
        # queries are small fixed-size runs that would just add noise
        SPARK_GRAFT_BENCH_ONLY="kg",
    )
    if os.path.isdir("/dev/shm"):
        os.makedirs(SHM, exist_ok=True)
        env["SPARK_LOCAL_DIRS"] = SHM
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    time.sleep(10)  # let the previous JVM/python workers fully release
    return json.loads(line)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    n_small = int(os.environ.get("SCALING_N", "4"))
    n_large = n_small * 4
    runs = {}
    # decisive pair (large corpus at N then 4N) runs BACK TO BACK: this
    # host's effective CPU budget drifts ~25% across ~10-minute windows
    # without showing up as steal, so minutes between the two runs of a
    # ratio inject more noise than steal does (round-3 samples C vs D)
    for repl in (REPL_LARGE, REPL_SMALL):
        for cpus in (n_small, n_large):
            runs[f"c{cpus}_r{repl}"] = run_bench(cpus, repl, sf_dir)

    big8 = runs[f"c{n_small}_r{REPL_LARGE}"]
    big32 = runs[f"c{n_large}_r{REPL_LARGE}"]
    small8 = runs[f"c{n_small}_r{REPL_SMALL}"]
    small32 = runs[f"c{n_large}_r{REPL_SMALL}"]

    tp8 = big8["docs_per_sec"]
    tp32 = big32["docs_per_sec"]
    raw_eff = tp32 / (4 * tp8)

    d_docs = big8["kg_docs"] - small8["kg_docs"]
    d8 = big8["queries"]["kg_pipeline"] - small8["queries"]["kg_pipeline"]
    d32 = big32["queries"]["kg_pipeline"] - small32["queries"]["kg_pipeline"]
    marg8 = d_docs / d8 if d8 > 0 else float("nan")
    marg32 = d_docs / d32 if d32 > 0 else float("nan")
    marg_eff = marg32 / (4 * marg8) if d8 > 0 and d32 > 0 else float("nan")

    mp_ceiling = host_mp_efficiency(n_small, n_large)

    report = {
        "sf": sf_dir,
        "N": n_small,
        "4N": n_large,
        "host_mp_ceiling": mp_ceiling,
        "raw_eff_vs_host_ceiling": round(
            (tp32 / (4 * tp8)) / mp_ceiling["host_ceiling_efficiency"], 3
        ),
        "corpus_small_docs": small8["kg_docs"],
        "corpus_large_docs": big8["kg_docs"],
        "kg_docs_per_sec@N": tp8,
        "kg_docs_per_sec@4N": tp32,
        "raw_scaling_efficiency_Nto4N": round(raw_eff, 3),
        "marginal_docs_per_sec@N": round(marg8, 1),
        "marginal_docs_per_sec@4N": round(marg32, 1),
        "marginal_scaling_efficiency_Nto4N": round(marg_eff, 3),
        "steal_pct_by_run": {k: v.get("steal_pct") for k, v in runs.items()},
        "runs": runs,
    }
    print(json.dumps(report, indent=1))

    # raw JSON -> BENCH/samples/ (doc hygiene, VERDICT r3 #8); BASELINE.md
    # gets the header + key numbers + the pointer only
    import re

    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    os.makedirs(os.path.dirname(md), exist_ok=True)
    label = os.environ.get("SCALING_LABEL", f"N={n_small} vs {n_large}")
    slug = re.sub(r"[^a-zA-Z0-9]+", "_", label).strip("_").lower()[:60]
    sample_path = os.path.join(REPO, "BENCH", "samples", f"{slug}.json")
    os.makedirs(os.path.dirname(sample_path), exist_ok=True)
    with open(sample_path, "w") as f:
        json.dump(report, f, indent=1)
    with open(md, "a") as f:
        f.write(
            f"\n## Scaling run — {label}\n\n"
            f"Key numbers: raw {report['raw_scaling_efficiency_Nto4N']}, "
            f"marginal {report['marginal_scaling_efficiency_Nto4N']}, "
            f"docs/s@N {report['kg_docs_per_sec@N']}, "
            f"docs/s@4N {report['kg_docs_per_sec@4N']}, "
            f"host-ceiling "
            f"{report['host_mp_ceiling']['host_ceiling_efficiency']}.\n"
            f"Full raw JSON: `BENCH/samples/{slug}.json`.\n"
        )


if __name__ == "__main__":
    main()
