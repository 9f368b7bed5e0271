"""Two-cluster-size scaling evidence (BASELINE.json north rule).

Runs bench.py twice in fresh processes — local[8] (N) and local[32] (4N) —
on the SAME input, computes throughput at each and the scaling efficiency
  eff = (docs/s @ 4N) / (4 * docs/s @ N)
and appends the results to BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(cpus: int, sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus), SPARK_GRAFT_SF_DIR=sf_dir)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    r8 = run_bench(8, sf_dir)
    r32 = run_bench(32, sf_dir)
    tp8 = r8["docs_per_sec"]
    tp32 = r32["docs_per_sec"]
    eff = tp32 / (4 * tp8)
    suite_speedup = r8["value"] / r32["value"]

    report = {
        "sf": sf_dir,
        "local8": r8,
        "local32": r32,
        "kg_docs_per_sec@8": tp8,
        "kg_docs_per_sec@32": tp32,
        "kg_scaling_efficiency_Nto4N": round(eff, 3),
        "suite_wall_speedup_Nto4N": round(suite_speedup, 3),
    }
    print(json.dumps(report, indent=1))

    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    os.makedirs(os.path.dirname(md), exist_ok=True)
    with open(md, "a") as f:
        f.write("\n## Scaling run\n\n```json\n" + json.dumps(report, indent=1) + "\n```\n")


if __name__ == "__main__":
    main()
