"""Per-stage DRAM-byte instrumentation for the fused KG pipeline
(VERDICT r5 #1: "instrument per-stage bytes-read/shuffled, identify the top
DRAM mover in the 659k-doc fused pipeline at local[16], and cut it").

Runs bench.bench_kg_pipeline once at a chosen parallelism with the Spark UI
REST API enabled, then dumps two byte ledgers:

  1. stage ledger  — /api/v1/applications/{app}/stages: input / output /
     shuffle-read / shuffle-write / spill bytes + executor run time per
     completed stage (JVM-visible movement: scan, exchange, spill);
  2. python ledger — /api/v1/applications/{app}/sql?details=true: the
     "data sent to Python workers" / "data returned from Python workers"
     metrics of every Arrow node (MapInPandas / ArrowEvalPython).  Stage
     metrics cannot see this traffic — for this pipeline it IS the main
     DRAM mover, so the stage ledger alone would under-count.

Prints one JSON report (stages sorted by total bytes, python nodes, totals,
bytes/doc) for BENCH/BASELINE.md.

Usage:
  STAGE_CPUS=16 python tools/stage_bytes.py [sf_dir]
Env: STAGE_CPUS (default 16), SPARK_GRAFT_BENCH_REPL (default 160 — the
659k-doc scaling corpus), SPARK_GRAFT_KG_DEDUP, SPARK_GRAFT_KG_KINDS.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CPUS = int(os.environ.get("STAGE_CPUS", "16"))
os.environ.setdefault("SPARK_GRAFT_BENCH_REPL", "160")
os.environ["SPARK_GRAFT_CPUS"] = str(CPUS)
UI_PORT = int(os.environ.get("STAGE_UI_PORT", "4050"))

# human-readable units only in the rendered table; the JSON stays in bytes
_MB = 1024 * 1024


_UI_BASE = f"http://127.0.0.1:{UI_PORT}"


def _get(path: str):
    with urllib.request.urlopen(
        f"{_UI_BASE}/api/v1/{path}", timeout=30
    ) as r:
        return json.loads(r.read())


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    from pyspark.sql import SparkSession

    import bench

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", str(CPUS * 2))
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("STAGE_DRIVER_MEM", "24g"))
        .getOrCreate()
    )
    # Spark silently rebinds to port+1.. if UI_PORT is taken
    # (spark.port.maxRetries); trust the session's actual URL, not the
    # configured port, or a leftover JVM on 4050 loses the whole ledger
    # after the measured run (review r6)
    global _UI_BASE
    _UI_BASE = spark.sparkContext.uiWebUrl or _UI_BASE
    try:
        workload = os.environ.get("STAGE_WORKLOAD", "kg")
        t0 = time.time()
        if workload == "curate":
            # curation-funnel byte ledger (round-6 fourth session): same
            # fixed-size-cluster corpus as tools/curate_scaling.py
            from nary_relation_extraction_decomposed_spark.operators.curate import (
                curate_corpus,
            )
            from tools.curate_scaling import cluster_corpus

            from tools.curate_scaling import REPL as CURATE_REPL

            repl = CURATE_REPL  # ONE default shared with the scaling tool
            docs_df = cluster_corpus(spark, sf_dir, repl, CPUS * 2)
            n_docs = docs_df.count()
            t0 = time.time()  # corpus build/persist is not the workload
            n_out = curate_corpus(
                docs_df, min_quality=0.05, rates={"en": 0.5},
                default_rate=0.25,
            )["sampled"].count()
        else:
            repl = os.environ["SPARK_GRAFT_BENCH_REPL"]
            n_docs, n_out = bench.bench_kg_pipeline(spark, sf_dir)
        wall = round(time.time() - t0, 2)

        app = _get("applications")[0]["id"]
        stages = _get(f"applications/{app}/stages?status=complete")
        ledger = []
        for s in stages:
            row = {
                "stage": s["stageId"],
                "name": s["name"].split("\n")[0][:80],
                "input_mb": round(s.get("inputBytes", 0) / _MB, 1),
                "output_mb": round(s.get("outputBytes", 0) / _MB, 1),
                "shuf_read_mb": round(s.get("shuffleReadBytes", 0) / _MB, 1),
                "shuf_write_mb": round(s.get("shuffleWriteBytes", 0) / _MB, 1),
                "spill_mem_mb": round(s.get("memoryBytesSpilled", 0) / _MB, 1),
                "spill_disk_mb": round(s.get("diskBytesSpilled", 0) / _MB, 1),
                "exec_run_sec": round(s.get("executorRunTime", 0) / 1000, 1),
                "records_in": s.get("inputRecords", 0),
                "records_shuf_read": s.get("shuffleReadRecords", 0),
            }
            row["_total_mb"] = (
                row["input_mb"] + row["output_mb"] + row["shuf_read_mb"]
                + row["shuf_write_mb"] + row["spill_mem_mb"]
            )
            ledger.append(row)
        ledger.sort(key=lambda r: -r["_total_mb"])

        # Arrow traffic: walk every SQL execution's node metrics
        py_nodes = []
        for ex in _get(f"applications/{app}/sql?details=true&length=200"):
            for node in ex.get("nodes", []):
                sent = ret = rows = None
                for m in node.get("metrics", []):
                    v = m.get("value", "")
                    if m["name"] == "data sent to Python workers":
                        sent = v
                    elif m["name"] == "data returned from Python workers":
                        ret = v
                    elif m["name"] == "number of output rows":
                        rows = v
                if sent is not None or ret is not None:
                    py_nodes.append({
                        "exec_id": ex["id"],
                        "node": node["nodeName"],
                        "sent_to_python": sent,
                        "returned_from_python": ret,
                        "output_rows": rows,
                    })

        totals = {
            k: round(sum(r[k] for r in ledger), 1)
            for k in ("input_mb", "shuf_read_mb", "shuf_write_mb",
                      "spill_mem_mb", "spill_disk_mb", "exec_run_sec")
        }
        report = {
            "workload": workload,
            "cpus": CPUS,
            "sf_dir": sf_dir,
            # the corpus parameter of THIS workload (curate: cluster
            # replication shared with tools/curate_scaling.py; kg: the
            # bench replication) — pre-fix the curate ledger misrecorded
            # the kg default here
            "repl": repl,
            **({"dedup_mode": os.environ.get("SPARK_GRAFT_KG_DEDUP", "latest"),
                "kinds": os.environ.get("SPARK_GRAFT_KG_KINDS", "(default)")}
               if workload != "curate" else {}),
            "n_docs": n_docs,
            # kg: triples emitted; curate: sampled docs kept
            ("n_kept" if workload == "curate" else "n_triples"): n_out,
            "wall_sec": wall,
            "docs_per_sec": round(n_docs / wall, 1),
            "jvm_totals": totals,
            "jvm_bytes_per_doc": round(
                sum(totals[k] for k in ("input_mb", "shuf_read_mb",
                                        "shuf_write_mb", "spill_mem_mb"))
                * _MB / max(n_docs, 1), 1),
            "top_stages": ledger[:12],
            "python_arrow_nodes": py_nodes,
        }
        print(json.dumps(report, indent=1))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
