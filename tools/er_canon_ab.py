"""Same-window A/B pin for the er_canon bench entry (VERDICT r4 #1).

Context: the driver's r4 er_canon draw read 25.8 s (steal 0.0) vs 17.2 s in
r3, and the builder's clean r4 redraw read 23.3 s — a +35-50% move with no
steal to blame. `git diff r3..r4` over the entire er_canon code path
(operators/er.py, operators/connected_components.py, functions/hashing.py,
functions/textnorm.py, bench.bench_er_canon) is EMPTY — the only bench.py
change was the LONG_ENTRY second-draw threshold, which keeps the MINIMUM
wall and can only lower the committed number. So the r3->r4 move cannot be
code-caused; the open question this tool answers with one same-window run:

  (a) does the r5 change that DOES touch this path (er.lsh_candidate_pairs
      over-cap truncation, VERDICT r4 #2) cost anything? and
  (b) what does er_canon read in a window whose DRAM bandwidth is probed
      clean, on both variants?

Method: interleaved A/B/A/B... draws (DRAW_PAIRS pairs) of
  A = r3/r4 pair generator (over-cap buckets DROPPED — the exact code shape
      shipped in rounds 1-4, inlined below from git history)
  B = r5 pair generator (over-cap buckets TRUNCATED — operators/er.py HEAD)
inside ONE Spark session, per-draw /proc/stat steal, cache+GC reset between
draws (bench.py's reset rule), with tools/bandwidth_probe.py run before and
after to classify the window. Interleaving means any window drift hits both
variants symmetrically — the A-B delta is the code effect.

Usage: python tools/er_canon_ab.py          # writes one JSON line to stdout
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
DRAW_PAIRS = int(os.environ.get("SPARK_GRAFT_AB_PAIRS", "2"))


from bench import _cpu_stat  # noqa: E402  (one steal-accounting impl)


def lsh_candidate_pairs_drop(sigs, col="surface_norm"):
    """The r3/r4 generator, verbatim shape: over-cap buckets are DROPPED
    (`size(members) <= MAX_BLOCK_SIZE` filter) — kept here ONLY as the A
    side of this pin; the engine ships the truncating form."""
    from nary_relation_extraction_decomposed_spark.functions.hashing import (
        lsh_band_hashes_col,
    )
    from nary_relation_extraction_decomposed_spark.operators.er import (
        MAX_BLOCK_SIZE,
    )

    bands = sigs.select(
        F.col(col), F.explode(lsh_band_hashes_col(F.col("sig"))).alias("bb")
    ).select(col, "bb.band", "bb.bucket")
    buckets = (
        bands.groupBy("band", "bucket")
        .agg(F.array_sort(F.collect_list(col)).alias("members"))
        .filter((F.size("members") >= 2) & (F.size("members") <= MAX_BLOCK_SIZE))
    )
    pair_arr = F.flatten(
        F.transform(
            F.col("members"),
            lambda x, i: F.transform(
                F.slice(F.col("members"), i + F.lit(2), F.size("members")),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    return (
        buckets.select(F.explode(pair_arr).alias("p"))
        .select("p.a", "p.b")
        .distinct()
    )


def probe() -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "bandwidth_probe.py")],
        capture_output=True, text=True, timeout=600,
    ).stdout
    res = {}
    for line in out.splitlines():
        if line.startswith("procs="):
            procs = int(line.split("=")[1].split()[0])
            res[f"gbps_{procs}p"] = float(line.split("~")[1].split()[0])
        elif "efficiency" in line:
            res["bw_eff_4to16"] = float(line.rsplit(":", 1)[1])
    return res


def main() -> None:
    from pyspark.sql import SparkSession

    from nary_relation_extraction_decomposed_spark.operators import er
    from bench import bench_er_canon

    bw_before = probe()

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.driver.memory", "32g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.local.dir", os.environ.get("SPARK_LOCAL_DIRS", "/dev/shm/spark-ab"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{SF_DIR}/documents.parquet").count()  # warm

    truncate_impl = er.lsh_candidate_pairs
    draws: list[dict] = []

    def one(variant: str) -> None:
        er.lsh_candidate_pairs = (
            lsh_candidate_pairs_drop if variant == "drop" else truncate_impl
        )
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        s0, c0 = _cpu_stat()
        t0 = time.time()
        n = bench_er_canon(spark, SF_DIR)
        wall = round(time.time() - t0, 2)
        s1, c1 = _cpu_stat()
        draws.append(
            {
                "variant": variant,
                "wall_sec": wall,
                "steal_pct": round(100.0 * (s1 - s0) / max(c1 - c0, 1), 1),
                "n_surfaces": n,
            }
        )
        print(f"  {variant}: {wall}s steal={draws[-1]['steal_pct']}%", file=sys.stderr)

    for _ in range(DRAW_PAIRS):
        one("drop")
        one("truncate")
    er.lsh_candidate_pairs = truncate_impl
    spark.stop()

    bw_after = probe()
    best = {
        v: min(d["wall_sec"] for d in draws if d["variant"] == v)
        for v in ("drop", "truncate")
    }
    print(
        json.dumps(
            {
                "entry": "er_canon_ab",
                "sf_dir": SF_DIR,
                "cpus": int(CPUS),
                "bw_before": bw_before,
                "bw_after": bw_after,
                "draws": draws,
                "best": best,
                "truncate_minus_drop_sec": round(best["truncate"] - best["drop"], 2),
            }
        )
    )


if __name__ == "__main__":
    main()
