"""Per-stage wall-clock profile of the er_canon bench entry at sf0.1.

Materializes each sub-stage with localCheckpoint(eager=True) so stage
timings don't overlap via lazy evaluation, then reports seconds + rows.
Diagnostic only — not part of the bench contract.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

from nary_relation_extraction_decomposed_spark.operators.er import (  # noqa: E402
    lsh_candidate_pairs,
    minhash_signatures,
    verify_pairs,
)
from nary_relation_extraction_decomposed_spark.operators.connected_components import (  # noqa: E402
    connected_components,
)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
ER_FACTOR = int(os.environ.get("SPARK_GRAFT_ER_FACTOR", "4"))


def main() -> None:
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.local.dir", "/dev/shm/spark-profile")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    width = spark.sparkContext.defaultParallelism

    d = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id")
    cores = d.select(
        F.explode(F.sequence(F.lit(0), F.lit(ER_FACTOR - 1))).alias("i"), "doc_id"
    ).select(
        F.substring(
            F.md5(F.concat_ws("#", F.col("doc_id").cast("string"), F.col("i"))), 1, 10
        ).alias("core")
    )
    surfaces = (
        cores.select(F.col("core").alias("surface_norm"))
        .union(cores.select(
            F.concat(F.substring("core", 1, 5), F.lit(" "),
                     F.substring("core", 6, 5)).alias("surface_norm")))
        .union(cores.select(
            F.concat(F.substring("core", 1, 3), F.lit("-"),
                     F.substring("core", 4, 7)).alias("surface_norm")))
    ).repartition(width * 2).localCheckpoint(eager=True)
    n_surf = surfaces.count()
    print(f"surfaces: {n_surf}")

    col = "surface_norm"
    stages: list[tuple[str, float, int]] = []

    t0 = time.monotonic()
    sigs = minhash_signatures(surfaces, col).localCheckpoint(eager=True)
    n = sigs.count()
    stages.append(("minhash_signatures", time.monotonic() - t0, n))

    t0 = time.monotonic()
    pairs = lsh_candidate_pairs(sigs, col).localCheckpoint(eager=True)
    n = pairs.count()
    stages.append(("lsh_candidate_pairs", time.monotonic() - t0, n))

    t0 = time.monotonic()
    ver = verify_pairs(pairs, sigs, col).localCheckpoint(eager=True)
    n = ver.count()
    stages.append(("verify_pairs", time.monotonic() - t0, n))

    t0 = time.monotonic()
    ids = sigs.select(F.col(col), F.xxhash64(F.col(col)).alias("node")).localCheckpoint(eager=True)
    edges = (
        ver.join(ids.withColumnRenamed(col, "a").withColumnRenamed("node", "src"), "a")
        .join(ids.withColumnRenamed(col, "b").withColumnRenamed("node", "dst"), "b")
        .select("src", "dst")
        .localCheckpoint(eager=True)
    )
    n = edges.count()
    stages.append(("edges_build", time.monotonic() - t0, n))

    t0 = time.monotonic()
    comps = connected_components(
        edges, driver_threshold=0, algorithm="star"
    ).localCheckpoint(eager=True)
    n = comps.count()
    stages.append(("connected_components(star)", time.monotonic() - t0, n))

    t0 = time.monotonic()
    labeled = (
        ids.join(comps, ids["node"] == comps["node"], "left")
        .select(F.col(col), F.coalesce("comp", ids["node"]).alias("comp"))
        .localCheckpoint(eager=False)
    )
    canon = labeled.groupBy("comp").agg(F.min(col).alias("canonical"))
    out = labeled.join(canon, "comp").select(col, "canonical")
    n = out.count()
    stages.append(("label+canonical", time.monotonic() - t0, n))

    total = sum(s[1] for s in stages)
    print(f"\n{'stage':<28}{'sec':>8}{'rows':>12}")
    for name, sec, rows in stages:
        print(f"{name:<28}{sec:>8.2f}{rows:>12}")
    print(f"{'TOTAL':<28}{total:>8.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
