"""Mergeable HLL distinct-count sketches (functions/sketches.py): the
store-a-sketch / union-later incremental pattern, pinned for the
properties that make it safe at 10^12 rows."""

from __future__ import annotations

import pyspark.sql.functions as F

from nary_relation_extraction_decomposed_spark.functions.sketches import (
    distinct_sketch,
    merge_estimate,
)

SF = "/root/testdata/sf0.001"


def test_sketch_accuracy_and_merge_equals_whole(spark):
    """Estimate within HLL error of exact; union of per-day sketches ==
    sketch of the union (the incremental contract)."""
    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    exact = ev.select("user_id").distinct().count()
    whole = merge_estimate(distinct_sketch(ev, ["day"], "user_id")).collect()[0]
    assert abs(whole["distinct_est"] - exact) / exact < 0.05

    one_shot = merge_estimate(
        ev.select(F.lit(1).alias("g"), "user_id").groupBy("g")
        .agg(F.hll_sketch_agg("user_id").alias("sketch"))
    ).collect()[0]
    assert whole["distinct_est"] == one_shot["distinct_est"]


def test_sketch_merge_is_partition_and_order_invariant(spark):
    """Associativity/commutativity: any split of the rows into sketch
    groups, any input partitioning, same merged estimate."""
    ev = spark.read.parquet(f"{SF}/events.parquet").select("user_id", "event_type")
    by_type = merge_estimate(distinct_sketch(ev, ["event_type"], "user_id"))
    by_salt = merge_estimate(
        distinct_sketch(
            ev.withColumn("s", F.pmod(F.xxhash64("user_id"), F.lit(7))),
            ["s"], "user_id",
        )
    )
    shuffled = merge_estimate(
        distinct_sketch(ev.repartition(13), ["event_type"], "user_id")
    )
    a = by_type.collect()[0]["distinct_est"]
    assert a == by_salt.collect()[0]["distinct_est"]
    assert a == shuffled.collect()[0]["distinct_est"]


def test_sketch_parquet_roundtrip_and_incremental_append(spark, tmp_path):
    """The storable-artifact contract: write per-group sketches, append a
    later batch's sketches, read everything back, union — equals sketching
    the union corpus directly; sketch bytes are tiny and cardinality-
    independent."""
    path = str(tmp_path / "sketches")
    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    half = F.pmod(F.xxhash64(F.col("user_id").cast("string")), F.lit(2))
    distinct_sketch(ev.filter(half == 0), ["day"], "user_id").write.parquet(
        path, mode="overwrite"
    )
    distinct_sketch(ev.filter(half == 1), ["day"], "user_id").write.mode(
        "append"
    ).parquet(path)

    stored = spark.read.parquet(path)
    got = merge_estimate(stored).collect()[0]["distinct_est"]
    want = merge_estimate(distinct_sketch(ev, ["day"], "user_id")).collect()[0][
        "distinct_est"
    ]
    assert got == want
    max_bytes = stored.select(F.max(F.length("sketch")).alias("m")).collect()[0]["m"]
    assert max_bytes < 1 << 14  # bounded regardless of input cardinality
