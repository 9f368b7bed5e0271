"""Mergeable distinct-count sketches (Apache DataSketches HLL, built into
Spark 4 as hll_sketch_agg / hll_union_agg / hll_sketch_estimate).

Why this exists next to approx_count_distinct: at 10^12-row scale the
incremental pattern is never "recount history" — it is "keep a SKETCH per
partition-of-time (day/crawl/batch), store it as a binary column, and
union sketches at query time". approx_count_distinct gives one estimate
and throws the state away; these helpers keep the state:

    daily = distinct_sketch(events, ["day"], "user_id")   # one binary/day
    daily.write.parquet(".../sketches", mode="append")    # tiny artifact
    merge_estimate(spark.read.parquet(".../sketches"))    # any date range,
                                                          # never rescans
Properties that make this safe at scale (pytest-pinned in
tests/test_sketches.py): merging is associative + commutative (any
partitioning / merge order gives the same estimate), a sketch
parquet-roundtrips byte-stably, and the estimate tracks exact
count_distinct within HLL error (~1.6% at lgConfigK=12 default).

All JVM-side aggregates — no Python in the loop, ordinary shuffles with
map-side partial aggregation; a sketch is ~2^lgConfigK bytes regardless
of input cardinality.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def distinct_sketch(
    df: DataFrame,
    group_cols: list[str],
    val_col: str,
    lg_config_k: int = 12,
) -> DataFrame:
    """(group_cols..., sketch binary): one mergeable HLL sketch of
    val_col's distinct values per group — the storable artifact."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(F.col(val_col), F.lit(lg_config_k)).alias("sketch")
    )


def merge_estimate(
    sketches: DataFrame,
    group_cols: list[str] | None = None,
    sketch_col: str = "sketch",
) -> DataFrame:
    """Union stored sketches (optionally per group) -> distinct-count
    estimate. Unioning N daily sketches costs O(N * sketch bytes) — the
    original rows are never touched again."""
    agg = [
        F.hll_sketch_estimate(F.hll_union_agg(F.col(sketch_col))).alias(
            "distinct_est"
        )
    ]
    if group_cols:
        return sketches.groupBy(*group_cols).agg(*agg)
    return sketches.agg(*agg)
