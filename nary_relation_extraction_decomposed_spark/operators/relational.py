"""Reusable relational composites Spark has no single operator for:
as-of join, interval-overlap join, top-k per group, deterministic
latest-per-key, two-phase salted aggregation.

These are the generic forms of the patterns the KG pipeline and the
queries() registry use; each is a plain DataFrame->DataFrame function so
Catalyst sees the whole plan (no UDFs, no collect)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from ..functions.hashing import salt_expr


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    tie_breaker: str | None = None,
) -> DataFrame:
    """For each left row, the single right row with the greatest right_ts
    <= left_ts (backward; 'forward' = smallest >=), within `on` groups.

    Composition: equi-join on `on` + ts inequality, then row_number pick.
    Deterministic given a tie_breaker column. At scale prefer bucketing both
    sides on `on` so the equi-join is co-located; AQE splits skewed keys."""
    lcols = left.columns
    cond = (left[on] == right[on]) & (
        (right[right_ts] <= left[left_ts])
        if direction == "backward"
        else (right[right_ts] >= left[left_ts])
    )
    j = left.join(right, cond, "inner").drop(right[on])
    order = [
        F.col(right_ts).desc() if direction == "backward" else F.col(right_ts).asc()
    ]
    if tie_breaker:
        order.append(F.col(tie_breaker).desc())
    w = Window.partitionBy(*[F.col(c) for c in lcols]).orderBy(*order)
    return j.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    on: str,
    a_start: str,
    a_end: str,
    b_start: str,
    b_end: str,
) -> DataFrame:
    """Pairs within `on` groups whose [start, end) intervals overlap —
    equi key bounds the fan-out, the range residual filters post-join."""
    return a.join(b, on).filter(
        (F.col(a_start) < F.col(b_end)) & (F.col(b_start) < F.col(a_end))
    )


def topk_per_group(
    df: DataFrame, group_cols: list[str], order_cols: list[Column], k: int
) -> DataFrame:
    """Deterministic top-k per group (callers must include a unique
    tie-breaker in order_cols)."""
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn("_rnk", F.row_number().over(w))
        .filter(F.col("_rnk") <= k)
        .drop("_rnk")
    )


def latest_per_key(df: DataFrame, key: str, order_cols: list[Column]) -> DataFrame:
    """Exactly one row per key — explicit ordering, never dropDuplicates."""
    return topk_per_group(df, [key], order_cols, 1)


def salted_count(
    df: DataFrame, group_cols: list[str], salt_source: str, nsalt: int = 16
) -> DataFrame:
    """Two-phase salted count for skewed group keys: phase 1 aggregates
    (group, salt) — hot groups spread over nsalt reducers — phase 2 merges.
    Content-derived salt keeps reruns identical (kill-resume invariant)."""
    salted = df.withColumn("_salt", salt_expr(salt_source, nsalt))
    partial = salted.groupBy(*group_cols, "_salt").agg(F.count("*").alias("_c"))
    return partial.groupBy(*group_cols).agg(F.sum("_c").alias("n"))


def count_distinct_skewsafe(
    df: DataFrame, group_cols: list[str], val_col: str
) -> DataFrame:
    """countDistinct(val) per group for SKEWED group keys, without ever
    gathering a hot group on one reducer: phase 1 dedups (group, val) —
    the shuffle key includes val, so a hot group's rows spread across
    reducers exactly like a salted key, with no salt column to carry —
    phase 2 counts per group with map-side partial aggregation (at most
    one partial row per group per partition). This is the generic form of
    the triple-support counter (operators/triples.py); a plain
    groupBy(group).agg(countDistinct(val)) plans an expand + full shuffle
    ON THE GROUP KEY, which a single hot domain at web scale overwhelms.
    NULL vals are filtered first so the result matches countDistinct
    exactly (count(*) over distinct rows would count NULL as a value);
    the one remaining difference: a group whose vals are ALL NULL is
    absent here, where countDistinct emits it with 0."""
    return (
        df.select(*group_cols, val_col)
        .filter(F.col(val_col).isNotNull())
        .distinct()
        .groupBy(*group_cols)
        .agg(F.count("*").alias("n_distinct"))
    )
