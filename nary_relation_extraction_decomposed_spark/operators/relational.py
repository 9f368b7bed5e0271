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


ASOF_RANK_MAX_PER_KEY = 64  # auto-dispatch: rank path only below this


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    tie_breaker: str | None = None,
    strategy: str = "auto",
) -> DataFrame:
    """For each left row, the single right row with the greatest right_ts
    <= left_ts (backward; 'forward' = smallest >=), within `on` groups.
    Inner semantics: left rows with no eligible right row are dropped.

    Two physical strategies, identical results:

    - 'rank': equi-join on `on` + ts inequality, then row_number pick.
      Fine when the right side is dictionary-sized per key, but the join
      materializes every (left row x all earlier right rows) pair first —
      a per-key QUADRATIC at web scale with long snapshot histories.
    - 'sort': union both sides tagged, ONE window sort per key, carry the
      last-seen right row forward (last_value ignorenulls). Work is
      O((|L|+|R|) log) per key with no fan-out — the scale-safe form.
    - 'auto': one lightweight count job estimates max right rows per key
      (map-side partial agg, tiny shuffle) and picks 'rank' below
      ASOF_RANK_MAX_PER_KEY, else 'sort'. Pass an explicit strategy to
      skip the probe job.

    Deterministic given a tie_breaker column (ties on right_ts resolve to
    the greatest tie_breaker). At scale prefer bucketing both sides on
    `on` so the shuffle is co-located; AQE splits skewed keys.

    One semantic edge where the strategies differ: EXACT duplicate left
    rows. The rank path windows over all left columns, so duplicates
    collapse to one output row; the sort path keeps each duplicate (each
    gets the same match) — the more faithful reading of per-row as-of.
    With any unique left key (every real caller here) they are identical,
    which is what the equivalence pytest pins."""
    if strategy == "auto":
        mx = (
            right.groupBy(on).agg(F.count("*").alias("_c"))
            .agg(F.max("_c")).first()[0]
        )
        strategy = "rank" if (mx or 0) <= ASOF_RANK_MAX_PER_KEY else "sort"
    if strategy == "rank":
        return _asof_join_rank(
            left, right, on, left_ts, right_ts, direction, tie_breaker
        )
    if strategy == "sort":
        return _asof_join_sorted(
            left, right, on, left_ts, right_ts, direction, tie_breaker
        )
    raise ValueError(f"unknown asof strategy {strategy!r}")


def _asof_join_rank(
    left, right, on, left_ts, right_ts, direction, tie_breaker
) -> DataFrame:
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


def _asof_join_sorted(
    left, right, on, left_ts, right_ts, direction, tie_breaker
) -> DataFrame:
    """Sort-merge formulation: tag sides, one window per key ordered so
    every left row is immediately preceded by its eligible right rows,
    carry the latest right row forward as a struct, unpack.

    Ordering proof sketch (backward): order by (ts ASC, side ASC[right=0
    first], tie ASC); last(right_struct) before a left row = the right row
    with max right_ts <= left_ts (equality included because right sorts
    before left at equal ts), ties resolved to max tie_breaker (last in
    ASC tie order) — exactly the rank path's (ts DESC, tie DESC) pick."""
    lcols = left.columns
    rcols = [c for c in right.columns if c != on]
    clash = set(rcols) & set(lcols)
    if clash:
        raise ValueError(f"asof 'sort' strategy needs disjoint columns: {clash}")

    l_tag = left.filter(F.col(left_ts).isNotNull()).select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*lcols).alias("_l"),
        F.lit(None).cast(
            right.select(F.struct(*rcols).alias("s")).schema["s"].dataType
        ).alias("_r"),
    )
    r_tag = right.filter(F.col(right_ts).isNotNull()).select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            left.select(F.struct(*lcols).alias("s")).schema["s"].dataType
        ).alias("_l"),
        F.struct(*rcols).alias("_r"),
    )
    ts_ord = F.col("_ts").asc() if direction == "backward" else F.col("_ts").desc()
    order = [ts_ord, F.col("_side").asc()]
    if tie_breaker:
        order.append(F.col("_r")[tie_breaker].asc_nulls_first())
    w = (
        Window.partitionBy("_k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        l_tag.unionByName(r_tag)
        .withColumn("_match", F.last("_r", ignorenulls=True).over(w))
        .filter((F.col("_side") == 1) & F.col("_match").isNotNull())
    )
    return carried.select(
        *[F.col("_l")[c].alias(c) for c in lcols],
        *[F.col("_match")[c].alias(c) for c in rcols],
    )


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

    EXACT countDistinct semantics, including NULLs: phase 2 counts
    count(val) — not count(*) — over the distinct (group, val) rows, so a
    NULL val never counts as a value, while the (group, NULL) row that
    distinct keeps still materializes a group whose vals are ALL NULL with
    n_distinct = 0 (groupBy+countDistinct parity; a NULL-filter-first
    variant would drop such groups entirely, silently losing them for any
    caller that joins on the result). The extra NULL row is at most one
    per group and partially deduped map-side."""
    return (
        df.select(*group_cols, val_col)
        .distinct()
        .groupBy(*group_cols)
        .agg(F.count(val_col).alias("n_distinct"))
    )
