"""operators/relational.py composites: as-of, interval overlap, top-k,
latest-per-key, salted count — semantics checked against straightforward
reference computations."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from nary_relation_extraction_decomposed_spark.operators import relational as R

SF = "/root/testdata/sf0.001"


def test_asof_join_backward(spark):
    orders = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select(
            "o_orderkey",
            (F.col("o_custkey") % 150).alias("user_id"),
            (
                F.to_timestamp(F.lit("2024-01-15 00:00:00"))
                + F.make_interval(secs=(F.col("o_orderkey") % 1000000).cast("double"))
            ).alias("ts_o"),
        )
        .limit(200)
    )
    events = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_id", "user_id", "ts"
    )
    got = R.asof_join(
        orders, events, on="user_id", left_ts="ts_o", right_ts="ts",
        tie_breaker="event_id",
    )
    rows = got.collect()
    assert rows
    ev = [(r["user_id"], r["ts"], r["event_id"]) for r in events.collect()]
    by_order = {
        r["o_orderkey"]: (r["user_id"], r["ts_o"]) for r in orders.collect()
    }
    for r in rows:
        uid, ts_o = by_order[r["o_orderkey"]]
        cands = [(t, e) for (u, t, e) in ev if u == uid and t <= ts_o]
        assert cands, r
        best = max(cands)
        assert (r["ts"], r["event_id"]) == best


def test_asof_sort_equals_rank(spark):
    """The sort-based carry-forward formulation must reproduce the rank
    path exactly (both directions, with ties on right_ts)."""
    orders = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select(
            "o_orderkey",
            (F.col("o_custkey") % 150).alias("user_id"),
            (
                F.to_timestamp(F.lit("2024-01-15 00:00:00"))
                + F.make_interval(secs=(F.col("o_orderkey") % 1000000).cast("double"))
            ).alias("ts_o"),
        )
        .limit(300)
    )
    events = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_id", "user_id", "ts"
    )
    for direction in ("backward", "forward"):
        a = R.asof_join(orders, events, "user_id", "ts_o", "ts",
                        direction=direction, tie_breaker="event_id",
                        strategy="rank")
        b = R.asof_join(orders, events, "user_id", "ts_o", "ts",
                        direction=direction, tie_breaker="event_id",
                        strategy="sort")
        ra = sorted(map(tuple, a.select(*sorted(a.columns)).collect()))
        rb = sorted(map(tuple, b.select(*sorted(b.columns)).collect()))
        assert ra == rb and ra, direction


def test_asof_tie_breaking_equivalence(spark):
    """Deliberate right_ts ties (3 snapshots at the same timestamp): both
    strategies must pick the greatest tie_breaker, both directions."""
    left = spark.createDataFrame(
        [("k", 10, 1), ("k", 5, 2), ("k", 4, 3)], "k string, lts int, lid int"
    )
    right = spark.createDataFrame(
        [("k", 5, 100), ("k", 5, 101), ("k", 5, 102), ("k", 8, 200)],
        "k string, rts int, rid int",
    )
    for direction, want in (("backward", {1: 200, 2: 102, 3: None}),
                            ("forward", {1: None, 2: 102, 3: 102})):
        for strat in ("rank", "sort"):
            got = {
                r["lid"]: r["rid"]
                for r in R.asof_join(left, right, "k", "lts", "rts",
                                     direction=direction, tie_breaker="rid",
                                     strategy=strat).collect()
            }
            expect = {k: v for k, v in want.items() if v is not None}
            assert got == expect, (direction, strat, got)


def test_asof_sort_survives_long_history_key(spark):
    """10k snapshots on ONE key: the rank path would materialize ~left x
    right/2 pairs (quadratic per key); the sort path is one window pass.
    Also pins auto-dispatch: a long-history right side routes to 'sort'."""
    left = spark.range(0, 2000).select(
        F.lit("k").alias("k"), F.col("id").alias("lid"),
        (F.col("id") * 5 + 3).alias("lts"),
    )
    right = spark.range(0, 10_000).select(
        F.lit("k").alias("k"), F.col("id").alias("rid"),
        F.col("id").alias("rts"),
    )
    got = R.asof_join(left, right, "k", "lts", "rts",
                      tie_breaker="rid", strategy="sort").collect()
    assert len(got) == 2000
    for r in got:
        assert r["rts"] == r["lts"] and r["rid"] == r["lts"]  # exact floor hit
    # auto picks the sort path for this shape (>64 rows/key)
    auto = R.asof_join(left.limit(50), right, "k", "lts", "rts",
                       tie_breaker="rid", strategy="auto")
    assert auto.count() == 50


def test_interval_overlap_join(spark):
    o = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_custkey", "o_orderkey",
        F.col("o_orderdate").alias("s"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("e"),
    )
    a = o.toDF("ck", "ok_a", "s_a", "e_a")
    b = o.toDF("ck", "ok_b", "s_b", "e_b")
    got = (
        R.interval_overlap_join(a, b, "ck", "s_a", "e_a", "s_b", "e_b")
        .filter(F.col("ok_a") < F.col("ok_b"))
        .count()
    )
    want = (
        a.join(b, "ck")
        .filter(
            (F.col("ok_a") < F.col("ok_b"))
            & (F.col("s_a") < F.col("e_b"))
            & (F.col("s_b") < F.col("e_a"))
        )
        .count()
    )
    assert got == want > 0


def test_topk_and_latest(spark):
    c = spark.read.parquet(f"{SF}/customer.parquet")
    top2 = R.topk_per_group(
        c, ["c_nationkey"], [F.col("c_acctbal").desc(), F.col("c_custkey")], 2
    )
    assert top2.groupBy("c_nationkey").count().agg(F.max("count")).first()[0] <= 2
    latest = R.latest_per_key(
        c, "c_nationkey", [F.col("c_acctbal").desc(), F.col("c_custkey")]
    )
    assert latest.count() == c.select("c_nationkey").distinct().count()


def test_count_distinct_skewsafe_matches_plain_on_skew(spark):
    """On a deliberately skewed key (one group holds ~90% of rows) the
    two-phase distinct-then-count must equal countDistinct exactly."""
    d = spark.range(0, 50_000).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot")).otherwise(
            F.concat(F.lit("cold"), (F.col("id") % 97).cast("string"))
        ).alias("domain"),
        (F.col("id") % 12345).alias("url_id"),
    )
    got = {
        r["domain"]: r["n_distinct"]
        for r in R.count_distinct_skewsafe(d, ["domain"], "url_id").collect()
    }
    want = {
        r["domain"]: r["n"]
        for r in d.groupBy("domain").agg(F.countDistinct("url_id").alias("n")).collect()
    }
    assert got == want and got["hot"] > 10_000


def test_count_distinct_skewsafe_ignores_nulls(spark):
    """countDistinct ignores NULLs; the two-phase form must too (it used to
    count NULL as one extra distinct value per group containing one)."""
    d = spark.createDataFrame(
        [("a", 1), ("a", 1), ("a", None), ("b", None), ("b", 2), ("c", 3)],
        "grp string, v int",
    )
    got = {
        r["grp"]: r["n_distinct"]
        for r in R.count_distinct_skewsafe(d, ["grp"], "v").collect()
    }
    assert got == {"a": 1, "b": 1, "c": 1}


def test_count_distinct_skewsafe_keeps_all_null_groups(spark):
    """groupBy+countDistinct emits a group whose vals are ALL NULL with 0;
    the skew-safe form must too (a NULL-filter-first variant dropped such
    groups entirely — a caller joining on the result silently lost them)."""
    d = spark.createDataFrame(
        [("a", 1), ("allnull", None), ("allnull", None), ("b", 2)],
        "grp string, v int",
    )
    got = {
        r["grp"]: r["n_distinct"]
        for r in R.count_distinct_skewsafe(d, ["grp"], "v").collect()
    }
    want = {
        r["grp"]: r["n"]
        for r in d.groupBy("grp").agg(F.countDistinct("v").alias("n")).collect()
    }
    assert got == want == {"a": 1, "allnull": 0, "b": 1}


def test_salted_count_matches_plain(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet")
    got = {
        (r["lang"],): r["n"]
        for r in R.salted_count(d, ["lang"], "doc_id", nsalt=8).collect()
    }
    want = {
        (r["lang"],): r["count"] for r in d.groupBy("lang").count().collect()
    }
    assert got == want
