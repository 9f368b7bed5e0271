"""Relational operator surface: projections, filters, joins, aggregations,
windows, sorts, set ops (SURVEY.md §2 B-G) — each with a DuckDB oracle twin.

Conventions for exact oracle agreement:
- every computed column aliased identically in Spark and SQL
- integer aggregates cast to BIGINT on both sides (DuckDB sum(int)->HUGEINT)
- double aggregates rounded after aggregation; sums of 2-dp money values are
  exactly 2-dp so round(.,2) is collision-free; averages computed as
  round(sum,2)/count then rounded (identical IEEE division on both engines)
- deterministic tie-breaks on every window/top-k (unique key in ORDER BY)
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window
from pyspark.sql.functions import broadcast


from .oracles import ORACLES
from .queries import query


from .common import _t  # noqa: F401


# ---------------------------------------------------------------- B. filters

@query("project_basic")
def project_basic(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        # price(2dp) * (1-disc)(2dp) is exactly 4dp -> round(.,4) is
        # boundary-free (round(.,2) would hit engine-specific half cases)
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"),
        F.concat_ws("|", "l_returnflag", "l_linestatus").alias("flag"),
    )

ORACLES["project_basic"] = """
SELECT l_orderkey, l_linenumber,
       round(l_extendedprice * (1 - l_discount), 4) AS revenue,
       l_returnflag || '|' || l_linestatus AS flag
FROM lineitem
"""


@query("filter_regex")
def filter_regex(spark, sf_dir):
    """Predicate filter + regex filter/extract in ONE key (merged round 5
    to free a driver-window slot for dedup_minhash_pairs — the r2
    agg_stats pattern: both original operators still run, tagged)."""
    d = _t(spark, sf_dir, "documents")
    lang = d.filter((F.col("lang") == "en") & (F.col("n_chars") > 200)).select(
        F.lit("lang").alias("kind"), "doc_id", F.col("lang").alias("val")
    )
    rx = d.filter(F.col("text").rlike("join [a-z]+ merge")).select(
        F.lit("regex").alias("kind"),
        "doc_id",
        F.regexp_extract("text", "join [a-z]+ merge", 0).alias("val"),
    )
    return lang.unionByName(rx)

ORACLES["filter_regex"] = """
SELECT 'lang' AS kind, doc_id, lang AS val
FROM documents WHERE lang = 'en' AND n_chars > 200
UNION ALL
SELECT 'regex', doc_id, regexp_extract(text, 'join [a-z]+ merge')
FROM documents WHERE regexp_matches(text, 'join [a-z]+ merge')
"""


@query("dedup_url")
def dedup_url(spark, sf_dir):
    """Deterministic latest-row-per-key (the per-url dedup invariant,
    applied to orders/custkey on driver tables)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate")
    )

ORACLES["dedup_url"] = """
SELECT o_custkey, o_orderkey, o_orderdate
FROM (SELECT o_custkey, o_orderkey, o_orderdate,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate DESC, o_orderkey DESC) rn
      FROM orders) t
WHERE rn = 1
"""


# ------------------------------------------------------------------ C. joins

@query("join_broadcast")
def join_broadcast(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_custs"),
            (F.round(F.sum("c_acctbal"), 2) / F.count("*")).alias("avg_bal_raw"),
        )
        .select("r_name", "n_custs", F.round("avg_bal_raw", 6).alias("avg_bal"))
    )

ORACLES["join_broadcast"] = """
SELECT r_name, count(*) AS n_custs,
       round(round(sum(c_acctbal), 2) / count(*), 6) AS avg_bal
FROM customer JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


@query("join_left")
def join_left(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    return o.join(c, o["o_custkey"] == c["c_custkey"], "left").select(
        "o_orderkey", "c_name"
    )

ORACLES["join_left"] = """
SELECT o_orderkey, c_name
FROM orders LEFT JOIN (SELECT * FROM customer WHERE c_mktsegment = 'BUILDING') c
ON o_custkey = c_custkey
"""


@query("join_semi_anti")
def join_semi_anti(spark, sf_dir):
    """left_semi + left_anti joins in ONE key (merged round 5 to free a
    driver-window slot for dedup_simhash_pairs): both physical join types
    still execute, outputs tagged and unioned."""
    c = _t(spark, sf_dir, "customer")
    o_big = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    o = _t(spark, sf_dir, "orders")
    semi = c.join(o_big, c["c_custkey"] == o_big["o_custkey"], "left_semi").select(
        F.lit("semi").alias("kind"), "c_custkey", "c_name"
    )
    anti = c.join(o, c["c_custkey"] == o["o_custkey"], "left_anti").select(
        F.lit("anti").alias("kind"), "c_custkey", "c_name"
    )
    return semi.unionByName(anti)

ORACLES["join_semi_anti"] = """
SELECT 'semi' AS kind, c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_totalprice > 100000)
UNION ALL
SELECT 'anti', c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


@query("pairs_selfjoin")
def pairs_selfjoin(spark, sf_dir):
    """Within-group pair generation (mention-pair candidate pattern)."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber")
    a = li.toDF("l_orderkey", "ln_a")
    b = li.toDF("l_orderkey", "ln_b")
    return a.join(b, "l_orderkey").filter(F.col("ln_a") < F.col("ln_b"))

ORACLES["pairs_selfjoin"] = """
SELECT a.l_orderkey, a.l_linenumber AS ln_a, b.l_linenumber AS ln_b
FROM lineitem a JOIN lineitem b
ON a.l_orderkey = b.l_orderkey AND a.l_linenumber < b.l_linenumber
"""


@query("join_interval")
def join_interval(spark, sf_dir):
    """Overlapping-interval join: orders of one customer whose 30-day windows
    overlap (span-overlap pattern)."""
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderdate")
    a = o.toDF("ck", "ok_a", "d_a")
    b = o.toDF("ck", "ok_b", "d_b")
    return (
        a.join(b, "ck")
        .filter(
            (F.col("ok_a") < F.col("ok_b"))
            & (F.col("d_a") < F.col("d_b") + F.expr("INTERVAL 30 DAYS"))
            & (F.col("d_b") < F.col("d_a") + F.expr("INTERVAL 30 DAYS"))
        )
        .select("ck", "ok_a", "ok_b")
    )

ORACLES["join_interval"] = """
SELECT a.o_custkey AS ck, a.o_orderkey AS ok_a, b.o_orderkey AS ok_b
FROM orders a JOIN orders b ON a.o_custkey = b.o_custkey
WHERE a.o_orderkey < b.o_orderkey
  AND a.o_orderdate < b.o_orderdate + INTERVAL 30 DAY
  AND b.o_orderdate < a.o_orderdate + INTERVAL 30 DAY
"""


@query("join_asof")
def join_asof(spark, sf_dir):
    """As-of join: latest event at-or-before each order's synthetic 2024
    timestamp for the order's user bucket, through the SORT-based operator
    (union sides -> one window per key -> last_value carry-forward) — the
    scale-safe formulation; the rank path is cross-checked in pytest."""
    from ..operators.relational import asof_join

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_custkey") % 150).alias("uk"),
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_interval(secs=(F.col("o_orderkey") % 2592000).cast("double"))
        ).alias("ts_o"),
    )
    e = _t(spark, sf_dir, "events").select("event_id", F.col("user_id").alias("uk"), "ts")
    return asof_join(
        o, e, on="uk", left_ts="ts_o", right_ts="ts",
        tie_breaker="event_id", strategy="sort",
    ).select("o_orderkey", "event_id", "ts")

ORACLES["join_asof"] = """
WITH o AS (
  SELECT o_orderkey, o_custkey % 150 AS uk,
         TIMESTAMP '2024-01-01 00:00:00'
           + to_seconds(CAST(o_orderkey % 2592000 AS BIGINT)) AS ts_o
  FROM orders
), j AS (
  SELECT o.o_orderkey, e.event_id, e.ts,
         row_number() OVER (PARTITION BY o.o_orderkey
                            ORDER BY e.ts DESC, e.event_id DESC) rn
  FROM o JOIN events e ON e.user_id = o.uk AND e.ts <= o.ts_o
)
SELECT o_orderkey, event_id, ts FROM j WHERE rn = 1
"""


@query("join_bnl")
def join_bnl(spark, sf_dir):
    """Pure theta join (no equi key) -> broadcast nested loop."""
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return n.join(broadcast(r), n["n_name"] < r["r_name"]).select("n_name", "r_name")

ORACLES["join_bnl"] = """
SELECT n_name, r_name FROM nation JOIN region ON n_name < r_name
"""


# ------------------------------------------------------------- D. aggregates

@query("agg_approx")
def agg_approx(spark, sf_dir):
    """Approximate distinct counting, both faces (HLL state differs across
    engines -> no oracle; driver records rows-only):
    - approx_count_distinct: the one-shot HLL++ estimate;
    - a MERGEABLE DataSketches HLL sketch (functions/sketches.py) with its
      estimate — the store-per-batch / union-later incremental pattern a
      10^12-row pipeline needs (associativity, parquet roundtrip and
      accuracy pinned in tests/test_sketches.py)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", 0.02).alias("approx_orders"),
        F.hll_sketch_estimate(F.hll_sketch_agg("l_orderkey")).alias(
            "sketch_orders"
        ),
    )


@query("agg_collect")
def agg_collect(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.array_join(F.array_sort(F.collect_set("o_orderstatus")), ",").alias("statuses")
    )

ORACLES["agg_collect"] = """
SELECT o_orderpriority,
       string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses
FROM orders GROUP BY o_orderpriority
"""


@query("agg_rollup")
def agg_rollup(spark, sf_dir):
    """Rollup + cube + grouping_id in ONE key (SURVEY §2 row 25; merged
    round 2 so every oracle-bearing key fits the driver's 50-key window):
    both grouping-set families tagged by `mode` and unioned — same partial
    +final hash-agg physical shape, one shuffle each."""
    li = _t(spark, sf_dir, "lineitem")

    def one(grouped, mode):
        return (
            grouped.agg(
                F.count("*").alias("n"),
                F.grouping_id().cast("bigint").alias("gid"),
            )
            .select(
                F.lit(mode).alias("mode"),
                F.coalesce("l_returnflag", F.lit("ALL")).alias("l_returnflag"),
                F.coalesce("l_linestatus", F.lit("ALL")).alias("l_linestatus"),
                "n",
                "gid",
            )
        )

    return one(li.rollup("l_returnflag", "l_linestatus"), "rollup").unionByName(
        one(li.cube("l_returnflag", "l_linestatus"), "cube")
    )

ORACLES["agg_rollup"] = """
SELECT 'rollup' AS mode,
       coalesce(l_returnflag, 'ALL') AS l_returnflag,
       coalesce(l_linestatus, 'ALL') AS l_linestatus,
       count(*) AS n,
       CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT) AS gid
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
UNION ALL
SELECT 'cube' AS mode,
       coalesce(l_returnflag, 'ALL') AS l_returnflag,
       coalesce(l_linestatus, 'ALL') AS l_linestatus,
       count(*) AS n,
       CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT) AS gid
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
"""


@query("agg_stats")
def agg_stats(spark, sf_dir):
    """Hash aggregate + count-distinct + stats aggregates in ONE key
    (SURVEY §2 rows 21, 22, 26; merged round 2 — one shuffle, partial agg
    map-side, the distinct rewritten by Spark into a two-phase expand)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n_rows"),
            F.countDistinct("l_orderkey").alias("n_orders"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
            F.min("l_quantity").alias("min_qty"),
            F.max("l_quantity").alias("max_qty"),
            F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        )
        .select(
            "l_returnflag", "l_linestatus", "n_rows", "n_orders",
            "sum_qty", "sum_price", "min_qty", "max_qty", "sd_qty",
            F.round(F.col("sum_qty") / F.col("n_rows"), 6).alias("avg_qty"),
        )
    )

ORACLES["agg_stats"] = """
SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
       count(DISTINCT l_orderkey) AS n_orders,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_price,
       min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
       round(stddev_samp(l_quantity), 4) AS sd_qty,
       round(round(sum(l_quantity), 2) / count(*), 6) AS avg_qty
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------- E. windows

@query("win_frame")
def win_frame(spark, sf_dir):
    """lag/lead AND frame-spec aggregate in ONE key (SURVEY §2 rows 29, 30;
    merged round 4 to free a driver-window slot for mm_meta): one window
    shuffle (user_id, ordered ts/event_id) computes the lag delta, a lead
    peek, and the bounded-frame rolling sum."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wf = w.rowsBetween(-3, Window.currentRow)
    return e.select(
        "event_id",
        F.round(F.col("value") - F.lag("value").over(w), 2).alias("delta"),
        F.round(F.lead("value", 2).over(w), 2).alias("lead2"),
        F.round(F.sum("value").over(wf), 2).alias("roll_sum"),
    )

ORACLES["win_frame"] = """
SELECT event_id,
       round(value - lag(value) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id), 2) AS delta,
       round(lead(value, 2) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id), 2) AS lead2,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 2)
         AS roll_sum
FROM events
"""


@query("win_topk")
def win_topk(spark, sf_dir):
    """Top-k per group + the whole rank family in ONE key (SURVEY §2
    rows 28, 31; merged round 2; the standalone win_rownum key folded in
    round 5 — row_number + its top-k filter both execute right here — to
    free the driver-window slot for ann_lsh's new exact oracle): one
    window shuffle computes row_number/rank/dense_rank/ntile/percent_rank/
    cume_dist, then the row_number filter takes the per-group top-5."""
    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return (
        c.select(
            "c_custkey",
            "c_nationkey",
            F.row_number().over(w).cast("bigint").alias("rn"),
            F.rank().over(w).cast("bigint").alias("rnk"),
            F.dense_rank().over(w).cast("bigint").alias("drnk"),
            F.ntile(4).over(w).cast("bigint").alias("quartile"),
            F.round(F.percent_rank().over(w), 6).alias("pr"),
            F.round(F.cume_dist().over(w), 6).alias("cd"),
        )
        .filter(F.col("rn") <= 5)
    )

ORACLES["win_topk"] = """
SELECT c_custkey, c_nationkey, rn, rnk, drnk, quartile, pr, cd
FROM (SELECT c_custkey, c_nationkey,
             CAST(row_number() OVER w AS BIGINT) AS rn,
             CAST(rank() OVER w AS BIGINT) AS rnk,
             CAST(dense_rank() OVER w AS BIGINT) AS drnk,
             CAST(ntile(4) OVER w AS BIGINT) AS quartile,
             round(percent_rank() OVER w, 6) AS pr,
             round(cume_dist() OVER w, 6) AS cd
      FROM customer
      WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)) t
WHERE rn <= 5
"""


# ----------------------------------------------------------- F. sorts/limits

@query("topk_global")
def topk_global(spark, sf_dir):
    """Global sort + limit + global top-k in ONE key (SURVEY §2 rows 32-34;
    merged round 2). orderBy+limit compiles to TakeOrderedAndProject — no
    full global sort is materialized."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
        .limit(100)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
    )

ORACLES["topk_global"] = """
SELECT l_orderkey, l_linenumber, l_extendedprice
FROM lineitem ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100
"""


# -------------------------------------------------------------- G. set ops

@query("set_ops")
def set_ops(spark, sf_dir):
    """UNION / INTERSECT / EXCEPT in ONE key (SURVEY §2 rows 35-37; merged
    round 2), each branch tagged by `op` so all three distinct physical
    strategies (agg-dedup union, left-semi intersect, left-anti except)
    land in one checked result."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    u = c.unionByName(s).distinct().select(F.lit("union").alias("op"), "nk")
    i = c.intersect(s).select(F.lit("intersect").alias("op"), "nk")
    x = (
        c.distinct()
        .exceptAll(s.distinct())
        .select(F.lit("except").alias("op"), "nk")
    )
    return u.unionByName(i).unionByName(x)

ORACLES["set_ops"] = """
SELECT 'union' AS op, nk FROM
  (SELECT c_nationkey AS nk FROM customer UNION SELECT s_nationkey FROM supplier)
UNION ALL
SELECT 'intersect' AS op, nk FROM
  (SELECT c_nationkey AS nk FROM customer INTERSECT SELECT s_nationkey FROM supplier)
UNION ALL
SELECT 'except' AS op, nk FROM
  (SELECT DISTINCT c_nationkey AS nk FROM customer
   EXCEPT SELECT DISTINCT s_nationkey FROM supplier)
"""


# ----------------------------------------------------- extended coverage

@query("agg_pivot")
def agg_pivot(spark, sf_dir):
    """Pivot (long->wide conditional aggregation)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .pivot("o_orderpriority",
               ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"])
        .count()
        .select(
            "o_orderstatus",
            F.coalesce(F.col("1-URGENT"), F.lit(0)).alias("p1"),
            F.coalesce(F.col("2-HIGH"), F.lit(0)).alias("p2"),
            F.coalesce(F.col("3-MEDIUM"), F.lit(0)).alias("p3"),
            F.coalesce(F.col("4-NOT SPECIFIED"), F.lit(0)).alias("p4"),
            F.coalesce(F.col("5-LOW"), F.lit(0)).alias("p5"),
        )
    )

ORACLES["agg_pivot"] = """
SELECT o_orderstatus,
       count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS p1,
       count(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS p2,
       count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS p3,
       count(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS p4,
       count(*) FILTER (WHERE o_orderpriority = '5-LOW') AS p5
FROM orders GROUP BY o_orderstatus
"""


@query("tpch_q3ish")
def tpch_q3ish(spark, sf_dir):
    """TPC-H Q3-shaped 3-way join + aggregation + top-k. Revenue summed in
    exact integer 1e-4 units (product doubles are engine-identical; only the
    SUM order differs, so quantize-then-sum is cross-engine exact)."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    rev_q = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000.0, 0
    ).cast("bigint")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"], "left_semi")
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg((F.sum(rev_q) / 10000.0).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(20)
    )

ORACLES["tpch_q3ish"] = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000.0)
                AS BIGINT)) AS BIGINT) / 10000.0 AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE EXISTS (SELECT 1 FROM customer
              WHERE c_custkey = o_custkey AND c_mktsegment = 'BUILDING')
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey LIMIT 20
"""
