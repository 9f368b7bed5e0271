"""Streaming-surface keys in batch form over `events` (identical semantics:
window()/session_window() work in batch and are DuckDB-oracle-checkable; the
readStream/watermark/state variants live in streaming/events.py + tests).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from .oracles import ORACLES
from .common import _t
from .queries import query


@query("win_tumble")
def win_tumble(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type", "n", "sum_value",
        )
    )

ORACLES["win_tumble"] = """
SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start, event_type,
       count(*) AS n, round(sum(value), 2) AS sum_value
FROM events GROUP BY 1, 2
"""


@query("win_slide")
def win_slide(spark, sf_dir):
    """Sliding windows (10 min window, 5 min slide) — each event lands in 2
    windows; oracle = explicit 2-bucket expansion."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "n")
    )

ORACLES["win_slide"] = """
WITH expanded AS (
  SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start FROM events
  UNION ALL
  SELECT time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes' FROM events
)
SELECT window_start, count(*) AS n FROM expanded GROUP BY 1
"""


@query("win_session")
def win_session(spark, sf_dir):
    """Session windows (30-min gap) per user; oracle = gaps-and-islands."""
    e = _t(spark, sf_dir, "events")
    s = e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id").agg(
        F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value")
    )
    return s.select(
        "user_id", F.col("w.start").alias("session_start"), "n_events", "sum_value"
    )

ORACLES["win_session"] = """
WITH marked AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL '30 minutes'
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
), islands AS (
  SELECT user_id, ts, value,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
)
SELECT user_id, min(ts) AS session_start, count(*) AS n_events,
       round(sum(value), 2) AS sum_value
FROM islands GROUP BY user_id, sid
"""
