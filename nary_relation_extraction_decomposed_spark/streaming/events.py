"""Structured Streaming surface over the events table (SURVEY.md §2 I).

The KG pipeline itself is batch-with-checkpoints (matching the reference's
batch nature); this module is the engine's streaming face: file-source
ingestion, watermarked tumbling/sliding aggregation, session windows,
exactly-once dedup under late data, and an arbitrary-stateful running
aggregate. Batch twins of the window semantics are oracle-checked as
win_tumble / win_slide / win_session; tests drive these with availableNow
triggers over parquet directories.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)


def read_events_stream(spark: SparkSession, path: str, max_files: int = 10) -> DataFrame:
    """File-based streaming source (schema pinned; one-file-per-trigger keeps
    backpressure bounded in tests; at scale this is Kafka/queue-backed)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def tumbling_counts(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Watermarked 5-minute tumbling counts per event_type (append-safe)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
    )


def session_counts(events: DataFrame, gap: str = "30 minutes",
                   watermark: str = "1 hour") -> DataFrame:
    """Watermarked session windows per user."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events")
    )


def dedup_within_watermark(events: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Exactly-once event ids under late/replayed data: state is bounded by
    the watermark (vs unbounded dropDuplicates)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def running_user_totals(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Arbitrary stateful op: per-user running (n, total) via
    applyInPandasWithState — the custom-stateful-operator seam."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "user_id bigint, n bigint, total double"
    state_schema = "n bigint, total double"

    def fn(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n": [n], "total": [round(total, 2)]}
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
        )
    )


def running_user_totals_tws(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Spark 4 transformWithStateInPandas twin of running_user_totals: the
    new arbitrary-stateful API (typed ValueState, RocksDB state store).
    Same semantics — per-user running (n, total) emitted on every update —
    so tests cross-check the two APIs row-for-row. Requires
    spark.sql.streaming.stateStore.providerClass=RocksDBStateStoreProvider
    (set by the caller/test; the provider ships with Spark core) AND the
    google.protobuf Python package (the state-server wire protocol) — the
    latter is absent in this sandbox, so the test is skipif-gated; the
    applyInPandasWithState twin above is the sandbox-verified path."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    out_schema = "user_id bigint, n bigint, total double"

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState("agg", "n long, total double")

        def handleInputRows(self, key, rows, timerValues):
            cur = self._agg.get() if self._agg.exists() else None
            n, total = (cur[0], cur[1]) if cur is not None else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._agg.update((n, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n": [n], "total": [round(total, 2)]}
            )

        def close(self) -> None:
            pass

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .transformWithStateInPandas(
            RunningTotals(),
            outputStructType=out_schema,
            outputMode="Update",
            timeMode="None",
        )
    )


def run_to_memory_sink(stream_df: DataFrame, name: str, checkpoint_dir: str,
                       output_mode: str = "append"):
    """Drive a streaming DataFrame to completion over existing files
    (availableNow) into an in-memory table; returns the finished query."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
