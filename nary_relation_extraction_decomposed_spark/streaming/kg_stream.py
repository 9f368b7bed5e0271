"""Streaming KG construction: the batch pipeline applied per micro-batch.

The reference is strictly batch; this is the engine's streaming face for
continuously-arriving crawl data. Pattern: `readStream` over the pages
source -> `foreachBatch` running the SAME batch pipeline (one code path,
no semantic fork) over each micro-batch -> APPEND per-batch triple deltas
tagged with batch_id.

Additivity contract: triple support is countDistinct(url) per batch, and a
url appears in exactly one micro-batch (file/offset-partitioned sources
guarantee this; late re-crawls of a url are new evidence on purpose), so
`SUM(support) GROUP BY subj, pred, obj` over the delta table equals the
batch pipeline's support over the union corpus — asserted in
tests/test_streaming_kg.py. Exactly-once: foreachBatch + the streaming
checkpoint give at-least-once delivery of idempotent batch writes keyed by
batch_id; `merge_triple_deltas` dedups on (batch_id) replays at read time.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..plans.pipeline import PipelineConfig, run_pipeline

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def read_pages_stream(spark: SparkSession, path: str, max_files: int = 1) -> DataFrame:
    """File-based pages stream (schema pinned to the binding input shape)."""
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def stream_pages_to_triples(
    pages_stream: DataFrame,
    gazetteer: DataFrame,
    pred_rules: DataFrame,
    config: PipelineConfig,
    out_path: str,
    checkpoint_dir: str,
    url_level: bool = False,
):
    """Drive the pages stream through the batch KG pipeline per micro-batch,
    appending triple deltas; availableNow drains everything currently in
    the source and stops. Returns the finished query.

    Delta granularity:
    - url_level=False: (subj, pred, obj, support, batch_id) — compact;
      SUM(support) reproduces batch support for RAW surface triples.
    - url_level=True: (subj, pred, obj, url, batch_id) — the provenance
      table; countDistinct(url) reproduces support exactly even AFTER a
      merge-time canonical map collapses alias triples from one url
      (canonicalize_url_deltas below). Bigger, but it is the shape a KG
      needs for evidence anyway.

    Requires config.canonicalize=False: the additivity contract above only
    holds for RAW surface triples — a per-micro-batch canonical map is
    computed from that batch's surfaces alone, so canonical labels (min of
    a smaller cluster) can differ per batch and from the union run,
    silently breaking SUM(support) equality. Canonicalize at merge time
    instead: build ONE canonical map over the union surfaces and apply it
    with canonicalize_url_deltas."""
    if config.canonicalize:
        raise ValueError(
            "stream_pages_to_triples requires PipelineConfig(canonicalize="
            "False): per-batch canonical maps break delta additivity; "
            "apply one shared canonical map at merge time "
            "(canonicalize_url_deltas)"
        )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.head(1):
            return
        res = run_pipeline(batch_df, gazetteer, pred_rules, config)
        if url_level:
            from ..plans.pipeline import _rejoin

            out = _rejoin(res.subrels, pred_rules, None, config, url_level=True)
        else:
            out = res.triples
        (
            out.withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(out_path)
        )

    q = (
        pages_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def merge_triple_deltas(spark: SparkSession, out_path: str) -> DataFrame:
    """Delta table -> current triple set, dispatching on the stored
    granularity. Aggregated deltas: dedup (triple, batch_id) replays, sum
    support. Url-level deltas: distinct (triple, url) — a url lives in one
    batch, and distinct also absorbs at-least-once replays — then count
    (the skew-safe two-phase form: the first shuffle key includes url)."""
    deltas = spark.read.parquet(out_path)
    if "url" in deltas.columns:
        return (
            deltas.select("subj", "pred", "obj", "url")
            .distinct()
            .groupBy("subj", "pred", "obj")
            .agg(F.count("*").cast("bigint").alias("support"))
        )
    deduped = deltas.dropDuplicates(["subj", "pred", "obj", "batch_id"])
    return deduped.groupBy("subj", "pred", "obj").agg(
        F.sum("support").cast("bigint").alias("support")
    )


def canonicalize_url_deltas(
    deltas: DataFrame, canon_map: DataFrame
) -> DataFrame:
    """EXACT merge-time canonicalization — the streaming counterpart of
    the batch pipeline's in-run ER (stream_pages_to_triples requires
    canonicalize=False; this is the documented second half):

        stream_pages_to_triples(..., url_level=True)
        canon = er.canonical_map(union-corpus surfaces)   # ONE shared map
        canonicalize_url_deltas(spark.read.parquet(deltas), canon)

    Broadcast-maps subj/obj through the shared canonical labels (absent
    surfaces keep themselves — same coalesce rule as operators/triples),
    dedups (canonical triple, url), counts. Needs url-level deltas: with
    only aggregated supports, a url whose alias surfaces collapse onto one
    canonical triple would be double counted (SUM is an upper bound there);
    with urls it reproduces the canonicalized batch pipeline EXACTLY
    (asserted in tests/test_streaming_kg.py)."""
    canon = canon_map.select("surface_norm", "canonical")
    subj_map = F.broadcast(canon.toDF("subj", "_subj_c"))
    obj_map = F.broadcast(canon.toDF("obj", "_obj_c"))
    return (
        deltas.join(subj_map, "subj", "left")
        .join(obj_map, "obj", "left")
        .select(
            F.coalesce("_subj_c", "subj").alias("subj"),
            "pred",
            F.coalesce("_obj_c", "obj").alias("obj"),
            "url",
        )
        .distinct()
        .groupBy("subj", "pred", "obj")
        .agg(F.count("*").cast("bigint").alias("support"))
    )
