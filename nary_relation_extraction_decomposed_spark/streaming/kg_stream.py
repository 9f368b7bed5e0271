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
):
    """Drive the pages stream through the batch KG pipeline per micro-batch,
    appending (subj, pred, obj, support, batch_id) deltas; availableNow
    drains everything currently in the source and stops. Returns the
    finished query.

    Requires config.canonicalize=False: the additivity contract above only
    holds for RAW surface triples — a per-micro-batch canonical map is
    computed from that batch's surfaces alone, so canonical labels (min of
    a smaller cluster) can differ per batch and from the union run,
    silently breaking SUM(support) equality. Canonicalize at merge time
    instead: build one canonical map over the union surfaces and apply it
    to merge_triple_deltas' output."""
    if config.canonicalize:
        raise ValueError(
            "stream_pages_to_triples requires PipelineConfig(canonicalize="
            "False): per-batch canonical maps break delta additivity; "
            "apply one shared canonical map after merge_triple_deltas"
        )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.head(1):
            return
        res = run_pipeline(batch_df, gazetteer, pred_rules, config)
        (
            res.triples.withColumn("batch_id", F.lit(batch_id))
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
    """Delta table -> current triple set: replayed batches dedup by
    batch_id first (idempotent under at-least-once delivery), then support
    sums across batches."""
    deltas = spark.read.parquet(out_path)
    deduped = deltas.dropDuplicates(["subj", "pred", "obj", "batch_id"])
    return deduped.groupBy("subj", "pred", "obj").agg(
        F.sum("support").cast("bigint").alias("support")
    )
