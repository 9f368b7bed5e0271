"""Table loaders.

The sandbox fixture tables are plain parquet (one file per table,
TESTDATA.md). At deployment scale the pages corpus is an Iceberg table
partitioned by days(warc_ts) + bucket(url) — that write path lives in
``plans.catalog``; reads here go through one function so swapping
``spark.read.parquet`` for ``spark.read.table`` is a one-line change.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table. Column pruning / predicate pushdown is left to
    Catalyst — callers select/filter on the returned DataFrame and the parquet
    scan only reads what survives (verified via .explain ReadSchema)."""
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; known: {TABLE_NAMES}")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def pages_from_documents(
    spark: SparkSession, sf_dir: str, num_partitions: int | None = None
) -> DataFrame:
    """Derive a pages-shaped DataFrame (url, warc_ts, html, text, lang) —
    the binding input shape of BASELINE.json input_hint — from the driver's
    ``documents`` table.

    Deterministic: url and warc_ts are pure functions of doc_id; html is the
    UTF-8 rendering of the text in the same template the fixture generator
    uses, so extract_text(html) == 'doc' || chr(10) || text byte-identically
    (the extractor emits the <title> as a leading 'doc' line; empty/null
    text yields just 'doc').
    """
    docs = load_table(spark, sf_dir, "documents")
    if num_partitions:
        # the fixture table is ONE small parquet file -> the scan plus
        # everything Catalyst pipelines onto it (html render, explode
        # fan-out) would run as a single task; spread the cheap base rows
        # BEFORE the row-expanding derivation
        docs = docs.repartition(num_partitions)
    html = F.concat(
        F.lit("<html><head><title>doc</title></head><body><p>"),
        F.coalesce(F.col("text"), F.lit("")),
        F.lit("</p></body></html>"),
    )
    return docs.select(
        F.concat(F.lit("https://"), F.col("source"), F.lit(".example.org/doc/"),
                 F.col("doc_id").cast("string")).alias("url"),
        (F.to_timestamp(F.lit("2024-01-01 00:00:00"))
         + F.make_interval(secs=F.col("doc_id").cast("double"))).alias("warc_ts"),
        F.encode(html, "UTF-8").alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.col("lang"),
    )
