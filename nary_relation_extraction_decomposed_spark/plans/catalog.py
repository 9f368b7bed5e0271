"""Table-format layer: Iceberg-shaped writes, parquet-backed in the sandbox.

At deployment the pages/triples tables are Iceberg, partitioned by
days(warc_ts) + bucket(N, url) so that (a) time-range queries prune
partitions statically, (b) per-url operations (dedup, incremental joins)
co-locate, (c) commit atomicity/snapshots come from the table format. No
Iceberg jar ships in this sandbox, so this module emulates the layout with
hive-style partitioned parquet behind the SAME function signature — the
writeTo() call is isolated here and swaps in one place:

    df.writeTo(table).partitionedBy(F.days("warc_ts"), F.bucket(64, "url"))
      .createOrReplace()
"""

from __future__ import annotations

import posixpath

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def write_pages_style_table(
    df: DataFrame,
    path: str,
    ts_col: str = "warc_ts",
    key_col: str = "url",
    n_buckets: int = 16,
    mode: str = "overwrite",
) -> None:
    """days(ts) x bucket(key) partitioned write (Iceberg-transform emulation:
    dt = date string; kb = content-hash bucket — both derived, deterministic,
    and prunable by Catalyst on equality/range predicates)."""
    out = df.withColumn("dt", F.date_format(F.col(ts_col), "yyyy-MM-dd")).withColumn(
        "kb", F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets)).cast("int")
    )
    out.write.mode(mode).partitionBy("dt", "kb").parquet(path)


def read_pages_style_table(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_triples_table(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Triples partitioned by predicate (low cardinality, query-pruned)."""
    df.write.mode(mode).partitionBy("pred").parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_col: str = "url",
    n_buckets: int = 16,
    sort_col: str | None = None,
) -> None:
    """Hash-BUCKETED managed table (`bucketBy` + saveAsTable): the shuffle
    amortizer for repeated per-key work at 100 TB. Two tables bucketed the
    same way equi-join with NO Exchange on either side (asserted in
    tests/test_catalog_checkpoint.py) — the bucket layout IS the shuffle,
    paid once at write time; every later join/groupBy on the key reuses it.
    The Iceberg equivalent is the bucket(n, key) partition transform."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    w = df.write.bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.format("parquet").mode("overwrite").saveAsTable(table)


def write_ivf_index(
    centroids: DataFrame, lists: DataFrame, path: str, mode: str = "overwrite"
) -> None:
    """Persist an IVF ANN index (operators/similarity.ivf_index output):
    centroids (nlist rows — the broadcast side of every probe) as plain
    parquet, inverted lists PARTITIONED BY cid so a query probing n_probe
    of nlist lists statically prunes to n_probe/nlist of the corpus bytes
    at scan time (the Iceberg equivalent: identity-partition on cid, or
    bucket(n, cid) once nlist outgrows a directory-per-value layout).
    The index is deterministic (content-seeded Lloyd), so a rebuild after
    corpus changes is reproducible — no model artifact versioning needed
    beyond the path."""
    centroids.write.mode(mode).parquet(posixpath.join(path, "centroids"))
    lists.write.mode(mode).partitionBy("cid").parquet(
        posixpath.join(path, "lists")
    )


def read_ivf_index(spark: SparkSession, path: str):
    """(centroids, lists) back from write_ivf_index; cid partition pruning
    applies to any equi/IN filter the probe join pushes down."""
    return (
        spark.read.parquet(posixpath.join(path, "centroids")),
        spark.read.parquet(posixpath.join(path, "lists")),
    )


def write_table_v2(
    df: DataFrame, table: str, partition_cols: tuple[str, ...] = ()
) -> None:
    """DataFrameWriterV2 (`df.writeTo`) path — the exact API an Iceberg
    catalog takes at deployment (then with `partitionedBy(days(ts),
    bucket(n, key))` transforms and atomic `createOrReplace`). The sandbox
    session catalog supports v2 writes with the parquet provider, identity
    partitioning, and `create()` only — `createOrReplace`/transform
    partitions need a V2 catalog jar — so this drops-then-creates and
    partitions by pre-derived identity columns (write_pages_style_table
    derives days/bucket equivalents as dt/kb columns)."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    w = df.writeTo(table).using("parquet")
    if partition_cols:
        w = w.partitionedBy(*[F.col(c) for c in partition_cols])
    w.create()
