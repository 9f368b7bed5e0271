"""SparkSession builders tuned for this engine.

Design notes (scale-first):
- AQE on everywhere: runtime coalescing of shuffle partitions, skew-join
  splitting, and join-strategy demotion are the first line of defense at
  100 TB (BASELINE.json "AQE-tuned shuffles").
- Arrow on everywhere: every Python-side computation in this engine is a
  vectorized pandas/Arrow UDF ("no per-row Python", BASELINE.json input_hint).
- Session timezone pinned to UTC so timestamp semantics match the DuckDB
  oracle and are cluster-invariant.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# Configs that are safe and beneficial at any scale. Cluster-size-dependent
# knobs (shuffle partitions, advisory partition bytes) get defaults here and
# are overridden by jobs/run_pipeline.py per deployment.
ENGINE_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "128m",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Large Arrow batches amortize the JVM<->Python boundary; each batch is
    # still bounded so grouped-map state stays in memory. Rows are also
    # BYTES-capped by Spark 4's spark.sql.execution.arrow.maxBytesPerBatch
    # (64MB default, left as-is) — load-bearing for the extractor stage,
    # where 10k rows of real crawled html would otherwise be a ~1GB batch.
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    "spark.sql.shuffle.partitions": "32",
}


def apply_engine_confs(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine confs to an existing session.

    Used when the driver hands us its own SparkSession (``entry()``): static
    confs are skipped automatically by Spark; runtime ones take effect.
    """
    for k, v in ENGINE_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static conf on a live session — keep the driver's value
    return spark


def build_session(
    app_name: str = "nary-kg-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    for k, v in ENGINE_CONFS.items():
        builder = builder.config(k, v)
    if shuffle_partitions is not None:
        builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    for k, v in (extra_confs or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
