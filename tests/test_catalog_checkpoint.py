"""Table-format layer: partitioned writes, partition pruning in the plan,
triples sink layout."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from nary_relation_extraction_decomposed_spark.plans import catalog
from nary_relation_extraction_decomposed_spark.sources.tables import (
    pages_from_documents,
)

SF = "/root/testdata/sf0.001"


def test_pages_table_layout_and_pruning(spark, tmp_path):
    path = str(tmp_path / "pages_tbl")
    pages = pages_from_documents(spark, SF).limit(300)
    catalog.write_pages_style_table(pages, path, n_buckets=4)

    # hive-style layout: dt=YYYY-MM-DD/kb=N
    dts = [d for d in os.listdir(path) if d.startswith("dt=")]
    assert dts
    kbs = [d for d in os.listdir(os.path.join(path, dts[0])) if d.startswith("kb=")]
    assert kbs

    back = catalog.read_pages_style_table(spark, path)
    assert back.count() == 300

    # static partition pruning: a dt predicate must reach PartitionFilters
    one_dt = dts[0].split("=", 1)[1]
    pruned = back.filter(F.col("dt") == one_dt)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "dt" in plan
    n_all_files = sum(len(files) for _, _, files in os.walk(path))
    assert pruned.count() > 0


def test_triples_sink_partitioned_by_pred(spark, tmp_path, fixture_dir):
    path = str(tmp_path / "triples_tbl")
    golden = spark.read.parquet(os.path.join(fixture_dir, "golden_triples.parquet"))
    catalog.write_triples_table(golden, path)
    preds = [d for d in os.listdir(path) if d.startswith("pred=")]
    assert len(preds) == golden.select("pred").distinct().count()
    assert spark.read.parquet(path).count() == golden.count()
