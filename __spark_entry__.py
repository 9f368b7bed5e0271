"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``nary_relation_extraction_decomposed_spark``
(see SURVEY.md §2 for the operator inventory this file exposes).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

SF_SMALL = "/root/testdata/sf0.001"
FIXTURE_DIR = os.path.join(_REPO_ROOT, "tests", "fixtures", "data")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full KG-construction pipeline.

    Input = the committed deterministic page-corpus fixture UNIONed with a
    pages-shaped projection of /root/testdata/sf0.001/documents.parquet
    (binding input shape url/warc_ts/html/text/lang). Output = the final
    (subj, pred, obj, support) triple table.
    """
    from nary_relation_extraction_decomposed_spark.session import apply_engine_confs
    from nary_relation_extraction_decomposed_spark.sources.tables import (
        pages_from_documents,
    )
    from nary_relation_extraction_decomposed_spark.plans.pipeline import (
        PipelineConfig,
        run_pipeline,
    )

    apply_engine_confs(spark)
    if not os.path.exists(os.path.join(FIXTURE_DIR, "pages.parquet")):
        from fixtures.gen_pages import main as gen_fixtures

        gen_fixtures(2000)

    fixture_pages = spark.read.parquet(os.path.join(FIXTURE_DIR, "pages.parquet"))
    testdata_pages = pages_from_documents(spark, SF_SMALL)
    pages = fixture_pages.unionByName(testdata_pages)

    gazetteer = spark.read.parquet(os.path.join(FIXTURE_DIR, "gazetteer.parquet"))
    pred_rules = spark.read.parquet(os.path.join(FIXTURE_DIR, "pred_rules.parquet"))

    result = run_pipeline(pages, gazetteer, pred_rules, PipelineConfig())
    return result.triples


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from nary_relation_extraction_decomposed_spark.plans.queries import register_all

    return dict(register_all())


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every SQL-expressible key in ``queries()``."""
    from nary_relation_extraction_decomposed_spark.plans.queries import register_all
    from nary_relation_extraction_decomposed_spark.plans.oracles import ORACLES

    register_all()  # oracle entries are registered alongside their queries
    return dict(ORACLES)
