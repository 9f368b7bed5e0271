"""Engine-level invariants (SURVEY.md §5.3):
- triple set invariant under input partitioning / row order
- dedup idempotence
- kill-resume: checkpointed rerun skips stages and reproduces output exactly
"""

from __future__ import annotations

import json
import os
import shutil

import pyspark.sql.functions as F
import pytest

from nary_relation_extraction_decomposed_spark.plans.pipeline import (
    PipelineConfig,
    run_pipeline,
    run_pipeline_checkpointed,
)


def _triples_set(df):
    return {
        (r["subj"], r["pred"], r["obj"], r["support"])
        for r in df.select("subj", "pred", "obj", "support").collect()
    }


@pytest.fixture(scope="module")
def inputs(spark, fixture_dir):
    pages = spark.read.parquet(os.path.join(fixture_dir, "pages.parquet"))
    # cap corpus for speed; deterministic subset
    pages = pages.filter(F.xxhash64("url") % 4 == 0)
    gaz = spark.read.parquet(os.path.join(fixture_dir, "gazetteer.parquet"))
    rules = spark.read.parquet(os.path.join(fixture_dir, "pred_rules.parquet"))
    return pages, gaz, rules


def test_partition_invariance(spark, inputs):
    pages, gaz, rules = inputs
    base = run_pipeline(pages, gaz, rules, PipelineConfig()).triples
    shuffled = run_pipeline(
        pages.repartition(17).sortWithinPartitions(F.col("warc_ts")),
        gaz, rules, PipelineConfig(),
    ).triples
    assert _triples_set(base) == _triples_set(shuffled)


def test_kill_resume(spark, inputs, tmp_path):
    pages, gaz, rules = inputs
    root = str(tmp_path / "ckpt")
    cfg = PipelineConfig()

    r1, ck1 = run_pipeline_checkpointed(pages, gaz, rules, cfg, root, "corpus-v1")
    t1 = _triples_set(r1.triples)
    assert all(not st["skipped"] for st in ck1.stats.values())

    # simulate a kill AFTER subrels but BEFORE triples committed
    shutil.rmtree(os.path.join(root, "triples"))

    r2, ck2 = run_pipeline_checkpointed(pages, gaz, rules, cfg, root, "corpus-v1")
    assert ck2.stats["docs"]["skipped"]
    assert ck2.stats["mentions"]["skipped"]
    assert ck2.stats["evidence"]["skipped"]
    assert not ck2.stats["triples"]["skipped"]
    assert _triples_set(r2.triples) == t1

    # full rerun: everything skipped, output identical
    r3, ck3 = run_pipeline_checkpointed(pages, gaz, rules, cfg, root, "corpus-v1")
    assert all(st["skipped"] for st in ck3.stats.values())
    assert _triples_set(r3.triples) == t1

    # manifest sanity: per-partition lineage rows sum to stage rows
    with open(os.path.join(root, "triples", "manifest.json")) as f:
        m = json.load(f)
    assert m["committed"] and m["n_rows"] == sum(p["rows"] for p in m["partitions"])

    # changed upstream fingerprint invalidates the chain
    _, ck4 = run_pipeline_checkpointed(pages, gaz, rules, cfg, root, "corpus-v2")
    assert all(not st["skipped"] for st in ck4.stats.values())


def test_dedup_idempotence(spark, inputs):
    from nary_relation_extraction_decomposed_spark.operators.textprep import (
        dedup_latest_per_url,
    )

    pages, _, _ = inputs
    once = dedup_latest_per_url(pages)
    twice = dedup_latest_per_url(once)
    assert once.count() == twice.count() == pages.select("url").distinct().count()
    a = {tuple(r) for r in once.select("url", "warc_ts").collect()}
    b = {tuple(r) for r in twice.select("url", "warc_ts").collect()}
    assert a == b
