"""End-to-end golden gate (BASELINE.json): byte-identical extracted text per
url, exact mentions/evidence, ER clusters, and triples P/R >= 0.95 vs the
computed goldens."""

from __future__ import annotations

import os

import pytest

from nary_relation_extraction_decomposed_spark.plans.pipeline import (
    PipelineConfig,
    run_pipeline,
)


@pytest.fixture(scope="module")
def result(spark, fixture_dir):
    pages = spark.read.parquet(os.path.join(fixture_dir, "pages.parquet"))
    gaz = spark.read.parquet(os.path.join(fixture_dir, "gazetteer.parquet"))
    rules = spark.read.parquet(os.path.join(fixture_dir, "pred_rules.parquet"))
    return run_pipeline(pages, gaz, rules, PipelineConfig())


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.select(*cols).collect())


def test_text_byte_identical(spark, fixture_dir, result):
    golden = spark.read.parquet(os.path.join(fixture_dir, "golden_text.parquet"))
    got = _rows(result.docs, ["url", "text"])
    want = _rows(golden, ["url", "text"])
    assert len(got) == len(want)
    mismatches = [(g, w) for g, w in zip(got, want) if g != w]
    assert not mismatches, mismatches[:3]


def test_mentions_exact(spark, fixture_dir, result):
    cols = ["url", "mention_id", "ent_id", "ent_type", "surface",
            "surface_norm", "begin", "end", "sent_id"]
    golden = spark.read.parquet(os.path.join(fixture_dir, "golden_mentions.parquet"))
    got = _rows(result.mentions, cols)
    want = _rows(golden.selectExpr(
        "url", "cast(mention_id as int) mention_id", "ent_id", "ent_type",
        "surface", "surface_norm", "cast(begin as int) begin",
        "cast(end as int) end", "cast(sent_id as int) sent_id"), cols)
    assert got == want


def test_evidence_exact(spark, fixture_dir, result):
    golden = spark.read.parquet(os.path.join(fixture_dir, "golden_evidence.parquet"))
    got = _rows(
        result.evidence.selectExpr("url", "pivot_mid as m1", "other_mid as m2",
                                   "slot", "path_len"),
        ["url", "m1", "m2", "slot", "path_len"],
    )
    want = _rows(golden.selectExpr(
        "url", "cast(m1 as int) m1", "cast(m2 as int) m2", "slot",
        "cast(path_len as int) path_len"),
        ["url", "m1", "m2", "slot", "path_len"])
    assert got == want


def test_clusters_exact(spark, fixture_dir, result):
    golden = spark.read.parquet(os.path.join(fixture_dir, "golden_clusters.parquet"))
    got = _rows(result.canon_map, ["surface_norm", "canonical"])
    want = _rows(golden, ["surface_norm", "canonical"])
    assert got == want


def test_triples_precision_recall(spark, fixture_dir, result):
    golden = spark.read.parquet(os.path.join(fixture_dir, "golden_triples.parquet"))
    got = set(_rows(result.triples, ["subj", "pred", "obj"]))
    want = set(_rows(golden, ["subj", "pred", "obj"]))
    assert got, "pipeline emitted no triples"
    tp = len(got & want)
    precision = tp / len(got)
    recall = tp / len(want)
    assert precision >= 0.95, (precision, list(got - want)[:5])
    assert recall >= 0.95, (recall, list(want - got)[:5])
    # exact support values too (stronger than the P/R gate)
    got_s = _rows(result.triples, ["subj", "pred", "obj", "support"])
    want_s = _rows(
        golden.selectExpr("subj", "pred", "obj", "cast(support as bigint) support"),
        ["subj", "pred", "obj", "support"])
    assert got_s == want_s
