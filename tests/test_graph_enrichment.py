"""co_mention_edges doc-graph enrichment (same-sentence mention<->mention
edges, the coarse stand-in for the reference's dependency edges):
- kernel level: same-sentence evidence becomes a length-1 direct path,
  cross-sentence paths are untouched
- pipeline level: the accepted TRIPLE set on the committed golden corpus is
  identical with the flag on and off (the shortcuts never span sentences,
  so acceptance under max_path_len cannot change)."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from nary_relation_extraction_decomposed_spark.operators.kernels import (
    bfs_evidence,
)
from nary_relation_extraction_decomposed_spark.plans.pipeline import (
    PipelineConfig,
    run_pipeline,
)

MS = [
    {"mention_id": 0, "ent_type": "DRUG", "sent_id": 0},
    {"mention_id": 1, "ent_type": "GENE", "sent_id": 0},
    {"mention_id": 2, "ent_type": "VARIANT", "sent_id": 1},
]
SLOTS = [("GENE", "a"), ("VARIANT", "b")]


def test_kernel_co_mention_shortcuts_same_sentence_only():
    base = {
        (r["other_mid"], r["slot"]): r["path_len"]
        for r in bfs_evidence(2, MS, "DRUG", SLOTS)
    }
    rich = {
        (r["other_mid"], r["slot"]): r["path_len"]
        for r in bfs_evidence(2, MS, "DRUG", SLOTS, co_mention_edges=True)
    }
    assert base == {(1, "a"): 2, (2, "b"): 3}
    # same-sentence pair direct (1 edge); adjacent-sentence pair unchanged
    assert rich == {(1, "a"): 1, (2, "b"): 3}
    # acceptance set identical
    assert set(base) == set(rich)


def test_kernel_enriched_path_is_valid_and_deterministic():
    rows = bfs_evidence(2, MS, "DRUG", SLOTS, co_mention_edges=True)
    by_pair = {(r["pivot_mid"], r["other_mid"]): r["path"] for r in rows}
    # direct mention->mention path: [node(m0), node(m1)] with S=2 offset
    assert by_pair[(0, 1)] == [2, 3]
    assert rows == bfs_evidence(2, MS, "DRUG", SLOTS, co_mention_edges=True)


def test_fused_tagged_path_equals_unfused(spark, fixture_dir):
    """detect_and_analyze_tagged -> doc_graph_subrels_tagged (ONE docs pass,
    one shuffle) must emit exactly the same evidence rows as the unfused
    detect_mentions + analyze_sentences -> doc_graph_subrels path."""
    from nary_relation_extraction_decomposed_spark.operators.graph import (
        doc_graph_subrels,
        doc_graph_subrels_tagged,
    )
    from nary_relation_extraction_decomposed_spark.operators.mentions import (
        analyze_sentences,
        detect_and_analyze_tagged,
        detect_mentions,
    )
    from nary_relation_extraction_decomposed_spark.operators.textprep import (
        dedup_latest_text,
        filter_pages,
        resolve_text,
    )

    pages = spark.read.parquet(os.path.join(fixture_dir, "pages.parquet"))
    pages = pages.filter(F.xxhash64("url") % 8 == 0)
    gaz = spark.read.parquet(os.path.join(fixture_dir, "gazetteer.parquet"))
    docs = dedup_latest_text(resolve_text(filter_pages(pages, "en")))
    slots = [("GENE", "a"), ("VARIANT", "b")]

    unfused = doc_graph_subrels(
        detect_mentions(docs, gaz), analyze_sentences(docs, ["inhibits",
        "activates", "binds", "modulates"]), "DRUG", slots,
    )
    fused = doc_graph_subrels_tagged(
        detect_and_analyze_tagged(docs, gaz, ["inhibits", "activates",
        "binds", "modulates"]), "DRUG", slots,
    )
    cols = ["url", "pivot_mid", "pivot_norm", "pivot_sent", "other_mid",
            "other_norm", "slot", "pred", "path_len"]
    a = {tuple(r) for r in unfused.select(*cols).collect()}
    b = {tuple(r) for r in fused.select(*cols).collect()}
    assert a == b and len(a) > 100


def test_golden_triples_invariant_under_enrichment(spark, fixture_dir):
    pages = spark.read.parquet(os.path.join(fixture_dir, "pages.parquet"))
    pages = pages.filter(F.xxhash64("url") % 8 == 0)  # speed cap
    gaz = spark.read.parquet(os.path.join(fixture_dir, "gazetteer.parquet"))
    rules = spark.read.parquet(os.path.join(fixture_dir, "pred_rules.parquet"))

    def triple_set(co):
        cfg = PipelineConfig(canonicalize=False, co_mention_edges=co)
        df = run_pipeline(pages, gaz, rules, cfg).triples
        return {tuple(r) for r in df.select("subj", "pred", "obj", "support").collect()}

    assert triple_set(False) == triple_set(True)
