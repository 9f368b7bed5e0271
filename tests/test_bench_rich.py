"""kg_rich bench-corpus invariants (VERDICT r5 #6).

The entity-bearing bench corpus is built JVM-side from xxhash64-derived
indexes, so it must be exactly deterministic across runs, and its triple
key space is closed: every planted sentence is 'spark arga<K> <pred>
argb<M>' against the parametric gazetteer, so distinct triples can never
exceed 2 slots x RICH_ENTS x |PRED_WORDS| (= 1,024 at the defaults), and
the natural document text contributes nothing (its vocabulary cannot
collide with the synthetic arga*/argb* surfaces).
"""

from __future__ import annotations

import os

import bench

SF_SMALL = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")


def test_kg_rich_deterministic_and_bounded(spark, monkeypatch):
    monkeypatch.setattr(bench, "REPLICATE", 8)
    n_docs_1, n_trip_1 = bench.bench_kg_rich(spark, SF_SMALL)
    n_docs_2, n_trip_2 = bench.bench_kg_rich(spark, SF_SMALL)
    assert (n_docs_1, n_trip_1) == (n_docs_2, n_trip_2)
    assert n_docs_1 > 0
    from nary_relation_extraction_decomposed_spark.plans.q_kg import PRED_WORDS

    cap = 2 * bench.RICH_ENTS * len(PRED_WORDS)  # two slots x ents x preds
    assert 0 < n_trip_1 <= cap


def test_kg_rich_scales_triples_with_corpus(spark, monkeypatch):
    """More planted pages -> more distinct (pred, entity) combos covered;
    the planted fraction is keyed on the replicated url so replication
    genuinely widens coverage instead of replaying the same combos."""
    monkeypatch.setattr(bench, "REPLICATE", 2)
    _, t_small = bench.bench_kg_rich(spark, SF_SMALL)
    monkeypatch.setattr(bench, "REPLICATE", 16)
    _, t_large = bench.bench_kg_rich(spark, SF_SMALL)
    assert t_large > t_small
