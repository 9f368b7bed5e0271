"""End-to-end KG-construction pipeline.

pages(url, warc_ts, html, text, lang)
  -> filter (lang/null, pre-UDF so it pushes into the scan)
  -> dedup latest per url (deterministic row_number)
  -> resolve text (frozen extractor, mapInPandas; drops html)
  -> mentions + sentences (mapInPandas, broadcast gazetteer)
  -> doc-graph BFS evidence (cogrouped applyInPandas)
  -> binary sub-relations (DataFrame joins; this IS the n-ary decomposition)
  -> ER canonical map (MinHash-LSH + connected components)
  -> rejoin into (subj, pred, obj) triples + support

Every stage is a DataFrame in -> DataFrame out function; plans/checkpoint.py
wraps stages with the per-stage parquet checkpoint + manifest for
kill-resume.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from ..operators import er, graph, mentions as M, textprep, triples as T
from ..operators.kernels import MAX_PATH_LEN


@dataclass(frozen=True)
class PipelineConfig:
    pivot_type: str = "DRUG"
    arg_slots: tuple[tuple[str, str], ...] = (("GENE", "a"), ("VARIANT", "b"))
    pred_vocab: tuple[str, ...] = ("inhibits", "activates", "binds", "modulates")
    lang: str = "en"
    max_path_len: int = MAX_PATH_LEN
    canonicalize: bool = True


@dataclass
class PipelineResult:
    docs: DataFrame
    mentions: DataFrame
    sentences: DataFrame
    evidence: DataFrame
    subrels: DataFrame
    canon_map: DataFrame | None
    triples: DataFrame
    stages: dict[str, DataFrame] = field(default_factory=dict)


def run_pipeline(
    pages: DataFrame,
    gazetteer: DataFrame,
    pred_rules: DataFrame,
    config: PipelineConfig = PipelineConfig(),
) -> PipelineResult:
    clean = textprep.dedup_latest_per_url(textprep.filter_pages(pages, config.lang))
    docs = textprep.resolve_text(clean)

    ments = M.detect_mentions(docs, gazetteer)
    sents = M.analyze_sentences(docs, list(config.pred_vocab))

    ev = graph.doc_graph_evidence(
        ments, sents, config.pivot_type, list(config.arg_slots), config.max_path_len
    )
    subrels = T.binary_subrels(ev, ments, sents)

    canon = er.canonical_map(ments.select("surface_norm")) if config.canonicalize else None
    trips = T.rejoin_triples(subrels, pred_rules, canon)

    return PipelineResult(
        docs=docs,
        mentions=ments,
        sentences=sents,
        evidence=ev,
        subrels=subrels,
        canon_map=canon,
        triples=trips,
    )
