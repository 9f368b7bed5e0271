"""Entity-mention detection + sentence analysis (Arrow-vectorized).

The gazetteer is collected once on the driver, built into a token-trie-style
index, and BROADCAST to executors (sc.broadcast) — the classic small-dim
pattern: millions of docs stream through mapInPandas while the dictionary
lives once per executor, no shuffle, no join. At 100 TB the docs side stays
fully parallel; the gazetteer (≤ tens of MB) is the broadcast side.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from .kernels import GazetteerIndex, detect_mentions_in_text, sentence_predicates

MENTIONS_SCHEMA = (
    "url string, mention_id int, ent_id string, ent_type string, "
    "surface string, surface_norm string, begin int, end int, sent_id int, "
    "tok_begin int, tok_end int"
)
SENTENCES_SCHEMA = "url string, sent_id int, n_tokens int, pred string"


def gazetteer_as_of(gazetteer: DataFrame, ts) -> DataFrame:
    """Snapshot-aware dictionary: the latest row per (surface_norm, ent_id)
    with snap_ts <= ts — the as-of pattern applied to the KG dictionary so a
    rerun against a historical crawl uses the dictionary of that time."""
    w = Window.partitionBy("surface_norm", "ent_id").orderBy(F.col("snap_ts").desc())
    return (
        gazetteer.filter(F.col("snap_ts") <= F.lit(ts))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def build_gazetteer_index(gazetteer: DataFrame) -> GazetteerIndex:
    """Collect (surface_norm, ent_id, ent_type) and build the scan index.
    Driver-side by design: the gazetteer is the SMALL side."""
    rows = [
        (r["surface_norm"], r["ent_id"], r["ent_type"])
        for r in gazetteer.select("surface_norm", "ent_id", "ent_type").collect()
    ]
    return GazetteerIndex.build(rows)


def detect_mentions(docs: DataFrame, gazetteer: DataFrame) -> DataFrame:
    """docs(url, text) -> mentions rows (MENTIONS_SCHEMA).

    Longest-match gazetteer scan per document, executed over Arrow batches;
    mention_id is the (begin, end) ordinal within the doc — deterministic
    under any partitioning.
    """
    sc = docs.sparkSession.sparkContext
    bc = sc.broadcast(build_gazetteer_index(gazetteer))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        gaz = bc.value
        cols = [
            "url", "mention_id", "ent_id", "ent_type",
            "surface", "surface_norm", "begin", "end", "sent_id",
            "tok_begin", "tok_end",
        ]
        for pdf in it:
            out: dict[str, list] = {c: [] for c in cols}
            for url, text in zip(pdf["url"], pdf["text"]):
                if not isinstance(text, str) or not text:
                    continue
                for m in detect_mentions_in_text(text, gaz):
                    out["url"].append(url)
                    for k in cols[1:]:
                        out[k].append(m[k])
            yield pd.DataFrame(out, columns=cols)

    return docs.select("url", "text").mapInPandas(batches, schema=MENTIONS_SCHEMA)


def analyze_sentences(docs: DataFrame, pred_vocab: list[str]) -> DataFrame:
    """docs(url, text) -> one row per sentence with its detected predicate
    (first pred-vocab token) and token count (SENTENCES_SCHEMA)."""
    vocab = frozenset(pred_vocab)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["url", "sent_id", "n_tokens", "pred"]
        for pdf in it:
            out: dict[str, list] = {c: [] for c in cols}
            for url, text in zip(pdf["url"], pdf["text"]):
                if not isinstance(text, str):
                    text = ""
                for s in sentence_predicates(text, vocab):
                    out["url"].append(url)
                    out["sent_id"].append(s["sent_id"])
                    out["n_tokens"].append(s["n_tokens"])
                    out["pred"].append(s["pred"])
            yield pd.DataFrame(out, columns=cols)

    return docs.select("url", "text").mapInPandas(batches, schema=SENTENCES_SCHEMA)


def detect_and_analyze_tagged(
    docs: DataFrame, gazetteer: DataFrame, pred_vocab: list[str]
) -> DataFrame:
    """FUSED mention detection + sentence analysis in ONE docs pass,
    emitting the tagged row stream (graph.TAGGED_SCHEMA: kind 0 = sentence
    rows with n_tokens+pred, kind 1 = FULL mention rows) that
    doc_graph_subrels_tagged consumes directly. Halves the Python crossings
    of the mentions+sentences stages and removes their union; because
    mention rows carry every MENTIONS_SCHEMA column, `mentions_view` /
    `sentences_view` below recover the unfused frames by pure filter+
    project — so the fused pass can also feed ER and result surfaces
    (run_pipeline's default path). The unfused operators remain for
    per-stage checkpointing."""
    sc = docs.sparkSession.sparkContext
    bc = sc.broadcast(build_gazetteer_index(gazetteer))
    vocab = frozenset(pred_vocab)
    m_cols = ["mention_id", "ent_id", "ent_type", "surface", "surface_norm",
              "begin", "end", "tok_begin", "tok_end"]
    cols = ["url", "kind", "sent_id", *m_cols, "n_tokens", "pred"]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        gaz = bc.value
        for pdf in it:
            out: dict[str, list] = {c: [] for c in cols}
            for url, text in zip(pdf["url"], pdf["text"]):
                if not isinstance(text, str):
                    text = ""
                for s in sentence_predicates(text, vocab):
                    out["url"].append(url)
                    out["kind"].append(0)
                    out["sent_id"].append(s["sent_id"])
                    for c in m_cols:
                        out[c].append(None)
                    out["n_tokens"].append(s["n_tokens"])
                    out["pred"].append(s["pred"])
                if text:
                    for m in detect_mentions_in_text(text, gaz):
                        out["url"].append(url)
                        out["kind"].append(1)
                        out["sent_id"].append(m["sent_id"])
                        for c in m_cols:
                            out[c].append(m[c])
                        out["n_tokens"].append(None)
                        out["pred"].append(None)
            yield pd.DataFrame(out, columns=cols)

    from .graph import TAGGED_SCHEMA

    return docs.select("url", "text").mapInPandas(batches, schema=TAGGED_SCHEMA)


def mentions_view(tagged: DataFrame) -> DataFrame:
    """Recover the MENTIONS_SCHEMA frame from a tagged stream — pure
    filter + project, no Python."""
    return tagged.filter(F.col("kind") == 1).select(
        "url", "mention_id", "ent_id", "ent_type", "surface",
        "surface_norm", "begin", "end", "sent_id", "tok_begin", "tok_end",
    )


def sentences_view(tagged: DataFrame) -> DataFrame:
    """Recover the SENTENCES_SCHEMA frame from a tagged stream."""
    return tagged.filter(F.col("kind") == 0).select(
        "url", "sent_id", "n_tokens", "pred"
    )


def doc_sentence_counts(sentences: DataFrame) -> DataFrame:
    """(url, n_sents) from the sentence table — partial aggregation
    (map-side combine) is automatic for count()."""
    return sentences.groupBy("url").agg(F.count("*").cast("int").alias("n_sents"))
