"""Join-based gazetteer detection (the no-driver-collect scale path) must
reproduce the broadcast-trie scan EXACTLY — every MENTIONS_SCHEMA column on
the full fixture corpus — and detect_mentions_auto must dispatch by
dictionary size (VERDICT r3 #2: the broadcast path assumes the dictionary
fits the driver; a 10^8-surface web-scale dictionary does not)."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from nary_relation_extraction_decomposed_spark.operators import mentions as M
from nary_relation_extraction_decomposed_spark.operators.textprep import (
    dedup_latest_text,
    filter_pages,
    resolve_text,
)

COLS = [
    "url", "mention_id", "ent_id", "ent_type", "surface",
    "surface_norm", "begin", "end", "sent_id", "tok_begin", "tok_end",
]


@pytest.fixture(scope="module")
def docs(spark, fixture_dir):
    pages = spark.read.parquet(os.path.join(fixture_dir, "pages.parquet"))
    return dedup_latest_text(resolve_text(filter_pages(pages))).persist()


def _rows(df):
    return sorted(tuple(r[c] for c in COLS) for r in df.select(*COLS).collect())


def test_join_path_equals_broadcast_path(spark, fixture_dir, docs):
    gaz = spark.read.parquet(os.path.join(fixture_dir, "gazetteer.parquet"))
    want = _rows(M.detect_mentions(docs, gaz))
    got = _rows(M.detect_mentions_join(docs, gaz))
    assert want  # fixtures are non-trivial
    assert got == want


def test_join_path_longest_match_and_ties(spark):
    """The greedy resolution must reproduce the trie scan's corners:
    longest-match-first, overlap skipping, per-sentence cursor reset, and
    the smallest-(ent_id, ent_type)-wins tie rule on duplicate surfaces."""
    docs = spark.createDataFrame(
        [
            ("u1", "Adri-vax binds BRC7.\nadri alone."),
            ("u2", "adri adri vax adri"),  # overlap: scan takes adri, adri vax, adri
            ("u3", ""),
        ],
        "url string, text string",
    )
    gaz = spark.createDataFrame(
        [
            ("adri vax", "D1", "DRUG"),
            ("adri", "D2", "DRUG"),
            ("adri", "D9", "ZZZ"),  # loses the tie to (D2, DRUG)
            ("brc7", "G1", "GENE"),
            ("", "E0", "EMPTY"),  # dropped (empty surface)
            ("a b c d e", "E5", "LONG"),  # dropped (> MAX_GAZ_TOKENS)
        ],
        "surface_norm string, ent_id string, ent_type string",
    )
    want = _rows(M.detect_mentions(docs, gaz))
    got = _rows(M.detect_mentions_join(docs, gaz))
    assert got == want
    by_url = {}
    for r in want:
        by_url.setdefault(r[0], []).append((r[2], r[5]))
    assert by_url["u1"] == [("D1", "adri vax"), ("G1", "brc7"), ("D2", "adri")]
    assert by_url["u2"] == [("D2", "adri"), ("D1", "adri vax"), ("D2", "adri")]
    assert "u3" not in by_url


def test_auto_dispatch_by_dictionary_size(spark, fixture_dir, docs):
    gaz = spark.read.parquet(os.path.join(fixture_dir, "gazetteer.parquet"))
    want = _rows(M.detect_mentions(docs, gaz))
    # a tiny ceiling forces the join path; result is unchanged
    assert _rows(M.detect_mentions_auto(docs, gaz, broadcast_max_rows=1)) == want
    # default ceiling keeps the broadcast path; result is unchanged
    assert _rows(M.detect_mentions_auto(docs, gaz)) == want
    docs.unpersist()


def test_join_path_normalizes_messy_dictionary_whitespace(spark):
    """ADVICE r4 pin: a dictionary surface with a double space or tab
    matches via the broadcast trie (token-tuple key from str.split()) but
    could never equal a single-space-joined candidate n-gram — the join
    path must whitespace-normalize surfaces first so both paths stay
    convergent on non-normalized dictionaries. Tie parity: the trie's
    sorted(rows) rule means the minimum (raw surface, ent_id, ent_type)
    claims a collapsed key."""
    docs = spark.createDataFrame(
        [("u1", "acme corp hired bob smith")], "url string, text string"
    )
    gaz = spark.createDataFrame(
        [
            ("acme  corp", "E1", "ORG"),      # double space
            ("acme corp", "E2", "ORG"),       # normalized twin, larger raw
            ("bob\tsmith", "E3", "PER"),      # tab separator
            ("  acme corp  ", "E9", "ORG"),   # leading/trailing spaces
            ("\tacme corp", "E4", "ORG"),     # leading TAB (trim-proof)
            ("bob smith\t\n", "E5", "PER"),   # trailing tab+newline
        ],
        "surface_norm string, ent_id string, ent_type string",
    )
    want = _rows(M.detect_mentions(docs, gaz))
    got = _rows(M.detect_mentions_join(docs, gaz))
    assert got == want
    # both paths found both entities, under the trie's tie rule: the
    # minimum RAW string claims the collapsed key — "\tacme corp" (tab
    # 0x09 < space 0x20) beats "  acme corp  " beats the rest -> E4;
    # "bob\tsmith" < "bob smith\t\n" (same tab-beats-space rule) -> E3
    by_ent = {r[2] for r in want}
    assert by_ent == {"E4", "E3"}
