"""sources/ntriples round-trip + format conformance."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nary_relation_extraction_decomposed_spark.sources.ntriples import (
    read_ntriples,
    write_ntriples,
)

ROWS = [
    ("acme corp", "in_city", "st louis"),       # spaces
    ("a+b", "rel%20x", "c&d=e"),                # chars url-encoding must guard
    ("café", "naïve_pred", "zürich"),           # unicode
    ("plain", "links", "simple"),
]


def _rt(spark, tmp_path, rows):
    df = spark.createDataFrame(rows, "subj string, pred string, obj string")
    path = str(tmp_path / "nt")
    write_ntriples(df, path)
    return path, read_ntriples(spark, path)


def test_round_trip_byte_identical(spark, tmp_path):
    _, back = _rt(spark, tmp_path, ROWS)
    assert sorted(map(tuple, back.collect())) == sorted(ROWS)


def test_iris_are_percent_encoded(spark, tmp_path):
    """ADVICE r6: spaces must export as %20 (RFC-style), never as a bare
    '+' (form-encoding), or external percent-decoders read 'acme+corp';
    a literal '+' must stay distinguishable as %2B."""
    path, _ = _rt(spark, tmp_path, ROWS)
    lines = sorted(r.value for r in spark.read.text(path).collect())
    joined = "\n".join(lines)
    assert "<http://kg.local/acme%20corp>" in joined
    assert "<http://kg.local/a%2Bb>" in joined
    assert "+" not in joined  # no form-encoded space survives anywhere


def test_lines_are_wellformed_ntriples(spark, tmp_path):
    path, _ = _rt(spark, tmp_path, ROWS)
    lines = [r.value for r in spark.read.text(path).collect()]
    assert len(lines) == len(ROWS)
    for ln in lines:
        assert ln.startswith("<http://kg.local/") and ln.endswith(" .")
        # exactly three IRI terms; no raw spaces inside any IRI
        parts = ln[:-2].split(" ")
        assert len(parts) == 3 and all(
            p.startswith("<") and p.endswith(">") and " " not in p
            for p in parts
        )


def test_foreign_iris_kept_verbatim(spark, tmp_path):
    path = str(tmp_path / "foreign")
    spark.createDataFrame(
        [("<http://kg.local/a> <http://example.org/p> <http://kg.local/b> .",)],
        "value string",
    ).write.text(path)
    back = read_ntriples(spark, path)
    assert [tuple(r) for r in back.collect()] == [
        ("a", "http://example.org/p", "b")
    ]


def test_malformed_line_strict_raises_lenient_drops(spark, tmp_path):
    path = str(tmp_path / "bad")
    spark.createDataFrame(
        [("<http://kg.local/a> <http://kg.local/p> <http://kg.local/b> .",),
         ("this is not a triple",)],
        "value string",
    ).repartition(1).write.text(path)
    lenient = read_ntriples(spark, path, strict=False)
    assert lenient.count() == 1
    with pytest.raises(Exception, match="malformed N-Triples"):
        read_ntriples(spark, path).count()


def test_pipeline_triples_export(spark, tmp_path):
    """The engine's own rejoin output (with its support column) exports
    and reloads with support re-attachable by join."""
    t = spark.createDataFrame(
        [("S1", "links", "P2", 3), ("S2", "links", "P9", 1)],
        "subj string, pred string, obj string, support bigint",
    )
    path = str(tmp_path / "kg")
    write_ntriples(t, path)
    back = read_ntriples(spark, path)
    re = back.join(t, ["subj", "pred", "obj"]).select("subj", "support")
    assert sorted(map(tuple, re.collect())) == [("S1", 3), ("S2", 1)]
