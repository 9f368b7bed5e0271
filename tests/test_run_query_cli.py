"""jobs/run_query.py: the spark-submit query CLI over a stored triple
table — pattern parsing units plus one end-to-end subprocess run of each
mode against a written parquet (the deployment shape)."""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

from nary_relation_extraction_decomposed_spark.operators.kg_query import (  # noqa: E402
    parse_pattern,
)


def test_parse_pattern():
    assert parse_pattern("?s supplies ?p . ?p ships_in ?o") == [
        ("?s", "supplies", "?p"),
        ("?p", "ships_in", "?o"),
    ]
    assert parse_pattern("alice works_at ?o") == [("alice", "works_at", "?o")]
    # multi-word normalized entity ids are shell-quoted
    assert parse_pattern('?x supplies "acme corp"') == [
        ("?x", "supplies", "acme corp")
    ]
    with pytest.raises(ValueError, match="3 terms"):
        parse_pattern("?a b")
    with pytest.raises(ValueError, match="empty"):
        parse_pattern(" . ")




def test_run_query_cli_end_to_end(spark, tmp_path):
    triples_path = str(tmp_path / "triples")
    spark.createDataFrame(
        [("a", "p", "b", 1), ("b", "p", "c", 1), ("c", "q", "d", 2)],
        "subj string, pred string, obj string, support bigint",
    ).write.parquet(triples_path)

    def run(*extra, expect_rc=0):
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "jobs", "run_query.py"),
             "--triples", triples_path, "--shuffle-partitions", "4", *extra],
            cwd=REPO, capture_output=True, text=True, timeout=300,
        )
        assert out.returncode == expect_rc, out.stderr[-2000:]
        return out.stdout

    # reach-only flags with --pattern are an argparse error (not silently
    # ignored), and it fails fast — before any Spark session spins up
    run("--pattern", "?x p ?y", "--from", "a", expect_rc=2)
    run("--pattern", "?x p ?y", "--max-hops", "2", expect_rc=2)

    pat_out = str(tmp_path / "ans_pat")
    stdout = run("--pattern", "?x p ?y . ?y q ?z", "--output", pat_out)
    assert "rows=1" in stdout
    assert [tuple(r) for r in spark.read.parquet(pat_out).collect()] == [
        ("b", "c", "d")
    ]

    stdout = run("--reach", "p", "--max-hops", "3", "--from", "a")
    assert "rows=2" in stdout  # a->b (1), a->c (2)


def test_run_query_cli_over_ntriples_export(spark, tmp_path):
    from nary_relation_extraction_decomposed_spark.sources.ntriples import (
        write_ntriples,
    )

    nt_path = str(tmp_path / "kg_nt")
    write_ntriples(
        spark.createDataFrame(
            [("a", "p", "b"), ("b", "q", "c d")],  # multi-word entity
            "subj string, pred string, obj string",
        ),
        nt_path,
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "run_query.py"),
         "--triples", nt_path, "--format", "nt",
         "--shuffle-partitions", "4",
         "--pattern", '?x p ?y . ?y q "c d"'],
        cwd=REPO, capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "rows=1" in out.stdout
