"""N-Triples interop: serialize the engine's (subj, pred, obj) table to
the W3C N-Triples line format and read it back.

The standard KG interchange format — a downstream consumer (Jena,
Virtuoso, rdflib, another Spark job) can load the constructed KG without
this engine. Scope: IRI terms only (this engine's triples are
entity-entity; typed/string literals are out of scope and documented).

Spark-first: both directions are single narrow projections — write is
format_string over url-encoded ids into spark.write.text (one line per
triple, trivially splittable on read by any engine), read is one regex
extract + url_decode. No UDFs, no shuffle; partition count carries
through, so a 100 TB export parallelizes exactly like the source table.

Entity ids here are normalized surface forms (spaces and arbitrary
chars); they are PERCENT-encoded into the IRI local part: url_encode
(application/x-www-form-urlencoded, space -> '+') followed by a
'+' -> '%20' rewrite, which yields RFC 3987-style percent-encoding —
a literal '+' is already '%2B' at that point, so every remaining '+' is
an encoded space (ADVICE r6: external consumers such as Jena/rdflib
percent-decode IRIs, so the bare-'+' convention exported 'acme corp' as
<...acme+corp>). url_decode already maps %20 -> space and %2B -> '+',
so the read side is unchanged and round-tripping stays byte-identical —
pytest-pinned including spaces, unicode, and '+'.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

DEFAULT_BASE = "http://kg.local/"

_LINE_RE = r"^<([^>]*)> <([^>]*)> <([^>]*)> \.$"


def write_ntriples(
    triples: DataFrame, path: str, base_uri: str = DEFAULT_BASE,
    mode: str = "overwrite",
) -> None:
    """(subj, pred, obj[, ...]) -> N-Triples text files at `path`."""
    def iri(col: str) -> F.Column:
        # '+' -> '%20': see module docstring (RFC-style percent-encoding)
        return F.concat(
            F.lit("<" + base_uri),
            F.regexp_replace(F.url_encode(col), r"\+", "%20"),
            F.lit(">"),
        )

    lines = triples.select(
        F.concat_ws(" ", iri("subj"), iri("pred"), iri("obj"), F.lit(".")).alias(
            "value"
        )
    )
    lines.write.mode(mode).text(path)


def read_ntriples(
    spark: SparkSession, path: str, base_uri: str = DEFAULT_BASE,
    strict: bool = True,
) -> DataFrame:
    """N-Triples text at `path` -> (subj, pred, obj). Terms under
    `base_uri` are decoded back to raw entity ids; foreign IRIs are kept
    verbatim. With strict=True (default) a malformed line raises on
    materialization (the export is machine-written — silence would hide
    corruption); strict=False drops malformed lines instead."""
    raw = spark.read.text(path)
    parsed = raw.select(
        "value",
        *[
            F.regexp_extract("value", _LINE_RE, i).alias(c)
            for i, c in ((1, "s"), (2, "p"), (3, "o"))
        ],
    )
    bad = (F.col("s") == "") | (F.col("p") == "") | (F.col("o") == "")
    if strict:
        parsed = parsed.withColumn(
            "s",
            F.when(
                bad & (F.trim("value") != ""),
                F.raise_error(F.concat(F.lit("malformed N-Triples line: "), "value")),
            ).otherwise(F.col("s")),
        )
    parsed = parsed.filter(~((F.col("s") == "") | (F.col("p") == "") | (F.col("o") == "")))

    def decode(col: str) -> F.Column:
        enc = F.col(col)
        local = F.substring(enc, len(base_uri) + 1, 1 << 20)
        return F.when(
            enc.startswith(base_uri), F.url_decode(local)
        ).otherwise(enc)

    return parsed.select(
        decode("s").alias("subj"), decode("p").alias("pred"), decode("o").alias("obj")
    )
