"""Page preparation: language filter, latest-per-url dedup, text resolution.

Scale notes:
- filter_pages runs BEFORE any UDF so Catalyst pushes lang/null predicates
  into the parquet/Iceberg scan (UDFs are pushdown barriers).
- dedup is an explicit row_number over (url) — dropDuplicates picks an
  arbitrary row per key and would break run-to-run determinism.
- resolve_text is the only stage that touches the (huge, binary) html column;
  its output drops html immediately so every downstream shuffle moves text
  only (column pruning at the source reads html just for this stage).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ..extract.html import extract_text

RESOLVED_SCHEMA = "url string, warc_ts timestamp, text string"


def filter_pages(pages: DataFrame, lang: str = "en") -> DataFrame:
    """Keep rows in `lang` that can yield text (text or html present)."""
    return pages.filter(
        (F.col("lang") == lang)
        & (F.col("text").isNotNull() | F.col("html").isNotNull())
    )


def dedup_latest_per_url(pages: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Exactly one row per url: latest warc_ts, ties broken by html length
    then text — fully deterministic (never dropDuplicates).

    num_partitions pins the url-hash partitioning width. This matters when a
    Python-heavy stage (the extractor) follows: AQE coalesces shuffles by
    BYTES and will happily collapse a small-but-CPU-expensive corpus onto a
    few cores; an explicit user repartition is exempt from AQE coalescing,
    and the window reuses the same url partitioning (no extra shuffle)."""
    if num_partitions:
        pages = pages.repartition(num_partitions, "url")
    w = Window.partitionBy("url").orderBy(
        F.col("warc_ts").desc(),
        F.length(F.col("html")).desc_nulls_last(),
        F.col("text").desc_nulls_last(),
    )
    return (
        pages.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def make_extract_metrics(spark) -> dict:
    """Named accumulators for the extraction stage — per-task operational
    metrics (rows seen, extracted-from-html vs provided-text, empties),
    aggregated by Spark across all partitions; surfaced by
    jobs/run_pipeline.py next to the per-partition manifest lineage."""
    sc = spark.sparkContext
    return {
        "docs_in": sc.accumulator(0),
        "from_html": sc.accumulator(0),
        "provided_text": sc.accumulator(0),
        "empty_text": sc.accumulator(0),
    }


def dedup_latest_text(docs: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Latest-per-url dedup AFTER extraction, on (url, warc_ts, text) rows.

    Preferred at scale: extraction is a map-only stage (no shuffle), so
    running it first means the url shuffle moves extracted TEXT rather than
    raw html (5-20x smaller on real web pages) at the cost of extracting
    the ~ few % duplicate crawls too. Tie-break: warc_ts desc, then longer
    text, then lexicographically larger text — deterministic.

    Physical shape (r7): max(struct(warc_ts, length(text), text)) per url
    instead of the row_number window. Struct ordering is field-wise with
    null fields smallest, which matches desc/desc_nulls_last exactly, and
    a full tie on all three fields means the texts are equal — so the
    surviving row is IDENTICAL (pinned by an A/B exceptAll on the bench
    corpus). Two wins over the window: no per-partition sort, and partial
    (map-side) aggregation collapses a url's duplicate crawls BEFORE the
    exchange — the window shape ships every replica's full text through
    the shuffle (guide: aggregate before you shuffle)."""
    if num_partitions:
        docs = docs.repartition(num_partitions, "url")
    # any non-key payload columns ride in the struct AFTER the three
    # ordering fields: they only influence the pick on a full ordering tie
    # (equal texts), where the window's pick was sort-stability-dependent —
    # the struct max is deterministic there too
    extra = [c for c in docs.columns if c not in ("url", "warc_ts", "text")]
    best = F.max(
        F.struct(
            F.col("warc_ts"),
            F.length(F.col("text")).alias("_len"),
            F.col("text"),
            *[F.col(c) for c in extra],
        )
    ).alias("_b")
    out = docs.groupBy("url").agg(best).select(
        "url", "_b.warc_ts", "_b.text", *[f"_b.{c}" for c in extra]
    )
    return out.select(*docs.columns)


def urls_are_unique(docs: DataFrame) -> bool:
    """EXACT probe: does this corpus already have one row per url? A narrow
    aggregation over the url column only (two counts in one pass; column
    pruning keeps text/html out of the scan) — ~50 bytes/row of shuffle vs
    the full-text shuffle a latest-per-url dedup costs. Used by
    dedup_mode='auto' (plans/pipeline.py): re-runs over an
    already-deduplicated corpus (yesterday's cleaned snapshot, a
    checkpointed docs stage, a test fixture) can skip the pipeline's ONLY
    corpus-wide text shuffle entirely."""
    import pyspark.sql.functions as F2

    row = docs.select(
        F2.count("*").alias("n"), F2.count_distinct("url").alias("d")
    ).first()
    return row["n"] == row["d"]


def resolve_text(pages: DataFrame, metrics: dict | None = None) -> DataFrame:
    """(url, warc_ts, html, text, ...) -> (url, warc_ts, text) where text =
    provided text if non-null else the frozen extractor over html.

    mapInPandas (Arrow batches) — the extraction kernel is the byte-identity
    invariant holder, so it must be the in-repo frozen Python; batches keep
    the JVM<->Python crossing amortized and html never leaves this stage.

    r7 fast path (metrics off): rows that already CARRY text never cross
    the Python boundary at all — they are a pure JVM projection unioned
    with the extractor branch, which sees only the text-null rows and only
    the (url, warc_ts, html) columns. A provided-text corpus thus pays
    zero Arrow serialization of html/text; an all-html corpus is unchanged
    (and when `text` is a literal NULL, Catalyst folds the provided-text
    branch away entirely, so no second scan survives). Row ORDER across
    the union differs from the single-pass shape but every consumer
    (latest-per-url dedup window, groupBys, the oracle's order-insensitive
    compare) is order-independent. The metrics path keeps the single-pass
    shape: its accumulators count provided vs extracted rows in-UDF.
    """
    if metrics is None:
        with_text = pages.filter(F.col("text").isNotNull()).select(
            "url", "warc_ts", "text"
        )
        need = pages.filter(F.col("text").isNull()).select(
            "url", "warc_ts", "html"
        )

        def extract_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in it:
                yield pd.DataFrame(
                    {
                        "url": pdf["url"],
                        "warc_ts": pdf["warc_ts"],
                        "text": [extract_text(h) for h in pdf["html"]],
                    }
                )

        return with_text.unionByName(
            need.mapInPandas(extract_batches, schema=RESOLVED_SCHEMA)
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            texts = []
            n_provided = 0
            n_empty = 0
            for t, h in zip(pdf["text"], pdf["html"]):
                if isinstance(t, str) and t is not None:
                    out = t
                    n_provided += 1
                else:
                    out = extract_text(h)
                if not out:
                    n_empty += 1
                texts.append(out)
            if metrics is not None:
                metrics["docs_in"] += len(pdf)
                metrics["provided_text"] += n_provided
                metrics["from_html"] += len(pdf) - n_provided
                metrics["empty_text"] += n_empty
            yield pd.DataFrame(
                {"url": pdf["url"], "warc_ts": pdf["warc_ts"], "text": texts}
            )

    return pages.select("url", "warc_ts", "html", "text").mapInPandas(
        batches, schema=RESOLVED_SCHEMA
    )
